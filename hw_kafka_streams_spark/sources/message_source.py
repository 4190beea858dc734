"""Custom Python DataSource (Spark 4 API): a deterministic message
generator — the engine's analog of the reference's self-seeding test
producers (KafkaStreamApp.java:230-247 seeds the golden messages into
the `messages` topic; here the source IS the generator).

Demonstrates the full extensibility surface a user replacing a Kafka
deployment needs: a batch reader (partition-parallel, seeded) and a
microbatch stream reader (monotonic offsets, replayable ranges —
exactly the Kafka-source contract re-implemented in ~60 lines).

    spark.dataSource.register(MessageGenDataSource)
    spark.read.format("message_gen").option("n", 1000).load()
    spark.readStream.format("message_gen").load()
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

SCHEMA = "sender string, text string, receiver string, seq bigint"

_WORDS = ["Java", "Spring", "React", "Политика", "Kafka", "Spark", "1C", "SQL"]


def _row(i: int):
    # deterministic in the sequence number — replays are identical
    sender = f"login{i % 7 + 1}"
    receiver = f"login{(i * 3 + 1) % 7 + 1}"
    text = f"{_WORDS[i % len(_WORDS)]} {_WORDS[(i * 5 + 2) % len(_WORDS)]}"
    return (sender, text, receiver, i)


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class MessageGenBatchReader(DataSourceReader):
    def __init__(self, options):
        self.n = int(options.get("n", 100))
        self.n_parts = int(options.get("numPartitions", 4))
        self._sender_eq: str | None = None

    def pushFilters(self, filters):
        """Accept `sender = '...'` pushdown (Spark 4.1 DataSource API):
        the generator then skips non-matching sequence numbers at the
        source — rows never cross the Python→JVM boundary. Everything
        else is returned for Spark to evaluate post-scan."""
        from pyspark.sql.datasource import EqualTo

        remaining = []
        for f in filters:
            if (
                isinstance(f, EqualTo)
                and f.attribute == ("sender",)
                and self._sender_eq is None
            ):
                self._sender_eq = f.value
            else:
                remaining.append(f)
        return remaining

    def partitions(self):
        step = max(1, self.n // self.n_parts)
        return [
            _RangePartition(s, min(s + step, self.n))
            for s in range(0, self.n, step)
        ]

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            row = _row(i)
            if self._sender_eq is not None and row[0] != self._sender_eq:
                continue
            yield row


class MessageGenStreamReader(DataSourceStreamReader):
    """Microbatch reader: offset = next sequence number; each batch
    emits ``rowsPerBatch`` new messages. Offset ranges are replayable
    (same range → same rows), which is what gives the file-checkpoint
    recovery path exactly-once behavior."""

    def __init__(self, options):
        self.rows_per_batch = int(options.get("rowsPerBatch", 10))
        # finite horizon so processAllAvailable() can drain (a perpetual
        # generator would feed it forever); raise for long-running demos
        self.max_seq = int(options.get("maxSeq", 100))
        self._current = 0

    def initialOffset(self) -> dict:
        return {"seq": 0}

    def latestOffset(self) -> dict:
        self._current = min(self._current + self.rows_per_batch, self.max_seq)
        return {"seq": self._current}

    def partitions(self, start: dict, end: dict):
        return [_RangePartition(start["seq"], end["seq"])]

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            yield _row(i)

    def commit(self, end: dict) -> None:
        pass


class MessageGenDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "message_gen"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return MessageGenBatchReader(self.options)

    def streamReader(self, schema) -> DataSourceStreamReader:
        return MessageGenStreamReader(self.options)
