"""Runnable entry point — parity with the reference's application main
(KafkaStreamApp.java:72-118: wire topology, seed fixtures, run).

    python -m hw_kafka_streams_spark                # golden batch demo
    python -m hw_kafka_streams_spark --stream       # same, as a StreamingQuery
    python -m hw_kafka_streams_spark --kafka HOST   # real Kafka topology

The golden fixtures and expected output are the reference's own
self-seeded run (README.md:49-55): blocked sender/receiver pairs drop,
forbidden words are masked length-preserving and case-insensitively.
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile

from hw_kafka_streams_spark.operators.censor import filter_pipeline
from hw_kafka_streams_spark.session import get_spark

GOLDEN_MESSAGES = [
    ("login4", "Java", "login1"),
    ("login2", "Spring", "login1"),
    ("login3", "1С", "login1"),  # Cyrillic С — must NOT be censored
    ("login5", "Политика React", "login1"),
]
GOLDEN_BLOCKED = [
    ("login1:login2", "blocked"),
    ("login1:login3", "blocked"),
    ("login2:login4", "blocked"),
]
GOLDEN_WORDS = [("Политика", "ban"), ("1C", "ban"), ("Алкоголь", "ban")]


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="hw_kafka_streams_spark")
    ap.add_argument("--stream", action="store_true", help="run as a StreamingQuery")
    ap.add_argument("--kafka", metavar="BOOTSTRAP", help="run the real Kafka topology")
    args = ap.parse_args(argv)

    spark = get_spark("hw_kafka_streams_spark_app")
    if args.kafka:
        from hw_kafka_streams_spark.streaming.pipeline import run_reference_topology

        ckpt = tempfile.mkdtemp(prefix="sg_ckpt_")
        q = run_reference_topology(spark, args.kafka, ckpt)
        print(f"streaming query started (checkpoint {ckpt}); Ctrl-C to stop")
        q.awaitTermination()
        return 0

    messages = spark.createDataFrame(
        GOLDEN_MESSAGES, "sender string, text string, receiver string"
    )
    blocked = spark.createDataFrame(GOLDEN_BLOCKED, "key string, value string")
    words = spark.createDataFrame(GOLDEN_WORDS, "word string, value string")

    if args.stream:
        from hw_kafka_streams_spark.streaming.pipeline import run_file_topology

        from hw_kafka_streams_spark.streaming.topics import FileTopicAdmin

        with tempfile.TemporaryDirectory(prefix="sg_demo_") as d:
            # O9/O10 parity: reset the namespace, then declare the
            # reference's four topics before producing (KafkaStreamApp
            # createTopics / RemoveAll.removeAll)
            admin = FileTopicAdmin(f"{d}/topics")
            admin.delete_all()
            for t in ("messages", "blocked-users", "forbidden-words",
                      "filtered-messages"):
                admin.create_topic(t, partitions=3)
            msg_dir = os.path.join(admin.root, "messages")
            messages.coalesce(1).write.mode("append").parquet(msg_dir)
            q = run_file_topology(
                spark,
                msg_dir,
                blocked,
                [w for w, v in GOLDEN_WORDS if v == "ban"],
                queryName="demo",
            )
            q.processAllAvailable()
            q.stop()
            out = spark.sql("select * from demo")
            rows = out.collect()
    else:
        rows = filter_pipeline(messages, blocked, words).collect()

    print("filtered-messages:")
    for r in sorted(rows, key=lambda r: r.sender):
        print(f"  {r.sender} -> {{text={r.text}, receiver={r.receiver}}}")
    ok = {(r.sender, r.text) for r in rows} == {
        ("login4", "Java"),
        ("login5", "******** React"),
    }
    print("golden check:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
