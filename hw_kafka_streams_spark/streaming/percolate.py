"""Streaming percolator: match STORED queries against a document
stream — the alerting/routing primitive (saved searches, topic taps,
compliance watchlists) that q_percolator exposes as a batch registry
query.

Streaming shape: the stored-query table is tiny and BROADCAST; each
arriving doc is checked row-locally (``forall(terms, t ->
array_contains(doc_tokens, t))``) — a completely STATELESS narrow
transform, so it runs in append mode with no watermark, no shuffle,
and no state store. That is deliberately different from the batch
registry query's inverted (doc, term) postings join: at rest you
index once and join (q_percolator, scale-optimal for a big static
corpus × many queries); in flight you scan each doc once against the
broadcast query set (per-row cost bounded by total query terms).

Reference parity: the reference's topology is also a stateless
per-record transform against broadcast state (the censor dictionary,
KafkaStreamApp.java:140-169) — this is the same shape with an
AND-term match instead of token replacement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hw_kafka_streams_spark.operators.text import word_tokens


def streaming_percolator(
    docs: DataFrame,
    stored: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Emit one (doc, query) alert row for every stored query whose
    terms ALL occur in the arriving document.

    ``stored`` must have columns ``qid`` and ``terms array<string>``
    and be small enough to broadcast (saved-search tables are).
    Works identically on a streaming or a batch DataFrame — the plan
    is a stateless narrow map either way, so the streaming twin needs
    no semantic translation and replays idempotently (same doc in,
    same alerts out).
    """
    toks = F.array_distinct(word_tokens(F.lower(F.col(text_col))))
    matched = (
        docs.withColumn("_toks", toks)
        .crossJoin(F.broadcast(stored.select("qid", "terms")))
        .filter(
            F.forall("terms", lambda t: F.array_contains(F.col("_toks"), t))
        )
    )
    return matched.select(
        F.col(id_col), "qid", F.size("terms").alias("n_terms")
    )
