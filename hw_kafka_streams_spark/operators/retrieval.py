"""Ranked retrieval: BM25 lexical scoring + reciprocal-rank fusion.

The hybrid-search core of a RAG/eval stack: a lexical branch (BM25
over an inverted index) and a vector branch (ANN/exact cosine) each
produce a top-K list, and reciprocal-rank fusion (Cormack et al. 2009)
merges them with ``score(d) = Σ_branches 1/(rrf_k + rank_b(d))`` — the
rank-only fusion that needs no score calibration between branches.

Determinism recipe: BM25 keeps the repo contract (exact-integer tf/df,
per-(doc, term) contribution rounded to DECIMAL(12,6), decimal-summed);
cosine rounds to 4 dp; both branch ranks order by (score, id). Scale:
branch rankings take top-K via ``orderBy().limit()`` —
TakeOrderedAndProject, distributed partial top-K, NO global window —
and only the ≤K survivors enter the (bounded, single-partition-safe)
rank windows and the fusion join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from hw_kafka_streams_spark.operators.text import word_tokens
from hw_kafka_streams_spark.cache import managed_persist


def bm25_scores(
    docs: DataFrame,
    terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document BM25 score for a bag-of-terms query:
    ``(id_col, n_terms_hit, bm25)`` with the decimal-exact summation
    contract (reducer-order-proof). Only docs hitting ≥1 query term
    appear. Plan: tf on (doc, term), dl on doc, df on term — the
    sharded-inverted-index shape; model tables broadcast back.
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(word_tokens(F.lower(F.col(text_col)))).alias("term"),
    )
    # persist the two aggregates every downstream branch re-reads:
    # without them dl is recomputed for stats AND the contrib join, qt
    # for dfreq AND contrib — four tokenize-explode corpus scans where
    # two suffice (cache.py lifecycle; dl is one small row per doc, qt
    # is docs-hitting-terms sized)
    dl = managed_persist(
        toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    )
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
    )
    qt = managed_persist(
        toks.filter(F.col("term").isin(terms))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = qt.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    contrib = (
        qt.join(F.broadcast(dfreq), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            F.round(
                F.log(
                    1
                    + (F.col("n_docs") - F.col("df") + 0.5)
                    / (F.col("df") + 0.5)
                )
                * F.col("tf")
                * (k1 + 1)
                / (
                    F.col("tf")
                    + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
                ),
                6,
            )
            .cast("decimal(12,6)")
            .alias("s"),
        )
    )
    return contrib.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_terms_hit"), F.sum("s").alias("bm25")
    )


def bm25_query_term_counts(
    docs: DataFrame,
    terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The persisted per-(doc, query-term) tf table the BM25 stack is
    built on — exposed so a second ranker over the SAME tokenization
    (e.g. q_rbo_rankers' raw-tf arm) derives its scores from the one
    persisted aggregate instead of re-running tokenize+explode over
    the corpus (round 12, guide §1.2/§5: ``managed_persist`` is
    memoized on the plan, so this returns the very frame
    :func:`bm25_scores` uses when called with the same inputs)."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(word_tokens(F.lower(F.col(text_col)))).alias("term"),
    )
    return managed_persist(
        toks.filter(F.col("term").isin(terms))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def rrf_fuse(
    ranked_a: DataFrame,
    ranked_b: DataFrame,
    rrf_k: int = 60,
    topk: int = 15,
) -> DataFrame:
    """Fuse two ``(doc_id, rnk)`` branch rankings by reciprocal rank:
    full outer join on doc_id, missing branch contributes 0. Output
    ``(doc_id, lex_rnk, vec_rnk, rrf)`` top-``topk`` by (rrf, doc_id).
    """
    a = ranked_a.select("doc_id", F.col("rnk").alias("lex_rnk"))
    b = ranked_b.select("doc_id", F.col("rnk").alias("vec_rnk"))
    fused = a.join(b, "doc_id", "full_outer").select(
        "doc_id",
        "lex_rnk",
        "vec_rnk",
        F.round(
            F.coalesce(F.lit(1.0) / (rrf_k + F.col("lex_rnk")), F.lit(0.0))
            + F.coalesce(F.lit(1.0) / (rrf_k + F.col("vec_rnk")), F.lit(0.0)),
            6,
        ).alias("rrf"),
    )
    return fused.orderBy(F.desc("rrf"), "doc_id").limit(topk)


def rank_top(df: DataFrame, order_cols: list, limit: int) -> DataFrame:
    """Top-``limit`` rows by ``order_cols`` with a 1-based ``rnk``
    column. The limit runs FIRST (TakeOrderedAndProject — distributed
    partial top-K), so the rank window sees ≤limit rows — the
    post-limit bounded-window pattern, never a global window over the
    full input."""
    top = df.orderBy(*order_cols).limit(limit)
    w = Window.orderBy(*order_cols)
    return top.withColumn("rnk", F.row_number().over(w))
