"""Multinomial Naive Bayes text classification — train AND predict as
pure count arithmetic over DataFrames.

The fastText-shaped workhorse of corpus pipelines (language ID,
quality/domain classification) in its exactly-reproducible form:
"training" a multinomial NB is nothing but two aggregations (per-class
token counts, class priors), and inference is a broadcast join plus an
argmax — no gradient loop, no model file, no Python in the hot path.
That makes it the one classifier whose full train→predict pipeline can
be value-hash oracled in ANSI SQL, and a realistic stand-in for the
classifier-scoring stage of a 100 TB filtering pipeline (the plan
shape — token explode, class-conditional broadcast table, per-doc
argmax — is identical for a fastText linear model with loaded weights).

Determinism recipe (the unigram-LM one, operators/text.py): all counts
are exact integers; each (token, class) log-likelihood
``ln((cnt+1)/(N_c+V))`` (add-one smoothing) and each class log-prior
is one scalar IEEE expression rounded to DECIMAL(18,6); per-(doc,
class) scores are exact decimal sums, so the argmax (ties → smaller
class label) is bit-stable across engines and reducer orders.

Scale: the model is |vocab|×|classes| rows — broadcast here, sharded
by token at crawl scale; scoring shuffles on (doc, token) then (doc,
class), both partial-aggregated map-side; the final argmax window
partitions by doc (never global).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from hw_kafka_streams_spark.operators.text import word_tokens
from hw_kafka_streams_spark.cache import managed_persist


def naive_bayes_predict(
    train: DataFrame,
    test: DataFrame,
    label_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Fit multinomial NB on ``train`` (labels from ``label_col``) and
    classify ``test``; returns ``(id_col, actual, predicted,
    is_correct)`` per test doc (docs with zero tokens are excluded —
    stated contract).

    Score(c | doc) = ln p(c) + Σ_tokens tf_t · ln((cnt_{c,t}+1)/(N_c+V))
    with V the train vocabulary size; unseen tokens get the uniform
    (0+1)/(N_c+V) mass via a left join against the model table.
    """

    def toks(df: DataFrame, *extra: str | Column) -> DataFrame:
        return df.select(
            F.col(id_col).alias("id"),
            *extra,
            F.explode(word_tokens(F.lower(F.col(text_col)))).alias("t"),
        )

    train_toks = toks(train, F.col(label_col).alias("c"))
    # persist the (class, token) count table: nc, vocab, and the model
    # all branch off it, and without the persist EACH branch re-runs
    # the tokenize-explode scan of the train corpus (the dominant cost
    # — 3 extra full passes at corpus scale; cache.py lifecycle)
    ctc = managed_persist(
        train_toks.groupBy("c", "t").agg(F.count(F.lit(1)).alias("cnt"))
    )
    nc = ctc.groupBy("c").agg(F.sum("cnt").alias("n_c"))
    vocab = ctc.agg(F.countDistinct("t").alias("v"))
    # per-class doc counts: n_all derives from the SAME tiny aggregate
    # instead of a second count scan over train
    cls_docs = managed_persist(
        train.groupBy(F.col(label_col).alias("c")).agg(
            F.count(F.lit(1)).alias("n_docs")
        )
    )
    priors = (
        cls_docs
        .crossJoin(F.broadcast(cls_docs.agg(F.sum("n_docs").alias("n_all"))))
        .select(
            "c",
            F.round(
                F.log(F.col("n_docs").cast("double") / F.col("n_all")), 6
            )
            .cast("decimal(18,6)")
            .alias("ln_prior"),
        )
    )
    # model: (t, c, ln_lik) for seen pairs; unseen handled by coalesce.
    model = (
        ctc.join(F.broadcast(nc), "c")
        .crossJoin(F.broadcast(vocab))
        .select(
            "t",
            "c",
            F.round(
                F.log(
                    (F.col("cnt") + 1).cast("double")
                    / (F.col("n_c") + F.col("v"))
                ),
                6,
            )
            .cast("decimal(18,6)")
            .alias("ln_lik"),
        )
    )
    # default (unseen-token) likelihood per class: ln(1/(N_c+V))
    default = (
        nc.crossJoin(F.broadcast(vocab))
        .select(
            "c",
            F.round(
                F.log(F.lit(1.0) / (F.col("n_c") + F.col("v"))), 6
            )
            .cast("decimal(18,6)")
            .alias("ln_default"),
        )
    )
    test_tf = toks(test, F.col(label_col).alias("actual")).groupBy(
        "id", "actual", "t"
    ).agg(F.count(F.lit(1)).alias("tf"))
    scored = (
        test_tf.join(F.broadcast(default), how="cross")
        .join(F.broadcast(model), ["t", "c"], "left")
        .select(
            "id",
            "actual",
            "c",
            "tf",
            F.coalesce(F.col("ln_lik"), F.col("ln_default")).alias("ll"),
        )
        .groupBy("id", "actual", "c")
        .agg(F.sum(F.col("tf") * F.col("ll")).alias("s"))
        .join(F.broadcast(priors), "c")
        .select("id", "actual", "c", (F.col("s") + F.col("ln_prior")).alias("score"))
    )
    w = Window.partitionBy("id").orderBy(F.desc("score"), F.asc("c"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("id").alias(id_col),
            F.col("actual"),
            F.col("c").alias("predicted"),
            (F.col("c") == F.col("actual")).alias("is_correct"),
        )
    )
