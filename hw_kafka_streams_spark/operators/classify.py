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
        from hw_kafka_streams_spark.operators.skew import spread_small

        # spread: the tokenize-explode + map-side combine otherwise
        # run inside a single-split scan stage; no-op at real scale
        return spread_small(df, key=id_col).select(
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


def logreg_fit_gd(
    df: DataFrame,
    vec_col: str,
    label: Column,
    lr: float = 1.0,
    iters: int = 16,
    round_dp: int = 9,
) -> DataFrame:
    """Binary logistic regression trained by full-batch gradient
    descent — the gradient-loop complement to the closed-form
    classifiers above (NB is two aggregations; OLS is one matrix
    solve; this is the iterative-optimizer shape every learned data
    filter ultimately runs).

    Exactly-reproducible training: features are standardized per
    dimension with population moments rounded to ``round_dp`` decimals,
    standardized values rounded to 6 dp, and the weight vector rounded
    to ``round_dp`` after every update — so the ENTIRE optimizer
    trajectory is pinned bit-for-bit across engines and reducer
    orders, and a DuckDB oracle can replay all ``iters`` updates as
    unrolled CTEs and hash-match the final weights. (On the synthetic
    embedding fixture the classes are only weakly separable — the
    oracle grades the verified trajectory, not model quality.)

    Scale design: the margin is a per-row ``zip_with``/``aggregate``
    dot product against the broadcast weight literal (no shuffle, pure
    JVM); the gradient is ONE posexplode shuffle per iteration,
    partial-aggregated map-side (avg of x_d·resid per dimension); the
    driver holds d+1 floats per iteration — the classic
    broadcast-weights / tree-aggregate GD used on clusters since the
    MLlib days, with zero Python in the loop. Feature standardization
    is two bounded collects (d means + d stds).

    Returns one row per coefficient: (dim, weight, train_acc) with
    dim=0 the bias over standardized features, dims 1..d the feature
    weights, and train_acc the full-train accuracy at a 0.5 cutoff.
    """
    spark = df.sparkSession
    feats0 = df.select(
        F.col(vec_col).cast("array<double>").alias("x0"),
        label.cast("double").alias("y"),
    )
    moments = (
        feats0.select("y", F.posexplode("x0").alias("dim", "xv"))
        .groupBy("dim")
        .agg(F.avg("xv").alias("m"), F.stddev_pop("xv").alias("s"))
        .collect()
    )
    d = len(moments)
    m = [0.0] * d
    s = [1.0] * d
    for r in moments:
        m[r["dim"]] = round(r["m"], round_dp)
        sv = round(r["s"], round_dp)
        s[r["dim"]] = sv if sv > 0 else 1.0
    m_lit = F.array(*[F.lit(v) for v in m])
    s_lit = F.array(*[F.lit(v) for v in s])
    # standardized + bias-augmented features; rounded so both engines
    # iterate on identical inputs
    feats = managed_persist(
        feats0.select(
            F.concat(
                F.array(F.lit(1.0)),
                F.zip_with(
                    F.zip_with("x0", m_lit, lambda x, mm: x - mm),
                    s_lit,
                    lambda x, ss: F.round(x / ss, 6),
                ),
            ).alias("x"),
            "y",
        )
    )

    def _margin(w: list[float]) -> Column:
        w_lit = F.array(*[F.lit(v) for v in w])
        return F.aggregate(
            F.zip_with("x", w_lit, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    w = [0.0] * (d + 1)
    for _ in range(iters):
        resid = F.col("y") - F.lit(1.0) / (F.lit(1.0) + F.exp(-_margin(w)))
        grad = (
            feats.select(resid.alias("r"), F.posexplode("x").alias("dim", "xv"))
            .groupBy("dim")
            .agg(F.avg(F.col("xv") * F.col("r")).alias("g"))
            .collect()
        )
        for row in grad:
            w[row["dim"]] = round(w[row["dim"]] + lr * row["g"], round_dp)

    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-_margin(w)))
    acc = feats.agg(
        F.round(
            F.avg(
                ((p >= 0.5).cast("double") == F.col("y")).cast("double")
            ),
            6,
        ).alias("train_acc")
    )
    weights = spark.createDataFrame(
        [(i, round(wi, 6)) for i, wi in enumerate(w)],
        "dim int, weight double",
    )
    return weights.crossJoin(F.broadcast(acc)).orderBy("dim")
