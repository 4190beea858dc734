"""Data-mixture balancing for training-corpus assembly.

A training run specifies a TARGET mixture over domains/languages
("30% en, 25% zh, ...") and a total token budget; the corpus has
whatever it has. The planner turns (weights, budget, per-group
availability) into a per-group Bernoulli KEEP RATE — capped at 1.0
when a group is undersupplied — and the sampler applies that rate
deterministically (content-stable md5/xxhash64 draw per document, the
same never-`rand()` contract as :mod:`.sampling`), so reruns and shard
additions cannot move a document in or out of the mix.

Scale design: availability is ONE tiny aggregation (one row per
group); the corpus-wide total is a broadcast 1-row aggregate (scalar-
subquery pattern); the plan (groups × 5 columns) broadcasts back onto
the corpus, making the sampling pass a narrow filter — zero extra
shuffles at 100 TB beyond the group-count agg. All plan arithmetic is
integer-or-IEEE-deterministic (floored integer token targets, one
double division), so the DuckDB oracle reproduces rates bit-for-bit.

The reference (svolga/hw-kafka-streams) has no sampling surface; this
is north-star LLM-pipeline coverage (brief: "operations a large-scale
training-data pipeline would need").
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hw_kafka_streams_spark.cache import managed_persist

_DENOM = 1_000_000  # rate resolution: 1e-6


def mixture_plan(
    df: DataFrame,
    group_col: str,
    weights: dict[str, float],
    tokens: Column,
    budget_tokens: int | None = None,
    budget_fraction: float | None = None,
) -> DataFrame:
    """Per-group sampling plan for a target token mixture.

    ``weights`` is the desired mixture (normalized internally); the
    budget is either an absolute token count or a fraction of the
    corpus's total tokens (scale-invariant — the form a per-shard read
    of a 100 TB corpus wants). Groups absent from ``weights`` get rate
    0 (dropped from the mix).

    Returns one row per weighted group:
    ``(group, n_docs, avail_tokens, target_tokens, rate)`` where
    ``rate = least(1.0, target_tokens / avail_tokens)`` — i.e. an
    undersupplied group keeps everything (the plan can't mint tokens;
    the caller sees the shortfall as ``target_tokens > avail_tokens``).
    """
    if (budget_tokens is None) == (budget_fraction is None):
        raise ValueError("exactly one of budget_tokens / budget_fraction")
    wsum = float(sum(weights.values()))
    if wsum <= 0:
        raise ValueError("weights must sum to > 0")

    # persist the group-sized aggregate: the fraction-budget branch,
    # the returned plan, and every report/apply consumer re-reads it,
    # and each un-persisted branch would re-run the full corpus scan
    # (cache.py lifecycle; rows = number of groups)
    per = managed_persist(
        df.groupBy(group_col).agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(tokens).cast("long").alias("avail_tokens"),
        )
    )
    # Corpus-wide budget: broadcast 1-row aggregate (scalar-subquery
    # decorrelation), never a driver collect.
    if budget_fraction is not None:
        total = per.agg(F.sum("avail_tokens").alias("_total"))
        per = per.crossJoin(F.broadcast(total))
        budget = F.floor(F.lit(float(budget_fraction)) * F.col("_total")).cast(
            "double"
        )
    else:
        budget = F.lit(float(budget_tokens))

    wmap = F.create_map(
        *[x for g, w in weights.items() for x in (F.lit(g), F.lit(float(w) / wsum))]
    )
    target = F.floor(wmap[F.col(group_col)] * budget).cast("long")
    plan = (
        per.withColumn("target_tokens", target)
        .filter(F.col("target_tokens").isNotNull())
        .select(
            group_col,
            "n_docs",
            "avail_tokens",
            "target_tokens",
            F.least(
                F.lit(1.0), F.col("target_tokens") / F.col("avail_tokens")
            ).alias("rate"),
        )
    )
    return plan


def apply_mixture(
    df: DataFrame,
    plan: DataFrame,
    group_col: str,
    id_col: str,
    seed: int = 42,
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """Sample ``df`` down to the plan's per-group rates.

    Deterministic Bernoulli: a document is kept iff its stable hash
    bucket (in [0, 1e6)) falls below ``floor(rate * 1e6)`` — the same
    content-stable draw as :func:`.sampling.hash_bucket`, so the
    sample is reproducible across runs, engines (md5 mode), and
    cluster sizes. The plan is broadcast (one row per group); the
    sampling pass is a narrow filter over the scan.
    """
    from hw_kafka_streams_spark.operators.sampling import hash_bucket

    thresholds = F.broadcast(
        plan.select(
            group_col,
            F.floor(F.col("rate") * _DENOM).cast("long").alias("_thr"),
        )
    )
    bucket = hash_bucket(id_col, _DENOM, seed, hash_mode)
    return (
        df.join(thresholds, group_col, "inner")
        .filter(bucket < F.col("_thr"))
        .drop("_thr")
    )


def mixture_report(
    df: DataFrame,
    group_col: str,
    weights: dict[str, float],
    tokens: Column,
    id_col: str,
    budget_fraction: float,
    seed: int = 42,
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """Plan + sampled outcome in one table (the audit a mixture job
    emits): ``(group, n_docs, avail_tokens, target_tokens, rate,
    n_docs_sampled, tokens_sampled)``. Left join keeps groups whose
    rate rounded to zero (0 sampled)."""
    plan = mixture_plan(
        df, group_col, weights, tokens, budget_fraction=budget_fraction
    )
    sampled = apply_mixture(df, plan, group_col, id_col, seed, hash_mode)
    stats = sampled.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_docs_sampled"),
        F.sum(tokens).cast("long").alias("tokens_sampled"),
    )
    # both sides are per-group aggregates (rows bounded by the weights
    # dict); without the hint Spark picks a sort-merge join on unknown
    # stats sizing
    return (
        plan.join(F.broadcast(stats), group_col, "left")
        .select(
            group_col,
            "n_docs",
            "avail_tokens",
            "target_tokens",
            F.round("rate", 6).alias("rate"),
            F.coalesce("n_docs_sampled", F.lit(0)).alias("n_docs_sampled"),
            F.coalesce("tokens_sampled", F.lit(0)).alias("tokens_sampled"),
        )
        .orderBy(group_col)
    )


def temperature_weights(
    df: DataFrame,
    group_col: str = "source",
    tokens: Column | None = None,
    alpha: float = 0.5,
) -> DataFrame:
    """Temperature-scaled sampling weights per group — the multilingual
    /multi-domain rebalancing rule (T5/mT5, XLM-R): sampling
    probability q_g ∝ p_g^α with α<1 flattens the natural distribution
    p_g (token share), up-weighting tail languages/domains without the
    hard targets of :func:`mixture_plan`.

    Returns one row per group: ``(group, n_docs, n_tokens, p_raw,
    w_temp)`` with ``w_temp = p^α / Σ p^α``.

    Determinism: counts exact; p is one IEEE division; for the default
    α=0.5 the power is ``sqrt`` — correctly rounded by IEEE 754 in
    every engine, unlike ``pow`` — rounded to DECIMAL(18,9) and
    decimal-summed for the normalizer. Scale: one group-count
    aggregation + a 1-row broadcast total; output is |groups| rows.
    """
    toks = tokens if tokens is not None else F.lit(1)
    g = df.groupBy(F.col(group_col).alias("grp")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(toks).cast("long").alias("n_tokens"),
    )
    tot = g.agg(F.sum("n_tokens").alias("n_total"))
    p = F.col("n_tokens").cast("double") / F.col("n_total")
    powp = F.sqrt(p) if alpha == 0.5 else F.pow(p, F.lit(alpha))
    scored = g.crossJoin(F.broadcast(tot)).select(
        "grp",
        "n_docs",
        "n_tokens",
        F.round(p, 6).alias("p_raw"),
        F.round(powp, 9).cast("decimal(18,9)").alias("s"),
    )
    norm = scored.agg(F.sum("s").alias("z"))
    return (
        scored.crossJoin(F.broadcast(norm))
        .select(
            F.col("grp").alias(group_col),
            "n_docs",
            "n_tokens",
            "p_raw",
            F.round(
                F.col("s").cast("double") / F.col("z").cast("double"), 6
            ).alias("w_temp"),
        )
    )


def doremi_weights(
    df: DataFrame,
    group_col: str,
    text_col: str = "text",
    eta: float = 0.5,
    iters: int = 4,
) -> DataFrame:
    """DoReMi-style iterative domain reweighting (public Xie et al.
    2023 shape, distilled to its verifiable core): find domain weights
    by multiplicative updates on per-domain EXCESS LOSS, where loss is
    the exactly-computable unigram-LM negative log-likelihood instead
    of a proxy-transformer loss.

    Per iteration, with current weights w:
      p_mix(t)   = Σ_d w_d · c_dt / total_d      (weighted mixture LM)
      nll_mix(d) = −Σ_t c_dt · ln p_mix(t) / total_d
      excess(d)  = nll_mix(d) − nll_own(d)        (own-LM NLL, fixed)
      w'_d      ∝ w_d · exp(eta · excess(d))      (normalized)
    Domains whose tokens the current mixture covers poorly (high
    excess) gain weight — the balanced-coverage objective DoReMi
    optimizes, with the proxy-model retraining step replaced by the
    closed-form mixture LM so every iteration is deterministic.

    Determinism recipe (the unigram-LM one): every ln/exp scalar is
    rounded to a declared decimal place and summed as exact DECIMAL,
    weights rounded to 9 dp per update — the whole trajectory is
    engine-reproducible and the DuckDB oracle unrolls all iterations.

    Scale: the loop runs on the (domain, token) COUNT table — bounded
    by vocabulary × domains, orders of magnitude smaller than the
    corpus; the corpus is scanned ONCE to build it (persisted). Driver
    state is |domains| floats per iteration.
    """
    from hw_kafka_streams_spark.operators.text import word_tokens

    c = managed_persist(
        df.filter(F.col(text_col).isNotNull())
        .select(
            F.col(group_col).alias("g"),
            F.explode(word_tokens(F.col(text_col))).alias("t"),
        )
        .groupBy("g", "t")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    totals = {
        r["g"]: r["n"]
        for r in c.groupBy("g").agg(F.sum("c").alias("n")).collect()
    }
    domains = sorted(totals)
    tot_map = F.create_map(
        *[x for d in domains for x in (F.lit(d), F.lit(float(totals[d])))]
    )
    # own-LM NLL per domain (fixed across iterations): exact-integer
    # counts, per-token ln rounded to 6 dp, decimal-summed
    ln_own = F.round(F.log(F.col("c") / tot_map[F.col("g")]), 6).cast(
        "decimal(18,6)"
    )
    nll_own = {
        r["g"]: r["nll"]
        for r in c.groupBy("g")
        .agg(
            F.round(
                -F.sum(F.col("c") * ln_own).cast("double")
                / tot_map[F.col("g")],
                6,
            ).alias("nll")
        )
        .collect()
    }
    w = {d: round(1.0 / len(domains), 9) for d in domains}
    last_mix: dict[str, float] = {}
    for _ in range(iters):
        w_map = F.create_map(
            *[x for d in domains for x in (F.lit(d), F.lit(w[d]))]
        )
        # mixture LM: per-token weighted average of the per-domain
        # distributions; each term rounded to 12 dp, decimal-summed
        term = F.round(
            w_map[F.col("g")] * F.col("c") / tot_map[F.col("g")], 12
        ).cast("decimal(22,12)")
        pmix = c.groupBy("t").agg(F.sum(term).alias("pm"))
        ln_mix = F.round(F.log(F.col("pm").cast("double")), 6).cast(
            "decimal(18,6)"
        )
        mix_rows = (
            c.join(pmix, "t")
            .groupBy("g")
            .agg(
                F.round(
                    -F.sum(F.col("c") * ln_mix).cast("double")
                    / tot_map[F.col("g")],
                    6,
                ).alias("nll")
            )
            .collect()
        )
        last_mix = {r["g"]: r["nll"] for r in mix_rows}
        import math

        # integer-nanos normalization: u and Σu are exact integers (the
        # DuckDB twin sums DECIMAL(18,9) — bit-identical), and the two
        # final divisions are single correctly-rounded IEEE ops
        u_nanos = {
            d: int(
                round(
                    round(
                        w[d]
                        * round(
                            math.exp(
                                round(eta * (last_mix[d] - nll_own[d]), 6)
                            ),
                            9,
                        ),
                        9,
                    )
                    * 1e9
                )
            )
            for d in domains
        }
        s_f = sum(u_nanos.values()) / 1e9
        w = {d: round((u_nanos[d] / 1e9) / s_f, 9) for d in domains}
    spark = df.sparkSession
    return spark.createDataFrame(
        [
            (
                d,
                round(w[d], 6),
                nll_own[d],
                last_mix[d],
                round(last_mix[d] - nll_own[d], 6),
            )
            for d in domains
        ],
        f"{group_col} string, weight double, nll_own double, "
        "nll_mix double, excess double",
    ).orderBy(group_col)
