"""Distributed rank statistics.

The reference (svolga/hw-kafka-streams) has no statistics surface; these
are engine extensions in the same spirit as operators/graph.py — shapes
a 100 TB evaluation pipeline needs, built so the only non-integer math
is a final scalar epilogue (the q_regression_stats / BM25 determinism
recipe).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hw_kafka_streams_spark.operators.winutil import tiny_table_partition
from hw_kafka_streams_spark.cache import managed_persist


def rank_auc(
    df: DataFrame,
    label_col: str,
    score_col: str,
    block_col: Column | None = None,
) -> DataFrame:
    """Exact ROC-AUC of ``score_col`` predicting boolean ``label_col``
    via the Mann-Whitney U statistic, tie-correct.

    AUC = P(score⁺ > score⁻) + ½·P(score⁺ = score⁻). Computed as

        sum2 = Σ over distinct scores s:  n_pos(s) · (2·cum_neg(<s) + n_neg(s))
        AUC  = sum2 / (2 · N_pos · N_neg)

    — every term integer until the single final division, so the result
    is deterministic across reducer orders and engines.

    Scale shape: a global rank would be a single-partition window (the
    classic scale killer). Instead: group to distinct scores [1
    shuffle], then the block-prefix-sum pattern — scores are range-
    blocked by ``block_col`` (default ``floor(score)``), per-block
    negative counts aggregate to a tiny block table whose running sum
    is the only global window (rows = #blocks, driver-bounded), and
    each score's cumulative-negatives-below is its within-block running
    sum plus its block offset [windows partitioned by block — parallel].

    Returns a 1-row DataFrame ``(n_pos, n_neg, auc)``.
    """
    from pyspark.sql import Window

    if block_col is None:
        block_col = F.floor(F.col("score"))

    per_score = (
        df.select(
            F.col(score_col).alias("score"),
            F.col(label_col).cast("boolean").alias("label"),
        )
        .groupBy("score")
        .agg(
            F.sum(F.col("label").cast("long")).alias("np"),
            F.sum((~F.col("label")).cast("long")).alias("nn"),
        )
        .withColumn("blk", block_col)
    )
    bsums = per_score.groupBy("blk").agg(F.sum("nn").alias("bn"))
    # tiny block table: intentionally single-partition (see winutil)
    w_blk = Window.partitionBy(tiny_table_partition("blk")).orderBy(
        "blk"
    ).rowsBetween(Window.unboundedPreceding, -1)
    boff = bsums.select(
        "blk", F.coalesce(F.sum("bn").over(w_blk), F.lit(0)).alias("blk_off")
    )
    w_s = (
        Window.partitionBy("blk")
        .orderBy("score")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = per_score.join(F.broadcast(boff), "blk").withColumn(
        "cum_neg_below",
        F.col("blk_off") + F.coalesce(F.sum("nn").over(w_s), F.lit(0)),
    )
    return cum.agg(
        F.sum("np").alias("n_pos"),
        F.sum("nn").alias("n_neg"),
        F.sum(F.col("np") * (2 * F.col("cum_neg_below") + F.col("nn"))).alias("sum2"),
    ).select(
        "n_pos",
        "n_neg",
        F.round(
            F.col("sum2") / (2.0 * F.col("n_pos") * F.col("n_neg")), 6
        ).alias("auc"),
    )


def quantile_buckets(
    df: DataFrame,
    value_col: Column | str,
    group_col: str,
    n_buckets: int = 10,
    out_col: str = "bucket",
    quantize_decimals: int | None = None,
) -> DataFrame:
    """Per-group quantile bucketing via BROADCAST THRESHOLDS — the
    scale-safe calibration pass (e.g. normalize a quality score across
    languages so a filter keeps each group's top X%, not the globally
    loudest group).

    The tempting plan — ``ntile(n) OVER (PARTITION BY group)`` — puts
    an entire group in ONE task, and low-cardinality groups (languages,
    sources) make that a single-partition sort at 100 TB. Instead: one
    exact-percentile pass per group (tiny result: groups × (n-1)
    thresholds), broadcast it back, and assign ``bucket = 1 +
    #thresholds strictly below value`` in a narrow map. Thresholds come
    from :func:`exact_percentiles_histogram` — the heavy aggregation is
    a partial-combinable (group, value) COUNT, never ``F.percentile``'s
    buffer-every-raw-value aggregator whose partials merge by
    concatenation (a billion-row group would need a billion-slot buffer
    on one reducer); pass ``quantize_decimals`` to cap the histogram
    domain on continuous columns. The histogram interpolation matches
    DuckDB ``quantile_cont`` bit-for-bit (proven by q_percentiles_hist
    and the parity tests), so the assignment is oracle-able. Values
    equal to a threshold land in the LOWER bucket (strict comparison),
    the same convention as SQL ``CUME_DIST``-style right-closed
    buckets.
    """
    vc = F.col(value_col) if isinstance(value_col, str) else value_col
    probs = [i / n_buckets for i in range(1, n_buckets)]
    # persist the scored projection: the thresholds agg and the final
    # assignment would otherwise each recompute the (possibly
    # regexp-heavy) value expression over the full corpus
    with_v = managed_persist(df.withColumn("_v", vc))
    thresholds = exact_percentiles_histogram(
        with_v, "_v", group_col, probs, quantize_decimals=quantize_decimals
    ).select(
        group_col,
        F.array(*[F.col(f"p{i}") for i in range(len(probs))]).alias("_ts"),
    )
    bucket = F.lit(1) + F.aggregate(
        F.col("_ts"),
        F.lit(0),
        lambda acc, t: acc + F.when(F.col("_v") > t, 1).otherwise(0),
    )
    return (
        with_v.join(F.broadcast(thresholds), group_col)
        .withColumn(out_col, bucket)
        .drop("_ts")
        .withColumnRenamed("_v", f"{out_col}_value")
    )


def ols_fit(
    df: DataFrame,
    x: Column | str,
    y: Column | str,
    prefix: str = "",
) -> DataFrame:
    """One-row OLS fit of ``y ~ x``: (n, slope, intercept, r2).

    Determinism recipe (the q_regression_stats one, packaged): x and y
    are rounded to DECIMAL(18,6) per row, so the five moment sums
    (Σx, Σy, Σxy, Σx², Σy²) accumulate as EXACT decimals — reducer
    order cannot drift them — and only the closed-form epilogue (a
    handful of scalar IEEE ops on the one aggregated row) runs in
    double. This is the 100 TB shape for any algebraic statistic:
    distributive integer/decimal partials, tiny float finish.

    ``prefix`` namespaces the output columns (``{prefix}slope`` ...)
    so two fits can be cross-joined into one report row.
    """
    xc = (F.col(x) if isinstance(x, str) else x).cast("double")
    yc = (F.col(y) if isinstance(y, str) else y).cast("double")
    xd = F.round(xc, 6).cast("decimal(18,6)")
    yd = F.round(yc, 6).cast("decimal(18,6)")
    m = df.select(
        xd.alias("_x"), yd.alias("_y")
    ).agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum("_x").alias("_sx"),
        F.sum("_y").alias("_sy"),
        F.sum(F.col("_x") * F.col("_y")).alias("_sxy"),
        F.sum(F.col("_x") * F.col("_x")).alias("_sx2"),
        F.sum(F.col("_y") * F.col("_y")).alias("_sy2"),
    )
    n = F.col("_n").cast("double")
    sx = F.col("_sx").cast("double")
    sy = F.col("_sy").cast("double")
    sxy = F.col("_sxy").cast("double")
    sx2 = F.col("_sx2").cast("double")
    sy2 = F.col("_sy2").cast("double")
    cov_n = n * sxy - sx * sy  # n² · cov(x, y)
    var_x = n * sx2 - sx * sx  # n² · var(x)
    var_y = n * sy2 - sy * sy
    # degenerate-input guard: constant x (or a single point) has no
    # defined slope, constant y no defined r² — return explicit NULLs
    # instead of letting the division produce NaN/±Inf that then
    # propagates (e.g. heaps_k = exp(intercept) on a 1-source corpus)
    slope = F.when(var_x != 0, cov_n / var_x)
    return m.select(
        F.col("_n").alias(f"{prefix}n"),
        slope.alias(f"{prefix}slope"),
        ((sy - slope * sx) / n).alias(f"{prefix}intercept"),
        F.when(
            (var_x != 0) & (var_y != 0), (cov_n * cov_n) / (var_x * var_y)
        ).alias(f"{prefix}r2"),
    )


def winsorized_stats(
    df: DataFrame,
    value_col: Column | str,
    group_col: str,
    lower: float = 0.05,
    upper: float = 0.95,
    quantize_decimals: int | None = None,
) -> DataFrame:
    """Per-group winsorized + trimmed means — outlier-robust central
    tendency for noisy numeric columns (model scores, prices, latencies)
    where a handful of wild values drags the plain mean.

    Winsorized: values clamped into [p_lower, p_upper] then averaged.
    Trimmed: values OUTSIDE the band dropped then averaged. Returns
    per group: n, the two thresholds, both means, and the clip counts.

    Scale shape: ONE persisted exact (group, value) count histogram —
    partial-combinable, bounded by the value domain, never a buffer of
    raw rows — feeds BOTH stages: the thresholds (quantized weighted
    re-agg of the histogram + quantile_cont interpolation) and the
    means (count-weighted clamp/trim sums over the same histogram).
    Raw rows are scanned exactly once; no per-group sort, no ntile.
    The means sum DECIMAL(18,6)-rounded values scaled by exact integer
    counts, so reducer order cannot drift the hash; the interpolation
    matches DuckDB quantile_cont bit-for-bit (proven by
    q_percentiles_hist and the parity tests).

    ``quantize_decimals`` caps the THRESHOLD histogram's value domain
    for continuous columns (see :func:`exact_percentiles_histogram`):
    thresholds come from the 10^-d floored grid (within one grid step
    below the raw percentile — declare d to match the tolerance the
    analysis bears); the means still clamp/trim the RAW values against
    those grid thresholds.
    """
    from hw_kafka_streams_spark.cache import managed_persist

    vc = (F.col(value_col) if isinstance(value_col, str) else value_col).cast(
        "double"
    )
    with_v = df.select(F.col(group_col), vc.alias("_v"))
    # the ONE heavy aggregation: exact per-(group, value) counts.
    # Persisted because both the threshold derivation and the weighted
    # means consume it (round-6 verdict item 2: the tails and the means
    # previously re-derived their own scans/aggs).
    hist = managed_persist(
        with_v.groupBy(group_col, "_v").agg(F.count(F.lit(1)).alias("_c"))
    )
    if quantize_decimals is not None:
        s = float(10**quantize_decimals)
        qv = F.floor(F.col("_v") * F.lit(s)) / F.lit(s)
        th_hist = hist.groupBy(group_col, qv.alias("_v")).agg(
            F.sum("_c").alias("_c")
        )
    else:
        th_hist = hist
    th = _percentiles_from_hist(th_hist, group_col, [lower, upper]).select(
        group_col, F.col("p0").alias("_lo"), F.col("p1").alias("_hi")
    )
    j = hist.join(F.broadcast(th), group_col)
    clamped = F.least(F.greatest(F.col("_v"), F.col("_lo")), F.col("_hi"))
    in_band = (F.col("_v") >= F.col("_lo")) & (F.col("_v") <= F.col("_hi"))
    c = F.col("_c")
    vd = F.round(F.col("_v"), 6).cast("decimal(18,6)") * c
    cd = F.round(clamped, 6).cast("decimal(18,6)") * c
    return j.groupBy(group_col).agg(
        F.sum(c).alias("n"),
        F.round(F.min("_lo"), 6).alias("p_lo"),
        F.round(F.min("_hi"), 6).alias("p_hi"),
        F.round(F.sum(cd).cast("double") / F.sum(c), 6).alias("win_mean"),
        F.round(
            F.sum(F.when(in_band, vd)).cast("double")
            / F.sum(F.when(in_band, c).otherwise(F.lit(0))),
            6,
        ).alias("trim_mean"),
        F.sum(F.when(F.col("_v") < F.col("_lo"), c).otherwise(F.lit(0))).alias(
            "n_clipped_lo"
        ),
        F.sum(F.when(F.col("_v") > F.col("_hi"), c).otherwise(F.lit(0))).alias(
            "n_clipped_hi"
        ),
    )


def group_entropy(
    df: DataFrame,
    group_col: str,
    class_col: str,
) -> DataFrame:
    """Shannon entropy (nats) of the ``class_col`` distribution within
    each group — e.g. the language mix per source: 0 = monolingual
    domain, ln(k) = uniform over k classes. The one-number diversity
    readout mixture curation uses to spot mislabeled or scraped-mixed
    domains.

    Per group: n, n_classes, majority_share, entropy. Counts are exact
    integers; each class contributes one scalar
    ``round(-(c/n)·ln(c/n), 6)`` summed in DECIMAL (reducer-order-
    proof). Two group-keyed aggregations — (group, class) then group —
    never a doc-keyed second pass.
    """
    cc = df.groupBy(group_col, class_col).agg(F.count(F.lit(1)).alias("_c"))
    tot = cc.groupBy(group_col).agg(F.sum("_c").alias("_n"))
    p = F.col("_c").cast("double") / F.col("_n")
    term = F.round(-p * F.log(p), 6).cast("decimal(18,6)")
    return (
        cc.join(F.broadcast(tot), group_col)
        .groupBy(group_col)
        .agg(
            F.min("_n").alias("n"),
            F.count(F.lit(1)).alias("n_classes"),
            F.round(F.max("_c").cast("double") / F.min("_n"), 6).alias(
                "majority_share"
            ),
            F.round(F.sum(term).cast("double"), 6).alias("entropy"),
        )
    )


def assoc_rules(
    df: DataFrame,
    basket_col: str,
    item_col: str,
) -> DataFrame:
    """Pairwise association rules (support / confidence / lift) over
    baskets — which items co-occur beyond chance (event types per user,
    tags per document). The market-basket classic, kept at the pair
    level where the counts stay exact and the join stays bounded.

    Plan: distinct (basket, item) [one shuffle] → basket-keyed
    self-join (rows per basket bounded by the item vocabulary, so the
    pair blowup is items²-per-basket, never baskets²) → one pair-keyed
    count; item totals and the 1-row basket count broadcast back. The
    ratios are scalar epilogue arithmetic on exact integers.
    """
    items = df.select(
        F.col(basket_col).alias("basket"), F.col(item_col).alias("item")
    ).distinct()
    n_baskets = items.agg(F.countDistinct("basket").alias("n_baskets"))
    singles = items.groupBy("item").agg(F.count(F.lit(1)).alias("n_item"))
    pairs = (
        items.select("basket", F.col("item").alias("antecedent"))
        .join(
            items.select("basket", F.col("item").alias("consequent")), "basket"
        )
        .filter(F.col("antecedent") != F.col("consequent"))
        .groupBy("antecedent", "consequent")
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    return (
        pairs.join(
            F.broadcast(
                singles.select(
                    F.col("item").alias("antecedent"),
                    F.col("n_item").alias("n_ant"),
                )
            ),
            "antecedent",
        )
        .join(
            F.broadcast(
                singles.select(
                    F.col("item").alias("consequent"),
                    F.col("n_item").alias("n_con"),
                )
            ),
            "consequent",
        )
        .crossJoin(F.broadcast(n_baskets))
        .select(
            "antecedent",
            "consequent",
            "n_both",
            F.round(F.col("n_both").cast("double") / F.col("n_baskets"), 6).alias(
                "support"
            ),
            F.round(F.col("n_both").cast("double") / F.col("n_ant"), 6).alias(
                "confidence"
            ),
            F.round(
                (F.col("n_both").cast("double") * F.col("n_baskets"))
                / (F.col("n_ant").cast("double") * F.col("n_con")),
                6,
            ).alias("lift"),
        )
    )


def exact_percentiles_histogram(
    df: DataFrame,
    value_col: Column | str,
    group_col: str,
    probs: list[float],
    quantize_decimals: int | None = None,
) -> DataFrame:
    """Exact interpolated per-group percentiles WITHOUT the
    buffer-every-value aggregator — the 100 TB shape for exact
    quantiles over bounded-domain values (prices, latencies, scores).

    ``F.percentile`` holds every raw value in the aggregation buffer
    (its partials merge by concatenation), so a billion-row group
    needs a billion-slot buffer on one reducer. This computes the same
    number from the per-(group, value) COUNT HISTOGRAM: the heavy
    aggregation is a partial-combinable count keyed by (group, value)
    — domain-bounded, not row-bounded — then one running-sum window
    over the histogram and a closed-form interpolation:

        idx = p·(n−1);  t = v[floor(idx)]
                          + (idx − floor(idx))·(v[floor(idx)+1] − v[floor(idx)])

    exactly ``quantile_cont`` / ``F.percentile`` semantics (parity
    asserted in tests and by the q_percentiles_hist oracle). The
    window sorts distinct values per group — the price domain, orders
    of magnitude smaller than the data.

    ``quantize_decimals`` DECLARES the grid for truly continuous
    columns (model scores, float latencies), where "bounded domain"
    would otherwise degrade to one histogram row per distinct double:
    values are floored onto a 10^-d grid (``floor(v·10^d)/10^d`` —
    floor, not round, because floor of an exact binary double is
    engine-identical while half-up vs half-even rounding is not), so
    the heavy agg is capped at ``range·10^d`` rows per group NO MATTER
    the row count. The returned thresholds are then the exact
    quantile_cont of the QUANTIZED multiset — within one grid step
    (10^-d) below the raw-value percentile. Oracles must quantize
    identically (``quantile_cont(floor(v*10^d)/10^d, p)``).

    Returns one row per group: ``n`` plus ``p1..pk`` threshold columns
    in ``probs`` order.
    """
    vc = (F.col(value_col) if isinstance(value_col, str) else value_col).cast(
        "double"
    )
    if quantize_decimals is not None:
        s = float(10**quantize_decimals)
        vc = F.floor(vc * F.lit(s)) / F.lit(s)
    hist = df.select(F.col(group_col), vc.alias("_v")).groupBy(
        group_col, "_v"
    ).agg(F.count(F.lit(1)).alias("_c"))
    return _percentiles_from_hist(hist, group_col, probs)


def _percentiles_from_hist(
    hist: DataFrame, group_col: str, probs: list[float]
) -> DataFrame:
    """quantile_cont interpolation over a pre-built per-(group, value)
    count histogram (columns ``_v``, ``_c``). Factored out so callers
    that already hold a histogram (e.g. :func:`winsorized_stats`, which
    reuses ONE persisted histogram for thresholds AND means) skip the
    raw-row aggregation.

    Each prob is a set of CONDITIONAL aggregates inside ONE group-by —
    no explode fan-out (the old shape duplicated every histogram row
    once per prob and needed a second group-by to fold the probs back;
    round-6 verdict item 2)."""
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy("_v")
    # the whole-partition total rides the SAME exchange+sort as the
    # running sum (two WindowExecs, one shuffle) — cheaper than a
    # separate groupBy + broadcast join for `n`. The per-group window
    # sorts the HISTOGRAM (domain-bounded, quantizable), not the rows.
    wg = Window.partitionBy(group_col)
    cum = (
        hist.withColumn("_end", F.sum("_c").over(w))
        .withColumn("_n", F.sum("_c").over(wg))
        .withColumn("_start", F.col("_end") - F.col("_c"))
    )
    # positions of interest per prob: k_i = floor(p_i * (n-1)) and
    # k_i + 1. A histogram row is a candidate if it covers any of them.
    ks = [F.floor(F.lit(p) * (F.col("_n") - 1)) for p in probs]
    covers = [
        (
            (F.col("_start") <= k) & (k < F.col("_end")),
            (F.col("_start") <= k + 1) & (k + 1 < F.col("_end")),
        )
        for k in ks
    ]
    any_cover = None
    for ck, ck1 in covers:
        c = ck | ck1
        any_cover = c if any_cover is None else (any_cover | c)
    cands = cum.filter(any_cover)
    agg_cols = [F.min("_n").alias("n")] + [
        col
        for i, (ck, ck1) in enumerate(covers)
        for col in (
            F.max(F.when(ck, F.col("_v"))).alias(f"_vk{i}"),
            F.max(F.when(ck1, F.col("_v"))).alias(f"_vk1{i}"),
        )
    ]
    th = cands.groupBy(group_col).agg(*agg_cols)
    out = [F.col(group_col), F.col("n")]
    for i, p in enumerate(probs):
        idx = F.lit(p) * (F.col("n") - 1)
        k = F.floor(idx)
        vk = F.col(f"_vk{i}")
        vk1 = F.coalesce(F.col(f"_vk1{i}"), vk)
        out.append((vk + (idx - k) * (vk1 - vk)).alias(f"p{i}"))
    return th.select(*out)


_RANGE_BLOCKS = 1024


def _with_range_block(
    df: DataFrame, value_col: str, out_col: str, n_blocks: int = _RANGE_BLOCKS
) -> DataFrame:
    """Attach a block id derived from the observed min/max of
    ``value_col``: floor((v − min) / ((max − min) / n_blocks)), capped
    to ``n_blocks`` blocks (all-equal values collapse to block 0).

    The block-prefix-sum pattern's block table must be BOUNDED; keying
    on floor(v) bounds it only for small integer domains — timestamps
    or large-magnitude doubles make the single-partition block window
    scale with the integer span (and overflow the long cast at |v| ≥
    2⁶³). Range-derived blocks are bounded by construction at any
    domain. The 1-row min/max aggregate broadcasts back as the usual
    tiny cross join.
    """
    rng = df.agg(
        F.min(value_col).alias("_vmin"), F.max(value_col).alias("_vmax")
    )
    width = (F.col("_vmax") - F.col("_vmin")) / F.lit(float(n_blocks))
    blk = F.when(F.col("_vmax") <= F.col("_vmin"), F.lit(0)).otherwise(
        F.least(
            F.lit(n_blocks - 1),
            F.floor((F.col(value_col) - F.col("_vmin")) / width),
        )
    )
    return (
        df.crossJoin(F.broadcast(rng))
        .withColumn(out_col, blk.cast("long"))
        .drop("_vmin", "_vmax")
    )


def ks_two_sample(
    df: DataFrame,
    value_col: Column | str,
    group_col: str,
    group_a: str,
    group_b: str,
) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic — the nonparametric
    distribution-drift test (did the score/latency/price distribution
    shift between two snapshots or segments?), complementing the KL
    token drift which needs a categorical domain.

        D = max_v |F_a(v) − F_b(v)|

    computed EXACTLY and scale-safely: per-(value) conditional counts,
    cumulatives via the block-prefix-sum pattern (per-block windows
    parallel; the only single-partition window is over the bounded
    block table), and the max taken over the INTEGER numerator
    |cum_a·n_b − cum_b·n_a| — no float comparisons anywhere until the
    final division. Returns one row: (n_a, n_b, ks_d, ks_crit_05,
    reject_05) with the α=0.05 critical value
    1.358·√((n_a+n_b)/(n_a·n_b)).

    The block key derives from the OBSERVED value range — block =
    floor((v − min) / ((max − min) / 1024)), capped to 1024 blocks —
    not floor(v): a fixed width of 1 makes the block table scale with
    the integer span of the domain (timestamps or large-magnitude
    doubles would put millions of rows through the single-partition
    block window, and |v| ≥ 2⁶³ overflows the floor-to-long). The
    blocking only partitions the prefix-sum; cumulative counts are
    exact integers either way, so the statistic is invariant to it.
    """
    from pyspark.sql import Window

    from hw_kafka_streams_spark.operators.winutil import tiny_table_partition

    vc = (F.col(value_col) if isinstance(value_col, str) else value_col).cast(
        "double"
    )
    gc = F.col(group_col)
    base = df.filter(gc.isin([group_a, group_b])).select(
        vc.alias("_v"), (gc == group_a).cast("int").alias("_is_a")
    )
    per_v = base.groupBy("_v").agg(
        F.sum("_is_a").alias("_ca"),
        F.sum(F.lit(1) - F.col("_is_a")).alias("_cb"),
    )
    per_v = _with_range_block(per_v, "_v", "_blk")
    # running totals: parallel within-block cumulatives + one tiny
    # block-offset table (the q_window_rank shape)
    w_in = (
        Window.partitionBy("_blk")
        .orderBy("_v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    blocks = per_v.groupBy("_blk").agg(
        F.sum("_ca").alias("_ba"), F.sum("_cb").alias("_bb")
    )
    w_blk = (
        Window.partitionBy(tiny_table_partition("_blk"))
        .orderBy("_blk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = blocks.select(
        "_blk",
        F.coalesce(F.sum("_ba").over(w_blk), F.lit(0)).alias("_offa"),
        F.coalesce(F.sum("_bb").over(w_blk), F.lit(0)).alias("_offb"),
    )
    totals = blocks.agg(
        F.sum("_ba").alias("n_a"), F.sum("_bb").alias("n_b")
    )
    cum = (
        per_v.join(F.broadcast(offsets), "_blk")
        .select(
            (F.col("_offa") + F.sum("_ca").over(w_in)).alias("_cuma"),
            (F.col("_offb") + F.sum("_cb").over(w_in)).alias("_cumb"),
        )
    )
    num = cum.crossJoin(F.broadcast(totals)).agg(
        F.max(
            F.abs(
                F.col("_cuma") * F.col("n_b") - F.col("_cumb") * F.col("n_a")
            )
        ).alias("_num"),
        F.min("n_a").alias("n_a"),
        F.min("n_b").alias("n_b"),
    )
    d = F.col("_num").cast("double") / (
        F.col("n_a").cast("double") * F.col("n_b")
    )
    crit = F.lit(1.358) * F.sqrt(
        (F.col("n_a") + F.col("n_b")).cast("double")
        / (F.col("n_a").cast("double") * F.col("n_b"))
    )
    return num.select(
        "n_a",
        "n_b",
        F.round(d, 6).alias("ks_d"),
        F.round(crit, 6).alias("ks_crit_05"),
        (d > crit).cast("int").alias("reject_05"),
    )


def chi2_independence(
    df: DataFrame,
    row_col: str,
    col_col: str,
) -> DataFrame:
    """Pearson chi-squared test of independence between two categorical
    columns (is language independent of source?), plus Cramér's V
    effect size — the categorical companion to :func:`ks_two_sample`.

    One (row, col) count shuffle; margins are category-sized aggregates
    broadcast back; each cell's (o−e)²/e term is one scalar expression
    rounded to DECIMAL and summed exactly (reducer-order-proof).

    The cell table is DENSIFIED before the sum: the margin tables
    cross-join into the full nr × nc category grid and the observed
    counts left-join onto it with o coalesced to 0, because an
    unobserved (row, col) combination still contributes its full
    expected count e to the statistic ((0−e)²/e = e); summing over
    observed cells only understates chi² and Cramér's V on any sparse
    contingency table. The grid is margin-sized (categories², never
    rows), so the cross join stays a broadcast of two tiny aggregates.
    """
    cells = df.groupBy(
        F.col(row_col).alias("_r"), F.col(col_col).alias("_c")
    ).agg(F.count(F.lit(1)).alias("_o"))
    rt = cells.groupBy("_r").agg(F.sum("_o").alias("_rt"))
    ct = cells.groupBy("_c").agg(F.sum("_o").alias("_ct"))
    tot = cells.agg(
        F.sum("_o").alias("_t"),
        F.countDistinct("_r").alias("_nr"),
        F.countDistinct("_c").alias("_nc"),
    )
    e = F.col("_rt").cast("double") * F.col("_ct") / F.col("_t")
    term = (
        F.round((F.col("_o") - e) * (F.col("_o") - e) / e, 9)
        .cast("decimal(20,9)")
    )
    grid = rt.crossJoin(F.broadcast(ct))
    joined = (
        grid.join(F.broadcast(cells), ["_r", "_c"], "left")
        .withColumn("_o", F.coalesce(F.col("_o"), F.lit(0)))
        .crossJoin(F.broadcast(tot))
    )
    chi2 = F.sum(term).cast("double")
    return joined.agg(
        F.min("_t").alias("n"),
        ((F.min("_nr") - 1) * (F.min("_nc") - 1)).alias("dof"),
        F.round(chi2, 4).alias("chi2"),
        F.round(
            F.sqrt(
                chi2
                / (
                    F.min("_t").cast("double")
                    * F.least(F.min("_nr") - 1, F.min("_nc") - 1)
                )
            ),
            4,
        ).alias("cramers_v"),
    )


def skyline_2d(
    df: DataFrame,
    x_col: Column | str,
    y_col: Column | str,
) -> DataFrame:
    """2-D skyline (Pareto front, maximize both): rows not dominated by
    any other — the preference-query operator (best docs by quality AND
    length, best configs by speed AND accuracy) relational engines ship
    as SKYLINE and Spark lacks.

    Dominance: r' dominates r iff x' ≥ x ∧ y' ≥ y with at least one
    strict. Exact-duplicate points are mutually non-dominated (kept).

    Scale shape — NOT the O(n²) self-join and NOT a global sort window:
    reduce to one row per distinct x (the max-y; same-x lower-y rows
    are dominated), then the strict-prefix running max of y over x
    DESC via the block-prefix-sum pattern: per-block windows parallel,
    the only single-partition window is over the range-derived
    bounded block table (see _with_range_block). A row survives iff its y strictly beats every
    better-x row's y. Input rows join back by x so (x, y)-tied
    duplicates all surface.
    """
    from pyspark.sql import Window

    from hw_kafka_streams_spark.operators.winutil import tiny_table_partition

    xc = (F.col(x_col) if isinstance(x_col, str) else x_col).cast("double")
    yc = (F.col(y_col) if isinstance(y_col, str) else y_col).cast("double")
    pts = df.withColumn("_x", xc).withColumn("_y", yc)
    per_x = _with_range_block(
        pts.groupBy("_x").agg(F.max("_y").alias("_my")), "_x", "_blk"
    )
    # strict-prefix (x' > x) running max of the per-x maxima: within-
    # block prefix max over x DESC + the block table's own prefix max
    blocks = per_x.groupBy("_blk").agg(F.max("_my").alias("_bm"))
    w_blk = (
        Window.partitionBy(tiny_table_partition("_blk"))
        .orderBy(F.desc("_blk"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    boff = blocks.select(
        "_blk", F.max("_bm").over(w_blk).alias("_prev_blk_max")
    )
    w_in = (
        Window.partitionBy("_blk")
        .orderBy(F.desc("_x"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    frontier = (
        per_x.join(F.broadcast(boff), "_blk")
        .withColumn(
            "_mq_before",
            F.greatest(
                F.coalesce(F.max("_my").over(w_in), F.lit(float("-inf"))),
                F.coalesce(F.col("_prev_blk_max"), F.lit(float("-inf"))),
            ),
        )
        # survive iff the per-x max strictly beats every better-x y
        .filter(F.col("_my") > F.col("_mq_before"))
        .select("_x", "_my")
    )
    return (
        pts.join(F.broadcast(frontier), "_x")
        # keep only the max-y rows at that x (ties all kept)
        .filter(F.col("_y") == F.col("_my"))
        .drop("_x", "_y", "_my")
    )


def psi_drift(
    df: DataFrame,
    value_col: Column | str,
    group_col: str,
    group_expected: str,
    group_actual: str,
    n_bins: int = 10,
) -> DataFrame:
    """Population Stability Index between two cohorts of a numeric
    column — the model-monitoring drift stat ops teams actually page
    on (rule of thumb: < 0.1 stable, 0.1-0.25 shifting, > 0.25 drifted)
    — complementing KS (max ECDF gap, no binning) and the KL token
    drift (categorical domains).

        PSI = Σ_bins (p_actual − p_expected) · ln(p_actual / p_expected)

    Bins are ``n_bins`` equal-width slices of the EXPECTED cohort's
    observed [min, max] (the deployed convention: the baseline defines
    the grid), actual values clamped into the edge bins; empty bins get
    a 1-count add-one so the log stays finite (the standard PSI
    smoothing). Per-bin terms are rounded to DECIMAL and summed exactly
    (reducer-order-proof). Plan: one (cohort, bin) count shuffle off a
    narrow binning map + a bin-sized epilogue; the baseline min/max is
    a broadcast 1-row aggregate.

    Returns one row: (n_expected, n_actual, psi, drift_flag).
    """
    vc = (F.col(value_col) if isinstance(value_col, str) else value_col).cast(
        "double"
    )
    gc = F.col(group_col)
    base = df.filter(gc.isin([group_expected, group_actual])).select(
        vc.alias("_v"), (gc == group_expected).cast("int").alias("_is_e")
    )
    rng = base.filter(F.col("_is_e") == 1).agg(
        F.min("_v").alias("_lo"), F.max("_v").alias("_hi")
    )
    width = (F.col("_hi") - F.col("_lo")) / F.lit(float(n_bins))
    bin_id = F.when(F.col("_hi") <= F.col("_lo"), F.lit(0)).otherwise(
        F.least(
            F.lit(n_bins - 1),
            F.greatest(
                F.lit(0), F.floor((F.col("_v") - F.col("_lo")) / width)
            ),
        )
    ).cast("int")
    counts = (
        base.crossJoin(F.broadcast(rng))
        .select(bin_id.alias("_b"), "_is_e")
        .groupBy("_b")
        .agg(
            F.sum("_is_e").alias("_ce"),
            F.sum(F.lit(1) - F.col("_is_e")).alias("_ca"),
        )
    )
    totals = counts.agg(
        F.sum("_ce").alias("n_expected"), F.sum("_ca").alias("n_actual")
    )
    # add-one smoothing on EMPTY bins only (standard PSI practice)
    ce = F.greatest(F.col("_ce"), F.lit(1)).cast("double")
    ca = F.greatest(F.col("_ca"), F.lit(1)).cast("double")
    pe = ce / F.col("n_expected")
    pa = ca / F.col("n_actual")
    term = F.round((pa - pe) * F.log(pa / pe), 9).cast("decimal(20,9)")
    psi = F.sum(term).cast("double")
    return (
        counts.crossJoin(F.broadcast(totals))
        .agg(
            F.min("n_expected").alias("n_expected"),
            F.min("n_actual").alias("n_actual"),
            F.round(psi, 6).alias("psi"),
            (F.round(psi, 6) > 0.25).cast("int").alias("drift_flag"),
        )
    )


def cohens_kappa(df: DataFrame, col_a: str, col_b: str) -> DataFrame:
    """Cohen's kappa — chance-corrected agreement between two label
    columns over the same rows (two annotators, a model vs its silver
    labels, metadata vs content-derived labels):

        κ = (p_o − p_e) / (1 − p_e)

    with p_o the observed agreement rate and p_e the agreement expected
    from the raters' marginal label distributions. The eval stat for
    any labeling pipeline where raw accuracy flatters a skewed label
    mix. Same plan family as :func:`chi2_independence`: one (a, b)
    count shuffle, category-sized margins broadcast, DECIMAL-summed
    expected-agreement terms, scalar epilogue.

    Returns one row: (n, po, pe, kappa).
    """
    cells = df.groupBy(
        F.col(col_a).alias("_a"), F.col(col_b).alias("_b")
    ).agg(F.count(F.lit(1)).alias("_n"))
    at = cells.groupBy("_a").agg(F.sum("_n").alias("_at"))
    bt = cells.groupBy("_b").agg(F.sum("_n").alias("_bt"))
    tot = cells.agg(
        F.sum("_n").alias("n"),
        F.sum(F.when(F.col("_a") == F.col("_b"), F.col("_n")).otherwise(0))
        .alias("_agree"),
    )
    pe_terms = (
        at.join(bt, F.col("_a") == F.col("_b"))
        .crossJoin(F.broadcast(tot))
        .agg(
            F.sum(
                F.round(
                    F.col("_at").cast("double")
                    * F.col("_bt")
                    / (F.col("n").cast("double") * F.col("n")),
                    9,
                ).cast("decimal(20,9)")
            )
            .cast("double")
            .alias("pe")
        )
    )
    po = F.col("_agree").cast("double") / F.col("n")
    return (
        tot.crossJoin(F.broadcast(pe_terms))
        .select(
            "n",
            F.round(po, 6).alias("po"),
            F.round(F.col("pe"), 6).alias("pe"),
            F.round((po - F.col("pe")) / (1.0 - F.col("pe")), 6).alias(
                "kappa"
            ),
        )
    )


def mutual_information(df: DataFrame, col_a: str, col_b: str) -> DataFrame:
    """Mutual information (nats) between two categorical columns, plus
    both marginal entropies and the normalized MI — "how much does
    knowing `source` tell you about `lang`?". Chi² (same plan family)
    answers *whether* the columns are dependent; MI measures *how
    much*, on an information scale comparable across column pairs —
    the redundant-metadata / label-leakage audit.

        MI  = Σ_ab p_ab · ln( p_ab / (p_a · p_b) )      (observed cells
              only — zero cells contribute exactly 0, unlike chi²)
        NMI = MI / sqrt(H_a · H_b)                       ∈ [0, 1]

    Scale shape: one (a, b) count shuffle bounded by the category
    product, category-sized margins broadcast back, per-cell terms
    rounded to 9 dp and DECIMAL-summed so reducer order cannot drift
    the hash; the epilogue is scalar IEEE. Engine extension (the
    reference has no statistics surface).

    Returns one row: (n, mi, h_a, h_b, nmi), all 6 dp.
    """
    cells = df.groupBy(
        F.col(col_a).alias("_a"), F.col(col_b).alias("_b")
    ).agg(F.count(F.lit(1)).alias("_n"))
    cells = managed_persist(cells)  # margins + joint read it 3×
    at = cells.groupBy("_a").agg(F.sum("_n").alias("_at"))
    bt = cells.groupBy("_b").agg(F.sum("_n").alias("_bt"))
    tot = cells.agg(F.sum("_n").alias("n"))

    def _entropy(margin: DataFrame, cnt: str) -> Column:
        p = F.col(cnt).cast("double") / F.col("n")
        return (
            -F.sum(F.round(p * F.log(p), 9).cast("decimal(20,9)"))
        ).cast("double")

    ha = (
        at.crossJoin(F.broadcast(tot)).agg(_entropy(at, "_at").alias("h_a"))
    )
    hb = (
        bt.crossJoin(F.broadcast(tot)).agg(_entropy(bt, "_bt").alias("h_b"))
    )
    pab = F.col("_n").cast("double") / F.col("n")
    lift = (F.col("_n").cast("double") * F.col("n")) / (
        F.col("_at").cast("double") * F.col("_bt")
    )
    mi = (
        cells.join(F.broadcast(at), "_a")
        .join(F.broadcast(bt), "_b")
        .crossJoin(F.broadcast(tot))
        .agg(
            F.sum(F.round(pab * F.log(lift), 9).cast("decimal(20,9)"))
            .cast("double")
            .alias("mi"),
        )
    )
    nmi = F.when(
        (F.col("h_a") > 0) & (F.col("h_b") > 0),
        F.col("mi") / F.sqrt(F.col("h_a") * F.col("h_b")),
    )
    return (
        tot.crossJoin(F.broadcast(mi))
        .crossJoin(F.broadcast(ha))
        .crossJoin(F.broadcast(hb))
        .select(
            "n",
            F.round("mi", 6).alias("mi"),
            F.round("h_a", 6).alias("h_a"),
            F.round("h_b", 6).alias("h_b"),
            F.round(nmi, 6).alias("nmi"),
        )
    )


def corr_matrix(df: DataFrame, cols: list[str]) -> DataFrame:
    """Pairwise Pearson correlation over ``cols`` — the numeric-column
    redundancy profile (which measures move together / which features
    are duplicates) in ONE aggregation pass regardless of how many
    pairs there are.

    Determinism: the ols_fit recipe generalized — each value is
    rounded to DECIMAL(18,6) per row, all k + k(k+1)/2 moment sums
    accumulate exactly, and the per-pair closed form runs on the one
    aggregated row (exploded to pair rows via an inline struct array,
    so the agg executes once, never per pair). Constant columns get
    NULL, not NaN.

    Returns one row per unordered pair: (col_x, col_y, n, corr).
    """
    deci = {
        c: F.round(F.col(c).cast("double"), 6).cast("decimal(18,6)")
        for c in cols
    }
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        aggs.append(F.sum(deci[c]).alias(f"_s_{c}"))
        aggs.append(F.sum(deci[c] * deci[c]).alias(f"_q_{c}"))
    pairs = [(a, b) for i, a in enumerate(cols) for b in cols[i + 1:]]
    for a, b in pairs:
        aggs.append(F.sum(deci[a] * deci[b]).alias(f"_p_{a}_{b}"))
    m = df.agg(*aggs)

    n = F.col("_n").cast("double")

    def _pair_struct(a: str, b: str) -> Column:
        sa = F.col(f"_s_{a}").cast("double")
        sb = F.col(f"_s_{b}").cast("double")
        qa = F.col(f"_q_{a}").cast("double")
        qb = F.col(f"_q_{b}").cast("double")
        p = F.col(f"_p_{a}_{b}").cast("double")
        va = n * qa - sa * sa
        vb = n * qb - sb * sb
        corr = F.when(
            (va > 0) & (vb > 0), (n * p - sa * sb) / F.sqrt(va * vb)
        )
        return F.struct(
            F.lit(a).alias("col_x"),
            F.lit(b).alias("col_y"),
            F.col("_n").alias("n"),
            F.round(corr, 6).alias("corr"),
        )

    return m.select(
        F.explode(F.array(*[_pair_struct(a, b) for a, b in pairs])).alias("s")
    ).select("s.*")


def spearman_corr(
    df: DataFrame, x: Column | str, y: Column | str
) -> DataFrame:
    """Spearman rank correlation of two numeric columns — Pearson over
    average ranks, robust to monotone-nonlinear relationships and
    outliers (the audit for "does doc length track token count?"
    style questions where the raw scales are incomparable).

    Exactness: ties get the standard average rank. DOUBLED ranks
    (2·avg_rank = 2·cum_below + cnt + 1) stay integers, so every
    moment sum is an exact DECIMAL(38,0) and the one final epilogue
    (which the doubling cancels out of) is scalar IEEE — bit-stable
    across reducer orders and engines.

    Scale shape: a global rank window is the classic single-partition
    killer; instead each column ranks via the rank_auc recipe —
    distinct-value counts [1 bounded shuffle], range-derived blocks
    (:func:`_with_range_block`), per-block totals as the only
    single-partition window (≤1024 rows), within-block running sums
    partitioned and parallel. Rows then join their two rank columns
    back value-to-value.

    Returns one row: (n, rho).
    """
    from pyspark.sql import Window

    xc = (F.col(x) if isinstance(x, str) else x).cast("double")
    yc = (F.col(y) if isinstance(y, str) else y).cast("double")
    rows = df.select(xc.alias("_x"), yc.alias("_y")).filter(
        F.col("_x").isNotNull() & F.col("_y").isNotNull()
    )
    rows = managed_persist(rows)  # scanned once per rank table + once to join

    def _rank2(col: str, out: str) -> DataFrame:
        per_v = rows.groupBy(F.col(col).alias("_v")).agg(
            F.count(F.lit(1)).alias("_c")
        )
        per_v = _with_range_block(per_v, "_v", "_blk")
        bsums = per_v.groupBy("_blk").agg(F.sum("_c").alias("_bc"))
        w_blk = (
            Window.partitionBy(tiny_table_partition("_blk"))
            .orderBy("_blk")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        boff = bsums.select(
            "_blk",
            F.coalesce(F.sum("_bc").over(w_blk), F.lit(0)).alias("_off"),
        )
        w_v = (
            Window.partitionBy("_blk")
            .orderBy("_v")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        return (
            per_v.join(F.broadcast(boff), "_blk")
            .select(
                "_v",
                (
                    2 * (F.col("_off") + F.coalesce(F.sum("_c").over(w_v), F.lit(0)))
                    + F.col("_c")
                    + 1
                ).alias(out),
            )
        )

    rx = _rank2("_x", "_rx")
    ry = _rank2("_y", "_ry")
    ranked = (
        rows.join(rx, rows["_x"] == rx["_v"])
        .drop("_v")
        .join(ry, rows["_y"] == ry["_v"])
        .select(
            F.col("_rx").cast("decimal(38,0)").alias("_rx"),
            F.col("_ry").cast("decimal(38,0)").alias("_ry"),
        )
    )
    m = ranked.agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum("_rx").alias("_sx"),
        F.sum("_ry").alias("_sy"),
        F.sum(F.col("_rx") * F.col("_ry")).alias("_sxy"),
        F.sum(F.col("_rx") * F.col("_rx")).alias("_sx2"),
        F.sum(F.col("_ry") * F.col("_ry")).alias("_sy2"),
    )
    n = F.col("_n").cast("double")
    sx = F.col("_sx").cast("double")
    sy = F.col("_sy").cast("double")
    sxy = F.col("_sxy").cast("double")
    sx2 = F.col("_sx2").cast("double")
    sy2 = F.col("_sy2").cast("double")
    vx = n * sx2 - sx * sx
    vy = n * sy2 - sy * sy
    rho = F.when((vx > 0) & (vy > 0), (n * sxy - sx * sy) / F.sqrt(vx * vy))
    return m.select(
        F.col("_n").alias("n"), F.round(rho, 6).alias("rho")
    )


def welch_ttest(
    df: DataFrame,
    group_col: str,
    value_col: Column | str,
    group_a: str,
    group_b: str,
) -> DataFrame:
    """Welch's unequal-variance two-sample t-test (the default A/B
    test for "did this curation change shift doc length / quality /
    latency?" questions — no equal-variance assumption, so it is safe
    on the skewed distributions real corpora have).

    Exactness: the value is aggregated as DECIMAL(38,0) integer
    moments (n, Σv, Σv²) — ONE map-side-combinable aggregation over
    the data, conditional on group, no shuffle beyond the 2-row
    partial merge. The t statistic and Welch–Satterthwaite degrees of
    freedom are a scalar IEEE epilogue over those exact moments
    (the q_regression_stats determinism recipe), so results are
    bit-stable across partitionings and engines.

    Scale shape: a single pass + O(1) state. At 100 TB this is the
    cheapest possible plan — no rank, no sort, no join.
    """
    v = (F.col(value_col) if isinstance(value_col, str) else value_col).cast(
        "decimal(38,0)"
    )
    g = F.col(group_col)
    base = df.filter(g.isin(group_a, group_b) & v.isNotNull()).select(
        (g == F.lit(group_a)).alias("_is_a"), v.alias("_v")
    )
    m = base.agg(
        F.sum(F.when(F.col("_is_a"), 1).otherwise(0)).alias("_na"),
        F.sum(F.when(~F.col("_is_a"), 1).otherwise(0)).alias("_nb"),
        F.sum(F.when(F.col("_is_a"), F.col("_v"))).alias("_sa"),
        F.sum(F.when(~F.col("_is_a"), F.col("_v"))).alias("_sb"),
        F.sum(F.when(F.col("_is_a"), F.col("_v") * F.col("_v"))).alias("_qa"),
        F.sum(F.when(~F.col("_is_a"), F.col("_v") * F.col("_v"))).alias("_qb"),
    )
    na, nb = F.col("_na").cast("double"), F.col("_nb").cast("double")
    sa, sb = F.col("_sa").cast("double"), F.col("_sb").cast("double")
    qa, qb = F.col("_qa").cast("double"), F.col("_qb").cast("double")
    va = (na * qa - sa * sa) / (na * (na - 1))
    vb = (nb * qb - sb * sb) / (nb * (nb - 1))
    sea, seb = va / na, vb / nb
    se2 = sea + seb
    t = (sa / na - sb / nb) / F.sqrt(se2)
    dfw = (se2 * se2) / (sea * sea / (na - 1) + seb * seb / (nb - 1))
    return m.select(
        F.col("_na").alias("n_a"),
        F.col("_nb").alias("n_b"),
        F.round(sa / na, 4).alias("mean_a"),
        F.round(sb / nb, 4).alias("mean_b"),
        F.round(t, 6).alias("t_stat"),
        F.round(dfw, 4).alias("df_welch"),
    )


def mann_whitney_u(
    df: DataFrame,
    group_col: str,
    value_col: Column | str,
    group_a: str,
    group_b: str,
) -> DataFrame:
    """Mann–Whitney U (Wilcoxon rank-sum) two-sample test — the
    nonparametric partner to :func:`welch_ttest` for distributions
    where means mislead (heavy tails, outliers, ordinal scores).

    Exactness: combined-sample average ranks with ties stay INTEGERS
    by doubling (2r = 2·cum_below + cnt + 1, the spearman_corr trick),
    so the rank sum, both U statistics, and the tie-correction term
    Σ(t³−t) are exact DECIMAL sums; the normal-approximation z score
    (tie-corrected variance) is a scalar IEEE epilogue. U values are
    halves at worst, exactly representable as DOUBLE.

    Scale shape: ranks come from distinct-value counts [1 bounded
    shuffle] + range-derived block prefix sums
    (:func:`_with_range_block`) — never a global rank window; the
    per-block offset table is the only single-partition step (≤1024
    rows).
    """
    from pyspark.sql import Window

    v = (F.col(value_col) if isinstance(value_col, str) else value_col).cast(
        "double"
    )
    g = F.col(group_col)
    base = df.filter(g.isin(group_a, group_b) & v.isNotNull()).select(
        (g == F.lit(group_a)).alias("_is_a"), v.alias("_v")
    )
    per_v = base.groupBy("_v").agg(
        F.sum(F.when(F.col("_is_a"), 1).otherwise(0)).alias("_ca"),
        F.sum(F.when(~F.col("_is_a"), 1).otherwise(0)).alias("_cb"),
    )
    per_v = _with_range_block(per_v, "_v", "_blk")
    per_v = per_v.withColumn("_c", F.col("_ca") + F.col("_cb"))
    bsums = per_v.groupBy("_blk").agg(F.sum("_c").alias("_bc"))
    w_blk = (
        Window.partitionBy(tiny_table_partition("_blk"))
        .orderBy("_blk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    boff = bsums.select(
        "_blk", F.coalesce(F.sum("_bc").over(w_blk), F.lit(0)).alias("_off")
    )
    w_v = (
        Window.partitionBy("_blk")
        .orderBy("_v")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ranked = per_v.join(F.broadcast(boff), "_blk").select(
        "_ca",
        "_cb",
        "_c",
        (
            2 * (F.col("_off") + F.coalesce(F.sum("_c").over(w_v), F.lit(0)))
            + F.col("_c")
            + 1
        )
        .cast("decimal(38,0)")
        .alias("_r2"),
    )
    m = ranked.agg(
        F.sum("_ca").alias("_n1"),
        F.sum("_cb").alias("_n2"),
        F.sum(F.col("_ca").cast("decimal(38,0)") * F.col("_r2")).alias("_r1d"),
        F.sum(
            F.col("_c").cast("decimal(38,0)")
            * F.col("_c")
            * F.col("_c")
            - F.col("_c")
        ).alias("_ties"),
    )
    n1, n2 = F.col("_n1").cast("double"), F.col("_n2").cast("double")
    n = n1 + n2
    # 2·U1 = 2·R1 − n1(n1+1); doubled rank sum _r1d is already 2·R1
    u1 = (F.col("_r1d").cast("double") - n1 * (n1 + 1)) / 2
    u2 = n1 * n2 - u1
    var_u = (
        n1 * n2 / 12.0
        * ((n + 1) - F.col("_ties").cast("double") / (n * (n - 1)))
    )
    z = (u1 - n1 * n2 / 2) / F.sqrt(var_u)
    return m.select(
        F.col("_n1").alias("n_a"),
        F.col("_n2").alias("n_b"),
        u1.alias("u_a"),
        u2.alias("u_b"),
        F.round(z, 6).alias("z_score"),
    )


def anova_f_oneway(
    df: DataFrame, group_col: str, value_col: Column | str
) -> DataFrame:
    """One-way ANOVA F statistic across k groups — does the value's
    mean differ across sources/langs/shards? (the k-group extension of
    :func:`welch_ttest`, classic equal-variance form).

    Exactness: ONE map-side-combinable pass builds exact DECIMAL
    moments per group (n_g, Σv, Σv²); between/within sums of squares
    reduce over the tiny k-row group table (the chi2_independence
    determinism budget: exact integer inputs, double terms, round at
    the edge). F = (SSB/(k−1)) / (SSW/(n−k)).

    Scale shape: one shuffle keyed by group (k rows out), scalar
    epilogue — no sort, no join, safe at any data size.
    """
    v = (F.col(value_col) if isinstance(value_col, str) else value_col).cast(
        "decimal(38,0)"
    )
    per_g = (
        df.filter(v.isNotNull() & F.col(group_col).isNotNull())
        .groupBy(F.col(group_col).alias("_g"))
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.sum(v).alias("_s"),
            F.sum(v * v).alias("_q"),
        )
    )
    m = per_g.agg(
        F.count(F.lit(1)).alias("_k"),
        F.sum("_n").alias("_nt"),
        F.sum("_s").alias("_st"),
        F.sum("_q").alias("_qt"),
        F.sum(
            F.col("_s").cast("double")
            * F.col("_s").cast("double")
            / F.col("_n").cast("double")
        ).alias("_sg2"),
    )
    k = F.col("_k").cast("double")
    nt = F.col("_nt").cast("double")
    st, qt = F.col("_st").cast("double"), F.col("_qt").cast("double")
    ssb = F.col("_sg2") - st * st / nt
    ssw = qt - F.col("_sg2")
    f_stat = (ssb / (k - 1)) / (ssw / (nt - k))
    return m.select(
        F.col("_k").alias("k_groups"),
        F.col("_nt").alias("n"),
        F.round(f_stat, 6).alias("f_stat"),
    )


def brown_forsythe(
    df: DataFrame, group_col: str, value_col: Column | str
) -> DataFrame:
    """Brown–Forsythe test (Levene's test on MEDIAN-centered absolute
    deviations): does the value's SPREAD differ across groups? The
    variance-homogeneity audit run before trusting
    :func:`anova_f_oneway` (whose equal-variance assumption it
    checks), robust to heavy tails because the center is the median.

    W = one-way ANOVA F computed on z_ij = |v_ij − med_j|.

    Exactness: group medians via Spark's exact interpolated
    percentile (bit-matches DuckDB quantile_cont — the q_percentiles
    precedent); each z is one scalar double rounded to 6 dp and
    DECIMAL-summed (z², 6 dp, DECIMAL(28,6)) so reducer order cannot
    drift the moments; the F ratio is a rounded scalar epilogue over
    the k-row group table.

    Scale shape: two group-keyed aggregations (median pass, moment
    pass) reusing one partitioning plus a broadcast median join — no
    sort beyond percentile's internal per-group one, no row window.
    """
    vraw = F.col(value_col) if isinstance(value_col, str) else value_col
    base = df.filter(vraw.isNotNull() & F.col(group_col).isNotNull()).select(
        F.col(group_col).alias("_g"), vraw.cast("double").alias("_v")
    )
    med = base.groupBy("_g").agg(
        F.percentile("_v", F.lit(0.5)).alias("_med")
    )
    zr = F.abs(F.col("_v") - F.col("_med"))
    per_g = (
        base.join(F.broadcast(med), "_g")
        .select(
            "_g",
            F.round(zr, 6).cast("decimal(18,6)").alias("_z"),
            F.round(zr * zr, 6).cast("decimal(28,6)").alias("_z2"),
        )
        .groupBy("_g")
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.sum("_z").alias("_s"),
            F.sum("_z2").alias("_q"),
        )
    )
    m = per_g.agg(
        F.count(F.lit(1)).alias("_k"),
        F.sum("_n").alias("_nt"),
        F.sum("_s").alias("_st"),
        F.sum("_q").alias("_qt"),
        F.sum(
            F.col("_s").cast("double")
            * F.col("_s").cast("double")
            / F.col("_n").cast("double")
        ).alias("_sg2"),
    )
    k = F.col("_k").cast("double")
    nt = F.col("_nt").cast("double")
    st, qt = F.col("_st").cast("double"), F.col("_qt").cast("double")
    ssb = F.col("_sg2") - st * st / nt
    ssw = qt - F.col("_sg2")
    w_stat = (ssb / (k - 1)) / (ssw / (nt - k))
    return m.select(
        F.col("_k").alias("k_groups"),
        F.col("_nt").alias("n"),
        F.round(w_stat, 6).alias("bf_stat"),
    )


def kruskal_wallis(
    df: DataFrame, group_col: str, value_col: Column | str
) -> DataFrame:
    """Kruskal–Wallis H test (rank ANOVA) across k groups, with the
    standard tie correction — the nonparametric k-group partner to
    :func:`anova_f_oneway` for skewed corpus statistics.

    Exactness: combined-sample average ranks stay INTEGERS by doubling
    (2r = 2·cum_below + cnt + 1); per-group doubled rank sums and the
    tie term Σ(t³−t) are exact DECIMAL sums. With doubled rank sums
    R2_g = 2·R_g the statistic is
    H = 3/(n(n+1)) · Σ R2_g²/n_g − 3(n+1), then H' = H/(1 − T/(n³−n));
    the per-group R2_g²/n_g terms reduce over the tiny k-row table
    inside the chi2 determinism budget, rounded at the edge.

    Scale shape: ranks via distinct-value counts + range-derived block
    prefix sums (:func:`_with_range_block`), never a global rank
    window; one extra bounded shuffle keys the per-group rank sums.
    """
    from pyspark.sql import Window

    v = (F.col(value_col) if isinstance(value_col, str) else value_col).cast(
        "double"
    )
    base = df.filter(v.isNotNull() & F.col(group_col).isNotNull()).select(
        F.col(group_col).alias("_g"), v.alias("_v")
    )
    base = managed_persist(base)  # value-rank build + group-sum pass
    per_v = base.groupBy("_v").agg(F.count(F.lit(1)).alias("_c"))
    per_v = _with_range_block(per_v, "_v", "_blk")
    bsums = per_v.groupBy("_blk").agg(F.sum("_c").alias("_bc"))
    w_blk = (
        Window.partitionBy(tiny_table_partition("_blk"))
        .orderBy("_blk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    boff = bsums.select(
        "_blk", F.coalesce(F.sum("_bc").over(w_blk), F.lit(0)).alias("_off")
    )
    w_v = (
        Window.partitionBy("_blk")
        .orderBy("_v")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ranks = per_v.join(F.broadcast(boff), "_blk").select(
        "_v",
        "_c",
        (
            2 * (F.col("_off") + F.coalesce(F.sum("_c").over(w_v), F.lit(0)))
            + F.col("_c")
            + 1
        )
        .cast("decimal(38,0)")
        .alias("_r2"),
    )
    per_g = (
        base.join(ranks.select("_v", "_r2"), "_v")
        .groupBy("_g")
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.sum("_r2").alias("_rs"),
        )
    )
    ties = ranks.agg(
        F.sum(
            F.col("_c").cast("decimal(38,0)") * F.col("_c") * F.col("_c")
            - F.col("_c")
        ).alias("_t")
    )
    m = per_g.crossJoin(F.broadcast(ties)).agg(
        F.count(F.lit(1)).alias("_k"),
        F.sum("_n").alias("_nt"),
        F.sum(
            F.col("_rs").cast("double")
            * F.col("_rs").cast("double")
            / F.col("_n").cast("double")
        ).alias("_rg2"),
        F.first("_t").alias("_ties"),
    )
    nt = F.col("_nt").cast("double")
    h = 3.0 / (nt * (nt + 1)) * F.col("_rg2") - 3 * (nt + 1)
    h_corr = h / (
        1 - F.col("_ties").cast("double") / (nt * nt * nt - nt)
    )
    return m.select(
        F.col("_k").alias("k_groups"),
        F.col("_nt").alias("n"),
        F.round(h_corr, 6).alias("h_stat"),
    )


def dunn_posthoc(
    df: DataFrame, group_col: str, value_col: Column | str,
    alpha: float = 0.05,
) -> DataFrame:
    """Dunn's post-hoc pairwise rank comparison after Kruskal-Wallis
    (Dunn 1964), with the standard tie-corrected variance and
    Benjamini-Hochberg step-up control over the k(k-1)/2 pairs — the
    'WHICH groups differ' answer q_kruskal_wallis's single H cannot
    give.

    Exactness: the same doubled-rank machinery as
    :func:`kruskal_wallis` (integer doubled ranks from distinct-value
    counts, exact DECIMAL rank sums and tie term). With doubled mean
    ranks m2 = 2·mean rank,
    z_ij = (m2_i - m2_j) / (2·sqrt(sigma2·(1/n_i + 1/n_j))) where
    sigma2 = (N(N+1) - T/(N-1))/12, one float epilogue per pair;
    two-sided p via the shared A&S 26.2.17 polynomial; BH over the
    bounded pair table.

    Scale shape: identical to kruskal_wallis until the k-row group
    table, then a k^2-bounded self-join and tiny-partition windows.
    """
    from pyspark.sql import Window

    v = (F.col(value_col) if isinstance(value_col, str) else value_col).cast(
        "double"
    )
    base = df.filter(v.isNotNull() & F.col(group_col).isNotNull()).select(
        F.col(group_col).alias("_g"), v.alias("_v")
    )
    base = managed_persist(base)
    per_v = base.groupBy("_v").agg(F.count(F.lit(1)).alias("_c"))
    per_v = _with_range_block(per_v, "_v", "_blk")
    bsums = per_v.groupBy("_blk").agg(F.sum("_c").alias("_bc"))
    w_blk = (
        Window.partitionBy(tiny_table_partition("_blk"))
        .orderBy("_blk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    boff = bsums.select(
        "_blk", F.coalesce(F.sum("_bc").over(w_blk), F.lit(0)).alias("_off")
    )
    w_v = (
        Window.partitionBy("_blk")
        .orderBy("_v")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ranks = per_v.join(F.broadcast(boff), "_blk").select(
        "_v",
        "_c",
        (
            2 * (F.col("_off") + F.coalesce(F.sum("_c").over(w_v), F.lit(0)))
            + F.col("_c")
            + 1
        )
        .cast("decimal(38,0)")
        .alias("_r2"),
    )
    per_g = (
        base.join(ranks.select("_v", "_r2"), "_v")
        .groupBy("_g")
        .agg(F.count(F.lit(1)).alias("_n"), F.sum("_r2").alias("_rs"))
    )
    glob = per_g.crossJoin(
        F.broadcast(
            ranks.agg(
                F.sum(
                    F.col("_c").cast("decimal(38,0)")
                    * F.col("_c")
                    * F.col("_c")
                    - F.col("_c")
                ).alias("_t")
            )
        )
    ).agg(
        F.sum("_n").alias("_nt"),
        F.first("_t").alias("_ties"),
    )
    a = per_g.select(
        F.col("_g").alias("g1"),
        F.col("_n").alias("n1"),
        F.col("_rs").alias("rs1"),
    )
    b = per_g.select(
        F.col("_g").alias("g2"),
        F.col("_n").alias("n2"),
        F.col("_rs").alias("rs2"),
    )
    nt = F.col("_nt").cast("double")
    sigma2 = (
        nt * (nt + 1) - F.col("_ties").cast("double") / (nt - 1)
    ) / 12.0
    zv = (
        F.col("rs1").cast("double") / F.col("n1")
        - F.col("rs2").cast("double") / F.col("n2")
    ) / (
        2.0
        * F.sqrt(
            sigma2
            * (
                1.0 / F.col("n1").cast("double")
                + 1.0 / F.col("n2").cast("double")
            )
        )
    )
    pairs = (
        a.join(b, F.col("g1") < F.col("g2"))
        .crossJoin(F.broadcast(glob))
        .select("g1", "g2", "n1", "n2", zv.alias("zv"))
    )
    az = F.abs(F.col("zv"))
    t = F.lit(1.0) / (F.lit(1.0) + F.lit(0.2316419) * az)
    poly = t * (
        F.lit(0.319381530)
        + t
        * (
            F.lit(-0.356563782)
            + t
            * (
                F.lit(1.781477937)
                + t * (F.lit(-1.821255978) + t * F.lit(1.330274429))
            )
        )
    )
    pv = (
        F.lit(2.0)
        * (F.exp(-az * az / F.lit(2.0)) / F.lit(2.5066282746310002))
        * poly
    )
    p = pairs.withColumn("pv", pv)
    m = p.agg(F.count(F.lit(1)).alias("m"))
    ranked = p.crossJoin(F.broadcast(m)).withColumn(
        "rnk",
        F.row_number()
        .over(
            Window.partitionBy(tiny_table_partition("g1")).orderBy(
                "pv", "g1", "g2"
            )
        )
        .cast("long"),
    )
    thr = ranked.agg(
        F.coalesce(
            F.max(
                F.when(
                    F.col("pv")
                    <= F.col("rnk") * F.lit(alpha) / F.col("m").cast("double"),
                    F.col("rnk"),
                ).otherwise(F.lit(0))
            ),
            F.lit(0),
        ).alias("cutoff")
    )
    return (
        ranked.crossJoin(F.broadcast(thr))
        .select(
            "g1",
            "g2",
            "n1",
            "n2",
            F.round("zv", 4).alias("z_score"),
            F.round("pv", 6).alias("p_value"),
            "rnk",
            (F.col("rnk") <= F.col("cutoff")).cast("int").alias("rejected"),
        )
        .orderBy("rnk")
    )


def holt_linear(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    value_col: str,
    alpha: float = 0.5,
    beta: float = 0.5,
    horizon: int = 3,
) -> DataFrame:
    """Holt's double-exponential smoothing (level + linear trend) per
    key — the standard public forecasting recurrence
    (l_t = α·y_t + (1−α)(l_{t−1}+b_{t−1});
    b_t = β(l_t−l_{t−1}) + (1−β)b_{t−1}), initialized l₀=y₀,
    b₀=y₁−y₀. Returns one row per key: (key, n, level, trend,
    forecast at t+horizon).

    Determinism: α=β=1/2 are exact binary constants and the update is
    evaluated in a pinned operation order (mul, mul, add) that the
    DuckDB recursive-CTE oracle replays verbatim, so the float
    trajectory is bit-identical across engines; outputs round at the
    edge.

    Scale shape: the recurrence is sequential WITHIN a key
    (spec-mandated, like an ADPCM block) but embarrassingly parallel
    ACROSS keys — ``applyInPandas`` after one shuffle on the key, the
    canonical Spark shape for per-entity state machines. State is
    O(1) per key; no global order, no driver loop.
    """
    import pandas as pd

    out_schema = (
        f"{key_col} long, n long, level double, trend double, forecast double"
    )

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_cols)
        key = pdf[key_col].iloc[0]
        ys = [float(v) for v in pdf[value_col]]
        level = ys[0]
        trend = ys[1] - ys[0] if len(ys) > 1 else 0.0
        for y in ys[1:]:
            prev = level
            level = alpha * y + (1 - alpha) * (level + trend)
            trend = beta * (level - prev) + (1 - beta) * trend
        return pd.DataFrame(
            [[key, len(ys), round(level, 6), round(trend, 6),
              round(level + horizon * trend, 6)]],
            columns=[key_col, "n", "level", "trend", "forecast"],
        )

    return (
        df.filter(F.col(value_col).isNotNull())
        .select(key_col, *order_cols, value_col)
        .groupBy(key_col)
        .applyInPandas(fit, out_schema)
    )


def cuped_lift(
    df: DataFrame,
    unit_col: str,
    value_col: str,
    ts_col: str,
    cutoff: str,
    salt: str = "ab42",
) -> DataFrame:
    """CUPED variance-reduced A/B readout (public Microsoft/Deng et al.
    experimentation technique): per-unit pre-period metric X (before
    ``cutoff``) and post-period metric Y, arm assignment by the
    content-stable md5 bucket of the unit id (never rand() — the same
    determinism rule as operators/sampling), pooled
    theta = cov(X,Y)/var(X), adjusted outcome
    Y' = Y − theta·(X − mean(X)), reported per arm with the achieved
    variance-reduction ratio.

    Scale: one shuffle on unit for the per-unit aggregate (map-side
    combined), one broadcast of the 1-row pooled-moments aggregate —
    no window, no second scan of the raw events. theta and mean(X)
    are rounded (9/6 dp) before the adjustment so both engines apply
    bit-identical coefficients.
    """
    from hw_kafka_streams_spark.operators.dedup import md5h

    pre = F.col(ts_col) < F.lit(cutoff).cast("timestamp")
    per_unit = df.groupBy(F.col(unit_col).alias("unit")).agg(
        F.sum(F.when(pre, F.col(value_col)).otherwise(F.lit(0.0))).alias("x"),
        F.sum(F.when(~pre, F.col(value_col)).otherwise(F.lit(0.0))).alias("y"),
    ).withColumn(
        "arm",
        F.when(
            F.pmod(
                md5h(F.concat(F.col("unit").cast("string"), F.lit(f":{salt}"))),
                F.lit(2),
            )
            == 0,
            F.lit("control"),
        ).otherwise(F.lit("treatment")),
    )
    pooled = per_unit.agg(
        F.round(F.covar_pop("x", "y") / F.var_pop("x"), 9).alias("theta"),
        F.round(F.avg("x"), 6).alias("mx"),
    )
    adj = per_unit.crossJoin(F.broadcast(pooled)).withColumn(
        "y_adj", F.col("y") - F.col("theta") * (F.col("x") - F.col("mx"))
    )
    return (
        adj.groupBy("arm")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_units"),
            F.round(F.avg("y"), 4).alias("mean_y"),
            F.round(F.avg("y_adj"), 4).alias("mean_y_cuped"),
            F.round(F.var_pop("y"), 2).alias("var_y"),
            F.round(F.var_pop("y_adj"), 2).alias("var_y_cuped"),
            F.round(
                F.lit(1.0) - F.var_pop("y_adj") / F.var_pop("y"), 4
            ).alias("var_reduction"),
        )
        .orderBy("arm")
    )


def croston_ses(
    df: DataFrame,
    key_col: str,
    day_col: str,
    alpha: float = 0.5,
) -> DataFrame:
    """Croston's method for intermittent demand (Croston 1972) per
    key: split the demand series into non-zero demand SIZES z_i and
    the INTER-DEMAND intervals p_i (in periods; p_1 = the position of
    the first demand within the span), run simple exponential
    smoothing over each, and forecast demand-per-period z_hat/p_hat —
    the standard spare-parts/sparse-activity forecaster where plain
    SES (or :func:`holt_linear`) biases toward zero between demands.

    Input: one row per (key, day_index, demand>0); ``day_col`` is an
    integer period index where 0 is the span start. Returns one row
    per key: (key, n_demands, z_hat, p_hat, forecast).

    Determinism: alpha = 1/2 is an exact binary constant and the SES
    update l = 0.5*y + 0.5*l runs in a pinned op order, so the float
    trajectory is bit-identical to a DuckDB recursive-CTE replay;
    outputs round at the SPARK edge (HALF_UP) — dyadic trajectories
    of integer demands land exactly on .5 at 6 dp, where Python's
    banker's round() diverges from SQL round.

    Scale shape: sequential within a key, parallel across keys —
    ``applyInPandas`` after one key shuffle (the holt_linear shape).
    """
    import pandas as pd

    out_schema = (
        f"{key_col} long, n_demands long, z_hat double, p_hat double, "
        "forecast double"
    )

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(day_col)
        key = pdf[key_col].iloc[0]
        days = [int(d) for d in pdf[day_col]]
        sizes = [float(v) for v in pdf["demand"]]
        gaps = [float(days[0] + 1)] + [
            float(b - a) for a, b in zip(days, days[1:])
        ]
        lz, lp = sizes[0], gaps[0]
        for z, p in zip(sizes[1:], gaps[1:]):
            lz = alpha * z + (1 - alpha) * lz
            lp = alpha * p + (1 - alpha) * lp
        return pd.DataFrame(
            [[key, len(sizes), lz, lp, lz / lp]],
            columns=[key_col, "n_demands", "z_hat", "p_hat", "forecast"],
        )

    # round at the Spark edge (HALF_UP, matching DuckDB's round) —
    # Python's round() is banker's and the dyadic alpha=1/2
    # trajectories of integer demands land EXACTLY on .5 at 6 dp
    out = df.groupBy(key_col).applyInPandas(fit, out_schema)
    return out.select(
        key_col,
        "n_demands",
        F.round("z_hat", 6).alias("z_hat"),
        F.round("p_hat", 6).alias("p_hat"),
        F.round("forecast", 6).alias("forecast"),
    )
