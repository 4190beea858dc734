"""Declarative data-quality expectations (the Deequ/Great-Expectations
idea, Spark-first): a rule set compiles to ONE aggregation pass over the
scan — never a scan per rule — and unpivots to a per-rule verdict table.

The reference (svolga/hw-kafka-streams) has no data-quality surface;
this is the admission gate every 100 TB ingest runs before data is
allowed downstream. All metrics are algebraic (count/sum/min/max/
distinct), so the same partial-aggregation contract that scales the
TPC-H battery scales this: one shuffle of one metrics row per
partition, regardless of rule count.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Rule names are interpolated into a stack(...) SQL expression; restrict
# them to plain identifiers so a quote/comma/backtick can't break (or
# reshape) the generated SQL. Raised at build time, not mid-job.
_SAFE_RULE_NAME = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


@dataclass(frozen=True)
class Expectation:
    """One rule: ``name``, a metric column (aggregate expression), and
    an inclusive [lo, hi] band the metric must land in (None = open)."""

    name: str
    metric: Column
    lo: float | None = None
    hi: float | None = None


def null_rate(col: str) -> Column:
    return F.round(
        F.sum(F.col(col).isNull().cast("long")) / F.count(F.lit(1)), 6
    )


def distinct_ratio(col: str) -> Column:
    return F.round(F.count_distinct(F.col(col)) / F.count(F.lit(1)), 6)


def violation_count(cond: Column) -> Column:
    """Count of rows violating ``cond`` (cond = the EXPECTED predicate)."""
    return F.sum((~cond).cast("long")).cast("double")


def filter_funnel(df: DataFrame, stages: list[tuple[str, Column]]) -> DataFrame:
    """Sequential filter-pipeline audit: how many rows survive each
    stage, where a row reaches stage k only if it passed stages 1..k-1
    (the semantics of a real quality-filter chain).

    ONE aggregation pass regardless of stage count: each stage's
    survivor count is ``sum(stage₁ ∧ … ∧ stageₖ)`` — the cumulative
    conjunctions all evaluate over the same scan, partial-aggregate
    map-side, and shuffle as a single row (the
    :func:`check_expectations` contract; a naive per-stage
    ``df.filter(...).count()`` loop would scan the corpus once per
    stage). The 1-row result unpivots driver-side via ``inline``.

    Returns ``(stage_idx, stage, n_in, n_pass, n_dropped, drop_rate)``
    ordered by stage — the audit table a data-prep run publishes so a
    threshold change's blast radius is visible before a 100 TB re-run.
    """
    if not stages:
        raise ValueError("at least one stage")
    names = [n for n, _ in stages]
    if len(set(names)) != len(names):
        raise ValueError("duplicate stage names")
    for n in names:
        if not _SAFE_RULE_NAME.match(n):
            raise ValueError(f"stage name {n!r} is not a safe identifier")
    cum = None
    aggs = [F.count(F.lit(1)).alias("_total")]
    for name, cond in stages:
        cum = cond if cum is None else (cum & cond)
        aggs.append(F.sum(cum.cast("long")).alias(name))
    agg = df.agg(*aggs)
    entries = F.array(
        *[
            F.struct(
                F.lit(i + 1).alias("stage_idx"),
                F.lit(name).alias("stage"),
                F.col("_total" if i == 0 else names[i - 1]).alias("n_in"),
                F.col(name).alias("n_pass"),
            )
            for i, name in enumerate(names)
        ]
    )
    return agg.select(F.inline(entries)).select(
        "stage_idx",
        "stage",
        "n_in",
        "n_pass",
        (F.col("n_in") - F.col("n_pass")).alias("n_dropped"),
        F.round(
            F.when(
                F.col("n_in") > 0, (F.col("n_in") - F.col("n_pass")) / F.col("n_in")
            ).otherwise(0.0),
            6,
        ).alias("drop_rate"),
    )


def check_expectations(df: DataFrame, rules: list[Expectation]) -> DataFrame:
    """Evaluate all rules in one aggregation; return
    ``(rule, value, lo, hi, passed)`` — one row per rule.

    The metrics all aggregate in the same pass (one job, one shuffle of
    a single combined row); the unpivot to rule rows is a driver-side
    stack over a 1-row result, so rule-set size never multiplies scan
    cost.

    Rule names must be plain identifiers (``[A-Za-z_][A-Za-z0-9_]*``)
    — they are spliced into the stack() SQL string; anything else
    raises ``ValueError`` before a job starts.
    """
    for r in rules:
        if not _SAFE_RULE_NAME.match(r.name):
            raise ValueError(
                f"expectation name {r.name!r} is not a safe identifier "
                "([A-Za-z_][A-Za-z0-9_]*): it would be interpolated into "
                "SQL"
            )
    if len({r.name for r in rules}) != len(rules):
        raise ValueError("duplicate expectation names")
    agg = df.agg(*[r.metric.cast("double").alias(r.name) for r in rules])
    stacked = agg.select(
        F.expr(
            "stack({n}, {args}) as (rule, value)".format(
                n=len(rules),
                args=", ".join(f"'{r.name}', {r.name}" for r in rules),
            )
        )
    )
    bounds = F.create_map(
        *[
            x
            for r in rules
            for x in (
                F.lit(r.name),
                F.struct(
                    # Finite sentinels, not +/-inf: infinities round-trip
                    # differently through some client layers and add no
                    # expressiveness for data-quality bands.
                    F.lit(float(r.lo) if r.lo is not None else -1e18).alias("lo"),
                    F.lit(float(r.hi) if r.hi is not None else 1e18).alias("hi"),
                ),
            )
        ]
    )
    return stacked.select(
        "rule",
        F.round(F.col("value"), 6).alias("value"),
        F.round(bounds[F.col("rule")]["lo"], 6).alias("lo"),
        F.round(bounds[F.col("rule")]["hi"], 6).alias("hi"),
        (
            (F.col("value") >= bounds[F.col("rule")]["lo"])
            & (F.col("value") <= bounds[F.col("rule")]["hi"])
        ).alias("passed"),
    )


GOPHER_STOPWORDS = ["and", "be", "have", "of", "that", "the", "to", "with"]


def gopher_rules(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 50,
    max_words: int = 100_000,
) -> DataFrame:
    """The Gopher document-quality rule set (Rae et al. 2021, Table A1)
    as per-document verdicts — the standard pre-training filter battery
    C4/Gopher/Dolma-style pipelines run before anything expensive:

    - r_word_count:   ``min_words ≤ words ≤ max_words``
    - r_mean_wordlen: mean word length in [3, 10]
    - r_symbol:       (# + ellipsis) to word ratio ≤ 0.1
    - r_bullet:       < 90% of lines start with a bullet
    - r_ellipsis:     < 30% of lines end with an ellipsis
    - r_alpha:        ≥ 80% of words contain an alphabetic character
    - r_stopwords:    ≥ 2 distinct common stop words present

    Returns one row per document with the raw signals, each rule's
    boolean, and ``passes_gopher`` (AND of all).

    Scale shape: rules 1-5 are vectorized regexp/length arithmetic in
    a narrow map over the scan; rules 6-7 need within-document token
    grouping, so they come from ONE explode + id-keyed aggregation
    (the repetition_metrics shape) joined back — two scans total, one
    shuffle, no windows. Every expression stays in the RE2 regex
    subset so the DuckDB oracle replays it exactly.
    """
    from hw_kafka_streams_spark.operators.text import word_tokens

    txt = F.col(text_col)
    n_lines = F.regexp_count(txt, F.lit(r"\n")) + 1
    n_bullet = F.regexp_count(txt, F.lit(r"(?m)^[ \t]*[-*•]"))
    n_ellip = F.regexp_count(txt, F.lit(r"(?m)(\.\.\.|…)$"))
    n_symbol = F.regexp_count(txt, F.lit(r"#|\.\.\.|…"))

    tok_stats = (
        df.select(
            F.col(id_col).alias("id"),
            F.explode(word_tokens(F.lower(txt))).alias("t"),
        )
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum(F.length("t")).alias("_chars"),
            F.sum(F.regexp_like("t", F.lit("[a-z]")).cast("int")).alias(
                "_alpha_words"
            ),
            F.countDistinct(
                F.when(F.col("t").isin(GOPHER_STOPWORDS), F.col("t"))
            ).alias("n_stop_distinct"),
        )
    )
    base = df.select(
        F.col(id_col).alias("id"),
        n_lines.alias("n_lines"),
        n_bullet.alias("_bul"),
        n_ellip.alias("_ell"),
        n_symbol.alias("_sym"),
    )
    j = base.join(tok_stats, "id", "left").select(
        F.col("id").alias(id_col),
        F.coalesce("n_words", F.lit(0)).alias("n_words"),
        F.round(
            F.col("_chars") / F.col("n_words"), 6
        ).alias("mean_word_len"),
        F.round(F.col("_sym") / F.col("n_words"), 6).alias("symbol_ratio"),
        F.round(F.col("_bul") / F.col("n_lines"), 6).alias("bullet_line_frac"),
        F.round(F.col("_ell") / F.col("n_lines"), 6).alias(
            "ellipsis_line_frac"
        ),
        F.round(F.col("_alpha_words") / F.col("n_words"), 6).alias(
            "alpha_word_frac"
        ),
        F.coalesce("n_stop_distinct", F.lit(0)).alias("n_stop_distinct"),
    )
    r = {
        "r_word_count": (F.col("n_words") >= min_words)
        & (F.col("n_words") <= max_words),
        "r_mean_wordlen": (F.col("mean_word_len") >= 3)
        & (F.col("mean_word_len") <= 10),
        "r_symbol": F.col("symbol_ratio") <= 0.1,
        "r_bullet": F.col("bullet_line_frac") < 0.9,
        "r_ellipsis": F.col("ellipsis_line_frac") < 0.3,
        "r_alpha": F.col("alpha_word_frac") >= 0.8,
        "r_stopwords": F.col("n_stop_distinct") >= 2,
    }
    out = j
    for name, cond in r.items():
        out = out.withColumn(name, F.coalesce(cond, F.lit(False)))
    passes = None
    for name in r:
        passes = F.col(name) if passes is None else (passes & F.col(name))
    return out.withColumn("passes_gopher", passes)
