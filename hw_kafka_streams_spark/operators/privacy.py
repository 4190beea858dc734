"""Privacy-risk audits for training-data compliance.

PII *redaction* (operators/text.redact_pii) removes direct
identifiers; these audits quantify the RE-IDENTIFICATION risk that
remains in the structured columns — the k-anonymity / l-diversity
framework (Sweeney 2002; Machanavajjhala et al. 2007):

- a row is k-anonymous if at least k rows share its quasi-identifier
  combination (an attacker knowing someone's quasi-identifiers cannot
  narrow them below k candidates);
- an equivalence class is l-diverse if its sensitive attribute takes
  at least l distinct values (k-anonymity alone fails when all k rows
  share the same sensitive value — the homogeneity attack).

Scale shape: one quasi-identifier-keyed count plus one distinct-count
off the same shuffle; the report is one aggregation over the
class-sized table. No windows, no joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def k_anonymity_audit(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str | None = None,
    k: int = 5,
    l_threshold: int = 2,
) -> DataFrame:
    """One-row re-identification risk report.

    Returns ``(n_rows, n_classes, k_anonymity, n_rows_below_k,
    pct_rows_below_k[, l_diversity, n_classes_below_l])`` where
    ``k_anonymity`` is the minimum equivalence-class size (the dataset
    IS min-class-size-anonymous), ``n_rows_below_k`` counts rows whose
    class is smaller than ``k`` (the rows a k-suppression pass would
    drop), and — when ``sensitive_col`` is given — ``l_diversity`` is
    the minimum distinct-sensitive-value count over classes.
    """
    aggs = [F.count(F.lit(1)).alias("_sz")]
    if sensitive_col is not None:
        aggs.append(F.countDistinct(sensitive_col).alias("_l"))
    classes = df.groupBy(*quasi_cols).agg(*aggs)
    out_aggs = [
        F.sum("_sz").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_classes"),
        F.min("_sz").cast("long").alias("k_anonymity"),
        F.sum(F.when(F.col("_sz") < k, F.col("_sz")).otherwise(0))
        .cast("long")
        .alias("n_rows_below_k"),
        F.round(
            F.sum(F.when(F.col("_sz") < k, F.col("_sz")).otherwise(0))
            / F.sum("_sz"),
            6,
        ).alias("pct_rows_below_k"),
    ]
    if sensitive_col is not None:
        out_aggs.append(F.min("_l").cast("long").alias("l_diversity"))
        out_aggs.append(
            F.sum((F.col("_l") < l_threshold).cast("int"))
            .cast("long")
            .alias("n_classes_below_l")
        )
    return classes.agg(*out_aggs)


def luhn_valid(cand):
    """Column expression: Luhn mod-10 checksum validity of a 16-digit
    candidate string (ISO/IEC 7812) — the validation step that
    separates real payment-card numbers from arbitrary 16-digit runs,
    cutting the false-positive rate of regex-only PII scrubbing. Pure
    higher-order-function arithmetic (transform + aggregate), JVM-side
    and codegen-friendly: from the right, every second digit doubles
    (minus 9 when > 9) and the sum must divide by 10 — for a 16-digit
    string that doubles the odd 1-based positions."""
    from pyspark.sql import Column

    c = cand if isinstance(cand, Column) else F.col(cand)
    digits = F.transform(
        F.sequence(F.lit(1), F.lit(16)),
        lambda i: c.substr(i, F.lit(1)).cast("int"),
    )
    contrib = F.transform(
        F.zip_with(
            digits,
            F.sequence(F.lit(1), F.lit(16)),
            lambda d, i: F.struct(d.alias("d"), i.alias("i")),
        ),
        lambda s: F.when(
            s["i"] % 2 == 1,
            F.when(s["d"] * 2 > 9, s["d"] * 2 - 9).otherwise(s["d"] * 2),
        ).otherwise(s["d"]),
    )
    total = F.aggregate(contrib, F.lit(0), lambda a, x: a + x)
    return (total % 10) == 0


def cc_candidate_audit(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """Per-document payment-card PII audit: extract 16-digit
    candidates, split them by Luhn validity, and emit last-4 masked
    forms of the VALID ones only (the scrub a compliance pipeline
    would apply). One zero-shuffle vectorized pass — regexp extract +
    HOF checksum per row, no UDF."""
    cands = F.expr(
        rf"regexp_extract_all({text_col}, '\\b\\d{{16}}\\b', 0)"
    )
    valid = F.filter(cands, luhn_valid)
    return df.select(
        F.col(id_col),
        F.size(cands).alias("n_candidates"),
        F.size(valid).alias("n_valid"),
        (F.size(cands) - F.size(valid)).alias("n_invalid"),
        F.array_join(
            F.transform(
                valid,
                lambda c: F.concat(F.lit("****"), c.substr(13, 4)),
            ),
            ",",
        ).alias("masked_valid"),
    )
