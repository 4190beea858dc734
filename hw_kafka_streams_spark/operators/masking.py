"""Deterministic pretraining-objective mask PLANNING — pure column
expressions; shuffle-free at scale (the one conditional exchange is
``spread_small``'s small-input parallelism floor, a no-op on any scan
that is already at least cluster-wide).

The last data-prep step before a masked-LM or span-corruption
pretraining run is deciding, per token, whether it is masked and what
replaces it (BERT: 15% masked, of which 80% → [MASK], 10% → random
token, 10% kept; Devlin et al. 2018 §3.1. T5 span corruption reports
span counts over the same plan; Raffel et al. 2020 §3.1.4). At 100 TB
this must be (a) deterministic — re-sharding or re-running a job must
not re-roll the masks, or loss curves stop being comparable across
restarts — and (b) row-local, because anything per-token that
shuffles is dead at scale.

Both properties come from the same move as ``sampling.hash_bucket``:
the "randomness" for position p of doc d is ``md5h(d || ':' || p)``
(the DuckDB-twin 60-bit hash), so the whole plan is a narrow map over
the token array (``transform``/``filter`` array expressions bound via
the same single-evaluation trick as ``dedup.shingle_array``) and every
statistic is an exact integer the SQL oracle replays bit-for-bit.

Reference parity note: the reference app (svolga/hw-kafka-streams,
KafkaStreamApp.java) has no training-data surface; this is north-star
LLM-pipeline coverage.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hw_kafka_streams_spark.operators.dedup import md5h
from hw_kafka_streams_spark.operators.text import word_tokens


def mlm_mask_plan(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    mask_pct: int = 15,
) -> DataFrame:
    """Per-document BERT-style mask-plan statistics.

    Position p (1-based) of doc d is MASKED iff
    ``md5h(d || ':' || p) % 100 < mask_pct``; a masked position's
    ACTION is ``md5h(d || ':' || p || ':a') % 10`` — 0-7 → [MASK]
    token, 8 → random token, 9 → keep original (the 80/10/10 split).

    Returns one row per doc: ``n_tokens``, ``n_masked``, the three
    action counts, ``n_spans`` (maximal runs of consecutive masked
    positions — the unit T5-style span corruption denoises), and
    ``first_masked`` (1-based position of the first mask, 0 if none).
    All integers; all derived row-locally from the token array — the
    plan stays one narrow projection; at scale no exchange is added
    (``spread_small`` below only fires when the scan has fewer
    partitions than the cluster has cores, i.e. tiny local inputs
    whose ~1.5 md5 evaluations per token otherwise run single-
    threaded).
    """
    from hw_kafka_streams_spark.operators.skew import spread_small

    # Narrow projection FIRST (ADVICE r11): the conditional spread then
    # moves only (id, text), never whole input rows.
    df = spread_small(df.select(id_col, text_col), key=id_col)
    idstr = F.col(id_col).cast("string")

    def masked_at(p: Column) -> Column:
        h = md5h(F.concat(idstr, F.lit(":"), p.cast("string")))
        return F.pmod(h, F.lit(100)) < mask_pct

    def action_at(p: Column) -> Column:
        h = md5h(F.concat(idstr, F.lit(":"), p.cast("string"), F.lit(":a")))
        return F.pmod(h, F.lit(10))

    toks = word_tokens(F.col(text_col))
    n = F.size(toks)
    mask_arr = F.when(
        n >= 1, F.transform(F.sequence(F.lit(1), n), masked_at)
    ).otherwise(F.array().cast("array<boolean>"))

    def _stats(m: Column) -> Column:
        # m is a BOUND lambda variable (single evaluation of the mask
        # array per row — same trick as dedup.shingle_array; inlining
        # mask_arr would re-hash every position once per statistic).
        size = F.size(m)
        pos = F.sequence(F.lit(1), size)
        masked_pos_arr = F.when(
            size >= 1,
            F.filter(pos, lambda p: F.element_at(m, p)),
        ).otherwise(F.array().cast("array<int>"))

        def _stats2(mp: Column) -> Column:
            # mp (the masked positions) is ALSO bound: the unbound
            # version inlined the filter(pos, …) tree into every
            # statistic (~6 evaluations per row). Likewise the action
            # hashes are bound below — the three act-counts used to
            # re-run action_at (one md5 each) per masked position per
            # count, 3x the hashing the plan needs.
            acts_arr = F.transform(mp, action_at)

            def _stats3(acts: Column) -> Column:
                def act_count(lo: int, hi: int) -> Column:
                    return F.size(
                        F.filter(acts, lambda a: a.between(lo, hi))
                    )

                # F.get is 0-based and NULL-safe out of bounds
                # (element_at would raise under ANSI for p-1 == 0), so
                # position p's predecessor (1-based p-1) is get(m, p-2).
                span_starts = F.size(
                    F.filter(
                        mp,
                        lambda p: (p == 1)
                        | ~F.coalesce(F.get(m, p - 2), F.lit(False)),
                    )
                )
                return F.struct(
                    size.alias("n_tokens"),
                    F.size(mp).alias("n_masked"),
                    act_count(0, 7).alias("n_mask_tok"),
                    act_count(8, 8).alias("n_rand_tok"),
                    act_count(9, 9).alias("n_keep_tok"),
                    span_starts.alias("n_spans"),
                    F.coalesce(F.get(mp, 0), F.lit(0)).alias(
                        "first_masked"
                    ),
                )

            return F.element_at(
                F.transform(F.array(acts_arr), _stats3), 1
            )

        return F.element_at(
            F.transform(F.array(masked_pos_arr), _stats2), 1
        )

    st = F.element_at(F.transform(F.array(mask_arr), _stats), 1)
    return df.select(
        F.col(id_col),
        st["n_tokens"].alias("n_tokens"),
        st["n_masked"].alias("n_masked"),
        st["n_mask_tok"].alias("n_mask_tok"),
        st["n_rand_tok"].alias("n_rand_tok"),
        st["n_keep_tok"].alias("n_keep_tok"),
        st["n_spans"].alias("n_spans"),
        st["first_masked"].alias("first_masked"),
    )
