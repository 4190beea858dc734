#!/usr/bin/env python
"""Generate SCALING.md: measured wall-clock for representative queries
across the full 100× test range (sf0.001 → sf0.1), steady-state
(best of 2). Near-linear growth across two orders of magnitude is the
empirical check behind every "survives scale-up" claim in PLANS.md —
a super-linear row here means a quadratic candidate join or a
collapsed-partition plan that 1000× data would kill.

Usage: python tools/scale_probe.py [out_md]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hw_kafka_streams_spark.queries import queries  # noqa: E402
from hw_kafka_streams_spark.cache import release_managed_caches  # noqa: E402
from hw_kafka_streams_spark.session import get_spark  # noqa: E402

SFS = ["0.001", "0.01", "0.1"]
PROBES = [
    "q1_pricing_summary",      # scan + hash agg
    "q5_supplier_volume",      # multi-join
    "q_sessionize",            # window
    "q_dedup_exact",           # hash-groupBy dedup
    "q_dedup_minhash_lsh",     # signatures + bucket join
    "q_dedup_jaccard",         # inverted-index self-join
    "q_text_quality",          # regex-heavy narrow map
    "q_llm_prep_pipeline",     # composed prep pipeline
    "q21_sole_return_supplier",  # fact-fact semi+anti joins
    "q_similarity_topk",       # Arrow numpy cosine kernel
    "q_embedding_quantize",    # Arrow quantization kernel
    "q_boilerplate_prune",     # passage df + broadcast anti + rebuild
    "q_unigram_lm_score",      # corpus-join + decimal sums
    "q_sequence_pack",         # block-prefix-sum global offsets
    "q_dedup_simhash",         # Arrow simhash + pigeonhole join
    "q_ts_pattern_match",      # lead()-based sliding correlation
    "q_auc_rank",              # block-prefix-sum rank statistic
    "q_neardup_decontam",      # eval-probe against banded train index
    "q_concurrent_sessions",   # interval-overlap join (time buckets)
    "q_mad_outliers",          # median-of-deviations two-phase agg
    "q_window_rank",           # block-prefix-sum global ntile
    "q_data_mixture",          # plan agg + broadcast-rate narrow filter
    "q_semantic_dedup",        # Lloyd train + within-cluster pairs
    "q_filter_funnel",         # one-pass cumulative-conjunction audit
    "q_feature_hashing",       # hashed-TF doc-keyed aggs
    "q_source_overlap",        # (source, shingle) inverted-index join
    "q_token_shards",          # block-prefix-sum shard assignment
    "q_dedup_cascade",         # exact-then-minhash staged dedup
    "q_quantized_topk",        # int8 coarse + fp32 re-rank retrieval
    "q_lsh_eval",              # blocking recall/precision meta-eval
    "q_prefix_filter_dups",    # rarest-first prefix blocking (lossless)
    "q_quality_deciles",       # broadcast-threshold quantile calibration
    "q_containment_pairs",     # asymmetric excerpt containment
    "q_bloom_prune_dedup",     # bloom bitmap build + pruned anti join
    "q_dsir_weights",          # hashed-ngram importance model + scoring
    "q_bigram_lm_score",       # corpus bigram model + decimal sums
    "q_char_entropy",          # (doc, char)-keyed entropy agg
    "q_naive_bayes_langid",    # NB train + broadcast-model argmax
    "q_ewma_halflife",         # 8-lag partitioned-window smoother
    "q_seasonal_residuals",    # (type, hour) baseline + flag pass
    "q_compression_quality",   # Arrow zlib narrow map
    "q_similarity_pq_topk",    # PQ train/encode/ADC + re-rank
    "q_similarity_ivfpq_topk",  # IVF probe pruning + PQ codes
    "q_span_dedup",            # gram inverted-index + array verify
    "q_substring_dedup",       # stride-1 anchors + diagonal run-merge
    "q_knn_classify",          # broadcast-batch cosine + integer vote
    "q_winsorized_stats",      # broadcast-threshold robust means
    "q_ctfidf_source_terms",   # class tf-idf over (class, term) aggs
    "q_source_vocab_jaccard",  # per-group vocab inverted-index join
    "q_zipf_heaps",            # top-k rank fit + per-group OLS moments
    "q_tfidf_cosine_pairs",    # sparse weighted-cosine inverted index
    "q_bigram_backoff_score",  # held-out LM scoring w/ LEFT-join backoff
    "q_time_travel",           # snapshot create/merge/delete + 3 pinned reads
    # round-6 lesson: q_jaro_winkler_pairs went quadratic at sf0.1
    # (25 M candidate pairs, 235 s) and no probe caught it because it
    # wasn't in this list — every new pair-generating or kernel-heavy
    # query joins the probe the round it lands
    "q_jaro_winkler_pairs",    # capped blocked linkage + JW kernel
    "q_countmin_freq",         # CMS sketch build + heavy-hitter probe
    "q_multimodal_jpeg",       # pure-numpy JPEG pixel decode fan-out
    "q_soundex_blocking",      # JVM-side phonetic key vocabulary agg
    "q_containment_topk",      # output-bounded per-anchor WindowGroupLimit
    "q_block_dedup_rewrite",   # block explode + md5-keyed first-occurrence
    "q_skipgram_pairs",        # +/-2 window self-join (pair-generating)
    "q_mann_kendall",          # per-key quadratic pair fold (like theil_sen)
    "q_bootstrap_ci",          # x100 replicate fan-out into partial agg
    "q_multimodal_flac",       # FLAC decode kernel fan-out (row-sized)
    "q_bfs_hops",              # frontier joins over co-occurrence edges
    "q_kcenter_coreset",       # k corpus scans x Arrow min-dist kernel
    "q_max_coverage_select",   # residual-postings anti-join per round
    # round-7 additions: the composed snapshot-pipeline (commit-heavy
    # but the restartable-build shape worth ratcheting) and the
    # lossless-JPEG kernel fan-out; q_unigram_tokenize stays out
    # (vocab-sized, the textrank policy)
    "q_corpus_build_e2e",      # dedup->quality->mixture->pack over snapshots
    "q_multimodal_jpeg_lossless",  # predictive-JPEG decode fan-out
    # round-7 additions: the data-sized graph-extraction self-joins
    # feeding the two new iterative graph ops; the JPEG-LS and MCLV
    # codec fixtures are fixed-size (the ADPCM policy) and stay out
    "q_kcore_parts",           # peeling rounds over a fact self-join graph
    "q_hits_ship_graph",       # hub/authority loop over supplier->part
    # round-9c additions: the pair-generating / corpus-join shapes
    # (the round-6 lesson — every new one joins the probe)
    "q_kn_lm_score",           # held-out KN scoring, 3 LEFT-joined counts
    "q_jsd_sources",           # vocab self-join bounded by n_sources^2
    "q_phrase_search",         # posting-list (doc,pos) adjacency join
    "q_cond_entropy",          # (source,w1,w2) counts + source rollup
    "q_source_dup_matrix",     # (fp,source) self-join, n_sources^2 cap
    "q_quantile_normalize",    # distinct-score cum tables + range join
    "q_winnowing_dups",        # windowed-min selection + fp pair join
    # round-9d additions: the session's pair-generating / corpus-join
    # shapes (round-6 lesson applies)
    "q_bleu_pairs",            # clipped-gram joins off candidate pairs
    "q_dedup_threshold_sweep",  # 5-threshold sweep over one candidate set
    "q_ql_dirichlet",          # Dirichlet LM: dl-table column expr + tf join
    "q_sprt_audit",            # block-prefix-sum integer LLR path
    "q_ppmi_power_iteration",  # skipgram pair shuffle + vocab-bounded iters
    "q_collation_fold",        # collated-distinct corpus scan
    # round-10 headline additions (the ratchet convention)
    "q_anderson_darling",      # grouped-EDF pass over distinct lengths
    "q_chow_test",             # conditional-sum pivot over segment moments
    "q_breusch_pagan",         # two-pass residual moments, literal fit
    "q_cooks_distance",        # broadcast-fit narrow map + TakeOrdered
    "q_transfer_entropy",      # hour-grid self-join joint counts
    "q_rbo_rankers",           # dual tokenize/rank stacks + prefix overlap
    # round-11 additions: the pair-generating / corpus-join shapes
    # (round-6 lesson applies); the domain-bounded survival/rank
    # epilogues (nelson_aalen, log_rank, dunn) and the fixture-capped
    # hier-DCT codec stay out per the standing policies
    "q_kendall_tau",           # hour-grid pair join, sign-product fold
    "q_rouge_pairs",           # recall twin of the clipped-gram joins
    "q_burrows_delta",         # (source,word) counts + MFW z-score pairs
    "q_ql_jelinek_mercer",     # JM LM: tf x dl keyed join + const branch
    "q_press_loocv",           # broadcast-fit LOO narrow map, DECIMAL sums
    # round-11b headline additions (ratchet); the fixture-capped
    # 12-bit codec and the 25-user-capped croston recurrence stay out
    # per the standing fixed-size policies
    "q_kmv_distinct",          # distinct-word scan + TakeOrdered sketch
    "q_hll_det_twin",          # distinct-word scan + 64-register agg
    "q_cramer_von_mises",      # grouped-EDF pass over distinct lengths
    "q_wilcoxon_signed_rank",  # keyed agg + distinct-magnitude ranks
    "q_page_hinkley",          # hour-grid prefix sums, domain-bounded
    "q_white_test",            # two-pass residual moments + x^4 sums
    "q_chrf_pairs",            # char-gram clip joins off candidate pairs
]


def main() -> None:
    out_md = sys.argv[1] if len(sys.argv) > 1 else "SCALING.md"
    spark = get_spark("scale_probe")
    qmap = queries()

    results: dict[str, dict[str, float]] = {}
    for sf in SFS:
        sf_dir = f"/root/testdata/sf{sf}"
        spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()
        for name in PROBES:
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                qmap[name](spark, sf_dir).collect()
                best = min(best, time.perf_counter() - t0)
            results.setdefault(name, {})[sf] = best
            # isolate probes: operators persist intermediates (by
            # design — shared multi-consumer subtrees); left cached
            # they pile up session-wide and GC pressure skews LATER
            # probes' numbers, so each probe starts cache-clean
            release_managed_caches()  # drains the cache.py registry too
            spark.catalog.clearCache()

    lines = [
        "# SCALING — measured wall-clock across 100× data (generated by "
        "tools/scale_probe.py)",
        "",
        "Steady-state (best of 2) on local[32]. `×(0.001→0.1)` is the "
        "growth factor over a 100× data increase — near or below 100× "
        "(often far below: fixed per-query overhead dominates small SFs) "
        "means the plan scales; well above signals quadratic work.",
        "",
        "| query | sf0.001 | sf0.01 | sf0.1 | ×(0.001→0.1) |",
        "|---|---|---|---|---|",
    ]
    for name in PROBES:
        r = results[name]
        growth = r["0.1"] / r["0.001"] if r["0.001"] > 0 else float("inf")
        lines.append(
            f"| {name} | {r['0.001']:.2f}s | {r['0.01']:.2f}s | {r['0.1']:.2f}s "
            f"| {growth:.1f}× |"
        )
    # PRESERVE appended sections (sf1 probes, ANN recall audit): they
    # are written by other tools and live after the generated table
    tail = ""
    if os.path.exists(out_md):
        prev = open(out_md).read()
        idx = prev.find("\n## ")
        if idx != -1:
            tail = prev[idx:]
    with open(out_md, "w") as f:
        f.write("\n".join(lines) + "\n" + tail)
    print(f"wrote {out_md} (kept {len(tail)} bytes of appended sections)")


if __name__ == "__main__":
    main()
