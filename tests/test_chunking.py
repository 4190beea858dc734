"""Unit tests for chunking + contamination operators.

Fixture-level semantics (window boundaries, tail handling, skew guard);
corpus-level parity is covered by test_oracle_parity (q_doc_chunks,
q_contamination).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hw_kafka_streams_spark.operators.chunking import (
    char_ngram_contamination,
    chunk_documents,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_chunk_windows_and_tail(spark):
    # 10-char text, size 4 / stride 3 -> starts 0,3,6,9; min_len 2 drops
    # the length-1 tail at offset 9.
    df = _docs(spark, [(1, "abcdefghij")])
    out = chunk_documents(df, size=4, stride=3, min_len=2).orderBy("chunk_idx")
    got = [(r.chunk_idx, r.chunk_start, r.chunk) for r in out.collect()]
    assert got == [(0, 0, "abcd"), (1, 3, "defg"), (2, 6, "ghij")]


def test_chunk_short_and_empty_docs(spark):
    df = _docs(spark, [(1, "ab"), (2, "")])
    out = chunk_documents(df, size=4, stride=3, min_len=2)
    rows = out.collect()
    # doc 1 yields its single short-but->=min_len window; doc 2 nothing.
    assert [(r.doc_id, r.chunk) for r in rows] == [(1, "ab")]


def test_chunk_overlap_covers_every_char(spark):
    text = "x" * 1000
    df = _docs(spark, [(1, text)])
    out = chunk_documents(df, size=120, stride=90, min_len=1)
    spans = [(r.chunk_start, r.chunk_start + len(r.chunk)) for r in out.collect()]
    covered = set()
    for a, b in spans:
        covered.update(range(a, b))
    assert covered == set(range(1000))


def test_contamination_counts_and_flag(spark):
    shared = "the quick brown fox jumps over the lazy dog"
    train = _docs(spark, [(1, shared), (2, "completely unrelated training row")])
    test = _docs(
        spark,
        [
            (10, shared),  # fully contaminated
            (11, "nothing in common with training data at all"),
        ],
    )
    out = char_ngram_contamination(train, test, n=20, stride=10)
    got = {r.doc_id: (r.n_hit_grams, r.contaminated) for r in out.collect()}
    assert got[10][0] > 0 and got[10][1] == 1
    assert got[11] == (0, 0)


def test_contamination_max_train_df_guard(spark):
    # A gram present in many train docs is dropped by the guard, so the
    # eval doc built solely from it stops matching.
    boiler = "boilerplate sentence repeated everywhere!"
    train = _docs(spark, [(i, boiler) for i in range(5)])
    test = _docs(spark, [(10, boiler)])
    hits_all = char_ngram_contamination(train, test, n=20, stride=10)
    hits_capped = char_ngram_contamination(
        train, test, n=20, stride=10, max_train_df=3
    )
    assert hits_all.head().n_hit_grams > 0
    assert hits_capped.head().n_hit_grams == 0


def test_contamination_short_eval_docs_excluded(spark):
    train = _docs(spark, [(1, "long enough training document text")])
    test = _docs(spark, [(10, "short")])  # < n chars: no gram basis
    assert char_ngram_contamination(train, test, n=20, stride=10).count() == 0


def test_sequence_pack_matches_naive_cumsum(spark):
    """Block-prefix-sum shape must equal the naive global running sum,
    including across block boundaries (block=2 forces many blocks)."""
    from hw_kafka_streams_spark.operators.chunking import sequence_pack_stats

    texts = ["w " * n for n in [3, 5, 0, 7, 2, 9, 1, 4]]  # doc 2 empty
    df = spark.createDataFrame(
        list(enumerate(t.strip() for t in texts)), "doc_id long, text string"
    )
    out = {
        r.doc_id: r
        for r in sequence_pack_stats(df, capacity=4, block=2).collect()
    }
    assert 2 not in out  # empty doc dropped
    start = 0
    for did, n in [(0, 3), (1, 5), (3, 7), (4, 2), (5, 9), (6, 1), (7, 4)]:
        r = out[did]
        assert r.n_tokens == n
        assert r.first_window == start // 4
        assert r.last_window == (start + n - 1) // 4
        assert r.n_windows == r.last_window - r.first_window + 1
        assert r.spans_boundary == (r.first_window != r.last_window)
        start += n


def test_balanced_token_shards_balance_and_stability(spark, sf_dir):
    """Every doc gets exactly one shard; shard token masses are
    contiguous ranges (differ by at most one doc's tokens); the
    assignment is block-size independent and stable across runs."""
    from pyspark.sql import functions as F

    from hw_kafka_streams_spark.operators.layout import balanced_token_shards
    from hw_kafka_streams_spark.sources.catalog import load_table

    docs = load_table(spark, "documents", sf_dir)
    n = docs.filter(F.length(F.trim("text")) > 0).count()
    out = balanced_token_shards(docs, n_shards=4).collect()
    assert len(out) == n
    assert {r.shard for r in out} <= set(range(4))
    sums = {}
    maxdoc = 0
    for r in out:
        sums[r.shard] = sums.get(r.shard, 0) + r.n_tokens
        maxdoc = max(maxdoc, r.n_tokens)
    assert max(sums.values()) - min(sums.values()) <= 2 * maxdoc
    # block-size independence: the global offsets (hence shards) match
    a = {r.doc_id: r.shard for r in out}
    b = {r.doc_id: r.shard
         for r in balanced_token_shards(docs, n_shards=4, block=7).collect()}
    assert a == b
