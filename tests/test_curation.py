"""Round-6 curation operators: span dedup, split-leakage audit,
c-TF-IDF, kNN classify, OLS fit (Zipf/Heaps building block)."""

from __future__ import annotations

import math


def test_char_span_pairs_hand_computed(spark):
    from hw_kafka_streams_spark.operators.dedup import char_span_pairs

    # docs 1 and 2 share two distinct 10-char spans (identical prefix
    # of 30 chars => grams at offsets 0 and 10); doc 3 is disjoint
    shared = "abcdefghijklmnopqrstuvwxyz0123"
    rows = [
        (1, shared + " tail one........"),
        (2, shared + " other tail......"),
        (3, "zzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzz"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = char_span_pairs(df, n=10, stride=10, max_df=None, min_shared=2).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.doc_a, r.doc_b) == (1, 2)
    # offsets 0,10 identical; offset 20 differs after the shared prefix
    assert r.n_shared_spans == 3  # grams at 0, 10, 20 ("uvwxyz0123")


def test_char_span_pairs_max_df_drops_boilerplate(spark):
    from hw_kafka_streams_spark.operators.dedup import char_span_pairs

    # one 10-char span shared by ALL four docs (boilerplate) plus a
    # pair-only span between docs 1-2; df cap 2 keeps only the latter
    boiler = "0123456789"
    pair = "abcdefghij"
    rows = [
        (1, boiler + pair),
        (2, boiler + pair),
        (3, boiler + "qqqqqqqqqq"),
        (4, boiler + "rrrrrrrrrr"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = char_span_pairs(df, n=10, stride=10, max_df=2, min_shared=1).collect()
    assert {(r.doc_a, r.doc_b, r.n_shared_spans) for r in out} == {(1, 2, 1)}


def test_split_leakage_audit_counts(spark):
    from hw_kafka_streams_spark.operators.sampling import split_leakage_audit

    rows = [
        # source a: docs on both sides -> leaky, 1 test doc leaked
        ("a", 1),
        ("a", 1),
        ("a", 0),
        # source b: train only
        ("b", 1),
        # source c: test only -> not leaky
        ("c", 0),
        ("c", 0),
    ]
    df = spark.createDataFrame(rows, "source string, split int")
    r = split_leakage_audit(df, "split", "source").collect()[0]
    assert (r.n_train, r.n_test) == (3, 3)
    assert r.n_leaky_groups == 1
    assert r.n_leaked_test_docs == 1


def test_ctfidf_top_terms_pick_class_markers(spark):
    from hw_kafka_streams_spark.operators.text import ctfidf_terms

    rows = [
        (1, "a", "common common apple apple apple"),
        (2, "a", "common apple"),
        (3, "b", "common common banana banana banana"),
        (4, "b", "common banana"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = ctfidf_terms(df, group_col="source", top_k=1).collect()
    top = {r.source: r.term for r in out}
    assert top == {"a": "apple", "b": "banana"}


def test_knn_classify_majority_and_tiebreak(spark):
    from hw_kafka_streams_spark.operators.similarity import knn_classify

    # 2-D vectors: labeled cluster 0 along +x, cluster 1 along +y.
    labeled = spark.createDataFrame(
        [
            (10, [1.0, 0.0], 0),
            (11, [0.9, 0.1], 0),
            (12, [0.8, 0.05], 0),
            (13, [0.0, 1.0], 1),
            (14, [0.1, 0.9], 1),
        ],
        "vec_id long, embedding array<double>, label int",
    )
    unl = spark.createDataFrame(
        [(1, [1.0, 0.05], 0), (2, [0.05, 1.0], 1)],
        "vec_id long, embedding array<double>, label int",
    )
    out = {r.vec_id: r for r in knn_classify(unl, labeled, k=3).collect()}
    assert out[1].pred_label == 0 and out[1].correct == 1
    assert out[2].pred_label == 1 and out[2].correct == 1
    assert out[1].n_votes == 3  # all three x-cluster vectors vote


def test_ols_fit_exact_line_and_r2(spark):
    from hw_kafka_streams_spark.operators.stats import ols_fit

    # y = 3x + 2 exactly -> slope 3, intercept 2, r2 = 1
    rows = [(float(x), 3.0 * x + 2.0) for x in range(1, 8)]
    df = spark.createDataFrame(rows, "x double, y double")
    r = ols_fit(df, "x", "y").collect()[0]
    assert r.n == 7
    assert math.isclose(r.slope, 3.0, abs_tol=1e-9)
    assert math.isclose(r.intercept, 2.0, abs_tol=1e-9)
    assert math.isclose(r.r2, 1.0, abs_tol=1e-9)


def test_ols_fit_matches_numpy_polyfit(spark):
    import numpy as np

    from hw_kafka_streams_spark.operators.stats import ols_fit

    xs = [1.0, 2.0, 3.5, 4.25, 6.0, 7.5]
    ys = [2.1, 2.9, 4.6, 5.2, 7.1, 8.4]
    df = spark.createDataFrame(list(zip(xs, ys)), "x double, y double")
    r = ols_fit(df, "x", "y").collect()[0]
    slope, intercept = np.polyfit(np.array(xs), np.array(ys), 1)
    # inputs are DECIMAL(18,6)-rounded, so agreement to ~1e-5 is exact
    assert math.isclose(r.slope, float(slope), abs_tol=1e-5)
    assert math.isclose(r.intercept, float(intercept), abs_tol=1e-5)
