"""Extras battery: approx-distinct tolerance, pandas-UDF parity."""

from __future__ import annotations

from pyspark.sql import functions as F

from hw_kafka_streams_spark.queries import REGISTRY, _load_all

_load_all()


def test_approx_distinct_within_tolerance(spark, sf_dir):
    # q_approx_distinct now emits the tolerance check itself (exact count
    # + within-5% boolean) so the driver can value-hash it.
    [r] = REGISTRY["q_approx_distinct"].fn(spark, sf_dir).collect()
    assert r.exact_orders > 0 and r.exact_parts > 0
    assert r.orders_within_5pct and r.parts_within_5pct


def test_censor_udf_matches_builtin(spark):
    """The pandas-UDF censor and the plan-time regexp fold must agree."""
    from hw_kafka_streams_spark.operators.censor import censor_column
    from hw_kafka_streams_spark.operators.udfs import make_censor_udf

    words = ["Политика", "1C", "data"]
    df = spark.createDataFrame(
        [("политика data x",), ("1c и 1С",), (None,), ("DATA Data dAtA",)],
        "text string",
    )
    out = df.select(
        censor_column("text", words).alias("builtin"),
        make_censor_udf(words)(F.col("text")).alias("udf"),
    ).collect()
    for r in out:
        assert r.builtin == r.udf


def test_weighted_mean_udf_matches_builtin(spark, sf_dir):
    from hw_kafka_streams_spark.operators.udfs import weighted_mean, weighted_mean_builtin
    from hw_kafka_streams_spark.sources.catalog import load_table

    li = load_table(spark, "lineitem", sf_dir)
    # grouped-agg pandas UDFs cannot mix with built-in aggs in one agg()
    u = li.groupBy("l_returnflag").agg(
        F.round(weighted_mean("l_extendedprice", "l_quantity"), 6).alias("u")
    )
    b = li.groupBy("l_returnflag").agg(
        F.round(
            weighted_mean_builtin(F.col("l_extendedprice"), F.col("l_quantity")), 6
        ).alias("b")
    )
    got = u.join(b, "l_returnflag").collect()
    for r in got:
        assert abs(r.u - r.b) < 1e-4


def test_sentence_split_udtf(spark):
    from hw_kafka_streams_spark.operators.udfs import make_sentence_split_udtf

    SentenceSplit = make_sentence_split_udtf()
    spark.udtf.register("sentence_split", SentenceSplit)
    rows = spark.sql(
        "SELECT s.* FROM (SELECT 'One two. Three! Four five six?' AS t), "
        "LATERAL sentence_split(t) s"
    ).collect()
    assert [(r.sentence, r.n_words) for r in rows] == [
        ("One two.", 2),
        ("Three!", 1),
        ("Four five six?", 3),
    ]


def test_aho_corasick_mask_basic():
    from hw_kafka_streams_spark.operators.udfs import _AhoCorasick

    ac = _AhoCorasick(["Политика", "1C", "data"])
    assert ac.mask("Политика React") == "******** React"
    assert ac.mask("полиТИКА!") == "********!"
    assert ac.mask("1С") == "1С"        # Cyrillic С untouched
    assert ac.mask("my DATA set") == "my **** set"
    assert ac.mask("") == ""
    assert ac.mask("no hits here") == "no hits here"


def test_aho_corasick_overlap_and_substring():
    from hw_kafka_streams_spark.operators.udfs import _AhoCorasick

    # substring pattern: both 'he' and 'she' end at the same scan point
    ac = _AhoCorasick(["she", "he"])
    assert ac.mask("she said") == "*** said"
    assert ac.mask("the he") == "t** **"  # 'he' inside 'the' masked too


def test_aho_corasick_udf_matches_regex_fold(spark):
    from hw_kafka_streams_spark.operators.censor import censor_column
    from hw_kafka_streams_spark.operators.udfs import make_aho_corasick_censor_udf

    words = ["Политика", "1C", "data", "model"]
    docs = spark.createDataFrame(
        [("политика data MODEL x",), ("plain text",), (None,), ("1c 1С",)],
        "text string",
    )
    out = docs.select(
        censor_column("text", words).alias("rx"),
        make_aho_corasick_censor_udf(words)(F.col("text")).alias("ac"),
    ).collect()
    for r in out:
        assert r.rx == r.ac


def test_aho_corasick_udf_on_documents(spark, sf_dir):
    """Automaton vs regex fold over the real documents table."""
    from hw_kafka_streams_spark.operators.censor import censor_column
    from hw_kafka_streams_spark.operators.udfs import make_aho_corasick_censor_udf
    from hw_kafka_streams_spark.sources.catalog import load_table

    words = ["data", "training", "neural", "language"]
    docs = load_table(spark, "documents", sf_dir)
    diff = docs.select(
        censor_column("text", words).alias("rx"),
        make_aho_corasick_censor_udf(words)(F.col("text")).alias("ac"),
    ).filter(F.col("rx") != F.col("ac"))
    assert diff.count() == 0


def test_hash_split_disjoint_stable_fractions(spark, sf_dir):
    from hw_kafka_streams_spark.operators.sampling import hash_split
    from hw_kafka_streams_spark.sources.catalog import load_table

    docs = load_table(spark, "documents", sf_dir)
    n = docs.count()
    splits = hash_split(docs, "doc_id", {"train": 0.8, "eval": 0.1, "test": 0.1})
    ids = {k: {r.doc_id for r in v.select("doc_id").collect()} for k, v in splits.items()}
    assert sum(len(s) for s in ids.values()) == n  # disjoint & complete
    assert not (ids["train"] & ids["eval"]) and not (ids["eval"] & ids["test"])
    assert abs(len(ids["train"]) / n - 0.8) < 0.05
    # stability: same split on re-run
    again = hash_split(docs, "doc_id", {"train": 0.8, "eval": 0.1, "test": 0.1})
    assert {r.doc_id for r in again["eval"].select("doc_id").collect()} == ids["eval"]


def test_reservoir_per_key(spark, sf_dir):
    from hw_kafka_streams_spark.operators.sampling import reservoir_per_key
    from hw_kafka_streams_spark.sources.catalog import load_table

    docs = load_table(spark, "documents", sf_dir)
    sampled = reservoir_per_key(docs, "lang", 3, order_hint="doc_id")
    counts = {r.lang: r.n for r in sampled.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert all(v <= 3 for v in counts.values()) and counts


def test_sql_entry_point(spark, sf_dir):
    from hw_kafka_streams_spark.sql import run_sql

    df = run_sql(
        spark,
        "SELECT l_returnflag, count(*) AS n FROM lineitem GROUP BY 1 ORDER BY 1",
        sf_dir,
    )
    rows = df.collect()
    assert len(rows) >= 2 and all(r.n > 0 for r in rows)


def test_approx_percentile_rank_accuracy(spark, sf_dir):
    """The sketch's value must sit at (approximately) the requested
    rank: fraction of group values <= approx within p ± 2%. Comparing
    VALUES against the exact interpolated percentile is ill-posed on
    small heavy-tailed groups; rank accuracy is the sketch's actual
    contract."""
    from collections import defaultdict

    from hw_kafka_streams_spark.sources.catalog import load_table

    approx = {
        r.event_type: {"p25": r.p25, "p50": r.p50, "p90": r.p90, "p99": r.p99}
        for r in REGISTRY["q_percentiles_approx"].fn(spark, sf_dir).collect()
    }
    values = defaultdict(list)
    for r in load_table(spark, "events", sf_dir).select("event_type", "value").collect():
        values[r.event_type].append(r.value)
    for et, ps in approx.items():
        vs = sorted(values[et])
        for name, p in [("p25", 0.25), ("p50", 0.50), ("p90", 0.90), ("p99", 0.99)]:
            rank = sum(1 for v in vs if v <= ps[name]) / len(vs)
            assert p - 0.02 <= rank <= p + 0.02 or rank >= p, (et, name, rank)


def test_hll_partial_union_within_tolerance(spark, sf_dir):
    from hw_kafka_streams_spark.queries import REGISTRY
    from hw_kafka_streams_spark.sources.catalog import load_table

    _load_all()
    rows = {
        r["event_type"]: r["n_distinct_users"]
        for r in REGISTRY["q_hll_partial_union"].fn(spark, sf_dir).collect()
    }
    e = load_table(spark, "events", sf_dir)
    exact_all = e.select("user_id").distinct().count()
    assert abs(rows["__all__"] - exact_all) / max(exact_all, 1) < 0.02
    for r in e.groupBy("event_type").agg(F.countDistinct("user_id").alias("n")).collect():
        assert abs(rows[r["event_type"]] - r["n"]) / max(r["n"], 1) < 0.02


def test_kll_quantiles_within_rank_tolerance(spark, sf_dir):
    """KLL(k=200) guarantees ~1.3% rank error; assert each sketch
    quantile's true rank is within 2% of the target rank."""
    from hw_kafka_streams_spark.queries import REGISTRY
    from hw_kafka_streams_spark.sources.catalog import load_table

    _load_all()
    rows = {
        r["event_type"]: r
        for r in REGISTRY["q_kll_quantiles"].fn(spark, sf_dir).collect()
    }
    e = load_table(spark, "events", sf_dir)
    vals = sorted(r["value"] for r in e.select("value").collect())
    n = len(vals)
    import bisect

    for p, col in [(0.5, "p50"), (0.95, "p95"), (0.99, "p99")]:
        est = rows["__all__"][col]
        true_rank = bisect.bisect_right(vals, est) / n
        assert abs(true_rank - p) < 0.02, (col, est, true_rank)


def test_theta_overlap_within_tolerance(spark, sf_dir):
    """Theta intersection/union/difference estimates vs exact set
    algebra on (user_id, day) keys."""
    from hw_kafka_streams_spark.queries import REGISTRY
    from hw_kafka_streams_spark.sources.catalog import load_table

    _load_all()
    est = REGISTRY["q_theta_overlap"].fn(spark, sf_dir).first()
    e = load_table(spark, "events", sf_dir)
    days = e.filter(F.col("event_type").isin("view", "purchase")).select(
        "event_type",
        F.concat_ws("|", F.col("user_id"), F.to_date("ts")).alias("ud"),
    )
    v = {r["ud"] for r in days.filter(F.col("event_type") == "view").collect()}
    p = {r["ud"] for r in days.filter(F.col("event_type") == "purchase").collect()}
    for got, exact in [
        (est["n_view_and_purchase"], len(v & p)),
        (est["n_view_or_purchase"], len(v | p)),
        (est["n_view_only"], len(v - p)),
    ]:
        assert abs(got - exact) / max(exact, 1) < 0.02, (got, exact)
