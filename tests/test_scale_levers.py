"""Scale levers: bucketed co-located joins (no exchange) and salted
skew joins (correctness parity with the plain join)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hw_kafka_streams_spark.operators.skew import salted_join
from hw_kafka_streams_spark.plans import physical_plan
from hw_kafka_streams_spark.sources.bucketing import read_table, write_bucketed
from hw_kafka_streams_spark.sources.catalog import load_table


def test_bucketed_join_is_shuffle_free(spark, sf_dir):
    o = load_table(spark, "orders", sf_dir)
    li = load_table(spark, "lineitem", sf_dir)
    write_bucketed(o, "orders_b", ["o_orderkey"], n_buckets=8)
    write_bucketed(li, "lineitem_b", ["l_orderkey"], n_buckets=8)

    ob, lb = read_table(spark, "orders_b"), read_table(spark, "lineitem_b")
    joined = ob.join(lb, ob.o_orderkey == lb.l_orderkey).filter(
        F.col("o_totalprice") > 0
    )
    plan = physical_plan(joined)
    assert "Exchange hashpartitioning" not in plan, plan
    # sanity: same rowcount as the unbucketed join
    n_plain = o.join(li, o.o_orderkey == li.l_orderkey).filter(
        F.col("o_totalprice") > 0
    ).count()
    assert joined.count() == n_plain


def test_bucketed_agg_is_shuffle_free(spark):
    lb = read_table(spark, "lineitem_b")
    agg = lb.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("q"))
    assert "Exchange hashpartitioning" not in physical_plan(agg)


@pytest.mark.parametrize("how", ["inner", "left"])
def test_salted_join_matches_plain(spark, sf_dir, how):
    li = load_table(spark, "lineitem", sf_dir).select("l_orderkey", "l_quantity")
    o = load_table(spark, "orders", sf_dir).select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    plain = li.join(o, "l_orderkey", how)
    salted = salted_join(li, o, "l_orderkey", salt_factor=4, how=how)
    assert salted.count() == plain.count()
    a = plain.groupBy("l_orderkey").count().orderBy("l_orderkey").collect()
    b = salted.groupBy("l_orderkey").count().orderBy("l_orderkey").collect()
    assert a == b


def test_dynamic_partition_pruning_reaches_fact_scan(spark, tmp_path, sf_dir):
    """At 100 TB the fact table is partition-laid-out on a dim-joinable
    key; a selective dim filter must prune fact PARTITIONS at runtime
    (DPP), not scan-then-filter. Assert the dynamic pruning subquery is
    injected into the partitioned scan and the result matches the
    unpruned join."""
    fact_dir = str(tmp_path / "orders_parts")
    orders = load_table(spark, "orders", sf_dir)
    orders.write.partitionBy("o_orderstatus").parquet(fact_dir)

    dim = spark.createDataFrame(
        [("F", "keep"), ("O", "drop"), ("P", "drop")], "st string, label string"
    )
    fact = spark.read.parquet(fact_dir)
    joined = fact.join(dim, fact.o_orderstatus == dim.st).where(
        dim.label == "keep"
    )
    plan = physical_plan(joined)
    assert "dynamicpruning" in plan.lower(), plan[:2000]

    got = joined.agg(F.count(F.lit(1)).alias("n")).collect()[0].n
    exp = orders.filter(F.col("o_orderstatus") == "F").count()
    assert got == exp


def test_spread_small_widens_single_split_scan(spark, sf_dir):
    """The round-11 parallelism floor: a single-split scan is spread to
    defaultParallelism; results are partitioning-invariant."""
    from hw_kafka_streams_spark.operators.skew import spread_small

    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    n = spark.sparkContext.defaultParallelism
    assert docs.rdd.getNumPartitions() < n  # single-row-group fixture
    spread = spread_small(docs, key="doc_id")
    assert spread.rdd.getNumPartitions() == n
    # keyed spread is deterministic and value-preserving
    assert sorted(r.doc_id for r in spread.select("doc_id").collect()) == sorted(
        r.doc_id for r in docs.select("doc_id").collect()
    )


def test_spread_small_noop_when_already_wide(spark, sf_dir, tmp_path):
    """A source whose scan is already at least cluster-wide (>=
    defaultParallelism row groups across its files) must get NO
    exchange — the 100 TB path is untouched. Round 12: the width probe
    reads parquet footers off the relation's file list instead of
    forcing a plan-to-RDD translation (VERDICT r11 item 9), so 'wide'
    is a property of the SOURCE files."""
    from hw_kafka_streams_spark.operators.skew import spread_small

    n = spark.sparkContext.defaultParallelism
    wide_dir = str(tmp_path / "docs_wide")
    load_table(spark, "documents", sf_dir).repartition(n + 3).write.parquet(
        wide_dir
    )
    docs = spark.read.parquet(wide_dir).select("doc_id", "text")
    out = spread_small(docs, key="doc_id")
    assert out is docs  # identical object: no node added at all


def test_spread_small_noop_on_non_file_source(spark):
    """In-memory relations have no input files; the probe must resolve
    to 'wide — do nothing' rather than guess or force planning."""
    from hw_kafka_streams_spark.operators.skew import spread_small

    df = spark.range(10).selectExpr("id as doc_id")
    assert spread_small(df, key="doc_id") is df


def test_mlm_mask_plan_hashes_actions_once(spark, sf_dir):
    """The round-11 rewrite binds the masked-position and action-hash
    arrays as lambda variables: within each output column's expression
    tree the ':a'-suffixed action md5 now appears exactly once (it used
    to be inlined once per act-count filter — 3 evaluations per masked
    position, 21 total across the 7 output columns that each print the
    bound struct tree)."""
    import re

    from hw_kafka_streams_spark.operators.masking import mlm_mask_plan

    docs = load_table(spark, "documents", sf_dir).limit(50)
    plan = physical_plan(mlm_mask_plan(docs))
    n_out_cols = 7
    # Anchored to the action-hash md5 input tail (ADVICE r11: a bare
    # ':a' count flakes on any path/config/column name containing it):
    # concat(..., cast(lambda x_N as string), :a) is the action_at
    # expression and nothing else prints this shape.
    hits = len(re.findall(r"cast\(lambda [^)]+ as string\), :a\)", plan))
    assert 1 <= hits <= n_out_cols, (hits, plan.count(":a"))


def test_gorilla_block_stats_chunked_equals_whole_series(spark, sf_dir):
    """Round-12: (series, wall-clock-block) chunking must leave the
    per-series aggregates identical to a one-block-per-series build
    (sum/min/max over blocks == over the whole series), while actually
    cutting each series into >1 block so parallelism is no longer
    key-bounded."""
    from hw_kafka_streams_spark.operators.gorillacodec import (
        gorilla_block_stats,
    )
    from hw_kafka_streams_spark.sources.catalog import load_table

    ev = load_table(spark, "events", sf_dir)
    keys = ["event_type", "n_points", "sum_cents", "ts_min_us", "ts_max_us"]
    day = gorilla_block_stats(ev).select(*keys).orderBy("event_type")
    # one giant block per series: span > data range => single chunk,
    # the pre-round-12 shape
    whole = (
        gorilla_block_stats(ev, block_us=1 << 60)
        .select(*keys)
        .orderBy("event_type")
    )
    assert day.collect() == whole.collect()
    # the default span genuinely splits the fixture: total compressed
    # bytes exceed the single-block build's (each extra block pays two
    # raw 64-bit heads), proving >1 block per series actually formed
    tot_day = gorilla_block_stats(ev).agg(F.sum("block_bytes")).collect()[0][0]
    tot_whole = (
        gorilla_block_stats(ev, block_us=1 << 60)
        .agg(F.sum("block_bytes"))
        .collect()[0][0]
    )
    assert tot_day > tot_whole
