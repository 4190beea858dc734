"""Unit tests for embedding maintenance kernels (normalize/quantize)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from hw_kafka_streams_spark.operators.embeddings import (
    l2_normalize_arrow,
    quantize_int8_arrow,
    quantize_stats_arrow,
)


def _df(spark, vecs):
    return spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "vec_id int, embedding array<double>"
    )


def test_l2_normalize_unit_norm_and_zero_passthrough(spark):
    df = _df(spark, [[3.0, 4.0], [0.0, 0.0]])
    rows = df.select("vec_id", l2_normalize_arrow(F.col("embedding")).alias("n")).collect()
    by_id = {r["vec_id"]: r["n"] for r in rows}
    assert abs(by_id[0][0] - 0.6) < 1e-12 and abs(by_id[0][1] - 0.8) < 1e-12
    assert by_id[1] == [0.0, 0.0]


def test_quantize_roundtrip_error_small_and_range_exact(spark):
    df = _df(spark, [[1.0, -0.5, 0.25, 0.0]])
    r = df.select(quantize_stats_arrow(F.col("embedding")).alias("s")).head()["s"]
    assert abs(r["max_abs"] - 1.0) < 1e-12
    assert abs(r["norm"] - math.sqrt(1 + 0.25 + 0.0625)) < 1e-12
    # max reconstruction error per element is (1/254) of the range
    assert r["mse_ppm"] < (0.5 / 127) ** 2 * 1e6


def test_quantize_int8_values(spark):
    df = _df(spark, [[1.0, -1.0, 0.5, 0.0]])
    q = df.select(quantize_int8_arrow(F.col("embedding")).alias("q")).head()["q"]
    assert q == [127, -127, 64, 0]  # 0.5*127+0.5 = 64.0 -> floor 64


def test_quantize_zero_vector_is_zero(spark):
    df = _df(spark, [[0.0, 0.0, 0.0]])
    q = df.select(quantize_int8_arrow(F.col("embedding")).alias("q")).head()["q"]
    r = df.select(quantize_stats_arrow(F.col("embedding")).alias("s")).head()["s"]
    assert q == [0, 0, 0]
    assert r["mse_ppm"] == 0.0 and r["norm"] == 0.0
