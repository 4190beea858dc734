"""Scalar-function battery: string / date / math / case / JSON / array.

All JVM-side built-ins (whole-stage codegen); each with a DuckDB oracle
written to matching semantics (dialect drift handled per-function, e.g.
Spark ``(?iu)`` inline flags vs DuckDB's ``'gi'`` flag argument).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hw_kafka_streams_spark.queries import register
from hw_kafka_streams_spark.sources.catalog import load_table


@register(
    "q_censor_documents",
    oracle="""
        SELECT doc_id,
               regexp_replace(
                 regexp_replace(
                   regexp_replace(text, 'data', '****', 'gi'),
                   'model', '*****', 'gi'),
                 'the', '***', 'gi')                                            AS text,
               lang
        FROM documents
        ORDER BY doc_id
    """,
    doc="Reference censor operator (O6, MessageFilterProcessor.java:31-44) at "
    "scale over documents: fold of case-insensitive literal regexp_replace, "
    "length-preserving mask, pure codegen'd column ops.",
)
def q_censor_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hw_kafka_streams_spark.operators.censor import censor_column

    docs = load_table(spark, "documents", sf_dir)
    return docs.select(
        "doc_id",
        censor_column("text", ["data", "model", "the"]).alias("text"),
        "lang",
    ).orderBy("doc_id")


@register(
    "q_string_funcs",
    oracle="""
        SELECT p_partkey,
               upper(p_name)                          AS name_upper,
               lower(p_brand)                         AS brand_lower,
               substr(p_type, 1, 5)                   AS type_prefix,
               length(p_name)                         AS name_len,
               concat(p_brand, '#', p_type)           AS brand_type,
               replace(p_name, ' ', '_')              AS name_snake,
               trim(p_name)                           AS name_trim,
               lpad(CAST(p_size AS VARCHAR), 4, '0')  AS size_padded,
               CASE WHEN p_name LIKE '%a%' THEN 1 ELSE 0 END AS has_a,
               strpos(p_name, 'a')                    AS a_pos
        FROM part
        ORDER BY p_partkey
    """,
    doc="String function battery over part names.",
)
def q_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, "part", sf_dir)
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.substring("p_type", 1, 5).alias("type_prefix"),
        F.length("p_name").alias("name_len"),
        F.concat(F.col("p_brand"), F.lit("#"), F.col("p_type")).alias("brand_type"),
        F.regexp_replace(F.col("p_name"), " ", "_").alias("name_snake"),
        F.trim("p_name").alias("name_trim"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.when(F.col("p_name").like("%a%"), 1).otherwise(0).alias("has_a"),
        F.instr(F.col("p_name"), "a").alias("a_pos"),
    ).orderBy("p_partkey")


@register(
    "q_date_funcs",
    oracle="""
        SELECT o_orderkey,
               CAST(date_trunc('month', o_orderdate) AS DATE)          AS order_month,
               CAST(year(o_orderdate)    AS INT)                       AS order_year,
               CAST(quarter(o_orderdate) AS INT)                       AS order_quarter,
               CAST(month(o_orderdate)   AS INT)                       AS order_mon,
               CAST(dayofmonth(o_orderdate) AS INT)                    AS order_day,
               CAST(date_diff('day', o_orderdate,
                              TIMESTAMP '2002-01-01 00:00:00') AS INT) AS days_to_2002,
               CAST(o_orderdate + INTERVAL 30 DAY AS DATE)             AS due_date
        FROM orders
        WHERE o_orderkey <= 500
        ORDER BY o_orderkey
    """,
    doc="Date/time function battery: trunc, extract, diff, interval arithmetic.",
)
def q_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, "orders", sf_dir).filter(F.col("o_orderkey") <= 500)
    return o.select(
        "o_orderkey",
        F.date_trunc("month", "o_orderdate").cast("date").alias("order_month"),
        F.year("o_orderdate").alias("order_year"),
        F.quarter("o_orderdate").alias("order_quarter"),
        F.month("o_orderdate").alias("order_mon"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        F.datediff(F.lit("2002-01-01").cast("timestamp"), F.col("o_orderdate")).alias(
            "days_to_2002"
        ),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAY")).cast("date").alias("due_date"),
    ).orderBy("o_orderkey")


@register(
    "q_math_funcs",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               round(abs(l_extendedprice - 50000), 2)        AS abs_delta,
               CAST(ceil(l_quantity)  AS BIGINT)             AS qty_ceil,
               CAST(floor(l_quantity) AS BIGINT)             AS qty_floor,
               round(sqrt(l_extendedprice), 4)               AS price_sqrt,
               round(ln(l_extendedprice + 1), 4)             AS price_ln,
               round(pow(l_discount, 2), 6)                  AS disc_sq,
               CAST(l_orderkey % 7 AS BIGINT)                AS key_mod,
               round(greatest(l_tax, l_discount), 2)         AS max_rate,
               round(least(l_tax, l_discount), 2)            AS min_rate,
               CAST(sign(l_extendedprice - 50000) AS INT)    AS delta_sign
        FROM lineitem
        WHERE l_orderkey <= 300
        ORDER BY l_orderkey, l_linenumber
    """,
    doc="Math function battery.",
)
def q_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir).filter(F.col("l_orderkey") <= 300)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.abs(F.col("l_extendedprice") - 50000), 2).alias("abs_delta"),
        F.ceil("l_quantity").alias("qty_ceil"),
        F.floor("l_quantity").alias("qty_floor"),
        F.round(F.sqrt("l_extendedprice"), 4).alias("price_sqrt"),
        F.round(F.log(F.col("l_extendedprice") + 1), 4).alias("price_ln"),
        F.round(F.pow("l_discount", F.lit(2)), 6).alias("disc_sq"),
        (F.col("l_orderkey") % 7).alias("key_mod"),
        F.round(F.greatest("l_tax", "l_discount"), 2).alias("max_rate"),
        F.round(F.least("l_tax", "l_discount"), 2).alias("min_rate"),
        # signum returns DOUBLE in Spark but TINYINT in DuckDB — the driver
        # hashes raw cells, so 1.0 vs 1 flips the value hash. INT both sides.
        F.signum(F.col("l_extendedprice") - 50000).cast("int").alias("delta_sign"),
    ).orderBy("l_orderkey", "l_linenumber")


@register(
    "q_case_buckets",
    oracle="""
        SELECT CASE WHEN o_totalprice < 50000  THEN 'small'
                    WHEN o_totalprice < 150000 THEN 'medium'
                    WHEN o_totalprice < 300000 THEN 'large'
                    ELSE 'huge' END AS bucket,
               count(*) AS n,
               round(sum(o_totalprice), 2) AS total
        FROM orders
        GROUP BY 1
        ORDER BY bucket
    """,
    doc="CASE WHEN bucketing + aggregation.",
)
def q_case_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, "orders", sf_dir)
    bucket = (
        F.when(F.col("o_totalprice") < 50000, "small")
        .when(F.col("o_totalprice") < 150000, "medium")
        .when(F.col("o_totalprice") < 300000, "large")
        .otherwise("huge")
    )
    return (
        o.groupBy(bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("o_totalprice"), 2).alias("total"))
        .orderBy("bucket")
    )


@register(
    "q_json_extract",
    oracle="""
        SELECT event_type,
               count(*) AS n,
               round(avg(CAST(json_extract_string(props, '$.k') AS INT)), 4) AS avg_k,
               CAST(max(CAST(json_extract_string(props, '$.k') AS INT)) AS INT) AS max_k
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """,
    doc="JSON extraction from the events.props column (reference's JSON serde "
    "analog, MessageSerdes.java:36-61 → from_json/get_json_object).",
)
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, "events", sf_dir)
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        e.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg(k), 4).alias("avg_k"),
            F.max(k).alias("max_k"),
        )
        .orderBy("event_type")
    )


@register(
    "q_from_json_struct",
    oracle="""
        SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k
        FROM events
        WHERE event_id <= 200
        ORDER BY event_id
    """,
    doc="Typed JSON parsing: from_json with explicit schema → struct field "
    "access (the engine's serde layer; null-safe like MessageSerdes:54-56).",
)
def q_from_json_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, "events", sf_dir).filter(F.col("event_id") <= 200)
    parsed = F.from_json("props", "k INT")
    return e.select("event_id", parsed.getField("k").alias("k")).orderBy("event_id")


@register(
    "q_json_corrupt_handling",
    oracle="""
        SELECT event_type,
               count(*) AS n,
               CAST(sum(CASE WHEN NOT json_valid(s) THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_corrupt,
               round(avg(CASE WHEN json_valid(s)
                              THEN CAST(json_extract_string(s, '$.k') AS INT)
                         END), 4) AS avg_k
        FROM (SELECT event_type,
                     CASE WHEN event_id % 7 = 0 THEN '{oops' || props
                          ELSE props END AS s
              FROM events)
        GROUP BY event_type
        ORDER BY event_type
    """,
    doc="Malformed-record tolerance (PERMISSIVE semantics): a "
    "deterministic 1-in-7 subset of props is corrupted, from_json "
    "yields NULL for those rows instead of failing the job, and the "
    "aggregate counts corrupt vs parsed per group — the posture a "
    "100 TB crawl ingest needs (bad records quarantined, not fatal). "
    "The oracle reproduces the corruption and gates on json_valid.",
)
def q_json_corrupt_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, "events", sf_dir)
    s = F.when(F.col("event_id") % 7 == 0, F.concat(F.lit("{oops"), F.col("props"))).otherwise(
        F.col("props")
    )
    k = F.from_json(s, "k INT").getField("k")
    return (
        e.select("event_type", s.alias("s"), k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("k").isNull().cast("int")).cast("bigint").alias("n_corrupt"),
            F.round(F.avg("k"), 4).alias("avg_k"),
        )
        .orderBy("event_type")
    )


@register(
    "q_array_funcs",
    oracle="""
        SELECT vec_id,
               len(embedding)                                   AS dim,
               round(CAST(embedding[1] AS DOUBLE), 4)           AS first_val,
               round(list_aggregate(embedding::DOUBLE[], 'sum'), 2) AS vec_sum,
               round(CAST(list_aggregate(embedding, 'max') AS DOUBLE), 4) AS vec_max,
               round(len(list_filter(embedding, x -> x > 0)), 0) AS n_pos
        FROM embeddings
        WHERE vec_id < 100
        ORDER BY vec_id
    """,
    doc="Array/higher-order functions over embedding vectors (size, index, "
    "aggregate, filter) — all JVM-side, no UDF.",
)
def q_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, "embeddings", sf_dir).filter(F.col("vec_id") < 100)
    dbl = F.col("embedding").cast("array<double>")
    return emb.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(F.element_at(dbl, 1), 4).alias("first_val"),
        F.round(F.aggregate(dbl, F.lit(0.0), lambda acc, x: acc + x), 2).alias("vec_sum"),
        F.round(F.array_max(dbl), 4).alias("vec_max"),
        F.size(F.filter(dbl, lambda x: x > 0)).cast("double").alias("n_pos"),
    ).orderBy("vec_id")


@register(
    "q_collation_fold",
    oracle="""
        WITH toks AS (
          SELECT source, unnest(list_filter(string_split_regex(
                   trim(text), '\\s+'), t -> t <> '')) AS w
          FROM documents
        )
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_tokens,
               CAST(count(DISTINCT w) AS BIGINT) AS vocab_cs,
               CAST(count(DISTINCT lower(w)) AS BIGINT) AS vocab_ci,
               round(1.0 - CAST(count(DISTINCT lower(w)) AS DOUBLE)
                     / count(DISTINCT w), 6) AS fold_rate
        FROM toks GROUP BY source ORDER BY source
    """,
    doc="Collation-aware vocabulary fold (Spark 4 string collations): "
    "per-source distinct-token counts under binary (UTF8_BINARY) vs "
    "case-insensitive (COLLATE UTF8_LCASE) comparison — how much of "
    "a source's vocabulary is mere casing variance, the number that "
    "decides whether a tokenizer needs a lowercase pass. The Spark "
    "side exercises the REAL collation surface (the distinct runs "
    "on a collated string type, not on a lower() projection); the "
    "DuckDB oracle folds with lower(), which agrees on this "
    "corpus's repertoire. Both distincts share one (source, token) "
    "shuffle; partial aggregation applies as usual.",
)
def q_collation_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hw_kafka_streams_spark.operators.text import word_tokens

    docs = load_table(spark, "documents", sf_dir)
    toks = docs.select(
        "source",
        F.explode(word_tokens(F.col("text"))).alias("w"),
    )
    ci = F.expr("w COLLATE UTF8_LCASE")
    return (
        toks.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.countDistinct("w").cast("long").alias("vocab_cs"),
            F.countDistinct(ci).cast("long").alias("vocab_ci"),
            F.round(
                1.0
                - F.countDistinct(ci).cast("double")
                / F.countDistinct("w"),
                6,
            ).alias("fold_rate"),
        )
        .orderBy("source")
    )
