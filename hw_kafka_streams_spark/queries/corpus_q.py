"""Corpus-preparation battery: chunking, decontamination, length
histogram, heavy hitters — over the ``documents`` table.

North-star LLM-pipeline extensions (the reference's only text operator
is the censor transform, MessageFilterProcessor.java:22-47); every
query here has an exact DuckDB oracle so the driver value-hash-checks
it at sf0.01.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hw_kafka_streams_spark.operators import chunking as C
from hw_kafka_streams_spark.operators.sampling import hash_bucket
from hw_kafka_streams_spark.operators.text import word_tokens
from hw_kafka_streams_spark.queries import register
from hw_kafka_streams_spark.sources.catalog import load_table


@register(
    "q_doc_chunks",
    oracle="""
        SELECT doc_id,
               CAST(s // 90 AS INT) AS chunk_idx,
               s AS chunk_start,
               CAST(length(substr(text, CAST(s AS INT) + 1, 120)) AS BIGINT)
                   AS chunk_len,
               md5(substr(text, CAST(s AS INT) + 1, 120)) AS chunk_md5
        FROM (SELECT doc_id, text,
                     unnest(generate_series(0, greatest(length(text) - 1, 0),
                                            90)) AS s
              FROM documents)
        WHERE length(substr(text, CAST(s AS INT) + 1, 120)) >= 30
        ORDER BY doc_id, chunk_idx
    """,
    doc="Overlapping character-window chunking (size 120 / stride 90 / "
    "min tail 30) — the pre-tokenization split of an LLM pipeline. "
    "sequence→posexplode→substring is a fully narrow, codegen'd "
    "pipeline: zero shuffles, scales linearly with input bytes "
    "(operators/chunking.chunk_documents).",
)
def q_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    chunks = C.chunk_documents(docs, size=120, stride=90, min_len=30)
    return chunks.select(
        "doc_id",
        "chunk_idx",
        "chunk_start",
        F.length("chunk").cast("long").alias("chunk_len"),
        F.md5(F.col("chunk").cast("binary")).alias("chunk_md5"),
    ).orderBy("doc_id", "chunk_idx")


@register(
    "q_contamination",
    oracle="""
        WITH base AS (
            SELECT doc_id, lower(text) AS lt,
                   CAST(('0x' || substring(md5(doc_id::VARCHAR || ':7'), 1, 15))
                        AS BIGINT) % 10 AS bucket
            FROM documents WHERE length(text) >= 20
        ),
        grams AS (
            SELECT doc_id, bucket,
                   substr(lt, CAST(s AS INT) + 1, 20) AS gram
            FROM (SELECT doc_id, bucket, lt,
                         unnest(generate_series(0, length(lt) - 20, 10)) AS s
                  FROM base)
        ),
        train AS (SELECT DISTINCT gram FROM grams WHERE bucket < 8),
        test AS (SELECT DISTINCT doc_id, gram FROM grams WHERE bucket >= 8),
        hits AS (SELECT doc_id, count(*) AS n_hit_grams
                 FROM test JOIN train USING (gram) GROUP BY doc_id)
        SELECT b.doc_id,
               coalesce(h.n_hit_grams, 0) AS n_hit_grams,
               CAST(coalesce(h.n_hit_grams, 0) > 0 AS INT) AS contaminated
        FROM (SELECT DISTINCT doc_id FROM base WHERE bucket >= 8) b
        LEFT JOIN hits h USING (doc_id)
        ORDER BY b.doc_id
    """,
    doc="Eval-set decontamination: strided character 20-grams, md5-"
    "bucketed 80/20 train/eval split (DuckDB-twin hash), distinct "
    "train grams inner-joined to eval grams, hit count per eval doc. "
    "One shuffle on the gram; operators/chunking."
    "char_ngram_contamination adds a max_train_df skew guard for the "
    "crawl-scale path (disabled here so the SQL twin is exact).",
)
def q_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    bucket = hash_bucket("doc_id", denom=10, seed=7, hash_mode="md5")
    docs_b = docs.withColumn("_bucket", bucket)
    train = docs_b.filter(F.col("_bucket") < 8)
    test = docs_b.filter(F.col("_bucket") >= 8)
    out = C.char_ngram_contamination(train, test, n=20, stride=10)
    return out.orderBy("doc_id")


@register(
    "q_doc_length_hist",
    oracle="""
        SELECT CASE WHEN n_chars < 0 THEN 0
                    WHEN n_chars >= 4000 THEN 9
                    ELSE CAST(floor(n_chars / 500.0) AS INT) + 1 END AS bucket,
               count(*) AS n_docs,
               min(n_chars) AS min_chars,
               max(n_chars) AS max_chars,
               round(CAST(sum(n_chars) AS DOUBLE) / count(*), 2) AS avg_chars
        FROM documents
        GROUP BY 1 ORDER BY bucket
    """,
    doc="Document-length histogram via width_bucket(n_chars, 0, 4000, 8) "
    "— corpus shape profiling before filtering. The oracle recomputes "
    "the bucket arithmetically (DuckDB lacks width_bucket); avg is an "
    "exact integer-sum division so no float summation-order drift.",
)
def q_doc_length_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    b = F.width_bucket(F.col("n_chars"), F.lit(0), F.lit(4000), F.lit(8))
    return (
        docs.groupBy(b.cast("int").alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
            F.round(
                F.sum("n_chars").cast("double") / F.count(F.lit(1)), 2
            ).alias("avg_chars"),
        )
        .orderBy("bucket")
    )


@register(
    "q_heavy_hitters",
    oracle="""
        WITH toks AS (
            SELECT unnest(list_filter(
                       string_split_regex(trim(lower(text)), '\\s+'),
                       t -> t <> '')) AS token
            FROM documents
        ),
        tot AS (SELECT count(*) AS n_total FROM toks)
        SELECT token,
               count(*) AS cnt,
               round(count(*) / (SELECT n_total FROM tot), 6) AS share
        FROM toks
        GROUP BY token
        HAVING count(*) >= 0.001 * (SELECT n_total FROM tot)
        ORDER BY cnt DESC, token
    """,
    doc="Heavy hitters: tokens above a 0.1% frequency threshold. Exact "
    "two-phase hash aggregation (map-side partial combine collapses "
    "the token stream before the single shuffle); the scalar total is "
    "a broadcast 1-row aggregate. At stream scale the same contract "
    "is served by a Misra-Gries sketch in applyInPandasWithState; the "
    "exact batch form IS the 100 TB shape for bounded vocabularies.",
)
def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    toks = docs.select(
        F.explode(word_tokens(F.lower(F.col("text")))).alias("token")
    )
    total = toks.agg(F.count(F.lit(1)).alias("_n_total"))
    return (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .join(F.broadcast(total))
        .filter(F.col("cnt") >= 0.001 * F.col("_n_total"))
        .select(
            "token",
            "cnt",
            F.round(F.col("cnt") / F.col("_n_total"), 6).alias("share"),
        )
        .orderBy(F.desc("cnt"), "token")
    )


@register(
    "q_fuzzy_pairs",
    oracle="""
        WITH names AS (
            SELECT DISTINCT p_name AS name,
                   regexp_extract(p_name, '[^ ]+$') AS blk,
                   length(p_name) AS len
            FROM part
        )
        SELECT a.name AS name_a, b.name AS name_b,
               CAST(levenshtein(a.name, b.name) AS INT) AS dist
        FROM names a JOIN names b
          ON a.blk = b.blk AND a.name < b.name
         AND abs(a.len - b.len) <= 2
        WHERE levenshtein(a.name, b.name) <= 2
        ORDER BY name_a, name_b
    """,
    doc="Blocked fuzzy matching: distinct part names, blocked on the "
    "last word, Levenshtein <= 2 within a block (+ length band) — "
    "entity-resolution-style near-dup pairs without an all-pairs "
    "cross join (operators/dedup.fuzzy_name_pairs).",
)
def q_fuzzy_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hw_kafka_streams_spark.operators.dedup import fuzzy_name_pairs

    p = load_table(spark, "part", sf_dir)
    return fuzzy_name_pairs(p, "p_name", max_dist=2).orderBy("name_a", "name_b")


_TR_STOP = ("a", "the", "and", "of", "to", "in", "is", "on", "for")


def _textrank_oracle(damping: float = 0.85, iters: int = 3) -> str:
    """Unrolled-CTE twin of TextRank keyword extraction: the SAME
    pagerank recurrence as _pagerank_oracle (extras_q) over the word
    co-occurrence graph (window <=2 within a document, symmetric,
    stopword-filtered), per-iteration 6dp rounding."""
    stop = ", ".join(f"'{w}'" for w in _TR_STOP)
    ctes = [
        """WITH tok AS MATERIALIZED (
          SELECT doc_id,
                 generate_subscripts(string_split_regex(trim(lower(text)),
                                                        '\\s+'), 1) AS pos,
                 unnest(string_split_regex(trim(lower(text)), '\\s+')) AS w
          FROM documents WHERE text IS NOT NULL
        )""",
        f"""tf AS MATERIALIZED (
          SELECT doc_id, pos, w FROM tok
          WHERE regexp_matches(w, '^[a-z]+$') AND w NOT IN ({stop})
        )""",
        """pair AS (
          SELECT a.w AS src, b.w AS dst
          FROM tf a JOIN tf b
            ON a.doc_id = b.doc_id
           AND b.pos - a.pos BETWEEN 1 AND 2
           AND a.w <> b.w
        )""",
        """e AS MATERIALIZED (
          SELECT src, dst, CAST(count(*) AS DOUBLE) AS w FROM (
            SELECT src, dst FROM pair
            UNION ALL
            SELECT dst AS src, src AS dst FROM pair
          ) GROUP BY 1, 2
        )""",
        "nodes AS MATERIALIZED (SELECT src AS node FROM e UNION SELECT dst FROM e)",
        "nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes)",
        "outw AS (SELECT src, sum(w) AS ow FROM e GROUP BY 1)",
        """ne AS MATERIALIZED (SELECT e.src, e.dst, e.w / o.ow AS share
         FROM e JOIN outw o ON e.src = o.src)""",
        "r0 AS (SELECT node, round(1.0 / nn.n, 6) AS rank FROM nodes, nn)",
    ]
    for i in range(1, iters + 1):
        ctes.append(
            f"""r{i} AS MATERIALIZED (SELECT nodes.node,
               round((1 - {damping}) / nn.n + {damping} * coalesce(c.inflow, 0.0), 6)
                 AS rank
         FROM nodes CROSS JOIN nn
         LEFT JOIN (SELECT ne.dst AS node, sum(r{i - 1}.rank * ne.share) AS inflow
                    FROM ne JOIN r{i - 1} ON ne.src = r{i - 1}.node
                    GROUP BY 1) c
           ON c.node = nodes.node)"""
        )
    body = ",\n        ".join(ctes)
    return f"""
        {body}
        SELECT node AS keyword, round(rank, 4) AS rank
        FROM r{iters}
        ORDER BY rank DESC, keyword LIMIT 30
    """


@register(
    "q_textrank_keywords",
    oracle=_textrank_oracle(),
    doc="TextRank keyword extraction (public Mihalcea & Tarau 2004): "
    "corpus-wide word co-occurrence graph (window <=2 within a "
    "document, symmetric, stopword/alpha-filtered) ranked by the SAME "
    "weighted-PageRank operator as q_pagerank_suppliers "
    "(operators/graph.pagerank, 3 iterations, d=0.85, per-iteration "
    "6dp rounding so the unrolled-CTE oracle matches bit-for-bit), "
    "top 30 keywords. Scale: the graph is VOCABULARY-sized (nodes = "
    "distinct words, edges = distinct co-occurring pairs) - orders of "
    "magnitude smaller than the corpus; the only corpus-sized work is "
    "the tokenize + offset-join pass, which shuffles on doc_id once; "
    "each pagerank iteration shuffles the vocabulary-sized edge list, "
    "never the corpus.",
)
def q_textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hw_kafka_streams_spark.operators.graph import pagerank

    docs = load_table(spark, "documents", sf_dir).filter(
        F.col("text").isNotNull()
    )
    tok = docs.select(
        "doc_id",
        F.posexplode(word_tokens(F.lower(F.col("text")))).alias("pos", "w"),
    ).filter(F.col("w").rlike("^[a-z]+$") & ~F.col("w").isin(*_TR_STOP))
    a = tok.select(F.col("doc_id").alias("d1"), F.col("pos").alias("p1"), F.col("w").alias("src"))
    b = tok.select(F.col("doc_id").alias("d2"), F.col("pos").alias("p2"), F.col("w").alias("dst"))
    pair = a.join(
        b,
        (F.col("d1") == F.col("d2"))
        & (F.col("p2") - F.col("p1")).between(1, 2)
        & (F.col("src") != F.col("dst")),
    ).select("src", "dst")
    edges = (
        pair.unionAll(pair.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("double").alias("w"))
    )
    pr = pagerank(edges, damping=0.85, iters=3)
    return (
        pr.select(F.col("node").alias("keyword"), F.round("rank", 4).alias("rank"))
        .orderBy(F.desc("rank"), "keyword")
        .limit(30)
    )


def _maxcov_oracle(k: int = 5) -> str:
    """Unrolled twin of operators/sampling.greedy_max_coverage: same
    3-gram shingles, same residual-postings subtraction per round,
    same (gain DESC, id ASC) argmax."""
    ctes = [
        r"""WITH d AS (
          SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'),
                                     e -> e <> '') AS toks
          FROM documents
          WHERE text IS NOT NULL AND doc_id < 150)""",
        """r0 AS (
          SELECT DISTINCT doc_id AS id,
                 unnest(list_distinct([
                   array_to_string(toks[i:i+2], ' ')
                   FOR i IN range(1, len(toks) - 1)
                 ])) AS sh
          FROM d WHERE len(toks) >= 3)""",
    ]
    for i in range(k):
        ctes.append(
            f"""p{i} AS (SELECT id, CAST(count(*) AS BIGINT) AS gain
                 FROM r{i} GROUP BY id ORDER BY gain DESC, id LIMIT 1)"""
        )
        if i < k - 1:
            ctes.append(
                f"""r{i + 1} AS (
                  SELECT * FROM r{i}
                  WHERE id <> (SELECT id FROM p{i})
                    AND sh NOT IN (SELECT sh FROM r{i}
                                   WHERE id = (SELECT id FROM p{i})))"""
            )
    body = ",\n        ".join(ctes)
    picks = " UNION ALL ".join(
        f"SELECT {i} AS rnk, id, gain FROM p{i}" for i in range(k)
    )
    return f"""
        {body}
        SELECT CAST(rnk AS INT) AS rnk, CAST(id AS BIGINT) AS doc_id, gain,
               CAST(sum(gain) OVER (ORDER BY rnk) AS BIGINT)
                 AS covered_total
        FROM ({picks}) ORDER BY rnk
    """


@register(
    "q_max_coverage_select",
    oracle=_maxcov_oracle(),
    doc="Greedy maximum-coverage document selection (Nemhauser et al. "
    "1978, the (1-1/e) submodular guarantee): 5 picks, each the "
    "document adding the most word-3-gram shingles NOTHING already "
    "selected covers, with the non-increasing marginal-gain curve "
    "and running union size - coverage-driven corpus curation, the "
    "set-cover complement of q_kcenter_coreset's metric diversity. "
    "Residual-postings formulation: one distinct (doc, shingle) "
    "table; each round LEFT-ANTI-subtracts the winner's shingles so "
    "round i scans only what round i-1 left (never the full corpus "
    "k times); winner = map-side-combined count + TakeOrdered(1); "
    "selected set is a k-row driver artifact "
    "(operators/sampling.greedy_max_coverage).",
)
def q_max_coverage_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hw_kafka_streams_spark.operators.sampling import greedy_max_coverage

    docs = load_table(spark, "documents", sf_dir).filter(F.col("doc_id") < 150)
    picks = greedy_max_coverage(docs, "text", "doc_id", k=5, n=3)
    return spark.createDataFrame(
        [(int(r), int(i), int(g), int(t)) for r, i, g, t in picks],
        "rnk int, doc_id bigint, gain bigint, covered_total bigint",
    ).orderBy("rnk")
