"""Corpus-curation battery round 6: span-level dedup, group-aware
split audit, class TF-IDF, kNN auto-labeling, Zipf/Heaps law fits.

North-star LLM-pipeline extensions (the reference — svolga/
hw-kafka-streams, MessageFilterProcessor.java:22-47 — has no curation
surface); every query carries an exact DuckDB oracle so the driver
value-hash-checks it at sf0.01.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hw_kafka_streams_spark.operators import similarity as S
from hw_kafka_streams_spark.operators.dedup import char_span_pairs
from hw_kafka_streams_spark.operators.sampling import hash_bucket, split_leakage_audit
from hw_kafka_streams_spark.operators.stats import ols_fit
from hw_kafka_streams_spark.operators.text import ctfidf_terms, word_tokens
from hw_kafka_streams_spark.operators.winutil import tiny_table_partition
from hw_kafka_streams_spark.queries import register
from hw_kafka_streams_spark.sources.catalog import load_table
from hw_kafka_streams_spark.cache import managed_persist

# DuckDB twin of sampling.hash_bucket(key, denom, seed, hash_mode='md5')
# (first 15 md5 hex chars as a bigint, mod denom — non-negative, so
# pmod == %).
_BUCKET = (
    "CAST(('0x' || substring(md5({key} || ':{seed}'), 1, 15)) AS BIGINT) % {denom}"
)


@register(
    "q_span_dedup",
    oracle="""
        WITH grams AS (
            SELECT DISTINCT doc_id,
                   substr(lt, CAST(s AS INT) + 1, 20) AS gram
            FROM (SELECT doc_id, lower(text) AS lt,
                         unnest(generate_series(0, length(text) - 20, 10)) AS s
                  FROM documents WHERE length(text) >= 20)
        ),
        keep AS (
            SELECT gram FROM (
                SELECT gram, count(DISTINCT doc_id) AS df FROM grams GROUP BY 1
            ) WHERE df <= 50
        ),
        g AS (SELECT doc_id, gram FROM grams JOIN keep USING (gram))
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               count(*) AS n_shared_spans
        FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id
        GROUP BY 1, 2 HAVING count(*) >= 2
        ORDER BY doc_a, doc_b
    """,
    doc="Substring-level duplicate pairs: docs sharing >= 2 distinct "
    "verbatim 20-char spans (stride 10) — the corpus-internal twin of "
    "eval decontamination and the cheap stand-in for suffix-array "
    "substring dedup. Inverted-index self-join, never all-pairs; the "
    "df <= 50 gram cap is part of the contract (and the oracle), the "
    "guard that keeps one boilerplate span from quadratic pair blowup "
    "(operators/dedup.char_span_pairs).",
)
def q_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    return char_span_pairs(
        docs, n=20, stride=10, max_df=50, min_shared=2
    ).orderBy("doc_a", "doc_b")


@register(
    "q_substring_dedup",
    oracle="""
        WITH h AS (
            SELECT doc_id,
                   CAST(p AS BIGINT) AS p,
                   ('0x' || substring(md5(substring(lt, CAST(p AS INT), 20)),
                                      1, 15))::BIGINT AS gh
            FROM (SELECT doc_id, lower(text) AS lt,
                         unnest(generate_series(1, length(text) - 19)) AS p
                  FROM documents WHERE length(text) >= 20)
        ),
        keep AS (SELECT gh FROM h GROUP BY gh
                 HAVING count(DISTINCT doc_id) <= 50),
        hk AS (SELECT h.doc_id, h.p, h.gh FROM h JOIN keep USING (gh)),
        hits AS (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   a.p AS pa, b.p AS pb, a.p - b.p AS diag
            FROM hk a JOIN hk b ON a.gh = b.gh AND a.doc_id < b.doc_id
        ),
        isl AS (
            SELECT doc_a, doc_b, diag, pa, pb,
                   pa - row_number() OVER (
                       PARTITION BY doc_a, doc_b, diag ORDER BY pa) AS grp
            FROM hits
        )
        SELECT doc_a, doc_b,
               CAST(min(pa) AS BIGINT) AS start_a,
               CAST(min(pb) AS BIGINT) AS start_b,
               CAST(max(pa) - min(pa) + 20 AS BIGINT) AS span_len
        FROM isl GROUP BY doc_a, doc_b, diag, grp
        HAVING max(pa) - min(pa) + 20 >= 30
        ORDER BY doc_a, doc_b, start_a, start_b
    """,
    doc="Variable-length duplicate-substring dedup (Lee et al. 2022 "
    "memorization-removal shape): the MAXIMAL verbatim common "
    "substrings per document pair, found without a suffix array — "
    "stride-1 anchor grams, df-capped inverted-index self-join, then "
    "matches merged along alignment diagonals (pos_a - pos_b) with the "
    "pos - row_number() islands trick in a pair+diagonal-partitioned "
    "window (never global). Exact for spans >= 20 chars whose every "
    "20-window survives the df <= 50 cap; a length-L duplicate yields "
    "L-19 consecutive diagonal hits and the run-merge recovers L "
    "exactly (operators/dedup.substring_dedup_spans).",
)
def q_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hw_kafka_streams_spark.operators.dedup import substring_dedup_spans

    docs = load_table(spark, "documents", sf_dir)
    return substring_dedup_spans(
        docs, n=20, max_df=50, min_len=30, hash_mode="md5"
    ).orderBy("doc_a", "doc_b", "start_a", "start_b")


@register(
    "q_substring_self_repeats",
    oracle="""
        WITH aug AS (
            SELECT doc_id,
                   CASE WHEN doc_id % 7 = 0 THEN
                     text || ' == the same boilerplate sentence repeats here == filler '
                          || 'words == the same boilerplate sentence repeats here =='
                   ELSE text END AS text
            FROM documents WHERE doc_id < 300
        ),
        h AS (
            SELECT doc_id,
                   CAST(p AS BIGINT) AS p,
                   ('0x' || substring(md5(substring(lt, CAST(p AS INT), 20)),
                                      1, 15))::BIGINT AS gh
            FROM (SELECT doc_id, lower(text) AS lt,
                         unnest(generate_series(1, length(text) - 19)) AS p
                  FROM aug WHERE length(text) >= 20)
        ),
        keep AS (SELECT gh FROM h GROUP BY gh
                 HAVING count(DISTINCT doc_id) <= 50),
        hk AS (SELECT h.doc_id, h.p, h.gh FROM h JOIN keep USING (gh)),
        hits AS (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   a.p AS pa, b.p AS pb, a.p - b.p AS diag
            FROM hk a JOIN hk b ON a.gh = b.gh
             AND (a.doc_id < b.doc_id
                  OR (a.doc_id = b.doc_id AND a.p < b.p))
        ),
        isl AS (
            SELECT doc_a, doc_b, diag, pa, pb,
                   pa - row_number() OVER (
                       PARTITION BY doc_a, doc_b, diag ORDER BY pa) AS grp
            FROM hits
        )
        SELECT doc_a, doc_b,
               CAST(min(pa) AS BIGINT) AS start_a,
               CAST(min(pb) AS BIGINT) AS start_b,
               CAST(max(pa) - min(pa) + 20 AS BIGINT) AS span_len
        FROM isl
        WHERE doc_a = doc_b
        GROUP BY doc_a, doc_b, diag, grp
        HAVING max(pa) - min(pa) + 20 >= 30
        ORDER BY doc_a, start_a, start_b
    """,
    doc="WITHIN-document repeat spans — the other half of Lee et al. "
    "memorization removal (boilerplate repeated inside one page): the "
    "same diagonal run-merge restricted to doc_a = doc_b, pos_a < "
    "pos_b. The clean synthetic corpus has no long internal repeats, "
    "so (q_unicode_normalize precedent) every doc_id % 7 == 0 document "
    "gets a deterministic duplicated sentence appended and the oracle "
    "replays the identical construction; the operator must recover "
    "each planted repeat as one maximal span "
    "(operators/dedup.substring_dedup_spans include_self=True).",
)
def q_substring_self_repeats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hw_kafka_streams_spark.operators.dedup import substring_dedup_spans

    phrase = "== the same boilerplate sentence repeats here =="
    docs = load_table(spark, "documents", sf_dir).filter(F.col("doc_id") < 300)
    aug = docs.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(
                F.col("text"),
                F.lit(f" {phrase} filler words {phrase}"),
            ),
        ).otherwise(F.col("text")),
    )
    out = substring_dedup_spans(
        aug, n=20, max_df=50, min_len=30, hash_mode="md5", include_self=True
    )
    return (
        out.filter(F.col("doc_a") == F.col("doc_b"))
        .orderBy("doc_a", "start_a", "start_b")
    )


@register(
    "q_split_leakage",
    oracle=f"""
        WITH flags AS (
            SELECT source,
                   CAST({_BUCKET.format(key="doc_id::VARCHAR", seed=42, denom=10)} < 8
                        AS INT) AS by_doc,
                   CAST({_BUCKET.format(key="source", seed=42, denom=10)} < 8
                        AS INT) AS by_source
            FROM documents
        ),
        audits AS (
            SELECT 'by_doc' AS method, _tr, _te FROM (
                SELECT source, sum(by_doc) AS _tr, sum(1 - by_doc) AS _te
                FROM flags GROUP BY source)
            UNION ALL
            SELECT 'by_source', _tr, _te FROM (
                SELECT source, sum(by_source) AS _tr, sum(1 - by_source) AS _te
                FROM flags GROUP BY source)
        )
        SELECT method,
               CAST(sum(_tr) AS BIGINT) AS n_train,
               CAST(sum(_te) AS BIGINT) AS n_test,
               CAST(sum(CASE WHEN _tr > 0 AND _te > 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_leaky_groups,
               CAST(sum(CASE WHEN _tr > 0 AND _te > 0 THEN _te ELSE 0 END)
                    AS BIGINT) AS n_leaked_test_docs
        FROM audits GROUP BY method ORDER BY method
    """,
    doc="Group-aware split audit: an 80/20 hash split BY DOC leaks "
    "sources across train/test (near-identical domain docs on both "
    "sides inflate eval) — counted per method; the BY SOURCE split is "
    "leakage-free by construction and the audit proves it with zeros. "
    "Per-group counts then one global roll-up; both aggregations are "
    "group-keyed, never doc-keyed twice "
    "(operators/sampling.split_leakage_audit).",
)
def q_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    out = []
    for method, key in (("by_doc", "doc_id"), ("by_source", "source")):
        flagged = docs.withColumn(
            "_split",
            (hash_bucket(key, denom=10, seed=42, hash_mode="md5") < 8).cast("int"),
        )
        out.append(
            split_leakage_audit(flagged, "_split", "source").select(
                F.lit(method).alias("method"),
                "n_train",
                "n_test",
                "n_leaky_groups",
                "n_leaked_test_docs",
            )
        )
    return out[0].unionAll(out[1]).orderBy("method")


@register(
    "q_ctfidf_source_terms",
    oracle="""
        WITH toks AS (
            SELECT source, unnest(list_filter(
                     string_split_regex(trim(lower(text)), '\\s+'),
                     t -> t <> '')) AS term
            FROM documents
        ),
        tf AS (SELECT source, term, count(*) AS tf FROM toks GROUP BY 1, 2),
        w_c AS (SELECT source, sum(tf) AS w FROM tf GROUP BY 1),
        f_t AS (SELECT term, sum(tf) AS f FROM tf GROUP BY 1),
        totals AS (SELECT sum(w) AS n_total, count(*) AS n_classes FROM w_c),
        scored AS (
            SELECT tf.source, tf.term,
                   round((CAST(tf.tf AS DOUBLE) / w_c.w)
                         * ln(1.0 + (CAST(t.n_total AS DOUBLE) / t.n_classes)
                                    / f_t.f), 6) AS ctfidf
            FROM tf JOIN w_c USING (source) JOIN f_t USING (term)
            CROSS JOIN totals t
        )
        SELECT source, term, ctfidf, CAST(rnk AS INT) AS rnk FROM (
            SELECT *, row_number() OVER (
                PARTITION BY source ORDER BY ctfidf DESC, term) AS rnk
            FROM scored)
        WHERE rnk <= 3 ORDER BY source, rnk
    """,
    doc="Class-based TF-IDF (BERTopic c-TF-IDF): top-3 characteristic "
    "terms PER SOURCE — the 'what is this domain about?' readout for "
    "mixture curation. All formula inputs are exact integer aggregates "
    "sharing one (class, term) shuffle; the rank window partitions by "
    "class over the vocabulary-sized tf table, never the corpus "
    "(operators/text.ctfidf_terms).",
)
def q_ctfidf_source_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    return ctfidf_terms(docs, group_col="source", top_k=3).orderBy("source", "rnk")


@register(
    "q_knn_classify",
    oracle="""
        WITH q AS (SELECT vec_id, embedding, label FROM embeddings
                   WHERE vec_id % 5 = 0 AND vec_id < 500),
        c AS (SELECT vec_id, embedding, label FROM embeddings
              WHERE vec_id % 5 <> 0),
        topk AS (
            SELECT * FROM (
                SELECT q.vec_id AS query_id, c.label AS pred_label,
                       CAST(row_number() OVER (
                         PARTITION BY q.vec_id
                         ORDER BY round(list_cosine_similarity(
                                    q.embedding::DOUBLE[],
                                    c.embedding::DOUBLE[]), 4) DESC,
                                  c.vec_id) AS INT) AS rnk
                FROM q JOIN c ON true)
            WHERE rnk <= 5
        ),
        votes AS (SELECT query_id, pred_label, count(*) AS n_votes,
                         min(rnk) AS best_rnk
                  FROM topk GROUP BY 1, 2),
        pred AS (SELECT * FROM (
                     SELECT *, row_number() OVER (
                       PARTITION BY query_id
                       ORDER BY n_votes DESC, best_rnk, pred_label) AS vr
                     FROM votes)
                 WHERE vr = 1)
        SELECT q.vec_id, p.pred_label, p.n_votes, q.label AS true_label,
               CAST(p.pred_label = q.label AS INT) AS correct
        FROM pred p JOIN q ON p.query_id = q.vec_id
        ORDER BY q.vec_id
    """,
    doc="kNN auto-labeling: predict the label of a held-out 20% of "
    "vectors by majority vote over their 5 cosine-nearest labeled "
    "neighbors — the label-a-crawl-slice-by-exemplars curation pass. "
    "Scoring reuses the broadcast-queries Arrow cosine kernel "
    "(brute_force_topk); the vote is integer-deterministic (count, "
    "then nearest supporting neighbor, then smallest label) "
    "(operators/similarity.knn_classify).",
)
def q_knn_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, "embeddings", sf_dir)
    # the query batch is BOUNDED (vec_id < 500 caps it at 100 vectors)
    # — the operator's broadcast-batch regime; without the cap the
    # batch grows with the corpus and the scan is O(n²/5)
    unl = emb.filter((F.col("vec_id") % 5 == 0) & (F.col("vec_id") < 500))
    lab = emb.filter(F.col("vec_id") % 5 != 0)
    return S.knn_classify(unl, lab, k=5).orderBy("vec_id")


@register(
    "q_zipf_heaps",
    oracle="""
        WITH toks AS (
            SELECT source, unnest(list_filter(
                     string_split_regex(trim(lower(text)), '\\s+'),
                     t -> t <> '')) AS term
            FROM documents
        ),
        freq AS (SELECT term, count(*) AS cnt FROM toks GROUP BY 1),
        top AS (SELECT * FROM (
                    SELECT term, cnt, row_number() OVER (
                        ORDER BY cnt DESC, term) AS rnk
                    FROM freq)
                WHERE rnk <= 100),
        zm AS (
            SELECT count(*) AS n, sum(xd) AS sx, sum(yd) AS sy,
                   sum(xd * yd) AS sxy, sum(xd * xd) AS sx2,
                   sum(yd * yd) AS sy2
            FROM (SELECT CAST(round(ln(CAST(rnk AS DOUBLE)), 6)
                              AS DECIMAL(18,6)) AS xd,
                         CAST(round(ln(CAST(cnt AS DOUBLE)), 6)
                              AS DECIMAL(18,6)) AS yd
                  FROM top)
        ),
        srcpts AS (
            SELECT source, count(*) AS n_tok, count(DISTINCT term) AS n_vocab
            FROM toks GROUP BY 1
        ),
        hm AS (
            SELECT count(*) AS n, sum(xd) AS sx, sum(yd) AS sy,
                   sum(xd * yd) AS sxy, sum(xd * xd) AS sx2,
                   sum(yd * yd) AS sy2
            FROM (SELECT CAST(round(ln(CAST(n_tok AS DOUBLE)), 6)
                              AS DECIMAL(18,6)) AS xd,
                         CAST(round(ln(CAST(n_vocab AS DOUBLE)), 6)
                              AS DECIMAL(18,6)) AS yd
                  FROM srcpts)
        )
        SELECT CAST(zm.n AS INT) AS n_terms,
               round((CAST(zm.n AS DOUBLE) * CAST(zm.sxy AS DOUBLE)
                      - CAST(zm.sx AS DOUBLE) * CAST(zm.sy AS DOUBLE))
                     / (CAST(zm.n AS DOUBLE) * CAST(zm.sx2 AS DOUBLE)
                        - CAST(zm.sx AS DOUBLE) * CAST(zm.sx AS DOUBLE)),
                     6) AS zipf_slope,
               round(((CAST(zm.n AS DOUBLE) * CAST(zm.sxy AS DOUBLE)
                       - CAST(zm.sx AS DOUBLE) * CAST(zm.sy AS DOUBLE))
                      * (CAST(zm.n AS DOUBLE) * CAST(zm.sxy AS DOUBLE)
                         - CAST(zm.sx AS DOUBLE) * CAST(zm.sy AS DOUBLE)))
                     / ((CAST(zm.n AS DOUBLE) * CAST(zm.sx2 AS DOUBLE)
                         - CAST(zm.sx AS DOUBLE) * CAST(zm.sx AS DOUBLE))
                        * (CAST(zm.n AS DOUBLE) * CAST(zm.sy2 AS DOUBLE)
                           - CAST(zm.sy AS DOUBLE) * CAST(zm.sy AS DOUBLE))),
                     6) AS zipf_r2,
               CAST(hm.n AS INT) AS n_groups,
               round((CAST(hm.n AS DOUBLE) * CAST(hm.sxy AS DOUBLE)
                      - CAST(hm.sx AS DOUBLE) * CAST(hm.sy AS DOUBLE))
                     / (CAST(hm.n AS DOUBLE) * CAST(hm.sx2 AS DOUBLE)
                        - CAST(hm.sx AS DOUBLE) * CAST(hm.sx AS DOUBLE)),
                     6) AS heaps_beta,
               round(exp((CAST(hm.sy AS DOUBLE)
                          - ((CAST(hm.n AS DOUBLE) * CAST(hm.sxy AS DOUBLE)
                              - CAST(hm.sx AS DOUBLE) * CAST(hm.sy AS DOUBLE))
                             / (CAST(hm.n AS DOUBLE) * CAST(hm.sx2 AS DOUBLE)
                                - CAST(hm.sx AS DOUBLE) * CAST(hm.sx AS DOUBLE)))
                            * CAST(hm.sx AS DOUBLE)) / CAST(hm.n AS DOUBLE)),
                     6) AS heaps_k
        FROM zm CROSS JOIN hm
    """,
    doc="Corpus-law fits: Zipf slope/r² over the top-100 term "
    "frequencies (ln freq ~ ln rank) and Heaps' law V = k·N^beta "
    "across per-source (tokens, vocab) points — the two-number sanity "
    "check that a corpus looks like natural language (template/spam "
    "corpora bend both laws). Rank comes from TakeOrderedAndProject "
    "top-100 (never a global window over the vocabulary); both fits "
    "run on driver-bounded point sets through the DECIMAL-exact OLS "
    "moments (operators/stats.ols_fit) so reducer order can't drift "
    "the hash.",
)
def q_zipf_heaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    toks = docs.select(
        "source", F.explode(word_tokens(F.lower(F.col("text")))).alias("term")
    )
    freq = toks.groupBy("term").agg(F.count(F.lit(1)).alias("cnt"))
    top = freq.orderBy(F.desc("cnt"), F.asc("term")).limit(100)
    # rank over the post-limit 100-row table: driver-bounded by
    # construction, so the single-partition window is intentional
    from pyspark.sql import Window

    rw = (
        Window.partitionBy(tiny_table_partition("term"))
        .orderBy(F.desc("cnt"), F.asc("term"))
    )
    ranked = top.withColumn("rnk", F.row_number().over(rw))
    zipf = ols_fit(
        ranked,
        F.log(F.col("rnk").cast("double")),
        F.log(F.col("cnt").cast("double")),
        prefix="zipf_",
    )
    srcpts = toks.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_tok"),
        F.countDistinct("term").alias("n_vocab"),
    )
    heaps = ols_fit(
        srcpts,
        F.log(F.col("n_tok").cast("double")),
        F.log(F.col("n_vocab").cast("double")),
        prefix="heaps_",
    )
    return zipf.crossJoin(heaps).select(
        F.col("zipf_n").cast("int").alias("n_terms"),
        F.round("zipf_slope", 6).alias("zipf_slope"),
        F.round("zipf_r2", 6).alias("zipf_r2"),
        F.col("heaps_n").cast("int").alias("n_groups"),
        F.round("heaps_slope", 6).alias("heaps_beta"),
        F.round(F.exp("heaps_intercept"), 6).alias("heaps_k"),
    )


@register(
    "q_winsorized_stats",
    oracle="""
        WITH th AS (
            SELECT l_returnflag,
                   quantile_cont(floor(CAST(l_extendedprice AS DOUBLE)), 0.05)
                       AS lo,
                   quantile_cont(floor(CAST(l_extendedprice AS DOUBLE)), 0.95)
                       AS hi
            FROM lineitem GROUP BY 1
        ),
        j AS (
            SELECT l.l_returnflag,
                   CAST(l.l_extendedprice AS DOUBLE) AS v, th.lo, th.hi
            FROM lineitem l JOIN th USING (l_returnflag)
        )
        SELECT l_returnflag,
               count(*) AS n,
               round(min(lo), 6) AS p_lo,
               round(min(hi), 6) AS p_hi,
               round(CAST(sum(CAST(round(least(greatest(v, lo), hi), 6)
                                   AS DECIMAL(18,6))) AS DOUBLE) / count(*),
                     6) AS win_mean,
               round(CAST(sum(CASE WHEN v BETWEEN lo AND hi
                                   THEN CAST(round(v, 6) AS DECIMAL(18,6))
                              END) AS DOUBLE)
                     / sum(CASE WHEN v BETWEEN lo AND hi THEN 1 ELSE 0 END),
                     6) AS trim_mean,
               CAST(sum(CASE WHEN v < lo THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_clipped_lo,
               CAST(sum(CASE WHEN v > hi THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_clipped_hi
        FROM j GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    doc="Outlier-robust means per group: winsorized (clamp into "
    "[p05, p95]) and trimmed (drop outside the band). Thresholds are "
    "one exact-percentile agg per group broadcast back — the "
    "quantile_buckets recipe, no per-group sort, no ntile — computed "
    "on the quantize_decimals=0 floored grid, so the histogram is "
    "capped at the price RANGE (~105k rows/group) no matter the row "
    "count; the means clamp raw values against the grid thresholds and "
    "sum DECIMAL-rounded so reducer order can't drift the hash "
    "(operators/stats.winsorized_stats).",
)
def q_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hw_kafka_streams_spark.operators.stats import winsorized_stats

    li = load_table(spark, "lineitem", sf_dir)
    return winsorized_stats(
        li, "l_extendedprice", "l_returnflag", lower=0.05, upper=0.95,
        quantize_decimals=0,
    ).orderBy("l_returnflag")


@register(
    "q_readability",
    oracle="""
        WITH m AS (
            SELECT source,
                   len(list_filter(string_split_regex(trim(text), '\\s+'),
                                   x -> x <> '')) AS w,
                   len(regexp_extract_all(lower(text), '[aeiouy]+')) AS syll,
                   greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS sent
            FROM documents
        )
        SELECT source,
               count(*) AS n_docs,
               round(CAST(sum(CAST(round(206.835
                                         - 1.015 * (CAST(w AS DOUBLE) / sent)
                                         - 84.6 * (CAST(syll AS DOUBLE) / w), 4)
                                   AS DECIMAL(18,6))) AS DOUBLE) / count(*),
                     4) AS avg_flesch,
               round(min(206.835 - 1.015 * (CAST(w AS DOUBLE) / sent)
                         - 84.6 * (CAST(syll AS DOUBLE) / w)), 4) AS min_flesch,
               round(max(206.835 - 1.015 * (CAST(w AS DOUBLE) / sent)
                         - 84.6 * (CAST(syll AS DOUBLE) / w)), 4) AS max_flesch
        FROM m WHERE w > 0 GROUP BY source ORDER BY source
    """,
    doc="Per-source Flesch reading-ease profile (syllables ~= vowel-"
    "group runs, the classic heuristic): the readability leg of a "
    "quality-filter stack. Per-doc scores are one zero-shuffle "
    "vectorized-regexp map; the per-source roll-up DECIMAL-sums the "
    "rounded scores (operators/text.flesch_scores).",
)
def q_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hw_kafka_streams_spark.operators.text import flesch_scores

    docs = load_table(spark, "documents", sf_dir)
    scored = flesch_scores(docs).join(
        docs.select("doc_id", "source"), "doc_id"
    )
    raw = (
        F.lit(206.835)
        - F.lit(1.015)
        * (F.col("n_words").cast("double") / F.col("n_sentences"))
        - F.lit(84.6)
        * (F.col("n_syllables").cast("double") / F.col("n_words"))
    )
    return (
        scored.filter(F.col("n_words") > 0)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(
                F.sum(F.col("flesch").cast("decimal(18,6)")).cast("double")
                / F.count(F.lit(1)),
                4,
            ).alias("avg_flesch"),
            F.round(F.min(raw), 4).alias("min_flesch"),
            F.round(F.max(raw), 4).alias("max_flesch"),
        )
        .orderBy("source")
    )


@register(
    "q_source_lang_entropy",
    oracle="""
        WITH cc AS (
            SELECT source, lang, count(*) AS c
            FROM documents GROUP BY 1, 2
        ),
        t AS (SELECT source, CAST(sum(c) AS BIGINT) AS n FROM cc GROUP BY 1)
        SELECT cc.source,
               min(t.n) AS n,
               count(*) AS n_classes,
               round(CAST(max(cc.c) AS DOUBLE) / min(t.n), 6)
                   AS majority_share,
               round(CAST(sum(CAST(round(
                          -(CAST(cc.c AS DOUBLE) / t.n)
                          * ln(CAST(cc.c AS DOUBLE) / t.n), 6)
                        AS DECIMAL(18,6))) AS DOUBLE), 6) AS entropy
        FROM cc JOIN t USING (source)
        GROUP BY cc.source ORDER BY cc.source
    """,
    doc="Language-mix entropy per source (nats): 0 = monolingual "
    "domain, ln(5) = uniform over the corpus's five languages — the "
    "diversity readout that flags scraped-mixed or mislabeled domains "
    "before a mixture is weighted. Two group-keyed aggregations, "
    "DECIMAL-summed ln terms (operators/stats.group_entropy).",
)
def q_source_lang_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hw_kafka_streams_spark.operators.stats import group_entropy

    docs = load_table(spark, "documents", sf_dir)
    return group_entropy(docs, "source", "lang").orderBy("source")


@register(
    "q_source_vocab_jaccard",
    oracle="""
        WITH g AS (
            SELECT DISTINCT source, term FROM (
                SELECT source, unnest(list_filter(
                         string_split_regex(trim(lower(text)), '\\s+'),
                         t -> t <> '')) AS term
                FROM documents)
        ),
        sizes AS (SELECT source, count(*) AS vocab FROM g GROUP BY 1),
        inter AS (
            SELECT a.source AS grp_a, b.source AS grp_b, count(*) AS n_common
            FROM g a JOIN g b ON a.term = b.term AND a.source < b.source
            GROUP BY 1, 2
        )
        SELECT grp_a, grp_b, n_common,
               sa.vocab AS vocab_a, sb.vocab AS vocab_b,
               round(CAST(n_common AS DOUBLE)
                     / (sa.vocab + sb.vocab - n_common), 6) AS jaccard
        FROM inter
        JOIN sizes sa ON sa.source = inter.grp_a
        JOIN sizes sb ON sb.source = inter.grp_b
        ORDER BY grp_a, grp_b
    """,
    doc="Pairwise vocabulary Jaccard between sources — the domain-"
    "similarity matrix for spotting redundant domains before weighting "
    "a mixture. Inverted-index self-join on the term (pair space is "
    "sources^2, never docs^2); per-source vocab sizes broadcast back; "
    "max_df caps universal terms when groups number in the millions "
    "(operators/text.vocab_jaccard_pairs).",
)
def q_source_vocab_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hw_kafka_streams_spark.operators.text import vocab_jaccard_pairs

    docs = load_table(spark, "documents", sf_dir)
    return vocab_jaccard_pairs(docs, group_col="source").orderBy("grp_a", "grp_b")


@register(
    "q_tfidf_cosine_pairs",
    oracle="""
        WITH toks AS (
            SELECT doc_id AS id, unnest(list_filter(
                     string_split_regex(trim(lower(text)), '\\s+'),
                     t -> t <> '')) AS term
            FROM documents WHERE doc_id < 300
        ),
        tf AS (SELECT id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
        dft AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        nd AS (SELECT count(DISTINCT id) AS n_docs FROM tf),
        w AS (
            SELECT id, term,
                   round(tf.tf * ln((nd.n_docs + 1.0) / (dft.df + 1.0)), 6)
                       AS w
            FROM tf JOIN dft USING (term) CROSS JOIN nd
        ),
        norms AS (
            SELECT id,
                   sqrt(CAST(sum(CAST(round(w * w, 6) AS DECIMAL(18,6)))
                             AS DOUBLE)) AS norm
            FROM w GROUP BY id
        ),
        dots AS (
            SELECT a.id AS id1, b.id AS id2,
                   CAST(sum(CAST(round(a.w * b.w, 6) AS DECIMAL(18,6)))
                        AS DOUBLE) AS dot
            FROM w a JOIN w b ON a.term = b.term AND a.id < b.id
            GROUP BY 1, 2
        )
        SELECT id1, id2, round(dot / (n1.norm * n2.norm), 4) AS cos_sim
        FROM dots
        JOIN norms n1 ON n1.id = dots.id1
        JOIN norms n2 ON n2.id = dots.id2
        WHERE dot / (n1.norm * n2.norm) >= 0.3
        ORDER BY id1, id2
    """,
    doc="Sparse TF-IDF cosine similarity join (related-document pairs): "
    "rare shared terms dominate where Jaccard weights all terms "
    "equally. One (doc, term) tf shuffle feeds df, weights, and norms; "
    "pair generation is the term inverted index with DECIMAL-summed "
    "weight products; idf suppresses exactly the high-df terms a "
    "max_df guard would drop, so the skew cut barely moves the metric. "
    "This synthetic corpus has a 31-word vocabulary — every posting "
    "list is corpus-sized and ANY term-keyed pair join degenerates to "
    "all-pairs — so the registry query runs the q_tfidf_top_terms "
    "bounded subset; on a Zipfian real corpus the max_df guard is the "
    "scale lever (operators/text.tfidf_cosine_pairs).",
)
def q_tfidf_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hw_kafka_streams_spark.operators.text import tfidf_cosine_pairs

    docs = load_table(spark, "documents", sf_dir).filter(F.col("doc_id") < 300)
    return tfidf_cosine_pairs(docs, threshold=0.3).orderBy("id1", "id2")


@register(
    "q_chi2_independence",
    oracle="""
        WITH cells AS (
          SELECT lang AS r, source AS c, count(*) AS o
          FROM documents GROUP BY 1, 2
        ),
        rt AS (SELECT r, CAST(sum(o) AS BIGINT) AS rtot FROM cells GROUP BY 1),
        ct AS (SELECT c, CAST(sum(o) AS BIGINT) AS ctot FROM cells GROUP BY 1),
        tot AS (SELECT CAST(sum(o) AS BIGINT) AS t,
                       count(DISTINCT r) AS nr,
                       count(DISTINCT c) AS nc FROM cells),
        dense AS (
          SELECT rt.r, ct.c, rt.rtot, ct.ctot, COALESCE(cells.o, 0) AS o
          FROM rt CROSS JOIN ct
          LEFT JOIN cells ON cells.r = rt.r AND cells.c = ct.c
        )
        SELECT min(tot.t) AS n,
               CAST((min(tot.nr) - 1) * (min(tot.nc) - 1) AS BIGINT) AS dof,
               round(CAST(sum(CAST(round(
                   (o - CAST(rtot AS DOUBLE) * ctot / tot.t)
                   * (o - CAST(rtot AS DOUBLE) * ctot / tot.t)
                   / (CAST(rtot AS DOUBLE) * ctot / tot.t), 9)
                 AS DECIMAL(20,9))) AS DOUBLE), 4) AS chi2,
               round(sqrt(CAST(sum(CAST(round(
                   (o - CAST(rtot AS DOUBLE) * ctot / tot.t)
                   * (o - CAST(rtot AS DOUBLE) * ctot / tot.t)
                   / (CAST(rtot AS DOUBLE) * ctot / tot.t), 9)
                 AS DECIMAL(20,9))) AS DOUBLE)
                 / (CAST(min(tot.t) AS DOUBLE)
                    * least(min(tot.nr) - 1, min(tot.nc) - 1))), 4)
                   AS cramers_v
        FROM dense CROSS JOIN tot
    """,
    doc="Pearson chi-squared independence test: is language independent "
    "of source? Plus Cramer's V effect size. One (lang, source) count "
    "shuffle, category-sized margins broadcast, per-cell (o-e)^2/e "
    "terms DECIMAL-summed over the DENSIFIED nr x nc grid (zero-"
    "observed cells still contribute e; omitting them understates the "
    "statistic on sparse tables) (operators/stats.chi2_independence).",
)
def q_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hw_kafka_streams_spark.operators.stats import chi2_independence

    docs = load_table(spark, "documents", sf_dir)
    return chi2_independence(docs, "lang", "source")


@register(
    "q_benford_audit",
    oracle="""
        WITH d AS (
          SELECT CAST(substring(CAST(CAST(floor(l_extendedprice) AS BIGINT)
                                     AS VARCHAR), 1, 1) AS INT) AS digit
          FROM lineitem WHERE l_extendedprice >= 1
        ),
        counts AS (SELECT digit, count(*) AS n FROM d GROUP BY 1),
        tot AS (SELECT CAST(sum(n) AS BIGINT) AS t FROM counts)
        SELECT digit, n,
               round(CAST(n AS DOUBLE) / tot.t, 6) AS obs_freq,
               round(log10(1.0 + 1.0 / digit), 6) AS benford_freq,
               round((CAST(n AS DOUBLE) / tot.t)
                     / log10(1.0 + 1.0 / digit) - 1.0, 4) AS rel_dev
        FROM counts CROSS JOIN tot ORDER BY digit
    """,
    doc="Benford first-digit audit of prices: observed vs log10(1+1/d) "
    "frequencies with relative deviation — the data-forensics check "
    "for fabricated/clamped numeric columns (TPC-H prices are "
    "range-generated, so they visibly BEND Benford — which is the "
    "point of auditing). One digit-keyed count + a 9-row epilogue.",
)
def q_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir).filter(
        F.col("l_extendedprice") >= 1
    )
    digit = F.substring(
        F.floor("l_extendedprice").cast("long").cast("string"), 1, 1
    ).cast("int")
    counts = li.groupBy(digit.alias("digit")).agg(F.count(F.lit(1)).alias("n"))
    tot = counts.agg(F.sum("n").alias("t"))
    obs = F.col("n").cast("double") / F.col("t")
    exp = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit"))
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            "digit",
            "n",
            F.round(obs, 6).alias("obs_freq"),
            F.round(exp, 6).alias("benford_freq"),
            F.round(obs / exp - 1.0, 4).alias("rel_dev"),
        )
        .orderBy("digit")
    )


@register(
    "q_skyline_parts",
    oracle="""
        SELECT p_partkey, p_size, round(p_retailprice, 2) AS p_retailprice
        FROM part p
        WHERE NOT EXISTS (
          SELECT 1 FROM part q
          WHERE q.p_size >= p.p_size
            AND q.p_retailprice >= p.p_retailprice
            AND (q.p_size > p.p_size OR q.p_retailprice > p.p_retailprice)
        )
        ORDER BY p_partkey
    """,
    doc="2-D SKYLINE (Pareto front, maximize size AND price): the "
    "preference-query operator relational engines ship natively and "
    "Spark lacks. Computed WITHOUT the O(n^2) dominance self-join and "
    "WITHOUT a global sort window: per-x maxima, then the strict-"
    "prefix running max via block-prefix-sum (only the driver-bounded "
    "block table sees a single-partition window). The oracle IS the "
    "quadratic NOT EXISTS definition, so the linear-shuffle plan is "
    "proven equivalent (operators/stats.skyline_2d).",
)
def q_skyline_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hw_kafka_streams_spark.operators.stats import skyline_2d

    p = load_table(spark, "part", sf_dir).select(
        "p_partkey", "p_size", "p_retailprice"
    )
    return (
        skyline_2d(p, "p_size", "p_retailprice")
        .select(
            "p_partkey",
            "p_size",
            F.round("p_retailprice", 2).alias("p_retailprice"),
        )
        .orderBy("p_partkey")
    )


@register(
    "q_jackknife_ci",
    oracle="""
        WITH per_src AS (
          SELECT source, CAST(sum(n_chars) AS BIGINT) AS s,
                 CAST(count(*) AS BIGINT) AS n
          FROM documents GROUP BY source
        ),
        tot AS (SELECT CAST(sum(s) AS BIGINT) AS st,
                       CAST(sum(n) AS BIGINT) AS nt,
                       count(*) AS g FROM per_src),
        loo AS (
          SELECT CAST(tot.st - s AS DOUBLE) / (tot.nt - n) AS m, tot.g
          FROM per_src CROSS JOIN tot
        ),
        lbar AS (
          SELECT CAST(sum(CAST(round(m, 9) AS DECIMAL(20,9))) AS DOUBLE)
                 / min(g) AS lb, min(g) AS g
          FROM loo
        )
        SELECT tot.nt AS n_docs,
               CAST(tot.g AS BIGINT) AS n_groups,
               round(CAST(tot.st AS DOUBLE) / tot.nt, 4) AS mean_chars,
               round(sqrt((CAST(lbar.g - 1 AS DOUBLE) / lbar.g)
                 * CAST((SELECT sum(CAST(round((m - lbar.lb) * (m - lbar.lb), 9)
                                    AS DECIMAL(20,9))) FROM loo) AS DOUBLE)),
                     6) AS jack_se,
               round(CAST(tot.st AS DOUBLE) / tot.nt
                     - 1.96 * sqrt((CAST(lbar.g - 1 AS DOUBLE) / lbar.g)
                 * CAST((SELECT sum(CAST(round((m - lbar.lb) * (m - lbar.lb), 9)
                                    AS DECIMAL(20,9))) FROM loo) AS DOUBLE)),
                     4) AS ci_lo,
               round(CAST(tot.st AS DOUBLE) / tot.nt
                     + 1.96 * sqrt((CAST(lbar.g - 1 AS DOUBLE) / lbar.g)
                 * CAST((SELECT sum(CAST(round((m - lbar.lb) * (m - lbar.lb), 9)
                                    AS DECIMAL(20,9))) FROM loo) AS DOUBLE)),
                     4) AS ci_hi
        FROM tot CROSS JOIN lbar
    """,
    doc="Delete-one-GROUP jackknife CI for the corpus mean doc length: "
    "clustered data (docs within a source correlate) makes the naive "
    "i.i.d. standard error overconfident; the leave-one-source-out "
    "estimate is the honest uncertainty. Heavy work = one per-source "
    "integer aggregate; the 20 leave-one-out means and their DECIMAL-"
    "summed squared deviations are a group-sized epilogue.",
)
def q_jackknife_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    per_src = docs.groupBy("source").agg(
        F.sum("n_chars").alias("s"), F.count(F.lit(1)).alias("n")
    )
    tot = per_src.agg(
        F.sum("s").alias("st"),
        F.sum("n").alias("nt"),
        F.count(F.lit(1)).alias("g"),
    )
    loo = per_src.crossJoin(F.broadcast(tot)).select(
        ((F.col("st") - F.col("s")).cast("double") / (F.col("nt") - F.col("n")))
        .alias("m"),
        "g",
    )
    loo = managed_persist(loo)  # mean-of-loo and squared-deviation passes share it
    lbar = loo.agg(
        (
            F.sum(F.round("m", 9).cast("decimal(20,9)")).cast("double")
            / F.min("g")
        ).alias("lb")
    )
    dev2 = (
        loo.crossJoin(F.broadcast(lbar))
        .agg(
            F.sum(
                F.round(
                    (F.col("m") - F.col("lb")) * (F.col("m") - F.col("lb")), 9
                ).cast("decimal(20,9)")
            )
            .cast("double")
            .alias("ss")
        )
    )
    mean = F.col("st").cast("double") / F.col("nt")
    se = F.sqrt(
        ((F.col("g") - 1).cast("double") / F.col("g")) * F.col("ss")
    )
    return (
        tot.crossJoin(F.broadcast(dev2))
        .select(
            F.col("nt").alias("n_docs"),
            F.col("g").cast("long").alias("n_groups"),
            F.round(mean, 4).alias("mean_chars"),
            F.round(se, 6).alias("jack_se"),
            F.round(mean - 1.96 * se, 4).alias("ci_lo"),
            F.round(mean + 1.96 * se, 4).alias("ci_hi"),
        )
    )


@register(
    "q_k_anonymity",
    oracle="""
        WITH classes AS (
            SELECT c_nationkey, c_mktsegment,
                   CAST(count(*) AS BIGINT) AS sz,
                   CAST(count(DISTINCT CAST(floor(c_acctbal / 1000)
                                            AS BIGINT)) AS BIGINT) AS l
            FROM customer GROUP BY 1, 2
        )
        SELECT CAST(sum(sz) AS BIGINT) AS n_rows,
               CAST(count(*) AS BIGINT) AS n_classes,
               CAST(min(sz) AS BIGINT) AS k_anonymity,
               CAST(sum(CASE WHEN sz < 5 THEN sz ELSE 0 END) AS BIGINT)
                   AS n_rows_below_k,
               round(CAST(sum(CASE WHEN sz < 5 THEN sz ELSE 0 END) AS DOUBLE)
                     / sum(sz), 6) AS pct_rows_below_k,
               CAST(min(l) AS BIGINT) AS l_diversity,
               CAST(sum((l < 2)::INT) AS BIGINT) AS n_classes_below_l
        FROM classes
    """,
    doc="k-anonymity / l-diversity re-identification audit (Sweeney "
    "2002; Machanavajjhala 2007): equivalence classes over the "
    "(nation, market-segment) quasi-identifiers, sensitive attribute "
    "= account-balance bucket. Reports the dataset's k (min class "
    "size), the rows a k=5 suppression pass would drop, and the "
    "homogeneity-attack l (min distinct sensitive values per class). "
    "One quasi-keyed count + distinct-count off the same shuffle, one "
    "class-sized roll-up — no windows, no joins "
    "(operators/privacy.k_anonymity_audit).",
)
def q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hw_kafka_streams_spark.operators.privacy import k_anonymity_audit

    cust = load_table(spark, "customer", sf_dir).withColumn(
        "acct_bucket", F.floor(F.col("c_acctbal") / 1000).cast("long")
    )
    return k_anonymity_audit(
        cust,
        ["c_nationkey", "c_mktsegment"],
        sensitive_col="acct_bucket",
        k=5,
        l_threshold=2,
    )


@register(
    "q_gopher_rules",
    oracle="""
        WITH toks AS (
            SELECT doc_id, unnest(list_filter(
                     string_split_regex(trim(lower(text)), '\\s+'),
                     x -> x <> '')) AS t
            FROM documents
        ),
        ts AS (
            SELECT doc_id,
                   CAST(count(*) AS BIGINT) AS n_words,
                   CAST(sum(length(t)) AS BIGINT) AS chars,
                   CAST(sum(regexp_matches(t, '[a-z]')::INT) AS BIGINT)
                       AS alpha_words,
                   CAST(count(DISTINCT CASE WHEN t IN
                        ('and','be','have','of','that','the','to','with')
                        THEN t END) AS BIGINT) AS n_stop_distinct
            FROM toks GROUP BY 1
        ),
        base AS (
            SELECT doc_id,
                   len(regexp_extract_all(text, '\\n')) + 1 AS n_lines,
                   len(regexp_extract_all(text, '(?m)^[ \\t]*[-*•]')) AS bul,
                   len(regexp_extract_all(text, '(?m)(\\.\\.\\.|…)$')) AS ell,
                   len(regexp_extract_all(text, '#|\\.\\.\\.|…')) AS sym
            FROM documents
        ),
        j AS (
            SELECT base.doc_id,
                   COALESCE(n_words, 0) AS n_words,
                   round(CAST(chars AS DOUBLE) / n_words, 6) AS mean_word_len,
                   round(CAST(sym AS DOUBLE) / n_words, 6) AS symbol_ratio,
                   round(CAST(bul AS DOUBLE) / n_lines, 6)
                       AS bullet_line_frac,
                   round(CAST(ell AS DOUBLE) / n_lines, 6)
                       AS ellipsis_line_frac,
                   round(CAST(alpha_words AS DOUBLE) / n_words, 6)
                       AS alpha_word_frac,
                   COALESCE(n_stop_distinct, 0) AS n_stop_distinct
            FROM base LEFT JOIN ts USING (doc_id)
        )
        SELECT doc_id, n_words, mean_word_len, symbol_ratio,
               bullet_line_frac, ellipsis_line_frac, alpha_word_frac,
               n_stop_distinct,
               COALESCE(n_words >= 50 AND n_words <= 100000, false)
                   AS r_word_count,
               COALESCE(mean_word_len >= 3 AND mean_word_len <= 10, false)
                   AS r_mean_wordlen,
               COALESCE(symbol_ratio <= 0.1, false) AS r_symbol,
               COALESCE(bullet_line_frac < 0.9, false) AS r_bullet,
               COALESCE(ellipsis_line_frac < 0.3, false) AS r_ellipsis,
               COALESCE(alpha_word_frac >= 0.8, false) AS r_alpha,
               COALESCE(n_stop_distinct >= 2, false) AS r_stopwords,
               COALESCE(n_words >= 50 AND n_words <= 100000, false)
               AND COALESCE(mean_word_len >= 3 AND mean_word_len <= 10, false)
               AND COALESCE(symbol_ratio <= 0.1, false)
               AND COALESCE(bullet_line_frac < 0.9, false)
               AND COALESCE(ellipsis_line_frac < 0.3, false)
               AND COALESCE(alpha_word_frac >= 0.8, false)
               AND COALESCE(n_stop_distinct >= 2, false) AS passes_gopher
        FROM j ORDER BY doc_id
    """,
    doc="The Gopher document-quality rule battery (Rae et al. 2021 "
    "Table A1) as per-document verdicts: word-count bounds, mean word "
    "length, symbol-to-word ratio, bullet-started and ellipsis-ended "
    "line fractions, alphabetic-word fraction, distinct-stopword "
    "floor, and the AND of all. Line rules are (?m) multiline regexp "
    "counts in a narrow map; token rules come from one explode + "
    "id-keyed aggregation joined back — all expressions in the RE2 "
    "subset so the oracle replays them exactly "
    "(operators/quality.gopher_rules).",
)
def q_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hw_kafka_streams_spark.operators.quality import gopher_rules

    docs = load_table(spark, "documents", sf_dir)
    return gopher_rules(docs).orderBy("doc_id")


@register(
    "q_mutual_information",
    oracle="""
        WITH cells AS (
          SELECT lang AS a, source AS b, CAST(count(*) AS BIGINT) AS c
          FROM documents GROUP BY 1, 2
        ),
        at AS (SELECT a, CAST(sum(c) AS BIGINT) AS atn FROM cells GROUP BY 1),
        bt AS (SELECT b, CAST(sum(c) AS BIGINT) AS btn FROM cells GROUP BY 1),
        tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM cells),
        ha AS (
          SELECT -CAST(sum(CAST(round(
                     (atn / CAST(n AS DOUBLE)) * ln(atn / CAST(n AS DOUBLE)),
                     9) AS DECIMAL(20,9))) AS DOUBLE) AS h_a
          FROM at CROSS JOIN tot
        ),
        hb AS (
          SELECT -CAST(sum(CAST(round(
                     (btn / CAST(n AS DOUBLE)) * ln(btn / CAST(n AS DOUBLE)),
                     9) AS DECIMAL(20,9))) AS DOUBLE) AS h_b
          FROM bt CROSS JOIN tot
        ),
        mi AS (
          SELECT CAST(sum(CAST(round(
                     (c / CAST(n AS DOUBLE))
                     * ln((CAST(c AS DOUBLE) * n)
                          / (CAST(atn AS DOUBLE) * btn)),
                     9) AS DECIMAL(20,9))) AS DOUBLE) AS mi
          FROM cells JOIN at USING (a) JOIN bt USING (b) CROSS JOIN tot
        )
        SELECT n, round(mi, 6) AS mi, round(h_a, 6) AS h_a,
               round(h_b, 6) AS h_b,
               round(CASE WHEN h_a > 0 AND h_b > 0
                          THEN mi / sqrt(h_a * h_b) END, 6) AS nmi
        FROM tot CROSS JOIN mi CROSS JOIN ha CROSS JOIN hb
    """,
    doc="Mutual information between language and source labels (nats), "
    "marginal entropies, and normalized MI — chi-squared's sibling on "
    "an information scale: how much metadata redundancy / label "
    "leakage one column carries about another. One category-bounded "
    "(a, b) count shuffle, margins broadcast, per-cell terms 9dp-"
    "rounded and DECIMAL-summed (operators/stats.mutual_information).",
)
def q_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hw_kafka_streams_spark.operators.stats import mutual_information

    docs = load_table(spark, "documents", sf_dir)
    return mutual_information(docs, "lang", "source")


@register(
    "q_pearson_corr",
    oracle="""
        WITH m AS (
          SELECT CAST(count(*) AS BIGINT) AS n,
                 sum(CAST(round(CAST(l_quantity AS DOUBLE), 6)
                          AS DECIMAL(19,6))) AS s_q,
                 sum(CAST(round(CAST(l_quantity AS DOUBLE), 6)
                          AS DECIMAL(19,6))
                     * CAST(round(CAST(l_quantity AS DOUBLE), 6)
                            AS DECIMAL(19,6))) AS q_q,
                 sum(CAST(round(CAST(l_extendedprice AS DOUBLE), 6)
                          AS DECIMAL(19,6))) AS s_e,
                 sum(CAST(round(CAST(l_extendedprice AS DOUBLE), 6)
                          AS DECIMAL(19,6))
                     * CAST(round(CAST(l_extendedprice AS DOUBLE), 6)
                            AS DECIMAL(19,6))) AS q_e,
                 sum(CAST(round(CAST(l_discount AS DOUBLE), 6)
                          AS DECIMAL(19,6))) AS s_d,
                 sum(CAST(round(CAST(l_discount AS DOUBLE), 6)
                          AS DECIMAL(19,6))
                     * CAST(round(CAST(l_discount AS DOUBLE), 6)
                            AS DECIMAL(19,6))) AS q_d,
                 sum(CAST(round(CAST(l_quantity AS DOUBLE), 6)
                          AS DECIMAL(19,6))
                     * CAST(round(CAST(l_extendedprice AS DOUBLE), 6)
                            AS DECIMAL(19,6))) AS p_qe,
                 sum(CAST(round(CAST(l_quantity AS DOUBLE), 6)
                          AS DECIMAL(19,6))
                     * CAST(round(CAST(l_discount AS DOUBLE), 6)
                            AS DECIMAL(19,6))) AS p_qd,
                 sum(CAST(round(CAST(l_extendedprice AS DOUBLE), 6)
                          AS DECIMAL(19,6))
                     * CAST(round(CAST(l_discount AS DOUBLE), 6)
                            AS DECIMAL(19,6))) AS p_ed
          FROM lineitem
        )
        SELECT 'l_quantity' AS col_x, 'l_extendedprice' AS col_y, n,
               round((n * CAST(p_qe AS DOUBLE)
                      - CAST(s_q AS DOUBLE) * CAST(s_e AS DOUBLE))
                     / sqrt((n * CAST(q_q AS DOUBLE)
                             - CAST(s_q AS DOUBLE) * CAST(s_q AS DOUBLE))
                            * (n * CAST(q_e AS DOUBLE)
                               - CAST(s_e AS DOUBLE) * CAST(s_e AS DOUBLE))),
                     6) AS corr
        FROM m
        UNION ALL
        SELECT 'l_quantity', 'l_discount', n,
               round((n * CAST(p_qd AS DOUBLE)
                      - CAST(s_q AS DOUBLE) * CAST(s_d AS DOUBLE))
                     / sqrt((n * CAST(q_q AS DOUBLE)
                             - CAST(s_q AS DOUBLE) * CAST(s_q AS DOUBLE))
                            * (n * CAST(q_d AS DOUBLE)
                               - CAST(s_d AS DOUBLE) * CAST(s_d AS DOUBLE))),
                     6)
        FROM m
        UNION ALL
        SELECT 'l_extendedprice', 'l_discount', n,
               round((n * CAST(p_ed AS DOUBLE)
                      - CAST(s_e AS DOUBLE) * CAST(s_d AS DOUBLE))
                     / sqrt((n * CAST(q_e AS DOUBLE)
                             - CAST(s_e AS DOUBLE) * CAST(s_e AS DOUBLE))
                            * (n * CAST(q_d AS DOUBLE)
                               - CAST(s_d AS DOUBLE) * CAST(s_d AS DOUBLE))),
                     6)
        FROM m
        ORDER BY col_x, col_y
    """,
    doc="Pairwise Pearson correlation matrix over lineitem's numeric "
    "measures in ONE aggregation pass: all moment sums (per-column "
    "sums/squares + per-pair products) accumulate as exact "
    "DECIMAL(19,6) partials in a single agg, then the one-row result "
    "explodes to pair rows via an inline struct array — pair count "
    "never multiplies scan cost, reducer order cannot drift the hash "
    "(operators/stats.corr_matrix).",
)
def q_pearson_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hw_kafka_streams_spark.operators.stats import corr_matrix

    li = load_table(spark, "lineitem", sf_dir)
    return corr_matrix(
        li, ["l_quantity", "l_extendedprice", "l_discount"]
    ).orderBy("col_x", "col_y")


@register(
    "q_spearman_corr",
    oracle=r"""
        WITH rows_ AS (
          SELECT CAST(n_chars AS DOUBLE) AS x,
                 CAST(len(list_filter(
                     string_split_regex(trim(text), '\s+'),
                     e -> e <> '')) AS DOUBLE) AS y
          FROM documents
          WHERE n_chars IS NOT NULL AND text IS NOT NULL
        ),
        rx AS (
          SELECT v, 2 * cum + c + 1 AS r2 FROM (
            SELECT x AS v, CAST(count(*) AS BIGINT) AS c,
                   COALESCE(CAST(sum(count(*)) OVER (
                       ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING) AS BIGINT), 0) AS cum
            FROM rows_ GROUP BY x)
        ),
        ry AS (
          SELECT v, 2 * cum + c + 1 AS r2 FROM (
            SELECT y AS v, CAST(count(*) AS BIGINT) AS c,
                   COALESCE(CAST(sum(count(*)) OVER (
                       ORDER BY y ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING) AS BIGINT), 0) AS cum
            FROM rows_ GROUP BY y)
        ),
        ranked AS (
          SELECT CAST(rx.r2 AS HUGEINT) AS a, CAST(ry.r2 AS HUGEINT) AS b
          FROM rows_ JOIN rx ON rows_.x = rx.v JOIN ry ON rows_.y = ry.v
        ),
        m AS (
          SELECT CAST(count(*) AS BIGINT) AS n,
                 sum(a) AS sx, sum(b) AS sy, sum(a * b) AS sxy,
                 sum(a * a) AS sx2, sum(b * b) AS sy2
          FROM ranked
        )
        SELECT n,
               round(CASE WHEN n * CAST(sx2 AS DOUBLE)
                               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
                          AND n * CAST(sy2 AS DOUBLE)
                               - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) > 0
                          THEN (n * CAST(sxy AS DOUBLE)
                                - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                               / sqrt((n * CAST(sx2 AS DOUBLE)
                                       - CAST(sx AS DOUBLE)
                                         * CAST(sx AS DOUBLE))
                                      * (n * CAST(sy2 AS DOUBLE)
                                         - CAST(sy AS DOUBLE)
                                           * CAST(sy AS DOUBLE)))
                     END, 6) AS rho
        FROM m
    """,
    doc="Spearman rank correlation of document char length vs "
    "whitespace-token count — monotone-association audit robust to "
    "outliers and scale. Average ranks with ties stay INTEGERS by "
    "doubling (2r = 2*cum_below + cnt + 1), so every moment sum is "
    "exact and the doubled scale cancels in the closed form; ranks "
    "come from distinct-value counts + range-blocked prefix sums "
    "(never a global rank window) (operators/stats.spearman_corr).",
)
def q_spearman_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hw_kafka_streams_spark.operators.stats import spearman_corr
    from hw_kafka_streams_spark.operators.text import word_tokens as _wt

    docs = load_table(spark, "documents", sf_dir).filter(
        F.col("n_chars").isNotNull() & F.col("text").isNotNull()
    )
    return spearman_corr(
        docs,
        F.col("n_chars").cast("double"),
        F.size(_wt(F.col("text"))).cast("double"),
    )


@register(
    "q_welch_ttest",
    oracle="""
        WITH m AS (
          SELECT
            CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
                 AS BIGINT) AS na,
            CAST(sum(CASE WHEN lang <> 'en' THEN 1 ELSE 0 END)
                 AS BIGINT) AS nb,
            sum(CASE WHEN lang = 'en'
                     THEN CAST(n_chars AS HUGEINT) END) AS sa,
            sum(CASE WHEN lang <> 'en'
                     THEN CAST(n_chars AS HUGEINT) END) AS sb,
            sum(CASE WHEN lang = 'en'
                     THEN CAST(n_chars AS HUGEINT) * n_chars END) AS qa,
            sum(CASE WHEN lang <> 'en'
                     THEN CAST(n_chars AS HUGEINT) * n_chars END) AS qb
          FROM documents
          WHERE lang IN ('en', 'zh') AND n_chars IS NOT NULL
        )
        SELECT na AS n_a, nb AS n_b,
               round(CAST(sa AS DOUBLE) / na, 4) AS mean_a,
               round(CAST(sb AS DOUBLE) / nb, 4) AS mean_b,
               round((CAST(sa AS DOUBLE) / na - CAST(sb AS DOUBLE) / nb)
                     / sqrt((CAST(na AS DOUBLE) * qa - CAST(sa AS DOUBLE)
                             * sa) / (CAST(na AS DOUBLE) * (na - 1)) / na
                            + (CAST(nb AS DOUBLE) * qb - CAST(sb AS DOUBLE)
                               * sb) / (CAST(nb AS DOUBLE) * (nb - 1)) / nb),
                     6) AS t_stat,
               round(power((CAST(na AS DOUBLE) * qa - CAST(sa AS DOUBLE)
                            * sa) / (CAST(na AS DOUBLE) * (na - 1)) / na
                           + (CAST(nb AS DOUBLE) * qb - CAST(sb AS DOUBLE)
                              * sb) / (CAST(nb AS DOUBLE) * (nb - 1)) / nb,
                           2)
                     / (power((CAST(na AS DOUBLE) * qa - CAST(sa AS DOUBLE)
                               * sa) / (CAST(na AS DOUBLE) * (na - 1)) / na,
                              2) / (na - 1)
                        + power((CAST(nb AS DOUBLE) * qb
                                 - CAST(sb AS DOUBLE) * sb)
                                / (CAST(nb AS DOUBLE) * (nb - 1)) / nb,
                                2) / (nb - 1)),
                     4) AS df_welch
        FROM m
    """,
    doc="Welch's unequal-variance t-test of doc char length, English "
    "vs Chinese — the default two-sample A/B test for curation "
    "changes. One map-side-combinable pass builds exact DECIMAL "
    "moments (n, sum, sum-of-squares per group); t statistic and "
    "Welch-Satterthwaite df are a scalar epilogue "
    "(operators/stats.welch_ttest). No sort, no join, O(1) state — "
    "the cheapest possible 100 TB plan.",
)
def q_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hw_kafka_streams_spark.operators.stats import welch_ttest

    docs = load_table(spark, "documents", sf_dir)
    return welch_ttest(docs, "lang", "n_chars", "en", "zh")


@register(
    "q_mann_whitney",
    oracle="""
        WITH base AS (
          SELECT lang = 'en' AS is_a, CAST(n_chars AS DOUBLE) AS v
          FROM documents
          WHERE lang IN ('en', 'zh') AND n_chars IS NOT NULL
        ), per_v AS (
          SELECT v,
                 sum(CASE WHEN is_a THEN 1 ELSE 0 END) AS ca,
                 sum(CASE WHEN is_a THEN 0 ELSE 1 END) AS cb
          FROM base GROUP BY v
        ), rk AS (
          SELECT ca, cb, ca + cb AS c,
                 2 * COALESCE(sum(ca + cb) OVER (
                       ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING), 0)
                 + (ca + cb) + 1 AS r2
          FROM per_v
        ), m AS (
          SELECT CAST(sum(ca) AS BIGINT) AS n1,
                 CAST(sum(cb) AS BIGINT) AS n2,
                 sum(CAST(ca AS HUGEINT) * r2) AS r1d,
                 sum(CAST(c AS HUGEINT) * c * c - c) AS ties
          FROM rk
        )
        SELECT n1 AS n_a, n2 AS n_b,
               (CAST(r1d AS DOUBLE) - CAST(n1 AS DOUBLE) * (n1 + 1)) / 2
                 AS u_a,
               CAST(n1 AS DOUBLE) * n2
                 - (CAST(r1d AS DOUBLE) - CAST(n1 AS DOUBLE) * (n1 + 1)) / 2
                 AS u_b,
               round(((CAST(r1d AS DOUBLE) - CAST(n1 AS DOUBLE) * (n1 + 1))
                       / 2 - CAST(n1 AS DOUBLE) * n2 / 2)
                     / sqrt(CAST(n1 AS DOUBLE) * n2 / 12.0
                            * ((CAST(n1 AS DOUBLE) + n2 + 1)
                               - CAST(ties AS DOUBLE)
                                 / ((CAST(n1 AS DOUBLE) + n2)
                                    * (CAST(n1 AS DOUBLE) + n2 - 1)))),
                     6) AS z_score
        FROM m
    """,
    doc="Mann-Whitney U (Wilcoxon rank-sum) of doc char length, "
    "English vs Chinese — the nonparametric partner to q_welch_ttest "
    "for heavy-tailed distributions. Combined-sample average ranks "
    "stay integers by doubling (the spearman trick), so rank sums, "
    "both U statistics, and the tie term sum(t^3-t) are exact; the "
    "tie-corrected normal z is a scalar epilogue. Ranks via "
    "distinct-value counts + range-blocked prefix sums, never a "
    "global rank window (operators/stats.mann_whitney_u).",
)
def q_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hw_kafka_streams_spark.operators.stats import mann_whitney_u

    docs = load_table(spark, "documents", sf_dir)
    return mann_whitney_u(docs, "lang", "n_chars", "en", "zh")


@register(
    "q_anova_f",
    oracle="""
        WITH per_g AS (
          SELECT lang AS g, CAST(count(*) AS BIGINT) AS n,
                 sum(CAST(n_chars AS HUGEINT)) AS s,
                 sum(CAST(n_chars AS HUGEINT) * n_chars) AS q
          FROM documents
          WHERE n_chars IS NOT NULL AND lang IS NOT NULL
          GROUP BY 1
        ), m AS (
          SELECT CAST(count(*) AS BIGINT) AS k,
                 CAST(sum(n) AS BIGINT) AS nt,
                 sum(s) AS st, sum(q) AS qt,
                 sum(CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                     / CAST(n AS DOUBLE)) AS sg2
          FROM per_g
        )
        SELECT k AS k_groups, nt AS n,
               round(((sg2 - CAST(st AS DOUBLE) * CAST(st AS DOUBLE)
                       / CAST(nt AS DOUBLE)) / (CAST(k AS DOUBLE) - 1))
                     / ((CAST(qt AS DOUBLE) - sg2)
                        / (CAST(nt AS DOUBLE) - k)), 6) AS f_stat
        FROM m
    """,
    doc="One-way ANOVA F statistic of doc char length across "
    "languages — the k-group mean-difference audit (does length "
    "distribution differ by language partition?). One "
    "map-side-combinable pass builds exact DECIMAL moments per group; "
    "between/within sums of squares reduce over the tiny k-row table "
    "and the F ratio is a rounded scalar epilogue "
    "(operators/stats.anova_f_oneway). No sort, no join.",
)
def q_anova_f(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hw_kafka_streams_spark.operators.stats import anova_f_oneway

    docs = load_table(spark, "documents", sf_dir)
    return anova_f_oneway(docs, "lang", "n_chars")


@register(
    "q_kruskal_wallis",
    oracle="""
        WITH base AS (
          SELECT lang AS g, CAST(n_chars AS DOUBLE) AS v
          FROM documents
          WHERE n_chars IS NOT NULL AND lang IS NOT NULL
        ), per_v AS (
          SELECT v, CAST(count(*) AS BIGINT) AS c FROM base GROUP BY v
        ), rk AS (
          SELECT v, c,
                 2 * COALESCE(sum(c) OVER (
                       ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING), 0) + c + 1 AS r2
          FROM per_v
        ), per_g AS (
          SELECT g, CAST(count(*) AS BIGINT) AS n,
                 sum(CAST(r2 AS HUGEINT)) AS rs
          FROM base JOIN rk USING (v) GROUP BY g
        ), t AS (
          SELECT sum(CAST(c AS HUGEINT) * c * c - c) AS ties FROM rk
        ), m AS (
          SELECT CAST(count(*) AS BIGINT) AS k,
                 CAST(sum(n) AS BIGINT) AS nt,
                 sum(CAST(rs AS DOUBLE) * CAST(rs AS DOUBLE)
                     / CAST(n AS DOUBLE)) AS rg2
          FROM per_g
        )
        SELECT k AS k_groups, nt AS n,
               round((3.0 / (CAST(nt AS DOUBLE) * (nt + 1)) * rg2
                      - 3 * (CAST(nt AS DOUBLE) + 1))
                     / (1 - CAST(ties AS DOUBLE)
                            / (CAST(nt AS DOUBLE) * nt * nt - nt)),
                     6) AS h_stat
        FROM m, t
    """,
    doc="Kruskal-Wallis H (rank ANOVA) of doc char length across "
    "languages with the standard tie correction — the nonparametric "
    "k-group audit. Combined-sample average ranks stay integers by "
    "doubling (H = 3/(n(n+1))*sum(R2_g^2/n_g) - 3(n+1) on doubled "
    "rank sums), rank-sum and tie terms are exact DECIMAL, and ranks "
    "come from distinct-value counts + range-blocked prefix sums — "
    "never a global rank window (operators/stats.kruskal_wallis).",
)
def q_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hw_kafka_streams_spark.operators.stats import kruskal_wallis

    docs = load_table(spark, "documents", sf_dir)
    return kruskal_wallis(docs, "lang", "n_chars")


@register(
    "q_jaro_winkler_pairs",
    oracle="""
        WITH s AS (
          SELECT p_partkey AS id, p_name AS name,
                 p_brand || ':' || string_split(p_name, ' ')[1]
                         || ':' || string_split(p_name, ' ')[2] AS blk,
                 length(p_name) AS l
          FROM part
        ), bs AS (
          SELECT blk, count(*) AS n FROM s GROUP BY blk
        ), keep AS (
          SELECT s.* FROM s JOIN bs USING (blk) WHERE bs.n <= 32
        ), pairs AS (
          SELECT a.id AS id_a, b.id AS id_b,
                 round(jaro_winkler_similarity(a.name, b.name), 6) AS jw
          FROM keep a JOIN keep b
            ON a.blk = b.blk AND a.id < b.id AND abs(a.l - b.l) <= 6
        )
        SELECT CAST(floor(jw * 100) AS INT) AS jw_bucket,
               CAST(count(*) AS BIGINT) AS n_pairs,
               CAST(sum(id_a + id_b) AS BIGINT) AS sum_ids
        FROM pairs WHERE jw >= 0.9
        GROUP BY 1 ORDER BY 1
    """,
    doc="Record linkage over part names (operators/linkage.py): "
    "blocked candidate generation — block key = (brand, first two "
    "name tokens) + length band, with the max_block=32 oversized-"
    "block drop policy (a block bigger than the cap means the key is "
    "non-discriminative there; dropping it bounds pair work at "
    "blocks*cap^2 on any data volume — first-token-only blocking "
    "went quadratic on TPC-H's ~92-color name vocabulary: 25M pairs "
    "and 235s at sf0.1 vs 125k pairs and ~1s with this key) — then "
    "Jaro-Winkler scoring in an Arrow-batched kernel, bucketed into "
    "a score histogram with a pair-membership checksum (sum of "
    "id_a+id_b per bucket pins EVERY retained pair). The Python "
    "Jaro-Winkler is parameter-identical to DuckDB's built-in "
    "jaro_winkler_similarity (match window floor(max/2)-1, half "
    "transpositions, prefix<=4, scale 0.1, boost threshold 0.7), so "
    "the oracle recomputes every score with an independent "
    "implementation, and replicates the block-size cap in a CTE. "
    "Threshold applies to the 6-dp-rounded score so boundary "
    "membership is engine-reproducible.",
)
def q_jaro_winkler_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hw_kafka_streams_spark.operators.linkage import jw_linkage_pairs

    part = load_table(spark, "part", sf_dir)
    toks = F.split(F.col("p_name"), " ")
    pairs = jw_linkage_pairs(
        part,
        "p_partkey",
        "p_name",
        F.concat_ws(":", F.col("p_brand"), toks.getItem(0), toks.getItem(1)),
        threshold=0.9,
        length_band=6,
        max_block=32,
    )
    return (
        pairs.groupBy(
            F.floor(F.col("jw") * 100).cast("int").alias("jw_bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum(F.col("id_a") + F.col("id_b")).alias("sum_ids"),
        )
        .orderBy("jw_bucket")
    )


@register(
    "q_soundex_blocking",
    oracle=r"""
        WITH words AS (
          SELECT DISTINCT unnest(list_filter(
                   string_split_regex(trim(lower(text)), '\s+'),
                   x -> x <> '')) AS w
          FROM documents WHERE text IS NOT NULL
        ), alpha AS (
          SELECT w FROM words WHERE regexp_matches(w, '^[a-z]+$')
        ), m AS (
          SELECT w, list_filter(string_split(upper(w), ''),
                                x -> x BETWEEN 'A' AND 'Z') AS ls0
          FROM alpha
        ), hw AS (
          SELECT w, list_concat([ls0[1]],
                   list_filter(ls0, (x, i) -> i > 1 AND x <> 'H'
                                    AND x <> 'W')) AS ls
          FROM m
        ), coded AS (
          SELECT w, ls,
                 list_transform(ls, x ->
                   substring('01230120022455012623010202',
                             ascii(x) - 64, 1)) AS cs
          FROM hw
        ), sx AS (
          SELECT w,
                 substring(
                   ls[1] || coalesce(array_to_string(
                     list_filter(cs, (x, i) -> i > 1 AND x <> '0'
                                      AND x <> cs[i-1]), ''), '')
                   || '000', 1, 4) AS code
          FROM coded
        )
        SELECT code, CAST(count(*) AS BIGINT) AS n_words,
               min(w) AS min_word, max(w) AS max_word
        FROM sx GROUP BY code
        ORDER BY n_words DESC, code LIMIT 40
    """,
    doc="Phonetic blocking key audit: US-census Soundex (the "
    "H/W-transparent variant Spark's JVM-side soundex() implements — "
    "verified code-for-code against a 46-case battery incl. "
    "Ashcraft/Tymczak/Pfister/Wheel) over the distinct alphabetic "
    "corpus vocabulary, reporting the 40 largest phonetic buckets "
    "with min/max members. The blocking companion to "
    "q_jaro_winkler_pairs: soundex keys bound candidate generation "
    "for name-matching the way LSH bands bound near-dup search. "
    "Entirely JVM-side (whole-stage codegen, zero Python); the "
    "oracle re-implements the full algorithm in SQL list lambdas — "
    "letter mapping '01230120022455012623010202', H/W transparency, "
    "vowel duplicate-reset, 4-char pad.",
)
def q_soundex_blocking(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hw_kafka_streams_spark.operators.text import word_tokens

    docs = load_table(spark, "documents", sf_dir).filter(
        F.col("text").isNotNull()
    )
    words = (
        docs.select(F.explode(word_tokens(F.lower(F.col("text")))).alias("w"))
        .filter(F.col("w").rlike("^[a-z]+$"))
        .distinct()
    )
    return (
        words.select("w", F.soundex(F.col("w")).alias("code"))
        .groupBy("code")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.min("w").alias("min_word"),
            F.max("w").alias("max_word"),
        )
        .orderBy(F.desc("n_words"), "code")
        .limit(40)
    )


@register(
    "q_homoglyph_spoofs",
    oracle=r"""
        WITH words AS (
          SELECT DISTINCT unnest(list_filter(
                   string_split_regex(trim(lower(text)), '\s+'),
                   x -> x <> '')) AS w
          FROM documents WHERE text IS NOT NULL
        ), alpha AS (
          SELECT w FROM words WHERE regexp_matches(w, '^[a-z]+$')
        ), spoofed AS (
          SELECT w FROM alpha
          UNION ALL
          SELECT translate(w, 'aeocxpy', 'аеосхру') AS w
          FROM alpha WHERE length(w) >= 6 AND w LIKE 's%'
        ), folded AS (
          SELECT w, translate(w, 'аеосхру', 'aeocxpy') AS skeleton
          FROM spoofed
        )
        SELECT skeleton, CAST(count(DISTINCT w) AS BIGINT) AS n_forms,
               min(w) AS min_form, max(w) AS max_form
        FROM folded GROUP BY skeleton
        HAVING count(DISTINCT w) > 1
        ORDER BY skeleton
    """,
    doc="Homoglyph spoof detection — the scaled-up version of the "
    "reference's own golden subtlety (its censor treats Cyrillic "
    "'1С' and Latin '1C' as DIFFERENT words, tests/test_golden.py): "
    "fold confusable Cyrillic lookalikes (а е о с х р у) to their "
    "Latin skeletons with a JVM-side translate() and group by "
    "skeleton — any skeleton carrying >1 distinct raw form is a "
    "spoof cluster (the Unicode-security confusables recipe, "
    "UTS #39). Spoofed variants are synthesized deterministically "
    "(all long s-words get a fully-substituted Cyrillic twin) so the "
    "detector provably fires; at crawl scale the same fold runs "
    "pre-dedup so lookalike spam can't bypass exact-hash dedup. "
    "Zero Python, one aggregation.",
)
def q_homoglyph_spoofs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hw_kafka_streams_spark.operators.text import word_tokens

    docs = load_table(spark, "documents", sf_dir).filter(
        F.col("text").isNotNull()
    )
    alpha = (
        docs.select(F.explode(word_tokens(F.lower(F.col("text")))).alias("w"))
        .filter(F.col("w").rlike("^[a-z]+$"))
        .distinct()
    )
    spoofed = alpha.unionByName(
        alpha.filter(
            (F.length("w") >= 6) & F.col("w").startswith("s")
        ).select(F.translate(F.col("w"), "aeocxpy", "аеосхру").alias("w"))
    )
    folded = spoofed.select(
        "w", F.translate(F.col("w"), "аеосхру", "aeocxpy").alias("skeleton")
    )
    return (
        folded.groupBy("skeleton")
        .agg(
            F.countDistinct("w").alias("n_forms"),
            F.min("w").alias("min_form"),
            F.max("w").alias("max_form"),
        )
        .filter(F.col("n_forms") > 1)
        .orderBy("skeleton")
    )


@register(
    "q_cuped_lift",
    oracle="""
        WITH per_unit AS MATERIALIZED (
          SELECT user_id AS unit,
                 CASE WHEN ('0x' || substring(md5(user_id::VARCHAR || ':ab42'),
                                              1, 15))::BIGINT % 2 = 0
                      THEN 'control' ELSE 'treatment' END AS arm,
                 sum(CASE WHEN ts < TIMESTAMP '2024-01-16'
                          THEN value ELSE 0.0 END) AS x,
                 sum(CASE WHEN ts >= TIMESTAMP '2024-01-16'
                          THEN value ELSE 0.0 END) AS y
          FROM events GROUP BY user_id
        ), pooled AS (
          SELECT round(covar_pop(x, y) / var_pop(x), 9) AS theta,
                 round(avg(x), 6) AS mx
          FROM per_unit
        ), adj AS (
          SELECT arm, y, y - theta * (x - mx) AS y_adj
          FROM per_unit, pooled
        )
        SELECT arm, CAST(count(*) AS BIGINT) AS n_units,
               round(avg(y), 4) AS mean_y,
               round(avg(y_adj), 4) AS mean_y_cuped,
               round(var_pop(y), 2) AS var_y,
               round(var_pop(y_adj), 2) AS var_y_cuped,
               round(1.0 - var_pop(y_adj) / var_pop(y), 4) AS var_reduction
        FROM adj GROUP BY arm ORDER BY arm
    """,
    doc="CUPED variance-reduced experiment readout over the events "
    "stream (operators/stats.cuped_lift; public Deng et al. 2013 "
    "technique): day 1-15 per-user value sums are the pre-period "
    "covariate X, day 16-30 the outcome Y, arms assigned by the "
    "content-stable md5 bucket of user_id (never rand()), pooled "
    "theta = cov(X,Y)/var_pop(X) and mean(X) rounded to 9/6 dp so "
    "both engines apply bit-identical adjustment coefficients to "
    "Y' = Y - theta*(X - mean(X)). Per arm: n, raw and adjusted "
    "means, raw and adjusted variances, achieved variance-reduction "
    "ratio. Plan: one unit-keyed shuffle (map-side combined) + one "
    "broadcast 1-row moments aggregate - no window, no second scan. "
    "On this synthetic fixture pre/post values are nearly "
    "uncorrelated so the reduction is ~0 - the oracle verifies the "
    "adjustment machinery, not an inflated win.",
)
def q_cuped_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hw_kafka_streams_spark.operators.stats import cuped_lift

    events = load_table(spark, "events", sf_dir)
    return cuped_lift(
        events, "user_id", "value", "ts", "2024-01-16 00:00:00"
    )


@register(
    "q_block_dedup_rewrite",
    oracle=r"""
        WITH d AS (
          SELECT doc_id,
                 list_filter(string_split_regex(trim(text), '\s+'),
                             e -> e <> '') AS ws
          FROM documents
          WHERE text IS NOT NULL AND trim(text) <> ''
        ),
        docs AS (
          SELECT doc_id, ws,
                 CAST(ceil(len(ws) / 10.0) AS INT) AS nb
          FROM d
        ),
        idx AS (
          SELECT doc_id, nb, ws,
                 CAST(unnest(range(nb)) AS INT) AS blk
          FROM docs
        ),
        blocks AS (
          SELECT doc_id, nb, blk,
                 array_to_string(ws[(blk * 10 + 1):(blk * 10 + 10)], ' ')
                   AS btxt
          FROM idx
        ),
        hashed AS (
          SELECT doc_id, nb, blk, btxt, md5(btxt) AS bh
          FROM blocks
        ),
        firsts AS (
          SELECT bh, min(struct_pack(doc_id := doc_id, blk := blk)) AS fk
          FROM hashed GROUP BY bh
        ),
        kept AS (
          SELECT h.* FROM hashed h JOIN firsts f
            ON h.bh = f.bh AND h.doc_id = f.fk.doc_id
                           AND h.blk = f.fk.blk
        )
        SELECT doc_id, CAST(max(nb) AS BIGINT) AS n_blocks,
               CAST(count(*) AS BIGINT) AS n_kept,
               string_agg(btxt, ' ' ORDER BY blk) AS clean_text
        FROM kept GROUP BY doc_id
        ORDER BY doc_id
    """,
    doc="C4-style corpus-level block-dedup REWRITE: every 10-word block "
    "that already appeared earlier in the corpus (ordered by (doc_id, "
    "block index)) is removed, and each document's surviving blocks "
    "are reassembled in order into clean_text - the cleaning "
    "transformation itself, not just duplicate detection (that side "
    "is q_substring_dedup). Fully-duplicated documents drop out "
    "entirely, like C4's repeated-span page pruning. First-occurrence "
    "choice is a deterministic lexicographic min over the (doc, block) "
    "struct; the global group keys on md5(block) - fixed-width keys, "
    "map-side-combined min, no pairwise join - so the whole rewrite "
    "is O(total blocks) with two shuffles at any corpus size "
    "(operators/dedup.block_dedup_rewrite).",
)
def q_block_dedup_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hw_kafka_streams_spark.operators.dedup import block_dedup_rewrite

    docs = load_table(spark, "documents", sf_dir)
    return block_dedup_rewrite(docs, "text", "doc_id", block_words=10).orderBy(
        "doc_id"
    )


@register(
    "q_decision_stump",
    oracle="""
        WITH base AS (
          SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
                 (n_chars // 10) * 10 AS f_chars,
                 (len(list_filter(string_split_regex(trim(text), '\\s+'),
                                  e -> e <> '')) // 5) * 5 AS f_tokens
          FROM documents
          WHERE text IS NOT NULL AND n_chars IS NOT NULL
                AND lang IS NOT NULL
        ),
        melted AS (
          SELECT 'f_chars' AS feature, f_chars AS v, y FROM base
          UNION ALL
          SELECT 'f_tokens' AS feature, f_tokens AS v, y FROM base
        ),
        per_v AS (
          SELECT feature, v,
                 CAST(count(*) AS BIGINT) AS c,
                 CAST(sum(y) AS BIGINT) AS p
          FROM melted GROUP BY feature, v
        ),
        cum AS (
          SELECT feature, v,
                 sum(c) OVER w AS nl, sum(p) OVER w AS pl,
                 sum(c) OVER (PARTITION BY feature) AS n,
                 sum(p) OVER (PARTITION BY feature) AS pt,
                 row_number() OVER (PARTITION BY feature ORDER BY v) AS rn,
                 count(*) OVER (PARTITION BY feature) AS nv
          FROM per_v
          WINDOW w AS (PARTITION BY feature ORDER BY v
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        ),
        splits AS (
          SELECT feature, v AS thr,
                 CAST(nl AS BIGINT) AS n_left,
                 CAST(n - nl AS BIGINT) AS n_right,
                 -- weighted Gini: sum_side (n_s/n) * (1 - sum_k (p_k/n_s)^2)
                 -- expanded to pure rational arithmetic over BIGINTs
                 (CAST(nl AS DOUBLE) / n)
                   * (1.0 - (CAST(pl AS DOUBLE) * pl
                             + CAST(nl - pl AS DOUBLE) * (nl - pl))
                           / (CAST(nl AS DOUBLE) * nl))
                 + (CAST(n - nl AS DOUBLE) / n)
                   * (1.0 - (CAST(pt - pl AS DOUBLE) * (pt - pl)
                             + CAST((n - nl) - (pt - pl) AS DOUBLE)
                               * ((n - nl) - (pt - pl)))
                           / (CAST(n - nl AS DOUBLE) * (n - nl)))
                   AS gini
          FROM cum WHERE rn < nv
        ),
        best AS (
          SELECT feature, thr, n_left, n_right, gini,
                 row_number() OVER (PARTITION BY feature
                                    ORDER BY gini, thr) AS rk
          FROM splits
        )
        SELECT feature, CAST(thr AS BIGINT) AS threshold,
               n_left, n_right, round(gini, 6) + 0.0 AS gini
        FROM best WHERE rk = 1 ORDER BY feature
    """,
    doc="Decision-stump training (one-level CART): for each feature, "
    "the split threshold minimizing weighted Gini impurity of the "
    "lang='en' label - the weak learner under boosted trees and THE "
    "classic aggregate-only distributed tree recipe (features "
    "quantized to a declared grid; per-(feature, value) class counts "
    "+ one keyed prefix-sum window = every candidate split scored in "
    "one pass; parallel PLANET/XGBoost-style histogram training). "
    "Gini is pure RATIONAL arithmetic over exact BIGINT counts - no "
    "log, no libm - so both engines compute bit-identical impurities; "
    "the argmin tie-breaks on (gini, threshold) deterministically. "
    "Candidate-split state is value-domain-bounded (the grid), never "
    "row-bounded: at 100 TB the heavy agg is one map-side-combined "
    "groupBy over (feature, grid_value, class).",
)
def q_decision_stump(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = load_table(spark, "documents", sf_dir).filter(
        F.col("text").isNotNull()
        & F.col("n_chars").isNotNull()
        & F.col("lang").isNotNull()
    )
    base = docs.select(
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"),
        (F.floor(F.col("n_chars") / 10) * 10).alias("f_chars"),
        (
            F.floor(
                F.size(F.split(F.trim(F.col("text")), r"\s+")) / 5
            )
            * 5
        ).alias("f_tokens"),
    )
    melted = base.select(
        F.lit("f_chars").alias("feature"), F.col("f_chars").alias("v"), "y"
    ).unionByName(
        base.select(
            F.lit("f_tokens").alias("feature"),
            F.col("f_tokens").alias("v"),
            "y",
        )
    )
    per_v = melted.groupBy("feature", "v").agg(
        F.count(F.lit(1)).cast("long").alias("c"),
        F.sum("y").cast("long").alias("p"),
    )
    wcum = (
        W.partitionBy("feature")
        .orderBy("v")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    wall = W.partitionBy("feature")
    cum = per_v.select(
        "feature",
        "v",
        F.sum("c").over(wcum).alias("nl"),
        F.sum("p").over(wcum).alias("pl"),
        F.sum("c").over(wall).alias("n"),
        F.sum("p").over(wall).alias("pt"),
        F.row_number().over(W.partitionBy("feature").orderBy("v")).alias("rn"),
        F.count(F.lit(1)).over(wall).alias("nv"),
    )
    nl, pl, n, pt = (F.col(c).cast("double") for c in ("nl", "pl", "n", "pt"))
    nr = n - nl
    pr = pt - pl
    gini = (nl / n) * (
        F.lit(1.0) - (pl * pl + (nl - pl) * (nl - pl)) / (nl * nl)
    ) + (nr / n) * (
        F.lit(1.0) - (pr * pr + (nr - pr) * (nr - pr)) / (nr * nr)
    )
    splits = cum.filter(F.col("rn") < F.col("nv")).select(
        "feature",
        F.col("v").alias("thr"),
        F.col("nl").cast("long").alias("n_left"),
        (F.col("n") - F.col("nl")).cast("long").alias("n_right"),
        gini.alias("gini"),
    )
    best = splits.withColumn(
        "rk",
        F.row_number().over(
            W.partitionBy("feature").orderBy("gini", "thr")
        ),
    ).filter(F.col("rk") == 1)
    return best.select(
        "feature",
        F.col("thr").cast("long").alias("threshold"),
        "n_left",
        "n_right",
        (F.round("gini", 6) + F.lit(0.0)).alias("gini"),
    ).orderBy("feature")


@register(
    "q_mahalanobis_outliers",
    oracle=r"""
        WITH base AS (
          SELECT lang,
                 CAST(n_chars AS HUGEINT) AS x,
                 CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
                                      e -> e <> '')) AS HUGEINT) AS y
          FROM documents
          WHERE text IS NOT NULL AND n_chars IS NOT NULL
                AND lang IS NOT NULL
        ),
        m AS (
          SELECT CAST(count(*) AS BIGINT) AS n,
                 sum(x) AS sx, sum(y) AS sy,
                 sum(x * x) AS sxx, sum(y * y) AS syy, sum(x * y) AS sxy
          FROM base
        ),
        -- n^2-scaled central second moments stay EXACT integers:
        -- Cxx = n*sxx - sx^2 etc.; det on that scale is n^4-scaled
        cov AS (
          SELECT n, sx, sy,
                 n * sxx - sx * sx AS cxx,
                 n * syy - sy * sy AS cyy,
                 n * sxy - sx * sy AS cxy
          FROM m
        ),
        scored AS (
          -- D2 = (n-1) * [dx dy] C^-1 [dx dy]^T with dx = x - mean;
          -- on the integer scale: dxn = n*x - sx (n-scaled deviation),
          -- D2 = (n-1) * (cyy*dxn^2 - 2*cxy*dxn*dyn + cxx*dyn^2)
          --      / (n^2 * (cxx*cyy - cxy^2))  -- all-integer numerator
          SELECT lang,
                 CAST(n - 1 AS DOUBLE)
                   * CAST(cyy * (n*x - sx) * (n*x - sx)
                          - 2 * cxy * (n*x - sx) * (n*y - sy)
                          + cxx * (n*y - sy) * (n*y - sy) AS DOUBLE)
                   / (CAST(n AS DOUBLE) * n
                      * CAST(cxx * cyy - cxy * cxy AS DOUBLE)) AS d2
          FROM base, cov
        )
        SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(CASE WHEN d2 > 9.0 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_outliers,
               round(max(d2), 6) AS max_d2
        FROM scored GROUP BY lang ORDER BY lang
    """,
    doc="Mahalanobis-distance multivariate outlier audit over (char "
    "length, token count): the covariance-aware generalization of "
    "z-scores that catches documents whose FEATURE COMBINATION is "
    "anomalous (e.g. many chars but few tokens) even when each "
    "marginal looks normal. Both the covariance moments and every "
    "per-row quadratic-form numerator are EXACT integers (n-scaled "
    "central deviations, HUGEINT/DECIMAL algebra; the 2x2 inverse is "
    "closed-form via the adjugate, no linear-algebra library), so the "
    "only doubles are two final divisions - bit-identical across "
    "engines. The n-scaled integer algebra needs ~4 log10(n max|x|) "
    "decimal digits (fits DECIMAL(38)/HUGEINT with room through the "
    "test SF range; at extreme n, score with double deviations from "
    "the broadcast means instead - exactness only matters for the "
    "cross-engine hash, not the statistic). Plan: one map-side-"
    "combined moment pass, a broadcast 1-row covariance join, then a "
    "narrow scoring map + keyed agg - the cheapest possible two-pass "
    "shape at 100 TB; D2 > 9 (~3-sigma-equivalent, chi2_2 tail) "
    "flags outliers.",
)
def q_mahalanobis_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir).filter(
        F.col("text").isNotNull()
        & F.col("n_chars").isNotNull()
        & F.col("lang").isNotNull()
    )
    dec = "decimal(38,0)"
    base = docs.select(
        "lang",
        F.col("n_chars").cast(dec).alias("x"),
        F.size(F.split(F.trim(F.col("text")), r"\s+")).cast(dec).alias("y"),
    )
    m = base.agg(
        F.count(F.lit(1)).cast(dec).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    ).select(
        "n",
        "sx",
        "sy",
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).alias("cxx"),
        (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).alias("cyy"),
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).alias("cxy"),
    )
    dxn = F.col("n") * F.col("x") - F.col("sx")
    dyn = F.col("n") * F.col("y") - F.col("sy")
    num = (
        F.col("cyy") * dxn * dxn
        - F.lit(2).cast(dec) * F.col("cxy") * dxn * dyn
        + F.col("cxx") * dyn * dyn
    )
    det = F.col("cxx") * F.col("cyy") - F.col("cxy") * F.col("cxy")
    d2 = (
        (F.col("n") - F.lit(1).cast(dec)).cast("double")
        * num.cast("double")
        / (
            F.col("n").cast("double")
            * F.col("n").cast("double")
            * det.cast("double")
        )
    )
    scored = base.crossJoin(F.broadcast(m)).select("lang", d2.alias("d2"))
    return (
        scored.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.when(F.col("d2") > 9.0, 1).otherwise(0))
            .cast("long")
            .alias("n_outliers"),
            F.round(F.max("d2"), 6).alias("max_d2"),
        )
        .orderBy("lang")
    )


@register(
    "q_levenshtein_pairs",
    oracle="""
        WITH s AS (
          SELECT p_partkey AS id, p_name AS name,
                 p_brand || ':' || string_split(p_name, ' ')[1]
                         || ':' || string_split(p_name, ' ')[2] AS blk,
                 length(p_name) AS l
          FROM part
        ), bs AS (
          SELECT blk, count(*) AS n FROM s GROUP BY blk
        ), keep AS (
          SELECT s.* FROM s JOIN bs USING (blk) WHERE bs.n <= 32
        ), pairs AS (
          SELECT a.id AS id_a, b.id AS id_b,
                 levenshtein(a.name, b.name) AS dist
          FROM keep a JOIN keep b
            ON a.blk = b.blk AND a.id < b.id AND abs(a.l - b.l) <= 3
        )
        SELECT CAST(dist AS INT) AS dist,
               CAST(count(*) AS BIGINT) AS n_pairs,
               CAST(sum(id_a + id_b) AS BIGINT) AS sum_ids
        FROM pairs WHERE dist <= 3
        GROUP BY 1 ORDER BY 1
    """,
    doc="Blocked Levenshtein linkage over part names - the unit-cost "
    "edit-distance sibling of q_jaro_winkler_pairs, sharing its "
    "(brand, first-two-tokens) block key and max_block=32 oversized-"
    "block drop (pair work bounded at blocks*cap^2 at any volume). "
    "Zero Python: Spark's builtin levenshtein scores inside "
    "whole-stage codegen and DuckDB's builtin shares the unit-cost "
    "definition, so the oracle independently recomputes every "
    "distance. The |len(a)-len(b)| <= max_dist band is a LOWER-BOUND "
    "prune here - provably lossless, unlike the heuristic JW band. "
    "Histogram by distance with a pair-membership checksum pins "
    "every retained pair (operators/linkage.edit_distance_pairs).",
)
def q_levenshtein_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hw_kafka_streams_spark.operators.linkage import edit_distance_pairs

    part = load_table(spark, "part", sf_dir)
    toks = F.split(F.col("p_name"), " ")
    pairs = edit_distance_pairs(
        part,
        "p_partkey",
        "p_name",
        F.concat_ws(":", F.col("p_brand"), toks.getItem(0), toks.getItem(1)),
        max_dist=3,
        length_band=3,
        max_block=32,
    )
    return (
        pairs.groupBy(F.col("dist").cast("int").alias("dist"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.sum(F.col("id_a") + F.col("id_b")).cast("long").alias("sum_ids"),
        )
        .orderBy("dist")
    )


@register(
    "q_stump_cv",
    oracle=r"""
        WITH base AS (
          SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
                 (n_chars // 10) * 10 AS f_chars,
                 (len(list_filter(string_split_regex(trim(text), '\s+'),
                                  e -> e <> '')) // 5) * 5 AS f_tokens,
                 CAST(('0x' || substring(md5(doc_id::VARCHAR || ':cv'),
                                         1, 15))::BIGINT % 3 AS INT) AS fold
          FROM documents
          WHERE text IS NOT NULL AND n_chars IS NOT NULL
                AND lang IS NOT NULL
        ),
        melted AS (
          SELECT fold, 'f_chars' AS feature, f_chars AS v, y FROM base
          UNION ALL
          SELECT fold, 'f_tokens' AS feature, f_tokens AS v, y FROM base
        ),
        per_v AS (
          SELECT fold, feature, v,
                 CAST(count(*) AS BIGINT) AS c, CAST(sum(y) AS BIGINT) AS p
          FROM melted GROUP BY fold, feature, v
        ),
        tot AS (
          SELECT feature, v, sum(c) AS ct, sum(p) AS pt
          FROM per_v GROUP BY feature, v
        ),
        train AS (
          SELECT f.fold_out, t.feature, t.v,
                 t.ct - COALESCE(pv.c, 0) AS c,
                 t.pt - COALESCE(pv.p, 0) AS p
          FROM (SELECT unnest([0, 1, 2]) AS fold_out) f
          CROSS JOIN tot t
          LEFT JOIN per_v pv
            ON pv.fold = f.fold_out AND pv.feature = t.feature
           AND pv.v = t.v
        ),
        cum AS (
          SELECT fold_out, feature, v,
                 sum(c) OVER w AS nl, sum(p) OVER w AS pl,
                 sum(c) OVER part AS n, sum(p) OVER part AS pt,
                 row_number() OVER (PARTITION BY fold_out, feature
                                    ORDER BY v) AS rn,
                 count(*) OVER part AS nv
          FROM train
          WINDOW w AS (PARTITION BY fold_out, feature ORDER BY v
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                 part AS (PARTITION BY fold_out, feature)
        ),
        splits AS (
          SELECT fold_out, feature, v AS thr, nl, pl, n, pt,
                 (CAST(nl AS DOUBLE) / n)
                   * (1.0 - (CAST(pl AS DOUBLE) * pl
                             + CAST(nl - pl AS DOUBLE) * (nl - pl))
                           / (CAST(nl AS DOUBLE) * nl))
                 + (CAST(n - nl AS DOUBLE) / n)
                   * (1.0 - (CAST(pt - pl AS DOUBLE) * (pt - pl)
                             + CAST((n - nl) - (pt - pl) AS DOUBLE)
                               * ((n - nl) - (pt - pl)))
                           / (CAST(n - nl AS DOUBLE) * (n - nl)))
                   AS gini
          FROM cum WHERE rn < nv AND nl > 0 AND nl < n
        ),
        winner AS (
          SELECT * FROM (
            SELECT fold_out, feature, thr, gini,
                   CASE WHEN 2 * pl > nl THEN 1 ELSE 0 END AS lab_l,
                   CASE WHEN 2 * (pt - pl) > (n - nl) THEN 1 ELSE 0 END
                     AS lab_r,
                   row_number() OVER (PARTITION BY fold_out
                                      ORDER BY gini, feature, thr) AS rk
            FROM splits) WHERE rk = 1
        ),
        eval_ AS (
          SELECT m.fold, w.feature, w.thr, w.gini,
                 CASE WHEN (CASE WHEN m.v <= w.thr
                                 THEN w.lab_l ELSE w.lab_r END) = m.y
                      THEN 1 ELSE 0 END AS ok
          FROM melted m JOIN winner w
            ON m.fold = w.fold_out AND m.feature = w.feature
        )
        SELECT fold, feature, CAST(thr AS BIGINT) AS threshold,
               CAST(count(*) AS BIGINT) AS n_test,
               CAST(sum(ok) AS BIGINT) AS n_correct,
               round(CAST(sum(ok) AS DOUBLE) / count(*), 6) AS accuracy
        FROM eval_ GROUP BY fold, feature, thr
        ORDER BY fold
    """,
    doc="3-fold cross-validated decision stump: deterministic md5-hash "
    "folds, per-fold training WITHOUT re-scanning (training counts = "
    "global per-(feature, value, class) counts MINUS the held-out "
    "fold's - the k-fold histogram-subtraction trick that makes CV "
    "cost one extra subtraction join instead of k corpus passes), "
    "Gini argmin per fold with full deterministic tie-break, majority "
    "labels per side, then held-out accuracy per fold - the "
    "model-selection loop (train/evaluate without leakage) expressed "
    "entirely as aggregates. All counts are exact integers; the only "
    "doubles are Gini ratios and the final accuracy division. Scale: "
    "the heavy agg is one (fold, feature, grid-value, class) count - "
    "grid-bounded state x k folds; evaluation is a broadcast of 3 "
    "winner rows (operators pattern: q_decision_stump).",
)
def q_stump_cv(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = load_table(spark, "documents", sf_dir).filter(
        F.col("text").isNotNull()
        & F.col("n_chars").isNotNull()
        & F.col("lang").isNotNull()
    )
    fold = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":cv"))),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        % 3
    ).cast("int")
    base = docs.select(
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"),
        (F.floor(F.col("n_chars") / 10) * 10).alias("f_chars"),
        (F.floor(F.size(F.split(F.trim(F.col("text")), r"\s+")) / 5) * 5).alias(
            "f_tokens"
        ),
        fold.alias("fold"),
    )
    melted = base.select(
        "fold", F.lit("f_chars").alias("feature"), F.col("f_chars").alias("v"), "y"
    ).unionByName(
        base.select(
            "fold",
            F.lit("f_tokens").alias("feature"),
            F.col("f_tokens").alias("v"),
            "y",
        )
    )
    per_v = melted.groupBy("fold", "feature", "v").agg(
        F.count(F.lit(1)).cast("long").alias("c"),
        F.sum("y").cast("long").alias("p"),
    )
    tot = per_v.groupBy("feature", "v").agg(
        F.sum("c").alias("ct"), F.sum("p").alias("pt")
    )
    folds = spark.range(3).select(F.col("id").cast("int").alias("fold_out"))
    train = (
        folds.crossJoin(tot)
        .join(
            per_v.withColumnRenamed("fold", "fold_out"),
            ["fold_out", "feature", "v"],
            "left",
        )
        .select(
            "fold_out",
            "feature",
            "v",
            (F.col("ct") - F.coalesce(F.col("c"), F.lit(0))).alias("c"),
            (F.col("pt") - F.coalesce(F.col("p"), F.lit(0))).alias("p"),
        )
    )
    wcum = (
        W.partitionBy("fold_out", "feature")
        .orderBy("v")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    wall = W.partitionBy("fold_out", "feature")
    cum = train.select(
        "fold_out",
        "feature",
        "v",
        F.sum("c").over(wcum).alias("nl"),
        F.sum("p").over(wcum).alias("pl"),
        F.sum("c").over(wall).alias("n"),
        F.sum("p").over(wall).alias("pt"),
        F.row_number()
        .over(W.partitionBy("fold_out", "feature").orderBy("v"))
        .alias("rn"),
        F.count(F.lit(1)).over(wall).alias("nv"),
    )
    nl, pl, n, pt = (F.col(c).cast("double") for c in ("nl", "pl", "n", "pt"))
    nr, pr = n - nl, pt - pl
    gini = (nl / n) * (
        F.lit(1.0) - (pl * pl + (nl - pl) * (nl - pl)) / (nl * nl)
    ) + (nr / n) * (
        F.lit(1.0) - (pr * pr + (nr - pr) * (nr - pr)) / (nr * nr)
    )
    splits = cum.filter(
        (F.col("rn") < F.col("nv")) & (F.col("nl") > 0) & (F.col("nl") < F.col("n"))
    ).select(
        "fold_out",
        "feature",
        F.col("v").alias("thr"),
        gini.alias("gini"),
        F.when(2 * F.col("pl") > F.col("nl"), 1).otherwise(0).alias("lab_l"),
        F.when(
            2 * (F.col("pt") - F.col("pl")) > (F.col("n") - F.col("nl")), 1
        )
        .otherwise(0)
        .alias("lab_r"),
    )
    winner = (
        splits.withColumn(
            "rk",
            F.row_number().over(
                W.partitionBy("fold_out").orderBy("gini", "feature", "thr")
            ),
        )
        .filter(F.col("rk") == 1)
        .drop("rk", "gini")
        .withColumnRenamed("feature", "feat")
    )
    ev = melted.join(
        F.broadcast(winner),
        (F.col("fold") == F.col("fold_out"))
        & (F.col("feature") == F.col("feat")),
    ).select(
        "fold",
        "feat",
        "thr",
        F.when(
            F.when(F.col("v") <= F.col("thr"), F.col("lab_l"))
            .otherwise(F.col("lab_r"))
            == F.col("y"),
            1,
        )
        .otherwise(0)
        .alias("ok"),
    )
    return (
        ev.groupBy("fold", F.col("feat").alias("feature"), "thr")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_test"),
            F.sum("ok").cast("long").alias("n_correct"),
            F.round(
                F.sum("ok").cast("double") / F.count(F.lit(1)), 6
            ).alias("accuracy"),
        )
        .select(
            "fold",
            "feature",
            F.col("thr").cast("long").alias("threshold"),
            "n_test",
            "n_correct",
            "accuracy",
        )
        .orderBy("fold")
    )


@register(
    "q_mlm_mask_plan",
    oracle="""
        WITH toks AS (
          SELECT doc_id,
                 list_filter(string_split_regex(trim(text), '\\s+'),
                             t -> t <> '') AS t
          FROM documents
        ), pos AS (
          SELECT doc_id, len(t) AS n,
                 unnest(range(1, len(t) + 1)) AS p
          FROM toks
        ), m AS (
          SELECT doc_id, n, p,
                 ('0x' || substring(md5(doc_id || ':' || p), 1, 15))::BIGINT
                   % 100 < 15 AS masked,
                 ('0x' || substring(md5(doc_id || ':' || p || ':a'), 1, 15))
                   ::BIGINT % 10 AS act,
                 lag(('0x' || substring(md5(doc_id || ':' || p), 1, 15))
                       ::BIGINT % 100 < 15, 1, false)
                     OVER (PARTITION BY doc_id ORDER BY p) AS prev_masked
          FROM pos
        )
        SELECT doc_id,
               CAST(max(n) AS INT) AS n_tokens,
               CAST(sum(CASE WHEN masked THEN 1 ELSE 0 END) AS INT)
                 AS n_masked,
               CAST(sum(CASE WHEN masked AND act BETWEEN 0 AND 7
                             THEN 1 ELSE 0 END) AS INT) AS n_mask_tok,
               CAST(sum(CASE WHEN masked AND act = 8
                             THEN 1 ELSE 0 END) AS INT) AS n_rand_tok,
               CAST(sum(CASE WHEN masked AND act = 9
                             THEN 1 ELSE 0 END) AS INT) AS n_keep_tok,
               CAST(sum(CASE WHEN masked AND NOT prev_masked
                             THEN 1 ELSE 0 END) AS INT) AS n_spans,
               CAST(coalesce(min(CASE WHEN masked THEN p END), 0) AS INT)
                 AS first_masked
        FROM m GROUP BY doc_id
        UNION ALL
        SELECT doc_id, 0, 0, 0, 0, 0, 0, 0 FROM toks WHERE len(t) = 0
        ORDER BY doc_id
    """,
    doc="Deterministic BERT-style mask PLANNING (operators/masking.py, "
    "Devlin et al. 2018 15%% / 80-10-10): position p of doc d is "
    "masked iff md5h(d:p) %% 100 < 15, actions from md5h(d:p:a) %% 10 "
    "- so re-running or re-sharding the job cannot re-roll a single "
    "mask. Per-doc integer stats include n_spans (maximal masked "
    "runs, the T5 span-corruption unit, Raffel et al. 2020). Entirely "
    "row-local array expressions over the token array: the plan is "
    "one narrow projection over the scan, zero exchanges at any "
    "corpus size.",
)
def q_mlm_mask_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hw_kafka_streams_spark.operators.masking import mlm_mask_plan

    docs = load_table(spark, "documents", sf_dir)
    return mlm_mask_plan(docs).orderBy("doc_id")


@register(
    "q_distinct_ngrams",
    oracle="""
        WITH toks AS (
          SELECT source,
                 list_filter(string_split_regex(trim(text), '\\s+'),
                             t -> t <> '') AS t
          FROM documents
        ), g AS (
          SELECT source, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS gram
          FROM (SELECT source, t, unnest(range(1, len(t) - 1)) AS i
                FROM toks WHERE len(t) >= 3)
        ), c AS (
          SELECT source, gram, count(*) AS c FROM g GROUP BY 1, 2
        )
        SELECT source,
               CAST(sum(c) AS BIGINT) AS n_trigrams,
               CAST(count(*) AS BIGINT) AS n_distinct,
               CAST(max(c) AS BIGINT) AS max_df,
               round(count(*) / CAST(sum(c) AS DOUBLE), 4)
                 AS distinct_ratio
        FROM c GROUP BY source ORDER BY source
    """,
    doc="Distinct-n corpus DIVERSITY per source (the distinct-trigram "
    "ratio of Li et al. 2016 'distinct-N', the standard cheap "
    "diversity/templatedness signal - a source whose ratio collapses "
    "is boilerplate-heavy or machine-generated). Raw trigram bag "
    "built row-locally, then one partial-agged (source, gram) "
    "count and a source-sized rollup: two shuffles total, the first "
    "map-side combined - never all-pairs, never a distinct over the "
    "raw stream.",
)
def q_distinct_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hw_kafka_streams_spark.operators.dedup import word_shingles
    from hw_kafka_streams_spark.operators.skew import spread_small

    docs = load_table(spark, "documents", sf_dir)
    # spread: the trigram explode + map-side (source, gram) combine
    # otherwise run inside a single-split scan stage; no-op at scale
    grams = spread_small(docs.select("source", "text")).select(
        "source",
        F.explode(word_shingles(F.col("text"), 3, distinct=False)).alias(
            "gram"
        ),
    )
    per_gram = grams.groupBy("source", "gram").agg(
        F.count(F.lit(1)).alias("c")
    )
    return (
        per_gram.groupBy("source")
        .agg(
            F.sum("c").alias("n_trigrams"),
            F.count(F.lit(1)).alias("n_distinct"),
            F.max("c").alias("max_df"),
            F.round(
                F.count(F.lit(1)).cast("double") / F.sum("c"), 4
            ).alias("distinct_ratio"),
        )
        .orderBy("source")
    )


@register(
    "q_length_bucket_batches",
    oracle="""
        WITH t AS (
          SELECT doc_id,
                 len(list_filter(string_split_regex(trim(text), '\\s+'),
                                 t -> t <> '')) AS n_tokens
          FROM documents
        ), b AS (
          SELECT doc_id, n_tokens,
                 ((greatest(n_tokens, 1) + 63) // 64) * 64 AS bucket_cap
          FROM t
        )
        SELECT CAST(bucket_cap AS INT) AS bucket_cap,
               count(*) AS n_docs,
               CAST((count(*) + 31) // 32 AS BIGINT) AS n_batches,
               CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
               CAST(count(*) * bucket_cap AS BIGINT) AS padded_tokens,
               round(100.0 * (count(*) * bucket_cap - sum(n_tokens))
                     / (count(*) * bucket_cap), 4) AS waste_pct
        FROM b GROUP BY bucket_cap ORDER BY bucket_cap
    """,
    doc="Length-bucketed batch planning (the dynamic-batching recipe "
    "every trainer uses to cut attention padding): docs are assigned "
    "to 64-token length buckets, each bucket padded to its cap and "
    "cut into 32-doc micro-batches; per bucket the plan reports batch "
    "count and the padding waste the bucketing leaves. Pure partial-"
    "agged groupBy on a derived key — NO global row_number/sort (a "
    "single-partition window is exactly what dynamic batching exists "
    "to avoid at corpus scale); bucket skew is data skew the trainer "
    "sees too.",
)
def q_length_bucket_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hw_kafka_streams_spark.operators.text import token_count

    docs = load_table(spark, "documents", sf_dir)
    b = docs.select(
        token_count("text").alias("n_tokens"),
    ).withColumn(
        "bucket_cap",
        (
            (F.greatest(F.col("n_tokens"), F.lit(1)) + F.lit(63))
            .cast("long") / F.lit(64)
        ).cast("long") * F.lit(64),
    )
    return (
        b.groupBy(F.col("bucket_cap").cast("int").alias("bucket_cap"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            ((F.count(F.lit(1)) + F.lit(31)).cast("long") / F.lit(32))
            .cast("long")
            .alias("n_batches"),
            F.sum("n_tokens").cast("long").alias("sum_tokens"),
        )
        .select(
            "bucket_cap",
            "n_docs",
            "n_batches",
            "sum_tokens",
            (F.col("n_docs") * F.col("bucket_cap"))
            .cast("long")
            .alias("padded_tokens"),
            F.round(
                F.lit(100.0)
                * (F.col("n_docs") * F.col("bucket_cap") - F.col("sum_tokens"))
                / (F.col("n_docs") * F.col("bucket_cap")),
                4,
            ).alias("waste_pct"),
        )
        .orderBy("bucket_cap")
    )


@register(
    "q_epoch_repetition_plan",
    oracle="""
        WITH t AS (
          SELECT source,
                 count(*) AS n_docs,
                 sum(len(list_filter(string_split_regex(trim(text), '\\s+'),
                                     t -> t <> ''))) AS tokens
          FROM documents GROUP BY source
        ), tot AS (
          SELECT count(*) AS n_sources, 2.0 * sum(tokens) AS budget FROM t
        )
        SELECT source,
               n_docs,
               CAST(tokens AS BIGINT) AS tokens,
               CAST(floor(budget / n_sources) AS BIGINT) AS budget_share,
               round(budget / n_sources / tokens, 4) AS epochs_raw,
               round(least(4.0, budget / n_sources / tokens), 4)
                   AS epochs_capped,
               CAST(floor(tokens * least(4.0, budget / n_sources / tokens))
                    AS BIGINT) AS effective_tokens,
               CAST(greatest(0, floor(budget / n_sources)
                                - floor(tokens * least(4.0,
                                        budget / n_sources / tokens)))
                    AS BIGINT) AS shortfall
        FROM t, tot ORDER BY source
    """,
    doc="Epoch repetition planning under a token budget (the data-"
    "constrained-scaling recipe: when the budget exceeds a source's "
    "unique tokens, repeat it up to a cap — 4 epochs here, past which "
    "repeated data stops helping): per source, the uniform budget "
    "share, raw and capped epoch counts, effective tokens after "
    "capping and the unfillable shortfall. One partial-agged per-"
    "source rollup + a broadcast 1-row total: scale-safe by "
    "construction.",
)
def q_epoch_repetition_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hw_kafka_streams_spark.operators.text import token_count

    docs = load_table(spark, "documents", sf_dir)
    t = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_count("text")).alias("tokens"),
    )
    tot = t.agg(
        F.count(F.lit(1)).alias("n_sources"),
        (F.lit(2.0) * F.sum("tokens")).alias("budget"),
    )
    share = F.col("budget") / F.col("n_sources")
    epochs = share / F.col("tokens")
    capped = F.least(F.lit(4.0), epochs)
    return (
        t.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_docs",
            F.col("tokens").cast("long").alias("tokens"),
            F.floor(share).cast("long").alias("budget_share"),
            F.round(epochs, 4).alias("epochs_raw"),
            F.round(capped, 4).alias("epochs_capped"),
            F.floor(F.col("tokens") * capped)
            .cast("long")
            .alias("effective_tokens"),
            F.greatest(
                F.lit(0),
                F.floor(share) - F.floor(F.col("tokens") * capped),
            )
            .cast("long")
            .alias("shortfall"),
        )
        .orderBy("source")
    )


@register(
    "q_quantile_normalize",
    oracle=r"""
        WITH sc AS (
          SELECT doc_id, source,
                 CAST(len(list_filter(
                     string_split_regex(trim(lower(text)), '\s+'),
                     t -> t <> '')) AS BIGINT) AS sc
          FROM documents
        ), nsrc AS (
          SELECT source, CAST(count(*) AS BIGINT) AS n FROM sc GROUP BY 1
        ), ntot AS (
          SELECT CAST(count(*) AS BIGINT) AS nt FROM sc
        ), ssc AS (
          SELECT source, sc, CAST(count(*) AS BIGINT) AS c,
                 CAST(sum(count(*)) OVER (PARTITION BY source
                                          ORDER BY sc) AS BIGINT) AS cum
          FROM sc GROUP BY 1, 2
        ), gsc AS (
          SELECT sc AS gval, CAST(count(*) AS BIGINT) AS c,
                 CAST(sum(count(*)) OVER (ORDER BY sc) AS BIGINT) AS cum
          FROM sc GROUP BY 1
        ), ranked AS (
          SELECT d.doc_id, d.source, d.sc,
                 s.cum - s.c
                 + row_number() OVER (PARTITION BY d.source, d.sc
                                      ORDER BY d.doc_id) AS rnk,
                 n.n, t.nt
          FROM sc d JOIN ssc s USING (source, sc)
                    JOIN nsrc n USING (source), ntot t
        ), pr AS (
          SELECT doc_id, source, sc,
                 CASE WHEN n > 1
                      THEN CAST(rnk - 1 AS DOUBLE) / (n - 1)
                      ELSE 0.0 END AS pr,
                 nt
          FROM ranked
        )
        SELECT p.doc_id, p.source, p.sc AS raw_tokens,
               round(p.pr, 6) AS pct,
               g.gval AS calibrated_tokens
        FROM pr p JOIN gsc g
          ON CAST(round(p.pr * (p.nt - 1), 0) AS BIGINT) + 1
             BETWEEN g.cum - g.c + 1 AND g.cum
        ORDER BY p.doc_id
    """,
    doc="Cross-source quantile normalization of a quality signal "
    "(token count): each doc's within-source percentile maps to the "
    "POOLED distribution's value at that rank, so a '90th-percentile "
    "web doc' and a '90th-percentile wiki doc' land on the same "
    "calibrated scale — the fix for per-source score-threshold drift "
    "when mixing corpora. Scale shape: NO global row_number — both "
    "the per-source and the global rank tables are cumulative counts "
    "over DISTINCT scores (domain-bounded: scores are token counts, "
    "bounded by max doc length), per-doc ranks come from a window "
    "partitioned by (source, score) (tie-group-sized tasks), and the "
    "rank->value lookup is a broadcast range join against the tiny "
    "distinct-score table. Rank arithmetic is exact integers; the "
    "percentile division is one scalar expression both engines "
    "evaluate identically.",
)
def q_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = load_table(spark, "documents", sf_dir)
    sc = docs.select(
        "doc_id",
        "source",
        F.size(word_tokens(F.lower(F.col("text")))).cast("long").alias("sc"),
    )
    nsrc = sc.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    ntot = sc.agg(F.count(F.lit(1)).alias("nt"))
    ssc = (
        sc.groupBy("source", "sc")
        .agg(F.count(F.lit(1)).alias("c"))
        .withColumn(
            "cum",
            F.sum("c").over(W.partitionBy("source").orderBy("sc")),
        )
    )
    gsc = (
        sc.groupBy("sc")
        .agg(F.count(F.lit(1)).alias("gc"))
        .withColumn(
            "gcum",
            F.sum("gc").over(
                W.partitionBy(tiny_table_partition("sc")).orderBy("sc")
            ),
        )
        .select(F.col("sc").alias("gval"), "gc", "gcum")
    )
    rnk = (
        F.col("cum")
        - F.col("c")
        + F.row_number().over(
            W.partitionBy("source", "sc").orderBy("doc_id")
        ).cast("long")
    )
    ranked = (
        sc.join(ssc, ["source", "sc"])
        .join(F.broadcast(nsrc), "source")
        .crossJoin(F.broadcast(ntot))
        .select("doc_id", "source", "sc", rnk.alias("rnk"), "n", "nt")
    )
    pr = F.when(
        F.col("n") > 1,
        (F.col("rnk") - 1).cast("double") / (F.col("n") - 1),
    ).otherwise(F.lit(0.0))
    p = ranked.select("doc_id", "source", "sc", pr.alias("pr"), "nt")
    k = F.round(F.col("pr") * (F.col("nt") - 1), 0).cast("long") + 1
    return (
        p.join(
            F.broadcast(gsc),
            (k >= F.col("gcum") - F.col("gc") + 1) & (k <= F.col("gcum")),
        )
        .select(
            "doc_id",
            "source",
            F.col("sc").alias("raw_tokens"),
            F.round(F.col("pr"), 6).alias("pct"),
            F.col("gval").alias("calibrated_tokens"),
        )
        .orderBy("doc_id")
    )


@register(
    "q_stratified_sample",
    oracle="""
        WITH rates AS (
          SELECT source,
                 1000 + 500 * (('0x' || substring(
                     md5(source || ':rate'), 1, 15))::BIGINT % 8)
                   AS rate_bp,
                 CAST(count(*) AS BIGINT) AS n_total
          FROM documents GROUP BY 1
        ), kept AS (
          SELECT d.source, count(*) AS n_kept
          FROM documents d JOIN rates r USING (source)
          WHERE ('0x' || substring(
                  md5(d.doc_id::VARCHAR || '|' || d.source || ':42'),
                  1, 15))::BIGINT % 10000 < r.rate_bp
          GROUP BY 1
        )
        SELECT r.source, r.rate_bp, r.n_total,
               CAST(coalesce(k.n_kept, 0) AS BIGINT) AS n_kept,
               round(CAST(coalesce(k.n_kept, 0) AS DOUBLE)
                     / r.n_total, 4) AS kept_rate
        FROM rates r LEFT JOIN kept k USING (source)
        ORDER BY r.source
    """,
    doc="Deterministic stratified sampling audit: each source gets a "
    "rate (10%-45%, itself hash-derived so the config is synthetic "
    "but stable) and docs are kept by a content-stable (doc_id, "
    "source) md5 bucket below that rate — sampleBy without the RNG: "
    "re-runs, shard additions, and cluster resizes keep exactly the "
    "same rows, and the whole decision is a pure filter over the "
    "scan (no shuffle, no state). hash_mode='md5' gives it a "
    "bit-exact DuckDB twin; the operator's scale default stays "
    "xxhash64 (operators/sampling.py stratified_hash_sample).",
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hw_kafka_streams_spark.operators.dedup import md5h
    from hw_kafka_streams_spark.operators.sampling import (
        stratified_hash_sample,
    )

    docs = load_table(spark, "documents", sf_dir)
    rate = (
        F.lit(1000)
        + F.lit(500)
        * F.pmod(md5h(F.concat(F.col("source"), F.lit(":rate"))), F.lit(8))
    ).alias("rate_bp")
    totals = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_total")
    )
    kept = (
        stratified_hash_sample(
            docs.withColumn("rate_bp", rate),
            "source",
            "doc_id",
            F.col("rate_bp"),
            hash_mode="md5",
        )
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_kept"))
    )
    return (
        totals.withColumn("rate_bp", rate)
        .join(kept, "source", "left")
        .select(
            "source",
            F.col("rate_bp").cast("long").alias("rate_bp"),
            "n_total",
            F.coalesce(F.col("n_kept"), F.lit(0)).cast("long").alias("n_kept"),
            F.round(
                F.coalesce(F.col("n_kept"), F.lit(0)).cast("double")
                / F.col("n_total"),
                4,
            ).alias("kept_rate"),
        )
        .orderBy("source")
    )


@register(
    "q_source_dup_matrix",
    oracle=r"""
        WITH fp AS (
          SELECT md5(substring(lower(trim(
                   regexp_replace(text, '\s+', ' ', 'g'))), 1, 80)) AS fp,
                 source
          FROM documents
        ), sfp AS (
          SELECT fp, source, CAST(count(*) AS BIGINT) AS c
          FROM fp GROUP BY 1, 2
        )
        SELECT a.source AS source_a, b.source AS source_b,
               CAST(count(*) AS BIGINT) AS n_shared_fps,
               CAST(sum(a.c * b.c) AS BIGINT) AS n_doc_pairs
        FROM sfp a JOIN sfp b
          ON a.fp = b.fp AND a.source < b.source
        GROUP BY 1, 2 ORDER BY 1, 2
    """,
    doc="Cross-source duplication matrix: which corpus sources share "
    "content, and how much — the overlap census run before setting "
    "per-source mixture weights (double-counted content silently "
    "upweights itself). Keyed on the HEAD fingerprint (md5 of the "
    "first 80 normalized chars — shared lead paragraphs/boilerplate, "
    "the common cross-source dup mode; full-content fps are "
    "q_dedup_exact's job). Scale shape: one 16-byte-key shuffle to "
    "(fp, source) counts, then a self-equi-join per fp whose fan-out "
    "is bounded by the SOURCE count squared (never doc-squared), and "
    "a pair-keyed agg over at most |sources|^2 rows.",
)
def q_source_dup_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    fp = F.md5(
        F.substring(
            F.lower(F.trim(F.regexp_replace(F.col("text"), r"\s+", " "))),
            1,
            80,
        )
    )
    sfp = docs.select(fp.alias("fp"), "source").groupBy("fp", "source").agg(
        F.count(F.lit(1)).alias("c")
    )
    a = sfp.alias("a")
    b = sfp.alias("b")
    return (
        a.join(
            b,
            (F.col("a.fp") == F.col("b.fp"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_shared_fps"),
            F.sum(F.col("a.c") * F.col("b.c")).alias("n_doc_pairs"),
        )
        .orderBy("source_a", "source_b")
    )


@register(
    "q_brown_forsythe",
    oracle="""
        WITH med AS (
          SELECT lang AS g, quantile_cont(CAST(n_chars AS DOUBLE), 0.5) AS med
          FROM documents
          WHERE n_chars IS NOT NULL AND lang IS NOT NULL
          GROUP BY 1
        ), per_g AS (
          SELECT d.lang AS g, CAST(count(*) AS BIGINT) AS n,
                 sum(CAST(round(abs(CAST(d.n_chars AS DOUBLE) - m.med), 6)
                     AS DECIMAL(18,6))) AS s,
                 sum(CAST(round(abs(CAST(d.n_chars AS DOUBLE) - m.med)
                               * abs(CAST(d.n_chars AS DOUBLE) - m.med), 6)
                     AS DECIMAL(28,6))) AS q
          FROM documents d JOIN med m ON d.lang = m.g
          WHERE d.n_chars IS NOT NULL
          GROUP BY 1
        ), m2 AS (
          SELECT CAST(count(*) AS BIGINT) AS k,
                 CAST(sum(n) AS BIGINT) AS nt,
                 CAST(sum(s) AS DOUBLE) AS st,
                 CAST(sum(q) AS DOUBLE) AS qt,
                 sum(CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                     / CAST(n AS DOUBLE)) AS sg2
          FROM per_g
        )
        SELECT k AS k_groups, nt AS n,
               round(((sg2 - st * st / CAST(nt AS DOUBLE))
                      / (CAST(k AS DOUBLE) - 1))
                     / ((qt - sg2) / (CAST(nt AS DOUBLE) - k)), 6)
                   AS bf_stat
        FROM m2
    """,
    doc="Brown-Forsythe test (Levene on median-centered absolute "
    "deviations) of doc char length spread across languages — the "
    "variance-homogeneity audit run before trusting q_anova_f's "
    "equal-variance assumption; median centering keeps it valid "
    "under the heavy-tailed length distributions real corpora have. "
    "Medians via exact interpolated percentile (the q_percentiles "
    "bit-match precedent), deviations 6dp-DECIMAL-summed, F ratio a "
    "scalar epilogue over the k-row group table "
    "(operators/stats.brown_forsythe).",
)
def q_brown_forsythe(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hw_kafka_streams_spark.operators.stats import brown_forsythe

    docs = load_table(spark, "documents", sf_dir)
    return brown_forsythe(docs, "lang", "n_chars")


@register(
    "q_jsd_sources",
    oracle=r"""
        WITH wc AS (
          SELECT source, w, CAST(count(*) AS BIGINT) AS c FROM (
            SELECT source,
                   unnest(list_filter(
                     string_split_regex(trim(lower(text)), '\s+'),
                     t -> t <> '')) AS w
            FROM documents
          ) GROUP BY 1, 2
        ), ns AS (
          SELECT source, CAST(sum(c) AS BIGINT) AS n FROM wc GROUP BY 1
        ), pairs AS (
          SELECT a.source AS sa, b.source AS sb,
                 CAST(a.c AS DOUBLE) / na.n AS p,
                 CAST(b.c AS DOUBLE) / nb.n AS q
          FROM wc a JOIN wc b ON a.w = b.w AND a.source < b.source
               JOIN ns na ON na.source = a.source
               JOIN ns nb ON nb.source = b.source
        ), agg AS (
          SELECT sa, sb, CAST(count(*) AS BIGINT) AS shared_vocab,
                 CAST(sum(CAST(round(p, 12) AS DECIMAL(28,12)))
                      AS DOUBLE) AS sp,
                 CAST(sum(CAST(round(q, 12) AS DECIMAL(28,12)))
                      AS DOUBLE) AS sq,
                 CAST(sum(CAST(round(p * ln((2 * p) / (p + q)), 9)
                      AS DECIMAL(18,9))) AS DOUBLE) AS tp,
                 CAST(sum(CAST(round(q * ln((2 * q) / (p + q)), 9)
                      AS DECIMAL(18,9))) AS DOUBLE) AS tq
          FROM pairs GROUP BY 1, 2
        )
        SELECT sa AS source_a, sb AS source_b, shared_vocab,
               round(0.5 * (tp + ln(2) * (1 - sp))
                     + 0.5 * (tq + ln(2) * (1 - sq)), 6) AS jsd
        FROM agg ORDER BY 1, 2
    """,
    doc="Jensen-Shannon divergence matrix between source token "
    "distributions — the symmetric, bounded ([0, ln 2]) corpus-"
    "similarity measure behind mixture design and redundancy pruning "
    "(KL without the infinities). Key identity exploited for scale: "
    "words EXCLUSIVE to one source contribute exactly ln2 x their "
    "probability mass, so only SHARED words need the self-equi-join "
    "on word (Zipfian key, AQE-split) and each pair's exclusive mass "
    "falls out of (1 - shared mass) — never a full-outer vocab join. "
    "190 output rows for 20 sources; p/q are exact integer-count "
    "ratios, JSD terms 9dp-DECIMAL-summed, shared mass 12dp-summed, "
    "epilogue a rounded scalar.",
)
def q_jsd_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    wc = (
        docs.select(
            "source",
            F.explode(word_tokens(F.lower(F.col("text")))).alias("w"),
        )
        .groupBy("source", "w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    ns = wc.groupBy("source").agg(F.sum("c").alias("n"))
    a = wc.alias("a")
    b = wc.alias("b")
    na = ns.alias("na")
    nb = ns.alias("nb")
    p = F.col("a.c").cast("double") / F.col("na.n")
    q = F.col("b.c").cast("double") / F.col("nb.n")
    pairs = (
        a.join(
            b,
            (F.col("a.w") == F.col("b.w"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .join(F.broadcast(na), F.col("na.source") == F.col("a.source"))
        .join(F.broadcast(nb), F.col("nb.source") == F.col("b.source"))
        .select(
            F.col("a.source").alias("sa"),
            F.col("b.source").alias("sb"),
            p.alias("p"),
            q.alias("q"),
        )
    )
    pc, qc = F.col("p"), F.col("q")
    agg = pairs.groupBy("sa", "sb").agg(
        F.count(F.lit(1)).alias("shared_vocab"),
        F.sum(F.round(pc, 12).cast("decimal(28,12)"))
        .cast("double")
        .alias("sp"),
        F.sum(F.round(qc, 12).cast("decimal(28,12)"))
        .cast("double")
        .alias("sq"),
        F.sum(
            F.round(pc * F.log((2 * pc) / (pc + qc)), 9).cast("decimal(18,9)")
        )
        .cast("double")
        .alias("tp"),
        F.sum(
            F.round(qc * F.log((2 * qc) / (pc + qc)), 9).cast("decimal(18,9)")
        )
        .cast("double")
        .alias("tq"),
    )
    ln2 = F.log(F.lit(2.0))
    return agg.select(
        F.col("sa").alias("source_a"),
        F.col("sb").alias("source_b"),
        "shared_vocab",
        F.round(
            0.5 * (F.col("tp") + ln2 * (1 - F.col("sp")))
            + 0.5 * (F.col("tq") + ln2 * (1 - F.col("sq"))),
            6,
        ).alias("jsd"),
    ).orderBy("source_a", "source_b")


@register(
    "q_benjamini_hochberg",
    oracle="""
        WITH per_s AS (
          SELECT source, CAST(count(*) AS BIGINT) AS n_s,
                 sum(CAST(n_chars AS HUGEINT)) AS sx
          FROM documents WHERE n_chars IS NOT NULL GROUP BY 1
        ), g AS (
          SELECT CAST(count(*) AS BIGINT) AS n,
                 sum(CAST(n_chars AS HUGEINT)) AS s,
                 sum(CAST(n_chars AS HUGEINT) * n_chars) AS q
          FROM documents WHERE n_chars IS NOT NULL
        ), m AS (
          SELECT CAST(count(*) AS BIGINT) AS m FROM per_s
        ), z AS (
          SELECT source, n_s,
                 (CAST(sx AS DOUBLE) / n_s - CAST(s AS DOUBLE) / n)
                 / sqrt((CAST(q AS DOUBLE) / n
                         - (CAST(s AS DOUBLE) / n)
                           * (CAST(s AS DOUBLE) / n)) / n_s) AS zv
          FROM per_s, g
        ), p AS (
          SELECT source, n_s, zv,
                 2.0 * (exp(-abs(zv) * abs(zv) / 2.0)
                        / 2.5066282746310002)
                     * ((1.0 / (1.0 + 0.2316419 * abs(zv)))
                        * (0.319381530
                           + (1.0 / (1.0 + 0.2316419 * abs(zv)))
                             * (-0.356563782
                                + (1.0 / (1.0 + 0.2316419 * abs(zv)))
                                  * (1.781477937
                                     + (1.0 / (1.0 + 0.2316419 * abs(zv)))
                                       * (-1.821255978
                                          + (1.0 / (1.0 + 0.2316419
                                                    * abs(zv)))
                                            * 1.330274429))))) AS pv
          FROM z
        ), ranked AS (
          SELECT source, n_s, zv, pv,
                 CAST(row_number() OVER (ORDER BY pv, source)
                   AS BIGINT) AS rnk,
                 m.m
          FROM p, m
        ), thr AS (
          SELECT CAST(coalesce(max(CASE WHEN pv <= rnk * 0.05
                                        / CAST(m AS DOUBLE)
                                   THEN rnk ELSE 0 END), 0) AS BIGINT)
                   AS cutoff
          FROM ranked
        )
        SELECT r.source, r.n_s AS n_docs,
               round(r.zv, 4) AS z_score,
               round(r.pv, 6) AS p_value,
               r.rnk, CAST(r.rnk <= t.cutoff AS INT) AS rejected
        FROM ranked r, thr t ORDER BY r.rnk
    """,
    doc="Benjamini-Hochberg FDR control over a per-source screening "
    "battery (two-sided z-test: does a source's mean doc length "
    "deviate from the corpus mean?) — the multiple-testing guard "
    "every per-source anomaly sweep needs (20 sources at alpha=.05 "
    "expects a false alarm without it). Normal CDF via the "
    "Abramowitz-Stegun 26.2.17 polynomial written as the IDENTICAL "
    "scalar expression in both engines (no erf builtin in either); "
    "z from exact integer moments. Step-up rule: reject ranks <= "
    "max{i : p_(i) <= i*alpha/m}. Scale shape: one group-keyed agg, "
    "a 1-row global moment, and windows over the m-row source table "
    "(tiny partition).",
)
def q_benjamini_hochberg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = load_table(spark, "documents", sf_dir).filter(
        F.col("n_chars").isNotNull()
    )
    v = F.col("n_chars").cast("decimal(38,0)")
    per_s = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_s"), F.sum(v).alias("sx")
    )
    g = docs.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(v).alias("s"),
        F.sum(v * v).alias("q"),
    )
    mean_g = F.col("s").cast("double") / F.col("n")
    var_g = F.col("q").cast("double") / F.col("n") - mean_g * mean_g
    zv = (F.col("sx").cast("double") / F.col("n_s") - mean_g) / F.sqrt(
        var_g / F.col("n_s")
    )
    z = per_s.crossJoin(F.broadcast(g)).select(
        "source", "n_s", zv.alias("zv")
    )
    az = F.abs(F.col("zv"))
    t = F.lit(1.0) / (F.lit(1.0) + F.lit(0.2316419) * az)
    poly = t * (
        F.lit(0.319381530)
        + t
        * (
            F.lit(-0.356563782)
            + t
            * (
                F.lit(1.781477937)
                + t * (F.lit(-1.821255978) + t * F.lit(1.330274429))
            )
        )
    )
    pv = (
        F.lit(2.0)
        * (F.exp(-az * az / F.lit(2.0)) / F.lit(2.5066282746310002))
        * poly
    )
    p = z.select("source", "n_s", "zv", pv.alias("pv"))
    m = p.agg(F.count(F.lit(1)).alias("m"))
    ranked = (
        p.crossJoin(F.broadcast(m))
        .withColumn(
            "rnk",
            F.row_number()
            .over(
                W.partitionBy(tiny_table_partition("source")).orderBy(
                    "pv", "source"
                )
            )
            .cast("long"),
        )
    )
    thr = ranked.agg(
        F.coalesce(
            F.max(
                F.when(
                    F.col("pv")
                    <= F.col("rnk") * F.lit(0.05) / F.col("m").cast("double"),
                    F.col("rnk"),
                ).otherwise(F.lit(0))
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("cutoff")
    )
    return (
        ranked.crossJoin(F.broadcast(thr))
        .select(
            "source",
            F.col("n_s").alias("n_docs"),
            F.round("zv", 4).alias("z_score"),
            F.round("pv", 6).alias("p_value"),
            "rnk",
            (F.col("rnk") <= F.col("cutoff")).cast("int").alias("rejected"),
        )
        .orderBy("rnk")
    )


@register(
    "q_reservoir_sample",
    oracle="""
        WITH ranked AS (
          SELECT source, doc_id, n_chars,
                 row_number() OVER (PARTITION BY source
                   ORDER BY ('0x' || substring(
                       md5(doc_id::VARCHAR), 1, 15))::BIGINT, doc_id)
                   AS rn
          FROM documents
        )
        SELECT source, doc_id, CAST(n_chars AS BIGINT) AS n_chars
        FROM ranked WHERE rn <= 5 ORDER BY source, doc_id
    """,
    doc="Deterministic k-per-key reservoir (k=5 docs per source): rank "
    "by a stable content hash of the id inside each key and keep the "
    "first k — the inspect-a-sample primitive whose membership "
    "survives re-runs, shard additions, and cluster resizes (rand() "
    "or randomSplit would resample every time). One shuffle on the "
    "key; the per-group top-k goes through WindowGroupLimit pushdown "
    "so no group is ever fully sorted. hash_mode='md5' gives the rank "
    "a bit-exact DuckDB twin (operators/sampling.reservoir_per_key); "
    "xxhash64 stays the scale default.",
)
def q_reservoir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hw_kafka_streams_spark.operators.sampling import reservoir_per_key

    docs = load_table(spark, "documents", sf_dir)
    return (
        reservoir_per_key(
            docs, "source", 5, order_hint="doc_id", hash_mode="md5"
        )
        .select("source", "doc_id", F.col("n_chars").cast("long").alias("n_chars"))
        .orderBy("source", "doc_id")
    )


@register(
    "q_lexical_richness",
    oracle=r"""
        WITH wc AS (
          SELECT source, w, CAST(count(*) AS BIGINT) AS c FROM (
            SELECT source,
                   unnest(list_filter(
                     string_split_regex(trim(lower(text)), '\s+'),
                     t -> t <> '')) AS w
            FROM documents
          ) GROUP BY 1, 2
        )
        SELECT source,
               CAST(sum(c) AS BIGINT) AS n_tokens,
               CAST(count(*) AS BIGINT) AS vocab,
               CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
                 AS hapax,
               round(count(*) / CAST(sum(c) AS DOUBLE), 6) AS ttr,
               round(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END)
                     / CAST(count(*) AS DOUBLE), 6) AS hapax_ratio,
               round(CAST(sum(c * (c - 1)) AS DOUBLE)
                     / (CAST(sum(c) AS DOUBLE)
                        * (CAST(sum(c) AS DOUBLE) - 1)), 9)
                 AS simpson_d
        FROM wc GROUP BY source ORDER BY source
    """,
    doc="Lexical-richness battery per source: type-token ratio, hapax-"
    "legomena ratio (the productive-vocabulary signal — template "
    "mills re-use words, so their hapax share collapses), and "
    "Simpson's D repeat-probability (EXACT integer arithmetic "
    "sum c(c-1)/N(N-1) — no float until the final division). "
    "Complements q_distinct_ngrams' trigram view with the unigram "
    "one. Scale shape: one partial-agged (source, word) count, one "
    "source rollup — the same two-shuffle plan.",
)
def q_lexical_richness(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    wc = (
        docs.select(
            "source",
            F.explode(word_tokens(F.lower(F.col("text")))).alias("w"),
        )
        .groupBy("source", "w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    n = F.sum("c")
    hapax = F.sum(F.when(F.col("c") == 1, 1).otherwise(0))
    vocab = F.count(F.lit(1))
    return (
        wc.groupBy("source")
        .agg(
            n.alias("n_tokens"),
            vocab.alias("vocab"),
            hapax.alias("hapax"),
            F.round(vocab.cast("double") / n, 6).alias("ttr"),
            F.round(hapax.cast("double") / vocab, 6).alias("hapax_ratio"),
            F.round(
                F.sum(F.col("c") * (F.col("c") - 1)).cast("double")
                / (n.cast("double") * (n.cast("double") - 1)),
                9,
            ).alias("simpson_d"),
        )
        .orderBy("source")
    )


@register(
    "q_t_closeness",
    oracle="""
        WITH rows_ AS (
          SELECT c_nationkey AS qa, c_mktsegment AS qb,
                 CAST(floor(c_acctbal / 1000) AS BIGINT) AS s
          FROM customer
        ),
        cls AS (
          SELECT qa, qb, CAST(count(*) AS BIGINT) AS sz
          FROM rows_ GROUP BY 1, 2
        ),
        sv AS (
          SELECT s, CAST(count(*) AS BIGINT) AS gc FROM rows_ GROUP BY 1
        ),
        n AS (SELECT CAST(count(*) AS BIGINT) AS nt,
                     CAST(count(DISTINCT s) AS BIGINT) AS m
              FROM rows_),
        grid AS (
          SELECT c.qa, c.qb, c.sz, v.s, v.gc FROM cls c CROSS JOIN sv v
        ),
        cellc AS (
          SELECT qa, qb, s, CAST(count(*) AS BIGINT) AS cc
          FROM rows_ GROUP BY 1, 2, 3
        ),
        cum AS (
          SELECT g.qa, g.qb, g.s,
                 sum(coalesce(cc.cc, 0))
                   OVER (PARTITION BY g.qa, g.qb ORDER BY g.s) AS cp,
                 sum(g.gc) OVER (PARTITION BY g.qa, g.qb
                                 ORDER BY g.s) AS cq,
                 g.sz, n.nt, n.m
          FROM grid g LEFT JOIN cellc cc
            ON g.qa = cc.qa AND g.qb = cc.qb AND g.s = cc.s, n
        ),
        tvals AS (
          SELECT qa, qb, min(sz) AS sz,
                 round(CAST(sum(CAST(round(abs(
                     CAST(cp AS DOUBLE) / sz
                     - CAST(cq AS DOUBLE) / nt), 9)
                   AS DECIMAL(18,9))) AS DOUBLE)
                   / (min(m) - 1), 6) AS t
          FROM cum GROUP BY 1, 2
        )
        SELECT CAST(count(*) AS BIGINT) AS n_classes,
               round(max(t), 6) AS max_t,
               round(CAST(sum(CAST(round(t * sz, 6) AS DECIMAL(28,6)))
                     AS DOUBLE) / sum(sz), 6) AS avg_t_weighted,
               CAST(sum(CASE WHEN t > 0.3 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_above_03
        FROM tvals
    """,
    doc="t-closeness audit (Li, Li & Venkatasubramanian 2007) — the "
    "third leg of the anonymity triad after q_k_anonymity's k and "
    "l-diversity: for each quasi-identifier class, the Earth Mover's "
    "Distance between its sensitive-attribute distribution (account-"
    "balance bands) and the GLOBAL one; a class can be k-anonymous "
    "and l-diverse yet still leak (all its balances in the top band) "
    "— exactly what EMD catches. For ordered categories EMD collapses "
    "to sum|cumP - cumQ|/(m-1), so each class needs only a cumulative "
    "pass over the CLASS x BAND grid (classes x ~12 bands — domain-"
    "bounded, never row-sized); per-term 9dp DECIMAL sums. Reports "
    "the worst class, the class-size-weighted mean, and the count "
    "above the t=0.3 rule of thumb.",
)
def q_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    cust = load_table(spark, "customer", sf_dir)
    rows_ = cust.select(
        F.col("c_nationkey").alias("qa"),
        F.col("c_mktsegment").alias("qb"),
        F.floor(F.col("c_acctbal") / 1000).cast("long").alias("s"),
    )
    cls = rows_.groupBy("qa", "qb").agg(F.count(F.lit(1)).alias("sz"))
    sv = rows_.groupBy("s").agg(F.count(F.lit(1)).alias("gc"))
    n = rows_.agg(
        F.count(F.lit(1)).alias("nt"),
        F.countDistinct("s").alias("m"),
    )
    cellc = rows_.groupBy("qa", "qb", "s").agg(
        F.count(F.lit(1)).alias("cc")
    )
    grid = cls.crossJoin(F.broadcast(sv))
    w = W.partitionBy("qa", "qb").orderBy("s")
    cum = (
        grid.join(cellc, ["qa", "qb", "s"], "left")
        .crossJoin(F.broadcast(n))
        .select(
            "qa",
            "qb",
            "s",
            "sz",
            "nt",
            "m",
            F.sum(F.coalesce(F.col("cc"), F.lit(0))).over(w).alias("cp"),
            F.sum("gc").over(w).alias("cq"),
        )
    )
    term = F.round(
        F.abs(
            F.col("cp").cast("double") / F.col("sz")
            - F.col("cq").cast("double") / F.col("nt")
        ),
        9,
    ).cast("decimal(18,9)")
    tvals = cum.groupBy("qa", "qb").agg(
        F.min("sz").alias("sz"),
        F.round(
            F.sum(term).cast("double") / (F.min("m") - 1), 6
        ).alias("t"),
    )
    return tvals.agg(
        F.count(F.lit(1)).alias("n_classes"),
        F.round(F.max("t"), 6).alias("max_t"),
        F.round(
            F.sum(
                F.round(F.col("t") * F.col("sz"), 6).cast("decimal(28,6)")
            ).cast("double")
            / F.sum("sz"),
            6,
        ).alias("avg_t_weighted"),
        F.sum((F.col("t") > 0.3).cast("long")).alias("n_above_03"),
    )


@register(
    "q_mcnemar_filters",
    oracle=r"""
        WITH flags AS (
          SELECT doc_id,
                 CAST(len(list_filter(string_split_regex(trim(text),
                     '\s+'), t -> t <> '')) >= 120 AS INT) AS f_len,
                 CAST(len(list_filter(string_split_regex(trim(lower(
                     text)), '\s+'),
                     t -> regexp_matches(t, '[a-z]')))
                   >= CAST(0.8 * len(list_filter(string_split_regex(
                       trim(text), '\s+'), t -> t <> '')) AS BIGINT)
                   AS INT) AS f_alpha
          FROM documents
        ),
        cells AS (
          SELECT CAST(sum(CASE WHEN f_len = 1 AND f_alpha = 1
                          THEN 1 ELSE 0 END) AS BIGINT) AS both_pass,
                 CAST(sum(CASE WHEN f_len = 1 AND f_alpha = 0
                          THEN 1 ELSE 0 END) AS BIGINT) AS b,
                 CAST(sum(CASE WHEN f_len = 0 AND f_alpha = 1
                          THEN 1 ELSE 0 END) AS BIGINT) AS c,
                 CAST(sum(CASE WHEN f_len = 0 AND f_alpha = 0
                          THEN 1 ELSE 0 END) AS BIGINT) AS neither
          FROM flags
        )
        SELECT both_pass, b AS only_len, c AS only_alpha, neither,
               round(CASE WHEN b + c > 0
                     THEN CAST((b - c) * (b - c) AS DOUBLE) / (b + c)
                     ELSE 0.0 END, 6) AS mcnemar_chi2
        FROM cells
    """,
    doc="McNemar's paired test comparing two quality filters on the "
    "SAME documents (length >= 120 tokens vs >= 80% alphabetic "
    "tokens): the 2x2 agreement table plus chi2 = (b-c)^2/(b+c) over "
    "the DISCORDANT cells only — the right test when deciding whether "
    "swapping one filter for another changes the kept set (a plain "
    "proportion test double-counts the agreeing docs). Both flags are "
    "single-scan integer expressions; the whole query is one "
    "map-side-combinable aggregation — no shuffle beyond the 1-row "
    "reduce.",
)
def q_mcnemar_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    toks = word_tokens(F.col("text"))
    ltoks = word_tokens(F.lower(F.col("text")))
    n_alpha = F.size(
        F.filter(ltoks, lambda t: t.rlike("[a-z]"))
    )
    f_len = (F.size(toks) >= 120).cast("int")
    f_alpha = (
        n_alpha >= (0.8 * F.size(toks)).cast("long")
    ).cast("int")
    flags = docs.select(f_len.alias("f_len"), f_alpha.alias("f_alpha"))
    cells = flags.agg(
        F.sum(((F.col("f_len") == 1) & (F.col("f_alpha") == 1)).cast("long"))
        .alias("both_pass"),
        F.sum(((F.col("f_len") == 1) & (F.col("f_alpha") == 0)).cast("long"))
        .alias("only_len"),
        F.sum(((F.col("f_len") == 0) & (F.col("f_alpha") == 1)).cast("long"))
        .alias("only_alpha"),
        F.sum(((F.col("f_len") == 0) & (F.col("f_alpha") == 0)).cast("long"))
        .alias("neither"),
    )
    b, c = F.col("only_len"), F.col("only_alpha")
    return cells.select(
        "both_pass",
        "only_len",
        "only_alpha",
        "neither",
        F.round(
            F.when(
                b + c > 0,
                ((b - c) * (b - c)).cast("double") / (b + c),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("mcnemar_chi2"),
    )


@register(
    "q_cohens_d_pairs",
    oracle="""
        WITH per_s AS (
          SELECT source, CAST(count(*) AS BIGINT) AS n,
                 sum(CAST(n_chars AS HUGEINT)) AS s,
                 sum(CAST(n_chars AS HUGEINT) * n_chars) AS q
          FROM documents WHERE n_chars IS NOT NULL GROUP BY 1
        )
        SELECT a.source AS source_a, b.source AS source_b,
               round((CAST(a.s AS DOUBLE) / a.n
                      - CAST(b.s AS DOUBLE) / b.n)
                     / sqrt((
                         (CAST(a.q AS DOUBLE)
                          - CAST(a.s AS DOUBLE) * CAST(a.s AS DOUBLE)
                            / a.n)
                         + (CAST(b.q AS DOUBLE)
                            - CAST(b.s AS DOUBLE) * CAST(b.s AS DOUBLE)
                              / b.n)
                       ) / (a.n + b.n - 2)), 6) AS cohens_d
        FROM per_s a JOIN per_s b ON a.source < b.source
        ORDER BY 1, 2
    """,
    doc="Pairwise Cohen's d effect sizes of doc length between "
    "sources (pooled-variance standardized mean difference) — the "
    "magnitude companion to q_benjamini_hochberg's significance "
    "flags: with corpus-sized n everything is 'significant', and d "
    "tells you whether the difference is worth acting on (|d| < 0.2 "
    "= negligible by the standard rule). One group-keyed DECIMAL-"
    "moment pass, then a k x k self-join over the k-row source table "
    "— every float derives from exact integer sums.",
)
def q_cohens_d_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir).filter(
        F.col("n_chars").isNotNull()
    )
    v = F.col("n_chars").cast("decimal(38,0)")
    per_s = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(v).alias("s"),
        F.sum(v * v).alias("q"),
    )
    a, b = per_s.alias("a"), per_s.alias("b")

    def mean(side):
        return F.col(f"{side}.s").cast("double") / F.col(f"{side}.n")

    def ss(side):
        return F.col(f"{side}.q").cast("double") - F.col(
            f"{side}.s"
        ).cast("double") * F.col(f"{side}.s").cast("double") / F.col(
            f"{side}.n"
        )

    pooled = F.sqrt(
        (ss("a") + ss("b")) / (F.col("a.n") + F.col("b.n") - 2)
    )
    return (
        a.join(b, F.col("a.source") < F.col("b.source"))
        .select(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
            F.round((mean("a") - mean("b")) / pooled, 6).alias("cohens_d"),
        )
        .orderBy("source_a", "source_b")
    )


@register(
    "q_jarque_bera",
    oracle="""
        WITH per AS (
          SELECT source, CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(n_chars) AS BIGINT) AS s1
          FROM documents WHERE n_chars IS NOT NULL GROUP BY 1
        ),
        piv AS (SELECT source, n, s1 // n AS c FROM per),
        dev AS (
          SELECT d.source, p.n,
                 CAST(d.n_chars - p.c AS HUGEINT) AS dd
          FROM documents d JOIN piv p USING (source)
          WHERE d.n_chars IS NOT NULL
        ),
        mom AS (
          SELECT source, min(n) AS n, CAST(min(n) AS DOUBLE) AS nf,
                 CAST(sum(dd) AS DOUBLE) AS t1,
                 CAST(sum(dd * dd) AS DOUBLE) AS t2,
                 CAST(sum(dd * dd * dd) AS DOUBLE) AS t3,
                 CAST(sum(dd * dd * dd * dd) AS DOUBLE) AS t4
          FROM dev GROUP BY source
        ),
        cm AS (
          SELECT source, n, nf,
                 t2 / nf - (t1 / nf) * (t1 / nf) AS m2,
                 t3 / nf - 3 * (t1 / nf) * (t2 / nf)
                   + 2 * (t1 / nf) * (t1 / nf) * (t1 / nf) AS m3,
                 t4 / nf - 4 * (t1 / nf) * (t3 / nf)
                   + 6 * (t1 / nf) * (t1 / nf) * (t2 / nf)
                   - 3 * (t1 / nf) * (t1 / nf) * (t1 / nf) * (t1 / nf)
                   AS m4
          FROM mom
        )
        SELECT source, n,
               round(m3 / (m2 * sqrt(m2)), 6) AS skewness,
               round(m4 / (m2 * m2) - 3, 6) AS kurtosis_excess,
               round(nf / 6 * ((m3 / (m2 * sqrt(m2)))
                               * (m3 / (m2 * sqrt(m2)))
                               + (m4 / (m2 * m2) - 3)
                                 * (m4 / (m2 * m2) - 3) / 4),
                     4) AS jarque_bera
        FROM cm ORDER BY source
    """,
    doc="Jarque-Bera normality test of doc length per source "
    "(chi2_2 on skewness^2 + excess-kurtosis^2/4) — the gate before "
    "q_welch_ttest/q_cohens_d_pairs lean on normal-ish length "
    "distributions, and the skew/kurtosis profile is itself a "
    "source-mix fingerprint. Determinism: raw power sums are taken "
    "about an exact integer pivot c = floor(mean) (so DECIMAL(38,0) "
    "sums of d^4 stay ~1e20 at sf1 instead of the 1e33 raw fourth "
    "moments), central moments then derive from the exact sums with "
    "one fixed-shape float expression per group; m2^1.5 is written "
    "m2*sqrt(m2) because sqrt is correctly-rounded IEEE in both "
    "engines while pow() is library-dependent. Two group-keyed "
    "reduces + one broadcast pivot join, no windows.",
)
def q_jarque_bera(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir).filter(
        F.col("n_chars").isNotNull()
    )
    per = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"), F.sum("n_chars").alias("s1")
    )
    piv = per.select(
        "source", "n", F.expr("s1 div n").alias("c")
    )
    dev = docs.join(F.broadcast(piv), "source").select(
        "source",
        "n",
        (F.col("n_chars") - F.col("c")).cast("decimal(38,0)").alias("dd"),
    )
    dd = F.col("dd")
    mom = dev.groupBy("source").agg(
        F.min("n").alias("n"),
        F.min("n").cast("double").alias("nf"),
        F.sum(dd).cast("double").alias("t1"),
        F.sum(dd * dd).cast("double").alias("t2"),
        F.sum(dd * dd * dd).cast("double").alias("t3"),
        F.sum(dd * dd * dd * dd).cast("double").alias("t4"),
    )
    nf = F.col("nf")
    delta = F.col("t1") / nf
    m2 = F.col("t2") / nf - delta * delta
    m3 = (
        F.col("t3") / nf
        - 3 * delta * (F.col("t2") / nf)
        + 2 * delta * delta * delta
    )
    m4 = (
        F.col("t4") / nf
        - 4 * delta * (F.col("t3") / nf)
        + 6 * delta * delta * (F.col("t2") / nf)
        - 3 * delta * delta * delta * delta
    )
    skew = m3 / (m2 * F.sqrt(m2))
    kurtx = m4 / (m2 * m2) - 3
    return mom.select(
        "source",
        "n",
        F.round(skew, 6).alias("skewness"),
        F.round(kurtx, 6).alias("kurtosis_excess"),
        F.round(nf / 6 * (skew * skew + kurtx * kurtx / 4), 4).alias(
            "jarque_bera"
        ),
    ).orderBy("source")


@register(
    "q_bartlett_test",
    oracle="""
        WITH per AS (
          SELECT source, CAST(count(*) AS BIGINT) AS n,
                 sum(CAST(n_chars AS HUGEINT)) AS s1,
                 sum(CAST(n_chars AS HUGEINT) * n_chars) AS s2
          FROM documents WHERE n_chars IS NOT NULL GROUP BY 1
        ),
        v AS (
          SELECT source, n,
                 CAST(n * s2 - s1 * s1 AS DOUBLE)
                   / (CAST(n AS DOUBLE) * (n - 1)) AS s2i
          FROM per
        ),
        terms AS (
          SELECT n,
                 CAST(round((n - 1) * ln(s2i), 6)
                      AS DECIMAL(38,6)) AS wlog,
                 CAST(round((n - 1) * s2i, 4)
                      AS DECIMAL(38,4)) AS wvar,
                 CAST(round(1.0 / (n - 1), 12)
                      AS DECIMAL(38,12)) AS winv
          FROM v
        ),
        agg AS (
          SELECT CAST(count(*) AS BIGINT) AS k,
                 CAST(sum(n) AS BIGINT) AS ntot,
                 CAST(sum(wlog) AS DOUBLE) AS sum_wlog,
                 CAST(sum(wvar) AS DOUBLE) AS sum_wvar,
                 CAST(sum(winv) AS DOUBLE) AS sum_winv
          FROM terms
        )
        SELECT k AS k_groups, ntot AS n_total,
               CAST(k - 1 AS BIGINT) AS df,
               round(((ntot - k) * ln(sum_wvar / (ntot - k)) - sum_wlog)
                     / (1 + (sum_winv - 1.0 / (ntot - k))
                            / (3.0 * (k - 1))), 4) AS bartlett_chi2
        FROM agg
    """,
    doc="Bartlett's test for variance homogeneity of doc length "
    "across sources — the parametric sharp-tooth companion to "
    "q_brown_forsythe (Bartlett is the most powerful test under "
    "normality and the one classic ANOVA preconditions cite; "
    "Brown-Forsythe is the robust fallback — run q_jarque_bera to "
    "decide which to trust). Per-source sample variances come from "
    "exact integer sums (n*s2 - s1^2); the k-row rollup sums are "
    "round-to-DECIMAL terms so reducer order cannot drift the chi2. "
    "Two group reduces, no joins, no windows.",
)
def q_bartlett_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir).filter(
        F.col("n_chars").isNotNull()
    )
    v = F.col("n_chars").cast("decimal(38,0)")
    per = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum(v).alias("s1"),
        F.sum(v * v).alias("s2"),
    )
    n = F.col("n")
    s2i = (n * F.col("s2") - F.col("s1") * F.col("s1")).cast(
        "double"
    ) / (n.cast("double") * (n.cast("double") - 1))
    terms = per.select(
        n.cast("long").alias("n"),
        F.round((n.cast("double") - 1) * F.log(s2i), 6)
        .cast("decimal(38,6)")
        .alias("wlog"),
        F.round((n.cast("double") - 1) * s2i, 4)
        .cast("decimal(38,4)")
        .alias("wvar"),
        F.round(1.0 / (n.cast("double") - 1), 12)
        .cast("decimal(38,12)")
        .alias("winv"),
    )
    agg = terms.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("n").cast("long").alias("ntot"),
        F.sum("wlog").cast("double").alias("sum_wlog"),
        F.sum("wvar").cast("double").alias("sum_wvar"),
        F.sum("winv").cast("double").alias("sum_winv"),
    )
    k, ntot = F.col("k"), F.col("ntot")
    kf = k.cast("double")
    nk = ntot.cast("double") - kf
    return agg.select(
        k.alias("k_groups"),
        ntot.alias("n_total"),
        (k - 1).cast("long").alias("df"),
        F.round(
            (nk * F.log(F.col("sum_wvar") / nk) - F.col("sum_wlog"))
            / (1 + (F.col("sum_winv") - 1.0 / nk) / (3.0 * (kf - 1))),
            4,
        ).alias("bartlett_chi2"),
    )


@register(
    "q_wilson_ci",
    oracle="""
        WITH per AS (
          SELECT source, CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(CASE WHEN n_chars < 800 THEN 1 ELSE 0 END)
                      AS BIGINT) AS k
          FROM documents WHERE n_chars IS NOT NULL GROUP BY 1
        )
        SELECT source, n, k AS n_short,
               round(CAST(k AS DOUBLE) / n, 6) AS p_hat,
               round(((CAST(k AS DOUBLE) / n)
                      + 1.96 * 1.96 / (2 * n)
                      - 1.96 * sqrt((CAST(k AS DOUBLE) / n)
                                    * (1 - CAST(k AS DOUBLE) / n) / n
                                    + 1.96 * 1.96 / (4.0 * n * n)))
                     / (1 + 1.96 * 1.96 / n), 6) AS wilson_lo,
               round(((CAST(k AS DOUBLE) / n)
                      + 1.96 * 1.96 / (2 * n)
                      + 1.96 * sqrt((CAST(k AS DOUBLE) / n)
                                    * (1 - CAST(k AS DOUBLE) / n) / n
                                    + 1.96 * 1.96 / (4.0 * n * n)))
                     / (1 + 1.96 * 1.96 / n), 6) AS wilson_hi
        FROM per ORDER BY source
    """,
    doc="Wilson-score 95% confidence intervals for the short-doc rate "
    "(n_chars < 800) per source — the interval to quote for "
    "proportions (unlike the Wald interval it never leaves [0,1] and "
    "stays honest at extreme rates/small strata); the per-source "
    "defect-rate readout quality dashboards put error bars on. Pure "
    "closed form from exact integer (k, n) — one group-keyed "
    "map-side-combinable count, sqrt is correctly-rounded IEEE in "
    "both engines.",
)
def q_wilson_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir).filter(
        F.col("n_chars").isNotNull()
    )
    per = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum((F.col("n_chars") < 800).cast("long")).cast("long").alias("k"),
    )
    n = F.col("n").cast("double")
    p = F.col("k").cast("double") / n
    z2 = 1.96 * 1.96
    half = F.lit(1.96) * F.sqrt(p * (1 - p) / n + z2 / (4.0 * n * n))
    center = p + z2 / (2 * n)
    denom = 1 + z2 / n
    return per.select(
        "source",
        "n",
        F.col("k").alias("n_short"),
        F.round(p, 6).alias("p_hat"),
        F.round((center - half) / denom, 6).alias("wilson_lo"),
        F.round((center + half) / denom, 6).alias("wilson_hi"),
    ).orderBy("source")


@register(
    "q_topic_coherence",
    oracle="""
        WITH toks AS (
            SELECT source, unnest(list_filter(
                     string_split_regex(trim(lower(text)), '\\s+'),
                     t -> t <> '')) AS term
            FROM documents
        ),
        tf AS (SELECT source, term, count(*) AS tf FROM toks GROUP BY 1, 2),
        w_c AS (SELECT source, sum(tf) AS w FROM tf GROUP BY 1),
        f_t AS (SELECT term, sum(tf) AS f FROM tf GROUP BY 1),
        totals AS (SELECT sum(w) AS n_total, count(*) AS n_classes FROM w_c),
        scored AS (
            SELECT tf.source, tf.term,
                   round((CAST(tf.tf AS DOUBLE) / w_c.w)
                         * ln(1.0 + (CAST(t.n_total AS DOUBLE) / t.n_classes)
                                    / f_t.f), 6) AS ctfidf
            FROM tf JOIN w_c USING (source) JOIN f_t USING (term)
            CROSS JOIN totals t
        ),
        sel AS (
            SELECT source, term FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY source ORDER BY ctfidf DESC, term) AS rnk
                FROM scored)
            WHERE rnk <= 5
        ),
        pres AS (
            SELECT DISTINCT d.doc_id, t.term
            FROM (SELECT doc_id, unnest(list_filter(
                     string_split_regex(trim(lower(text)), '\\s+'),
                     x -> x <> '')) AS term
                  FROM documents) d
            JOIN (SELECT DISTINCT term FROM sel) t USING (term)
        ),
        nd AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
        dft AS (SELECT term, CAST(count(*) AS BIGINT) AS df
                FROM pres GROUP BY 1),
        pairs AS (
            SELECT a.source, a.term AS t1, b.term AS t2
            FROM sel a JOIN sel b
              ON a.source = b.source AND a.term < b.term
        ),
        codf AS (
            SELECT p.source, p.t1, p.t2,
                   CAST(count(x2.doc_id) AS BIGINT) AS co
            FROM pairs p
              LEFT JOIN pres x1 ON x1.term = p.t1
              LEFT JOIN pres x2
                ON x2.term = p.t2 AND x2.doc_id = x1.doc_id
            GROUP BY 1, 2, 3
        ),
        npmi AS (
            SELECT c.source,
                   CASE WHEN c.co = 0 THEN -1.0
                        WHEN c.co = nd.n THEN 1.0
                        ELSE ln((CAST(c.co AS DOUBLE) * nd.n)
                                / (CAST(d1.df AS DOUBLE) * d2.df))
                             / (-ln(CAST(c.co AS DOUBLE) / nd.n))
                   END AS v
            FROM codf c
              JOIN dft d1 ON d1.term = c.t1
              JOIN dft d2 ON d2.term = c.t2
              CROSS JOIN nd
        )
        SELECT source, CAST(count(*) AS BIGINT) AS n_pairs,
               round(CAST(sum(CAST(round(v, 6) AS DECIMAL(18,6)))
                     AS DOUBLE) / count(*), 6) AS coherence_npmi
        FROM npmi GROUP BY 1 ORDER BY source
    """,
    doc="NPMI topic coherence (Bouma 2009; the C_v family's core) of "
    "each source's top-5 c-TF-IDF terms: mean normalized PMI over "
    "the 10 term pairs, from document-level co-occurrence — the "
    "standard 'are these characteristic terms actually about one "
    "thing' check on q_ctfidf_source_terms' output (incoherent top "
    "terms mean the class is a grab-bag and its mixture weight is "
    "suspect). Scale shape: the c-TF-IDF model reuses the one "
    "(class, term) shuffle; the presence table is semi-joined down "
    "to the <= 5k selected terms BEFORE the distinct, and the "
    "co-occurrence join fans out over the k*C(5,2)-bounded pair "
    "scaffold, never all term pairs. NPMI edge conventions: "
    "never-co-occurring pairs pin to -1, always-co-occurring to +1.",
)
def q_topic_coherence(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    sel = ctfidf_terms(docs, group_col="source", top_k=5).select(
        "source", "term"
    )
    sel = F.broadcast(managed_persist(sel))
    terms = sel.select("term").distinct()
    from hw_kafka_streams_spark.operators.skew import spread_small

    # spread: the full-corpus tokenize-explode feeding the presence
    # table otherwise runs inside a single-split scan stage (serial);
    # no-op at real scale
    pres = (
        spread_small(docs.select("doc_id", "text"), key="doc_id")
        .select(
            "doc_id",
            F.explode(word_tokens(F.lower(F.col("text")))).alias("term"),
        )
        .join(F.broadcast(terms), "term")
        .distinct()
    )
    pres = managed_persist(pres)
    nd = docs.agg(F.count(F.lit(1)).alias("n"))
    dft = pres.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    a = sel.select("source", F.col("term").alias("t1"))
    b = sel.select(F.col("source").alias("source_b"), F.col("term").alias("t2"))
    pairs = a.join(
        b,
        (F.col("source") == F.col("source_b")) & (F.col("t1") < F.col("t2")),
    ).select("source", "t1", "t2")
    x1 = pres.withColumnsRenamed({"term": "t1"})
    x2 = pres.withColumnsRenamed({"term": "t2x", "doc_id": "doc_id2"})
    codf = (
        pairs.join(x1, "t1", "left")
        .join(
            x2,
            (F.col("t2") == F.col("t2x"))
            & (F.col("doc_id") == F.col("doc_id2")),
            "left",
        )
        .groupBy("source", "t1", "t2")
        .agg(F.count(F.col("doc_id2")).alias("co"))
    )
    d1 = dft.withColumnsRenamed({"term": "t1", "df": "df1"})
    d2 = dft.withColumnsRenamed({"term": "t2", "df": "df2"})
    co, n = F.col("co"), F.col("n")
    npmi = (
        codf.join(F.broadcast(d1), "t1")
        .join(F.broadcast(d2), "t2")
        .crossJoin(F.broadcast(nd))
        .select(
            "source",
            F.when(co == 0, F.lit(-1.0))
            .when(co == n, F.lit(1.0))
            .otherwise(
                F.log(
                    (co.cast("double") * n)
                    / (F.col("df1").cast("double") * F.col("df2"))
                )
                / -F.log(co.cast("double") / n)
            )
            .alias("v"),
        )
    )
    return (
        npmi.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.round(
                F.sum(F.round(F.col("v"), 6).cast("decimal(18,6)")).cast(
                    "double"
                )
                / F.count(F.lit(1)),
                6,
            ).alias("coherence_npmi"),
        )
        .orderBy("source")
    )


@register(
    "q_neyman_allocation",
    oracle="""
        WITH per AS (
          SELECT source, CAST(count(*) AS BIGINT) AS nh,
                 sum(CAST(n_chars AS HUGEINT)) AS s1,
                 sum(CAST(n_chars AS HUGEINT) * n_chars) AS s2
          FROM documents WHERE n_chars IS NOT NULL GROUP BY 1
        ),
        sd AS (
          SELECT source, nh,
                 sqrt(CAST(nh * s2 - s1 * s1 AS DOUBLE)
                      / (CAST(nh AS DOUBLE) * (nh - 1))) AS sh
          FROM per
        ),
        tot AS (
          SELECT CAST(sum(nh) AS BIGINT) AS n_total,
                 CAST(sum(CAST(round(nh * sh, 4) AS DECIMAL(28,4)))
                      AS DOUBLE) AS sum_ns
          FROM sd
        ),
        alloc AS (
          SELECT s.source, s.nh, s.sh,
                 1000.0 * s.nh / t.n_total AS n_prop,
                 1000.0 * (s.nh * s.sh) / t.sum_ns AS n_ney,
                 t.n_total
          FROM sd s CROSS JOIN tot t
        ),
        vtot AS (
          SELECT CAST(sum(CAST(round(
                   (CAST(nh AS DOUBLE) / n_total)
                   * (CAST(nh AS DOUBLE) / n_total)
                   * sh * sh / n_ney, 9) AS DECIMAL(28,9)))
                 AS DOUBLE) AS v_ney,
                 CAST(sum(CAST(round(
                   (CAST(nh AS DOUBLE) / n_total)
                   * (CAST(nh AS DOUBLE) / n_total)
                   * sh * sh / n_prop, 9) AS DECIMAL(28,9)))
                 AS DOUBLE) AS v_prop
          FROM alloc
        )
        SELECT a.source, a.nh AS n_docs, round(a.sh, 4) AS std_len,
               round(a.n_prop, 2) AS n_proportional,
               round(a.n_ney, 2) AS n_neyman,
               round(v.v_ney / v.v_prop, 6) AS var_ratio
        FROM alloc a CROSS JOIN vtot v ORDER BY a.source
    """,
    doc="Neyman optimal allocation (1934) of a 1000-doc eval sample "
    "across sources: n_h proportional to N_h * S_h (strata with more "
    "spread get more budget) vs plain proportional allocation, plus "
    "the stratified-mean variance ratio the optimization buys — how "
    "an eval set or labeling budget should actually be split instead "
    "of sampling uniformly. Per-stratum std from exact integer "
    "moments; the k-row rollups (sum N_h S_h, both variance totals) "
    "are round-to-DECIMAL sums. One group-keyed pass, k-row "
    "epilogue, no windows.",
)
def q_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir).filter(
        F.col("n_chars").isNotNull()
    )
    v = F.col("n_chars").cast("decimal(38,0)")
    per = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("nh"),
        F.sum(v).alias("s1"),
        F.sum(v * v).alias("s2"),
    )
    nh = F.col("nh")
    sh = F.sqrt(
        (nh.cast("decimal(38,0)") * F.col("s2") - F.col("s1") * F.col("s1"))
        .cast("double")
        / (nh.cast("double") * (nh.cast("double") - 1))
    )
    sd = per.select("source", "nh", sh.alias("sh"))
    sd = managed_persist(sd)
    tot = sd.agg(
        F.sum("nh").cast("long").alias("n_total"),
        F.sum(
            F.round(F.col("nh") * F.col("sh"), 4).cast("decimal(28,4)")
        )
        .cast("double")
        .alias("sum_ns"),
    )
    alloc = sd.crossJoin(F.broadcast(tot)).select(
        "source",
        "nh",
        "sh",
        (1000.0 * nh / F.col("n_total")).alias("n_prop"),
        (1000.0 * (nh * F.col("sh")) / F.col("sum_ns")).alias("n_ney"),
        "n_total",
    )
    alloc = managed_persist(alloc)
    wh = nh.cast("double") / F.col("n_total")
    vterm_n = F.round(
        wh * wh * F.col("sh") * F.col("sh") / F.col("n_ney"), 9
    ).cast("decimal(28,9)")
    vterm_p = F.round(
        wh * wh * F.col("sh") * F.col("sh") / F.col("n_prop"), 9
    ).cast("decimal(28,9)")
    vtot = alloc.agg(
        F.sum(vterm_n).cast("double").alias("v_ney"),
        F.sum(vterm_p).cast("double").alias("v_prop"),
    )
    return (
        alloc.crossJoin(F.broadcast(vtot))
        .select(
            "source",
            nh.alias("n_docs"),
            F.round("sh", 4).alias("std_len"),
            F.round("n_prop", 2).alias("n_proportional"),
            F.round("n_ney", 2).alias("n_neyman"),
            F.round(F.col("v_ney") / F.col("v_prop"), 6).alias(
                "var_ratio"
            ),
        )
        .orderBy("source")
    )


# A&S 26.2.17 upper-tail P(Z > x) for x >= 0 — the exact scalar text
# both engines share (the q_benjamini_hochberg recipe).
_NORM_UPPER = (
    "(exp(-{x} * {x} / 2.0) / 2.5066282746310002)"
    " * ((1.0 / (1.0 + 0.2316419 * {x}))"
    "    * (0.319381530"
    "       + (1.0 / (1.0 + 0.2316419 * {x}))"
    "         * (-0.356563782"
    "            + (1.0 / (1.0 + 0.2316419 * {x}))"
    "              * (1.781477937"
    "                 + (1.0 / (1.0 + 0.2316419 * {x}))"
    "                   * (-1.821255978"
    "                      + (1.0 / (1.0 + 0.2316419 * {x}))"
    "                        * 1.330274429)))))"
)


@register(
    "q_lilliefors",
    oracle="""
        WITH mom AS (
          SELECT source, CAST(count(*) AS BIGINT) AS n,
                 sum(CAST(n_chars AS HUGEINT)) AS s1,
                 sum(CAST(n_chars AS HUGEINT) * n_chars) AS s2
          FROM documents WHERE n_chars IS NOT NULL GROUP BY 1
        ),
        vals AS (
          SELECT source, n_chars AS v, CAST(count(*) AS BIGINT) AS c
          FROM documents WHERE n_chars IS NOT NULL GROUP BY 1, 2
        ),
        cum AS (
          SELECT source, v, c,
                 sum(c) OVER (PARTITION BY source ORDER BY v) AS cm
          FROM vals
        ),
        z AS (
          SELECT c.source, c.cm, c.c, m.n,
                 (c.v - CAST(m.s1 AS DOUBLE) / m.n)
                 / sqrt(CAST(m.n * m.s2 - m.s1 * m.s1 AS DOUBLE)
                        / (CAST(m.n AS DOUBLE) * m.n)) AS zv
          FROM cum c JOIN mom m USING (source)
        ),
        phi AS (
          SELECT source, cm, c, n,
                 CASE WHEN zv >= 0 THEN 1.0 - """
    + _NORM_UPPER.format(x="zv")
    + """
                      ELSE """
    + _NORM_UPPER.format(x="(-zv)")
    + """
                 END AS ph
          FROM z
        ),
        d AS (
          SELECT source, CAST(min(n) AS BIGINT) AS n,
                 max(GREATEST(CAST(cm AS DOUBLE) / n - ph,
                              ph - CAST(cm - c AS DOUBLE) / n)) AS dv
          FROM phi GROUP BY 1
        )
        SELECT source, n, round(dv, 6) AS d_stat,
               round(0.886 / sqrt(CAST(n AS DOUBLE)), 6) AS crit_05,
               CAST(dv > 0.886 / sqrt(CAST(n AS DOUBLE)) AS INT)
                 AS reject_normal
        FROM d ORDER BY source
    """,
    doc="Lilliefors normality test per source: the KS distance between "
    "the empirical CDF of doc length and the normal fitted from the "
    "SAME data (mean/sd from exact integer population moments) — the "
    "distribution-shape companion to q_jarque_bera's moment view "
    "(JB sees skew/kurtosis; Lilliefors sees any CDF gap, e.g. "
    "bimodality with symmetric moments). Normal CDF via the shared "
    "A&S 26.2.17 scalar text; D from the max over DISTINCT values of "
    "both one-sided ECDF gaps (the cum and cum-minus-count rails); "
    "large-sample 5% critical value 0.886/sqrt(n). The only window "
    "runs per source over the value-domain-bounded distinct-length "
    "table, parallel across sources.",
)
def q_lilliefors(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = load_table(spark, "documents", sf_dir).filter(
        F.col("n_chars").isNotNull()
    )
    dv = F.col("n_chars").cast("decimal(38,0)")
    mom = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(dv).alias("s1"),
        F.sum(dv * dv).alias("s2"),
    )
    vals = docs.groupBy("source", F.col("n_chars").alias("v")).agg(
        F.count(F.lit(1)).alias("c")
    )
    w = W.partitionBy("source").orderBy("v")
    cum = vals.withColumn("cm", F.sum("c").over(w))
    n = F.col("n")
    zv = (
        F.col("v") - F.col("s1").cast("double") / n
    ) / F.sqrt(
        (n.cast("decimal(38,0)") * F.col("s2") - F.col("s1") * F.col("s1"))
        .cast("double")
        / (n.cast("double") * n)
    )
    z = cum.join(F.broadcast(mom), "source").select(
        "source", "cm", "c", "n", zv.alias("zv")
    )

    def upper(x):
        t = 1.0 / (1.0 + 0.2316419 * x)
        return (F.exp(-x * x / 2.0) / 2.5066282746310002) * (
            t
            * (
                0.319381530
                + t
                * (
                    -0.356563782
                    + t
                    * (
                        1.781477937
                        + t * (-1.821255978 + t * 1.330274429)
                    )
                )
            )
        )

    ph = F.when(F.col("zv") >= 0, 1.0 - upper(F.col("zv"))).otherwise(
        upper(-F.col("zv"))
    )
    phi = z.select("source", "cm", "c", "n", ph.alias("ph"))
    d = phi.groupBy("source").agg(
        F.min("n").cast("long").alias("n"),
        F.max(
            F.greatest(
                F.col("cm").cast("double") / F.col("n") - F.col("ph"),
                F.col("ph")
                - (F.col("cm") - F.col("c")).cast("double") / F.col("n"),
            )
        ).alias("dv"),
    )
    crit = 0.886 / F.sqrt(F.col("n").cast("double"))
    return d.select(
        "source",
        "n",
        F.round("dv", 6).alias("d_stat"),
        F.round(crit, 6).alias("crit_05"),
        (F.col("dv") > crit).cast("int").alias("reject_normal"),
    ).orderBy("source")


@register(
    "q_odds_ratio",
    oracle="""
        WITH cells AS (
          SELECT CAST(sum(CASE WHEN lang = 'en' AND n_chars > 500
                          THEN 1 ELSE 0 END) AS BIGINT) AS a,
                 CAST(sum(CASE WHEN lang = 'en' AND n_chars <= 500
                          THEN 1 ELSE 0 END) AS BIGINT) AS b,
                 CAST(sum(CASE WHEN lang <> 'en' AND n_chars > 500
                          THEN 1 ELSE 0 END) AS BIGINT) AS c,
                 CAST(sum(CASE WHEN lang <> 'en' AND n_chars <= 500
                          THEN 1 ELSE 0 END) AS BIGINT) AS d
          FROM documents
          WHERE lang IS NOT NULL AND n_chars IS NOT NULL
        )
        SELECT a, b, c, d,
               round(CAST(a AS DOUBLE) * d / (CAST(b AS DOUBLE) * c), 6)
                 AS odds_ratio,
               round(exp(ln(CAST(a AS DOUBLE) * d
                            / (CAST(b AS DOUBLE) * c))
                         - 1.959964 * sqrt(1.0/a + 1.0/b + 1.0/c
                                           + 1.0/d)), 6) AS ci_lo,
               round(exp(ln(CAST(a AS DOUBLE) * d
                            / (CAST(b AS DOUBLE) * c))
                         + 1.959964 * sqrt(1.0/a + 1.0/b + 1.0/c
                                           + 1.0/d)), 6) AS ci_hi,
               CAST(exp(ln(CAST(a AS DOUBLE) * d
                           / (CAST(b AS DOUBLE) * c))
                        - 1.959964 * sqrt(1.0/a + 1.0/b + 1.0/c
                                          + 1.0/d)) > 1.0
                    OR exp(ln(CAST(a AS DOUBLE) * d
                              / (CAST(b AS DOUBLE) * c))
                           + 1.959964 * sqrt(1.0/a + 1.0/b + 1.0/c
                                             + 1.0/d)) < 1.0 AS INT)
                 AS significant
        FROM cells
    """,
    doc="Odds ratio with the Woolf 95% CI over the 2x2 table "
    "(exposure = lang 'en', outcome = n_chars > 500): the "
    "epidemiology-standard association effect SIZE that q_chi2_"
    "independence's p-value cannot give (chi2 says 'associated', OR "
    "says 'how strongly and in which direction', and the CI excludes "
    "1 iff the association is significant at 5%). One conditional-sum "
    "scan to four exact integer cells; ln(OR) +- 1.959964*sqrt(1/a+1/b"
    "+1/c+1/d) is a fixed float epilogue shared verbatim by both "
    "engines.",
)
def q_odds_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir).filter(
        F.col("lang").isNotNull() & F.col("n_chars").isNotNull()
    )
    en = F.col("lang") == "en"
    big = F.col("n_chars") > 500
    cells = docs.agg(
        F.sum((en & big).cast("long")).cast("long").alias("a"),
        F.sum((en & ~big).cast("long")).cast("long").alias("b"),
        F.sum((~en & big).cast("long")).cast("long").alias("c"),
        F.sum((~en & ~big).cast("long")).cast("long").alias("d"),
    )
    a, b = F.col("a").cast("double"), F.col("b").cast("double")
    c, d = F.col("c").cast("double"), F.col("d").cast("double")
    lor = F.log(a * d / (b * c))
    se = F.sqrt(1.0 / a + 1.0 / b + 1.0 / c + 1.0 / d)
    lo = F.exp(lor - 1.959964 * se)
    hi = F.exp(lor + 1.959964 * se)
    return cells.select(
        "a",
        "b",
        "c",
        "d",
        F.round(a * d / (b * c), 6).alias("odds_ratio"),
        F.round(lo, 6).alias("ci_lo"),
        F.round(hi, 6).alias("ci_hi"),
        ((lo > 1.0) | (hi < 1.0)).cast("int").alias("significant"),
    )


@register(
    "q_anderson_darling",
    oracle="""
        WITH mom AS (
          SELECT source, CAST(count(*) AS BIGINT) AS n,
                 sum(CAST(n_chars AS HUGEINT)) AS s1,
                 sum(CAST(n_chars AS HUGEINT) * n_chars) AS s2
          FROM documents WHERE n_chars IS NOT NULL GROUP BY 1
        ),
        vals AS (
          SELECT source, n_chars AS v, CAST(count(*) AS BIGINT) AS c
          FROM documents WHERE n_chars IS NOT NULL GROUP BY 1, 2
        ),
        cum AS (
          SELECT source, v, c,
                 sum(c) OVER (PARTITION BY source ORDER BY v) AS cm
          FROM vals
        ),
        z AS (
          SELECT c.source, c.c, c.cm, m.n,
                 (c.v - CAST(m.s1 AS DOUBLE) / m.n)
                 / sqrt(CAST(m.n * m.s2 - m.s1 * m.s1 AS DOUBLE)
                        / (CAST(m.n AS DOUBLE) * m.n)) AS zv
          FROM cum c JOIN mom m USING (source)
        ),
        phi AS (
          SELECT source, c, cm, n,
                 GREATEST(LEAST(CASE WHEN zv >= 0 THEN 1.0 - """
    + _NORM_UPPER.format(x="zv")
    + """
                      ELSE """
    + _NORM_UPPER.format(x="(-zv)")
    + """
                 END, 1.0 - 1e-15), 1e-15) AS ph
          FROM z
        ),
        terms AS (
          SELECT source, n,
                 CAST(round(
                   (CAST(cm * cm - (cm - c) * (cm - c) AS DOUBLE)
                      * ln(ph)
                    + CAST((n - cm + c) * (n - cm + c)
                           - (n - cm) * (n - cm) AS DOUBLE)
                      * ln(1.0 - ph)) / n, 9) AS DECIMAL(38, 9)) AS t
          FROM phi
        ),
        a2 AS (
          SELECT source, CAST(min(n) AS BIGINT) AS n,
                 -CAST(min(n) AS DOUBLE) - CAST(sum(t) AS DOUBLE) AS a
          FROM terms GROUP BY 1
        )
        SELECT source, n, round(a, 6) AS a2,
               round(a * (1.0 + 0.75 / n + 2.25 / (CAST(n AS DOUBLE) * n)),
                     6) AS a2_star,
               CAST(a * (1.0 + 0.75 / n + 2.25 / (CAST(n AS DOUBLE) * n))
                    > 0.787 AS INT) AS reject_normal
        FROM a2 ORDER BY source
    """,
    doc="Anderson-Darling normality test per source over doc length — "
    "the tail-weighted companion to q_lilliefors (KS weighs the CDF "
    "gap uniformly; AD's 1/[F(1-F)] weight makes it the most powerful "
    "of the EDF normality tests against heavy/light tails, Stephens "
    "1974). Grouped-count formulation with EXACT integer rank "
    "coefficients: for a tied value spanning cumulative counts "
    "(cm-c, cm], sum(2i-1) = cm^2-(cm-c)^2 and the mirrored "
    "coefficient is (n-cm+c)^2-(n-cm)^2, so ties need no row "
    "explosion and the scan stays one partial-agged pass over "
    "DISTINCT lengths. Normal CDF via the shared A&S 26.2.17 scalar "
    "text, clamped to [1e-15, 1-1e-15] on both engines; per-term "
    "DECIMAL(38,9) rounding makes the float sum order-proof. "
    "A*2 = A2(1+0.75/n+2.25/n^2) against the 5% estimated-parameters "
    "critical value 0.787. Convention: z-scores use the POPULATION "
    "sd (SS/n), not Stephens' n-1 sample sd — A*2 is slightly "
    "inflated (conservative) for small groups; the oracle mirrors "
    "the same formula and q_lilliefors shares the convention.",
)
def q_anderson_darling(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = load_table(spark, "documents", sf_dir).filter(
        F.col("n_chars").isNotNull()
    )
    dv = F.col("n_chars").cast("decimal(38,0)")
    mom = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(dv).alias("s1"),
        F.sum(dv * dv).alias("s2"),
    )
    vals = docs.groupBy("source", F.col("n_chars").alias("v")).agg(
        F.count(F.lit(1)).alias("c")
    )
    w = W.partitionBy("source").orderBy("v")
    cum = vals.withColumn("cm", F.sum("c").over(w))
    n = F.col("n")
    zv = (
        F.col("v") - F.col("s1").cast("double") / n
    ) / F.sqrt(
        (n.cast("decimal(38,0)") * F.col("s2") - F.col("s1") * F.col("s1"))
        .cast("double")
        / (n.cast("double") * n)
    )
    z = cum.join(F.broadcast(mom), "source").select(
        "source", "c", "cm", "n", zv.alias("zv")
    )

    def upper(x):
        t = 1.0 / (1.0 + 0.2316419 * x)
        return (F.exp(-x * x / 2.0) / 2.5066282746310002) * (
            t
            * (
                0.319381530
                + t
                * (
                    -0.356563782
                    + t
                    * (
                        1.781477937
                        + t * (-1.821255978 + t * 1.330274429)
                    )
                )
            )
        )

    ph = F.greatest(
        F.least(
            F.when(F.col("zv") >= 0, 1.0 - upper(F.col("zv"))).otherwise(
                upper(-F.col("zv"))
            ),
            F.lit(1.0 - 1e-15),
        ),
        F.lit(1e-15),
    )
    phi = z.select("source", "c", "cm", "n", ph.alias("ph"))
    cmc = F.col("cm") - F.col("c")
    coef1 = (F.col("cm") * F.col("cm") - cmc * cmc).cast("double")
    nc = F.col("n") - F.col("cm")
    coef2 = ((nc + F.col("c")) * (nc + F.col("c")) - nc * nc).cast("double")
    term = F.round(
        (coef1 * F.log(F.col("ph")) + coef2 * F.log(1.0 - F.col("ph")))
        / F.col("n"),
        9,
    ).cast("decimal(38,9)")
    a2 = phi.select("source", "n", term.alias("t")).groupBy("source").agg(
        F.min("n").cast("long").alias("n"),
        (-F.min("n").cast("double") - F.sum("t").cast("double")).alias("a"),
    )
    nn = F.col("n").cast("double")
    star = F.col("a") * (1.0 + 0.75 / nn + 2.25 / (nn * nn))
    return a2.select(
        "source",
        "n",
        F.round("a", 6).alias("a2"),
        F.round(star, 6).alias("a2_star"),
        (star > 0.787).cast("int").alias("reject_normal"),
    ).orderBy("source")


@register(
    "q_simpson_audit",
    oracle="""
        WITH base AS (
          SELECT CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                 THEN 1 ELSE 0 END AS x,
                 CASE WHEN o_totalprice > 250000 THEN 1 ELSE 0 END AS y,
                 o_orderstatus AS stratum
          FROM orders
        ),
        per AS (
          SELECT stratum,
                 CAST(sum(CASE WHEN x = 1 THEN y ELSE 0 END)
                      AS BIGINT) AS y1,
                 CAST(sum(x) AS BIGINT) AS n1,
                 CAST(sum(CASE WHEN x = 0 THEN y ELSE 0 END)
                      AS BIGINT) AS y0,
                 CAST(sum(1 - x) AS BIGINT) AS n0
          FROM base GROUP BY 1
          UNION ALL
          SELECT 'ALL',
                 CAST(sum(CASE WHEN x = 1 THEN y ELSE 0 END) AS BIGINT),
                 CAST(sum(x) AS BIGINT),
                 CAST(sum(CASE WHEN x = 0 THEN y ELSE 0 END) AS BIGINT),
                 CAST(sum(1 - x) AS BIGINT)
          FROM base
        ),
        rd AS (
          SELECT stratum, y1, n1, y0, n0,
                 CAST(y1 AS DOUBLE) / n1
                 - CAST(y0 AS DOUBLE) / n0 AS diff
          FROM per
        ),
        flag AS (
          SELECT CAST(
            (SELECT CASE WHEN diff > 0 THEN 1
                    WHEN diff < 0 THEN -1 ELSE 0 END
             FROM rd WHERE stratum = 'ALL')
            * min(CASE WHEN diff > 0 THEN 1
                  WHEN diff < 0 THEN -1 ELSE 0 END) < 0
            AND (SELECT count(DISTINCT CASE WHEN diff > 0 THEN 1
                         WHEN diff < 0 THEN -1 ELSE 0 END)
                 FROM rd WHERE stratum <> 'ALL') = 1
            AS INT) AS paradox
          FROM rd WHERE stratum <> 'ALL'
        )
        SELECT r.stratum, r.n1 AS n_exposed, r.n0 AS n_control,
               round(CAST(r.y1 AS DOUBLE) / r.n1, 6) AS rate_exposed,
               round(CAST(r.y0 AS DOUBLE) / r.n0, 6) AS rate_control,
               round(r.diff, 6) AS risk_diff,
               f.paradox AS simpson_flag
        FROM rd r CROSS JOIN flag f
        ORDER BY r.stratum
    """,
    doc="Simpson's-paradox audit: the risk difference of high-value "
    "orders between urgent-priority and other orders, AGGREGATED and "
    "per order-status stratum, with a flag that fires only when the "
    "aggregate association's sign contradicts a UNANIMOUS opposite "
    "sign across all strata — the confounding tripwire every "
    "observational comparison (source quality deltas, filter A/Bs "
    "over mixed corpora) should run before anyone acts on the "
    "pooled number. One map-side-combinable pass builds every cell "
    "(the union'd ALL row shares the scan at 100 TB via partial "
    "aggregation); the sign logic runs on the k+1-row table.",
)
def q_simpson_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    base = orders.select(
        F.col("o_orderpriority")
        .isin("1-URGENT", "2-HIGH")
        .cast("int")
        .alias("x"),
        (F.col("o_totalprice") > 250000).cast("int").alias("y"),
        F.col("o_orderstatus").alias("stratum"),
    )
    base = managed_persist(base)

    def cells(df, label_col):
        return df.groupBy(label_col).agg(
            F.sum(F.when(F.col("x") == 1, F.col("y")).otherwise(0))
            .cast("long")
            .alias("y1"),
            F.sum("x").cast("long").alias("n1"),
            F.sum(F.when(F.col("x") == 0, F.col("y")).otherwise(0))
            .cast("long")
            .alias("y0"),
            F.sum(1 - F.col("x")).cast("long").alias("n0"),
        )

    per = cells(base, "stratum").unionAll(
        cells(base.withColumn("stratum", F.lit("ALL")), "stratum")
    )
    diff = F.col("y1").cast("double") / F.col("n1") - F.col("y0").cast(
        "double"
    ) / F.col("n0")
    rd = per.select("stratum", "y1", "n1", "y0", "n0", diff.alias("diff"))
    rd = managed_persist(rd)
    sign = (
        F.when(F.col("diff") > 0, 1)
        .when(F.col("diff") < 0, -1)
        .otherwise(0)
    )
    agg_sign = rd.filter(F.col("stratum") == "ALL").select(
        sign.alias("s_all")
    )
    strata = rd.filter(F.col("stratum") != "ALL").select(
        sign.alias("s")
    )
    flag = (
        strata.crossJoin(F.broadcast(agg_sign))
        .agg(
            (
                (F.min(F.col("s_all") * F.col("s")) < 0)
                & (F.countDistinct("s") == 1)
            )
            .cast("int")
            .alias("paradox")
        )
    )
    return (
        rd.crossJoin(F.broadcast(flag))
        .select(
            "stratum",
            F.col("n1").alias("n_exposed"),
            F.col("n0").alias("n_control"),
            F.round(F.col("y1").cast("double") / F.col("n1"), 6).alias(
                "rate_exposed"
            ),
            F.round(F.col("y0").cast("double") / F.col("n0"), 6).alias(
                "rate_control"
            ),
            F.round("diff", 6).alias("risk_diff"),
            F.col("paradox").alias("simpson_flag"),
        )
        .orderBy("stratum")
    )


@register(
    "q_icc",
    oracle="""
        WITH per AS (
          SELECT source, CAST(count(*) AS BIGINT) AS n,
                 sum(CAST(n_chars AS HUGEINT)) AS s1,
                 sum(CAST(n_chars AS HUGEINT) * n_chars) AS s2
          FROM documents WHERE n_chars IS NOT NULL GROUP BY 1
        ),
        g AS (
          SELECT CAST(count(*) AS BIGINT) AS k,
                 CAST(sum(n) AS BIGINT) AS ntot,
                 CAST(sum(s1) AS HUGEINT) AS st1,
                 CAST(sum(s2) AS HUGEINT) AS st2,
                 CAST(sum(CAST(round(
                     CAST(s1 AS DOUBLE) * s1 / n, 4)
                   AS DECIMAL(38,4))) AS DOUBLE) AS ssb_part,
                 CAST(sum(CAST(round(
                     CAST(n AS DOUBLE) * n, 4)
                   AS DECIMAL(38,4))) AS DOUBLE) AS sum_n2
          FROM per
        ),
        ss AS (
          SELECT k, ntot,
                 ssb_part - CAST(st1 AS DOUBLE) * st1 / ntot AS ssb,
                 CAST(st2 AS DOUBLE)
                   - CAST(st1 AS DOUBLE) * st1 / ntot AS sst,
                 (ntot - sum_n2 / ntot) / (k - 1) AS n0
          FROM g
        )
        SELECT k AS k_groups, ntot AS n_total,
               round(n0, 4) AS n0_effective,
               round(ssb / (k - 1), 4) AS ms_between,
               round((sst - ssb) / (ntot - k), 4) AS ms_within,
               round(((ssb / (k - 1)) - (sst - ssb) / (ntot - k))
                     / ((ssb / (k - 1))
                        + (n0 - 1) * (sst - ssb) / (ntot - k)),
                     6) AS icc1,
               round(1 + (n0 - 1)
                     * (((ssb / (k - 1)) - (sst - ssb) / (ntot - k))
                        / ((ssb / (k - 1))
                           + (n0 - 1) * (sst - ssb) / (ntot - k))),
                     4) AS design_effect
        FROM ss
    """,
    doc="Intraclass correlation ICC(1) of doc length within sources "
    "(one-way random-effects ANOVA, unequal groups via "
    "Searle's n0 = (N - sum n_h^2/N)/(k-1)) plus the Kish design "
    "effect 1 + (n0-1)*ICC — the number that says how much a "
    "source-clustered sample inflates variance vs simple random "
    "sampling, i.e. the justification for q_neyman_allocation's "
    "stratification and the honest n for any cluster-sampled eval. "
    "All sums of squares from exact integer moments (per-group "
    "s1^2/n terms 4dp-DECIMAL-rolled); one group pass, 1-row "
    "epilogue.",
)
def q_icc(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir).filter(
        F.col("n_chars").isNotNull()
    )
    v = F.col("n_chars").cast("decimal(38,0)")
    per = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(v).alias("s1"),
        F.sum(v * v).alias("s2"),
    )
    g = per.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("n").cast("long").alias("ntot"),
        F.sum("s1").alias("st1"),
        F.sum("s2").alias("st2"),
        F.sum(
            F.round(
                F.col("s1").cast("double") * F.col("s1") / F.col("n"), 4
            ).cast("decimal(38,4)")
        )
        .cast("double")
        .alias("ssb_part"),
        F.sum(
            F.round(F.col("n").cast("double") * F.col("n"), 4).cast(
                "decimal(38,4)"
            )
        )
        .cast("double")
        .alias("sum_n2"),
    )
    k = F.col("k")
    ntot = F.col("ntot")
    ssb = F.col("ssb_part") - F.col("st1").cast("double") * F.col(
        "st1"
    ) / ntot
    sst = F.col("st2").cast("double") - F.col("st1").cast(
        "double"
    ) * F.col("st1") / ntot
    n0 = (ntot - F.col("sum_n2") / ntot) / (k - 1)
    msb = ssb / (k - 1)
    msw = (sst - ssb) / (ntot - k)
    icc = (msb - msw) / (msb + (n0 - 1) * msw)
    return g.select(
        k.alias("k_groups"),
        ntot.alias("n_total"),
        F.round(n0, 4).alias("n0_effective"),
        F.round(msb, 4).alias("ms_between"),
        F.round(msw, 4).alias("ms_within"),
        F.round(icc, 6).alias("icc1"),
        F.round(1 + (n0 - 1) * icc, 4).alias("design_effect"),
    )


@register(
    "q_sobel_mediation",
    oracle="""
        WITH base AS (
          SELECT CAST(n_chars AS HUGEINT) AS x,
                 CAST(len(list_filter(string_split_regex(trim(text),
                     '\\s+'), t -> t <> '')) AS HUGEINT) AS m,
                 CAST(len(list_distinct(list_filter(
                     string_split_regex(trim(lower(text)), '\\s+'),
                     t -> t <> ''))) AS HUGEINT) AS y
          FROM documents WHERE n_chars IS NOT NULL
        ),
        s AS (
          SELECT CAST(count(*) AS HUGEINT) AS n,
                 sum(x) AS sx, sum(m) AS sm, sum(y) AS sy,
                 sum(x * x) AS sxx, sum(m * m) AS smm,
                 sum(y * y) AS syy, sum(x * m) AS sxm,
                 sum(x * y) AS sxy, sum(m * y) AS smy
          FROM base
        ),
        c AS (
          SELECT CAST(n AS DOUBLE) AS nf,
                 CAST(n * sxx - sx * sx AS DOUBLE) AS cxx,
                 CAST(n * smm - sm * sm AS DOUBLE) AS cmm,
                 CAST(n * syy - sy * sy AS DOUBLE) AS cyy,
                 CAST(n * sxm - sx * sm AS DOUBLE) AS cxm,
                 CAST(n * sxy - sx * sy AS DOUBLE) AS cxy,
                 CAST(n * smy - sm * sy AS DOUBLE) AS cmy
          FROM s
        ),
        fit AS (
          SELECT nf,
                 cxm / cxx AS a,
                 (cmm - cxm * cxm / cxx) / (nf - 2) / cxx AS var_a,
                 (cxx * cmy - cxm * cxy)
                   / (cmm * cxx - cxm * cxm) AS b,
                 ((cyy - ((cxx * cmy - cxm * cxy) * cmy
                          + (cmm * cxy - cxm * cmy) * cxy)
                         / (cmm * cxx - cxm * cxm))
                  / (nf - 3))
                 * cxx / (cmm * cxx - cxm * cxm) AS var_b,
                 cxy / cxx AS c_total
          FROM c
        )
        SELECT CAST(nf AS BIGINT) AS n_docs,
               round(a, 6) AS a_x_to_m,
               round(b, 6) AS b_m_to_y,
               round(a * b, 6) AS indirect,
               round(c_total, 6) AS total_effect,
               round(a * b / c_total, 6) AS prop_mediated,
               round(a * b / sqrt(a * a * var_b + b * b * var_a), 4)
                 AS sobel_z
        FROM fit
    """,
    doc="Sobel mediation test (1982; Baron-Kenny path analysis in "
    "closed form): does doc length in chars (X) drive distinct "
    "vocabulary (Y) THROUGH token count (M)? Path a from M ~ X, "
    "path b from Y ~ M + X (the 2x2 Cramer solve of the "
    "q_granger_lag1 machinery), indirect effect a*b with the Sobel "
    "z = ab / sqrt(a^2 se_b^2 + b^2 se_a^2) — the causal-decomposition "
    "reading that q_pearson_corr's marginal correlations can't give. "
    "All three variables are integers, so every centered moment is "
    "an exact DECIMAL scaled by n; the fit is pure closed-form float "
    "on exact inputs. One tokenize pass + one 1-row reduce.",
)
def q_sobel_mediation(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir).filter(
        F.col("n_chars").isNotNull()
    )
    d = "decimal(38,0)"
    base = docs.select(
        F.col("n_chars").cast(d).alias("x"),
        F.size(word_tokens(F.col("text"))).cast(d).alias("m"),
        F.size(
            F.array_distinct(word_tokens(F.lower(F.col("text"))))
        )
        .cast(d)
        .alias("y"),
    )
    x, m, y = F.col("x"), F.col("m"), F.col("y")
    s = base.agg(
        F.count(F.lit(1)).cast(d).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(m).alias("sm"),
        F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(m * m).alias("smm"),
        F.sum(y * y).alias("syy"),
        F.sum(x * m).alias("sxm"),
        F.sum(x * y).alias("sxy"),
        F.sum(m * y).alias("smy"),
    )
    n = F.col("n")
    c = s.select(
        n.cast("double").alias("nf"),
        (n * F.col("sxx") - F.col("sx") * F.col("sx"))
        .cast("double")
        .alias("cxx"),
        (n * F.col("smm") - F.col("sm") * F.col("sm"))
        .cast("double")
        .alias("cmm"),
        (n * F.col("syy") - F.col("sy") * F.col("sy"))
        .cast("double")
        .alias("cyy"),
        (n * F.col("sxm") - F.col("sx") * F.col("sm"))
        .cast("double")
        .alias("cxm"),
        (n * F.col("sxy") - F.col("sx") * F.col("sy"))
        .cast("double")
        .alias("cxy"),
        (n * F.col("smy") - F.col("sm") * F.col("sy"))
        .cast("double")
        .alias("cmy"),
    )
    nf = F.col("nf")
    cxx, cmm, cyy = F.col("cxx"), F.col("cmm"), F.col("cyy")
    cxm, cxy, cmy = F.col("cxm"), F.col("cxy"), F.col("cmy")
    a = cxm / cxx
    var_a = (cmm - cxm * cxm / cxx) / (nf - 2) / cxx
    det = cmm * cxx - cxm * cxm
    b = (cxx * cmy - cxm * cxy) / det
    rss_scaled = cyy - (
        (cxx * cmy - cxm * cxy) * cmy + (cmm * cxy - cxm * cmy) * cxy
    ) / det
    var_b = (rss_scaled / (nf - 3)) * cxx / det
    c_total = cxy / cxx
    fit = c.select(
        nf.cast("long").alias("n_docs"),
        F.round(a, 6).alias("a_x_to_m"),
        F.round(b, 6).alias("b_m_to_y"),
        F.round(a * b, 6).alias("indirect"),
        F.round(c_total, 6).alias("total_effect"),
        F.round(a * b / c_total, 6).alias("prop_mediated"),
        F.round(
            a * b / F.sqrt(a * a * var_b + b * b * var_a), 4
        ).alias("sobel_z"),
    )
    return fit


@register(
    "q_dataset_card",
    oracle="""
        WITH toks AS (
          SELECT doc_id, unnest(list_filter(string_split_regex(
                   trim(lower(text)), '\\s+'), t -> t <> '')) AS w
          FROM documents
        ),
        tok_stats AS (
          SELECT CAST(count(*) AS BIGINT) AS n_tokens,
                 CAST(count(DISTINCT w) AS BIGINT) AS n_vocab
          FROM toks
        ),
        per_doc AS (
          SELECT doc_id,
                 len(list_filter(string_split_regex(trim(text),
                     '\\s+'), t -> t <> '')) AS n_tok,
                 md5(lower(trim(regexp_replace(text, '\\s+', ' ',
                     'g')))) AS fp,
                 lang, source
          FROM documents
        ),
        doc_stats AS (
          SELECT CAST(count(*) AS BIGINT) AS n_docs,
                 CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
                 CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
                 CAST(count(*) - count(DISTINCT fp) AS BIGINT)
                   AS n_exact_dups,
                 CAST(sum(CASE WHEN n_tok < 120 THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_short
          FROM per_doc
        ),
        lang_h AS (
          SELECT CAST(sum(CAST(round(
                   -(CAST(c AS DOUBLE) / t)
                   * ln(CAST(c AS DOUBLE) / t), 9)
                 AS DECIMAL(18,9))) AS DOUBLE) AS lang_entropy
          FROM (SELECT lang, CAST(count(*) AS BIGINT) AS c,
                       CAST(sum(count(*)) OVER () AS BIGINT) AS t
                FROM documents GROUP BY 1)
        )
        SELECT d.n_docs, d.n_sources, d.n_langs,
               t.n_tokens, t.n_vocab,
               round(CAST(t.n_tokens AS DOUBLE) / d.n_docs, 2)
                 AS mean_doc_tokens,
               round(CAST(d.n_exact_dups AS DOUBLE) / d.n_docs, 6)
                 AS exact_dup_rate,
               round(CAST(d.n_short AS DOUBLE) / d.n_docs, 6)
                 AS short_doc_rate,
               round(h.lang_entropy, 4) AS lang_entropy_nats
        FROM doc_stats d CROSS JOIN tok_stats t CROSS JOIN lang_h h
    """,
    doc="Dataset-card summary row ('Datasheets for Datasets', Gebru "
    "2018): the one-line corpus profile a model card quotes — doc/"
    "source/language counts, token volume and vocabulary, mean "
    "length, exact-duplicate rate (normalized-fingerprint), "
    "short-doc rate, and the language-mix entropy. Every number "
    "reuses a battle-tested recipe from the battery (fingerprint "
    "dedup, token counts, decimal-entropy) composed into TWO corpus "
    "scans (token explode; per-doc profile) + 1-row joins — the "
    "capstone readout over the curation surface. The lang-entropy "
    "window is category-sized (OVER () on the k-row lang counts).",
)
def q_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hw_kafka_streams_spark.operators.text import (
        fingerprint,
        word_tokens,
    )
    from hw_kafka_streams_spark.operators.winutil import (
        tiny_table_partition,
    )
    from pyspark.sql import Window as W

    docs = load_table(spark, "documents", sf_dir)
    toks = docs.select(
        F.explode(word_tokens(F.lower(F.col("text")))).alias("w")
    )
    tok_stats = toks.agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.countDistinct("w").cast("long").alias("n_vocab"),
    )
    per_doc = docs.select(
        F.size(word_tokens(F.col("text"))).alias("n_tok"),
        fingerprint(F.col("text")).alias("fp"),
        "lang",
        "source",
    )
    doc_stats = per_doc.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.countDistinct("source").cast("long").alias("n_sources"),
        F.countDistinct("lang").cast("long").alias("n_langs"),
        (F.count(F.lit(1)) - F.countDistinct("fp"))
        .cast("long")
        .alias("n_exact_dups"),
        F.sum((F.col("n_tok") < 120).cast("long"))
        .cast("long")
        .alias("n_short"),
    )
    lc = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("c"))
    wt = W.partitionBy(tiny_table_partition("lang"))
    lang_h = lc.withColumn("t", F.sum("c").over(wt)).agg(
        F.sum(
            F.round(
                -(F.col("c").cast("double") / F.col("t"))
                * F.log(F.col("c").cast("double") / F.col("t")),
                9,
            ).cast("decimal(18,9)")
        )
        .cast("double")
        .alias("lang_entropy")
    )
    return (
        doc_stats.crossJoin(F.broadcast(tok_stats))
        .crossJoin(F.broadcast(lang_h))
        .select(
            "n_docs",
            "n_sources",
            "n_langs",
            "n_tokens",
            "n_vocab",
            F.round(
                F.col("n_tokens").cast("double") / F.col("n_docs"), 2
            ).alias("mean_doc_tokens"),
            F.round(
                F.col("n_exact_dups").cast("double") / F.col("n_docs"), 6
            ).alias("exact_dup_rate"),
            F.round(
                F.col("n_short").cast("double") / F.col("n_docs"), 6
            ).alias("short_doc_rate"),
            F.round("lang_entropy", 4).alias("lang_entropy_nats"),
        )
    )


# Three deterministic binary "raters" on the same docs — shared by
# q_cochran_q and q_fleiss_kappa (the >2-filter extension of
# q_mcnemar_filters' paired design).
_FILTER_SQL = """
        flags AS (
          SELECT doc_id,
                 CAST(len(list_filter(string_split_regex(trim(text),
                     '\\s+'), t -> t <> '')) >= 120 AS INT) AS f1,
                 CAST(n_chars >= 800 AS INT) AS f2,
                 CAST(len(list_distinct(list_filter(
                     string_split_regex(trim(lower(text)), '\\s+'),
                     t -> t <> ''))) >= 25 AS INT) AS f3
          FROM documents WHERE n_chars IS NOT NULL
        )
"""


@register(
    "q_cochran_q",
    oracle="WITH " + _FILTER_SQL + """,
        rows_ AS (
          SELECT f1, f2, f3, f1 + f2 + f3 AS r FROM flags
        ),
        s AS (
          SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(f1) AS BIGINT) AS c1,
                 CAST(sum(f2) AS BIGINT) AS c2,
                 CAST(sum(f3) AS BIGINT) AS c3,
                 CAST(sum(r) AS BIGINT) AS sr,
                 CAST(sum(r * r) AS BIGINT) AS sr2
          FROM rows_
        )
        SELECT n AS n_docs, c1 AS pass_len, c2 AS pass_chars,
               c3 AS pass_vocab,
               round(3 * 2 * ((c1 - CAST(sr AS DOUBLE) / 3)
                              * (c1 - CAST(sr AS DOUBLE) / 3)
                            + (c2 - CAST(sr AS DOUBLE) / 3)
                              * (c2 - CAST(sr AS DOUBLE) / 3)
                            + (c3 - CAST(sr AS DOUBLE) / 3)
                              * (c3 - CAST(sr AS DOUBLE) / 3))
                     / (3 * sr - sr2), 4) AS cochran_q,
               2 AS df
        FROM s
    """,
    doc="Cochran's Q (1950): do THREE matched quality filters (token "
    "length >= 120, chars >= 800, distinct vocab >= 25) pass the "
    "same documents at the same rate? — the k-filter extension of "
    "q_mcnemar_filters' paired 2x2 (McNemar IS Cochran's Q at k=2), "
    "the right omnibus before swapping any one filter in a battery. "
    "Q = k(k-1) sum_j (C_j - R/k)^2 / (k R - sum_i R_i^2), every sum "
    "an exact integer off ONE map-side-combinable scan; the float "
    "work is a fixed 1-row expression.",
)
def q_cochran_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir).filter(
        F.col("n_chars").isNotNull()
    )
    toks = word_tokens(F.col("text"))
    f1 = (F.size(toks) >= 120).cast("int")
    f2 = (F.col("n_chars") >= 800).cast("int")
    f3 = (
        F.size(F.array_distinct(word_tokens(F.lower(F.col("text")))))
        >= 25
    ).cast("int")
    rows = docs.select(
        f1.alias("f1"), f2.alias("f2"), f3.alias("f3")
    ).withColumn("r", F.col("f1") + F.col("f2") + F.col("f3"))
    s = rows.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("f1").cast("long").alias("c1"),
        F.sum("f2").cast("long").alias("c2"),
        F.sum("f3").cast("long").alias("c3"),
        F.sum("r").cast("long").alias("sr"),
        F.sum(F.col("r") * F.col("r")).cast("long").alias("sr2"),
    )
    srf = F.col("sr").cast("double") / 3

    def dev(c):
        return (F.col(c) - srf) * (F.col(c) - srf)

    return s.select(
        F.col("n").alias("n_docs"),
        F.col("c1").alias("pass_len"),
        F.col("c2").alias("pass_chars"),
        F.col("c3").alias("pass_vocab"),
        F.round(
            3 * 2 * (dev("c1") + dev("c2") + dev("c3"))
            / (3 * F.col("sr") - F.col("sr2")),
            4,
        ).alias("cochran_q"),
        F.lit(2).alias("df"),
    )


@register(
    "q_fleiss_kappa",
    oracle="WITH " + _FILTER_SQL + """,
        rows_ AS (SELECT f1 + f2 + f3 AS r FROM flags),
        s AS (
          SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(r) AS BIGINT) AS sr,
                 CAST(sum(r * r) AS BIGINT) AS sr2
          FROM rows_
        ),
        k AS (
          SELECT n, sr, sr2,
                 -- per-item agreement: (r^2 + (3-r)^2 - 3) / (3*2),
                 -- averaged -> (sr2 + sum(3-r)^2 - 3n) / 6n with
                 -- sum(3-r)^2 = 9n - 6 sr + sr2
                 (CAST(sr2 AS DOUBLE) + (9 * n - 6 * sr + sr2) - 3 * n)
                   / (6.0 * n) AS p_bar,
                 (CAST(sr AS DOUBLE) / (3 * n))
                   * (CAST(sr AS DOUBLE) / (3 * n))
                 + (1 - CAST(sr AS DOUBLE) / (3 * n))
                   * (1 - CAST(sr AS DOUBLE) / (3 * n)) AS p_e
          FROM s
        )
        SELECT n AS n_docs, round(p_bar, 6) AS p_observed,
               round(p_e, 6) AS p_expected,
               round((p_bar - p_e) / (1 - p_e), 6) AS fleiss_kappa
        FROM k
    """,
    doc="Fleiss' kappa (1971) over the same three matched quality "
    "filters: chance-corrected agreement for >2 raters — the "
    "magnitude companion to q_cochran_q's significance (Q says the "
    "filters differ; kappa says how much they actually agree beyond "
    "the base rate) and the k>2 extension of q_label_agreement_kappa."
    " For binary categories every term reduces to the exact integer "
    "sums (sum r, sum r^2) from ONE scan: per-item pair-agreement "
    "averages and the chance term are closed-form 1-row float "
    "expressions.",
)
def q_fleiss_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir).filter(
        F.col("n_chars").isNotNull()
    )
    toks = word_tokens(F.col("text"))
    r = (
        (F.size(toks) >= 120).cast("int")
        + (F.col("n_chars") >= 800).cast("int")
        + (
            F.size(
                F.array_distinct(word_tokens(F.lower(F.col("text"))))
            )
            >= 25
        ).cast("int")
    )
    s = docs.select(r.alias("r")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("r").cast("long").alias("sr"),
        F.sum(F.col("r") * F.col("r")).cast("long").alias("sr2"),
    )
    n, sr, sr2 = F.col("n"), F.col("sr"), F.col("sr2")
    p_bar = (
        sr2.cast("double") + (9 * n - 6 * sr + sr2) - 3 * n
    ) / (6.0 * n)
    pr = sr.cast("double") / (3 * n)
    p_e = pr * pr + (1 - pr) * (1 - pr)
    return s.select(
        n.alias("n_docs"),
        F.round(p_bar, 6).alias("p_observed"),
        F.round(p_e, 6).alias("p_expected"),
        F.round((p_bar - p_e) / (1 - p_e), 6).alias("fleiss_kappa"),
    )


@register(
    "q_l_diversity",
    oracle="""
        WITH cls AS (
          SELECT lang, CAST(n_chars // 500 AS BIGINT) AS len_b,
                 source, CAST(count(*) AS BIGINT) AS c
          FROM documents
          WHERE lang IS NOT NULL AND n_chars IS NOT NULL
          GROUP BY 1, 2, 3
        ), kk AS (
          SELECT lang, len_b, CAST(sum(c) AS BIGINT) AS k,
                 CAST(max(c) AS BIGINT) AS top_c
          FROM cls GROUP BY 1, 2
        ), per_cls AS (
          SELECT kk.lang, kk.len_b, kk.k, kk.top_c,
                 round(exp(CAST(sum(CAST(round(
                     -(CAST(cls.c AS DOUBLE) / kk.k)
                     * ln(CAST(cls.c AS DOUBLE) / kk.k), 9)
                   AS DECIMAL(18,9))) AS DOUBLE)), 6) AS entropy_l
          FROM cls JOIN kk USING (lang, len_b)
          GROUP BY 1, 2, 3, 4
        )
        SELECT CAST(count(*) AS BIGINT) AS n_classes,
               round(min(entropy_l), 6) AS min_entropy_l,
               CAST(sum(CASE WHEN entropy_l < 2 THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_below_entropy_l2,
               CAST(sum(CASE WHEN top_c > 2 * (k - top_c) THEN 1
                        ELSE 0 END) AS BIGINT) AS n_fail_recursive_c2l2
        FROM per_cls
    """,
    doc="Entropy and recursive (c,l)-diversity audit (Machanavajjhala "
    "2007 definitions 3.1/3.2) over document quasi-identifier classes "
    "(lang, 500-char length bucket) with source as the sensitive "
    "attribute — the homogeneity-attack measures q_k_anonymity's "
    "distinct-l underestimates (a class 99% one source still counts "
    "l=2 distinct). Entropy-l = exp(H(source|class)) with per-term "
    "9dp-DECIMAL entropy sums; recursive (2,2)-diversity fails when "
    "the top source outnumbers twice the rest. Scale shape: one "
    "(QI, sensitive) keyed count, class-keyed rollup of the tiny "
    "count table, 1-row summary — no joins, no data-sized windows.",
)
def q_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = load_table(spark, "documents", sf_dir).filter(
        F.col("lang").isNotNull() & F.col("n_chars").isNotNull()
    )
    cls = docs.groupBy(
        "lang",
        F.expr("n_chars div 500").alias("len_b"),
        "source",
    ).agg(F.count(F.lit(1)).alias("c"))
    wk = W.partitionBy("lang", "len_b")
    p = F.col("c").cast("double") / F.sum("c").over(wk)
    per_cls = (
        cls.withColumn(
            "hterm", F.round(-p * F.log(p), 9).cast("decimal(18,9)")
        )
        .groupBy("lang", "len_b")
        .agg(
            F.sum("c").alias("k"),
            F.max("c").alias("top_c"),
            F.round(F.exp(F.sum("hterm").cast("double")), 6).alias(
                "entropy_l"
            ),
        )
    )
    return per_cls.agg(
        F.count(F.lit(1)).alias("n_classes"),
        F.round(F.min("entropy_l"), 6).alias("min_entropy_l"),
        F.sum(F.when(F.col("entropy_l") < 2, 1).otherwise(0)).alias(
            "n_below_entropy_l2"
        ),
        F.sum(
            F.when(
                F.col("top_c") > 2 * (F.col("k") - F.col("top_c")), 1
            ).otherwise(0)
        ).alias("n_fail_recursive_c2l2"),
    )


@register(
    "q_dunn_posthoc",
    oracle="""
        WITH base AS (
          SELECT lang AS g, CAST(n_chars AS DOUBLE) AS v
          FROM documents
          WHERE n_chars IS NOT NULL AND lang IS NOT NULL
        ), per_v AS (
          SELECT v, CAST(count(*) AS BIGINT) AS c FROM base GROUP BY v
        ), rk AS (
          SELECT v, c,
                 2 * COALESCE(sum(c) OVER (
                       ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING), 0) + c + 1 AS r2
          FROM per_v
        ), per_g AS (
          SELECT g, CAST(count(*) AS BIGINT) AS n,
                 sum(CAST(r2 AS HUGEINT)) AS rs
          FROM base JOIN rk USING (v) GROUP BY g
        ), gl AS (
          SELECT (SELECT CAST(sum(n) AS BIGINT) FROM per_g) AS nt,
                 (SELECT sum(CAST(c AS HUGEINT) * c * c - c) FROM rk)
                   AS ties
        ), pairs AS (
          SELECT a.g AS g1, b.g AS g2, a.n AS n1, b.n AS n2,
                 (CAST(a.rs AS DOUBLE) / a.n - CAST(b.rs AS DOUBLE) / b.n)
                 / (2.0 * sqrt(
                     ((CAST(nt AS DOUBLE) * (nt + 1)
                       - CAST(ties AS DOUBLE) / (nt - 1)) / 12.0)
                     * (1.0 / a.n + 1.0 / b.n))) AS zv
          FROM per_g a JOIN per_g b ON a.g < b.g, gl
        ), p AS (
          SELECT g1, g2, n1, n2, zv,
                 2.0 * __NORM_UPPER__ AS pv
          FROM pairs
        ), m AS (
          SELECT CAST(count(*) AS BIGINT) AS m FROM p
        ), ranked AS (
          SELECT g1, g2, n1, n2, zv, pv,
                 CAST(row_number() OVER (ORDER BY pv, g1, g2)
                   AS BIGINT) AS rnk, m.m
          FROM p, m
        ), thr AS (
          SELECT CAST(coalesce(max(CASE WHEN pv <= rnk * 0.05
                                        / CAST(m AS DOUBLE)
                                   THEN rnk ELSE 0 END), 0) AS BIGINT)
                   AS cutoff
          FROM ranked
        )
        SELECT r.g1, r.g2, r.n1, r.n2,
               round(r.zv, 4) AS z_score, round(r.pv, 6) AS p_value,
               r.rnk, CAST(r.rnk <= t.cutoff AS INT) AS rejected
        FROM ranked r, thr t ORDER BY r.rnk
    """.replace("__NORM_UPPER__", _NORM_UPPER.format(x="abs(zv)")),
    doc="Dunn's post-hoc pairwise rank test after Kruskal-Wallis "
    "(Dunn 1964) over doc char length across languages, with the "
    "tie-corrected variance and Benjamini-Hochberg step-up control "
    "over the k(k-1)/2 pairs — answers WHICH language pairs differ "
    "once q_kruskal_wallis's omnibus H fires. Doubled integer ranks "
    "from distinct-value counts (exact DECIMAL rank sums and tie "
    "term), one float epilogue per pair, two-sided p via the shared "
    "A&S 26.2.17 polynomial. Scale shape: ranks via range-blocked "
    "prefix sums (never a global rank window), then a k^2-bounded "
    "group self-join and tiny-partition BH windows "
    "(operators/stats.dunn_posthoc).",
)
def q_dunn_posthoc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hw_kafka_streams_spark.operators.stats import dunn_posthoc

    docs = load_table(spark, "documents", sf_dir)
    return dunn_posthoc(docs, "lang", "n_chars")


@register(
    "q_cochran_armitage",
    oracle="""
        WITH b AS (
          SELECT LEAST(n_chars // 500, 9) AS wsc,
                 CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS en
          FROM documents
          WHERE n_chars IS NOT NULL AND lang IS NOT NULL
        ), per_b AS (
          SELECT wsc, CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(en) AS BIGINT) AS r
          FROM b GROUP BY 1
        ), m AS (
          SELECT CAST(count(*) AS BIGINT) AS k,
                 CAST(sum(n) AS BIGINT) AS nt,
                 CAST(sum(r) AS BIGINT) AS rt,
                 CAST(sum(wsc * n) AS BIGINT) AS swn,
                 CAST(sum(wsc * wsc * n) AS BIGINT) AS sw2n,
                 CAST(sum(wsc * r) AS BIGINT) AS swr
          FROM per_b
        )
        SELECT k AS k_buckets, nt AS n, rt AS n_positive,
               round(CAST(swr AS DOUBLE)
                     - CAST(rt AS DOUBLE) / nt * swn, 6) AS t_stat,
               round((CAST(swr AS DOUBLE)
                      - CAST(rt AS DOUBLE) / nt * swn)
                     / sqrt((CAST(rt AS DOUBLE) / nt)
                            * (1 - CAST(rt AS DOUBLE) / nt)
                            * (CAST(sw2n AS DOUBLE)
                               - CAST(swn AS DOUBLE) * swn / nt)), 6)
                 AS z_score
        FROM m
    """,
    doc="Cochran-Armitage trend test (Armitage 1955): is the "
    "proportion of English documents monotone in the ordered length "
    "buckets (500-char bins capped at 10)? — the dose-response audit "
    "a plain chi-square independence test has no power for (it "
    "ignores bucket ORDER). T = sum w_i(r_i - n_i p) with integer "
    "scores w, exact integer moments (sum wn, sum w^2 n, sum wr), "
    "z = T/sqrt(p(1-p)(sum w^2 n - (sum wn)^2/N)) one rounded scalar. "
    "Scale shape: one bucket-keyed partial agg, a k-row rollup — no "
    "joins, no windows.",
)
def q_cochran_armitage(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir).filter(
        F.col("n_chars").isNotNull() & F.col("lang").isNotNull()
    )
    per_b = docs.groupBy(
        F.least(F.expr("n_chars div 500"), F.lit(9)).alias("wsc")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.when(F.col("lang") == "en", 1).otherwise(0)
        ).alias("r"),
    )
    m = per_b.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("n").alias("nt"),
        F.sum("r").alias("rt"),
        F.sum(F.col("wsc") * F.col("n")).alias("swn"),
        F.sum(F.col("wsc") * F.col("wsc") * F.col("n")).alias("sw2n"),
        F.sum(F.col("wsc") * F.col("r")).alias("swr"),
    )
    pbar = F.col("rt").cast("double") / F.col("nt")
    tstat = F.col("swr").cast("double") - pbar * F.col("swn")
    var = (
        pbar
        * (1 - pbar)
        * (
            F.col("sw2n").cast("double")
            - F.col("swn").cast("double") * F.col("swn") / F.col("nt")
        )
    )
    return m.select(
        F.col("k").alias("k_buckets"),
        F.col("nt").alias("n"),
        F.col("rt").alias("n_positive"),
        F.round(tstat, 6).alias("t_stat"),
        F.round(tstat / F.sqrt(var), 6).alias("z_score"),
    )


@register(
    "q_cramer_von_mises",
    oracle="""
        WITH mom AS (
          SELECT source, CAST(count(*) AS BIGINT) AS n,
                 sum(CAST(n_chars AS HUGEINT)) AS s1,
                 sum(CAST(n_chars AS HUGEINT) * n_chars) AS s2
          FROM documents WHERE n_chars IS NOT NULL GROUP BY 1
        ),
        vals AS (
          SELECT source, n_chars AS v, CAST(count(*) AS BIGINT) AS c
          FROM documents WHERE n_chars IS NOT NULL GROUP BY 1, 2
        ),
        cum AS (
          SELECT source, v, c,
                 sum(c) OVER (PARTITION BY source ORDER BY v) AS cm
          FROM vals
        ),
        z AS (
          SELECT c.source, c.c, c.cm, m.n,
                 (c.v - CAST(m.s1 AS DOUBLE) / m.n)
                 / sqrt(CAST(m.n * m.s2 - m.s1 * m.s1 AS DOUBLE)
                        / (CAST(m.n AS DOUBLE) * m.n)) AS zv
          FROM cum c JOIN mom m USING (source)
        ),
        phi AS (
          SELECT source, c, cm, n,
                 GREATEST(LEAST(CASE WHEN zv >= 0 THEN 1.0 - """
    + _NORM_UPPER.format(x="zv")
    + """
                      ELSE """
    + _NORM_UPPER.format(x="(-zv)")
    + """
                 END, 1.0 - 1e-15), 1e-15) AS ph
          FROM z
        ),
        terms AS (
          SELECT source, n,
                 CAST(round(
                   CAST(c AS DOUBLE) * ph * ph
                   - ph * CAST(cm * cm - (cm - c) * (cm - c) AS DOUBLE)
                     / n
                   + CAST((cm * (4 * CAST(cm AS HUGEINT) * cm - 1)) // 3
                          - ((cm - c) * (4 * CAST(cm - c AS HUGEINT)
                                         * (cm - c) - 1)) // 3
                       AS DOUBLE)
                     / (4.0 * CAST(n AS DOUBLE) * n), 9)
                   AS DECIMAL(38, 9)) AS t
          FROM phi
        ),
        w2 AS (
          SELECT source, CAST(min(n) AS BIGINT) AS n,
                 1.0 / (12.0 * CAST(min(n) AS DOUBLE))
                 + CAST(sum(t) AS DOUBLE) AS w
          FROM terms GROUP BY 1
        )
        SELECT source, n, round(w, 6) AS w2,
               round(w * (1.0 + 0.5 / n), 6) AS w2_star,
               CAST(w * (1.0 + 0.5 / n) > 0.126 AS INT)
                 AS reject_normal
        FROM w2 ORDER BY source
    """,
    doc="Cramer-von Mises normality test per source over doc length — "
    "the squared-distance member of the EDF-test family between "
    "q_lilliefors (sup norm) and q_anderson_darling (tail-weighted): "
    "W^2 = 1/(12n) + sum_i (F(z_(i)) - (2i-1)/(2n))^2. Grouped-count "
    "formulation with EXACT integer rank coefficients: a tied value "
    "spanning cumulative counts (cm-c, cm] contributes "
    "c*F^2 - F*(cm^2-(cm-c)^2)/n + (g(cm)-g(cm-c))/(4n^2) with "
    "g(b) = b(4b^2-1)/3 = sum of the first b odd squares — no row "
    "explosion, one partial-agged pass over DISTINCT lengths. Normal "
    "CDF via the shared A&S 26.2.17 text, population-sd z convention "
    "(same as q_anderson_darling/q_lilliefors), per-term "
    "DECIMAL(38,9) rounding. W*^2 = W^2(1+0.5/n) against Stephens' "
    "5% estimated-parameters critical value 0.126.",
)
def q_cramer_von_mises(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = load_table(spark, "documents", sf_dir).filter(
        F.col("n_chars").isNotNull()
    )
    dv = F.col("n_chars").cast("decimal(38,0)")
    mom = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(dv).alias("s1"),
        F.sum(dv * dv).alias("s2"),
    )
    vals = docs.groupBy("source", F.col("n_chars").alias("v")).agg(
        F.count(F.lit(1)).alias("c")
    )
    w = W.partitionBy("source").orderBy("v")
    cum = vals.withColumn("cm", F.sum("c").over(w))
    n = F.col("n")
    zv = (
        F.col("v") - F.col("s1").cast("double") / n
    ) / F.sqrt(
        (n.cast("decimal(38,0)") * F.col("s2") - F.col("s1") * F.col("s1"))
        .cast("double")
        / (n.cast("double") * n)
    )
    z = cum.join(F.broadcast(mom), "source").select(
        "source", "c", "cm", "n", zv.alias("zv")
    )

    def upper(x):
        t = 1.0 / (1.0 + 0.2316419 * x)
        return (F.exp(-x * x / 2.0) / 2.5066282746310002) * (
            t
            * (
                0.319381530
                + t
                * (
                    -0.356563782
                    + t
                    * (
                        1.781477937
                        + t * (-1.821255978 + t * 1.330274429)
                    )
                )
            )
        )

    ph = F.greatest(
        F.least(
            F.when(F.col("zv") >= 0, 1.0 - upper(F.col("zv"))).otherwise(
                upper(-F.col("zv"))
            ),
            F.lit(1.0 - 1e-15),
        ),
        F.lit(1e-15),
    )
    phi = z.select("source", "c", "cm", "n", ph.alias("ph"))
    cmc = F.col("cm") - F.col("c")
    a_coef = (F.col("cm") * F.col("cm") - cmc * cmc).cast("double")
    # g(b) = b(4b^2-1)/3 stays under 9.2e18 for n <= 1.3M rows/group
    # (sf1 documents is ~500k), so plain long arithmetic is exact.
    b_coef = (
        F.expr(
            "(cm * (4 * cm * cm - 1)) div 3"
            " - ((cm - c) * (4 * (cm - c) * (cm - c) - 1)) div 3"
        )
    ).cast("double")
    term = F.round(
        F.col("c").cast("double") * F.col("ph") * F.col("ph")
        - F.col("ph") * a_coef / F.col("n")
        + b_coef / (4.0 * F.col("n").cast("double") * F.col("n")),
        9,
    ).cast("decimal(38,9)")
    w2 = phi.select("source", "n", term.alias("t")).groupBy("source").agg(
        F.min("n").cast("long").alias("n"),
        (
            1.0 / (12.0 * F.min("n").cast("double"))
            + F.sum("t").cast("double")
        ).alias("w"),
    )
    nn = F.col("n").cast("double")
    star = F.col("w") * (1.0 + 0.5 / nn)
    return w2.select(
        "source",
        "n",
        F.round(F.col("w"), 6).alias("w2"),
        F.round(star, 6).alias("w2_star"),
        (star > 0.126).cast("int").alias("reject_normal"),
    ).orderBy("source")


@register(
    "q_wilcoxon_signed_rank",
    oracle="""
        WITH per_u AS (
          SELECT user_id,
                 CAST(sum(CASE WHEN event_type = 'click'
                          THEN 1 ELSE 0 END) AS BIGINT)
                 - CAST(sum(CASE WHEN event_type = 'view'
                            THEN 1 ELSE 0 END) AS BIGINT) AS d
          FROM events WHERE event_type IN ('click', 'view')
          GROUP BY 1
        ),
        nz AS (SELECT d, abs(d) AS av FROM per_u WHERE d <> 0),
        per_v AS (
          SELECT av, CAST(count(*) AS BIGINT) AS c,
                 CAST(sum(CASE WHEN d > 0 THEN 1 ELSE 0 END)
                   AS BIGINT) AS cp
          FROM nz GROUP BY 1
        ),
        rk AS (
          SELECT av, c, cp,
                 2 * COALESCE(sum(c) OVER (
                       ORDER BY av ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING), 0) + c + 1 AS r2
          FROM per_v
        ),
        m AS (
          SELECT CAST(sum(c) AS BIGINT) AS n,
                 sum(CAST(cp AS HUGEINT) * r2) AS w2p,
                 sum(CAST(c AS HUGEINT) * c * c - c) AS ties
          FROM rk
        )
        SELECT n AS n_pairs,
               round(CAST(w2p AS DOUBLE) / 2, 2) AS w_plus,
               round((CAST(w2p AS DOUBLE) / 2
                      - CAST(n AS DOUBLE) * (n + 1) / 4)
                     / sqrt(CAST(n AS DOUBLE) * (n + 1) * (2 * n + 1)
                            / 24.0
                            - CAST(ties AS DOUBLE) / 48.0), 6)
                 AS z_score
        FROM m
    """,
    doc="Wilcoxon signed-rank test of the per-user click-minus-view "
    "count difference — the PAIRED nonparametric partner to "
    "q_mann_whitney (two independent samples) and q_sign_test (signs "
    "only; this also uses magnitudes). Zero differences dropped "
    "(Wilcoxon convention), |d| ranked with doubled average ranks "
    "over DISTINCT magnitudes (the exact-integer spearman trick), "
    "W+ = sum of positive-side ranks; tie-corrected normal z = "
    "(W+ - n(n+1)/4)/sqrt(n(n+1)(2n+1)/24 - sum(t^3-t)/48). "
    "Everything before z is exact integer arithmetic. Scale shape: "
    "one per-user keyed agg, then ranks via distinct-magnitude "
    "counts + prefix sums — never a global per-row rank window.",
)
def q_wilcoxon_signed_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    e = load_table(spark, "events", sf_dir).filter(
        F.col("event_type").isin("click", "view")
    )
    per_u = e.groupBy("user_id").agg(
        (
            F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
            - F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
        )
        .cast("long")
        .alias("d")
    )
    nz = per_u.filter(F.col("d") != 0).select(
        "d", F.abs(F.col("d")).alias("av")
    )
    per_v = nz.groupBy("av").agg(
        F.count(F.lit(1)).cast("long").alias("c"),
        F.sum(F.when(F.col("d") > 0, 1).otherwise(0))
        .cast("long")
        .alias("cp"),
    )
    w = W.partitionBy(tiny_table_partition("av")).orderBy("av")
    rk = per_v.withColumn(
        "r2",
        2
        * F.coalesce(
            F.sum("c").over(w.rowsBetween(W.unboundedPreceding, -1)),
            F.lit(0),
        )
        + F.col("c")
        + 1,
    )
    cdec = F.col("c").cast("decimal(38,0)")
    m = rk.agg(
        F.sum("c").cast("long").alias("n"),
        F.sum(F.col("cp").cast("decimal(38,0)") * F.col("r2")).alias(
            "w2p"
        ),
        F.sum(cdec * F.col("c") * F.col("c") - F.col("c")).alias("ties"),
    )
    nd = F.col("n").cast("double")
    wp = F.col("w2p").cast("double") / 2
    return m.select(
        F.col("n").alias("n_pairs"),
        F.round(wp, 2).alias("w_plus"),
        F.round(
            (wp - nd * (F.col("n") + 1) / 4)
            / F.sqrt(
                nd * (F.col("n") + 1) * (2 * F.col("n") + 1) / 24.0
                - F.col("ties").cast("double") / 48.0
            ),
            6,
        ).alias("z_score"),
    )


@register(
    "q_krippendorff_alpha",
    oracle="""
        WITH span AS (
          SELECT min(CAST(floor(epoch(ts)) AS BIGINT)) AS e0,
                 max(CAST(floor(epoch(ts)) AS BIGINT)) AS e1
          FROM events
        ),
        lab AS (
          SELECT e.user_id AS u,
                 LEAST(2, ((CAST(floor(epoch(e.ts)) AS BIGINT) - s.e0)
                           * 3) // (s.e1 - s.e0 + 1)) AS c,
                 e.event_type AS v, CAST(count(*) AS BIGINT) AS cnt
          FROM events e CROSS JOIN span s
          GROUP BY 1, 2, 3
        ),
        uv AS (
          SELECT u, c, v FROM lab
          QUALIFY row_number() OVER (PARTITION BY u, c
                                     ORDER BY cnt DESC, v) = 1
        ),
        nuv AS (
          SELECT u, v, CAST(count(*) AS BIGINT) AS k FROM uv
          GROUP BY 1, 2
        ),
        mu AS (
          SELECT u, CAST(sum(k) AS BIGINT) AS m FROM nuv GROUP BY 1
        ),
        du AS (
          SELECT n.u,
                 CAST(CAST(m.m AS DECIMAL(18,1))
                      - CAST(sum(n.k * (n.k - 1)) AS DECIMAL(18,1))
                        / (m.m - 1) AS DECIMAL(18,1)) AS d
          FROM nuv n JOIN mu m USING (u)
          WHERE m.m >= 2
          GROUP BY n.u, m.m
        ),
        marg AS (
          SELECT n.v, CAST(sum(n.k) AS BIGINT) AS nv
          FROM nuv n JOIN mu m USING (u)
          WHERE m.m >= 2
          GROUP BY 1
        ),
        tot AS (
          SELECT CAST(sum(nv) AS BIGINT) AS n,
                 CAST(sum(nv * nv) AS BIGINT) AS sq,
                 CAST(count(*) AS BIGINT) AS n_cat
          FROM marg
        ),
        dd AS (
          SELECT CAST(count(*) AS BIGINT) AS n_units,
                 CAST(sum(d) AS DOUBLE) AS do_sum
          FROM du
        )
        SELECT d.n_units, t.n AS n_pairable, t.n_cat AS n_categories,
               round(d.do_sum / t.n, 6) AS do_rate,
               round(CAST(t.n * t.n - t.sq AS DOUBLE)
                     / (CAST(t.n AS DOUBLE) * (t.n - 1)), 6) AS de_rate,
               round(1.0 - (t.n - 1) * d.do_sum
                           / CAST(t.n * t.n - t.sq AS DOUBLE), 6)
                 AS kripp_alpha
        FROM dd d CROSS JOIN tot t
    """,
    doc="Krippendorff's alpha (nominal) treating each third of the "
    "event-stream time span as an independent 'coder' that labels "
    "every active user with their dominant event_type in that "
    "window (ties to the lexicographically smallest type) — the "
    "agreement coefficient that, unlike q_fleiss_kappa/q_cochran_q, "
    "HANDLES MISSING CELLS (users inactive in a window simply have "
    "fewer pairable ratings; units with m < 2 drop out), which is "
    "the real shape of multi-annotator training-data labels. "
    "Observed disagreement per unit d_u = m_u - sum_v n_uv(n_uv-1)/"
    "(m_u-1) stays EXACT decimal (m_u - 1 is 1 or 2 with 3 coders, "
    "so terms are halves); expected disagreement from exact marginal "
    "integers: alpha = 1 - (n-1)*sum(d_u)/(n^2 - sum n_v^2). Scale "
    "shape: two keyed aggs + one QUALIFY mode per (user, window); "
    "no global window, categories bounded by the event-type vocab.",
)
def q_krippendorff_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    e = load_table(spark, "events", sf_dir)
    es = F.expr("CAST(floor(CAST(ts AS DOUBLE)) AS BIGINT)")
    span = e.agg(F.min(es).alias("e0"), F.max(es).alias("e1"))
    lab = (
        e.crossJoin(F.broadcast(span))
        .groupBy(
            F.col("user_id").alias("u"),
            F.least(
                F.lit(2),
                F.expr(
                    "((CAST(floor(CAST(ts AS DOUBLE)) AS BIGINT) - e0)"
                    " * 3) div (e1 - e0 + 1)"
                ),
            ).alias("c"),
            F.col("event_type").alias("v"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    wuc = W.partitionBy("u", "c").orderBy(F.desc("cnt"), F.asc("v"))
    uv = (
        lab.withColumn("_rn", F.row_number().over(wuc))
        .filter(F.col("_rn") == 1)
        .select("u", "c", "v")
    )
    nuv = uv.groupBy("u", "v").agg(F.count(F.lit(1)).cast("long").alias("k"))
    mu = nuv.groupBy("u").agg(F.sum("k").cast("long").alias("m"))
    du = (
        nuv.join(mu, "u")
        .filter(F.col("m") >= 2)
        .groupBy("u", "m")
        .agg(
            (
                F.col("m").cast("decimal(18,1)")
                - F.sum(F.col("k") * (F.col("k") - 1)).cast("decimal(18,1)")
                / (F.col("m") - 1)
            )
            .cast("decimal(18,1)")
            .alias("d")
        )
    )
    marg = (
        nuv.join(mu, "u")
        .filter(F.col("m") >= 2)
        .groupBy("v")
        .agg(F.sum("k").cast("long").alias("nv"))
    )
    tot = marg.agg(
        F.sum("nv").cast("long").alias("n"),
        F.sum(F.col("nv") * F.col("nv")).cast("long").alias("sq"),
        F.count(F.lit(1)).cast("long").alias("n_cat"),
    )
    dd = du.agg(
        F.count(F.lit(1)).cast("long").alias("n_units"),
        F.sum("d").cast("double").alias("do_sum"),
    )
    expd = (F.col("n") * F.col("n") - F.col("sq")).cast("double")
    return (
        dd.crossJoin(F.broadcast(tot))
        .select(
            "n_units",
            F.col("n").alias("n_pairable"),
            F.col("n_cat").alias("n_categories"),
            F.round(F.col("do_sum") / F.col("n"), 6).alias("do_rate"),
            F.round(
                expd / (F.col("n").cast("double") * (F.col("n") - 1)), 6
            ).alias("de_rate"),
            F.round(
                1.0 - (F.col("n") - 1) * F.col("do_sum") / expd, 6
            ).alias("kripp_alpha"),
        )
    )


@register(
    "q_concentration_indices",
    oracle="""
        WITH per_s AS (
          SELECT source, sum(CAST(n_chars AS HUGEINT)) AS x
          FROM documents WHERE n_chars IS NOT NULL GROUP BY 1
        ),
        tot AS (
          SELECT CAST(count(*) AS BIGINT) AS k,
                 CAST(sum(x) AS HUGEINT) AS s
          FROM per_s
        ),
        terms AS (
          SELECT t.k, t.s,
                 CAST(round(CAST(p.x AS DOUBLE) / t.s
                            * (CAST(p.x AS DOUBLE) / t.s), 9)
                   AS DECIMAL(18,9)) AS hhi_t,
                 CAST(round(CAST(p.x AS DOUBLE) / t.s
                            * ln(t.k * (CAST(p.x AS DOUBLE) / t.s)), 9)
                   AS DECIMAL(18,9)) AS theil_t,
                 CAST(round(ln(CAST(p.x AS DOUBLE) / t.s), 9)
                   AS DECIMAL(18,9)) AS lng_t
          FROM per_s p CROSS JOIN tot t
        )
        SELECT CAST(min(k) AS BIGINT) AS k_sources,
               round(CAST(sum(hhi_t) AS DOUBLE), 6) AS hhi,
               round((CAST(sum(hhi_t) AS DOUBLE) - 1.0 / min(k))
                     / (1.0 - 1.0 / min(k)), 6) AS hhi_norm,
               round(CAST(sum(theil_t) AS DOUBLE), 6) AS theil,
               round(1.0 - min(k)
                           * exp(CAST(sum(lng_t) AS DOUBLE) / min(k)),
                     6) AS atkinson_1
        FROM terms
    """,
    doc="Corpus-source concentration battery over the per-source "
    "character mass: Herfindahl-Hirschman index sum(s_i^2) (+ the "
    "k-normalized variant), Theil entropy index sum(s_i ln(k s_i)), "
    "and Atkinson(eps=1) = 1 - geomean/mean — the three standard "
    "inequality measures beside q_gini_coefficient (Lorenz-based) "
    "and q_source_lang_entropy (Shannon): HHI weights the HEAD "
    "(dedup/mixture dominance risk), Theil decomposes, Atkinson "
    "prices the TAIL — together the data-mixture audit a 100 TB "
    "corpus card reports per shard. One keyed agg to the k-row "
    "source table; every term 9dp-DECIMAL-rounded before the k-row "
    "sum, double epilogue only for the final ratios.",
)
def q_concentration_indices(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir).filter(
        F.col("n_chars").isNotNull()
    )
    per_s = docs.groupBy("source").agg(
        F.sum(F.col("n_chars").cast("decimal(38,0)")).alias("x")
    )
    tot = per_s.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("x").alias("s"),
    )
    share = F.col("x").cast("double") / F.col("s").cast("double")
    terms = per_s.crossJoin(F.broadcast(tot)).select(
        "k",
        F.round(share * share, 9).cast("decimal(18,9)").alias("hhi_t"),
        F.round(share * F.log(F.col("k") * share), 9)
        .cast("decimal(18,9)")
        .alias("theil_t"),
        F.round(F.log(share), 9).cast("decimal(18,9)").alias("lng_t"),
    )
    k = F.min("k")
    return terms.agg(
        k.cast("long").alias("k_sources"),
        F.round(F.sum("hhi_t").cast("double"), 6).alias("hhi"),
        F.round(
            (F.sum("hhi_t").cast("double") - 1.0 / k) / (1.0 - 1.0 / k), 6
        ).alias("hhi_norm"),
        F.round(F.sum("theil_t").cast("double"), 6).alias("theil"),
        F.round(
            1.0 - k * F.exp(F.sum("lng_t").cast("double") / k), 6
        ).alias("atkinson_1"),
    )


@register(
    "q_cliffs_delta",
    oracle="""
        WITH base AS (
          SELECT lang = 'en' AS is_a, CAST(n_chars AS DOUBLE) AS v
          FROM documents
          WHERE lang IN ('en', 'zh') AND n_chars IS NOT NULL
        ), per_v AS (
          SELECT v,
                 sum(CASE WHEN is_a THEN 1 ELSE 0 END) AS ca,
                 sum(CASE WHEN is_a THEN 0 ELSE 1 END) AS cb
          FROM base GROUP BY v
        ), rk AS (
          SELECT ca, cb, ca + cb AS c,
                 2 * COALESCE(sum(ca + cb) OVER (
                       ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING), 0)
                 + (ca + cb) + 1 AS r2
          FROM per_v
        ), m AS (
          SELECT CAST(sum(ca) AS BIGINT) AS n1,
                 CAST(sum(cb) AS BIGINT) AS n2,
                 sum(CAST(ca AS HUGEINT) * r2) AS r1d
          FROM rk
        ), u AS (
          SELECT n1, n2,
                 (CAST(r1d AS DOUBLE)
                  - CAST(n1 AS DOUBLE) * (n1 + 1)) / 2 AS u_a
          FROM m
        )
        SELECT n1 AS n_a, n2 AS n_b,
               round((2 * u_a - CAST(n1 AS DOUBLE) * n2)
                     / (CAST(n1 AS DOUBLE) * n2), 6) AS cliffs_delta,
               CASE WHEN abs((2 * u_a - CAST(n1 AS DOUBLE) * n2)
                             / (CAST(n1 AS DOUBLE) * n2)) < 0.147
                    THEN 'negligible'
                    WHEN abs((2 * u_a - CAST(n1 AS DOUBLE) * n2)
                             / (CAST(n1 AS DOUBLE) * n2)) < 0.33
                    THEN 'small'
                    WHEN abs((2 * u_a - CAST(n1 AS DOUBLE) * n2)
                             / (CAST(n1 AS DOUBLE) * n2)) < 0.474
                    THEN 'medium' ELSE 'large' END AS magnitude
        FROM u
    """,
    doc="Cliff's delta effect size of doc char length, English vs "
    "Chinese: delta = (#(x>y) - #(x<y))/(n1*n2) = 2U/(n1*n2) - 1 — "
    "the nonparametric effect-size companion to q_mann_whitney's "
    "SIGNIFICANCE z (a huge corpus makes trivial differences "
    "'significant'; delta says whether they MATTER), with Romano "
    "2006's negligible/small/medium/large banding. Exact: U comes "
    "from the doubled-average-rank integer machinery (ties get half "
    "credit on both engines), so delta is an exact rational rounded "
    "once. Scale shape identical to q_mann_whitney: distinct-value "
    "counts + block prefix sums, never a global rank window.",
)
def q_cliffs_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hw_kafka_streams_spark.operators.stats import mann_whitney_u

    docs = load_table(spark, "documents", sf_dir)
    mw = mann_whitney_u(docs, "lang", "n_chars", "en", "zh")
    delta = (2 * F.col("u_a") - F.col("n_a").cast("double") * F.col("n_b")) / (
        F.col("n_a").cast("double") * F.col("n_b")
    )
    return mw.select(
        "n_a",
        "n_b",
        F.round(delta, 6).alias("cliffs_delta"),
        F.when(F.abs(delta) < 0.147, "negligible")
        .when(F.abs(delta) < 0.33, "small")
        .when(F.abs(delta) < 0.474, "medium")
        .otherwise("large")
        .alias("magnitude"),
    )


@register(
    "q_mood_median",
    oracle="""
        WITH base AS (
          SELECT lang AS g, CAST(n_chars AS DOUBLE) AS v
          FROM documents
          WHERE n_chars IS NOT NULL AND lang IS NOT NULL
        ), med AS (
          SELECT quantile_cont(v, 0.5) AS gm FROM base
        ), per_g AS (
          SELECT g,
                 CAST(sum(CASE WHEN v > m.gm THEN 1 ELSE 0 END)
                   AS BIGINT) AS above,
                 CAST(sum(CASE WHEN v > m.gm THEN 0 ELSE 1 END)
                   AS BIGINT) AS below
          FROM base CROSS JOIN med m GROUP BY 1
        ), tot AS (
          SELECT CAST(count(*) AS BIGINT) AS k,
                 CAST(sum(above) AS BIGINT) AS ta,
                 CAST(sum(below) AS BIGINT) AS tb
          FROM per_g
        ), cells AS (
          SELECT t.k, t.ta + t.tb AS n,
                 CAST(round(
                   (p.above - CAST(t.ta AS DOUBLE) * (p.above + p.below)
                              / (t.ta + t.tb))
                   * (p.above - CAST(t.ta AS DOUBLE) * (p.above + p.below)
                                / (t.ta + t.tb))
                   / (CAST(t.ta AS DOUBLE) * (p.above + p.below)
                      / (t.ta + t.tb))
                   + (p.below - CAST(t.tb AS DOUBLE) * (p.above + p.below)
                                / (t.ta + t.tb))
                     * (p.below - CAST(t.tb AS DOUBLE) * (p.above + p.below)
                                  / (t.ta + t.tb))
                     / (CAST(t.tb AS DOUBLE) * (p.above + p.below)
                        / (t.ta + t.tb)), 9) AS DECIMAL(18,9)) AS x2
          FROM per_g p CROSS JOIN tot t
        )
        SELECT CAST(min(k) AS BIGINT) AS k_groups,
               CAST(min(n) AS BIGINT) AS n,
               round(CAST(sum(x2) AS DOUBLE), 6) AS chi2,
               CAST(min(k) - 1 AS BIGINT) AS df,
               CAST(CAST(sum(x2) AS DOUBLE) > 9.4877 AS INT)
                 AS reject_equal_medians
        FROM cells
    """,
    doc="Mood's median test of doc char length across languages: "
    "2 x k contingency chi2 of above-vs-at-or-below the POOLED "
    "median — the maximally robust (if low-power) k-group location "
    "test beside q_kruskal_wallis (KW uses full rank information; "
    "Mood's only the median split, so one wild source can't move "
    "it). Grand median via the proven F.percentile == quantile_cont "
    "recipe; cells are exact integers, per-group chi2 terms "
    "9dp-DECIMAL-rounded before the k-row sum; reject vs chi2(4) "
    "5% = 9.4877. One agg for the median, one keyed agg for the "
    "cells — no window, no sort.",
)
def q_mood_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir).filter(
        F.col("n_chars").isNotNull() & F.col("lang").isNotNull()
    )
    base = docs.select(
        F.col("lang").alias("g"), F.col("n_chars").cast("double").alias("v")
    )
    med = base.agg(F.percentile("v", F.lit(0.5)).alias("gm"))
    per_g = (
        base.crossJoin(F.broadcast(med))
        .groupBy("g")
        .agg(
            F.sum(F.when(F.col("v") > F.col("gm"), 1).otherwise(0))
            .cast("long")
            .alias("above"),
            F.sum(F.when(F.col("v") > F.col("gm"), 0).otherwise(1))
            .cast("long")
            .alias("below"),
        )
    )
    tot = per_g.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("above").cast("long").alias("ta"),
        F.sum("below").cast("long").alias("tb"),
    )
    rowsum = (F.col("above") + F.col("below")).cast("double")
    ea = F.col("ta").cast("double") * (F.col("above") + F.col("below")) / (
        F.col("ta") + F.col("tb")
    )
    eb = F.col("tb").cast("double") * (F.col("above") + F.col("below")) / (
        F.col("ta") + F.col("tb")
    )
    x2 = F.round(
        (F.col("above") - ea) * (F.col("above") - ea) / ea
        + (F.col("below") - eb) * (F.col("below") - eb) / eb,
        9,
    ).cast("decimal(18,9)")
    cells = per_g.crossJoin(F.broadcast(tot)).select(
        "k", (F.col("ta") + F.col("tb")).alias("n"), x2.alias("x2")
    )
    return cells.agg(
        F.min("k").cast("long").alias("k_groups"),
        F.min("n").cast("long").alias("n"),
        F.round(F.sum("x2").cast("double"), 6).alias("chi2"),
        (F.min("k") - 1).cast("long").alias("df"),
        (F.sum("x2").cast("double") > 9.4877)
        .cast("int")
        .alias("reject_equal_medians"),
    )


@register(
    "q_gwet_ac1",
    oracle="""
        WITH span AS (
          SELECT min(CAST(floor(epoch(ts)) AS BIGINT)) AS e0,
                 max(CAST(floor(epoch(ts)) AS BIGINT)) AS e1
          FROM events
        ),
        lab AS (
          SELECT e.user_id AS u,
                 LEAST(2, ((CAST(floor(epoch(e.ts)) AS BIGINT) - s.e0)
                           * 3) // (s.e1 - s.e0 + 1)) AS c,
                 e.event_type AS v, CAST(count(*) AS BIGINT) AS cnt
          FROM events e CROSS JOIN span s
          GROUP BY 1, 2, 3
        ),
        uv AS (
          SELECT u, c, v FROM lab
          QUALIFY row_number() OVER (PARTITION BY u, c
                                     ORDER BY cnt DESC, v) = 1
        ),
        nuv AS (
          SELECT u, v, CAST(count(*) AS BIGINT) AS k FROM uv
          GROUP BY 1, 2
        ),
        mu AS (
          SELECT u, CAST(sum(k) AS BIGINT) AS m FROM nuv GROUP BY 1
        ),
        kept AS (
          SELECT n.u, n.v, n.k, m.m FROM nuv n JOIN mu m USING (u)
          WHERE m.m >= 2
        ),
        po_u AS (
          SELECT u,
                 CAST(round(CAST(sum(k * (k - 1)) AS DOUBLE)
                            / (min(m) * (min(m) - 1)), 9)
                   AS DECIMAL(18,9)) AS agree
          FROM kept GROUP BY u
        ),
        pi_v AS (
          SELECT v,
                 sum(CAST(round(CAST(k AS DOUBLE) / m, 9)
                       AS DECIMAL(18,9))) AS sh
          FROM kept GROUP BY v
        ),
        units AS (SELECT CAST(count(*) AS BIGINT) AS nu FROM po_u),
        cats AS (SELECT CAST(count(*) AS BIGINT) AS kc FROM pi_v),
        agg AS (
          SELECT (SELECT CAST(sum(agree) AS DOUBLE) FROM po_u)
                   / u.nu AS po,
                 (SELECT sum(CAST(round(
                      CAST(sh AS DOUBLE) / u.nu
                      * (1.0 - CAST(sh AS DOUBLE) / u.nu), 9)
                    AS DECIMAL(18,9))) FROM pi_v) AS pes,
                 u.nu, c.kc
          FROM units u CROSS JOIN cats c
        )
        SELECT nu AS n_units, kc AS n_categories,
               round(po, 6) AS po,
               round(CAST(pes AS DOUBLE) / (kc - 1), 6) AS pe_gamma,
               round((po - CAST(pes AS DOUBLE) / (kc - 1))
                     / (1.0 - CAST(pes AS DOUBLE) / (kc - 1)), 6)
                 AS gwet_ac1
        FROM agg
    """,
    doc="Gwet's AC1 agreement coefficient over the same three "
    "time-window 'coders' as q_krippendorff_alpha: observed "
    "agreement po = mean over units of within-unit rating-pair "
    "agreement, chance term pe = sum_v pi_v(1-pi_v)/(K-1) — Gwet "
    "2008's fix for the kappa PREVALENCE PARADOX (when one category "
    "dominates, pi-based chance agreement saturates and "
    "kappa/Krippendorff collapse toward 0 despite near-perfect raw "
    "agreement; AC1's complement-weighted chance term does not). "
    "Missing ratings handled like Krippendorff: units with m < 2 "
    "drop, per-unit denominators m(m-1) in {2, 6} keep terms exact "
    "ninths at worst, every fractional term 9dp-DECIMAL-rounded "
    "before its sum. Same two keyed aggs + QUALIFY mode shape.",
)
def q_gwet_ac1(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    e = load_table(spark, "events", sf_dir)
    es = F.expr("CAST(floor(CAST(ts AS DOUBLE)) AS BIGINT)")
    span = e.agg(F.min(es).alias("e0"), F.max(es).alias("e1"))
    lab = (
        e.crossJoin(F.broadcast(span))
        .groupBy(
            F.col("user_id").alias("u"),
            F.least(
                F.lit(2),
                F.expr(
                    "((CAST(floor(CAST(ts AS DOUBLE)) AS BIGINT) - e0)"
                    " * 3) div (e1 - e0 + 1)"
                ),
            ).alias("c"),
            F.col("event_type").alias("v"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    wuc = W.partitionBy("u", "c").orderBy(F.desc("cnt"), F.asc("v"))
    uv = (
        lab.withColumn("_rn", F.row_number().over(wuc))
        .filter(F.col("_rn") == 1)
        .select("u", "c", "v")
    )
    nuv = uv.groupBy("u", "v").agg(F.count(F.lit(1)).cast("long").alias("k"))
    mu = nuv.groupBy("u").agg(F.sum("k").cast("long").alias("m"))
    kept = nuv.join(mu, "u").filter(F.col("m") >= 2)
    po_u = kept.groupBy("u").agg(
        F.round(
            F.sum(F.col("k") * (F.col("k") - 1)).cast("double")
            / (F.min("m") * (F.min("m") - 1)),
            9,
        )
        .cast("decimal(18,9)")
        .alias("agree")
    )
    pi_v = kept.groupBy("v").agg(
        F.sum(
            F.round(F.col("k").cast("double") / F.col("m"), 9).cast(
                "decimal(18,9)"
            )
        ).alias("sh")
    )
    units = po_u.agg(
        F.count(F.lit(1)).cast("long").alias("nu"),
        F.sum("agree").cast("double").alias("agree_sum"),
    )
    pes = (
        pi_v.crossJoin(F.broadcast(units))
        .agg(
            F.count(F.lit(1)).cast("long").alias("kc"),
            F.sum(
                F.round(
                    F.col("sh").cast("double")
                    / F.col("nu")
                    * (1.0 - F.col("sh").cast("double") / F.col("nu")),
                    9,
                ).cast("decimal(18,9)")
            ).alias("pes"),
        )
    )
    po = F.col("agree_sum") / F.col("nu")
    pe = F.col("pes").cast("double") / (F.col("kc") - 1)
    return (
        units.crossJoin(F.broadcast(pes))
        .select(
            F.col("nu").alias("n_units"),
            F.col("kc").alias("n_categories"),
            F.round(po, 6).alias("po"),
            F.round(pe, 6).alias("pe_gamma"),
            F.round((po - pe) / (1.0 - pe), 6).alias("gwet_ac1"),
        )
    )
