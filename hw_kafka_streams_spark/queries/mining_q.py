"""Round-5 corpus-mining / data-selection queries: bloom-accelerated
incremental dedup, DSIR importance weighting, bigram-LM scoring,
character entropy, PMI collocations, product-quantization ANN.

Oracle policy unchanged: exact-arithmetic kernels get full DuckDB
value oracles (md5-twin hashing, DECIMAL-summed float contributions);
approximate-by-construction kernels (PQ) get invariant-contract
oracles (data anchors + recall-vs-brute-force booleans), with the
exact semantics pinned by unit tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hw_kafka_streams_spark.operators import text as T
from hw_kafka_streams_spark.operators.bpe import bpe_apply_oracle_sql, bpe_oracle_sql
from hw_kafka_streams_spark.queries import register
from hw_kafka_streams_spark.sources.catalog import load_table
from hw_kafka_streams_spark.cache import managed_persist

_FP = "md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))))"


@register(
    "q_bloom_prune_dedup",
    oracle=f"""
        WITH f AS (
          SELECT doc_id, {_FP} AS fp FROM documents
        )
        SELECT c.doc_id, c.fp
        FROM f c
        WHERE c.doc_id % 3 <> 0
          AND NOT EXISTS (
            SELECT 1 FROM f r WHERE r.doc_id % 3 = 0 AND r.fp = c.fp
          )
        ORDER BY c.doc_id
    """,
    doc="Incremental-corpus dedup via bloom-accelerated exact anti "
    "join (operators/bloom.py): historical fingerprints (doc_id%3=0) "
    "build a bit_or-aggregated bitmap; the increment probes it with a "
    "zero-shuffle getbit literal-array map; bloom misses pass through "
    "exactly (no false negatives), bloom hits are re-verified by a "
    "real LEFT ANTI join. Result is provably identical to the plain "
    "anti join — the NOT EXISTS oracle value-hashes the whole path.",
)
def q_bloom_prune_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hw_kafka_streams_spark.operators.bloom import bloom_anti_join
    from hw_kafka_streams_spark.operators.text import fingerprint

    docs = load_table(spark, "documents", sf_dir).select(
        "doc_id", fingerprint("text").alias("fp")
    )
    ref = docs.filter(F.col("doc_id") % 3 == 0)
    cand = docs.filter(F.col("doc_id") % 3 != 0)
    return bloom_anti_join(cand, ref, "fp").orderBy("doc_id")


@register(
    "q_dsir_weights",
    oracle="""
        WITH toks AS (
          SELECT doc_id, lang = 'en' AS is_target,
                 list_filter(string_split_regex(trim(text), '\\s+'),
                             t -> t <> '') AS t
          FROM documents
        ), fb AS (
          SELECT doc_id, is_target,
                 ('0x' || substring(md5(f), 1, 15))::BIGINT % 4096 AS b
          FROM (
            SELECT doc_id, is_target,
                   unnest(list_concat(
                     t, [t[i] || ' ' || t[i+1] FOR i IN range(1, len(t))]
                   )) AS f
            FROM toks
          )
        ), bc AS (
          SELECT b, sum(CASE WHEN is_target THEN 1 ELSE 0 END) AS ct,
                    sum(CASE WHEN is_target THEN 0 ELSE 1 END) AS cr
          FROM fb GROUP BY b
        ), tot AS (SELECT CAST(sum(ct) AS BIGINT) AS nt,
                          CAST(sum(cr) AS BIGINT) AS nr FROM bc),
        lr AS (
          SELECT b, CAST(round(ln(((ct + 1.0) / (nt + 4096))
                               / ((cr + 1.0) / (nr + 4096))), 6)
                         AS DECIMAL(18,6)) AS lr
          FROM bc, tot
        ), tf AS (
          SELECT doc_id, is_target, b, count(*) AS tf
          FROM fb GROUP BY 1, 2, 3
        )
        SELECT tf.doc_id, tf.is_target,
               CAST(sum(tf.tf) AS BIGINT) AS n_feats,
               round(CAST(sum(tf.tf * lr.lr) AS DOUBLE), 6) AS dsir_logweight
        FROM tf JOIN lr USING (b)
        GROUP BY 1, 2 ORDER BY 1
    """,
    doc="DSIR importance resampling weights (Xie et al. 2023, "
    "operators/importance.py): hashed unigram+bigram features (md5 "
    "DuckDB-twin buckets, dim=4096), target = lang='en', add-one "
    "smoothed log-likelihood ratios DECIMAL-summed per doc. Fixed-dim "
    "model => fit is one <=dim-row aggregation at any corpus size.",
)
def q_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hw_kafka_streams_spark.operators.importance import dsir_logweights

    docs = load_table(spark, "documents", sf_dir)
    return dsir_logweights(
        docs, F.col("lang") == "en", dim=4096, hash_mode="md5"
    ).orderBy("doc_id")


@register(
    "q_bigram_lm_score",
    oracle="""
        WITH toks AS (
          SELECT doc_id,
                 list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                             t -> t <> '') AS t
          FROM documents
        ), bg AS (
          SELECT doc_id,
                 unnest([struct_pack(w1 := t[i], w2 := t[i+1])
                         FOR i IN range(1, len(t))], recursive := true)
          FROM toks
        ), tfb AS (
          SELECT doc_id, w1, w2, count(*) AS tf FROM bg GROUP BY 1, 2, 3
        ), c2 AS (
          SELECT w1, w2, CAST(sum(tf) AS BIGINT) AS c2 FROM tfb GROUP BY 1, 2
        ), ctx AS (
          SELECT w1, CAST(sum(c2) AS BIGINT) AS ctx FROM c2 GROUP BY 1
        ), vocab AS (
          SELECT count(DISTINCT tok) AS v
          FROM (SELECT unnest(t) AS tok FROM toks)
        ), contrib AS (
          SELECT tfb.doc_id, tfb.tf,
                 tfb.tf * CAST(round(ln((c2.c2 + 1.0) / (ctx.ctx + vocab.v)),
                                     6) AS DECIMAL(18,6)) AS s
          FROM tfb JOIN c2 USING (w1, w2) JOIN ctx USING (w1), vocab
        )
        SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_bigrams,
               round(CAST(sum(s) AS DOUBLE) / sum(tf), 6) AS avg_ln_p
        FROM contrib GROUP BY 1 ORDER BY 1
    """,
    doc="Per-doc bigram-LM quality score (operators/text.py "
    "bigram_logprob_scores): add-one smoothed p(w2|w1) from the "
    "corpus's own counts; context-aware perplexity stand-in. Bigrams "
    "from array slice/zip_with (no window); all counts exact ints; "
    "ln contributions DECIMAL(18,6)-summed (reducer-order-proof).",
)
def q_bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    return T.bigram_logprob_scores(docs).orderBy("doc_id")


@register(
    "q_char_entropy",
    oracle="""
        WITH cc AS (
          SELECT doc_id, ch, count(*) AS cnt
          FROM (SELECT doc_id, unnest(string_split(text, '')) AS ch
                FROM documents)
          WHERE ch <> ''
          GROUP BY 1, 2
        ), n AS (
          SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_chars_counted,
                 count(*) AS distinct_chars
          FROM cc GROUP BY 1
        )
        SELECT cc.doc_id, n.n_chars_counted, n.distinct_chars,
               round(CAST(sum(CAST(round(-(cnt / n.n_chars_counted)
                                         * ln(cnt / n.n_chars_counted), 9)
                                   AS DECIMAL(18,9))) AS DOUBLE), 6)
                   AS entropy_nats
        FROM cc JOIN n USING (doc_id)
        GROUP BY 1, 2, 3 ORDER BY 1
    """,
    doc="Per-doc character Shannon entropy in nats (operators/text.py "
    "char_entropy_scores) — the cheap gibberish/repetition signal: "
    "low = run-length garbage, high = base64-ish noise. One "
    "(doc,char)-keyed shuffle, DECIMAL(18,9)-summed terms.",
)
def q_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    return T.char_entropy_scores(docs).orderBy("doc_id")


@register(
    "q_pmi_collocations",
    oracle="""
        WITH toks AS (
          SELECT list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                             x -> x <> '') AS t
          FROM documents
        ), uni AS (
          SELECT tok AS w, CAST(count(*) AS BIGINT) AS c1
          FROM (SELECT unnest(t) AS tok FROM toks) GROUP BY 1
        ), n1 AS (SELECT CAST(sum(c1) AS BIGINT) AS n1 FROM uni),
        bg AS (
          SELECT unnest([struct_pack(w1 := t[i], w2 := t[i+1])
                         FOR i IN range(1, len(t))], recursive := true)
          FROM toks
        ), c2 AS (
          SELECT w1, w2, CAST(count(*) AS BIGINT) AS c2
          FROM bg GROUP BY 1, 2 HAVING count(*) >= 5
        ), n2 AS (
          SELECT CAST(sum(greatest(len(t) - 1, 0)) AS BIGINT) AS n2 FROM toks
        )
        SELECT c2.w1, c2.w2, c2.c2 AS pair_count,
               round(ln((c2.c2 / n2.n2)
                        / ((a.c1 / n1.n1) * (b.c1 / n1.n1))), 6) AS pmi
        FROM c2 JOIN uni a ON c2.w1 = a.w JOIN uni b ON c2.w2 = b.w, n1, n2
        ORDER BY pmi DESC, w1, w2 LIMIT 20
    """,
    doc="Top-20 adjacent-word collocations by PMI (operators/text.py "
    "pmi_collocations) — multiword-expression mining / tokenizer merge "
    "audit. PMI rounded to 6dp BEFORE ordering so both engines rank "
    "identically; ties break on (w1, w2); min_count=5 bounds the "
    "candidate table.",
)
def q_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    return T.pmi_collocations(docs, min_count=5, topk=20)


@register(
    "q_similarity_pq_topk",
    oracle="""
        SELECT (SELECT count(*) FROM embeddings WHERE vec_id < 10)
                   AS n_queries,
               (SELECT count(*) FROM embeddings) AS n_corpus,
               CAST(5 AS INT) AS k,
               CAST(32.0 AS DOUBLE) AS compression_x,
               true AS recall_ge_50pct
    """,
    doc="ANN top-5 via product quantization (Jegou et al. 2011, "
    "operators/similarity.py pq_topk): 8 subspaces x 16-entry "
    "codebooks (deterministic one-pass-per-iteration Lloyd), ADC "
    "gather+einsum coarse scan over 8-byte codes (32x less data "
    "streamed than fp32), exact cosine re-rank of a 50-candidate "
    "shortlist. Approximate by construction, so the oracled output is "
    "the invariant contract: data anchors + compression factor + "
    "recall-vs-brute-force >= 0.5 boolean (measured 0.72 at sf0.01; "
    "exact-semantics unit tests in tests/test_mining.py).",
)
def q_similarity_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hw_kafka_streams_spark.operators import similarity as S

    emb = load_table(spark, "embeddings", sf_dir)
    queries = emb.filter(F.col("vec_id") < 10)
    cb = S.pq_codebooks(emb, m=8, ks=16)
    dim = len(cb) * len(cb[0][0])
    pq = S.pq_topk(queries, emb, k=5, codebooks=cb).select(
        "query_id", "neighbor_id"
    )
    bf = S.brute_force_topk(queries, emb, k=5).select("query_id", "neighbor_id")
    hits = pq.join(F.broadcast(bf), ["query_id", "neighbor_id"]).agg(
        F.count(F.lit(1)).alias("n_hits")
    )
    denom = bf.agg(
        F.countDistinct("query_id").alias("n_queries"),
        F.count(F.lit(1)).alias("n_truth"),
    )
    n_corpus = emb.agg(F.count(F.lit(1)).alias("n_corpus"))
    return (
        denom.crossJoin(F.broadcast(hits))
        .crossJoin(F.broadcast(n_corpus))
        .select(
            "n_queries",
            "n_corpus",
            F.lit(5).cast("int").alias("k"),
            F.lit(float(dim * 4 / len(cb))).alias("compression_x"),
            (F.col("n_hits") >= 0.5 * F.col("n_truth")).alias("recall_ge_50pct"),
        )
    )


@register(
    "q_naive_bayes_langid",
    oracle="""
        WITH tr AS (
          SELECT doc_id, lang, lower(text) AS text FROM documents
          WHERE doc_id % 2 = 0
        ), te AS (
          SELECT doc_id, lang, lower(text) AS text FROM documents
          WHERE doc_id % 2 <> 0
        ), trt AS (
          SELECT lang AS c,
                 unnest(list_filter(string_split_regex(trim(text), '\\s+'),
                                    x -> x <> '')) AS t
          FROM tr
        ), ctc AS (
          SELECT c, t, count(*) AS cnt FROM trt GROUP BY 1, 2
        ), nc AS (
          SELECT c, CAST(sum(cnt) AS BIGINT) AS n_c FROM ctc GROUP BY 1
        ), vocab AS (SELECT count(DISTINCT t) AS v FROM ctc),
        priors AS (
          SELECT lang AS c,
                 CAST(round(ln(CAST(count(*) AS DOUBLE)
                               / (SELECT count(*) FROM tr)), 6)
                      AS DECIMAL(18,6)) AS ln_prior
          FROM tr GROUP BY 1
        ), model AS (
          SELECT t, ctc.c,
                 CAST(round(ln((cnt + 1.0) / (n_c + v)), 6)
                      AS DECIMAL(18,6)) AS ln_lik
          FROM ctc JOIN nc USING (c), vocab
        ), dflt AS (
          SELECT c, CAST(round(ln(1.0 / (n_c + v)), 6)
                         AS DECIMAL(18,6)) AS ln_default
          FROM nc, vocab
        ), tet AS (
          SELECT doc_id AS id, lang AS actual,
                 unnest(list_filter(string_split_regex(trim(text), '\\s+'),
                                    x -> x <> '')) AS t
          FROM te
        ), ttf AS (
          SELECT id, actual, t, count(*) AS tf FROM tet GROUP BY 1, 2, 3
        ), sc AS (
          SELECT id, actual, d.c,
                 sum(tf * coalesce(m.ln_lik, d.ln_default)) AS s
          FROM ttf CROSS JOIN dflt d
            LEFT JOIN model m ON m.t = ttf.t AND m.c = d.c
          GROUP BY 1, 2, 3
        ), fin AS (
          SELECT id, actual, sc.c, 
                 row_number() OVER (
                   PARTITION BY id
                   ORDER BY s + p.ln_prior DESC, sc.c
                 ) AS rn
          FROM sc JOIN priors p ON p.c = sc.c
        )
        SELECT id AS doc_id, actual, c AS predicted, c = actual AS is_correct
        FROM fin WHERE rn = 1 ORDER BY doc_id
    """,
    doc="Multinomial Naive Bayes language ID, train AND predict as "
    "count arithmetic (operators/classify.py): fit on even doc_ids, "
    "classify odd ones. Add-one smoothed log-likelihoods and priors "
    "rounded to DECIMAL(18,6) and decimal-summed, so the per-doc "
    "argmax (ties -> smaller class) is bit-stable and the whole "
    "train->predict pipeline is value-hash oracled. The fastText-"
    "shaped classifier-scoring plan: token explode, broadcast "
    "vocab-x-class model table, doc-partitioned argmax window.",
)
def q_naive_bayes_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hw_kafka_streams_spark.operators.classify import naive_bayes_predict

    docs = load_table(spark, "documents", sf_dir)
    train = docs.filter(F.col("doc_id") % 2 == 0)
    test = docs.filter(F.col("doc_id") % 2 != 0)
    return naive_bayes_predict(train, test).orderBy("doc_id")


@register(
    "q_mixture_temperature",
    oracle="""
        WITH g AS (
          SELECT source AS grp, count(*) AS n_docs,
                 CAST(sum(len(regexp_extract_all(text, '\\S+'))) AS BIGINT)
                     AS n_tokens
          FROM documents GROUP BY 1
        ), tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS n_total FROM g),
        sc AS (
          SELECT grp, n_docs, n_tokens,
                 round(CAST(n_tokens AS DOUBLE) / n_total, 6) AS p_raw,
                 CAST(round(sqrt(CAST(n_tokens AS DOUBLE) / n_total), 9)
                      AS DECIMAL(18,9)) AS s
          FROM g, tot
        ), z AS (SELECT sum(s) AS z FROM sc)
        SELECT grp AS source, n_docs, n_tokens, p_raw,
               round(CAST(s AS DOUBLE) / CAST(z AS DOUBLE), 6) AS w_temp
        FROM sc, z ORDER BY source
    """,
    doc="Temperature-scaled mixture weights, alpha=0.5 (T5/XLM-R "
    "multilingual rebalancing; operators/mixture.py "
    "temperature_weights): q_g proportional to sqrt(token share), "
    "flattening the natural distribution toward tail "
    "sources. sqrt is IEEE-correctly-rounded (unlike pow), so the "
    "whole weight table is value-hash oracled; normalizer is a "
    "DECIMAL(18,9) sum.",
)
def q_mixture_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hw_kafka_streams_spark.operators.mixture import temperature_weights
    from hw_kafka_streams_spark.operators.text import token_count

    docs = load_table(spark, "documents", sf_dir)
    return temperature_weights(
        docs, "source", token_count("text"), alpha=0.5
    ).orderBy("source")


@register(
    "q_similarity_ivfpq_topk",
    oracle="""
        SELECT (SELECT count(*) FROM embeddings WHERE vec_id < 10)
                   AS n_queries,
               (SELECT count(*) FROM embeddings) AS n_corpus,
               CAST(5 AS INT) AS k,
               CAST(0.25 AS DOUBLE) AS scan_fraction,
               CAST(32.0 AS DOUBLE) AS compression_x,
               true AS recall_ge_40pct
    """,
    doc="ANN top-5 via IVF-PQ, the production composition "
    "(operators/similarity.py ivfpq_topk): a 16-list IVF prunes WHICH "
    "vectors are scored (4 probes => 25% scan fraction), PQ codes "
    "shrink WHAT each candidate streams (8 bytes vs 256), exact "
    "cosine re-ranks the shortlist. Both trainers deterministic-"
    "Lloyd. Invariant-contract oracle: anchors + recall >= 0.4 "
    "boolean (beats the 25% random-scan bar; measured 0.76 at "
    "sf0.01).",
)
def q_similarity_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hw_kafka_streams_spark.operators import similarity as S

    emb = load_table(spark, "embeddings", sf_dir)
    queries = emb.filter(F.col("vec_id") < 10)
    iv = S.ivfpq_topk(queries, emb, k=5).select("query_id", "neighbor_id")
    bf = S.brute_force_topk(queries, emb, k=5).select("query_id", "neighbor_id")
    hits = iv.join(F.broadcast(bf), ["query_id", "neighbor_id"]).agg(
        F.count(F.lit(1)).alias("n_hits")
    )
    denom = bf.agg(
        F.countDistinct("query_id").alias("n_queries"),
        F.count(F.lit(1)).alias("n_truth"),
    )
    n_corpus = emb.agg(F.count(F.lit(1)).alias("n_corpus"))
    return (
        denom.crossJoin(F.broadcast(hits))
        .crossJoin(F.broadcast(n_corpus))
        .select(
            "n_queries",
            "n_corpus",
            F.lit(5).cast("int").alias("k"),
            F.lit(0.25).alias("scan_fraction"),
            F.lit(32.0).alias("compression_x"),
            (F.col("n_hits") >= 0.4 * F.col("n_truth")).alias("recall_ge_40pct"),
        )
    )


@register(
    "q_compression_quality",
    oracle="""
        SELECT (SELECT count(*) FROM documents) AS n_docs,
               (SELECT count(*) FROM documents WHERE doc_id % 7 = 0)
                   AS n_repetitive,
               true AS ratios_in_bounds,
               true AS repetitive_compresses_more
    """,
    doc="DEFLATE compression-ratio quality signal (operators/text.py "
    "compression_ratio_arrow): every 7th doc is replaced by a "
    "degenerate repeated-token text (the corpus is clean — same "
    "synthetic-probe move as the corrupt-JSON and NFC queries); the "
    "zlib ratio must separate the classes. Codec output is "
    "zlib-build-dependent, so the oracle is the invariant contract: "
    "row-count anchors + bounds (0 < ratio <= 1.5; DEFLATE overhead "
    "on the shortest ~47-char docs caps near 1.25) + strict "
    "class-mean separation boolean. Zero-shuffle narrow map; "
    "per-class means are one aggregation.",
)
def q_compression_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir).select(
        "doc_id",
        F.when(
            F.col("doc_id") % 7 == 0, F.repeat(F.lit("spam "), 200)
        )
        .otherwise(F.col("text"))
        .alias("text"),
        (F.col("doc_id") % 7 == 0).alias("is_rep"),
    )
    scored = docs.select(
        "doc_id", "is_rep", T.compression_ratio_arrow("text").alias("ratio")
    )
    return scored.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("is_rep").cast("long")).alias("n_repetitive"),
        (
            (F.min("ratio") > 0.0) & (F.max("ratio") <= 1.5)
        ).alias("ratios_in_bounds"),
        (
            F.avg(F.when(F.col("is_rep"), F.col("ratio")))
            < F.avg(F.when(~F.col("is_rep"), F.col("ratio")))
        ).alias("repetitive_compresses_more"),
    )


def _synth_payloads(docs: DataFrame, maker) -> DataFrame:
    """Arrow-batched payload synthesis per doc_id (the stand-in for a
    real binary-bearing scan; same mapInPandas shape)."""
    from collections.abc import Iterator

    import pandas as pd

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["doc_id"]
            yield pd.DataFrame(
                {"doc_id": ids, "payload": [maker(int(i)) for i in ids]}
            )

    return docs.select("doc_id").mapInPandas(
        gen, schema="doc_id long, payload binary"
    )


@register(
    "q_multimodal_resize",
    oracle="""
        SELECT doc_id,
               CAST(16 AS INT) AS width, CAST(12 AS INT) AS height,
               CAST(doc_id % 256 AS INT) AS mean_b,
               CAST((doc_id * 7) % 256 AS INT) AS mean_g,
               CAST((doc_id * 13) % 256 AS INT) AS mean_r
        FROM documents WHERE doc_id < 200 ORDER BY doc_id
    """,
    doc="REAL image resize roundtrip (operators/multimodal.py "
    "resize_bmp_nearest + bmp_channel_means): synthesize complete "
    "uncompressed 24-bit BMPs (real pixel rows, 4-byte padding, "
    "uniform doc_id-derived fill), nearest-neighbor resize to 16x12 "
    "with actual numpy pixel gathers, re-pack valid BMPs, then "
    "feature-extract exact integer channel means. Uniform fill is "
    "invariant under nearest-neighbor, so the oracle recomputes every "
    "output arithmetically. Two chained Arrow narrow maps, zero "
    "shuffle.",
)
def q_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hw_kafka_streams_spark.operators.multimodal import (
        bmp_channel_means,
        make_real_bmp,
        resize_bmp_nearest,
    )

    docs = load_table(spark, "documents", sf_dir).filter(F.col("doc_id") < 200)
    payloads = _synth_payloads(
        docs,
        lambda i: make_real_bmp(
            8 + i % 24, 8 + i % 16, (i % 256, (i * 7) % 256, (i * 13) % 256)
        ),
    )
    return bmp_channel_means(resize_bmp_nearest(payloads, 16, 12)).orderBy(
        "doc_id"
    )


@register(
    "q_multimodal_video",
    oracle="""
        SELECT doc_id,
               CAST(fi AS INT) AS frame_idx,
               CAST(8 * (1 + doc_id % 3) AS INT) AS width,
               CAST(8 AS INT) AS height,
               CAST((doc_id + 7 * fi) % 256 AS INT) AS mean_luma
        FROM (
          SELECT doc_id, unnest(range(0, 5 + CAST(doc_id % 6 AS INT), 2)) AS fi
          FROM documents WHERE doc_id < 100
        )
        ORDER BY doc_id, frame_idx
    """,
    doc="REAL video frame sampling (operators/multimodal.py "
    "sample_video_frames): synthesize complete YUV4MPEG2 (y4m) "
    "raw-video files — plain-text stream header, FRAME markers, real "
    "4:2:0 planes (codec-free public interchange format) — walk the "
    "frames, keep every 2nd, and compute exact integer mean luma per "
    "sampled frame. One row fans out to its sampled frames, the exact "
    "mapInPandas shape an ffmpeg-backed sampler uses; MJPEG AVI is "
    "decoded for real too (q_multimodal_avi), inter-frame codecs "
    "stay stubbed. Oracle recomputes frames and luma "
    "arithmetically.",
)
def q_multimodal_video(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hw_kafka_streams_spark.operators.multimodal import (
        make_fake_y4m,
        sample_video_frames,
    )

    docs = load_table(spark, "documents", sf_dir).filter(F.col("doc_id") < 100)
    payloads = _synth_payloads(
        docs,
        lambda i: make_fake_y4m(
            8 * (1 + i % 3), 8, 5 + i % 6, lambda fr, i=i: (i + 7 * fr) % 256
        ),
    )
    return sample_video_frames(payloads, every_n=2).orderBy(
        "doc_id", "frame_idx"
    )


@register(
    "q_multimodal_audio_rms",
    oracle="""
        SELECT doc_id,
               CAST(256 AS BIGINT) AS n_samples,
               CAST(1000 + (doc_id % 7) * 100 AS DOUBLE) AS rms
        FROM documents WHERE doc_id < 200 ORDER BY doc_id
    """,
    doc="REAL audio feature extraction (operators/multimodal.py "
    "audio_rms): synthesize complete 16-bit PCM WAVs whose data is a "
    "+/-A square wave (real samples), decode them with numpy, compute "
    "RMS loudness — exactly A for a square wave, so the oracle "
    "recomputes it arithmetically (sqrt of the exact integer mean "
    "square is exact for perfect squares). Zero-shuffle Arrow narrow "
    "map; IMA ADPCM compressed audio decodes for real too "
    "(q_multimodal_adpcm); MP3-class codecs stay stubbed.",
)
def q_multimodal_audio_rms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hw_kafka_streams_spark.operators.multimodal import (
        audio_rms,
        make_fake_wav_pcm,
    )

    docs = load_table(spark, "documents", sf_dir).filter(F.col("doc_id") < 200)
    payloads = _synth_payloads(
        docs, lambda i: make_fake_wav_pcm(8000, 1000 + (i % 7) * 100, 256)
    )
    return audio_rms(payloads).orderBy("doc_id")


_ADPCM_STEPS = (
    "[7,8,9,10,11,12,13,14,16,17,19,21,23,25,28,31,34,37,41,45,50,55,60,66,"
    "73,80,88,97,107,118,130,143,157,173,190,209,230,253,279,307,337,371,"
    "408,449,494,544,598,658,724,796,876,963,1060,1166,1282,1411,1552,1707,"
    "1878,2066,2272,2499,2749,3024,3327,3660,4026,4428,4871,5358,5894,6484,"
    "7132,7845,8630,9493,10442,11487,12635,13899,15289,16818,18500,20350,"
    "22385,24623,27086,29794,32767]"
)


@register(
    "q_multimodal_adpcm",
    oracle=f"""
        WITH RECURSIVE dec AS (
          SELECT doc_id,
                 0 AS i,
                 CAST(((doc_id * 997) % 2048) - 1024 AS BIGINT) AS pred,
                 CAST(doc_id % 20 AS BIGINT) AS idx,
                 CAST(((doc_id * 997) % 2048) - 1024 AS BIGINT) AS acc
          FROM documents WHERE doc_id < 150
          UNION ALL
          SELECT doc_id, i, predn,
                 least(88, greatest(0,
                   idx + ([-1,-1,-1,-1,2,4,6,8])[(nib % 8) + 1])) AS idx,
                 acc + predn AS acc
          FROM (
            SELECT doc_id, i + 1 AS i, idx, acc, nib,
                   least(32767, greatest(-32768,
                     pred + (CASE WHEN nib >= 8 THEN -1 ELSE 1 END) * diff
                   )) AS predn
            FROM (
              SELECT doc_id, i, pred, idx, acc, nib,
                     (s // 8) + (nib % 2) * (s // 4)
                     + ((nib // 2) % 2) * (s // 2)
                     + ((nib // 4) % 2) * s AS diff
              FROM (
                SELECT *, (doc_id + 3 * i) % 16 AS nib,
                       ({_ADPCM_STEPS})[idx + 1] AS s
                FROM dec WHERE i < 64
              )
            )
          )
        )
        SELECT doc_id, CAST(65 AS BIGINT) AS n_samples,
               pred AS last_sample, acc AS sum_samples
        FROM dec WHERE i = 64 ORDER BY doc_id
    """,
    doc="REAL compressed-audio decode (operators/adpcmcodec.py): "
    "synthesize complete spec-correct IMA ADPCM WAV files (format tag "
    "0x0011, block header + packed 4-bit nibbles, low nibble first) "
    "with a deterministic nibble stream, then fully decode them — "
    "RIFF chunk walk, 89-entry step table, index table, int16 clamp — "
    "and emit exact integer stats over the decoded waveform. The "
    "DuckDB oracle replays the SAME public IMA/DVI state machine as a "
    "recursive CTE over the step-table literal, so every nibble, "
    "clamp, and table entry is bit-exact-checked. This closes the "
    "'compressed audio stays stubbed' gap: 4:1 ADPCM is the "
    "standard telephony/game-audio compression and its decode is "
    "pure integer math from the public spec. Arrow-batched, "
    "zero-shuffle, sequential only within a block (spec-mandated), "
    "full cluster width across rows.",
)
def q_multimodal_adpcm(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hw_kafka_streams_spark.operators.adpcmcodec import (
        adpcm_stats,
        make_ima_adpcm_wav,
    )

    docs = load_table(spark, "documents", sf_dir).filter(F.col("doc_id") < 150)
    payloads = _synth_payloads(
        docs,
        lambda i: make_ima_adpcm_wav(
            ((i * 997) % 2048) - 1024,
            i % 20,
            [(i + 3 * k) % 16 for k in range(64)],
        ),
    )
    return adpcm_stats(payloads).orderBy("doc_id")


@register(
    "q_bpe_pair_stats",
    oracle="""
        WITH vocab AS (
          SELECT w, CAST(count(*) AS BIGINT) AS freq
          FROM (
            SELECT unnest(list_filter(
                     string_split_regex(trim(lower(text)), '\\s+'),
                     x -> x <> '')) AS w
            FROM documents
          ) GROUP BY 1
        ), syms AS (
          SELECT w, freq,
                 list_concat(string_split(w, ''), ['</w>']) AS s
          FROM vocab
        ), pairs AS (
          SELECT freq,
                 unnest([struct_pack(a := s[i], b := s[i+1])
                         FOR i IN range(1, len(s))], recursive := true)
          FROM syms
        )
        SELECT a, b, CAST(sum(freq) AS BIGINT) AS pair_count
        FROM pairs GROUP BY 1, 2
        ORDER BY pair_count DESC, a, b LIMIT 20
    """,
    doc="BPE merge-candidate statistics (Sennrich et al. 2016, the "
    "first iteration of byte-pair-encoding training at corpus scale): "
    "word-level vocabulary with frequencies (the standard BPE "
    "compaction - pair counts weight by word freq instead of "
    "re-scanning the corpus), character symbol sequences with the "
    "</w> end marker, top-20 adjacent symbol pairs by weighted count. "
    "All exact integers; ties break on the pair. Each further merge "
    "iteration re-applies the winning merge to the vocab table and "
    "repeats this same one-aggregation plan.",
)
def q_bpe_pair_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hw_kafka_streams_spark.operators.text import _adjacent_pairs, word_tokens

    docs = load_table(spark, "documents", sf_dir)
    vocab = (
        docs.select(F.explode(word_tokens(F.lower(F.col("text")))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    syms = vocab.select(
        "freq",
        F.concat(
            F.filter(F.split("w", ""), lambda c: c != ""),
            F.array(F.lit("</w>")),
        ).alias("s"),
    )
    pairs = syms.select(
        "freq", F.explode(_adjacent_pairs(F.col("s"))).alias("p")
    ).select("freq", F.col("p.w1").alias("a"), F.col("p.w2").alias("b"))
    return (
        pairs.groupBy("a", "b")
        .agg(F.sum("freq").alias("pair_count"))
        .orderBy(F.desc("pair_count"), "a", "b")
        .limit(20)
    )


@register(
    "q_bpe_train",
    oracle=bpe_oracle_sql(8),
    doc="BPE TRAINING, not just the candidate stats: 8 merge rounds, "
    "each one (a,b)-keyed weighted pair count over the vocab table "
    "(vocabulary-sized, never corpus-sized — the word-frequency "
    "compaction), a deterministic winner (count DESC, then pair), and "
    "a LITERAL space-delimited replace applying the merge ('a b'->"
    "'ab' on space-wrapped symbol strings). Literal replace shares "
    "leftmost-non-overlap semantics across engines, so the DuckDB "
    "oracle unrolls the identical 8 iterations as CTEs and the merge "
    "table value-hashes exactly (operators/bpe.bpe_train_merges).",
)
def q_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hw_kafka_streams_spark.operators.bpe import bpe_train_merges

    docs = load_table(spark, "documents", sf_dir)
    return bpe_train_merges(spark, docs, n_merges=8).orderBy("merge_rank")


@register(
    "q_bpe_encode",
    oracle=bpe_apply_oracle_sql(8),
    doc="BPE ENCODE with the trained merges: the 8 learned merges "
    "apply to every word as one chain of literal replaces — 24 nested "
    "replace calls compiled into a single whole-stage-codegen "
    "projection, one narrow pass over the corpus regardless of merge "
    "count — and the per-document report gives words, BPE tokens, and "
    "realized fertility (the token-budget number). Train-then-apply "
    "end to end against the DuckDB twin replaying the identical "
    "iterations and chain (operators/bpe.bpe_apply_counts).",
)
def q_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hw_kafka_streams_spark.operators.bpe import (
        bpe_apply_counts,
        bpe_train_merges,
    )

    docs = load_table(spark, "documents", sf_dir)
    merges = [
        (r.a, r.b)
        for r in bpe_train_merges(spark, docs, n_merges=8).collect()
    ]
    return bpe_apply_counts(docs, merges).orderBy("doc_id")


@register(
    "q_ngram_novelty",
    oracle="""
        WITH toks AS (
          SELECT doc_id,
                 [('0x' || substring(md5(t),1,15))::BIGINT
                  FOR t IN list_filter(string_split_regex(trim(text), '\\s+'),
                                       t -> t <> '')] AS ths
          FROM documents
        ), sh AS (
          SELECT DISTINCT doc_id,
                 ('0x' || substring(md5(s),1,15))::BIGINT AS g
          FROM (SELECT doc_id,
                       unnest([array_to_string(ths[i:i+4], '|')
                               FOR i IN range(1, len(ths) - 3)]) AS s
                FROM toks WHERE len(ths) >= 5)
        ), dfq AS (
          SELECT g, count(*) AS df FROM sh GROUP BY 1
        )
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n_grams,
               CAST(sum((df >= 2)::INT) AS BIGINT) AS n_shared,
               round(1.0 - CAST(sum((df >= 2)::INT) AS DOUBLE) / count(*), 6)
                   AS novelty
        FROM sh JOIN dfq USING (g)
        GROUP BY doc_id ORDER BY doc_id
    """,
    doc="Per-document 5-gram novelty: the fraction of a doc's distinct "
    "token 5-grams that appear in NO other document — the "
    "memorization-risk / template-detection audit (low novelty = "
    "boilerplate or near-copy even when exact/MinHash dedup kept the "
    "doc). Reuses the md5h shingle twin (operators/dedup.py "
    "shingle_postings): one (doc, shingle)-keyed distinct, one "
    "shingle-keyed df count joined back by shingle — never doc-pairs, "
    "so cost is linear in corpus shingles at 100 TB.",
)
def q_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hw_kafka_streams_spark.operators.dedup import shingle_postings

    docs = load_table(spark, "documents", sf_dir)
    sh = shingle_postings(docs, n=5, hash_mode="md5", distinct=True)
    dfq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    return (
        sh.join(dfq, "shingle")
        .groupBy(F.col("id").alias("doc_id"))
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum((F.col("df") >= 2).cast("long")).alias("n_shared"),
        )
        .select(
            "doc_id",
            "n_grams",
            "n_shared",
            F.round(
                F.lit(1.0) - F.col("n_shared").cast("double") / F.col("n_grams"),
                6,
            ).alias("novelty"),
        )
        .orderBy("doc_id")
    )


@register(
    "q_hybrid_rank_fusion",
    oracle="""
        WITH toks AS (
          SELECT doc_id, unnest(list_filter(
                   string_split_regex(trim(lower(text)), '\\s+'),
                   t -> t <> '')) AS term
          FROM documents
        ),
        dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
        stats AS (SELECT count(*) AS n_docs,
                         CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dl),
        qt AS (SELECT doc_id, term, count(*) AS tf FROM toks
               WHERE term IN ('spark', 'join', 'hash') GROUP BY 1, 2),
        dfreq AS (SELECT term, count(DISTINCT doc_id) AS df FROM qt GROUP BY 1),
        contrib AS (
          SELECT qt.doc_id,
                 CAST(round(
                   ln(1 + (stats.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5))
                   * qt.tf * 2.2
                   / (qt.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / stats.avgdl)),
                   6) AS DECIMAL(12,6)) AS s
          FROM qt JOIN dfreq USING (term) JOIN dl USING (doc_id)
          CROSS JOIN stats
        ),
        bm AS (SELECT doc_id, sum(s) AS bm25 FROM contrib GROUP BY 1),
        lex AS (
          SELECT doc_id, CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id)
                              AS INT) AS lex_rnk
          FROM (SELECT * FROM bm ORDER BY bm25 DESC, doc_id LIMIT 100)
        ),
        vec AS (
          SELECT vec_id AS doc_id,
                 CAST(row_number() OVER (ORDER BY cs DESC, vec_id)
                      AS INT) AS vec_rnk
          FROM (SELECT c.vec_id,
                       round(list_cosine_similarity(c.embedding::DOUBLE[],
                                                    q.embedding::DOUBLE[]), 4)
                           AS cs
                FROM embeddings c,
                     (SELECT embedding FROM embeddings WHERE vec_id = 0) q
                WHERE c.vec_id <> 0
                ORDER BY cs DESC, c.vec_id LIMIT 100)
        )
        SELECT doc_id, lex_rnk, vec_rnk,
               round(coalesce(1.0 / (60 + lex_rnk), 0)
                     + coalesce(1.0 / (60 + vec_rnk), 0), 6) AS rrf
        FROM lex FULL OUTER JOIN vec USING (doc_id)
        ORDER BY rrf DESC, doc_id LIMIT 15
    """,
    doc="Hybrid retrieval via reciprocal-rank fusion (Cormack et al. "
    "2009; operators/retrieval.py): the BM25 lexical branch (query "
    "{spark, join, hash}) and the exact-cosine vector branch (query = "
    "embedding 0) each take top-100 via TakeOrderedAndProject (no "
    "global window), get bounded post-limit ranks, and fuse with "
    "score = sum of 1/(60+rank) over a full outer join — the "
    "calibration-free rank merge every RAG stack runs. Both branch "
    "orderings are exact (DECIMAL bm25, 4-dp cosine, id tiebreaks), "
    "so the fused top-15 is value-hash oracled end to end.",
)
def q_hybrid_rank_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hw_kafka_streams_spark.operators import similarity as S
    from hw_kafka_streams_spark.operators.retrieval import (
        bm25_scores,
        rank_top,
        rrf_fuse,
    )

    docs = load_table(spark, "documents", sf_dir)
    emb = load_table(spark, "embeddings", sf_dir)
    lex = rank_top(
        bm25_scores(docs, ["spark", "join", "hash"]),
        [F.desc("bm25"), F.asc("doc_id")],
        100,
    )
    qvec = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qvec")
    )
    scored = (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(qvec))
        .select(
            F.col("vec_id").alias("doc_id"),
            F.round(
                S.cosine_arrow(F.col("embedding"), F.col("qvec")), 4
            ).alias("cs"),
        )
    )
    vec = rank_top(scored, [F.desc("cs"), F.asc("doc_id")], 100)
    return rrf_fuse(lex, vec, rrf_k=60, topk=15)


@register(
    "q_collocations_llr",
    oracle="""
        WITH toks AS (
          SELECT list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                             x -> x <> '') AS t
          FROM documents
        ), bg AS (
          SELECT unnest([struct_pack(w1 := t[i], w2 := t[i+1])
                         FOR i IN range(1, len(t))], recursive := true)
          FROM toks
        ), c2 AS (
          SELECT w1, w2, CAST(count(*) AS BIGINT) AS k11
          FROM bg GROUP BY 1, 2
        ),
        r AS (SELECT w1, CAST(sum(k11) AS BIGINT) AS r1 FROM c2 GROUP BY 1),
        c AS (SELECT w2, CAST(sum(k11) AS BIGINT) AS cc1 FROM c2 GROUP BY 1),
        tt AS (SELECT CAST(sum(k11) AS BIGINT) AS t FROM c2)
        SELECT w1, w2, k11 AS pair_count,
               round(2.0 * (
                 (CASE WHEN k11 > 0 THEN CAST(k11 AS DOUBLE)*ln(CAST(k11 AS DOUBLE)) ELSE 0 END)
               + (CASE WHEN r1 - k11 > 0 THEN CAST(r1 - k11 AS DOUBLE)*ln(CAST(r1 - k11 AS DOUBLE)) ELSE 0 END)
               + (CASE WHEN cc1 - k11 > 0 THEN CAST(cc1 - k11 AS DOUBLE)*ln(CAST(cc1 - k11 AS DOUBLE)) ELSE 0 END)
               + (CASE WHEN t - r1 - cc1 + k11 > 0 THEN CAST(t - r1 - cc1 + k11 AS DOUBLE)*ln(CAST(t - r1 - cc1 + k11 AS DOUBLE)) ELSE 0 END)
               - (CASE WHEN r1 > 0 THEN CAST(r1 AS DOUBLE)*ln(CAST(r1 AS DOUBLE)) ELSE 0 END)
               - (CASE WHEN t - r1 > 0 THEN CAST(t - r1 AS DOUBLE)*ln(CAST(t - r1 AS DOUBLE)) ELSE 0 END)
               - (CASE WHEN cc1 > 0 THEN CAST(cc1 AS DOUBLE)*ln(CAST(cc1 AS DOUBLE)) ELSE 0 END)
               - (CASE WHEN t - cc1 > 0 THEN CAST(t - cc1 AS DOUBLE)*ln(CAST(t - cc1 AS DOUBLE)) ELSE 0 END)
               + (CASE WHEN t > 0 THEN CAST(t AS DOUBLE)*ln(CAST(t AS DOUBLE)) ELSE 0 END)
               ), 4) AS llr
        FROM c2 JOIN r USING (w1) JOIN c USING (w2) CROSS JOIN tt
        WHERE k11 >= 5
        ORDER BY llr DESC, w1, w2 LIMIT 20
    """,
    doc="Top-20 collocations by Dunning log-likelihood ratio — the "
    "contingency-test sibling of PMI that doesn't over-reward rare "
    "pairs. All inputs exact integer counts off ONE shared bigram "
    "table (margins are vocab-sized aggs); LLR is one scalar xlogx "
    "expression per pair rounded before ordering "
    "(operators/text.llr_collocations).",
)
def q_collocations_llr(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    return T.llr_collocations(docs, min_count=5, topk=20)


@register(
    "q_vocab_concentration",
    oracle="""
        WITH toks AS (
          SELECT unnest(list_filter(
                   string_split_regex(trim(lower(text)), '\\s+'),
                   x -> x <> '')) AS w
          FROM documents
        ),
        freq AS (SELECT w, count(*) AS c FROM toks GROUP BY 1),
        tot AS (SELECT CAST(sum(c) AS BIGINT) AS t,
                       count(*) AS vocab FROM freq)
        SELECT min(tot.t) AS n_tokens,
               min(tot.vocab) AS vocab,
               round(CAST(sum(CAST(round(
                        -(CAST(c AS DOUBLE) / tot.t)
                        * ln(CAST(c AS DOUBLE) / tot.t), 9)
                      AS DECIMAL(20,9))) AS DOUBLE), 6) AS entropy,
               round(CAST(sum(CAST(round(
                        -(CAST(c AS DOUBLE) / tot.t)
                        * ln(CAST(c AS DOUBLE) / tot.t), 9)
                      AS DECIMAL(20,9))) AS DOUBLE)
                     / ln(CAST(min(tot.vocab) AS DOUBLE)), 6) AS norm_entropy,
               round(CAST(sum(CAST(round(
                        (CAST(c AS DOUBLE) / tot.t)
                        * (CAST(c AS DOUBLE) / tot.t), 12)
                      AS DECIMAL(24,12))) AS DOUBLE), 8) AS hhi,
               round(1.0 / CAST(sum(CAST(round(
                        (CAST(c AS DOUBLE) / tot.t)
                        * (CAST(c AS DOUBLE) / tot.t), 12)
                      AS DECIMAL(24,12))) AS DOUBLE), 2) AS eff_vocab
        FROM freq CROSS JOIN tot
    """,
    doc="Vocabulary concentration in one sort-free aggregation pass: "
    "token Shannon entropy (+ normalized by ln(vocab)), Herfindahl "
    "index, and effective vocabulary size 1/HHI — the concentration "
    "readout (template/spam corpora collapse toward few tokens) "
    "WITHOUT the vocab-wide rank sort a Gini coefficient would need. "
    "Counts exact; entropy/HHI terms are per-term-rounded DECIMAL sums "
    "(reducer-order-proof).",
)
def q_vocab_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    toks = docs.select(
        F.explode(T.word_tokens(F.lower(F.col("text")))).alias("w")
    )
    freq = toks.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    tot = freq.agg(
        F.sum("c").alias("t"), F.count(F.lit(1)).alias("vocab")
    )
    p = F.col("c").cast("double") / F.col("t")
    ent_term = F.round(-p * F.log(p), 9).cast("decimal(20,9)")
    hhi_term = F.round(p * p, 12).cast("decimal(24,12)")
    return (
        freq.crossJoin(F.broadcast(tot))
        .agg(
            F.min("t").alias("n_tokens"),
            F.min("vocab").alias("vocab"),
            F.round(F.sum(ent_term).cast("double"), 6).alias("entropy"),
            F.round(
                F.sum(ent_term).cast("double")
                / F.log(F.min("vocab").cast("double")),
                6,
            ).alias("norm_entropy"),
            F.round(F.sum(hhi_term).cast("double"), 8).alias("hhi"),
            F.round(F.lit(1.0) / F.sum(hhi_term).cast("double"), 2).alias(
                "eff_vocab"
            ),
        )
    )


@register(
    "q_burstiness",
    oracle="""
        WITH toks AS (
          SELECT doc_id, unnest(list_filter(
                   string_split_regex(trim(lower(text)), '\\s+'),
                   x -> x <> '')) AS term
          FROM documents
        ),
        tf AS (SELECT doc_id, term, count(*) AS x FROM toks GROUP BY 1, 2),
        nd AS (SELECT count(DISTINCT doc_id) AS n FROM tf),
        st AS (
          SELECT term, CAST(sum(x) AS BIGINT) AS c,
                 count(*) AS df, CAST(sum(x * x) AS BIGINT) AS s2
          FROM tf GROUP BY term HAVING count(*) >= 10
        )
        SELECT term, c, df,
               round((CAST(s2 AS DOUBLE) / nd.n
                      - (CAST(c AS DOUBLE) / nd.n) * (CAST(c AS DOUBLE) / nd.n))
                     / (CAST(c AS DOUBLE) / nd.n), 4) AS vmr,
               round(CAST(df AS DOUBLE)
                     / (nd.n * (1.0 - exp(-(CAST(c AS DOUBLE) / nd.n)))), 4)
                   AS poisson_df_ratio
        FROM st CROSS JOIN nd
        ORDER BY c DESC, term LIMIT 20
    """,
    doc="Term burstiness: variance-to-mean ratio of per-doc counts "
    "(zeros included) and observed-vs-Poisson document frequency — "
    "content words clump (VMR >> 1, df below Poisson), function words "
    "spread evenly. The corpus-linguistics signal separating topical "
    "keywords from glue, from exact integer (c, df, sum x^2) "
    "aggregates plus a scalar epilogue; one (doc, term) shuffle.",
)
def q_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    toks = docs.select(
        F.col("doc_id"),
        F.explode(T.word_tokens(F.lower(F.col("text")))).alias("term"),
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("x"))
    nd = tf.agg(F.countDistinct("doc_id").alias("n"))
    st = (
        tf.groupBy("term")
        .agg(
            F.sum("x").alias("c"),
            F.count(F.lit(1)).alias("df"),
            F.sum(F.col("x") * F.col("x")).alias("s2"),
        )
        .filter(F.col("df") >= 10)
    )
    mean = F.col("c").cast("double") / F.col("n")
    vmr = (F.col("s2").cast("double") / F.col("n") - mean * mean) / mean
    ratio = F.col("df").cast("double") / (
        F.col("n") * (F.lit(1.0) - F.exp(-mean))
    )
    return (
        st.crossJoin(F.broadcast(nd))
        .select(
            "term",
            "c",
            "df",
            F.round(vmr, 4).alias("vmr"),
            F.round(ratio, 4).alias("poisson_df_ratio"),
        )
        .orderBy(F.desc("c"), "term")
        .limit(20)
    )


@register(
    "q_zonemap_audit",
    oracle="""
        WITH base AS (
          SELECT l_orderkey, l_partkey & 1023 AS x0, l_suppkey & 1023 AS y0
          FROM lineitem
        ),
        s1 AS (SELECT *, (x0 | (x0 << 16)) & 281470681808895 AS x,
                         (y0 | (y0 << 16)) & 281470681808895 AS y FROM base),
        s2 AS (SELECT * REPLACE ((x | (x << 8)) & 71777214294589695 AS x,
                                 (y | (y << 8)) & 71777214294589695 AS y) FROM s1),
        s3 AS (SELECT * REPLACE ((x | (x << 4)) & 1085102592571150095 AS x,
                                 (y | (y << 4)) & 1085102592571150095 AS y) FROM s2),
        s4 AS (SELECT * REPLACE ((x | (x << 2)) & 3689348814741910323 AS x,
                                 (y | (y << 2)) & 3689348814741910323 AS y) FROM s3),
        s5 AS (SELECT * REPLACE ((x | (x << 1)) & 6148914691236517205 AS x,
                                 (y | (y << 1)) & 6148914691236517205 AS y) FROM s4),
        zv AS (SELECT l_orderkey, x0, y0, x | (y << 1) AS z FROM s5),
        chunks AS (
          SELECT 'natural' AS layout, l_orderkey // 1024 AS chunk,
                 min(x0) AS min_x, max(x0) AS max_x,
                 min(y0) AS min_y, max(y0) AS max_y
          FROM zv GROUP BY 1, 2
          UNION ALL
          SELECT 'zorder', z >> 14,
                 min(x0), max(x0), min(y0), max(y0)
          FROM zv GROUP BY 1, 2
        )
        SELECT layout, count(*) AS n_chunks,
               round(CAST(sum(max_x - min_x) AS DOUBLE) / count(*) / 1023, 4)
                   AS avg_zone_width_x,
               round(CAST(sum(max_y - min_y) AS DOUBLE) / count(*) / 1023, 4)
                   AS avg_zone_width_y
        FROM chunks GROUP BY layout ORDER BY layout
    """,
    doc="Zone-map (data-skipping) effectiveness audit: per-chunk "
    "min/max width of both key projections under the NATURAL layout "
    "(orderkey chunks — partkey/suppkey zones span ~the full domain, "
    "so a point predicate prunes nothing) vs the Z-ORDER layout "
    "(Morton-prefix chunks — both widths collapse). This is the "
    "measurement behind choosing ZORDER BY before a 100 TB parquet "
    "write; chunk ids are pure arithmetic (orderkey div / z-prefix), "
    "no global row numbering (operators/layout.z_value).",
)
def q_zonemap_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hw_kafka_streams_spark.operators.layout import z_value

    li = load_table(spark, "lineitem", sf_dir)
    x0 = F.col("l_partkey").bitwiseAND(F.lit(1023))
    y0 = F.col("l_suppkey").bitwiseAND(F.lit(1023))
    base = li.select(
        F.col("l_orderkey"),
        x0.alias("x0"),
        y0.alias("y0"),
        z_value(x0, y0).alias("z"),
    )
    out = []
    for layout, chunk in (
        ("natural", (F.col("l_orderkey") / 1024).cast("long")),
        ("zorder", F.shiftright("z", 14)),
    ):
        chunks = base.groupBy(chunk.alias("chunk")).agg(
            F.min("x0").alias("min_x"),
            F.max("x0").alias("max_x"),
            F.min("y0").alias("min_y"),
            F.max("y0").alias("max_y"),
        )
        out.append(
            chunks.agg(
                F.count(F.lit(1)).alias("n_chunks"),
                F.round(
                    F.sum(F.col("max_x") - F.col("min_x")).cast("double")
                    / F.count(F.lit(1))
                    / 1023,
                    4,
                ).alias("avg_zone_width_x"),
                F.round(
                    F.sum(F.col("max_y") - F.col("min_y")).cast("double")
                    / F.count(F.lit(1))
                    / 1023,
                    4,
                ).alias("avg_zone_width_y"),
            ).select(F.lit(layout).alias("layout"), "*")
        )
    return out[0].unionByName(out[1]).orderBy("layout")


@register(
    "q_bigram_backoff_score",
    oracle="""
        WITH toks AS (
          SELECT doc_id,
                 list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                             t -> t <> '') AS t
          FROM documents
        ), strain AS (
          SELECT * FROM toks WHERE doc_id % 2 = 0
        ), sscore AS (
          SELECT * FROM toks WHERE doc_id % 2 = 1
        ), tfb AS (
          SELECT doc_id, w1, w2, count(*) AS tf FROM (
            SELECT doc_id,
                   unnest([struct_pack(w1 := t[i], w2 := t[i+1])
                           FOR i IN range(1, len(t))], recursive := true)
            FROM sscore
          ) GROUP BY 1, 2, 3
        ), c2 AS (
          SELECT w1, w2, CAST(count(*) AS BIGINT) AS c2 FROM (
            SELECT unnest([struct_pack(w1 := t[i], w2 := t[i+1])
                           FOR i IN range(1, len(t))], recursive := true)
            FROM strain
          ) GROUP BY 1, 2
        ), ctx AS (
          SELECT w1, CAST(sum(c2) AS BIGINT) AS ctx FROM c2 GROUP BY 1
        ), uni AS (
          SELECT tok AS w2u, CAST(count(*) AS BIGINT) AS c1
          FROM (SELECT unnest(t) AS tok FROM strain) GROUP BY 1
        ), ntot AS (
          SELECT CAST(sum(c1) AS BIGINT) AS n_tok FROM uni
        ), contrib AS (
          SELECT tfb.doc_id, tfb.tf,
                 CASE WHEN c2.c2 IS NOT NULL THEN 0 ELSE tfb.tf END AS bk,
                 tfb.tf * CAST(round(ln(
                     CASE WHEN c2.c2 IS NOT NULL
                          THEN CAST(c2.c2 AS DOUBLE) / ctx.ctx
                          ELSE 0.4 * coalesce(CAST(uni.c1 AS DOUBLE), 0.4)
                               / ntot.n_tok END), 6) AS DECIMAL(18,6)) AS s
          FROM tfb LEFT JOIN c2 USING (w1, w2)
                   LEFT JOIN ctx USING (w1)
                   LEFT JOIN uni ON tfb.w2 = uni.w2u, ntot
        )
        SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_bigrams,
               CAST(sum(bk) AS BIGINT) AS n_backoff,
               round(CAST(sum(s) AS DOUBLE) / sum(tf), 6) AS avg_ln_s
        FROM contrib GROUP BY 1 ORDER BY 1
    """,
    doc="Stupid-backoff bigram LM (Brants et al. 2007) scoring held-out "
    "docs (odd doc_id) against a model trained on the rest (even): "
    "S(w2|w1)=c2/ctx if seen else 0.4*c1(w2)/N, OOV floor 0.4*0.4/N. "
    "Fixes add-one smoothing's over-penalty of unseen bigrams on small "
    "corpora; unnormalized by design (the paper's scale point). Exact "
    "integer counts, ln terms DECIMAL(18,6)-summed; n_backoff counts "
    "the occurrences that fell back (operators/text.py "
    "bigram_backoff_scores).",
)
def q_bigram_backoff_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    train = docs.filter((F.col("doc_id") % 2) == 0)
    held_out = docs.filter((F.col("doc_id") % 2) == 1)
    return T.bigram_backoff_scores(held_out, model_df=train).orderBy("doc_id")


@register(
    "q_kn_lm_score",
    oracle=r"""
        WITH toks AS (
          SELECT doc_id,
                 list_filter(string_split_regex(trim(lower(text)), '\s+'),
                             t -> t <> '') AS t
          FROM documents
        ), strain AS (
          SELECT * FROM toks WHERE doc_id % 2 = 0
        ), sscore AS (
          SELECT * FROM toks WHERE doc_id % 2 = 1
        ), tfb AS (
          SELECT doc_id, w1, w2, count(*) AS tf FROM (
            SELECT doc_id,
                   unnest([struct_pack(w1 := t[i], w2 := t[i+1])
                           FOR i IN range(1, len(t))], recursive := true)
            FROM sscore
          ) GROUP BY 1, 2, 3
        ), c2 AS (
          SELECT w1, w2, CAST(count(*) AS BIGINT) AS c2 FROM (
            SELECT unnest([struct_pack(w1 := t[i], w2 := t[i+1])
                           FOR i IN range(1, len(t))], recursive := true)
            FROM strain
          ) GROUP BY 1, 2
        ), ctxn1 AS (
          SELECT w1, CAST(sum(c2) AS BIGINT) AS ctx,
                 CAST(count(*) AS BIGINT) AS n1fwd
          FROM c2 GROUP BY 1
        ), cont AS (
          SELECT w2 AS w2c, CAST(count(*) AS BIGINT) AS ncont
          FROM c2 GROUP BY 1
        ), btot AS (
          SELECT CAST(count(*) AS BIGINT) AS b_types FROM c2
        ), contrib AS (
          SELECT tfb.doc_id, tfb.tf,
                 CASE WHEN c2.c2 IS NOT NULL THEN 0 ELSE tfb.tf END AS uns,
                 tfb.tf * CAST(round(ln(
                   CASE WHEN c2.c2 IS NOT NULL
                        THEN (c2.c2 - 0.75) / ctxn1.ctx
                             + (0.75 * ctxn1.n1fwd / ctxn1.ctx)
                               * (coalesce(CAST(cont.ncont AS DOUBLE), 0.5)
                                  / btot.b_types)
                        WHEN ctxn1.ctx IS NOT NULL
                        THEN (0.75 * ctxn1.n1fwd / ctxn1.ctx)
                             * (coalesce(CAST(cont.ncont AS DOUBLE), 0.5)
                                / btot.b_types)
                        ELSE coalesce(CAST(cont.ncont AS DOUBLE), 0.5)
                             / btot.b_types END), 6) AS DECIMAL(18,6)) AS s
          FROM tfb LEFT JOIN c2 USING (w1, w2)
                   LEFT JOIN ctxn1 USING (w1)
                   LEFT JOIN cont ON tfb.w2 = cont.w2c, btot
        )
        SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_bigrams,
               CAST(sum(uns) AS BIGINT) AS n_unseen,
               round(CAST(sum(s) AS DOUBLE) / sum(tf), 6) AS avg_ln_p
        FROM contrib GROUP BY 1 ORDER BY 1
    """,
    doc="Interpolated Kneser-Ney bigram LM (Kneser & Ney 1995; Chen & "
    "Goodman 1999's fixed-discount D=0.75 variant — the smoothing "
    "KenLM ships) scoring held-out docs (odd doc_id) against a model "
    "trained on the rest: p(w2|w1) = (c2-D)/ctx + D*N1+(w1,.)/ctx * "
    "N1+(.,w2)/B. Backs off to CONTINUATION counts, not raw unigram "
    "frequency — the 'Francisco' fix stupid backoff lacks. Unseen-w2 "
    "continuation floor 0.5/B, unknown-context full backoff "
    "(documented deviations, identical both engines). Exact integer "
    "counts, ln terms DECIMAL(18,6)-summed; n_unseen counts the "
    "interpolation-only occurrences (operators/text.py "
    "kneser_ney_scores).",
)
def q_kn_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    train = docs.filter((F.col("doc_id") % 2) == 0)
    held_out = docs.filter((F.col("doc_id") % 2) == 1)
    return T.kneser_ney_scores(held_out, model_df=train).orderBy("doc_id")


@register(
    "q_countmin_freq",
    oracle=r"""
        WITH words AS (
          SELECT unnest(list_filter(
                   string_split_regex(trim(lower(text)), '\s+'),
                   x -> x <> '')) AS w
          FROM documents WHERE text IS NOT NULL
        ), seeds AS (
          SELECT unnest(range(4)) AS d
        ), cms AS (
          SELECT d,
                 ('0x' || substring(md5(d || '|' || w), 1, 15))::BIGINT
                   % 1024 AS b,
                 count(*) AS c
          FROM words, seeds GROUP BY 1, 2
        ), top AS (
          SELECT w, CAST(count(*) AS BIGINT) AS exact_count
          FROM words GROUP BY 1
          ORDER BY exact_count DESC, w LIMIT 30
        )
        SELECT t.w AS word, t.exact_count,
               CAST(min(COALESCE(cms.c, 0)) AS BIGINT) AS cms_estimate
        FROM top t CROSS JOIN seeds s
        LEFT JOIN cms
          ON cms.d = s.d
         AND cms.b = ('0x' || substring(md5(s.d || '|' || t.w), 1, 15))
                       ::BIGINT % 1024
        GROUP BY 1, 2
        ORDER BY exact_count DESC, word
    """,
    doc="Count-min sketch frequency estimation "
    "(operators/sketches.py): build a 4x1024 CMS over corpus words — "
    "ONE map-side-combinable aggregation bounded at d*w counters "
    "regardless of input size, mergeable across shards by summing — "
    "then point-estimate the top-30 exact words and report estimate "
    "beside truth (CMS guarantees estimate >= exact; the gap is the "
    "collision error the d-row min controls). Hashing is the repo's "
    "md5-twin so DuckDB rebuilds the identical grid and estimates — "
    "full value-hash oracle over a probabilistic sketch.",
)
def q_countmin_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hw_kafka_streams_spark.cache import managed_persist
    from hw_kafka_streams_spark.operators.sketches import (
        cms_build_counted,
        cms_estimate,
    )
    from hw_kafka_streams_spark.operators.text import word_tokens

    docs = load_table(spark, "documents", sf_dir).filter(
        F.col("text").isNotNull()
    )
    # ONE corpus-sized aggregation shared by the sketch build and the
    # exact top-30: the persisted table is vocabulary-sized, and the
    # d hashes run once per distinct word, not per occurrence
    wc = managed_persist(
        docs.select(F.explode(word_tokens(F.lower(F.col("text")))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("exact_count"))
    )
    cms = cms_build_counted(wc, "w", "exact_count", depth=4, width=1024)
    top = wc.orderBy(F.desc("exact_count"), "w").limit(30)
    est = cms_estimate(cms, top.select("w"), "w", depth=4, width=1024)
    return (
        top.join(est, "w")
        .select(
            F.col("w").alias("word"),
            "exact_count",
            F.col("cms_estimate").cast("long").alias("cms_estimate"),
        )
        .orderBy(F.desc("exact_count"), "word")
    )


def _logreg_oracle_sql(lr: float = 1.0, iters: int = 16) -> str:
    """Unrolled-CTE DuckDB replay of logreg_fit_gd's full optimizer
    trajectory (operators/classify.py): identical standardization
    (population moments rounded to 9 dp, standardized features to
    6 dp), identical per-iteration weight rounding (9 dp), so the
    final weight vector hash-matches across engines — the same
    unrolled-iteration oracle pattern as BPE training
    (bpe_oracle_sql) and deterministic-Lloyd IVF."""
    head = """
        WITH raw AS MATERIALIZED (
          SELECT vec_id AS id,
                 CASE WHEN label < 5 THEN 1.0 ELSE 0.0 END AS y,
                 generate_subscripts(embedding, 1) AS dim,
                 CAST(unnest(embedding) AS DOUBLE) AS xv
          FROM embeddings
        ), mo AS MATERIALIZED (
          SELECT dim, round(avg(xv), 9) AS m,
                 CASE WHEN round(stddev_pop(xv), 9) > 0
                      THEN round(stddev_pop(xv), 9) ELSE 1.0 END AS s
          FROM raw GROUP BY dim
        ), feats AS MATERIALIZED (
          SELECT id, y, 0 AS dim, 1.0 AS xv
          FROM (SELECT DISTINCT id, y FROM raw)
          UNION ALL
          SELECT r.id, r.y, r.dim, round((r.xv - mo.m) / mo.s, 6) AS xv
          FROM raw r JOIN mo USING (dim)
        ), w_0 AS (SELECT DISTINCT dim, 0.0 AS w FROM feats)"""
    its = []
    for k in range(1, iters + 1):
        its.append(f"""
        , m_{k} AS MATERIALIZED (
          SELECT f.id, f.y, sum(f.xv * w.w) AS mg
          FROM feats f JOIN w_{k - 1} w USING (dim) GROUP BY f.id, f.y
        ), w_{k} AS MATERIALIZED (
          SELECT f.dim,
                 round(max(w.w) + {lr} * avg(f.xv
                       * (mm.y - 1.0 / (1.0 + exp(-mm.mg)))), 9) AS w
          FROM feats f JOIN m_{k} mm ON f.id = mm.id
               JOIN w_{k - 1} w ON f.dim = w.dim
          GROUP BY f.dim
        )""")
    tail = f"""
        , m_fin AS MATERIALIZED (
          SELECT f.id, f.y, sum(f.xv * w.w) AS mg
          FROM feats f JOIN w_{iters} w USING (dim) GROUP BY f.id, f.y
        ), acc AS (
          SELECT round(avg(CASE WHEN (CASE WHEN 1.0 / (1.0 + exp(-mg)) >= 0.5
                                     THEN 1.0 ELSE 0.0 END) = y
                           THEN 1.0 ELSE 0.0 END), 6) AS train_acc
          FROM m_fin
        )
        SELECT w.dim AS dim, round(w.w, 6) AS weight, acc.train_acc AS train_acc
        FROM w_{iters} w, acc ORDER BY dim"""
    return head + "".join(its) + tail


@register(
    "q_logreg_gd",
    oracle=_logreg_oracle_sql(lr=1.0, iters=16),
    doc="Binary logistic regression (label<5 vs rest over the 64-dim "
    "embeddings) trained by 16 full-batch gradient-descent steps "
    "(operators/classify.logreg_fit_gd) — the gradient-loop "
    "complement to the closed-form NB/OLS classifiers, in its "
    "exactly-reproducible form: per-dim standardization with 9-dp "
    "moments and 6-dp features, weights rounded to 9 dp after every "
    "update, so the whole optimizer trajectory is pinned across "
    "engines and the DuckDB oracle replays all 16 updates as "
    "unrolled CTEs and hash-matches the final 65 coefficients plus "
    "train accuracy. Spark plan: margin = zip_with dot product "
    "against broadcast weight literals (zero shuffle, pure JVM), "
    "gradient = one map-side-combined posexplode avg per iteration, "
    "driver state = d+1 floats — the broadcast-weights/tree-aggregate "
    "GD shape that scales to cluster-sized feature tables. On this "
    "synthetic fixture the classes are only weakly separable "
    "(~0.64 train acc vs 0.51 base rate) — the oracle verifies the "
    "trajectory, not model quality.",
)
def q_logreg_gd(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hw_kafka_streams_spark.operators.classify import logreg_fit_gd

    emb = load_table(spark, "embeddings", sf_dir)
    return logreg_fit_gd(
        emb, "embedding", F.col("label") < 5, lr=1.0, iters=16
    )


def _doremi_oracle(eta: float = 0.5, iters: int = 4) -> str:
    """Unrolled-CTE twin of operators/mixture.doremi_weights: identical
    count tables, per-scalar ln/exp rounding, DECIMAL sums, and
    integer-exact weight normalization per iteration (the driver's
    integer-nanos arithmetic equals DECIMAL(18,9) summation)."""
    head = """
        WITH tok AS MATERIALIZED (
          SELECT source AS g,
                 unnest(list_filter(string_split_regex(trim(text), '\\s+'),
                                    t -> t <> '')) AS t
          FROM documents WHERE text IS NOT NULL
        ), c AS MATERIALIZED (
          SELECT g, t, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY 1, 2
        ), tot AS MATERIALIZED (
          SELECT g, CAST(sum(c) AS DOUBLE) AS n FROM c GROUP BY 1
        ), nd AS (SELECT count(*) AS d FROM tot),
        own AS MATERIALIZED (
          SELECT c.g,
                 round(-CAST(sum(c.c * CAST(round(ln(c.c / tot.n), 6)
                                            AS DECIMAL(18,6))) AS DOUBLE)
                       / any_value(tot.n), 6) AS nll
          FROM c JOIN tot USING (g) GROUP BY c.g
        ),
        w_0 AS (SELECT g, round(1.0 / nd.d, 9) AS w FROM tot, nd)"""
    its = []
    for k in range(1, iters + 1):
        its.append(f"""
        , pm_{k} AS MATERIALIZED (
          SELECT c.t,
                 sum(CAST(round(w.w * c.c / tot.n, 12) AS DECIMAL(22,12)))
                   AS pm
          FROM c JOIN tot USING (g) JOIN w_{k - 1} w USING (g)
          GROUP BY c.t
        ), nm_{k} AS MATERIALIZED (
          SELECT c.g,
                 round(-CAST(sum(c.c * CAST(round(ln(CAST(pm.pm AS DOUBLE)), 6)
                                            AS DECIMAL(18,6))) AS DOUBLE)
                       / any_value(tot.n), 6) AS nll
          FROM c JOIN tot USING (g) JOIN pm_{k} pm ON c.t = pm.t
          GROUP BY c.g
        ), u_{k} AS MATERIALIZED (
          SELECT w.g,
                 CAST(round(w.w * round(exp(round({eta} * (nm.nll - own.nll),
                                                  6)), 9), 9)
                      AS DECIMAL(18,9)) AS u
          FROM w_{k - 1} w JOIN nm_{k} nm USING (g) JOIN own USING (g)
        ), w_{k} AS MATERIALIZED (
          SELECT g, round(CAST(u AS DOUBLE)
                          / CAST((SELECT sum(u) FROM u_{k}) AS DOUBLE), 9)
                      AS w
          FROM u_{k}
        )""")
    tail = f"""
        SELECT w.g AS source, round(w.w, 6) AS weight,
               own.nll AS nll_own, nm.nll AS nll_mix,
               round(nm.nll - own.nll, 6) AS excess
        FROM w_{iters} w JOIN own USING (g) JOIN nm_{iters} nm USING (g)
        ORDER BY source"""
    return head + "".join(its) + tail


@register(
    "q_doremi_weights",
    oracle=_doremi_oracle(eta=0.5, iters=4),
    doc="DoReMi-style iterative domain reweighting over the documents "
    "sources (operators/mixture.doremi_weights; public Xie et al. "
    "2023 shape with the proxy-transformer loss replaced by the "
    "exactly-computable unigram-LM NLL): 4 multiplicative-weight "
    "updates on per-domain excess loss, where the mixture LM is the "
    "weight-averaged per-domain distribution recomputed each "
    "iteration from the (domain, token) count table - so domains the "
    "current mixture covers poorly gain weight, the balanced-coverage "
    "objective DoReMi optimizes. Every ln/exp scalar is rounded at a "
    "declared decimal and summed as exact DECIMAL; weight "
    "normalization is integer-exact (driver integer-nanos = oracle "
    "DECIMAL(18,9) sums), so the whole 4-iteration trajectory "
    "hash-matches. Scale: the loop runs on the vocabulary*domains "
    "count table (corpus scanned once, persisted); driver state is "
    "|domains| floats.",
)
def q_doremi_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hw_kafka_streams_spark.operators.mixture import doremi_weights

    docs = load_table(spark, "documents", sf_dir)
    return doremi_weights(docs, "source", eta=0.5, iters=4)


# Poisson(1) CDF breakpoints scaled to the Mersenne-prime grid
# (P = 2^31 - 1): t[k] = floor(P(X<=k) * P). A (row, replicate)'s
# weight is the k whose interval contains its mixed hash - pure
# integer comparisons, so both engines derive IDENTICAL weights with
# zero float parsing drift. One md5 per ROW seeds the stream; each
# replicate then mixes with two MINSTD multiplicative rounds
# (u = ((seed + r*48271) * 16807 % P) * 48271 % P) - every product
# stays under 2^62, safe for BIGINT on both engines, and the repo's
# round-5 lesson applies: 100 md5s per row made this the slowest
# query in the registry (22 s at sf0.1); the integer mix is ~7x
# cheaper with the same determinism contract.
_MERS_P = (1 << 31) - 1
_POIS_T = [
    790015083,
    1580030167,
    1975037709,
    2106706890,
    2139624185,
    2146207644,
    2147304887,
    2147461637,
]
_BOOT_R = 100  # replicates; lower/upper order stats 3 and 98 ~ 95% CI


def _boot_w_sql(h: str) -> str:
    branches = " ".join(
        f"WHEN {h} < {t} THEN {k}" for k, t in enumerate(_POIS_T)
    )
    return f"CASE {branches} ELSE 8 END"


@register(
    "q_bootstrap_ci",
    oracle=f"""
        WITH base AS (
          SELECT event_type,
                 CAST(floor(value * 1000000.0) AS BIGINT) AS vq,
                 event_id
          FROM events
          WHERE value IS NOT NULL AND event_type IS NOT NULL
        ),
        seeded AS (
          SELECT event_type, vq,
                 ('0x' || substring(md5(event_id::VARCHAR), 1, 15))::BIGINT
                   % {_MERS_P} AS seed
          FROM base
        ),
        reps AS (
          SELECT event_type, vq, seed,
                 CAST(unnest(range({_BOOT_R})) AS BIGINT) AS r
          FROM seeded
        ),
        wtd AS (
          SELECT event_type, r, vq,
                 {_boot_w_sql(f"(((seed + r * 48271) % {_MERS_P}) * 16807 % {_MERS_P}) * 48271 % {_MERS_P}")} AS w
          FROM reps
        ),
        per_rep AS (
          SELECT event_type, r,
                 CAST(sum(w) AS BIGINT) AS sw,
                 sum(CAST(w AS HUGEINT) * vq) AS swv
          FROM wtd GROUP BY event_type, r
        ),
        means AS (
          SELECT event_type, r,
                 CAST(swv AS DOUBLE) / CAST(sw AS DOUBLE) / 1000000.0
                   AS mean_r,
                 row_number() OVER (
                   PARTITION BY event_type
                   ORDER BY CAST(swv AS DOUBLE) / CAST(sw AS DOUBLE), r
                 ) AS rn
          FROM per_rep WHERE sw > 0
        ),
        pt AS (
          SELECT event_type, CAST(count(*) AS BIGINT) AS n_rows,
                 round(CAST(sum(CAST(vq AS HUGEINT)) AS DOUBLE)
                       / count(*) / 1000000.0, 6) AS mean_value
          FROM base GROUP BY event_type
        )
        SELECT pt.event_type, pt.n_rows, pt.mean_value,
               round(min(CASE WHEN rn = 3 THEN mean_r END), 6) AS boot_lo,
               round(min(CASE WHEN rn = {_BOOT_R - 2} THEN mean_r END), 6)
                 AS boot_hi
        FROM pt JOIN means ON pt.event_type = means.event_type
        GROUP BY pt.event_type, pt.n_rows, pt.mean_value
        ORDER BY pt.event_type
    """,
    doc="Poisson-bootstrap 95% CI for mean(value) per event type - THE "
    "scalable bootstrap (each row draws an independent Poisson(1) "
    "replication weight per replicate, so no resampling pass ever "
    "materializes; the public recipe behind large-scale A/B CIs). "
    "Weights are DETERMINISTIC: one md5 seeds each row, each replicate "
    "mixes it with two MINSTD multiplicative rounds mod the Mersenne "
    "prime 2^31-1 (products bounded under 2^62 on both engines), and "
    "the mixed value is compared against precomputed integer CDF "
    "breakpoints floor(P(X<=k)*(2^31-1)) - no float parsing, no RNG "
    "state, replayable on any engine, and ~7x cheaper than hashing "
    "per (row, replicate). Values quantize to an exact micro-unit grid "
    "(floor(v*1e6), one IEEE multiply) so every replicate sum is "
    "integer-exact regardless of reducer order; the only doubles are "
    "the final per-replicate divisions. Plan: the x100 replicate "
    "fan-out is generated INSIDE the partial-aggregate stage (explode "
    "-> map-side combine), so the shuffle carries |event_types| x R "
    "rows, not |rows| x R; CI bounds are order statistics 3/98 of the "
    "100 replicate means via one bounded window over groups x R rows.",
)
def q_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = load_table(spark, "events", sf_dir).filter(
        F.col("value").isNotNull() & F.col("event_type").isNotNull()
    )
    base = ev.select(
        "event_type",
        F.floor(F.col("value") * 1000000.0).cast("long").alias("vq"),
        "event_id",
    )
    seeded = base.select(
        "event_type",
        "vq",
        (
            F.conv(
                F.substring(F.md5(F.col("event_id").cast("string")), 1, 15),
                16,
                10,
            ).cast("long")
            % F.lit(_MERS_P)
        ).alias("seed"),
    )
    reps = seeded.select(
        "event_type",
        "vq",
        "seed",
        F.explode(
            F.sequence(F.lit(0).cast("long"), F.lit(_BOOT_R - 1).cast("long"))
        ).alias("r"),
    )
    h = (
        ((F.col("seed") + F.col("r") * F.lit(48271)) % F.lit(_MERS_P))
        * F.lit(16807)
        % F.lit(_MERS_P)
        * F.lit(48271)
        % F.lit(_MERS_P)
    )
    w = F.lit(8)
    for k in range(len(_POIS_T) - 1, -1, -1):
        w = F.when(h < F.lit(_POIS_T[k]), F.lit(k)).otherwise(w)
    per_rep = (
        reps.select("event_type", "r", "vq", w.alias("w"))
        .groupBy("event_type", "r")
        .agg(
            F.sum("w").cast("long").alias("sw"),
            F.sum(
                F.col("w").cast("decimal(38,0)") * F.col("vq")
            ).alias("swv"),
        )
        .filter(F.col("sw") > 0)
    )
    mean_r = F.col("swv").cast("double") / F.col("sw").cast("double")
    means = per_rep.select(
        "event_type",
        "r",
        (mean_r / F.lit(1000000.0)).alias("mean_r"),
        F.row_number()
        .over(W.partitionBy("event_type").orderBy(mean_r, F.col("r")))
        .alias("rn"),
    )
    ci = means.groupBy("event_type").agg(
        F.round(F.min(F.when(F.col("rn") == 3, F.col("mean_r"))), 6).alias(
            "boot_lo"
        ),
        F.round(
            F.min(F.when(F.col("rn") == _BOOT_R - 2, F.col("mean_r"))), 6
        ).alias("boot_hi"),
    )
    pt = base.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.round(
            F.sum(F.col("vq").cast("decimal(38,0)")).cast("double")
            / F.count(F.lit(1))
            / F.lit(1000000.0),
            6,
        ).alias("mean_value"),
    )
    return (
        pt.join(ci, "event_type")
        .select("event_type", "n_rows", "mean_value", "boot_lo", "boot_hi")
        .orderBy("event_type")
    )


@register(
    "q_skipgram_pairs",
    oracle=r"""
        WITH d AS (
          SELECT doc_id,
                 list_filter(string_split_regex(trim(text), '\s+'),
                             e -> e <> '') AS ws
          FROM documents
          WHERE text IS NOT NULL AND trim(text) <> '' AND doc_id < 200
        ),
        toks AS (
          SELECT doc_id, unnest(ws) AS w,
                 CAST(unnest(range(1, len(ws) + 1)) AS INT) AS pos
          FROM d
        ),
        pairs AS (
          SELECT a.w AS center, b.w AS ctx
          FROM toks a JOIN toks b
            ON a.doc_id = b.doc_id
           AND b.pos BETWEEN a.pos - 2 AND a.pos + 2
           AND b.pos <> a.pos
        )
        SELECT center, ctx, CAST(count(*) AS BIGINT) AS n_pairs
        FROM pairs GROUP BY center, ctx
        ORDER BY n_pairs DESC, center, ctx LIMIT 50
    """,
    doc="Skip-gram (center, context) pair extraction with a +/-2 token "
    "window - the word2vec/GloVe co-occurrence data-prep stage of an "
    "embedding training pipeline. Each token joins to AT MOST 4 "
    "neighbors via a per-document position-range self-join (keyed on "
    "doc, bounded by the window - never corpus-quadratic), then one "
    "map-side-combined count and a TakeOrdered top-50 with full "
    "deterministic tie-break. At 100 TB the window bound makes the "
    "explode x5 linear and the (center, ctx) agg is the only "
    "shuffle; a vocabulary-capped variant would hash-prune rare "
    "words before the join.",
)
def q_skipgram_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = (
        load_table(spark, "documents", sf_dir)
        .filter(
            F.col("text").isNotNull()
            & (F.trim(F.col("text")) != "")
            & (F.col("doc_id") < 200)
        )
        .select(
            "doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("ws")
        )
    )
    toks = docs.select(
        "doc_id", F.posexplode("ws").alias("pos", "w")
    )
    a = toks.select("doc_id", F.col("pos").alias("pa"), F.col("w").alias("center"))
    b = toks.select(
        F.col("doc_id").alias("d2"),
        F.col("pos").alias("pb"),
        F.col("w").alias("ctx"),
    )
    pairs = a.join(
        b,
        (F.col("doc_id") == F.col("d2"))
        & (F.col("pb") >= F.col("pa") - 2)
        & (F.col("pb") <= F.col("pa") + 2)
        & (F.col("pb") != F.col("pa")),
    )
    return (
        pairs.groupBy("center", "ctx")
        .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
        .orderBy(F.desc("n_pairs"), "center", "ctx")
        .limit(50)
    )


# WordPiece vocab shared verbatim by the Spark operator and the DuckDB
# oracle: (piece_body, is_continuation). Single chars cover the corpus
# alphabet (so [UNK] needs a genuinely foreign word); multi-char pieces
# make greedy longest-match-first non-trivial.
_WP_VOCAB: list[tuple[str, bool]] = (
    [(c, False) for c in "abcdefghijklmnopqrstuvwy"]
    + [(c, True) for c in "abcdefghijklmnopqrstuvwy"]
    + [
        ("the", False), ("cust", False), ("tab", False), ("sc", False),
        ("qu", False), ("st", False), ("gr", False), ("sp", False),
        ("jo", False), ("ha", False), ("val", False), ("key", False),
        ("row", False), ("line", False), ("win", False),
        ("omer", True), ("le", True), ("an", True), ("ery", True),
        ("eam", True), ("ue", True), ("ow", True), ("er", True),
        ("ta", True), ("rt", True), ("up", True), ("in", True),
        ("dow", True), ("der", True), ("alue", True), ("umn", True),
    ]
)


def _wp_oracle(steps: int = 16) -> str:
    """Unroll the greedy WordPiece loop as ``steps`` CTE passes.

    Every pass consumes >= 1 character (single-char pieces cover the
    alphabet; unmatched chars collapse to [UNK] and jump to wl+1), so
    ``steps`` passes are sufficient for any word of length <= steps.
    The corpus max word length is 8 at every shipped SF; steps=16
    doubles that headroom, and the final SELECT raises via DuckDB's
    ``error()`` if any word is still unconsumed (pos <= wl) — a
    too-shallow unroll fails LOUDLY instead of hash-drifting
    (round-6 advisor item)."""
    vocab_rows = ", ".join(
        f"('{b}', {'TRUE' if c else 'FALSE'})" for b, c in _WP_VOCAB
    )
    ctes = [
        r"""WITH w AS (
          SELECT unnest(list_filter(string_split_regex(trim(text), '\s+'),
                                    e -> e <> '')) AS word
          FROM documents WHERE text IS NOT NULL)""",
        """words AS (SELECT word, CAST(count(*) AS BIGINT) AS c,
                 len(word) AS wl FROM w GROUP BY word)""",
        f"vocab(body, cont) AS (VALUES {vocab_rows})",
        "s0 AS (SELECT word, c, wl, 1 AS pos, '' AS acc, 0 AS np FROM words)",
    ]
    for j in range(1, steps + 1):
        ctes.append(
            f"""s{j} AS (
          SELECT word, c, wl,
                 CASE WHEN pos > wl THEN pos
                      WHEN body IS NULL THEN wl + 1
                      ELSE pos + len(body) END AS pos,
                 CASE WHEN pos > wl THEN acc
                      WHEN body IS NULL THEN '[UNK]'
                      WHEN np = 0 THEN disp
                      ELSE acc || '|' || disp END AS acc,
                 CASE WHEN pos > wl THEN np
                      WHEN body IS NULL THEN 1
                      ELSE np + 1 END AS np
          FROM (
            SELECT s.*, v.body,
                   CASE WHEN s.pos > 1 THEN '##' || v.body
                        ELSE v.body END AS disp,
                   row_number() OVER (
                     PARTITION BY s.word
                     ORDER BY len(v.body) DESC NULLS LAST) AS rn
            FROM s{j - 1} s LEFT JOIN vocab v
              ON s.pos <= s.wl
             AND v.cont = (s.pos > 1)
             AND substr(s.word, s.pos, len(v.body)) = v.body
          ) WHERE rn = 1)"""
        )
    body = ",\n        ".join(ctes)
    return f"""
        {body}
        SELECT word, c AS n_count,
               CASE WHEN pos <= wl
                    THEN error('wordpiece oracle unroll too shallow')
                    ELSE acc END AS pieces,
               CAST(np AS INT) AS n_pieces
        FROM s{steps} ORDER BY word
    """


@register(
    "q_wordpiece_encode",
    oracle=_wp_oracle(),
    doc="WordPiece inference (greedy longest-match-first, the BERT "
    "tokenizer; Wu et al. 2016) with a fixed piece vocabulary: each "
    "distinct corpus word is consumed left-to-right, the longest "
    "matching piece wins at every position, continuations carry the "
    "'##' prefix, and an unmatchable word collapses to [UNK]. Output "
    "is per-word (pieces, piece count, corpus count) - fertility "
    "joins straight off it. The tokenizer runs on the DISTINCT-WORD "
    "table (vocabulary-sized, never corpus-sized - the BPE trainer's "
    "compaction) via one Arrow-batched matcher, then joins counts "
    "back; the oracle unrolls the greedy loop as 16 CTE steps (2x the "
    "corpus max word length, error()-guarded against truncation) with "
    "a longest-match window over the same literal vocab "
    "(operators/bpe.wordpiece_encode_words).",
)
def q_wordpiece_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hw_kafka_streams_spark.operators.bpe import wordpiece_encode_words

    docs = load_table(spark, "documents", sf_dir).filter(
        F.col("text").isNotNull()
    )
    counts = (
        docs.select(
            F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("n_count"))
    )
    enc = wordpiece_encode_words(
        counts.select("word").distinct(), _WP_VOCAB
    )
    return (
        counts.join(enc, "word")
        .select("word", "n_count", "pieces", "n_pieces")
        .orderBy("word")
    )


@register(
    "q_diff_in_diff",
    oracle="""
        WITH bounds AS (
          SELECT min(epoch_us(ts)) AS t0, max(epoch_us(ts)) AS t1
          FROM events WHERE ts IS NOT NULL
        ),
        base AS (
          SELECT ('0x' || substring(md5(user_id::VARCHAR || ':did'),
                                    1, 15))::BIGINT % 2 AS treat,
                 CASE WHEN epoch_us(ts) >= b.t0 + (b.t1 - b.t0) // 2
                      THEN 1 ELSE 0 END AS post,
                 CAST(floor(value * 1000000.0) AS HUGEINT) AS vq
          FROM events, bounds b
          WHERE ts IS NOT NULL AND value IS NOT NULL
                AND user_id IS NOT NULL
        ),
        cells AS (
          SELECT treat, post,
                 CAST(count(*) AS BIGINT) AS n,
                 sum(vq) AS s
          FROM base GROUP BY treat, post
        ),
        m AS (
          SELECT
            max(CASE WHEN treat = 1 AND post = 1 THEN CAST(s AS DOUBLE) / n END) AS y11,
            max(CASE WHEN treat = 1 AND post = 0 THEN CAST(s AS DOUBLE) / n END) AS y10,
            max(CASE WHEN treat = 0 AND post = 1 THEN CAST(s AS DOUBLE) / n END) AS y01,
            max(CASE WHEN treat = 0 AND post = 0 THEN CAST(s AS DOUBLE) / n END) AS y00,
            max(CASE WHEN treat = 1 AND post = 1 THEN n END) AS n11,
            max(CASE WHEN treat = 1 AND post = 0 THEN n END) AS n10,
            max(CASE WHEN treat = 0 AND post = 1 THEN n END) AS n01,
            max(CASE WHEN treat = 0 AND post = 0 THEN n END) AS n00
          FROM cells
        )
        SELECT n00, n01, n10, n11,
               round(y10 / 1000000.0 - y00 / 1000000.0, 6) AS pre_gap,
               round(y11 / 1000000.0 - y01 / 1000000.0, 6) AS post_gap,
               round((y11 - y01) / 1000000.0
                     - (y10 - y00) / 1000000.0, 6) AS did_estimate
        FROM m
    """,
    doc="Difference-in-differences estimator: deterministic md5-hash "
    "treatment assignment per user, pre/post split at the exact "
    "integer-microsecond midpoint of the observed time range, and "
    "DiD = (post-treat - post-ctrl) - (pre-treat - pre-ctrl) - the "
    "workhorse quasi-experimental readout when randomization isn't "
    "available (here the hash makes ground truth ~0, so the query "
    "doubles as an A/A placebo audit: a non-zero DiD means the "
    "pipeline, not the data, injected a difference). Cell means ride "
    "exact HUGEINT/DECIMAL micro-unit sums (one map-side-combined "
    "pass over 4 cells); the only doubles are 4 final divisions - "
    "the cheapest possible panel shape at 100 TB.",
)
def q_diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir).filter(
        F.col("ts").isNotNull()
        & F.col("value").isNotNull()
        & F.col("user_id").isNotNull()
    )
    bounds = ev.agg(
        F.min(F.unix_micros("ts")).alias("t0"),
        F.max(F.unix_micros("ts")).alias("t1"),
    )
    treat = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("user_id").cast("string"), F.lit(":did"))),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        % 2
    )
    base = ev.crossJoin(F.broadcast(bounds)).select(
        treat.alias("treat"),
        F.when(
            F.unix_micros("ts")
            >= F.col("t0") + F.floor((F.col("t1") - F.col("t0")) / 2),
            1,
        )
        .otherwise(0)
        .alias("post"),
        F.floor(F.col("value") * 1000000.0)
        .cast("decimal(38,0)")
        .alias("vq"),
    )
    cells = base.groupBy("treat", "post").agg(
        F.count(F.lit(1)).cast("long").alias("n"), F.sum("vq").alias("s")
    )
    mean = F.col("s").cast("double") / F.col("n")

    def cell(t, p, col):
        return F.max(
            F.when((F.col("treat") == t) & (F.col("post") == p), col)
        )

    m = cells.agg(
        cell(1, 1, mean).alias("y11"),
        cell(1, 0, mean).alias("y10"),
        cell(0, 1, mean).alias("y01"),
        cell(0, 0, mean).alias("y00"),
        cell(1, 1, F.col("n")).alias("n11"),
        cell(1, 0, F.col("n")).alias("n10"),
        cell(0, 1, F.col("n")).alias("n01"),
        cell(0, 0, F.col("n")).alias("n00"),
    )
    micro = F.lit(1000000.0)
    return m.select(
        "n00",
        "n01",
        "n10",
        "n11",
        F.round(F.col("y10") / micro - F.col("y00") / micro, 6).alias(
            "pre_gap"
        ),
        F.round(F.col("y11") / micro - F.col("y01") / micro, 6).alias(
            "post_gap"
        ),
        F.round(
            (F.col("y11") - F.col("y01")) / micro
            - (F.col("y10") - F.col("y00")) / micro,
            6,
        ).alias("did_estimate"),
    )


@register(
    "q_conformal_interval",
    oracle=r"""
        WITH base AS (
          SELECT ('0x' || substring(md5(doc_id::VARCHAR || ':conf'),
                                    1, 15))::BIGINT % 10 AS bkt,
                 CAST(n_chars AS HUGEINT) AS x,
                 CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
                                      e -> e <> '')) AS HUGEINT) AS y
          FROM documents
          WHERE text IS NOT NULL AND n_chars IS NOT NULL
        ),
        mom AS (
          SELECT CAST(count(*) AS BIGINT) AS n,
                 sum(x) AS sx, sum(y) AS sy,
                 sum(x * y) AS sxy, sum(x * x) AS sxx
          FROM base WHERE bkt <= 5
        ),
        fit AS (
          SELECT n,
                 (n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                   / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                   AS slope,
                 sx, sy
          FROM mom
        ),
        fit2 AS (
          SELECT n AS n_train, slope,
                 (CAST(sy AS DOUBLE) - slope * CAST(sx AS DOUBLE)) / n
                   AS icept
          FROM fit
        ),
        scored AS (
          SELECT b.bkt,
                 CAST(floor(abs(CAST(b.y AS DOUBLE)
                                - (f.slope * CAST(b.x AS DOUBLE) + f.icept))
                            * 1000000.0) AS BIGINT) AS rq
          FROM base b, fit2 f WHERE b.bkt >= 6
        ),
        calh AS (
          SELECT rq, count(*) AS c FROM scored WHERE bkt <= 7 GROUP BY rq
        ),
        caln AS (SELECT CAST(sum(c) AS BIGINT) AS n_cal FROM calh),
        qhat AS (
          SELECT min(rq) AS q_micro FROM (
            SELECT rq, sum(c) OVER (ORDER BY rq) AS cum, n_cal
            FROM calh, caln
          ) WHERE cum >= ceil(0.9 * (n_cal + 1))
        )
        SELECT f.n_train, c.n_cal,
               CAST(count(*) AS BIGINT) AS n_test,
               round(f.slope, 6) AS slope,
               round(f.icept, 6) AS intercept,
               q.q_micro,
               round(CAST(sum(CASE WHEN s.rq <= q.q_micro THEN 1 ELSE 0 END)
                          AS DOUBLE) / count(*), 6) AS coverage
        FROM scored s, fit2 f, caln c, qhat q
        WHERE s.bkt >= 8
        GROUP BY f.n_train, c.n_cal, f.slope, f.icept, q.q_micro
    """,
    doc="Split-conformal prediction interval (Vovk et al.; the "
    "distribution-free coverage guarantee): hash-split 60/20/20 into "
    "train/calibration/test, OLS fit y~x on train (token count vs "
    "char count; exact HUGEINT moment sums, scalar epilogue), "
    "conformal radius q_hat = the ceil(0.9*(n_cal+1))-th smallest "
    "calibration |residual|, then EMPIRICAL coverage of prediction "
    "intervals +-q_hat on held-out test - the model-agnostic "
    "uncertainty audit (coverage must land near 90% regardless of "
    "the model's quality). Residuals quantize to exact micro-units "
    "so the order statistic comes from a COUNT-HISTOGRAM prefix sum "
    "(domain-bounded, never a row-buffer quantile - the "
    "exact_percentiles_histogram shape), and the only doubles are "
    "the fit epilogue and per-row scoring.",
)
def q_conformal_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = load_table(spark, "documents", sf_dir).filter(
        F.col("text").isNotNull() & F.col("n_chars").isNotNull()
    )
    bkt = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":conf"))),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        % 10
    )
    base = docs.select(
        bkt.alias("bkt"),
        F.col("n_chars").cast("decimal(38,0)").alias("x"),
        F.size(F.split(F.trim(F.col("text")), r"\s+"))
        .cast("decimal(38,0)")
        .alias("y"),
    )
    mom = base.filter(F.col("bkt") <= 5).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    nd = F.col("n").cast("double")
    slope = (
        nd * F.col("sxy").cast("double")
        - F.col("sx").cast("double") * F.col("sy").cast("double")
    ) / (
        nd * F.col("sxx").cast("double")
        - F.col("sx").cast("double") * F.col("sx").cast("double")
    )
    fit = mom.select(
        F.col("n").alias("n_train"), slope.alias("slope"), "sx", "sy", "n"
    ).select(
        "n_train",
        "slope",
        (
            (F.col("sy").cast("double") - F.col("slope") * F.col("sx").cast("double"))
            / F.col("n").cast("double")
        ).alias("icept"),
    )
    scored = base.filter(F.col("bkt") >= 6).crossJoin(F.broadcast(fit)).select(
        "bkt",
        "n_train",
        "slope",
        "icept",
        F.floor(
            F.abs(
                F.col("y").cast("double")
                - (F.col("slope") * F.col("x").cast("double") + F.col("icept"))
            )
            * F.lit(1000000.0)
        )
        .cast("long")
        .alias("rq"),
    )
    calh = (
        scored.filter(F.col("bkt") <= 7)
        .groupBy("rq")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    caln = calh.agg(F.sum("c").cast("long").alias("n_cal"))
    cum = calh.crossJoin(F.broadcast(caln)).select(
        "rq",
        "n_cal",
        F.sum("c")
        .over(
            W.partitionBy(F.lit(0))
            .orderBy("rq")
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        )
        .alias("cum"),
    )
    qhat = (
        cum.filter(F.col("cum") >= F.ceil(0.9 * (F.col("n_cal") + 1)))
        .agg(F.min("rq").alias("q_micro"))
    )
    test = scored.filter(F.col("bkt") >= 8).crossJoin(F.broadcast(qhat)).crossJoin(
        F.broadcast(caln)
    )
    return test.groupBy("n_train", "n_cal", "slope", "icept", "q_micro").agg(
        F.count(F.lit(1)).cast("long").alias("n_test"),
        F.round(
            F.sum(F.when(F.col("rq") <= F.col("q_micro"), 1).otherwise(0)).cast(
                "double"
            )
            / F.count(F.lit(1)),
            6,
        ).alias("coverage"),
    ).select(
        "n_train",
        "n_cal",
        "n_test",
        F.round("slope", 6).alias("slope"),
        F.round("icept", 6).alias("intercept"),
        "q_micro",
        "coverage",
    )


# Unigram-LM tokenizer vocab shared verbatim by the Spark operator and
# the DuckDB oracle: (piece, integer cost = scaled -log p). Single
# chars cover the corpus alphabet minus x/z (so genuinely foreign words
# collapse to [UNK]); multi-char pieces are priced so the Viterbi DP
# sometimes prefers two short pieces over one long one — the case
# greedy WordPiece gets wrong by construction.
_UNI_VOCAB: list[tuple[str, int]] = (
    [(c, 60) for c in "abcdefghijklmnopqrstuvwy"]
    + [
        ("the", 30), ("er", 33), ("in", 35), ("up", 36), ("an", 37),
        ("ow", 38), ("ue", 39), ("le", 40), ("st", 41), ("der", 41),
        ("ery", 42), ("ta", 43), ("eam", 43), ("qu", 44), ("ha", 44),
        ("omer", 45), ("rt", 45), ("gr", 46), ("jo", 46), ("row", 47),
        ("sc", 47), ("tab", 48), ("sp", 48), ("key", 49), ("cust", 50),
        ("dow", 50), ("win", 51), ("val", 52), ("line", 53), ("umn", 54),
        ("alue", 55),
    ]
)


def _uni_oracle(steps: int = 16) -> str:
    """Unroll the Viterbi DP as ``steps`` position CTEs: step j adds
    the best (cost, n_pieces, pieces) tuple covering word[:j] — a
    struct-min over every vocab piece ending at j, exactly the
    operator's lexicographic tie-break. Sufficient for any word of
    length <= steps (corpus max is 8); the final SELECT error()s if a
    longer word ever appears rather than silently mis-segmenting."""
    vocab_rows = ", ".join(f"('{p}', {c})" for p, c in _UNI_VOCAB)
    ctes = [
        r"""w AS (
          SELECT unnest(list_filter(string_split_regex(trim(text), '\s+'),
                                    e -> e <> '')) AS word
          FROM documents WHERE text IS NOT NULL)""",
        """words AS (SELECT word, CAST(count(*) AS BIGINT) AS c,
                 len(word) AS wl FROM w GROUP BY word)""",
        f"vocab(p, cost) AS (VALUES {vocab_rows})",
        """b0 AS (SELECT word, c, wl, 0 AS pos,
                 CAST(0 AS BIGINT) AS score, 0 AS np, '' AS acc
                 FROM words)""",
    ]
    # AS MATERIALIZED is load-bearing: each step references its
    # predecessor TWICE (carry-forward union + new-position scan), so
    # letting DuckDB inline the chain doubles the plan per step — 2^16
    # parquet scans ("too many open files") instead of 16 small tables.
    for j in range(1, steps + 1):
        ctes.append(
            f"""b{j} AS MATERIALIZED (
          SELECT * FROM b{j - 1}
          UNION ALL
          SELECT word, c, wl, {j} AS pos,
                 m.sc AS score, m.np AS np, m.acc AS acc
          FROM (
            SELECT s.word, s.c, s.wl,
                   min(struct_pack(
                     sc := s.score + v.cost,
                     np := s.np + 1,
                     acc := CASE WHEN s.acc = '' THEN v.p
                                 ELSE s.acc || '|' || v.p END)) AS m
            FROM b{j - 1} s JOIN vocab v
              ON s.pos = {j} - len(v.p)
             AND {j} <= s.wl
             AND substr(s.word, s.pos + 1, len(v.p)) = v.p
            GROUP BY s.word, s.c, s.wl
          ))"""
        )
    body = ",\n        ".join(ctes)
    return f"""
        WITH {body}
        SELECT words.word, words.c AS n_count,
               CASE WHEN words.wl > {steps}
                    THEN error('unigram oracle unroll too shallow')
                    WHEN b.acc IS NULL THEN '[UNK]'
                    ELSE b.acc END AS pieces,
               CAST(coalesce(b.np, 1) AS INT) AS n_pieces,
               b.score AS cost
        FROM words LEFT JOIN
             (SELECT word, score, np, acc FROM b{steps}
              WHERE pos = wl) b USING (word)
        ORDER BY words.word
    """


@register(
    "q_unigram_tokenize",
    oracle=_uni_oracle(),
    doc="Unigram-LM tokenizer inference (Kudo 2018, the SentencePiece "
    "segmentation model) - the third tokenizer family beside BPE "
    "(q_bpe_encode) and WordPiece (q_wordpiece_encode): each distinct "
    "corpus word gets the VITERBI-optimal segmentation minimizing "
    "total integer piece cost (scaled -log p), with deterministic "
    "(cost, piece count, piece string) tie-break, so a locally longer "
    "piece loses when two shorter pieces are jointly cheaper - the "
    "case greedy longest-match mis-tokenizes by construction. Runs on "
    "the DISTINCT-word table (vocabulary-sized, never corpus-sized) "
    "via one Arrow-batched DP, corpus counts joined back; the oracle "
    "unrolls the DP as 16 position CTEs (2x corpus max word length, "
    "error()-guarded), each a struct-min over pieces ending at that "
    "position (operators/bpe.unigram_viterbi_segment).",
)
def q_unigram_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hw_kafka_streams_spark.operators.bpe import unigram_viterbi_segment

    docs = load_table(spark, "documents", sf_dir).filter(
        F.col("text").isNotNull()
    )
    counts = (
        docs.select(
            F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("n_count"))
    )
    enc = unigram_viterbi_segment(counts.select("word").distinct(), _UNI_VOCAB)
    return (
        counts.join(enc, "word")
        .select("word", "n_count", "pieces", "n_pieces", "cost")
        .orderBy("word")
    )


@register(
    "q_association_rules",
    oracle="""
        WITH b AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
                   FROM lineitem),
        nn AS (SELECT count(DISTINCT o) AS n FROM b),
        ic AS (SELECT p, count(*) AS c FROM b GROUP BY 1),
        pairs AS (
          SELECT a.p AS pa, c.p AS pb, count(*) AS np
          FROM b a JOIN b c ON a.o = c.o AND a.p < c.p
          GROUP BY 1, 2 HAVING count(*) >= 2
        )
        SELECT CAST(pa AS BIGINT) AS part_a, CAST(pb AS BIGINT) AS part_b,
               CAST(np AS BIGINT) AS n_both,
               round(np * 1.0 / nn.n, 6) AS support,
               round(np * 1.0 / ia.c, 6) AS conf_a_to_b,
               round(np * 1.0 / ib.c, 6) AS conf_b_to_a,
               round(np * 1.0 * nn.n / (ia.c * ib.c), 6) AS lift
        FROM pairs
        JOIN ic ia ON ia.p = pairs.pa
        JOIN ic ib ON ib.p = pairs.pb
        CROSS JOIN nn
        ORDER BY lift DESC, part_a, part_b LIMIT 40
    """,
    doc="Market-basket association rules (Agrawal & Srikant 1994, the "
    "Apriori support/confidence/lift readout) over order baskets: "
    "frequent part pairs (min support count 2) with both rule "
    "directions' confidence and the symmetric lift. Scale shape: the "
    "pair enumeration is a per-basket self-join - bounded by basket "
    "size squared per order, never corpus-quadratic - and the item "
    "counts broadcast back onto the filtered pair table; every "
    "statistic is one integer-ratio division rounded at the output "
    "edge, so both engines agree bit-for-bit. Top-40 by lift via "
    "TakeOrderedAndProject.",
)
def q_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    b = (
        load_table(spark, "lineitem", sf_dir)
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    from hw_kafka_streams_spark.cache import managed_persist

    b = managed_persist(b)
    n_orders = b.select("o").distinct().count()
    ic = b.groupBy("p").agg(F.count(F.lit(1)).alias("c"))
    a = b.select(F.col("o").alias("o1"), F.col("p").alias("pa"))
    c = b.select(F.col("o").alias("o2"), F.col("p").alias("pb"))
    pairs = (
        a.join(c, (F.col("o1") == F.col("o2")) & (F.col("pa") < F.col("pb")))
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("np"))
        .filter(F.col("np") >= 2)
    )
    ia = ic.select(F.col("p").alias("pa"), F.col("c").alias("ca"))
    ib = ic.select(F.col("p").alias("pb"), F.col("c").alias("cb"))
    return (
        pairs.join(F.broadcast(ia), "pa")
        .join(F.broadcast(ib), "pb")
        .select(
            F.col("pa").alias("part_a"),
            F.col("pb").alias("part_b"),
            F.col("np").alias("n_both"),
            F.round(F.col("np") / F.lit(n_orders), 6).alias("support"),
            F.round(F.col("np") / F.col("ca"), 6).alias("conf_a_to_b"),
            F.round(F.col("np") / F.col("cb"), 6).alias("conf_b_to_a"),
            F.round(
                F.col("np") * F.lit(n_orders) / (F.col("ca") * F.col("cb")), 6
            ).alias("lift"),
        )
        .orderBy(F.desc("lift"), "part_a", "part_b")
        .limit(40)
    )


@register(
    "q_phrase_search",
    oracle=r"""
        WITH toks AS (
          SELECT doc_id,
                 list_filter(string_split_regex(trim(lower(text)), '\s+'),
                             t -> t <> '') AS t
          FROM documents
        ), hits AS (
          SELECT doc_id,
                 CAST(len(list_filter(range(1, len(t)),
                      i -> t[i] = 'hash' AND t[i+1] = 'join'))
                   AS BIGINT) AS n_hits
          FROM toks
        )
        SELECT doc_id, n_hits FROM hits WHERE n_hits > 0 ORDER BY doc_id
    """,
    doc="Exact phrase search ('hash join') via a POSITIONAL inverted "
    "index: posexplode to (doc, pos, term) postings, filter each "
    "term's posting list BEFORE the join (the selective step — at "
    "crawl scale each list is a tiny fraction of the corpus), then "
    "equi-join on (doc_id, pos+1) — the adjacency join every "
    "phrase-capable search engine runs. The oracle counts adjacent "
    "pairs with a per-doc list scan — a structurally different "
    "algorithm, so agreement cross-validates both. One shuffle keyed "
    "(doc_id, pos) on two pre-filtered posting lists; no windows.",
)
def q_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    tok = docs.select(
        "doc_id",
        F.posexplode(T.word_tokens(F.lower(F.col("text")))).alias(
            "pos", "w"
        ),
    )
    a = tok.filter(F.col("w") == "hash").select("doc_id", "pos")
    b = tok.filter(F.col("w") == "join").select(
        "doc_id", (F.col("pos") - 1).alias("pos")
    )
    return (
        a.join(b, ["doc_id", "pos"])
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
        .orderBy("doc_id")
    )


@register(
    "q_hill_tail_index",
    oracle=r"""
        WITH wc AS (
          SELECT w, CAST(count(*) AS BIGINT) AS c FROM (
            SELECT unnest(list_filter(
                     string_split_regex(trim(lower(text)), '\s+'),
                     t -> t <> '')) AS w
            FROM documents
          ) GROUP BY 1
        ), ranked AS (
          SELECT w, c,
                 row_number() OVER (ORDER BY c DESC, w) AS rn
          FROM wc
        ), tail AS (
          SELECT c AS c_tail FROM ranked WHERE rn = 17
        )
        SELECT 16 AS k_used, t.c_tail,
               round(16.0 / CAST(sum(CAST(round(
                   ln(CAST(r.c AS DOUBLE) / t.c_tail), 9)
                 AS DECIMAL(18,9))) AS DOUBLE), 6) AS hill_alpha
        FROM ranked r, tail t
        WHERE r.rn <= 16
        GROUP BY t.c_tail
    """,
    doc="Hill estimator of the word-frequency tail index (the "
    "power-law exponent diagnostic beside q_zipf_heaps' rank-slope "
    "view): alpha = k / sum_{i<=k} ln(c_i / c_{k+1}) over the k=16 "
    "largest counts, ties broken by word so both engines pick the "
    "same order statistics. Scale shape: one word-count shuffle, a "
    "top-17 TakeOrdered (bounded), and a 16-row DECIMAL-summed "
    "epilogue — never a global rank over the vocabulary.",
)
def q_hill_tail_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    wc = (
        docs.select(
            F.explode(T.word_tokens(F.lower(F.col("text")))).alias("w")
        )
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    top = wc.orderBy(F.desc("c"), "w").limit(17)
    # rank 17 under (c DESC, w ASC) == rank 1 under the reversed order
    tail = (
        top.orderBy("c", F.desc("w"))
        .limit(1)
        .select(F.col("c").alias("c_tail"), F.col("w").alias("w_tail"))
    )
    return (
        top.crossJoin(F.broadcast(tail))
        .filter(F.col("w") != F.col("w_tail"))
        .groupBy("c_tail")
        .agg(
            F.round(
                F.lit(16.0)
                / F.sum(
                    F.round(
                        F.log(F.col("c").cast("double") / F.col("c_tail")),
                        9,
                    ).cast("decimal(18,9)")
                ).cast("double"),
                6,
            ).alias("hill_alpha")
        )
        .select(F.lit(16).alias("k_used"), "c_tail", "hill_alpha")
    )


@register(
    "q_cond_entropy",
    oracle=r"""
        WITH toks AS (
          SELECT source,
                 list_filter(string_split_regex(trim(lower(text)), '\s+'),
                             t -> t <> '') AS t
          FROM documents
        ), c2 AS (
          SELECT source, w1, w2, CAST(count(*) AS BIGINT) AS c2 FROM (
            SELECT source,
                   unnest([struct_pack(w1 := t[i], w2 := t[i+1])
                           FOR i IN range(1, len(t))], recursive := true)
            FROM toks
          ) GROUP BY 1, 2, 3
        ), ctx AS (
          SELECT source, w1, CAST(sum(c2) AS BIGINT) AS ctx
          FROM c2 GROUP BY 1, 2
        ), n AS (
          SELECT source, CAST(sum(c2) AS BIGINT) AS nb FROM c2 GROUP BY 1
        )
        SELECT c2.source, min(n.nb) AS n_bigrams,
               round(CAST(sum(CAST(round(
                   -(CAST(c2.c2 AS DOUBLE) / n.nb)
                   * ln(CAST(c2.c2 AS DOUBLE) / ctx.ctx), 9)
                 AS DECIMAL(18,9))) AS DOUBLE), 6) AS cond_entropy,
               round(CAST(sum(CAST(round(
                   -(CAST(c2.c2 AS DOUBLE) / n.nb)
                   * ln(CAST(c2.c2 AS DOUBLE) / n.nb), 9)
                 AS DECIMAL(18,9))) AS DOUBLE), 6) AS joint_entropy
        FROM c2 JOIN ctx USING (source, w1) JOIN n USING (source)
        GROUP BY 1 ORDER BY 1
    """,
    doc="Conditional bigram entropy H(w2|w1) per source (plus the "
    "joint H(w1,w2)) — the sequential-predictability signal: "
    "machine-generated or templated text has LOW conditional entropy "
    "(each word pins the next) even when its unigram entropy looks "
    "normal, which is why this catches paraphrase-mill content that "
    "q_char_entropy misses. H(w2|w1) = -sum p(w1,w2) ln p(w2|w1), "
    "exact integer counts, per-term 9dp DECIMAL sums. Scale shape: "
    "one corpus explode to (source, w1, w2) counts (map-side "
    "combined), the ctx marginal from a second pass over that "
    "already-tiny table, a source-keyed rollup at the end.",
)
def q_cond_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hw_kafka_streams_spark.operators.text import _adjacent_pairs

    docs = load_table(spark, "documents", sf_dir)
    c2 = (
        docs.select(
            "source",
            F.explode(
                _adjacent_pairs(T.word_tokens(F.lower(F.col("text"))))
            ).alias("p"),
        )
        .groupBy(
            "source", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2")
        )
        .agg(F.count(F.lit(1)).alias("c2"))
    )
    ctx = c2.groupBy("source", "w1").agg(F.sum("c2").alias("ctx"))
    n = c2.groupBy("source").agg(F.sum("c2").alias("nb"))
    pj = F.col("c2").cast("double") / F.col("nb")
    pc = F.col("c2").cast("double") / F.col("ctx")
    return (
        c2.join(ctx, ["source", "w1"])
        .join(F.broadcast(n), "source")
        .groupBy("source")
        .agg(
            F.min("nb").alias("n_bigrams"),
            F.round(
                F.sum(
                    F.round(-pj * F.log(pc), 9).cast("decimal(18,9)")
                ).cast("double"),
                6,
            ).alias("cond_entropy"),
            F.round(
                F.sum(
                    F.round(-pj * F.log(pj), 9).cast("decimal(18,9)")
                ).cast("double"),
                6,
            ).alias("joint_entropy"),
        )
        .orderBy("source")
    )


@register(
    "q_percolator",
    oracle=r"""
        WITH stored(qid, terms) AS (VALUES
          (1, ['hash', 'join']),
          (2, ['scan', 'filter', 'slow']),
          (3, ['sort', 'merge']),
          (4, ['vector', 'batch', 'fast']),
          (5, ['window']),
          (6, ['customer', 'order', 'line']),
          (7, ['zzz_nonexistent']),
          (8, ['spark', 'key'])
        ), toks AS (
          SELECT doc_id,
                 list_distinct(list_filter(
                   string_split_regex(trim(lower(text)), '\s+'),
                   t -> t <> '')) AS t
          FROM documents
        ), hits AS (
          SELECT s.qid, count(*) AS n_docs, min(d.doc_id) AS first_doc
          FROM stored s JOIN toks d ON list_has_all(d.t, s.terms)
          GROUP BY 1
        )
        SELECT s.qid, CAST(len(s.terms) AS INT) AS n_terms,
               CAST(coalesce(h.n_docs, 0) AS BIGINT) AS n_docs,
               h.first_doc
        FROM stored s LEFT JOIN hits h USING (qid)
        ORDER BY s.qid
    """,
    doc="Percolator (reverse search: match STORED queries against the "
    "document stream — the alerting/routing primitive behind saved "
    "searches and topic taps): 8 stored AND-term queries, a doc "
    "matches when it contains every term. Spark runs the scalable "
    "inverted shape — distinct (doc, term) postings joined to the "
    "BROADCAST query-term table, then count-equals-arity per (doc, "
    "query) — while the oracle scans each doc's token list with "
    "list_has_all: two structurally different algorithms, so "
    "agreement cross-validates both. Includes a zero-match query "
    "(LEFT-join epilogue must keep it). Scale shape: postings are "
    "(doc, term)-keyed and pre-filtered to query terms BEFORE any "
    "shuffle; stored queries broadcast; never a per-doc regex loop.",
)
def q_percolator(spark: SparkSession, sf_dir: str) -> DataFrame:
    stored = spark.createDataFrame(
        [
            (1, ["hash", "join"]),
            (2, ["scan", "filter", "slow"]),
            (3, ["sort", "merge"]),
            (4, ["vector", "batch", "fast"]),
            (5, ["window"]),
            (6, ["customer", "order", "line"]),
            (7, ["zzz_nonexistent"]),
            (8, ["spark", "key"]),
        ],
        "qid int, terms array<string>",
    )
    qterms = stored.select(
        "qid",
        F.size("terms").alias("n_terms"),
        F.explode("terms").alias("w"),
    )
    docs = load_table(spark, "documents", sf_dir)
    postings = (
        docs.select(
            "doc_id",
            F.explode(
                F.array_distinct(T.word_tokens(F.lower(F.col("text"))))
            ).alias("w"),
        )
    )
    matched = (
        postings.join(F.broadcast(qterms), "w")
        .groupBy("doc_id", "qid", "n_terms")
        .agg(F.count(F.lit(1)).alias("n_hit"))
        .filter(F.col("n_hit") == F.col("n_terms"))
    )
    hits = matched.groupBy("qid").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("doc_id").alias("first_doc"),
    )
    return (
        stored.select("qid", F.size("terms").alias("n_terms"))
        .join(hits, "qid", "left")
        .select(
            "qid",
            "n_terms",
            F.coalesce(F.col("n_docs"), F.lit(0)).cast("long").alias("n_docs"),
            "first_doc",
        )
        .orderBy("qid")
    )


def _bt_oracle(iters: int = 3) -> str:
    """Unrolled-CTE DuckDB replay of the Bradley-Terry MM trajectory
    (Hunter 2004): per-opponent denominator terms and the
    normalization sum are round-to-9dp DECIMAL sums, strengths
    rounded to 9dp after every update — the same pinned-trajectory
    oracle pattern as q_logreg_gd / q_doremi_weights."""
    head = """
        WITH ut AS MATERIALIZED (
          SELECT user_id, event_type AS t, count(*) AS c
          FROM events GROUP BY 1, 2
        ),
        m AS MATERIALIZED (
          SELECT a.t AS i, b.t AS j,
                 CASE WHEN a.c > b.c THEN a.t ELSE b.t END AS winner
          FROM ut a JOIN ut b
            ON a.user_id = b.user_id AND a.t < b.t
          WHERE a.c <> b.c
        ),
        n_ij AS MATERIALIZED (SELECT i, j, CAST(count(*) AS BIGINT) AS n
                 FROM m GROUP BY 1, 2),
        wins AS MATERIALIZED (SELECT winner AS t, CAST(count(*) AS BIGINT) AS w
                 FROM m GROUP BY 1),
        items AS (SELECT DISTINCT t FROM ut),
        sym AS MATERIALIZED (SELECT i AS t, j AS o, n FROM n_ij
                UNION ALL SELECT j, i, n FROM n_ij),
        p_0 AS (SELECT t, round(1.0 / (SELECT count(*) FROM items), 9)
                       AS p
                FROM items)"""
    its = []
    for k in range(1, iters + 1):
        its.append(f"""
        , den_{k} AS (
          SELECT s.t,
                 CAST(sum(CAST(round(s.n / (pt.p + po.p), 9)
                      AS DECIMAL(28,9))) AS DOUBLE) AS den
          FROM sym s JOIN p_{k - 1} pt ON s.t = pt.t
               JOIN p_{k - 1} po ON s.o = po.t
          GROUP BY s.t
        ), raw_{k} AS (
          SELECT d.t,
                 round(COALESCE(w.w, 0) / d.den, 9) AS pr
          FROM den_{k} d LEFT JOIN wins w USING (t)
        ), p_{k} AS (
          SELECT t, round(pr / (
            SELECT CAST(sum(CAST(round(pr, 9) AS DECIMAL(28,9)))
                   AS DOUBLE) FROM raw_{k}), 9) AS p
          FROM raw_{k}
        )""")
    tail = f"""
        SELECT i.t AS event_type,
               CAST(COALESCE((SELECT sum(n) FROM sym WHERE sym.t = i.t),
                             0) AS BIGINT) AS n_matches,
               CAST(COALESCE(w.w, 0) AS BIGINT) AS wins,
               round(p.p, 6) AS bt_strength
        FROM items i LEFT JOIN wins w ON i.t = w.t
             JOIN p_{iters} p ON i.t = p.t
        ORDER BY event_type"""
    return head + "".join(its) + tail


@register(
    "q_bradley_terry",
    oracle=_bt_oracle(iters=3),
    doc="Bradley-Terry preference strengths over event types, fit by "
    "3 unrolled MM updates (Hunter 2004: p_i <- w_i / sum_j "
    "n_ij/(p_i+p_j), renormalized) — the batch preference model "
    "behind reward-model data curation (pairwise comparisons -> "
    "per-item strengths). 'Matches' are per-user activity duels: for "
    "each user and each type pair, the type with more of that user's "
    "events wins (ties void). Scale shape: the duel derivation is "
    "one (user, type) count shuffle + a per-user self-join with "
    "fan-out bounded by k^2 event types; everything after lives on "
    "k-row tables (k = 5), so the MM iterations are broadcast-only. "
    "Trajectory pinned by 9dp rounding of every denominator term, "
    "update, and normalization (DECIMAL sums, reducer-order-proof); "
    "the DuckDB oracle replays all 3 updates as unrolled CTEs.",
)
def q_bradley_terry(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, "events", sf_dir)
    ut = e.groupBy("user_id", F.col("event_type").alias("t")).agg(
        F.count(F.lit(1)).alias("c")
    )
    a, b = ut.alias("a"), ut.alias("b")
    m = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.t") < F.col("b.t")),
        )
        .filter(F.col("a.c") != F.col("b.c"))
        .select(
            F.col("a.t").alias("i"),
            F.col("b.t").alias("j"),
            F.when(F.col("a.c") > F.col("b.c"), F.col("a.t"))
            .otherwise(F.col("b.t"))
            .alias("winner"),
        )
    )
    # One pass over the duel table computes every model input; all
    # are k^2-bounded (k = #event types), so collect them once and run
    # the MM iterations over literal frames — the heavy lineage
    # (events scan + per-user self-join) executes exactly once, and
    # each iteration's job is a handful of sub-ms literal-table joins.
    stats = (
        m.groupBy("i", "j")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum((F.col("winner") == F.col("i")).cast("long")).alias(
                "wi"
            ),
        )
        .collect()
    )
    sym_rows = [(r.i, r.j, r.n) for r in stats] + [
        (r.j, r.i, r.n) for r in stats
    ]
    win_counts: dict = {}
    for r in stats:
        win_counts[r.i] = win_counts.get(r.i, 0) + r.wi
        win_counts[r.j] = win_counts.get(r.j, 0) + (r.n - r.wi)
    item_list = sorted({t for t, _, _ in sym_rows})
    n_to = {(t, o): n for t, o, n in sym_rows}
    tot = {t: sum(n for (tt, _), n in n_to.items() if tt == t)
           for t in item_list}
    k_items = len(item_list)

    # MM iterations as 1-row projection jobs: every round/divide runs
    # through the SAME engine expressions the k-row-table form used
    # (F.round half-up, DECIMAL(28,9) exact term sums), but with the
    # k^2-bounded model state inlined as literals there is nothing to
    # shuffle — 3 sub-second jobs instead of 3 multi-stage ones. The
    # oracle replays the identical trajectory in unrolled CTEs.
    def dec_sum(cols):
        out = cols[0]
        for c in cols[1:]:
            out = out + c
        return out

    p9 = {
        t: spark.range(1)
        .select(F.round(F.lit(1.0) / F.lit(float(k_items)), 9).alias("p"))
        .first()[0]
        for t in item_list[:1]
    }
    p9 = {t: p9[item_list[0]] for t in item_list}
    for _ in range(3):
        pr_exprs = {}
        for t in item_list:
            terms = [
                F.round(
                    F.lit(n_to[(t, o)]) / (F.lit(p9[t]) + F.lit(p9[o])), 9
                ).cast("decimal(28,9)")
                for o in item_list
                if (t, o) in n_to
            ]
            den = dec_sum(terms).cast("double")
            pr_exprs[t] = F.round(
                F.lit(win_counts.get(t, 0)) / den, 9
            )
        srow = spark.range(1).select(
            *[pr_exprs[t].alias(f"pr_{i}") for i, t in enumerate(item_list)],
            dec_sum(
                [
                    F.round(pr_exprs[t], 9).cast("decimal(28,9)")
                    for t in item_list
                ]
            )
            .cast("double")
            .alias("s"),
        )
        prow = spark.range(1).select(
            *[
                F.round(pr_exprs[t] / srow.select("s").first()[0], 9).alias(
                    f"p_{i}"
                )
                for i, t in enumerate(item_list)
            ]
        ).first()
        p9 = {t: prow[f"p_{i}"] for i, t in enumerate(item_list)}
    final = spark.createDataFrame(
        [
            (t, tot.get(t, 0), win_counts.get(t, 0), p9[t])
            for t in item_list
        ],
        "event_type string, n_matches long, wins long, p double",
    )
    return final.select(
        "event_type",
        "n_matches",
        "wins",
        F.round(F.col("p"), 6).alias("bt_strength"),
    ).orderBy("event_type")


@register(
    "q_dp_noisy_counts",
    oracle="""
        WITH per AS (
          SELECT source, CAST(count(*) AS BIGINT) AS n_true
          FROM documents GROUP BY 1
        ),
        u AS (
          SELECT source, n_true,
                 CAST(('0x' || substring(md5(source || ':dp42'), 1, 15))
                      AS BIGINT) / 1152921504606846976.0 - 0.5 AS uu
          FROM per
        )
        SELECT source, n_true,
               round(n_true
                     - 1.0 * CASE WHEN uu >= 0 THEN 1.0 ELSE -1.0 END
                       * ln(GREATEST(1 - 2 * abs(uu), 1e-18)), 4)
                 AS noisy_n,
               1.0 AS nominal_epsilon
        FROM u ORDER BY source
    """,
    doc="Laplace-mechanism noisy per-source doc counts (Dwork 2006 "
    "SHAPE: count sensitivity 1, noise = -b*sign(u)*ln(1-2|u|) by "
    "inverse-CDF). The uniform is a SEEDED public function of the "
    "group key (md5h 60-bit twin scaled to [-0.5, 0.5)) so the "
    "release is replayable and oracled — which VOIDS the DP "
    "guarantee, not merely weakens it: anyone can recompute and "
    "subtract the noise. The column is therefore nominal_epsilon "
    "(the budget the pipeline WOULD spend with a secret per-epoch "
    "seed); a real release swaps in secret randomness and drops "
    "n_true. One group-keyed count, k-row noise map, zero extra "
    "shuffles at any scale.",
)
def q_dp_noisy_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hw_kafka_streams_spark.operators.dedup import md5h

    docs = load_table(spark, "documents", sf_dir)
    per = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_true")
    )
    uu = (
        md5h(F.concat(F.col("source"), F.lit(":dp42")))
        / F.lit(1152921504606846976.0)
        - 0.5
    )
    sign = F.when(uu >= 0, F.lit(1.0)).otherwise(F.lit(-1.0))
    noise = -1.0 * sign * F.log(
        F.greatest(1 - 2 * F.abs(uu), F.lit(1e-18))
    )
    return per.select(
        "source",
        "n_true",
        F.round(F.col("n_true") + noise, 4).alias("noisy_n"),
        F.lit(1.0).alias("nominal_epsilon"),
    ).orderBy("source")


@register(
    "q_ams_f2",
    oracle="""
        WITH wc AS (
          SELECT t AS w, CAST(count(*) AS BIGINT) AS c
          FROM (SELECT unnest(list_filter(string_split_regex(
                         trim(lower(text)), '\\s+'), x -> x <> '')) AS t
                FROM documents)
          GROUP BY 1
        ),
        signs AS (
          SELECT r, w, c,
                 CASE WHEN CAST(('0x' || substring(
                        md5(w || ':ams' || CAST(r AS VARCHAR)), 1, 15))
                        AS BIGINT) % 2 = 0
                      THEN c ELSE -c END AS sc
          FROM wc CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS r)
        ),
        est AS (
          SELECT r, CAST(sum(sc) AS HUGEINT) AS x FROM signs GROUP BY r
        ),
        grp AS (
          SELECT r // 4 AS g, CAST(sum(x * x) AS HUGEINT) AS s4
          FROM est GROUP BY 1
        ),
        med AS (
          SELECT CAST(sum(s4) - min(s4) - max(s4) AS DOUBLE) / 8
                   AS ams_f2
          FROM grp
        ),
        exact AS (
          SELECT CAST(sum(c * c) AS BIGINT) AS exact_f2 FROM wc
        )
        SELECT exact_f2, round(ams_f2, 2) AS ams_f2,
               round(abs(ams_f2 - exact_f2) / exact_f2, 4) AS rel_err,
               16 AS n_estimators
        FROM exact CROSS JOIN med
    """,
    doc="AMS second-moment (F2) sketch of the token-frequency vector "
    "(Alon-Matias-Szegedy 1996): 16 {-1,+1}-signed linear sketches "
    "X_r = sum_w s(w,r)*c_w from the 60-bit md5 twin's parity, "
    "mean-of-4 within groups, median-of-4-means across groups (= "
    "midrange of the middle two), vs the exact F2 = sum c^2 — the "
    "self-join-size / skew estimator beside HLL (F0) and Count-Min "
    "(point freq). Everything before the final two divisions is "
    "exact integer arithmetic; the sketch input is the DISTINCT-word "
    "count table (vocab-bounded), and each X_r is one "
    "map-side-combinable signed sum — at 100 TB the 16 estimators "
    "ride a single 16-key shuffle.",
)
def q_ams_f2(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hw_kafka_streams_spark.operators.dedup import md5h
    from hw_kafka_streams_spark.operators.text import word_tokens

    docs = load_table(spark, "documents", sf_dir)
    wc = (
        docs.select(
            F.explode(word_tokens(F.lower(F.col("text")))).alias("w")
        )
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    signs = wc.select(
        "w",
        "c",
        F.explode(F.sequence(F.lit(0), F.lit(15))).alias("r"),
    ).select(
        "r",
        F.when(
            md5h(
                F.concat(
                    F.col("w"), F.lit(":ams"), F.col("r").cast("string")
                )
            )
            % 2
            == 0,
            F.col("c"),
        )
        .otherwise(-F.col("c"))
        .alias("sc"),
    )
    est = signs.groupBy("r").agg(
        F.sum("sc").cast("decimal(38,0)").alias("x")
    )
    # keep the per-group estimator sums in exact DECIMAL so the
    # median-of-means (midrange of the middle two = (total-min-max)/2,
    # then /4 for the within-group mean) is ONE float division of an
    # exact integer — no double sums over group rows at any scale
    grp = est.groupBy((F.col("r") / 4).cast("int").alias("g")).agg(
        F.sum(F.col("x") * F.col("x")).alias("s4")
    )
    med = grp.agg(
        (
            (F.sum("s4") - F.min("s4") - F.max("s4")).cast("double") / 8
        ).alias("ams_f2")
    )
    exact = wc.agg(
        F.sum(
            F.col("c").cast("decimal(38,0)") * F.col("c")
        )
        .cast("long")
        .alias("exact_f2")
    )
    return exact.crossJoin(F.broadcast(med)).select(
        "exact_f2",
        F.round("ams_f2", 2).alias("ams_f2"),
        F.round(
            F.abs(F.col("ams_f2") - F.col("exact_f2"))
            / F.col("exact_f2"),
            4,
        ).alias("rel_err"),
        F.lit(16).alias("n_estimators"),
    )


def _fs_oracle(iters: int = 2) -> str:
    """Unrolled-CTE DuckDB replay of the Fellegi-Sunter EM trajectory
    (Winkler 1988 unsupervised fit): per-pattern match posteriors and
    the m/u/p updates are round-to-9dp with DECIMAL pattern sums —
    the q_bradley_terry oracle pattern over the 2^3-row agreement
    table."""
    head = """
        WITH p AS MATERIALIZED (
          SELECT p_partkey AS k, string_split(p_name, ' ')[1] AS adj,
                 string_split(p_name, ' ')[2] AS noun,
                 p_brand, p_type, p_size,
                 CAST(floor(p_retailprice / 10) AS BIGINT) AS pband
          FROM part
        ),
        pat AS MATERIALIZED (
          SELECT CAST(a.adj = b.adj AS INT) AS g1,
                 CAST(a.p_type = b.p_type AS INT) AS g2,
                 CAST(a.pband = b.pband AS INT) AS g3,
                 CAST(count(*) AS BIGINT) AS n
          FROM p a JOIN p b
            ON a.noun = b.noun AND a.p_size = b.p_size
               AND a.p_brand = b.p_brand AND a.k < b.k
          GROUP BY 1, 2, 3
        ),
        em_0 AS (SELECT 0.1 AS pp, 0.9 AS m1, 0.9 AS m2, 0.9 AS m3,
                        0.1 AS u1, 0.1 AS u2, 0.1 AS u3)"""
    its = []
    for k in range(1, iters + 1):
        its.append(f"""
        , wt_{k} AS (
          SELECT pat.g1, pat.g2, pat.g3, pat.n,
                 round(
                   (e.pp
                    * (CASE WHEN pat.g1 = 1 THEN e.m1 ELSE 1 - e.m1 END)
                    * (CASE WHEN pat.g2 = 1 THEN e.m2 ELSE 1 - e.m2 END)
                    * (CASE WHEN pat.g3 = 1 THEN e.m3 ELSE 1 - e.m3 END))
                   / ((e.pp
                       * (CASE WHEN pat.g1 = 1 THEN e.m1
                          ELSE 1 - e.m1 END)
                       * (CASE WHEN pat.g2 = 1 THEN e.m2
                          ELSE 1 - e.m2 END)
                       * (CASE WHEN pat.g3 = 1 THEN e.m3
                          ELSE 1 - e.m3 END))
                      + ((1 - e.pp)
                         * (CASE WHEN pat.g1 = 1 THEN e.u1
                            ELSE 1 - e.u1 END)
                         * (CASE WHEN pat.g2 = 1 THEN e.u2
                            ELSE 1 - e.u2 END)
                         * (CASE WHEN pat.g3 = 1 THEN e.u3
                            ELSE 1 - e.u3 END))), 9) AS w
          FROM pat CROSS JOIN em_{k - 1} e
        ), s_{k} AS (
          SELECT CAST(sum(CAST(round(n * w, 6) AS DECIMAL(28,6)))
                   AS DOUBLE) AS sw,
                 CAST(sum(CAST(round(n * (1 - w), 6) AS DECIMAL(28,6)))
                   AS DOUBLE) AS snw,
                 CAST(sum(n) AS DOUBLE) AS sn,
                 CAST(sum(CAST(round(n * w * g1, 6) AS DECIMAL(28,6)))
                   AS DOUBLE) AS swa1,
                 CAST(sum(CAST(round(n * w * g2, 6) AS DECIMAL(28,6)))
                   AS DOUBLE) AS swa2,
                 CAST(sum(CAST(round(n * w * g3, 6) AS DECIMAL(28,6)))
                   AS DOUBLE) AS swa3,
                 CAST(sum(CAST(round(n * (1 - w) * g1, 6)
                   AS DECIMAL(28,6))) AS DOUBLE) AS snwa1,
                 CAST(sum(CAST(round(n * (1 - w) * g2, 6)
                   AS DECIMAL(28,6))) AS DOUBLE) AS snwa2,
                 CAST(sum(CAST(round(n * (1 - w) * g3, 6)
                   AS DECIMAL(28,6))) AS DOUBLE) AS snwa3
          FROM wt_{k}
        ), em_{k} AS (
          SELECT round(sw / sn, 9) AS pp,
                 round(swa1 / sw, 9) AS m1, round(swa2 / sw, 9) AS m2,
                 round(swa3 / sw, 9) AS m3,
                 round(snwa1 / snw, 9) AS u1,
                 round(snwa2 / snw, 9) AS u2,
                 round(snwa3 / snw, 9) AS u3
          FROM s_{k}
        )""")
    tail = f"""
        , np AS (SELECT CAST(COALESCE(sum(n), 0) AS BIGINT) AS n_pairs
                 FROM pat)
        SELECT f.field,
               round(CASE f.field WHEN 'adjective' THEN e.m1
                     WHEN 'type' THEN e.m2 ELSE e.m3 END, 6) AS m,
               round(CASE f.field WHEN 'adjective' THEN e.u1
                     WHEN 'type' THEN e.u2 ELSE e.u3 END, 6) AS u,
               round(ln((CASE f.field WHEN 'adjective' THEN e.m1
                         WHEN 'type' THEN e.m2 ELSE e.m3 END)
                        / (CASE f.field WHEN 'adjective' THEN e.u1
                           WHEN 'type' THEN e.u2 ELSE e.u3 END))
                     / ln(2.0), 4) AS agree_weight,
               round(e.pp, 6) AS p_match, np.n_pairs
        FROM (SELECT unnest(['adjective', 'type', 'price_band'])
                AS field) f
          CROSS JOIN em_{iters} e CROSS JOIN np
        WHERE np.n_pairs > 0
        ORDER BY f.field"""
    return head + "".join(its) + tail


@register(
    "q_fellegi_sunter",
    oracle=_fs_oracle(iters=2),
    doc="Fellegi-Sunter probabilistic record linkage (1969), fit "
    "UNSUPERVISED by 2 unrolled EM iterations (Winkler 1988) over "
    "(noun, size, brand)-blocked part pairs: per-field m "
    "(P(agree | match)) and u (P(agree | non-match)) probabilities "
    "and the log2 agreement weights ln(m/u) that score candidate "
    "links — the decision-theoretic layer on top of the "
    "edit-distance/soundex battery (q_jaro_winkler_pairs etc. "
    "generate candidates; FS says how much each field's agreement "
    "is WORTH). Agreement patterns collapse the pair set to a "
    "2^3-row table before any float work, so EM runs on bounded "
    "state (1-row literal jobs, trajectory pinned by 9dp rounding; "
    "unrolled-CTE oracle). Blocking on three fields is the standard "
    "ER quadratic guard; at sf0.001 the blocks are all singletons "
    "and both engines return 0 rows (the q_friedman_test "
    "empty-at-tiny-SF convention).",
)
def q_fellegi_sunter(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    part = load_table(spark, "part", sf_dir)
    p = part.select(
        F.col("p_partkey").alias("k"),
        F.split(F.col("p_name"), " ")[0].alias("adj"),
        F.split(F.col("p_name"), " ")[1].alias("noun"),
        "p_brand",
        "p_type",
        "p_size",
        F.floor(F.col("p_retailprice") / 10).cast("long").alias("pband"),
    )
    a, b = p.alias("a"), p.alias("b")
    pat_rows = (
        a.join(
            b,
            (F.col("a.noun") == F.col("b.noun"))
            & (F.col("a.p_size") == F.col("b.p_size"))
            & (F.col("a.p_brand") == F.col("b.p_brand"))
            & (F.col("a.k") < F.col("b.k")),
        )
        .select(
            (F.col("a.adj") == F.col("b.adj")).cast("int").alias("g1"),
            (F.col("a.p_type") == F.col("b.p_type"))
            .cast("int")
            .alias("g2"),
            (F.col("a.pband") == F.col("b.pband"))
            .cast("int")
            .alias("g3"),
        )
        .groupBy("g1", "g2", "g3")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    out_schema = (
        "field string, m double, u double, agree_weight double, "
        "p_match double, n_pairs long"
    )
    if not pat_rows:
        return spark.createDataFrame([], out_schema)
    n_pairs = sum(r.n for r in pat_rows)

    # EM as 1-row literal-projection jobs (the q_bradley_terry shape):
    # every round/divide runs through engine expressions so the
    # unrolled-CTE oracle replays the identical trajectory.
    def dec_sum(cols):
        out = cols[0]
        for c in cols[1:]:
            out = out + c
        return out

    params = {"pp": 0.1, "m1": 0.9, "m2": 0.9, "m3": 0.9,
              "u1": 0.1, "u2": 0.1, "u3": 0.1}
    for _ in range(2):
        w_exprs = []
        for r in pat_rows:
            def side(pref, g, i):
                v = params[f"{pref}{i}"]
                return F.lit(v) if g == 1 else (1 - F.lit(v))

            num = F.lit(params["pp"]) * side("m", r.g1, 1) * side(
                "m", r.g2, 2
            ) * side("m", r.g3, 3)
            den = (1 - F.lit(params["pp"])) * side("u", r.g1, 1) * side(
                "u", r.g2, 2
            ) * side("u", r.g3, 3)
            w_exprs.append((r, F.round(num / (num + den), 9)))
        sums = {}
        sums["sw"] = dec_sum(
            [F.round(F.lit(r.n) * w, 6).cast("decimal(28,6)")
             for r, w in w_exprs]
        ).cast("double")
        sums["snw"] = dec_sum(
            [F.round(F.lit(r.n) * (1 - w), 6).cast("decimal(28,6)")
             for r, w in w_exprs]
        ).cast("double")
        for i, g in [(1, "g1"), (2, "g2"), (3, "g3")]:
            sums[f"swa{i}"] = dec_sum(
                [F.round(F.lit(r.n) * w * F.lit(getattr(r, g)), 6)
                 .cast("decimal(28,6)") for r, w in w_exprs]
            ).cast("double")
            sums[f"snwa{i}"] = dec_sum(
                [F.round(F.lit(r.n) * (1 - w) * F.lit(getattr(r, g)), 6)
                 .cast("decimal(28,6)") for r, w in w_exprs]
            ).cast("double")
        row = spark.range(1).select(
            F.round(sums["sw"] / F.lit(float(n_pairs)), 9).alias("pp"),
            *[
                F.round(sums[f"swa{i}"] / sums["sw"], 9).alias(f"m{i}")
                for i in (1, 2, 3)
            ],
            *[
                F.round(sums[f"snwa{i}"] / sums["snw"], 9).alias(f"u{i}")
                for i in (1, 2, 3)
            ],
        ).first()
        params = {k2: row[k2] for k2 in params}
    fields = [("adjective", 1), ("price_band", 3), ("type", 2)]
    lit_rows = [
        (name, params[f"m{i}"], params[f"u{i}"]) for name, i in fields
    ]
    base = spark.createDataFrame(lit_rows, "field string, m double, u double")
    return base.select(
        "field",
        F.round("m", 6).alias("m"),
        F.round("u", 6).alias("u"),
        F.round(F.log(F.col("m") / F.col("u")) / math.log(2.0), 4).alias(
            "agree_weight"
        ),
        F.round(F.lit(params["pp"]), 6).alias("p_match"),
        F.lit(n_pairs).cast("long").alias("n_pairs"),
    ).orderBy("field")


def _ppmi_oracle(iters: int = 3) -> str:
    """Unrolled-CTE replay of the PPMI power iteration: matrix entries
    rounded to 6dp, vector entries to 9dp after every normalization,
    all vocab-row sums DECIMAL — the pinned-trajectory pattern."""
    head = r"""
        WITH d AS MATERIALIZED (
          SELECT doc_id,
                 list_filter(string_split_regex(trim(lower(text)),
                             '\s+'), e -> e <> '') AS ws
          FROM documents WHERE text IS NOT NULL AND trim(text) <> ''
        ),
        toks AS MATERIALIZED (
          SELECT doc_id, unnest(ws) AS w,
                 CAST(unnest(range(1, len(ws) + 1)) AS INT) AS pos
          FROM d
        ),
        pairs AS MATERIALIZED (
          SELECT a.w AS wc, b.w AS cc, CAST(count(*) AS BIGINT) AS n
          FROM toks a JOIN toks b
            ON a.doc_id = b.doc_id
           AND b.pos BETWEEN a.pos - 2 AND a.pos + 2
           AND b.pos <> a.pos
          GROUP BY 1, 2
        ),
        marg AS MATERIALIZED (
          SELECT wc AS w, CAST(sum(n) AS BIGINT) AS m
          FROM pairs GROUP BY 1
        ),
        tot AS (SELECT CAST(sum(n) AS BIGINT) AS t FROM pairs),
        ppmi AS MATERIALIZED (
          SELECT p.wc, p.cc,
                 CAST(round(GREATEST(0.0,
                   ln((CAST(p.n AS DOUBLE) * tot.t)
                      / (CAST(ma.m AS DOUBLE) * mb.m))), 6)
                   AS DECIMAL(18,6)) AS v
          FROM pairs p
            JOIN marg ma ON ma.w = p.wc
            JOIN marg mb ON mb.w = p.cc
            CROSS JOIN tot
          WHERE ma.m >= 5 AND mb.m >= 5
        ),
        vocab AS MATERIALIZED (SELECT DISTINCT wc AS w FROM ppmi),
        nv AS (SELECT CAST(count(*) AS BIGINT) AS nv FROM vocab),
        x_0 AS (SELECT w, round(1.0 / sqrt(CAST(nv AS DOUBLE)), 9)
                       AS x
                FROM vocab CROSS JOIN nv)"""
    its = []
    for k in range(1, iters + 1):
        its.append(f"""
        , y_{k} AS MATERIALIZED (
          SELECT p.wc AS w,
                 CAST(sum(CAST(round(CAST(p.v AS DOUBLE) * x.x, 9)
                   AS DECIMAL(28,9))) AS DOUBLE) AS y
          FROM ppmi p JOIN x_{k - 1} x ON x.w = p.cc
          GROUP BY 1
        ), n_{k} AS (
          SELECT sqrt(CAST(sum(CAST(round(y * y, 9)
                   AS DECIMAL(28,9))) AS DOUBLE)) AS nrm
          FROM y_{k}
        ), x_{k} AS (
          SELECT w, round(y / nrm, 9) AS x
          FROM y_{k} CROSS JOIN n_{k}
        )""")
    tail = f"""
        SELECT w AS word, round(x.x, 6) AS component,
               round(n.nrm, 4) AS lambda_est
        FROM x_{iters} x CROSS JOIN n_{iters} n
        ORDER BY x.x DESC, w LIMIT 10"""
    return head + "".join(its) + tail


@register(
    "q_ppmi_power_iteration",
    oracle=_ppmi_oracle(iters=3),
    doc="Distributional-semantics axis: positive-PMI co-occurrence "
    "matrix (+/-2 skip-gram window, the word2vec/GloVe statistic — "
    "Levy & Goldberg 2014 showed SGNS factorizes exactly this) with "
    "3 unrolled power iterations extracting the top eigenvector and "
    "its Rayleigh/norm eigenvalue estimate — embedding training "
    "reduced to its linear-algebra core, entirely in-engine. Scale "
    "shape: the pair extraction is the data-sized part (per-doc "
    "position-range self-join, <= 4 neighbors per token, one "
    "map-side-combined count); the PPMI matrix and iteration "
    "vectors are VOCAB-bounded, iterated as pair-table joins with "
    "the vector collected per step as a bounded artifact (the "
    "broadcast-weights GD shape). Trajectory pinned: 6dp matrix "
    "entries, 9dp vector entries per step, DECIMAL vocab-row sums; "
    "the oracle replays all 3 steps as unrolled MATERIALIZED CTEs.",
)
def q_ppmi_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hw_kafka_streams_spark.operators.text import word_tokens

    docs = load_table(spark, "documents", sf_dir).filter(
        F.col("text").isNotNull() & (F.trim(F.col("text")) != "")
    )
    toks = docs.select(
        "doc_id",
        F.posexplode(word_tokens(F.lower(F.col("text")))).alias(
            "pos0", "w"
        ),
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "w")
    a, b = toks.alias("a"), toks.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.doc_id") == F.col("b.doc_id"))
            & (F.col("b.pos") >= F.col("a.pos") - 2)
            & (F.col("b.pos") <= F.col("a.pos") + 2)
            & (F.col("b.pos") != F.col("a.pos")),
        )
        .groupBy(
            F.col("a.w").alias("wc"), F.col("b.w").alias("cc")
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    pairs = managed_persist(pairs)
    marg = pairs.groupBy(F.col("wc").alias("w")).agg(
        F.sum("n").alias("m")
    )
    tot = pairs.agg(F.sum("n").alias("t"))
    ma = marg.withColumnsRenamed({"w": "wc", "m": "ma"})
    mb = marg.withColumnsRenamed({"w": "cc", "m": "mb"})
    ppmi = (
        pairs.join(F.broadcast(ma), "wc")
        .join(F.broadcast(mb), "cc")
        .crossJoin(F.broadcast(tot))
        .filter((F.col("ma") >= 5) & (F.col("mb") >= 5))
        .select(
            "wc",
            "cc",
            F.round(
                F.greatest(
                    F.lit(0.0),
                    F.log(
                        (F.col("n").cast("double") * F.col("t"))
                        / (F.col("ma").cast("double") * F.col("mb"))
                    ),
                ),
                6,
            )
            .cast("decimal(18,6)")
            .alias("v"),
        )
    )
    ppmi = managed_persist(ppmi)
    vocab = [r.wc for r in ppmi.select("wc").distinct().collect()]
    nv = len(vocab)
    x0 = (
        spark.range(1)
        .select(
            F.round(
                F.lit(1.0) / F.sqrt(F.lit(float(nv))), 9
            ).alias("x")
        )
        .first()[0]
    )
    xdf = spark.createDataFrame(
        [(w, x0) for w in sorted(vocab)], "cc string, x double"
    )
    nrm_val = None
    for _ in range(3):
        y = (
            ppmi.join(F.broadcast(xdf), "cc")
            .groupBy(F.col("wc").alias("w"))
            .agg(
                F.sum(
                    F.round(
                        F.col("v").cast("double") * F.col("x"), 9
                    ).cast("decimal(28,9)")
                )
                .cast("double")
                .alias("y")
            )
        )
        nrm = y.agg(
            F.sqrt(
                F.sum(
                    F.round(F.col("y") * F.col("y"), 9).cast(
                        "decimal(28,9)"
                    )
                ).cast("double")
            ).alias("nrm")
        )
        xn = y.crossJoin(F.broadcast(nrm)).select(
            F.col("w").alias("cc"),
            F.round(F.col("y") / F.col("nrm"), 9).alias("x"),
            "nrm",
        )
        rows = xn.collect()
        nrm_val = rows[0]["nrm"] if rows else 0.0
        xdf = spark.createDataFrame(
            [(r.cc, float(r.x)) for r in rows], "cc string, x double"
        )
    return (
        xdf.select(
            F.col("cc").alias("word"),
            F.round(F.col("x"), 6).alias("component"),
            F.round(F.lit(nrm_val), 4).alias("lambda_est"),
        )
        .orderBy(F.desc("component"), "word")
        .limit(10)
    )


@register(
    "q_seq_patterns",
    oracle="""
        WITH ut AS (
          SELECT user_id, event_type AS t,
                 min(ts) AS mn, max(ts) AS mx
          FROM events GROUP BY 1, 2
        ),
        users AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT)
                         AS n_users
                  FROM events),
        sup AS (
          SELECT a.t AS first_type, b.t AS then_type,
                 CAST(count(*) AS BIGINT) AS n_supporting
          FROM ut a JOIN ut b
            ON a.user_id = b.user_id AND a.t <> b.t
               AND a.mn < b.mx
          GROUP BY 1, 2
        )
        SELECT s.first_type, s.then_type, s.n_supporting,
               round(CAST(s.n_supporting AS DOUBLE) / u.n_users, 6)
                 AS support
        FROM sup s CROSS JOIN users u
        WHERE CAST(s.n_supporting AS DOUBLE) / u.n_users >= 0.2
        ORDER BY s.first_type, s.then_type
    """,
    doc="Sequential-pattern support (the length-2 SPADE/PrefixSpan "
    "core): for every ordered event-type pair (a -> b), the fraction "
    "of users with SOME a occurring before SOME b — ordered behavior "
    "q_assoc_rules' unordered co-occurrence and q_event_transitions' "
    "adjacent-step matrix both miss (a -> b here allows any gap). "
    "The existence test compresses each user's timeline to per-type "
    "(min_ts, max_ts): 'exists a before b' is exactly min_a < max_b, "
    "so the support scan is one (user, type) aggregate plus a "
    "user-keyed self-join with k^2-bounded fan-out — never "
    "event-pair-quadratic. Support floor 0.2 mirrors the assoc-rules "
    "prune.",
)
def q_seq_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, "events", sf_dir)
    ut = e.groupBy("user_id", F.col("event_type").alias("t")).agg(
        F.min("ts").alias("mn"), F.max("ts").alias("mx")
    )
    ut = managed_persist(ut)
    users = e.agg(
        F.countDistinct("user_id").cast("long").alias("n_users")
    )
    a, b = ut.alias("a"), ut.alias("b")
    sup = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.t") != F.col("b.t"))
            & (F.col("a.mn") < F.col("b.mx")),
        )
        .groupBy(
            F.col("a.t").alias("first_type"),
            F.col("b.t").alias("then_type"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_supporting"))
    )
    return (
        sup.crossJoin(F.broadcast(users))
        .filter(
            F.col("n_supporting").cast("double") / F.col("n_users")
            >= 0.2
        )
        .select(
            "first_type",
            "then_type",
            "n_supporting",
            F.round(
                F.col("n_supporting").cast("double") / F.col("n_users"),
                6,
            ).alias("support"),
        )
        .orderBy("first_type", "then_type")
    )


@register(
    "q_burrows_delta",
    oracle=r"""
        WITH toks AS (
          SELECT source,
                 unnest(list_filter(
                   string_split_regex(trim(lower(text)), '\s+'),
                   t -> t <> '')) AS w
          FROM documents
        ), csw AS (
          SELECT source, w, CAST(count(*) AS BIGINT) AS c
          FROM toks GROUP BY 1, 2
        ), cs AS (
          SELECT source, CAST(sum(c) AS BIGINT) AS tot
          FROM csw GROUP BY 1
        ), mfw AS (
          SELECT w FROM (
            SELECT w, row_number() OVER (
                     ORDER BY sum(c) DESC, w) AS rnk
            FROM csw GROUP BY w) WHERE rnk <= 30
        ), grid AS (
          SELECT cs.source, mfw.w, cs.tot,
                 CAST(COALESCE(x.c, 0) AS DOUBLE) / cs.tot AS f
          FROM cs CROSS JOIN mfw
          LEFT JOIN csw x ON x.source = cs.source AND x.w = mfw.w
        ), wstat AS (
          SELECT w, CAST(count(*) AS BIGINT) AS k,
                 CAST(sum(CAST(round(f, 9) AS DECIMAL(18,9)))
                   AS DOUBLE) AS sf,
                 CAST(sum(CAST(round(f * f, 9) AS DECIMAL(18,9)))
                   AS DOUBLE) AS sf2
          FROM grid GROUP BY 1
        ), z AS (
          SELECT g.source, g.w,
                 (g.f - s.sf / s.k)
                 / sqrt(GREATEST(s.sf2 / s.k
                                 - (s.sf / s.k) * (s.sf / s.k),
                                 1e-18)) AS zv
          FROM grid g JOIN wstat s USING (w)
        ), pairs AS (
          SELECT a.source AS s1, b.source AS s2,
                 round(CAST(sum(CAST(round(abs(a.zv - b.zv), 9)
                       AS DECIMAL(18,9))) AS DOUBLE) / 30, 6) AS delta
          FROM z a JOIN z b ON a.w = b.w AND a.source < b.source
          GROUP BY 1, 2
        )
        SELECT CAST(rnk AS BIGINT) AS rnk, s1, s2, delta FROM (
          SELECT s1, s2, delta,
                 row_number() OVER (ORDER BY delta, s1, s2) AS rnk
          FROM pairs) WHERE rnk <= 10 ORDER BY rnk
    """,
    doc="Burrows' Delta stylometric distance between sources "
    "(Burrows 2002, the standard authorship-attribution measure): "
    "z-score each source's relative frequency of the corpus's 30 "
    "most frequent words (population sd across sources), then "
    "Delta(s1,s2) = mean |z1 - z2| over those words; the 10 most "
    "stylistically similar source pairs — the duplicate-PROVENANCE "
    "signal (two 'different' crawls with near-zero Delta are one "
    "source) that content dedup misses. Relative frequencies are "
    "exact per-row divisions; cross-source moments and the pair "
    "deltas are per-term 9dp-DECIMAL sums; sd guarded at 1e-18 for "
    "degenerate words. Scale shape: one (source, word) partial-agged "
    "count, MFW selection over the vocab-sized rollup, then all "
    "joins bounded by k_sources x 30 rows.",
)
def q_burrows_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from hw_kafka_streams_spark.operators.winutil import (
        tiny_table_partition,
    )

    docs = load_table(spark, "documents", sf_dir)
    csw = (
        docs.select(
            "source",
            F.explode(T.word_tokens(F.lower(F.col("text")))).alias("w"),
        )
        .groupBy("source", "w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    csw = managed_persist(csw)
    cs = csw.groupBy("source").agg(F.sum("c").alias("tot"))
    wtot = csw.groupBy("w").agg(F.sum("c").alias("cw"))
    mfw = (
        wtot.orderBy(F.desc("cw"), "w")
        .limit(30)
        .select(
            "w",
            F.row_number()
            .over(
                W.partitionBy(tiny_table_partition("w")).orderBy(
                    F.desc("cw"), "w"
                )
            )
            .alias("rnk"),
        )
        .filter(F.col("rnk") <= 30)
        .select("w")
    )
    grid = (
        cs.crossJoin(F.broadcast(mfw))
        .join(F.broadcast(csw.join(F.broadcast(mfw), "w")), ["source", "w"], "left")
        .select(
            "source",
            "w",
            (
                F.coalesce(F.col("c"), F.lit(0)).cast("double")
                / F.col("tot")
            ).alias("f"),
        )
    )
    grid = managed_persist(grid)
    wstat = grid.groupBy("w").agg(
        F.count(F.lit(1)).alias("k"),
        F.sum(F.round(F.col("f"), 9).cast("decimal(18,9)"))
        .cast("double")
        .alias("sf"),
        F.sum(F.round(F.col("f") * F.col("f"), 9).cast("decimal(18,9)"))
        .cast("double")
        .alias("sf2"),
    )
    mu = F.col("sf") / F.col("k")
    sd = F.sqrt(
        F.greatest(
            F.col("sf2") / F.col("k") - mu * mu, F.lit(1e-18)
        )
    )
    z = grid.join(F.broadcast(wstat), "w").select(
        "source", "w", ((F.col("f") - mu) / sd).alias("zv")
    )
    zb = z.select(
        F.col("source").alias("s2"),
        F.col("w").alias("w2"),
        F.col("zv").alias("zv2"),
    )
    pairs = (
        z.join(
            F.broadcast(zb),
            (F.col("w") == F.col("w2")) & (F.col("source") < F.col("s2")),
        )
        .groupBy(F.col("source").alias("s1"), "s2")
        .agg(
            F.round(
                F.sum(
                    F.round(F.abs(F.col("zv") - F.col("zv2")), 9).cast(
                        "decimal(18,9)"
                    )
                ).cast("double")
                / 30,
                6,
            ).alias("delta")
        )
    )
    top = pairs.orderBy("delta", "s1", "s2").limit(10)
    w_r = W.partitionBy(tiny_table_partition("s1")).orderBy(
        "delta", "s1", "s2"
    )
    return top.select(
        F.row_number().over(w_r).cast("long").alias("rnk"),
        "s1",
        "s2",
        "delta",
    ).orderBy("rnk")


@register(
    "q_kmv_distinct",
    oracle="""
        WITH wc AS (
          SELECT DISTINCT t AS w
          FROM (SELECT unnest(list_filter(string_split_regex(
                         trim(lower(text)), '\\s+'), x -> x <> '')) AS t
                FROM documents)
        ),
        h AS (
          SELECT ('0x' || substring(md5(w || ':kmv'), 1, 15))::BIGINT
                   AS h
          FROM wc
        ),
        topk AS (SELECT h FROM h ORDER BY h LIMIT 128),
        m AS (
          SELECT CAST(count(*) AS BIGINT) AS k_eff,
                 CAST(max(h) AS BIGINT) AS u_k
          FROM topk
        ),
        ex AS (SELECT CAST(count(*) AS BIGINT) AS exact_f0 FROM wc)
        SELECT k_eff, u_k, exact_f0,
               round(CASE WHEN k_eff < 128 THEN CAST(k_eff AS DOUBLE)
                     ELSE 127.0 * 1152921504606846976.0 / u_k END, 2)
                 AS kmv_f0,
               round(abs(CASE WHEN k_eff < 128 THEN CAST(k_eff AS DOUBLE)
                         ELSE 127.0 * 1152921504606846976.0 / u_k END
                         - exact_f0) / exact_f0, 4) AS rel_err
        FROM m CROSS JOIN ex
    """,
    doc="KMV (k-minimum-values) distinct-count sketch of the corpus "
    "vocabulary (Bar-Yossef 2002, Beyer 2007): keep the k=128 "
    "smallest 60-bit md5 hashes of the distinct words; F0-hat = "
    "(k-1)/U_(k) with hashes read as fractions of 2^60 — the "
    "order-statistics F0 estimator beside q_ams_f2 (F2) and "
    "q_countmin_freq (point frequency). The md5 twin makes the "
    "sketch VALUE-oracled, not tolerance-gated: both engines walk "
    "the identical hash order, so U_(k) and the estimate match "
    "bit-for-bit. Scale shape: the k smallest of N hashes is a "
    "TakeOrdered (per-partition heap + driver merge of 128-row "
    "spills), never a global sort; the sketch itself is mergeable "
    "(union = k smallest of the concatenation), which is how 100 TB "
    "of per-shard KMVs fold into one corpus cardinality without a "
    "re-scan. If the vocab is smaller than k the sketch IS the "
    "exact set (k_eff < k branch).",
)
def q_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hw_kafka_streams_spark.operators.dedup import md5h
    from hw_kafka_streams_spark.operators.text import word_tokens

    docs = load_table(spark, "documents", sf_dir)
    wc = (
        docs.select(
            F.explode(word_tokens(F.lower(F.col("text")))).alias("w")
        )
        .distinct()
    )
    h = wc.select(md5h(F.concat(F.col("w"), F.lit(":kmv"))).alias("h"))
    topk = h.orderBy("h").limit(128)
    m = topk.agg(
        F.count(F.lit(1)).cast("long").alias("k_eff"),
        F.max("h").cast("long").alias("u_k"),
    )
    ex = wc.agg(F.count(F.lit(1)).cast("long").alias("exact_f0"))
    est = F.when(
        F.col("k_eff") < 128, F.col("k_eff").cast("double")
    ).otherwise(F.lit(127.0) * 1152921504606846976.0 / F.col("u_k"))
    return (
        m.crossJoin(F.broadcast(ex))
        .select(
            "k_eff",
            "u_k",
            "exact_f0",
            F.round(est, 2).alias("kmv_f0"),
            F.round(
                F.abs(est - F.col("exact_f0")) / F.col("exact_f0"), 4
            ).alias("rel_err"),
        )
    )


@register(
    "q_hll_det_twin",
    oracle="""
        WITH wc AS (
          SELECT DISTINCT t AS w
          FROM (SELECT unnest(list_filter(string_split_regex(
                         trim(lower(text)), '\\s+'), x -> x <> '')) AS t
                FROM documents)
        ),
        h AS (
          SELECT ('0x' || substring(md5(w || ':hll'), 1, 15))::BIGINT
                   AS h
          FROM wc
        ),
        parts AS (
          SELECT h % 64 AS bucket, h // 64 AS rest FROM h
        ),
        reg AS (
          SELECT bucket,
                 max(CASE WHEN rest = 0 THEN 55
                     ELSE 55 - length(bin(rest)) END) AS mj
          FROM parts GROUP BY 1
        ),
        s AS (
          SELECT CAST(count(*) AS BIGINT) AS n_used,
                 sum(CAST(CAST(1 AS BIGINT) << CAST(60 - mj AS INT)
                     AS HUGEINT)) AS s_used
          FROM reg
        ),
        raw AS (
          SELECT 64 - n_used AS v_empty,
                 0.709 * 4096.0 * 1152921504606846976.0
                 / CAST(s_used + CAST(64 - n_used AS HUGEINT)
                        * 1152921504606846976 AS DOUBLE) AS raw_est
          FROM s
        ),
        ex AS (SELECT CAST(count(*) AS BIGINT) AS exact_f0 FROM wc)
        SELECT CAST(64 AS BIGINT) AS m_registers,
               CAST(v_empty AS BIGINT) AS v_empty,
               CAST(raw_est <= 160.0 AND v_empty > 0 AS INT)
                 AS used_linear,
               round(CASE WHEN raw_est <= 160.0 AND v_empty > 0
                     THEN 64.0 * ln(64.0 / v_empty)
                     ELSE raw_est END, 2) AS hll_f0,
               exact_f0,
               round(abs(CASE WHEN raw_est <= 160.0 AND v_empty > 0
                         THEN 64.0 * ln(64.0 / v_empty)
                         ELSE raw_est END - exact_f0) / exact_f0, 4)
                 AS rel_err
        FROM raw CROSS JOIN ex
    """,
    doc="Deterministic HyperLogLog twin over the corpus vocabulary "
    "(Flajolet 2007): m=64 registers from the low 6 bits of the "
    "60-bit md5 hash, rho = leading-zero rank of the remaining 54 "
    "bits (via length(bin(x)) — identical minimal-binary semantics "
    "both engines), harmonic mean with alpha_64 = 0.709 and the "
    "small-range linear-counting branch. Unlike q_hll_partial_union "
    "(engine DataSketches bytes, tolerance-gated) this twin is "
    "VALUE-hash oracled end to end: registers, the exact dyadic "
    "harmonic sum (integers scaled by 2^60, HUGEINT/DECIMAL(38,0)), "
    "and the estimate all match bit-for-bit. Scale shape: one "
    "64-key partial-agged shuffle over the distinct-word table; "
    "registers are max-mergeable, the same fold that unions 100 TB "
    "of per-shard register files into one cardinality.",
)
def q_hll_det_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hw_kafka_streams_spark.operators.dedup import md5h
    from hw_kafka_streams_spark.operators.text import word_tokens

    docs = load_table(spark, "documents", sf_dir)
    wc = (
        docs.select(
            F.explode(word_tokens(F.lower(F.col("text")))).alias("w")
        )
        .distinct()
    )
    h = wc.select(md5h(F.concat(F.col("w"), F.lit(":hll"))).alias("h"))
    parts = h.select(
        (F.col("h") % 64).alias("bucket"),
        F.expr("h div 64").alias("rest"),
    )
    reg = parts.groupBy("bucket").agg(
        F.max(
            F.when(F.col("rest") == 0, F.lit(55)).otherwise(
                F.lit(55) - F.length(F.bin(F.col("rest")))
            )
        ).alias("mj")
    )
    s = reg.agg(
        F.count(F.lit(1)).cast("long").alias("n_used"),
        F.sum(
            F.expr(
                "CAST(shiftleft(CAST(1 AS BIGINT), CAST(60 - mj AS INT))"
                " AS DECIMAL(38,0))"
            )
        ).alias("s_used"),
    )
    v_empty = (F.lit(64) - F.col("n_used")).alias("v_empty")
    s_tot = (
        F.col("s_used")
        + (F.lit(64) - F.col("n_used")).cast("decimal(38,0)")
        * F.lit(1152921504606846976).cast("decimal(38,0)")
    ).cast("double")
    raw = s.select(
        v_empty,
        (F.lit(0.709) * 4096.0 * 1152921504606846976.0 / s_tot).alias(
            "raw_est"
        ),
    )
    ex = wc.agg(F.count(F.lit(1)).cast("long").alias("exact_f0"))
    linear = (F.col("raw_est") <= 160.0) & (F.col("v_empty") > 0)
    est = F.when(
        linear, F.lit(64.0) * F.log(F.lit(64.0) / F.col("v_empty"))
    ).otherwise(F.col("raw_est"))
    return (
        raw.crossJoin(F.broadcast(ex))
        .select(
            F.lit(64).cast("long").alias("m_registers"),
            F.col("v_empty").cast("long").alias("v_empty"),
            linear.cast("int").alias("used_linear"),
            F.round(est, 2).alias("hll_f0"),
            "exact_f0",
            F.round(
                F.abs(est - F.col("exact_f0")) / F.col("exact_f0"), 4
            ).alias("rel_err"),
        )
    )
