"""Text-analysis operators for training-data pipelines.

All pure JVM column expressions (no Python in the hot path): tokenize,
token counting (whitespace + BPE-ish regex), quality scoring, charset
n-gram language ID, and document fingerprinting. Each is designed to
run as a narrow map over the documents scan — no shuffle — so at
100 TB it is embarrassingly parallel.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F
from hw_kafka_streams_spark.cache import managed_persist

# Minimal multilingual stopword list for quality scoring / lang hints.
STOPWORDS_EN = [
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "for", "on", "with", "as", "was", "at", "by", "be",
]

# BPE-ish pretokenizer: word pieces or single non-space symbols —
# the common approximation of GPT-style byte-pair pretokenization.
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"


def word_tokens(text: Column | str) -> Column:
    """Whitespace tokens, empty-safe (no '' entries for repeated spaces)."""
    col = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(F.trim(col), r"\s+"), lambda t: t != "")


def token_count(text: Column | str) -> Column:
    """Whitespace-token count via one regexp pass (no HOF, codegen-friendly)."""
    col = F.col(text) if isinstance(text, str) else text
    return F.regexp_count(col, F.lit(r"\S+"))


def bpe_ish_token_count(text: Column | str) -> Column:
    """Count of BPE-ish pretokens via a single vectorized regexp pass."""
    col = F.col(text) if isinstance(text, str) else text
    return F.regexp_count(col, F.lit(BPE_ISH_PATTERN))


def punct_ratio(text: Column | str) -> Column:
    col = F.col(text) if isinstance(text, str) else text
    n = F.length(col)
    return F.when(n > 0, F.regexp_count(col, F.lit(r"[^\w\s]")) / n).otherwise(0.0)


def stopword_ratio(text: Column | str, stopwords: list[str] | None = None) -> Column:
    """Fraction of tokens that are stopwords (lowercased exact match).

    One vectorized regexp_count pass — a whitespace-delimited
    alternation with (?i) folding — instead of a per-token
    higher-order filter (HOFs are interpreted, no codegen; measured
    ~3× slower on the documents scan).
    """
    col = F.col(text) if isinstance(text, str) else text
    words = stopwords or STOPWORDS_EN
    pattern = r"(?i)(?:^|\s)(?:" + "|".join(words) + r")(?=\s|$)"
    n_stop = F.regexp_count(F.trim(col), F.lit(pattern))
    n_toks = token_count(col)
    return F.when(n_toks > 0, n_stop / n_toks).otherwise(0.0)


def mean_word_length(text: Column | str) -> Column:
    """Mean token length, closed form: in the single-space-collapsed
    text, sum(token lengths) = length - (n_tokens - 1). No HOF."""
    col = F.col(text) if isinstance(text, str) else text
    collapsed = F.regexp_replace(F.trim(col), r"\s+", " ")
    n_toks = token_count(col)
    total = (F.length(collapsed) - (n_toks - 1)).cast("double")
    return F.when(n_toks > 0, total / n_toks).otherwise(0.0)


def quality_score(text: Column | str) -> Column:
    """Composite [0,1] quality heuristic: favors mid-length docs with
    low punctuation density, sane word lengths, and a natural stopword
    ratio — the standard cheap pre-filter before expensive pipeline
    stages (a Gopher-rules-style signal).
    """
    col = F.col(text) if isinstance(text, str) else text
    n_chars = F.length(col)
    len_score = F.least(n_chars / F.lit(500.0), F.lit(1.0))
    punct_pen = F.greatest(F.lit(0.0), F.lit(1.0) - punct_ratio(col) * 4)
    mwl = mean_word_length(col)
    wl_score = F.when((mwl >= 2.0) & (mwl <= 12.0), 1.0).otherwise(0.3)
    sw = stopword_ratio(col)
    sw_score = F.when((sw >= 0.05) & (sw <= 0.6), 1.0).otherwise(0.5)
    return len_score * 0.3 + punct_pen * 0.2 + wl_score * 0.25 + sw_score * 0.25


def lang_id_charset(text: Column | str) -> Column:
    """Charset-ratio language family ID: han / cyrillic / arabic /
    latin / other by dominant script, 'unknown' for empty text.
    (An n-gram model would go the same way — per-class score columns,
    greatest-wins — this keeps the heuristic oracle-expressible.)
    """
    col = F.col(text) if isinstance(text, str) else text
    n_han = F.regexp_count(col, F.lit(r"[一-鿿]"))
    n_cyr = F.regexp_count(col, F.lit(r"[Ѐ-ӿ]"))
    n_ara = F.regexp_count(col, F.lit(r"[؀-ۿ]"))
    n_lat = F.regexp_count(col, F.lit(r"[A-Za-z]"))
    best = F.greatest(n_han, n_cyr, n_ara, n_lat)
    return (
        F.when(best == 0, "unknown")
        .when(best == n_han, "han")
        .when(best == n_cyr, "cyrillic")
        .when(best == n_ara, "arabic")
        .otherwise("latin")
    )


# PII redaction patterns, applied in this order. Patterns stay inside
# the RE2 subset (no lookaround/backrefs) so the DuckDB oracle runs the
# exact same expressions; Java's regex engine agrees on these shapes.
# Order matters: emails first (they contain dots/digits), then IPs,
# then SSN-shaped IDs (3-2-4 digits), then +international phones —
# each later pattern cannot match inside an earlier placeholder.
PII_PATTERNS: list[tuple[str, str]] = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{1,3}(\.\d{1,3}){3}\b", "<IP>"),
    (r"\b\d{3}-\d{2}-\d{4}\b", "<ID>"),
    (r"\+\d[\d -]{7,}\d", "<PHONE>"),
]


def redact_pii(text: Column | str) -> Column:
    """Mask emails / IPv4s / SSN-shaped IDs / international phone
    numbers with typed placeholders — the standard pre-training
    redaction pass. A fold of JVM ``regexp_replace`` calls (same shape
    as the censor fold, operators/censor.py): narrow map over the
    scan, no shuffle, whole-stage codegen keeps it pipelined at 100 TB.
    """
    col = F.col(text) if isinstance(text, str) else text
    for pattern, repl in PII_PATTERNS:
        col = F.regexp_replace(col, pattern, repl)
    return col


def fingerprint(text: Column | str) -> Column:
    """Normalized-content fingerprint: md5 of lowercased,
    whitespace-collapsed text. Stable across engines (md5 is md5);
    the exact-dedup key for content-identical documents.
    """
    col = F.col(text) if isinstance(text, str) else text
    return F.md5(F.encode(F.lower(F.trim(F.regexp_replace(col, r"\s+", " "))), "UTF-8"))


def repetition_metrics(df, text_col: str = "text", id_col: str = "doc_id"):
    """Per-document repetition signals (Gopher-rules style):

    - ``n_tokens``        — whitespace token count
    - ``top_token_ratio`` — most frequent token's share of all tokens
    - ``dup_bigram_ratio``— 1 − distinct-bigram / total-bigram count

    Both signals need within-document grouping, so the scalable shape
    is explode + aggregate (the shingle-postings pattern from
    operators/dedup.py), NOT per-row array HOFs: ``aggregate``/
    ``transform`` lambdas are interpreted (CodegenFallback) and an
    array-side distinct is O(len²) per row. Tokens/bigrams are hashed
    to fixed-width longs before the shuffle; both aggregations and the
    final join share the id-hash partitioning, so Spark inserts one
    exchange for the explode and reuses it.
    """
    from hw_kafka_streams_spark.operators.dedup import shingle_postings

    toks = df.select(
        F.col(id_col).alias("id"), F.explode(word_tokens(F.col(text_col))).alias("tok")
    ).select("id", F.xxhash64("tok").alias("th"))
    tok_stats = (
        toks.groupBy("id", "th")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("id")
        .agg(
            F.sum("c").alias("n_tokens"),
            (F.max("c") / F.sum("c")).alias("top_token_ratio"),
        )
    )
    bi = shingle_postings(df, text_col, id_col, n=2).groupBy("id").agg(
        F.count(F.lit(1)).alias("n_bi"),
        F.count_distinct(F.col("shingle")).alias("n_bi_d"),
    )
    dup = F.when(
        F.col("n_bi") > 0, 1.0 - F.col("n_bi_d") / F.col("n_bi")
    ).otherwise(0.0)
    return tok_stats.join(bi, "id", "left").select(
        F.col("id").alias(id_col),
        "n_tokens",
        "top_token_ratio",
        F.coalesce(dup, F.lit(0.0)).alias("dup_bigram_ratio"),
    )


def boilerplate_prune(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    width: int = 5,
    max_df: int = 2,
) -> DataFrame:
    """Corpus-level boilerplate removal (the CCNet/RefinedWeb passage-
    dedup idea re-expressed relationally): split every document into
    fixed ``width``-token passages, drop any passage whose document
    frequency exceeds ``max_df`` (navigation chrome, license headers,
    cookie banners — text shared verbatim across many documents), and
    reassemble what is left.

    Returns one row per input document:
    ``(doc_id, n_chunks, n_kept, kept_fp)`` where ``kept_fp`` is the
    md5 of the rebuilt text ('' when everything was pruned).

    Scale shape: tokenize → passage agg on (id, chunk-idx) [1 shuffle],
    passage document-frequency on passage text [1 shuffle], hot-list
    LEFT ANTI join (hot passages are by construction few — df is
    capped from below by max_df — so the list broadcasts), rebuild agg
    on id [reuses the id-hash partitioning]. No step is quadratic and
    the hot-passage side is bounded, so a 1000-executor run shuffles
    ~tokens once and ~passages twice.
    """
    toks = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(word_tokens(F.col(text_col))).alias("pos", "tok"),
    )
    chunks = toks.groupBy(
        "id", F.expr(f"pos div {width}").alias("cidx")
    ).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                lambda x: x["tok"],
            ),
            " ",
        ).alias("ctext")
    )
    hot = (
        chunks.groupBy("ctext")
        .agg(F.count_distinct("id").alias("cdf"))
        .filter(F.col("cdf") > max_df)
        .select("ctext", F.lit(True).alias("is_hot"))
    )
    # Flag-then-single-agg (not anti-join + separate totals agg): marking
    # hot passages with a broadcast left join lets ONE per-doc
    # aggregation produce total count, kept count, and the rebuilt
    # fingerprint together — the chunk pipeline is consumed twice (hot
    # list + final agg; identical exchange, so Spark reuses it) instead
    # of three times, and no totals-vs-rebuilt join is needed.
    flagged = chunks.join(F.broadcast(hot), "ctext", "left").select(
        "id", "cidx", "ctext", F.coalesce(F.col("is_hot"), F.lit(False)).alias("is_hot")
    )
    kept_structs = F.filter(
        F.array_sort(F.collect_list(F.struct("cidx", "ctext", "is_hot"))),
        lambda x: ~x["is_hot"],
    )
    return flagged.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum((~F.col("is_hot")).cast("long")).alias("n_kept"),
        F.md5(
            F.array_join(F.transform(kept_structs, lambda x: x["ctext"]), " ")
        ).alias("kept_fp"),
    ).select(
        F.col("id").alias(id_col), "n_chunks", "n_kept", "kept_fp"
    )


def unigram_logprob_scores(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document unigram language-model quality score: the mean
    natural-log probability of the document's tokens under the corpus's
    own unigram distribution — the cheap stand-in for perplexity
    filtering (KenLM-style) in quality-scoring pipelines. Low scores
    mean rare-token-heavy (gibberish, boilerplate codes); high scores
    mean common-token text.

    Determinism recipe (the BM25 one): tf and the vocabulary counts are
    exact integer aggregations; each (doc, term) contribution
    ``tf * ln(cnt/N)`` is a scalar IEEE expression rounded to
    DECIMAL(18,6); the per-doc sum runs in exact DECIMAL so reducer
    order cannot drift the value; only the final mean is a double.

    Scale: one shuffle to (doc, term) tf, one to the term vocabulary;
    the vocabulary joins back by term (shard at crawl scale — here
    Spark/AQE picks broadcast); final agg reuses the doc partitioning.
    """
    from hw_kafka_streams_spark.operators.skew import spread_small

    # spread: tokenize-explode + map-side tf combine otherwise run
    # inside a single-split scan stage; no-op at real scale
    toks = spread_small(
        df.select(F.col(id_col).alias("id"), F.col(text_col).alias("__t")),
        key="id",
    ).select(
        "id",
        F.explode(word_tokens(F.lower(F.col("__t")))).alias("term"),
    )
    tf = toks.groupBy("id", "term").agg(F.count(F.lit(1)).alias("tf"))
    vocab = tf.groupBy("term").agg(F.sum("tf").alias("cnt"))
    n_total = vocab.agg(F.sum("cnt").alias("n_total"))  # 1-row broadcast
    contrib = (
        tf.join(vocab, "term")
        .crossJoin(F.broadcast(n_total))
        .select(
            "id",
            "tf",
            F.round(
                F.col("tf")
                * F.log(F.col("cnt").cast("double") / F.col("n_total")),
                6,
            )
            .cast("decimal(18,6)")
            .alias("s"),
        )
    )
    return contrib.groupBy("id").agg(
        F.sum("tf").alias("n_tokens"),
        F.round(F.sum("s").cast("double") / F.sum("tf"), 6).alias("avg_ln_p"),
    ).select(F.col("id").alias(id_col), "n_tokens", "avg_ln_p")


def token_distribution_drift(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-group token-distribution drift vs the whole corpus:
    KL(group ‖ corpus) = Σ_t p_g(t)·ln(p_g(t)/p_c(t)) — the
    distribution-shift check run between crawl snapshots or
    train/validation splits before a data mix changes silently.

    Determinism: tf and totals are exact integers; each (group, term)
    contribution is one scalar IEEE expression rounded to
    DECIMAL(18,9) and decimal-summed (reducer-order-proof). KL ≥ 0 up
    to the 1e-9 rounding granularity. Scale: shuffles on (group, term)
    and term only; the vocabulary joins back by term (broadcast here,
    sharded at crawl scale); groups re-aggregate on the group key.
    """
    toks = df.select(
        F.col(group_col).alias("grp"),
        F.explode(word_tokens(F.lower(F.col(text_col)))).alias("term"),
    )
    tf = toks.groupBy("grp", "term").agg(F.count(F.lit(1)).alias("tf"))
    gsum = tf.groupBy("grp").agg(F.sum("tf").alias("n_grp"))
    vocab = tf.groupBy("term").agg(F.sum("tf").alias("cnt"))
    n_total = vocab.agg(F.sum("cnt").alias("n_total"))
    pg = F.col("tf").cast("double") / F.col("n_grp")
    pc = F.col("cnt").cast("double") / F.col("n_total")
    contrib = (
        tf.join(F.broadcast(gsum), "grp")
        .join(vocab, "term")
        .crossJoin(F.broadcast(n_total))
        .select(
            "grp",
            F.round(pg * F.log(pg / pc), 9).cast("decimal(18,9)").alias("s"),
        )
    )
    return (
        contrib.groupBy("grp")
        .agg(F.round(F.sum("s").cast("double"), 6).alias("kl_vs_corpus"))
        .join(gsum.select("grp", "n_grp"), "grp")
        .select(
            F.col("grp").alias(group_col),
            F.col("n_grp").alias("n_tokens"),
            "kl_vs_corpus",
        )
    )


def _adjacent_pairs(toks: Column) -> Column:
    """Array of adjacent-token pair structs (w1, w2) — pure array
    slice/zip_with, zero shuffle; empty for texts with < 2 tokens."""
    n = F.size(toks)
    pair_len = F.greatest(n - F.lit(1), F.lit(0))
    return F.zip_with(
        F.slice(toks, F.lit(1), pair_len),
        F.slice(toks, F.lit(2), pair_len),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )


def bigram_logprob_scores(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document bigram language-model score: mean natural-log
    probability of each adjacent token pair under the corpus's own
    add-one-smoothed bigram model — one notch up from
    :func:`unigram_logprob_scores` toward KenLM-style perplexity
    filtering (context-aware: "the the" scores low even though both
    unigrams are common). Docs with < 2 tokens have no bigrams and are
    excluded (stated contract).

    Model: p(w2|w1) = (c2(w1,w2)+1) / (ctx(w1)+V), with c2 the corpus
    bigram count, ctx(w1)=Σ_w c2(w1,w) the context total, and V the
    corpus unigram vocabulary size.

    Determinism recipe (the unigram-LM one): every count is an exact
    integer aggregation; each (doc, bigram) contribution
    ``tf · ln(p)`` is one scalar IEEE expression rounded to
    DECIMAL(18,6) and decimal-summed, so reducer order cannot drift
    the value. Scale: bigrams come from array slice/zip_with (no
    window, no per-doc shuffle); shuffles are keyed (doc,bigram),
    (bigram), (w1) — all partial-aggregated map-side; the model tables
    join back by bigram (broadcast here, shard at crawl scale).
    """
    from hw_kafka_streams_spark.operators.skew import spread_small

    # spread: the tokenize + bigram explode otherwise run inside a
    # single-split scan stage; no-op at real scale
    base = spread_small(
        df.select(F.col(id_col).alias("id"), F.col(text_col).alias("__t")),
        key="id",
    ).select("id", word_tokens(F.lower(F.col("__t"))).alias("toks"))
    bg = base.select(
        "id", F.explode(_adjacent_pairs(F.col("toks"))).alias("p")
    ).select("id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    tfb = bg.groupBy("id", "w1", "w2").agg(F.count(F.lit(1)).alias("tf"))
    c2 = tfb.groupBy("w1", "w2").agg(F.sum("tf").alias("c2"))
    ctx = c2.groupBy("w1").agg(F.sum("c2").alias("ctx"))
    vocab = (
        base.select(F.explode("toks").alias("t"))
        .agg(F.countDistinct("t").alias("v"))
    )
    p = (F.col("c2") + 1).cast("double") / (F.col("ctx") + F.col("v"))
    contrib = (
        tfb.join(c2, ["w1", "w2"])
        .join(ctx, "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "id",
            "tf",
            (F.col("tf") * F.round(F.log(p), 6).cast("decimal(18,6)")).alias("s"),
        )
    )
    return (
        contrib.groupBy("id")
        .agg(
            F.sum("tf").alias("n_bigrams"),
            F.round(F.sum("s").cast("double") / F.sum("tf"), 6).alias("avg_ln_p"),
        )
        .select(F.col("id").alias(id_col), "n_bigrams", "avg_ln_p")
    )


def bigram_backoff_scores(
    df: DataFrame,
    model_df: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 0.4,
) -> DataFrame:
    """Per-document stupid-backoff bigram LM score (Brants et al. 2007,
    "Large Language Models in Machine Translation") — the fix for
    add-one smoothing's failure mode: on a small or held-out corpus,
    +1 smoothing over-penalizes every unseen bigram by spreading one
    pseudo-count across the whole V-sized vocabulary, while stupid
    backoff just falls back to the unigram relative frequency with a
    fixed discount. The published recipe, exact-integer + DECIMAL, so
    it stays bit-for-bit oracle-able:

        S(w2|w1) = c2(w1,w2) / ctx(w1)      if the bigram is in the model
                 = α · S(w2)                otherwise
        S(w2)    = c1(w2) / N               if w2 is in the model
                 = α / N                    otherwise (OOV floor)

    with α = 0.4 (the paper's constant), c2/ctx/c1/N exact corpus
    counts, and scores (not probabilities — stupid backoff does not
    normalize, which is why it scales; the paper's point). Train on
    ``model_df`` (default: ``df`` itself — then every bigram is seen
    and no backoff fires); pass a held-out/reference corpus to score
    new data against it, the realistic quality-filter shape.

    Per doc: ``n_bigrams``, ``n_backoff`` (bigram occurrences that fell
    back — the novelty diagnostic), ``avg_ln_s`` (tf-weighted mean
    ln S, DECIMAL(18,6)-summed so reducer order cannot drift the hash).
    Docs with < 2 tokens have no bigrams and are excluded.

    Scale shape: model tables are (w1,w2)- and (w1)-keyed exact counts
    (partial-agged); scoring is LEFT joins keyed (w1,w2), (w1), (w2) —
    shard-joinable at crawl scale; N is a broadcast scalar.
    """
    model_df = df if model_df is None else model_df
    from hw_kafka_streams_spark.operators.skew import spread_small

    # spread: tokenize + bigram explode otherwise run inside a
    # single-split scan stage; no-op at real scale
    base = spread_small(
        df.select(F.col(id_col).alias("id"), F.col(text_col).alias("__t")),
        key="id",
    ).select("id", word_tokens(F.lower(F.col("__t"))).alias("toks"))
    tfb = (
        base.select(
            "id", F.explode(_adjacent_pairs(F.col("toks"))).alias("p")
        )
        .select("id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .groupBy("id", "w1", "w2")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    mtoks = model_df.select(
        word_tokens(F.lower(F.col(text_col))).alias("toks")
    )
    c2 = (
        mtoks.select(F.explode(_adjacent_pairs(F.col("toks"))).alias("p"))
        .groupBy(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .agg(F.count(F.lit(1)).alias("c2"))
    )
    ctx = c2.groupBy("w1").agg(F.sum("c2").alias("ctx"))
    # unigram counts WITHOUT a second corpus explode: every token is
    # the w1 of exactly one bigram except each doc's LAST token, so
    # c1 = ctx (w1 occurrence counts, derived from the tiny c2 table)
    # + last-token counts (a narrow element_at pass, no explode). The
    # heavy tokenize+explode over the train half runs ONCE.
    last = (
        mtoks.select(F.element_at("toks", -1).alias("t"))
        .filter(F.col("t").isNotNull())
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("_cl"))
    )
    # union + re-aggregate, not a full-outer join: a full outer can
    # never broadcast, so it would force a vocab-sized sort-merge
    # join; the union feeds one partial-agged hash aggregate instead
    uni = (
        ctx.select(F.col("w1").alias("t"), F.col("ctx").alias("_c"))
        .unionByName(last.select("t", F.col("_cl").alias("_c")))
        .groupBy("t")
        .agg(F.sum("_c").alias("c1"))
    )
    ntot = uni.agg(F.sum("c1").alias("n_tok"))
    seen = F.col("c2").isNotNull()
    s = F.when(
        seen, F.col("c2").cast("double") / F.col("ctx")
    ).otherwise(
        F.lit(alpha)
        * F.coalesce(F.col("c1").cast("double"), F.lit(alpha))
        / F.col("n_tok")
    )
    contrib = (
        tfb.join(c2, ["w1", "w2"], "left")
        .join(ctx, "w1", "left")
        .join(uni.withColumnRenamed("t", "w2"), "w2", "left")
        .crossJoin(F.broadcast(ntot))
        .select(
            "id",
            "tf",
            F.when(seen, F.lit(0)).otherwise(F.col("tf")).alias("bk"),
            (F.col("tf") * F.round(F.log(s), 6).cast("decimal(18,6)")).alias(
                "s"
            ),
        )
    )
    return (
        contrib.groupBy("id")
        .agg(
            F.sum("tf").alias("n_bigrams"),
            F.sum("bk").alias("n_backoff"),
            F.round(F.sum("s").cast("double") / F.sum("tf"), 6).alias(
                "avg_ln_s"
            ),
        )
        .select(F.col("id").alias(id_col), "n_bigrams", "n_backoff", "avg_ln_s")
    )


def kneser_ney_scores(
    df: DataFrame,
    model_df: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    discount: float = 0.75,
) -> DataFrame:
    """Per-document interpolated Kneser-Ney bigram LM score (Kneser &
    Ney 1995; Chen & Goodman 1999's interpolated variant) — the
    smoothing KenLM ships and CCNet-style perplexity filters actually
    use. Where stupid backoff falls back to RAW unigram frequency,
    KN backs off to the CONTINUATION probability — how many distinct
    contexts a word completes — which stops high-frequency but
    context-bound words ("Francisco") from inflating unseen-bigram
    scores:

        p(w2|w1) = (c2(w1,w2) − D)/ctx(w1) + λ(w1)·p_cont(w2)
        λ(w1)    = D · N1+(w1,·) / ctx(w1)
        p_cont(w2) = N1+(·,w2) / B

    with D = 0.75 (the Chen-Goodman fixed discount), c2/ctx exact
    bigram/context counts, N1+(w1,·) the distinct-successor count,
    N1+(·,w2) the distinct-predecessor count, and B the number of
    distinct bigram types. c2 ≥ 1 on seen bigrams and D < 1, so the
    max(·,0) clamp in the textbook formula never binds. Held-out
    deviations (documented, both engines identical): an unseen w2
    takes the continuation floor p_cont = 0.5/B, and an unseen
    CONTEXT w1 (ctx = 0, λ undefined) backs off fully to p_cont(w2).
    Train on ``model_df`` (default: ``df`` itself); pass a held-out
    corpus for the realistic quality-filter shape.

    Per doc: ``n_bigrams``, ``n_unseen`` (occurrences whose bigram was
    not in the model — the interpolation-only mass), ``avg_ln_p``
    (tf-weighted mean ln p, DECIMAL(18,6)-summed so reducer order
    cannot drift the hash). Docs with < 2 tokens are excluded.

    Scale shape: one tokenize+explode over each corpus; ctx and the
    distinct-successor count come from ONE groupBy over the c2 table
    (no second corpus pass), p_cont from a w2-keyed groupBy of the
    same table; scoring is LEFT joins keyed (w1,w2), (w1), (w2) — all
    partial-agged and shard-joinable at crawl scale; B is a broadcast
    1-row scalar. No windows, no skew-prone keys beyond the Zipfian
    w1/w2 equi-joins AQE already splits.
    """
    model_df = df if model_df is None else model_df
    from hw_kafka_streams_spark.operators.skew import spread_small

    # spread: tokenize + bigram explode otherwise run inside a
    # single-split scan stage; no-op at real scale
    tfb = (
        spread_small(
            df.select(
                F.col(id_col).alias("id"), F.col(text_col).alias("__t")
            ),
            key="id",
        )
        .select("id", word_tokens(F.lower(F.col("__t"))).alias("toks"))
        .select("id", F.explode(_adjacent_pairs(F.col("toks"))).alias("p"))
        .select("id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .groupBy("id", "w1", "w2")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    c2 = (
        model_df.select(word_tokens(F.lower(F.col(text_col))).alias("toks"))
        .select(F.explode(_adjacent_pairs(F.col("toks"))).alias("p"))
        .groupBy(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .agg(F.count(F.lit(1)).alias("c2"))
    )
    # ctx(w1) and N1+(w1,·) from ONE pass over the (already tiny
    # vocabulary-sized) bigram-type table; same for the continuation
    # counts — the corpus-sized explode runs exactly once.
    ctxn1 = c2.groupBy("w1").agg(
        F.sum("c2").alias("ctx"), F.count(F.lit(1)).alias("n1fwd")
    )
    cont = c2.groupBy("w2").agg(F.count(F.lit(1)).alias("ncont"))
    btot = c2.agg(F.count(F.lit(1)).alias("b_types"))
    d = F.lit(float(discount))
    pcont = (
        F.coalesce(F.col("ncont").cast("double"), F.lit(0.5))
        / F.col("b_types")
    )
    seen = F.col("c2").isNotNull()
    known_ctx = F.col("ctx").isNotNull()
    lam = d * F.col("n1fwd") / F.col("ctx")
    p = (
        F.when(
            seen,
            (F.col("c2") - d) / F.col("ctx") + lam * pcont,
        )
        .when(known_ctx, lam * pcont)
        .otherwise(pcont)
    )
    contrib = (
        tfb.join(c2, ["w1", "w2"], "left")
        .join(ctxn1, "w1", "left")
        .join(cont, "w2", "left")
        .crossJoin(F.broadcast(btot))
        .select(
            "id",
            "tf",
            F.when(seen, F.lit(0)).otherwise(F.col("tf")).alias("uns"),
            (F.col("tf") * F.round(F.log(p), 6).cast("decimal(18,6)")).alias(
                "s"
            ),
        )
    )
    return (
        contrib.groupBy("id")
        .agg(
            F.sum("tf").alias("n_bigrams"),
            F.sum("uns").alias("n_unseen"),
            F.round(F.sum("s").cast("double") / F.sum("tf"), 6).alias(
                "avg_ln_p"
            ),
        )
        .select(F.col("id").alias(id_col), "n_bigrams", "n_unseen", "avg_ln_p")
    )


def char_entropy_scores(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document character-level Shannon entropy (nats) — the cheap
    gibberish/repetition signal used alongside length and punctuation
    ratios in quality filtering: natural text sits near ~3 nats,
    base64 blobs higher, "aaaa..." runs near zero.

    H = −Σ_c p_c·ln(p_c) over the doc's character distribution; each
    term is rounded to DECIMAL(18,9) and decimal-summed
    (reducer-order-proof). One shuffle keyed (doc, char) — map-side
    combined, per-doc cardinality ≤ alphabet size — then a doc-keyed
    final agg.
    """
    chars = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.filter(F.split(F.col(text_col), ""), lambda c: c != "")).alias(
            "ch"
        ),
    )
    cc = chars.groupBy("id", "ch").agg(F.count(F.lit(1)).alias("cnt"))
    n = cc.groupBy("id").agg(
        F.sum("cnt").alias("n_chars_counted"),
        F.count(F.lit(1)).alias("distinct_chars"),
    )
    p = F.col("cnt").cast("double") / F.col("n_chars_counted")
    return (
        cc.join(n, "id")
        .select(
            "id",
            "n_chars_counted",
            "distinct_chars",
            F.round(-p * F.log(p), 9).cast("decimal(18,9)").alias("t"),
        )
        .groupBy("id", "n_chars_counted", "distinct_chars")
        .agg(F.round(F.sum("t").cast("double"), 6).alias("entropy_nats"))
        .select(
            F.col("id").alias(id_col),
            "n_chars_counted",
            "distinct_chars",
            "entropy_nats",
        )
    )


def pmi_collocations(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
    topk: int = 20,
) -> DataFrame:
    """Top-k adjacent-word collocations by pointwise mutual information:
    PMI(a,b) = ln( p(a,b) / (p(a)·p(b)) ) with p(a,b)=c2/N2 over
    bigrams and p(a)=c1/N1 over unigrams — the classic corpus-mining
    pass for multiword expressions ("new york"), and a vocabulary
    source for tokenizer merge auditing.

    Determinism: counts exact; PMI is one scalar IEEE expression
    rounded to 6 dp BEFORE ordering, so both engines sort identical
    values; ties break on (w1, w2). ``min_count`` kills the noisy
    hapax tail (and bounds the candidate table). Scale: two tiny
    vocab-sized aggregates + two joins on single words (broadcast
    here, sharded at crawl scale); top-k is TakeOrdered, no global
    sort materialization.
    """
    base = df.select(word_tokens(F.lower(F.col(text_col))).alias("toks"))
    uni = (
        base.select(F.explode("toks").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c1"))
    )
    n1 = uni.agg(F.sum("c1").alias("n1"))
    c2 = (
        base.select(F.explode(_adjacent_pairs(F.col("toks"))).alias("p"))
        .select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c2"))
        .filter(F.col("c2") >= min_count)
    )
    n2 = (
        base.select(
            F.greatest(F.size("toks") - F.lit(1), F.lit(0)).alias("nb")
        ).agg(F.sum("nb").alias("n2"))
    )
    pab = F.col("c2").cast("double") / F.col("n2")
    pa = F.col("a.c1").cast("double") / F.col("n1")
    pb = F.col("b.c1").cast("double") / F.col("n1")
    return (
        c2.join(F.broadcast(uni.alias("a")), F.col("w1") == F.col("a.w"))
        .join(F.broadcast(uni.alias("b")), F.col("w2") == F.col("b.w"))
        .crossJoin(F.broadcast(n1))
        .crossJoin(F.broadcast(n2))
        .select(
            "w1",
            "w2",
            F.col("c2").alias("pair_count"),
            F.round(F.log(pab / (pa * pb)), 6).alias("pmi"),
        )
        .orderBy(F.desc("pmi"), "w1", "w2")
        .limit(topk)
    )


def compression_ratio_arrow(text: Column | str) -> Column:
    """Per-document DEFLATE compression ratio (compressed/raw bytes,
    zlib level 6) — the classic "too compressible = boilerplate/spam,
    incompressible = binary noise" quality signal (used alongside the
    Gopher-style rules). NULL for NULL/empty text.

    Arrow-batched pandas UDF (zlib is C-speed per doc; no JVM
    equivalent exists). DEFLATE output depends on the zlib build, so
    this column is pinned by invariant contracts (bounds + class
    separation), not value equality — the honest oracle class for
    codec-dependent kernels. Zero shuffle: a narrow map over the scan.
    """
    import zlib

    from pyspark.sql.functions import pandas_udf

    col = F.col(text) if isinstance(text, str) else text

    @pandas_udf("double")
    def _ratio(s: pd.Series) -> pd.Series:
        def one(t):
            if t is None or len(t) == 0:
                return None
            raw = t.encode("utf-8")
            return len(zlib.compress(raw, 6)) / len(raw)

        return s.map(one)

    return _ratio(col)


def ctfidf_terms(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    top_k: int = 3,
) -> DataFrame:
    """Class-based TF-IDF (the BERTopic c-TF-IDF): the terms that
    characterize each GROUP of documents (source/domain/cluster), not
    each document — the standard readout for "what is this domain
    about?" when curating a mixture.

        score(t, c) = tf(t, c) / w(c) · ln(1 + A / f(t))

    tf = term count in class, w = tokens in class, f = corpus term
    count, A = mean tokens per class. Every input to the formula is an
    exact integer aggregate; the score is one scalar IEEE expression
    (oracle-reproducible, round 6).

    Scale: one (class, term) shuffle shared by all three count tables;
    the corpus term table joins back by term (AQE broadcast while it
    fits); the ranking window partitions by class over the aggregated
    (class, term) table — vocabulary-sized, never corpus-sized.
    """
    from pyspark.sql import Window

    toks = df.select(
        F.col(group_col).alias("grp"),
        F.explode(word_tokens(F.lower(F.col(text_col)))).alias("term"),
    )
    tf = toks.groupBy("grp", "term").agg(F.count(F.lit(1)).alias("tf"))
    w_c = tf.groupBy("grp").agg(F.sum("tf").alias("w"))
    f_t = tf.groupBy("term").agg(F.sum("tf").alias("f"))
    totals = w_c.agg(
        F.sum("w").alias("n_total"), F.count(F.lit(1)).alias("n_classes")
    )  # 1 row
    score = F.round(
        (F.col("tf").cast("double") / F.col("w"))
        * F.log(
            F.lit(1.0)
            + (F.col("n_total").cast("double") / F.col("n_classes")) / F.col("f")
        ),
        6,
    )
    scored = (
        tf.join(F.broadcast(w_c), "grp")
        .join(f_t, "term")
        .crossJoin(F.broadcast(totals))
        .select("grp", "term", score.alias("ctfidf"))
    )
    rw = Window.partitionBy("grp").orderBy(F.desc("ctfidf"), F.asc("term"))
    return (
        scored.withColumn("rnk", F.row_number().over(rw))
        .filter(F.col("rnk") <= top_k)
        .select(F.col("grp").alias(group_col), "term", "ctfidf", "rnk")
    )


def flesch_scores(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document Flesch reading-ease from cheap surface counts —
    the readability leg of a quality-filter stack (very low scores
    flag legalese/generated sludge, implausibly high ones flag
    word-salad).

        flesch = 206.835 − 1.015·(words/sentences) − 84.6·(syllables/words)

    Syllables ≈ vowel-group runs ``[aeiouy]+`` (the classic heuristic);
    sentences = terminator runs ``[.!?]+`` floored at 1; words = the
    repo's whitespace tokenizer. All three are single-pass vectorized
    regexp counts — a zero-shuffle narrow map, like quality_score.
    """
    t = F.col(text_col)
    words = F.size(word_tokens(t))
    syll = F.regexp_count(F.lower(t), F.lit("[aeiouy]+"))
    sent = F.greatest(F.regexp_count(t, F.lit("[.!?]+")), F.lit(1))
    flesch = (
        F.lit(206.835)
        - F.lit(1.015) * (words.cast("double") / sent)
        - F.lit(84.6) * (syll.cast("double") / words)
    )
    return df.select(
        F.col(id_col),
        words.alias("n_words"),
        syll.alias("n_syllables"),
        sent.alias("n_sentences"),
        F.when(words > 0, F.round(flesch, 4)).alias("flesch"),
    )


def vocab_jaccard_pairs(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    max_df: int | None = None,
) -> DataFrame:
    """Pairwise vocabulary Jaccard between GROUPS of documents
    (sources/domains) — the similarity matrix mixture curation uses to
    find redundant domains worth merging or down-weighting.

    |A∩B| comes from an inverted-index self-join on the term (each
    term with group-df d contributes d·(d−1)/2 pairs — pair space is
    groups², never docs²); |A| and |B| are per-group vocabulary counts
    broadcast back. With millions of groups (web domains) set
    ``max_df`` to drop universal terms before the self-join — they
    carry no similarity signal and dominate the pair count.
    """
    g = (
        df.select(
            F.col(group_col).alias("grp"),
            F.explode(word_tokens(F.lower(F.col(text_col)))).alias("term"),
        )
        .distinct()
    )
    if max_df is not None:
        keep = (
            g.groupBy("term")
            .agg(F.count(F.lit(1)).alias("_df"))
            .filter(F.col("_df") <= max_df)
            .select("term")
        )
        g = g.join(keep, "term")
    sizes = g.groupBy("grp").agg(F.count(F.lit(1)).alias("vocab"))
    a = g.select(F.col("grp").alias("grp_a"), "term")
    b = g.select(F.col("grp").alias("grp_b"), "term")
    inter = (
        # shuffle-hash: rows per term are bounded by the group count
        # (and by max_df when set) — small build side, no sort
        a.join(b.hint("shuffle_hash"), "term")
        .filter(F.col("grp_a") < F.col("grp_b"))
        .groupBy("grp_a", "grp_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return (
        inter.join(
            F.broadcast(sizes.select(F.col("grp").alias("grp_a"),
                                     F.col("vocab").alias("vocab_a"))),
            "grp_a",
        )
        .join(
            F.broadcast(sizes.select(F.col("grp").alias("grp_b"),
                                     F.col("vocab").alias("vocab_b"))),
            "grp_b",
        )
        .select(
            "grp_a",
            "grp_b",
            "n_common",
            "vocab_a",
            "vocab_b",
            F.round(
                F.col("n_common").cast("double")
                / (F.col("vocab_a") + F.col("vocab_b") - F.col("n_common")),
                6,
            ).alias("jaccard"),
        )
    )


def tfidf_cosine_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.3,
    max_df: int | None = None,
) -> DataFrame:
    """Sparse TF-IDF cosine similarity join — WEIGHTED near-duplicate /
    related-document pairs, where Jaccard treats every shared term
    equally but cosine lets rare terms dominate (the classic sparse-
    vector similarity join underlying related-article and same-story
    detection).

        cos(a, b) = Σ_t w_at·w_bt / (‖a‖·‖b‖),  w = tf · ln((N+1)/(df+1))

    Plan: one (doc, term) tf shuffle feeds the df table, the weights,
    and the norms; the pair generator is the term inverted index
    (products summed per pair — never all-pairs). ``max_df`` is the
    posting-list skew guard; additionally idf ≈ 0 for ubiquitous terms,
    so dropping them barely moves the measured cosine (unlike Jaccard,
    where max_df changes the metric). Norms and dots accumulate as
    DECIMAL of per-term-rounded products, so reducer order cannot
    drift the hash.
    """
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(word_tokens(F.lower(F.col(text_col)))).alias("term"),
    )
    tf = toks.groupBy("id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_t = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    if max_df is not None:
        df_t = df_t.filter(F.col("df") <= max_df)
    n_docs = tf.select(F.countDistinct("id").alias("n_docs"))
    w = (
        tf.join(df_t, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "id",
            "term",
            F.round(
                F.col("tf")
                * F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)),
                6,
            ).alias("w"),
        )
    )
    w = managed_persist(w)  # feeds the norms AND both self-join sides
    norms = w.groupBy("id").agg(
        F.sqrt(
            F.sum(
                F.round(F.col("w") * F.col("w"), 6).cast("decimal(18,6)")
            ).cast("double")
        ).alias("norm")
    )
    a = w.select(F.col("id").alias("id1"), "term", F.col("w").alias("w1"))
    b = w.select(F.col("id").alias("id2"), "term", F.col("w").alias("w2"))
    dots = (
        # shuffle-hash: rows per term are df-bounded (and idf-weighted
        # terms with huge df carry ~zero weight anyway)
        a.join(b.hint("shuffle_hash"), "term")
        .filter(F.col("id1") < F.col("id2"))
        .groupBy("id1", "id2")
        .agg(
            F.sum(
                F.round(F.col("w1") * F.col("w2"), 6).cast("decimal(18,6)")
            )
            .cast("double")
            .alias("dot")
        )
    )
    n1 = norms.select(F.col("id").alias("id1"), F.col("norm").alias("n1"))
    n2 = norms.select(F.col("id").alias("id2"), F.col("norm").alias("n2"))
    return (
        dots.join(n1, "id1")
        .join(n2, "id2")
        .withColumn("cos_sim", F.col("dot") / (F.col("n1") * F.col("n2")))
        .filter(F.col("cos_sim") >= threshold)
        .select("id1", "id2", F.round("cos_sim", 4).alias("cos_sim"))
    )


def llr_collocations(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
    topk: int = 20,
) -> DataFrame:
    """Top-k adjacent-word collocations by Dunning's log-likelihood
    ratio — the robust sibling of PMI (which over-rewards rare pairs:
    two hapaxes that co-occur once get a huge PMI; LLR's contingency
    test instead asks how SURPRISING the co-occurrence is given both
    margins, so it ranks well even at low counts).

    2·ΔLL over the 2×2 bigram contingency table via the xlogx form:

        LLR = 2·( S(k11)+S(k12)+S(k21)+S(k22)
                  − S(r1) − S(T−r1) − S(c1) − S(T−c1) + S(T) )

    with S(x)=x·ln x (S(0)=0), k11 = c(w1,w2), r1/c1 the bigram-table
    margins, T total bigrams. Every input is an exact integer count;
    LLR is ONE scalar IEEE expression per pair (no cross-row float
    sums), rounded before ordering so both engines rank identically.
    Scale: margins are vocab-sized aggregates off the shared bigram
    table; top-k is TakeOrdered.
    """
    base = df.select(word_tokens(F.lower(F.col(text_col))).alias("toks"))
    c2 = (
        base.select(F.explode(_adjacent_pairs(F.col("toks"))).alias("p"))
        .select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("k11"))
    )
    c2 = managed_persist(c2)  # margins + candidate filter share the bigram table
    r = c2.groupBy("w1").agg(F.sum("k11").alias("r1"))
    c = c2.groupBy("w2").agg(F.sum("k11").alias("cc1"))
    t = c2.agg(F.sum("k11").alias("t"))

    def s(x):
        return F.when(x > 0, x.cast("double") * F.log(x.cast("double"))).otherwise(
            F.lit(0.0)
        )

    k11 = F.col("k11")
    k12 = F.col("r1") - k11
    k21 = F.col("cc1") - k11
    k22 = F.col("t") - F.col("r1") - F.col("cc1") + k11
    llr = 2.0 * (
        s(k11)
        + s(k12)
        + s(k21)
        + s(k22)
        - s(F.col("r1"))
        - s(F.col("t") - F.col("r1"))
        - s(F.col("cc1"))
        - s(F.col("t") - F.col("cc1"))
        + s(F.col("t"))
    )
    return (
        c2.filter(F.col("k11") >= min_count)
        .join(F.broadcast(r), "w1")
        .join(F.broadcast(c), "w2")
        .crossJoin(F.broadcast(t))
        .select(
            "w1",
            "w2",
            F.col("k11").alias("pair_count"),
            F.round(llr, 4).alias("llr"),
        )
        .orderBy(F.desc("llr"), "w1", "w2")
        .limit(topk)
    )
