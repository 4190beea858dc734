"""Byte-pair-encoding training at corpus scale (Sennrich et al. 2016).

q_bpe_pair_stats computes the FIRST merge iteration's candidate table;
this operator runs the actual training loop: N merge rounds, each one

1. counting adjacent symbol pairs weighted by word frequency (the
   standard BPE compaction — the corpus is scanned ONCE to build the
   word-frequency vocabulary, every iteration after that works on the
   vocab table, which is vocabulary-sized, not corpus-sized);
2. picking the winning pair deterministically (max weighted count,
   ties broken on the pair's symbols) — a 1-row driver collect per
   iteration, the same bounded-epilogue shape as Lloyd centroid
   training;
3. applying the merge to every word's symbol string with a LITERAL
   space-delimited replace — ``' a b ' → ' ab '`` on a space-wrapped
   symbol string. Literal (non-regex) replacement sidesteps the
   regex-dialect and escaping drift between engines entirely, and both
   Spark ``replace`` and DuckDB ``replace`` share leftmost
   non-overlapping global semantics, so the DuckDB oracle can unroll
   the identical iterations as CTEs and match bit-for-bit. Because a
   literal match CONSUMES its trailing separator space, one pass skips
   every other pair in a chain of the same pair ("a a a a" merges once,
   not twice); each iteration therefore applies the replace THREE
   times, which fully merges chains of up to 8 identical pairs per
   word (longer runs barely exist in natural text, and the result is
   deterministic and engine-identical regardless).

Scale shape: the per-iteration aggregation is one (a, b)-keyed count
over the vocab table with map-side partials; the merge is a narrow
string map. At web scale the vocab table is millions of rows against a
corpus of trillions — iterating on it is the whole point of the
word-frequency compaction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hw_kafka_streams_spark.cache import managed_persist
from hw_kafka_streams_spark.operators.text import _adjacent_pairs, word_tokens


def _initial_vocab(df: DataFrame, text_col: str) -> DataFrame:
    """(sym, freq): space-wrapped char-symbol string + ``</w>`` marker
    per distinct word, with corpus frequency."""
    vocab = (
        df.select(F.explode(word_tokens(F.lower(F.col(text_col)))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    chars = F.filter(F.split("w", ""), lambda c: c != "")
    return vocab.select(
        F.concat(
            F.lit(" "),
            F.concat_ws(" ", F.concat(chars, F.array(F.lit("</w>")))),
            F.lit(" "),
        ).alias("sym"),
        "freq",
    )


def _pair_counts(syms: DataFrame) -> DataFrame:
    pairs = syms.select(
        "freq",
        F.explode(_adjacent_pairs(F.split(F.trim("sym"), " "))).alias("p"),
    )
    return pairs.groupBy(
        F.col("p.w1").alias("a"), F.col("p.w2").alias("b")
    ).agg(F.sum("freq").alias("pair_count"))


def bpe_train_merges(
    spark: SparkSession,
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 8,
) -> DataFrame:
    """Train ``n_merges`` BPE merges; returns the ordered merge table
    ``(merge_rank, a, b, pair_count)`` — the artifact a tokenizer
    applies at encode time.
    """
    # Persist the word-frequency vocab so the corpus-wide tokenize +
    # groupBy runs ONCE (the docstring's scale claim): each of the
    # n_merges per-iteration collect() actions would otherwise recompile
    # the full lineage and rescan the corpus every round.
    syms = managed_persist(_initial_vocab(df, text_col))
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        top = (
            _pair_counts(syms)
            .orderBy(F.desc("pair_count"), "a", "b")
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b, cnt = top[0]["a"], top[0]["b"], int(top[0]["pair_count"])
        merges.append((rank, a, b, cnt))
        merged = F.col("sym")
        for _ in range(3):  # chain-safe: see module docstring
            merged = F.replace(
                merged, F.lit(f" {a} {b} "), F.lit(f" {a}{b} ")
            )
        syms = syms.select(merged.alias("sym"), "freq")
        if rank % 4 == 0:
            # truncate the growing replace-chain lineage every few
            # rounds; the vocab-sized snapshot keeps plans short
            syms = syms.localCheckpoint(eager=True)
    return spark.createDataFrame(
        merges, "merge_rank int, a string, b string, pair_count long"
    )


def bpe_oracle_sql(n_merges: int = 8) -> str:
    """The DuckDB twin: the same iterations unrolled as CTEs — each
    round's winner via the identical (count DESC, a, b) order and the
    identical literal ``replace`` merge, so the merge table value-hash
    matches the Spark training run exactly."""
    ctes = [
        """v0 AS MATERIALIZED (
          SELECT ' ' || array_to_string(
                   list_concat(string_split(w, ''), ['</w>']), ' ')
                 || ' ' AS sym,
                 CAST(count(*) AS BIGINT) AS freq
          FROM (
            SELECT unnest(list_filter(
                     string_split_regex(trim(lower(text)), '\\s+'),
                     x -> x <> '')) AS w
            FROM documents
          ) GROUP BY 1
        )"""
    ]
    for i in range(1, n_merges + 1):
        prev = f"v{i - 1}"
        ctes.append(
            f"""w{i} AS MATERIALIZED (
          SELECT a, b, pair_count FROM (
            SELECT a, b, CAST(sum(freq) AS BIGINT) AS pair_count
            FROM (
              SELECT freq,
                     unnest([struct_pack(a := s[i], b := s[i+1])
                             FOR i IN range(1, len(s))], recursive := true)
              FROM (SELECT string_split(trim(sym), ' ') AS s, freq
                    FROM {prev})
            ) GROUP BY 1, 2
          ) ORDER BY pair_count DESC, a, b LIMIT 1
        )"""
        )
        ctes.append(
            f"""v{i} AS MATERIALIZED (
          SELECT replace(replace(replace(sym,
                   ' ' || w{i}.a || ' ' || w{i}.b || ' ',
                   ' ' || w{i}.a || w{i}.b || ' '),
                   ' ' || w{i}.a || ' ' || w{i}.b || ' ',
                   ' ' || w{i}.a || w{i}.b || ' '),
                   ' ' || w{i}.a || ' ' || w{i}.b || ' ',
                   ' ' || w{i}.a || w{i}.b || ' ') AS sym,
                 freq
          FROM {prev} CROSS JOIN w{i}
        )"""
        )
    selects = "\n        UNION ALL\n        ".join(
        f"SELECT {i} AS merge_rank, a, b, pair_count FROM w{i}"
        for i in range(1, n_merges + 1)
    )
    return (
        "WITH "
        + ",\n        ".join(ctes)
        + f"\n        SELECT CAST(merge_rank AS INT) AS merge_rank, a, b,"
        f" pair_count FROM ({selects}) ORDER BY merge_rank"
    )


def bpe_apply_counts(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply a trained merge table to a corpus and report the realized
    segmentation per document: ``(id, n_words, n_bpe_tokens,
    fertility)`` — the ENCODE side of BPE, and the number that actually
    matters for a token budget (how many units does this tokenizer
    spend per word on this corpus?).

    Plan shape: explode words (same construction as training), build
    each word's space-delimited symbol string, then apply the merges
    IN RANK ORDER as one chain of literal replaces — for M merges
    that is 3·M nested ``replace`` calls compiled into a single
    whole-stage-codegen projection, so encoding is one narrow pass
    over the corpus regardless of M. Symbol count = remaining
    separators + 1. The same chain replays in the DuckDB oracle.
    """
    words = df.select(
        F.col(id_col).alias("id"),
        F.explode(word_tokens(F.lower(F.col(text_col)))).alias("w"),
    )
    chars = F.filter(F.split("w", ""), lambda c: c != "")
    sym = F.concat(
        F.lit(" "),
        F.concat_ws(" ", F.concat(chars, F.array(F.lit("</w>")))),
        F.lit(" "),
    )
    for a, b in merges:
        for _ in range(3):  # chain-safe, same as training
            sym = F.replace(sym, F.lit(f" {a} {b} "), F.lit(f" {a}{b} "))
    n_sym = F.size(F.split(F.trim(sym), " "))
    return (
        words.select("id", n_sym.alias("_ns"))
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("_ns").cast("long").alias("n_bpe_tokens"),
        )
        .select(
            F.col("id").alias(id_col),
            "n_words",
            "n_bpe_tokens",
            F.round(F.col("n_bpe_tokens") / F.col("n_words"), 6).alias(
                "fertility"
            ),
        )
    )


def bpe_apply_oracle_sql(n_merges: int = 8) -> str:
    """DuckDB twin of train-then-apply: reuses the training CTEs for
    the merge table, then replays the same rank-ordered replace chain
    over the exploded words. The chain is built with DuckDB's scalar
    subqueries against each round's 1-row winner CTE."""
    train = bpe_oracle_sql(n_merges)
    # reuse the training CTE block (everything up to the final SELECT)
    cte_block = train[: train.rindex("\n        SELECT CAST(merge_rank")]
    expr = ("' ' || array_to_string(list_concat(string_split(w, ''), "
            "['</w>']), ' ') || ' '")
    for i in range(1, n_merges + 1):
        pat = f"' ' || (SELECT a FROM w{i}) || ' ' || (SELECT b FROM w{i}) || ' '"
        rep = f"' ' || (SELECT a FROM w{i}) || (SELECT b FROM w{i}) || ' '"
        for _ in range(3):
            expr = f"replace({expr}, {pat}, {rep})"
    return f"""{cte_block},
        wrds AS (
          SELECT doc_id, unnest(list_filter(
                   string_split_regex(trim(lower(text)), '\\s+'),
                   x -> x <> '')) AS w
          FROM documents
        ),
        seg AS (
          SELECT doc_id, len(string_split(trim({expr}), ' ')) AS ns
          FROM wrds
        )
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n_words,
               CAST(sum(ns) AS BIGINT) AS n_bpe_tokens,
               round(CAST(sum(ns) AS DOUBLE) / count(*), 6) AS fertility
        FROM seg GROUP BY doc_id ORDER BY doc_id"""


def wordpiece_encode_words(
    words: DataFrame,
    vocab: list[tuple[str, bool]],
    word_col: str = "word",
) -> DataFrame:
    """WordPiece inference (greedy longest-match-first, Wu et al. 2016 /
    BERT tokenizer) over a DISTINCT-WORD table.

    ``vocab`` is a list of (piece_body, is_continuation); continuation
    pieces display with the '##' prefix. Each word is consumed left to
    right: at every position the LONGEST vocab piece of the right kind
    (start vs continuation) matching the remaining text wins; if none
    matches, the word becomes a single '[UNK]'.

    Scale design: the tokenizer runs on the distinct-word table —
    vocabulary-sized, not corpus-sized (the same compaction the BPE
    trainer uses); callers join the per-word pieces back to corpus
    counts. The matcher itself is an Arrow-batched pandas iterator over
    that bounded table with the vocab broadcast as a plain dict-by-
    length — no per-row Python round trips through the driver.
    """
    from collections.abc import Iterator

    import pandas as pd

    by_len: dict[int, dict[str, set[bool]]] = {}
    for body, cont in vocab:
        by_len.setdefault(len(body), {}).setdefault(body, set()).add(cont)
    lens = sorted(by_len, reverse=True)

    def tokenize(word: str) -> tuple[str, int]:
        pos, out = 0, []
        while pos < len(word):
            hit = None
            for ln in lens:
                if pos + ln > len(word):
                    continue
                cand = word[pos : pos + ln]
                kinds = by_len[ln].get(cand)
                if kinds is not None and (pos > 0) in kinds:
                    hit = cand
                    break
            if hit is None:
                return "[UNK]", 1
            out.append(("##" + hit) if pos > 0 else hit)
            pos += len(hit)
        return "|".join(out), len(out)

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            enc = [tokenize(w) for w in pdf[word_col]]
            yield pd.DataFrame(
                {
                    "word": pdf[word_col],
                    "pieces": [e[0] for e in enc],
                    "n_pieces": [e[1] for e in enc],
                }
            )

    return words.select(F.col(word_col)).mapInPandas(
        work, schema="word string, pieces string, n_pieces int"
    )


def unigram_viterbi_segment(
    words: DataFrame,
    vocab: list[tuple[str, int]],
    word_col: str = "word",
) -> DataFrame:
    """Unigram-LM tokenizer inference (Kudo 2018 / SentencePiece): the
    Viterbi segmentation of each word into vocab pieces minimizing the
    total piece cost (an integer-scaled negative log-probability) —
    the third tokenizer family beside BPE merges and WordPiece greedy
    longest-match. Unlike WordPiece, a locally longer piece LOSES when
    two shorter pieces are jointly cheaper: the DP explores every
    segmentation, not one greedy path.

    ``vocab`` is a list of (piece, cost). Ties are broken
    deterministically by (total cost, piece count, piece string) —
    integer costs make ties reachable, and lexicographic tuple order
    is engine-identical for the ASCII pieces used here, so the DuckDB
    oracle's struct-min replays the exact same choice. A word with no
    full-cover segmentation becomes '[UNK]' (NULL cost).

    Scale design: same as :func:`wordpiece_encode_words` — the DP runs
    on the DISTINCT-word table (vocabulary-sized, never corpus-sized)
    via one Arrow-batched iterator; per-word cost is O(len × pieces
    matching at each position), with the vocab broadcast as a plain
    dict keyed by piece length.
    """
    from collections.abc import Iterator

    import pandas as pd

    by_len: dict[int, dict[str, int]] = {}
    for piece, cost in vocab:
        by_len.setdefault(len(piece), {})[piece] = cost
    lens = sorted(by_len)

    def segment(word: str) -> tuple[str, int, int | None]:
        n = len(word)
        # best[j] = (cost, n_pieces, 'p1|p2|...') covering word[:j]
        best: list[tuple[int, int, str] | None] = [None] * (n + 1)
        best[0] = (0, 0, "")
        for j in range(1, n + 1):
            cands = []
            for ln in lens:
                if ln > j:
                    break
                prev = best[j - ln]
                if prev is None:
                    continue
                cost = by_len[ln].get(word[j - ln : j])
                if cost is None:
                    continue
                acc = word[j - ln : j] if not prev[2] else (
                    prev[2] + "|" + word[j - ln : j]
                )
                cands.append((prev[0] + cost, prev[1] + 1, acc))
            if cands:
                best[j] = min(cands)
        if best[n] is None:
            return "[UNK]", 1, None
        c, np_, acc = best[n]
        return acc, np_, c

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            seg = [segment(w) for w in pdf[word_col]]
            yield pd.DataFrame(
                {
                    "word": pdf[word_col],
                    "pieces": [s[0] for s in seg],
                    "n_pieces": [s[1] for s in seg],
                    "cost": pd.array(
                        [s[2] for s in seg], dtype="Int64"
                    ),
                }
            )

    return words.select(F.col(word_col)).mapInPandas(
        work, schema="word string, pieces string, n_pieces int, cost long"
    )
