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
    syms = _initial_vocab(df, text_col)
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
    return spark.createDataFrame(
        merges, "merge_rank int, a string, b string, pair_count long"
    )


def bpe_oracle_sql(n_merges: int = 8) -> str:
    """The DuckDB twin: the same iterations unrolled as CTEs — each
    round's winner via the identical (count DESC, a, b) order and the
    identical literal ``replace`` merge, so the merge table value-hash
    matches the Spark training run exactly."""
    ctes = [
        """v0 AS (
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
            f"""w{i} AS (
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
            f"""v{i} AS (
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
