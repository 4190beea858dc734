"""The engine's Python-UDF surface — the escape hatch, used right.

Rules (SURVEY §2.2 UDF row): built-in column expressions first; when
custom logic is unavoidable it runs as an Arrow-batched pandas UDF
(vectorized, ~10-100× faster than row-at-a-time Python), never in the
hot path of a query a built-in can express.

Two canonical shapes:
- SCALAR pandas UDF: the censor for unbounded dictionaries — the
  combined regex is precompiled once per executor (closure state), then
  applied per Arrow batch via pandas .str.replace. This is the scale
  path when the word list is too large to fold into regexp_replace
  calls at plan-build time (reference semantics:
  MessageFilterProcessor.java:31-44).
- GROUPED_AGG pandas UDF: a custom aggregate (weighted mean) that
  Spark's built-ins don't provide directly; partial aggregation does
  NOT apply to grouped-agg UDFs (full shuffle of group rows), which is
  the documented cost of leaving the built-in agg surface.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def make_censor_udf(words: list[str]):
    """Scalar pandas UDF censoring ``words`` (case-insensitive, literal,
    length-preserving mask) — one compiled regex per word length, built
    once per executor process, applied vectorized per Arrow batch.

    Semantics identical to operators.censor.censor_column (and the
    reference's MessageFilterProcessor): use this variant only when the
    dictionary is too large for plan-time regexp_replace folding.
    """
    by_len: dict[int, list[str]] = {}
    for w in words:
        if w:
            by_len.setdefault(len(w), []).append(w)
    # Precompile outside the UDF body: shipped in the closure, compiled
    # once per executor, reused across batches.
    compiled = [
        (re.compile("(?iu)(?:" + "|".join(re.escape(w) for w in ws) + ")"), "*" * length)
        for length, ws in sorted(by_len.items(), reverse=True)
    ]

    @pandas_udf("string")
    def censor(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in batches:
            for rx, mask in compiled:
                s = s.str.replace(rx, mask, regex=True)
            yield s

    return censor


@pandas_udf("double")
def weighted_mean(v: pd.Series, w: pd.Series) -> float:  # GROUPED_AGG
    """sum(v*w)/sum(w) with pandas NaN semantics (null rows excluded)."""
    m = v.notna() & w.notna()
    den = w[m].sum()
    return float((v[m] * w[m]).sum() / den) if den else float("nan")


def make_sentence_split_udtf():
    """Python UDTF (Spark 4): one output row per sentence of the input.

    Completes the UDF/UDAF/UDTF surface. UDTFs execute row-at-a-time
    Python — fine for control-plane/table-generating jobs, NOT a hot
    100-TB path (there, `explode(split(...))` expresses the same thing
    JVM-side; see tests for the parity assertion).
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="sentence string, n_words int")
    class SentenceSplit:
        def eval(self, text: str):
            if text is None:
                return
            for raw in re.split(r"(?<=[.!?])\s+", text.strip()):
                s = raw.strip()
                if s:
                    yield s, len(s.split())

    return SentenceSplit


def weighted_mean_builtin(v: Column, w: Column) -> Column:
    """The same aggregate as built-in expressions — partial-agg friendly;
    prefer this in production plans, keep the UDF for parity testing."""
    return F.sum(v * w) / F.sum(w)
