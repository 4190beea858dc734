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


_weighted_mean_udf = None


def weighted_mean(v, w):  # GROUPED_AGG
    """sum(v*w)/sum(w) with pandas NaN semantics (null rows excluded).

    Built lazily: a module-level ``@pandas_udf`` would be evaluated at
    import time on executors too (UDF closures import this module when
    unpickled), where no SparkSession exists.
    """
    global _weighted_mean_udf
    if _weighted_mean_udf is None:

        @pandas_udf("double")
        def _wm(v: pd.Series, w: pd.Series) -> float:
            m = v.notna() & w.notna()
            den = w[m].sum()
            return float((v[m] * w[m]).sum() / den) if den else float("nan")

        _weighted_mean_udf = _wm
    return _weighted_mean_udf(v, w)


def _length_safe_lower(text: str) -> str:
    """Lowercase preserving length: rare expanding case folds
    ('İ'.lower() is 2 chars) would shift mask offsets, so such
    characters fold per-char (kept as-is when the fold expands)."""
    low = text.lower()
    if len(low) == len(text):
        return low
    return "".join(c.lower() if len(c.lower()) == 1 else c for c in text)


class _AhoCorasick:
    """Minimal Aho-Corasick automaton (lowercase matching) — linear scan
    time in text length + matches, independent of dictionary size.
    Pure-Python stdlib build (no external libs in this environment);
    construction is O(total pattern chars)."""

    def __init__(self, words: list[str]):
        # trie as list of dicts; node 0 = root
        self.next: list[dict[str, int]] = [{}]
        self.fail: list[int] = [0]
        self.out: list[list[int]] = [[]]  # word lengths ending here
        for w in words:
            lw = w.lower()
            node = 0
            for ch in lw:
                if ch not in self.next[node]:
                    self.next[node][ch] = len(self.next)
                    self.next.append({})
                    self.fail.append(0)
                    self.out.append([])
                node = self.next[node][ch]
            self.out[node].append(len(lw))
        # BFS failure links (root children keep fail=0)
        from collections import deque

        dq = deque(self.next[0].values())
        while dq:
            cur = dq.popleft()
            for ch, nxt in self.next[cur].items():
                dq.append(nxt)
                f = self.fail[cur]
                while f and ch not in self.next[f]:
                    f = self.fail[f]
                self.fail[nxt] = self.next[f].get(ch, 0)
                self.out[nxt] = self.out[nxt] + self.out[self.fail[nxt]]

    def mask(self, text: str) -> str:
        """Replace every dictionary occurrence with '*' of equal length.
        Case-insensitive via casefold of the probe character only — the
        original text (and its length) is preserved outside matches."""
        if not text:
            return text
        low = _length_safe_lower(text)
        n = len(low)
        masked = [False] * n
        node = 0
        for i, ch in enumerate(low):
            while node and ch not in self.next[node]:
                node = self.fail[node]
            node = self.next[node].get(ch, 0)
            for wlen in self.out[node]:
                for j in range(i - wlen + 1, i + 1):
                    masked[j] = True
        if not any(masked):
            return text
        return "".join("*" if m else c for c, m in zip(text, masked))


def make_aho_corasick_censor_udf(words: list[str]):
    """Censor via Aho-Corasick — THE scale path for large dictionaries.

    The regexp-fold censor is O(text × passes) and the combined
    alternation regex degrades with dictionary size; the automaton
    scans each text once regardless of |words| (Aho & Corasick '75 —
    the reference's per-record store iteration, MessageFilterProcessor
    .java:31-44, replaced by a single-pass matcher). Built once per
    executor from the closure; applied per Arrow batch.

    Semantic note vs censor_column: overlapping matches are BOTH
    masked (regex replaces left-to-right non-overlapping). For
    non-overlapping dictionaries the outputs are identical — asserted
    in tests.
    """
    ac = _AhoCorasick([w for w in words if w])

    @pandas_udf("string")
    def censor(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in batches:
            yield s.map(lambda t: ac.mask(t) if isinstance(t, str) else t)

    return censor


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


def make_nfc_normalizer_udf():
    """Arrow-batched Unicode NFC normalizer.

    Spark has no built-in Unicode normalization, so this is one of the
    few legitimately-Python text ops — vectorized through Arrow, a pure
    per-row map (zero shuffle). NFC is the canonical-composition pass
    every text pipeline runs before hashing/dedup: visually identical
    strings with decomposed combining marks ('e' + U+0301 vs 'é')
    otherwise fingerprint differently and defeat exact dedup. DuckDB's
    ``nfc_normalize`` is the oracle twin (verified equal to
    ``unicodedata.normalize('NFC', ...)``).
    """
    import unicodedata

    @pandas_udf("string")
    def _nfc(s: pd.Series) -> pd.Series:
        return s.map(
            lambda t: unicodedata.normalize("NFC", t) if t is not None else None
        )

    return _nfc
