"""Property-based tests (hypothesis) for the pure-Python kernels.

Spark-free (no session): each example is microseconds, so hypothesis
can explore aggressively.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from hw_kafka_streams_spark.operators.udfs import _AhoCorasick, _length_safe_lower

# words without '*' (masking introduces stars; a star-free dictionary
# can't gain new occurrences from masking)
word = st.text(
    alphabet=st.characters(blacklist_characters="*", blacklist_categories=("Cs",)),
    min_size=1,
    max_size=8,
).filter(lambda w: w.lower() != w.upper() or not w.isspace())
text = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=200
)


@settings(max_examples=300, deadline=None)
@given(text, st.lists(word, max_size=5))
def test_mask_preserves_length(t, words):
    ac = _AhoCorasick(words)
    assert len(ac.mask(t)) == len(t)


@settings(max_examples=300, deadline=None)
@given(text, st.lists(word, min_size=1, max_size=5))
def test_no_banned_word_survives(t, words):
    ac = _AhoCorasick(words)
    masked = ac.mask(t)
    low = masked.lower()
    for w in words:
        lw = w.lower()
        # every original occurrence was masked; '*' can't recreate a
        # star-free word, so none may remain
        assert lw not in low or "*" in lw or lw != lw.replace("*", ""), (
            t,
            words,
            masked,
        )
        if "*" not in lw:
            assert lw not in low


@settings(max_examples=300, deadline=None)
@given(text, st.lists(word, max_size=5))
def test_mask_is_idempotent(t, words):
    ac = _AhoCorasick(words)
    once = ac.mask(t)
    assert ac.mask(once) == once


@settings(max_examples=200, deadline=None)
@given(text, st.lists(word, min_size=1, max_size=4))
def test_mask_agrees_with_regex_reference(t, words):
    """Cross-check vs an independent regex implementation that marks
    every (case-insensitive, overlapping) occurrence position."""
    ac = _AhoCorasick(words)
    n = len(t)
    masked_ref = [False] * n
    low = _length_safe_lower(t)
    for w in words:
        lw = w.lower()
        start = 0
        while True:
            i = low.find(lw, start)
            if i < 0:
                break
            for j in range(i, i + len(lw)):
                masked_ref[j] = True
            start = i + 1  # overlapping occurrences too
    expect = "".join("*" if m else c for c, m in zip(t, masked_ref))
    assert ac.mask(t) == expect, (t, words)
