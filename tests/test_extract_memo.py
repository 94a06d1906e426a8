"""Regression tests for the fused-extract per-text memo (KeyError on
the bounded clear path, found in round-2 self-review)."""

from __future__ import annotations

from information_extraction_spark.kernels.extraction import KnowledgeBase


def _kb() -> KnowledgeBase:
    return KnowledgeBase([("p1", "alpha", "beta gamma")])


def test_memo_hits_return_identical_units():
    kb = _kb()
    texts = ["alpha and beta gamma here", "nothing relevant"] * 3
    first = kb.extract_batch(texts)
    second = kb.extract_batch(texts)
    assert first == second
    assert kb._extract_cache  # populated


def test_bounded_clear_never_drops_this_batchs_hits():
    """When the memo exceeds its bound, the clear must not evict
    entries the current batch already resolved from cache."""
    kb = _kb()
    cached_text = "alpha then beta gamma"
    expected = kb.extract_batch([cached_text])[0]
    for i in range(50_001):  # push past the 50k bound
        kb._extract_cache[(f"filler{i}", 10)] = []
    out = kb.extract_batch([cached_text, "new text alpha beta gamma x"])
    assert out[0] == expected
    # cache was cleared and repopulated with only the fresh compute
    assert len(kb._extract_cache) <= 2
