"""Contract tests for the bench-corpus replication: replicas are
textually unique (so per-text memoization cannot collapse a
replicated benchmark workload) while replicate=1 — the correctness
and golden path — stays byte-identical to the source derivation."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from information_extraction_spark.sources.from_documents import (
    transcripts_from_documents,
)

SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present"
)


def test_replicas_textually_unique_and_rep0_identical(spark):
    t3 = transcripts_from_documents(spark, SF_DIR, replicate=3)
    t1 = transcripts_from_documents(spark, SF_DIR, replicate=1)
    n1 = t1.count()
    d1 = t1.select("text").distinct().count()
    assert t3.count() == 3 * n1
    # every replica contributes its own distinct text variants
    assert t3.select("text").distinct().count() == 3 * d1
    rep0 = {
        (r["conv_id"], r["turn_idx"], r["text"])
        for r in t3.filter(F.col("conv_id").endswith(".0")).collect()
    }
    base = {
        (r["conv_id"], r["turn_idx"], r["text"]) for r in t1.collect()
    }
    assert rep0 == base


def test_marker_cannot_create_entity_matches(spark):
    """KB classification is case-insensitive substring contains(), so
    the appended marker ' zq<K>' (K any decimal) could create a new
    entity match only through a vocab word whose lowercase form is a
    substring of 'zq<digits>' — i.e. matches z, zq[0-9]*, q[0-9]*, or
    [0-9]+ — or contains 'zq' (a bigram could then span into the
    marker). Structural check over the WHOLE marker family: covers
    any replicate count, any case, and single-char words (a corpus
    word 'z' would make bigram 'w z' match '... w zqK')."""
    import re

    words = {
        (r["w"] or "").lower()
        for r in transcripts_from_documents(spark, SF_DIR, replicate=1)
        .select(F.explode(F.split("text", " ")).alias("w"))
        .distinct()
        .collect()
    }
    dangerous = re.compile(r"^(z|zq[0-9]*|q[0-9]*|[0-9]+)$")
    bad = {w for w in words if w and (dangerous.match(w) or "zq" in w)}
    assert not bad, bad
