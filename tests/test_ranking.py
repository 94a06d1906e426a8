"""Two-phase distributed rank (functions/ranking.stable_rank) and the
ensemble duplicate-key guard — round-2 additions per VERDICT r01."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from information_extraction_spark.functions.ranking import stable_rank
from information_extraction_spark.operators.ensemble import combine_scores


def test_stable_rank_matches_global_sort(spark):
    words = [f"w{i:04d}" for i in range(997)]
    import random

    rng = random.Random(7)
    shuffled = words[:]
    rng.shuffle(shuffled)
    df = spark.createDataFrame([(w,) for w in shuffled], "word string")
    ranked = stable_rank(df, "word", "idx").collect()
    got = {r["word"]: r["idx"] for r in ranked}
    assert got == {w: i for i, w in enumerate(sorted(words))}


def test_stable_rank_start_offset_and_partitions(spark):
    df = spark.createDataFrame(
        [(w,) for w in ["b", "d", "a", "c"]], "word string"
    )
    ranked = stable_rank(df, "word", "id", start=1, num_partitions=3)
    got = {r["word"]: r["id"] for r in ranked.collect()}
    assert got == {"a": 1, "b": 2, "c": 3, "d": 4}


def test_stable_rank_plan_is_narrow_after_the_range_shuffle(spark):
    df = spark.createDataFrame([(f"w{i}",) for i in range(50)], "word string")
    plan = (
        stable_rank(df, "word", "idx")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # no window at all (the per-partition counter replaces
    # row_number) and no exchange after the checkpointed range
    # partitioning — the sort is within-partition, the rank pass a
    # narrow mapInPandas
    assert "windowspecdefinition" not in plan
    assert "Exchange" not in plan  # input is the checkpointed RDD
    assert "Sort" in plan and "MapInPandas" in plan


def test_stable_rank_edge_cases(spark):
    empty = spark.createDataFrame([], "word string")
    assert stable_rank(empty, "word", "idx").count() == 0
    one = spark.createDataFrame([("z",)], "word string")
    got = stable_rank(one, "word", "idx", num_partitions=4).collect()
    assert [(r["word"], r["idx"]) for r in got] == [("z", 0)]


def test_combine_scores_rejects_duplicate_keys(spark):
    good = spark.createDataFrame(
        [("a", 1.0), ("b", 2.0)], "k string, score double"
    )
    dup = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), ("b", 2.0)], "k string, score double"
    )
    out = combine_scores([good, dup], [1.0, 1.0], ["k"])
    with pytest.raises(Exception, match="duplicate key"):
        out.collect()
    # same tables pass when the guard is waived and dups pre-collapsed
    ok = combine_scores(
        [good, dup.groupBy("k").agg(F.max("score").alias("score"))],
        [1.0, 1.0],
        ["k"],
    )
    assert ok.count() == 2
