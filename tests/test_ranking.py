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


def test_segmented_running_sum_matches_window_under_hot_key(spark):
    """One dominant key spread across MANY range partitions must
    produce the same running sums a per-key window would — the
    offsets seed each partition's scan with the prefix from every
    earlier partition."""
    from pyspark.sql import Window

    from information_extraction_spark.functions.ranking import (
        segmented_running_sum,
    )

    rows = [("hot", i, 1 if i % 3 else -1, i) for i in range(200)]
    rows += [("cold", i, 1, 1000 + i) for i in range(5)]
    df = spark.createDataFrame(
        rows, "k string, t long, delta long, eid long"
    )
    got = {
        (r["k"], r["t"], r["eid"]): r["run"]
        for r in segmented_running_sum(
            df, "k", ["t", "delta", "eid"], "delta", num_partitions=16
        ).collect()
    }
    w = (
        Window.partitionBy("k")
        .orderBy("t", "delta", "eid")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    exp = {
        (r["k"], r["t"], r["eid"]): r["run"]
        for r in df.withColumn("run", F.sum("delta").over(w)).collect()
    }
    assert got == exp and len(got) == 205


def test_interval_concurrency_half_open_tie_rule(spark, tmp_path):
    """An interval ending exactly when the next starts must NOT
    overlap it (-1 sorts before +1 at equal t). Hand-built events:
    durations are 60 + event_id % 540, so event_id 0 spans [t0,
    t0+60) and event_id 540 starting at t0+60 back-to-back keeps the
    peak at 2 (with a third genuinely-overlapping event), not 3."""
    import os

    import pandas as pd

    from information_extraction_spark.driver_queries.relational import (
        w27_interval_concurrency,
    )

    base = pd.Timestamp("2026-01-01 00:00:00")
    rows = [
        # ev 0: [0, 60); ev 540: [60, 660) — touching, never overlap
        (0, base, 1, "x", 0.0, "{}"),
        (540, base + pd.Timedelta(seconds=60), 1, "x", 0.0, "{}"),
        # ev 3: [30, 633) overlaps each of the above once
        (3, base + pd.Timedelta(seconds=30), 1, "x", 0.0, "{}"),
    ]
    pdf = pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    )
    d = os.path.join(tmp_path, "iv_sf")
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(
        os.path.join(d, "events.parquet")
    )
    got = {
        r["event_type"]: (r["max_concurrent"], r["first_peak_rel_s"])
        for r in w27_interval_concurrency(spark, d).collect()
    }
    # peak 2 first attained when ev 3 opens at rel t=30.
    assert got == {"x": (2, 30)}
