"""AQE skew-join splitting (north rule: "AQE skew-join splitting" is
one of the named skew tools). session.py enables it; this test proves
it actually fires: a join where one key owns ~90% of the fact side
must show skew-split sort-merge join partitions in the final adaptive
plan.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_j5_alias_expansion_skew_immune_and_salted_fallback(spark):
    """J5 (alias-expansion eval join) under a deliberately hot head
    entity — SURVEY §2.3's "salted broadcast join per north rule":

    1. the committed plan joins the alias dim as BroadcastHashJoin,
       so the skewed entity column never shuffles (skew-immune);
    2. the salted_join fallback (for an alias dim too large to
       broadcast) produces the IDENTICAL match set on the same shape,
       with the hot key spread over multiple salt buckets.
    """
    from information_extraction_spark.functions.skew import (
        salted_join,
        with_salt,
    )
    from information_extraction_spark.operators.evaluation import (
        alias_expanded_matches,
    )

    n = 20_000
    # 95% of predictions name one head entity ("alpha"), under an
    # alias that only matches gold through the J5 expansion.
    pred = spark.range(n).select(
        (F.col("id") % 500).cast("string").alias("key"),
        F.when(F.col("id") % 20 < 19, F.lit("alpha"))
        .otherwise(F.concat(F.lit("e"), (F.col("id") % 97).cast("string")))
        .alias("s"),
        F.lit("p0").alias("p"),
        F.concat(F.lit("o"), (F.col("id") % 13).cast("string")).alias("o"),
    )
    gold = spark.range(500).select(
        F.col("id").cast("string").alias("key"),
        F.lit("alpha_canonical").alias("s"),
        F.lit("p0").alias("p"),
        F.concat(F.lit("o"), (F.col("id") % 13).cast("string")).alias("o"),
    )
    s_map = spark.createDataFrame(
        [("alpha", "alpha_canonical")], "s string, s_alt string"
    )
    o_map = spark.createDataFrame([], "o string, o_alt string")

    matched = alias_expanded_matches(pred, gold, s_map, o_map)
    rows = matched.collect()
    # every hot-entity row whose (key, o) pair exists in gold matches
    # through the alias; key = id%500 and o = id%13 line up for rows
    # where gold(key).o == pred(id).o, i.e. id%500 % 13 == id%13.
    expect = sum(
        1
        for i in range(n)
        if i % 20 < 19 and (i % 500) % 13 == i % 13
    )
    assert len(rows) == expect > 0
    plan = matched._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan  # the entity key never shuffles

    # Fallback shape: same expansion via salted_join (dim replicated
    # per salt, fact salted) must yield the identical expanded rows.
    s_exp_b = pred.join(F.broadcast(s_map), "s", "left").select(
        "key", F.coalesce("s_alt", "s").alias("s_a"), "s", "p", "o"
    )
    s_exp_salted = salted_join(pred, s_map, "s", buckets=8, how="left").select(
        "key", F.coalesce("s_alt", "s").alias("s_a"), "s", "p", "o"
    )
    key_cols = ["key", "s_a", "s", "p", "o"]
    a = sorted(map(tuple, s_exp_b.select(key_cols).collect()))
    b = sorted(map(tuple, s_exp_salted.select(key_cols).collect()))
    assert a == b
    # the hot key genuinely spreads across salt buckets
    n_salts = (
        with_salt(pred.filter(F.col("s") == "alpha"), 8)
        .select("_salt")
        .distinct()
        .count()
    )
    assert n_salts > 1


def test_aqe_splits_skewed_join_partition(spark):
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.0",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64KB",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        # ~95% of fact rows share one hot key; the pad is
        # INCOMPRESSIBLE (md5 of the row id — a constant pad compresses
        # to nothing in the shuffle and never crosses the byte
        # threshold) and must SURVIVE the join projection (selecting
        # only the key would let column pruning shrink the shuffle).
        fact = spark.range(0, 100_000).select(
            F.when(F.col("id") % 20 < 19, F.lit("hot"))
            .otherwise((F.col("id") % 997).cast("string"))
            .alias("k"),
            F.concat(
                F.md5(F.col("id").cast("string")),
                F.md5((F.col("id") + 1).cast("string")),
            ).alias("pad"),
        )
        dim = spark.range(0, 1000).select(
            F.col("id").cast("string").alias("k"),
            F.lit(1).alias("v"),
        ).union(
            spark.createDataFrame([("hot", 1)], "k string, v int")
        )
        # Execute ONE DataFrame instance's queryExecution (count()
        # builds a separate plan) so the AQE final plan materializes
        # on the same object we inspect.
        probe = fact.join(dim, "k")
        assert len(probe.toPandas()) > 0
        plan = probe._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        # AQE marks split skewed SMJ partitions in the plan text.
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_pushdown_barrier_keeps_expensive_filter_above_join(spark):
    """functions/barrier.pushdown_barrier must pin an expensive
    cross-side predicate as a post-join Filter; without it Catalyst
    folds the predicate into the join condition (evaluated on every
    candidate pair)."""
    from information_extraction_spark.functions.barrier import (
        pushdown_barrier,
    )

    a = spark.range(200).select(
        (F.col("id") % 50).alias("k"),
        F.array(F.col("id"), F.col("id") + 1).alias("xs"),
    ).alias("a")
    b = spark.range(200).select(
        (F.col("id") % 50).alias("k"),
        F.array(F.col("id"), F.col("id") + 2).alias("ys"),
    ).alias("b")
    joined = a.join(b, "k")
    expensive = F.size(F.array_intersect(F.col("a.xs"), F.col("b.ys"))) > 0

    def join_line(df):
        plan = df._jdf.queryExecution().executedPlan().toString()
        return next(
            ln for ln in plan.splitlines() if "Join" in ln
        )

    bare = joined.filter(expensive)
    bare.collect()
    barriered = joined.filter(pushdown_barrier(expensive))
    barriered.collect()
    # without the barrier the intersect lands in the join condition…
    assert "array_intersect" in join_line(bare)
    # …with it, the join stays clean and the filter runs post-join
    assert "array_intersect" not in join_line(barriered)
    # and the barrier changes no rows
    key = ["k"]
    assert sorted(map(tuple, bare.select(key).collect())) == sorted(
        map(tuple, barriered.select(key).collect())
    )
