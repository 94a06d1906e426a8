"""AQE skew-join splitting (north rule: "AQE skew-join splitting" is
one of the named skew tools). session.py enables it; this test proves
it actually fires: a join where one key owns ~90% of the fact side
must show skew-split sort-merge join partitions in the final adaptive
plan.
"""

from __future__ import annotations

from pyspark.sql import functions as F


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
