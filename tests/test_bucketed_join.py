"""Bucketing for co-located joins (SURVEY §4 / scale design): two
tables bucketed+sorted on the same key must join with NO shuffle
exchange on either side — the physical plan proof that pre-bucketing
the transcripts and triples tables at 100 TB removes the join
shuffle entirely.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_tables_join_without_shuffle(spark, world, transcripts_pdf, tmp_dir):
    from information_extraction_spark import schemas as S

    tdf = spark.createDataFrame(transcripts_pdf, schema=S.TRANSCRIPTS)

    (
        tdf.write.mode("overwrite")
        .bucketBy(8, "conv_id")
        .sortBy("conv_id", "turn_idx")
        .option("path", os.path.join(tmp_dir, "bucketed_a"))
        .saveAsTable("t_bucketed_a")
    )
    (
        tdf.groupBy("conv_id")
        .agg(F.count("*").alias("n_turns"))
        .write.mode("overwrite")
        .bucketBy(8, "conv_id")
        .option("path", os.path.join(tmp_dir, "bucketed_b"))
        .saveAsTable("t_bucketed_b")
    )
    saved_threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        a = spark.table("t_bucketed_a")
        b = spark.table("t_bucketed_b")
        # Disable broadcast so the join must pick a shuffle-free
        # sort-merge over the co-located buckets.
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = a.join(b, "conv_id")
        n = joined.count()
        assert n == len(transcripts_pdf.drop_duplicates(["conv_id", "turn_idx"]))
        plan = _plan(joined)
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", saved_threshold
        )
        spark.sql("DROP TABLE IF EXISTS t_bucketed_a")
        spark.sql("DROP TABLE IF EXISTS t_bucketed_b")
