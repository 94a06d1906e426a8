"""Scale-safe global ranking (the vocabulary-index shape, SURVEY §2
P7/P8; reference fastNLP Vocabulary build classification/dataset.py:
56-62).

``row_number() OVER (ORDER BY col)`` on an unpartitioned window moves
every row to ONE task — fine for a 30-word test vocab, a single-node
sort for the millions-of-tokens vocabulary of a web corpus. The
two-phase shape here is the distributed equivalent:

1. range-partition by the order column (partition p holds keys ≤
   partition p+1's keys) and pin the partitioning with a
   localCheckpoint — range boundaries come from sampling, so the
   counts job and the final job MUST see the same physical layout
   (at real scale this materialization is the staging write of the
   vocab table);
2. count rows per partition — a tiny driver-side list (one int per
   partition) — and prefix-sum it into per-partition offsets;
3. rank = per-partition local row_number (a window PARTITIONED by
   partition id — no global exchange) + the broadcast offset.

Total cost: one range shuffle + one narrow pass, no single-task sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def stable_rank(
    df: DataFrame,
    order_col: str,
    out_col: str = "idx",
    start: int = 0,
    num_partitions: int | None = None,
) -> DataFrame:
    """Attach a dense global 0-based (or ``start``-based) rank by
    ``order_col`` without a global single-partition sort.

    Rows must be unique on ``order_col`` for the rank to be
    deterministic (the intended input is a distinct key set, e.g. a
    vocabulary); equal keys land in one range partition and are
    tie-broken by local row_number.
    """
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = spark.sparkContext.defaultParallelism
    parts = df.repartitionByRange(
        num_partitions, F.col(order_col)
    ).localCheckpoint()
    with_pid = parts.withColumn("_pid", F.spark_partition_id())
    counts = {
        r["_pid"]: r["cnt"]
        for r in with_pid.groupBy("_pid")
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    offsets: list = []
    acc = start
    for pid in range(num_partitions):
        offsets.extend([F.lit(pid), F.lit(acc)])
        acc += counts.get(pid, 0)
    off_map = F.create_map(*offsets)
    w = Window.partitionBy("_pid").orderBy(order_col)
    return (
        with_pid.withColumn(
            out_col,
            (
                F.row_number().over(w) - 1 + off_map[F.col("_pid")]
            ).cast("long"),
        )
        .drop("_pid")
    )
