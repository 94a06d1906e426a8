"""Table-maintenance operators: small-file compaction (the Iceberg
rewriteDataFiles analogue). A 100 TB table ingested by streaming
micro-batches or fine-grained partitions accumulates thousands of
KB-sized files; every downstream scan then pays per-file open/footer
cost and the scheduler pays per-split overhead. Compaction rewrites a
directory into size-targeted, optionally sorted files — content
identical, layout fixed.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession


def _dir_bytes_files(path: str) -> tuple[int, int]:
    """Total bytes + data-file count under a local parquet dir.
    Local-fs walk because the sandbox writes file:// tables; on a real
    warehouse this is one FileSystem.listStatus / Iceberg manifest
    scan — metadata-only either way, never a data read."""
    total = 0
    n = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                total += os.path.getsize(os.path.join(root, f))
                n += 1
    return total, n


def compact_parquet_dir(
    spark: SparkSession,
    src_dir: str,
    dst_dir: str,
    target_bytes: int = 128 << 20,
    sort_cols: tuple[str, ...] = (),
) -> dict:
    """Rewrite ``src_dir`` into ``dst_dir`` as ceil(total/target_bytes)
    files (the 128 MiB default is the classic HDFS-block/scan-split
    sweet spot). ``sort_cols`` additionally sorts WITHIN each output
    file (repartition-then-sortWithinPartitions — one exchange, no
    global sort), so min/max row-group stats become selective for
    those columns — compaction and clustering in one pass.

    Returns layout stats {src_files, src_bytes, dst_files, n_target}.
    The write is all-or-nothing per Spark's output committer; callers
    swap the table pointer (snapshot commit) after success — the
    source is never rewritten in place.
    """
    src_bytes, src_files = _dir_bytes_files(src_dir)
    n_out = max(1, math.ceil(src_bytes / target_bytes))
    df: DataFrame = spark.read.parquet(src_dir).repartition(n_out)
    if sort_cols:
        df = df.sortWithinPartitions(*sort_cols)
    df.write.mode("overwrite").parquet(dst_dir)
    _dst_bytes, dst_files = _dir_bytes_files(dst_dir)
    return {
        "src_files": src_files,
        "src_bytes": src_bytes,
        "dst_files": dst_files,
        "n_target": n_out,
    }
