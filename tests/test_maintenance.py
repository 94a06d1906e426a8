"""Compaction operator tests: layout claims (many-to-few file
rewrite, size-targeted file count, within-file sort order) that the
content-only driver oracle for w11_compaction cannot express."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from information_extraction_spark.operators.maintenance import (
    _dir_bytes_files,
    compact_parquet_dir,
)


def _stage_fragmented(spark, path, n_rows=2000, n_files=32):
    df = spark.range(n_rows).select(
        (F.col("id") % 7).cast("string").alias("predicate"),
        F.concat(F.lit("s"), (F.col("id") % 97).cast("string")).alias(
            "subject"
        ),
        F.col("id").alias("payload"),
    )
    df.repartition(n_files).write.parquet(path)
    return df


def test_compaction_preserves_multiset_and_reduces_files(
    spark, tmp_path
):
    src = os.path.join(str(tmp_path), "src")
    dst = os.path.join(str(tmp_path), "dst")
    df = _stage_fragmented(spark, src)
    src_bytes, src_files = _dir_bytes_files(src)
    assert src_files == 32
    stats = compact_parquet_dir(
        spark, src, dst, target_bytes=max(1, src_bytes // 3)
    )
    assert stats["src_files"] == 32
    assert stats["dst_files"] == stats["n_target"] <= 4
    # Content is the exact multiset (duplicates preserved).
    before = sorted(
        map(tuple, df.collect())
    )
    after = sorted(map(tuple, spark.read.parquet(dst).collect()))
    assert before == after


def test_compaction_sorts_within_each_file(spark, tmp_path):
    src = os.path.join(str(tmp_path), "src")
    dst = os.path.join(str(tmp_path), "dst")
    _stage_fragmented(spark, src)
    src_bytes, _ = _dir_bytes_files(src)
    compact_parquet_dir(
        spark,
        src,
        dst,
        target_bytes=max(1, src_bytes // 3),
        sort_cols=("predicate", "subject"),
    )
    files = [
        os.path.join(r, f)
        for r, _d, fs in os.walk(dst)
        for f in fs
        if f.endswith(".parquet")
    ]
    assert len(files) > 1
    for fp in files:
        rows = [
            (r["predicate"], r["subject"])
            for r in spark.read.parquet(fp).collect()
        ]
        assert rows == sorted(rows)


def test_compaction_single_file_when_target_large(spark, tmp_path):
    src = os.path.join(str(tmp_path), "src")
    dst = os.path.join(str(tmp_path), "dst")
    _stage_fragmented(spark, src, n_rows=50, n_files=8)
    stats = compact_parquet_dir(spark, src, dst)  # 128 MiB default
    assert stats["dst_files"] == 1
