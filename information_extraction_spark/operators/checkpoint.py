"""Per-stage checkpointing with lineage + metrics and mid-pipeline
resume (north rule: "every stage checkpoints per-partition with
lineage + triple-count metrics so runs resume mid-pipeline").

The reference persisted pickled DataSets / line-aligned txt files
between its OS-process stages and resumed by picking the newest
checkpoint dir by mtime (produce_submit_json_file.py:6-24;
classification/dataset.py:79-103). Here every stage is a Parquet
write plus manifest rows recording (run_id, stage, partition_id,
row_count, params_hash, completed_ts); a stage whose completion row
exists with a matching params_hash is skipped and read back — changing
any upstream parameter invalidates the checkpoint via the hash, not
mtime heuristics.

Scale: the manifest is a handful of rows per stage; the data
checkpoint is the same Parquet the next stage would shuffle-read
anyway, so resume costs nothing extra beyond the write.
"""

from __future__ import annotations

import hashlib
import json
import os
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

COMPLETION_PARTITION = -1  # sentinel row marking a finished stage


def params_hash(params: dict[str, Any]) -> str:
    return hashlib.md5(
        json.dumps(params, sort_keys=True, default=str).encode()
    ).hexdigest()[:16]


class CheckpointManager:
    def __init__(
        self,
        spark: SparkSession,
        base_dir: str,
        run_id: str,
        params: dict[str, Any] | None = None,
    ):
        self.spark = spark
        self.base_dir = base_dir
        self.run_id = run_id
        self.params_hash = params_hash(params or {})
        self._manifest_dir = os.path.join(base_dir, "_manifest")

    def _stage_path(self, stage: str) -> str:
        return os.path.join(self.base_dir, self.run_id, stage)

    def manifest(self) -> DataFrame | None:
        try:
            return self.spark.read.parquet(self._manifest_dir)
        except Exception:
            return None

    def is_complete(self, stage: str) -> bool:
        m = self.manifest()
        if m is None:
            return False
        return (
            m.filter(
                (F.col("run_id") == self.run_id)
                & (F.col("stage") == stage)
                & (F.col("partition_id") == COMPLETION_PARTITION)
                & (F.col("params_hash") == self.params_hash)
            ).count()
            > 0
        )

    def _record(self, stage: str, per_partition: list[tuple[int, int]]) -> None:
        rows = [
            (self.run_id, stage, int(pid), int(n), self.params_hash)
            for pid, n in per_partition
        ]
        total = sum(n for _, n in per_partition)
        rows.append(
            (self.run_id, stage, COMPLETION_PARTITION, total, self.params_hash)
        )
        df = self.spark.createDataFrame(
            rows,
            "run_id string, stage string, partition_id int, "
            "row_count long, params_hash string",
        ).withColumn("completed_ts", F.current_timestamp())
        df.coalesce(1).write.mode("append").parquet(self._manifest_dir)

    def stage(self, df: DataFrame, stage: str) -> DataFrame:
        """Materialize ``df`` at this stage (or read the prior
        materialization when the manifest marks it complete for the
        same params_hash). Returns the checkpointed DataFrame —
        downstream lineage restarts from the Parquet scan."""
        path = self._stage_path(stage)
        if self.is_complete(stage):
            return self.spark.read.parquet(path)
        df.write.mode("overwrite").parquet(path)
        written = self.spark.read.parquet(path)
        per_partition = [
            (r["pid"], r["n"])
            for r in written.groupBy(
                F.spark_partition_id().alias("pid")
            )
            .agg(F.count("*").alias("n"))
            .collect()
        ]
        self._record(stage, per_partition)
        return written

    def stage_metrics(self, stage: str) -> list[tuple[int, int]]:
        """(partition_id, row_count) rows recorded for a stage."""
        m = self.manifest()
        if m is None:
            return []
        return [
            (r["partition_id"], r["row_count"])
            for r in m.filter(
                (F.col("run_id") == self.run_id) & (F.col("stage") == stage)
            ).collect()
        ]
