"""Per-stage checkpointing with lineage + metrics and mid-pipeline
resume (north rule: "every stage checkpoints per-partition with
lineage + triple-count metrics so runs resume mid-pipeline").

The reference persisted pickled DataSets / line-aligned txt files
between its OS-process stages and resumed by picking the newest
checkpoint dir by mtime (produce_submit_json_file.py:6-24;
classification/dataset.py:79-103). Here every stage is a Parquet
write plus manifest rows recording (run_id, stage, snapshot_id,
partition_id, row_count, params_hash, completed_ts); a stage whose
completion row exists with a matching params_hash is skipped and read
back — changing any upstream parameter invalidates the checkpoint via
the hash, not mtime heuristics.

Snapshot semantics (the Iceberg-emulation piece, SURVEY §4 "snapshot
ids"): every materialization writes a NEW immutable snapshot
directory ``<stage>@snap<id>`` and appends manifest rows carrying a
monotonically increasing ``snapshot_id``. "Overwrite" therefore never
destroys prior state — ``read_as_of(stage, snapshot_id)`` reads any
earlier snapshot (time travel), ``snapshots(stage)`` lists the
history, and the resume path resolves the LATEST snapshot whose
params_hash matches. Snapshot-id allocation reads the (tiny) manifest
on the driver AND claims the id via an O_EXCL lock file, so two
CheckpointManagers committing to the same base_dir concurrently can
never mint the same snapshot id (Iceberg's optimistic-commit
uniqueness, emulated at the filesystem level).

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

    def _snapshot_path(self, stage: str, snapshot_id: int) -> str:
        if snapshot_id == 0:
            # Legacy (pre-snapshot) layout: data sits in the bare stage
            # directory. New snapshots start at id 1, so 0 uniquely
            # denotes a manifest row written before snapshot support.
            return os.path.join(self.base_dir, self.run_id, stage)
        # Snapshots are SIBLINGS of the legacy bare dir, not children:
        # nesting snap=N under it would be picked up as a partition
        # column by any read of the legacy path.
        return os.path.join(
            self.base_dir, self.run_id, f"{stage}@snap{snapshot_id}"
        )

    def manifest(self) -> DataFrame | None:
        try:
            # mergeSchema: a base_dir created before snapshot support
            # has manifest files without snapshot_id; merged reads keep
            # both generations loadable, and legacy rows coalesce to
            # snapshot id 0 (they predate the counter, so any new
            # snapshot sorts after them).
            m = self.spark.read.option("mergeSchema", "true").parquet(
                self._manifest_dir
            )
        except Exception:
            return None
        if "snapshot_id" not in m.columns:
            return m.withColumn("snapshot_id", F.lit(0).cast("long"))
        return m.withColumn(
            "snapshot_id",
            F.coalesce(F.col("snapshot_id"), F.lit(0)).cast("long"),
        )

    def _completions(self, stage: str, match_params: bool) -> DataFrame | None:
        m = self.manifest()
        if m is None:
            return None
        out = m.filter(
            (F.col("run_id") == self.run_id)
            & (F.col("stage") == stage)
            & (F.col("partition_id") == COMPLETION_PARTITION)
        )
        if match_params:
            out = out.filter(F.col("params_hash") == self.params_hash)
        return out

    def _latest_snapshot(self, stage: str) -> int | None:
        c = self._completions(stage, match_params=True)
        if c is None:
            return None
        row = c.agg(F.max("snapshot_id").alias("s")).collect()[0]
        return None if row["s"] is None else int(row["s"])

    def _allocate_snapshot_id(self) -> int:
        """Mint a unique snapshot id even with concurrent committers on
        the same base_dir. The manifest max alone is racy (two drivers
        can read the same max before either appends), so allocation
        additionally claims ``_snapshot_claims/snap-<id>.claim`` with
        O_CREAT|O_EXCL — an atomic create on local/POSIX filesystems —
        and bumps past ids already claimed but not yet committed. This
        mirrors Iceberg's optimistic-commit uniqueness at the
        granularity this parquet emulation needs; a real object-store
        deployment would use Iceberg's catalog commit instead."""
        claims_dir = os.path.join(self.base_dir, "_snapshot_claims")
        os.makedirs(claims_dir, exist_ok=True)
        m = self.manifest()
        cand = 1
        if m is not None:
            row = m.agg(F.max("snapshot_id").alias("s")).collect()[0]
            if row["s"] is not None:
                cand = int(row["s"]) + 1
        claimed = [
            int(f[5:-6])
            for f in os.listdir(claims_dir)
            if f.startswith("snap-") and f.endswith(".claim")
        ]
        if claimed:
            cand = max(cand, max(claimed) + 1)
        while True:
            try:
                fd = os.open(
                    os.path.join(claims_dir, f"snap-{cand}.claim"),
                    os.O_CREAT | os.O_EXCL | os.O_WRONLY,
                )
                os.write(fd, f"{self.run_id}\n".encode())
                os.close(fd)
                return cand
            except FileExistsError:
                cand += 1

    def is_complete(self, stage: str) -> bool:
        return self._latest_snapshot(stage) is not None

    def _record(
        self,
        stage: str,
        snapshot_id: int,
        per_partition: list[tuple[int, int]],
    ) -> None:
        rows = [
            (self.run_id, stage, snapshot_id, int(pid), int(n), self.params_hash)
            for pid, n in per_partition
        ]
        total = sum(n for _, n in per_partition)
        rows.append(
            (
                self.run_id,
                stage,
                snapshot_id,
                COMPLETION_PARTITION,
                total,
                self.params_hash,
            )
        )
        df = self.spark.createDataFrame(
            rows,
            "run_id string, stage string, snapshot_id long, "
            "partition_id int, row_count long, params_hash string",
        ).withColumn("completed_ts", F.current_timestamp())
        df.coalesce(1).write.mode("append").parquet(self._manifest_dir)

    def stage(self, df: DataFrame, stage: str) -> DataFrame:
        """Materialize ``df`` as a new snapshot of this stage (or read
        the latest prior snapshot when the manifest marks one complete
        for the same params_hash). Returns the checkpointed DataFrame
        — downstream lineage restarts from the Parquet scan."""
        latest = self._latest_snapshot(stage)
        if latest is not None:
            return self.spark.read.parquet(self._snapshot_path(stage, latest))
        snapshot_id = self._allocate_snapshot_id()
        path = self._snapshot_path(stage, snapshot_id)
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
        self._record(stage, snapshot_id, per_partition)
        return written

    def read_as_of(self, stage: str, snapshot_id: int) -> DataFrame:
        """Time travel: read the stage's state at an earlier snapshot
        (regardless of params_hash — reading history across parameter
        changes is the point). Raises if the manifest has no completion
        row for that snapshot."""
        c = self._completions(stage, match_params=False)
        ok = (
            c is not None
            and c.filter(F.col("snapshot_id") == snapshot_id).count() > 0
        )
        if not ok:
            raise ValueError(
                f"no completed snapshot {snapshot_id} for stage "
                f"{stage!r} in run {self.run_id!r}"
            )
        return self.spark.read.parquet(
            self._snapshot_path(stage, snapshot_id)
        )

    def snapshots(self, stage: str) -> list[tuple[int, int, str]]:
        """Completed (snapshot_id, row_count, params_hash) history for
        a stage, oldest first."""
        c = self._completions(stage, match_params=False)
        if c is None:
            return []
        return [
            (int(r["snapshot_id"]), int(r["row_count"]), r["params_hash"])
            for r in c.orderBy("snapshot_id").collect()
        ]

    def expire_snapshots(self, stage: str, keep_last: int = 1) -> list[int]:
        """Iceberg-style snapshot retention GC for one stage: drop all
        but the newest ``keep_last`` completed snapshots. Expired
        snapshot DIRECTORIES are deleted, their manifest rows are
        rewritten out (write-to-temp + directory swap — the same
        single-committing-driver window as stage()), and the O_EXCL id
        CLAIM files are kept, so an expired id is never re-minted by a
        later allocation (ids stay monotonic across GC, as Iceberg's
        catalog guarantees). Kept snapshots' files are untouched.
        Idempotent; returns the expired ids, oldest first."""
        import shutil

        if keep_last < 1:
            raise ValueError("keep_last must be >= 1")
        hist = self.snapshots(stage)
        expired = (
            [sid for sid, _, _ in hist[:-keep_last]]
            if len(hist) > keep_last
            else []
        )
        if not expired:
            return []
        for sid in expired:
            p = self._snapshot_path(stage, sid)
            if os.path.isdir(p):
                shutil.rmtree(p)
        kept = self.manifest().filter(
            ~(
                (F.col("stage") == stage)
                & F.col("snapshot_id").isin([int(s) for s in expired])
            )
        )
        tmp = self._manifest_dir + ".expiring"
        if os.path.isdir(tmp):
            shutil.rmtree(tmp)
        kept.coalesce(1).write.mode("overwrite").parquet(tmp)
        old = self._manifest_dir + ".expired"
        if os.path.isdir(old):
            shutil.rmtree(old)
        os.rename(self._manifest_dir, old)
        os.rename(tmp, self._manifest_dir)
        shutil.rmtree(old)
        return expired

    def stage_metrics(self, stage: str) -> list[tuple[int, int]]:
        """(partition_id, row_count) rows recorded for a stage's
        LATEST completed snapshot under the current params."""
        latest = self._latest_snapshot(stage)
        m = self.manifest()
        if m is None or latest is None:
            return []
        return [
            (r["partition_id"], r["row_count"])
            for r in m.filter(
                (F.col("run_id") == self.run_id)
                & (F.col("stage") == stage)
                & (F.col("snapshot_id") == latest)
            ).collect()
        ]

    def remove_orphans(self, stage: str) -> list[int]:
        """Iceberg remove_orphan_files semantics at this emulation's
        commit granularity: delete ``<stage>@snap<id>`` directories
        under this run that have NO completion row in the manifest —
        the debris a writer that crashed between data write and
        manifest append leaves behind (exactly the failed-commit files
        Iceberg's orphan GC targets). Committed snapshots, the legacy
        bare stage dir (id 0), the manifest, and the id CLAIM files
        are never touched — a claimed-but-orphaned id stays claimed,
        so the crashed writer's id is not re-minted later. Production
        note: a real deployment gates deletion on an older-than
        horizon so an IN-FLIGHT commit isn't swept; this sandbox's
        single-driver tests exercise the post-crash state, where the
        horizon is moot. Idempotent; returns removed ids, ascending.
        """
        import re
        import shutil

        run_dir = os.path.join(self.base_dir, self.run_id)
        if not os.path.isdir(run_dir):
            return []
        committed: set[int] = set()
        c = self._completions(stage, match_params=False)
        if c is not None:
            committed = {
                int(r["snapshot_id"])
                for r in c.select("snapshot_id").distinct().collect()
            }
        pat = re.compile(re.escape(stage) + r"@snap(\d+)$")
        removed = []
        for name in os.listdir(run_dir):
            m = pat.match(name)
            if not m:
                continue
            sid = int(m.group(1))
            if sid in committed:
                continue
            shutil.rmtree(os.path.join(run_dir, name))
            removed.append(sid)
        return sorted(removed)
