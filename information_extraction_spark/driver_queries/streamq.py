"""Driver-visible Structured Streaming query (SURVEY §2.8).

The streaming path was previously pytest-only (batch-parity tests in
tests/test_streaming.py); this catalog entry runs a REAL streaming
query — file source → watermark → tumbling event-time window → memory
sink, drained synchronously with processAllAvailable() — and returns
the sink table, value-checked against a DuckDB date_trunc oracle.
Spark's epoch-aligned `window(ts, '1 hour')` buckets are exactly
`date_trunc('hour', ts)`, so the oracle is independent SQL, not a
re-run of the stream.

Scale note: `complete` output mode (needed by the memory sink the
harness drains) keeps every window in the state store — the
unbounded-stream shape is `append` with this same watermark, which
emits each window once the watermark passes it and EVICTS its state
(that shape is exercised by streaming/ingest.py and its tests); the
aggregation itself is identical.
"""

from __future__ import annotations

import itertools
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

QUERIES = {}
ORACLES = {}


def _q(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


_COUNTER = itertools.count()

_ST_ORACLE = """
SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS window_start,
       event_type,
       CAST(count(*) AS BIGINT) AS n,
       round(sum(value), 2) AS sum_value
FROM events
WHERE ts IS NOT NULL
GROUP BY 1, 2
"""


def _stage_events_dir(spark: SparkSession, sf_dir: str) -> str:
    """File source needs a directory; stage the events file into one.

    Restages whenever the origin differs (size+mtime): a stale or
    truncated copy must never survive a testdata regeneration or a
    crashed earlier copy. The copy itself goes through a temp name +
    atomic rename so a concurrent reader never sees a partial file.
    """
    src = os.path.join(
        tempfile.gettempdir(),
        f"ie_stream_events_{os.path.basename(sf_dir.rstrip('/'))}",
    )
    os.makedirs(src, exist_ok=True)
    origin = os.path.join(sf_dir, "events.parquet")
    dst = os.path.join(src, "events.parquet")
    ost = os.stat(origin)
    need = True
    if os.path.exists(dst):
        dstat = os.stat(dst)
        need = (dstat.st_size, dstat.st_mtime) != (ost.st_size, ost.st_mtime)
    if need:
        # Hidden temp name: Spark's file stream source ignores files
        # starting with '.' , so a concurrent stream can never list a
        # half-copied (or orphaned, post-crash) temp as input.
        tmp = os.path.join(src, ".events.parquet.tmp")
        shutil.copy2(origin, tmp)  # copy2 preserves mtime for the probe
        os.replace(tmp, dst)
    return src


def _windowed_agg_stream(spark: SparkSession, src: str) -> DataFrame:
    schema = spark.read.parquet(os.path.join(src, "events.parquet")).schema
    return (
        spark.readStream.schema(schema)
        .parquet(src)
        .filter(F.col("ts").isNotNull())
        # driver parquet carries TIMESTAMP_NTZ; event-time semantics
        # (watermark) require TIMESTAMP — session tz is pinned UTC so
        # the cast is value-preserving
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


@_q("st_windowed_counts", _ST_ORACLE)
def st_windowed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    src = _stage_events_dir(spark, sf_dir)
    stream = _windowed_agg_stream(spark, src)
    name = f"st_windowed_counts_{next(_COUNTER)}"
    q = (
        stream.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # Materialize the sink and DROP the memory table before returning:
    # each invocation registers a fresh counter-suffixed sink, and a
    # lazy reference would leak a full complete-mode aggregate copy in
    # driver memory per run (bench trials, repeated oracle checks).
    out = spark.table(name).select(
        F.unix_timestamp(F.col("window.start")).alias("window_start"),
        "event_type",
        "n",
        "sum_value",
    )
    rows = out.collect()
    spark.catalog.dropTempView(name)
    return spark.createDataFrame(rows, out.schema)


# Append mode emits a window only once the watermark STRICTLY passes
# its end (empirically: window_end < max_ts - delay; a window whose
# end equals the watermark stays in state) — the oracle applies the
# same closed-window predicate to the batch SQL.
_ST_APPEND_ORACLE = """
WITH mx AS (SELECT max(ts) AS m FROM events WHERE ts IS NOT NULL)
SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS window_start,
       event_type,
       CAST(count(*) AS BIGINT) AS n,
       round(sum(value), 2) AS sum_value
FROM events, mx
WHERE ts IS NOT NULL
  AND date_trunc('hour', ts) + INTERVAL 1 HOUR < mx.m - INTERVAL 2 HOUR
GROUP BY 1, 2
"""


@_q("st_windowed_counts_append", _ST_APPEND_ORACLE)
def st_windowed_counts_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The unbounded-stream shape of st_windowed_counts: ``append``
    output to a parquet FILE SINK with checkpointing. Each window is
    emitted exactly once — after the watermark passes it — and its
    state store entry is EVICTED, so state stays bounded at (windows
    within the watermark horizon × event types) forever; `complete`
    mode (the memory-sink variant above) instead retains every window.
    The final ~2 hours of windows are still open at drain time and are
    deliberately absent from both the sink and the oracle."""
    src = _stage_events_dir(spark, sf_dir)
    stream = _windowed_agg_stream(spark, src)
    run_dir = tempfile.mkdtemp(prefix="ie_stream_append_")
    out_dir = os.path.join(run_dir, "out")
    q = (
        stream.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", os.path.join(run_dir, "ckpt"))
        .start()
    )
    try:
        # processAllAvailable covers the trailing no-data microbatch
        # that fires when the watermark advance closes windows.
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.read.parquet(out_dir).select(
        F.unix_timestamp(F.col("window.start")).alias("window_start"),
        "event_type",
        "n",
        "sum_value",
    )
