"""Incremental transcript ingest via Structured Streaming.

The reference is batch-only (SURVEY.md §2.8); this is the optional
incremental path the survey sketches: stream new transcript files →
watermarked dedup on (conv_id, turn_idx) → per-microbatch extraction
through the SAME batch pipeline via foreachBatch (exactly-once when
the sink is idempotent on the (conv_id, turn_idx, s, p, o) key).

At scale the source would be Kafka/Iceberg-CDC; file source keeps the
identical query shape and lets tests drive it synchronously with
processAllAvailable().
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from information_extraction_spark import schemas as S


def read_transcript_stream(spark: SparkSession, path: str) -> DataFrame:
    return spark.readStream.schema(S.TRANSCRIPTS).parquet(path)


def deduped_turns(stream: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Late-data-tolerant exactly-once turn stream: watermark on ts +
    dropDuplicatesWithinWatermark on the explicit key (never
    positional).

    ``dropDuplicatesWithinWatermark`` (not plain ``dropDuplicates``,
    whose state is never evicted when the dedup keys omit the event
    time) keeps per-key state only for the watermark horizon — that
    bound is what keeps state finite on an unbounded stream. A
    duplicate arriving past the horizon carries an event time the
    watermark already classifies as late, so it is dropped either way.

    Contract: LIVE arrival — event time advances with arrival order,
    and rows more than ``watermark`` behind the observed max ts are
    dropped as late. Historical backfill with arbitrary arrival order
    must go through the batch pipeline (whose ordered_transcripts
    dedup is global), or widen ``watermark`` to cover the backfill's
    time span."""
    return stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["conv_id", "turn_idx"]
    )


def start_windowed_turn_counts(
    stream: DataFrame,
    query_name: str = "turn_counts",
    window: str = "5 minutes",
    watermark: str = "10 minutes",
):
    """Tumbling-window per-role turn counts to a memory sink (smoke
    shape for the streaming agg path)."""
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), "role")
        .agg(F.count("*").alias("n_turns"))
    )
    return (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .start()
    )


def start_streaming_extraction(
    spark: SparkSession,
    stream: DataFrame,
    kb: DataFrame,
    schemas: DataFrame,
    out_path: str,
    checkpoint_path: str,
    watermark: str = "10 minutes",
):
    """foreachBatch bridge into the batch extraction pipeline —
    microbatch triples appended to the graph table.

    ``watermark`` bounds the dedup state (deduped_turns contract): the
    10-minute default fits live arrival; a historical backfill whose
    files arrive out of event-time order must widen it to the
    backfill's time span or late turns are dropped."""
    from information_extraction_spark.plans.pipeline import extract_triples

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        triples = extract_triples(spark, batch_df, kb, schemas)
        triples.withColumn("epoch_id", F.lit(epoch_id)).write.mode(
            "append"
        ).parquet(out_path)

    return (
        deduped_turns(stream, watermark=watermark)
        .writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_path)
        .start()
    )


def start_streaming_support_merge(
    spark: SparkSession,
    stream: DataFrame,
    kb: DataFrame,
    schemas: DataFrame,
    state_dir: str,
    checkpoint_path: str,
    watermark: str = "10 minutes",
):
    """foreachBatch incremental KG BUILD (not just append): each
    micro-batch is extracted through the batch pipeline, support-
    aggregated (operators/graph.triple_support), and MERGED into a
    persisted graph-state table — support/n_convs add, first_turn
    takes the min. After the stream drains, the state table must equal
    the batch triple_support over the full corpus; the st_support_merge
    catalog query value-checks exactly that.

    State versioning: each epoch reads the latest ``v=<k>`` directory
    and writes ``v=<k+1>`` — never overwriting what it reads (a
    parquet overwrite of the input deletes files mid-scan). This is
    the snapshot-commit shape of the emulated Iceberg checkpoint layer
    (operators/checkpoint.py); at scale each epoch is one Iceberg
    MERGE commit and the versions are table snapshots.

    Additivity contract: per-batch ``support`` sums are exact because
    every assertion row belongs to exactly one micro-batch.
    ``n_convs`` additionally requires each conv_id to arrive WHOLLY
    within one micro-batch — the caller must stage/partition the
    source by conv_id (Kafka keyed by conv_id at scale; the catalog
    query repartitions its staging files on conv_id). A conversation
    split across batches would double-count into n_convs.

    Exactly-once: foreachBatch only guarantees AT-LEAST-once — after a
    crash the engine replays the last epoch, and a blind re-merge
    would double-count its support into the state. Each epoch
    therefore commits by ATOMICALLY replacing a single ``_committed``
    pointer file (``<epoch_id>:<version>``, written to a temp name +
    fsync + os.replace — no torn/partial marker is ever visible), and
    only the pointed-at version is ever read. Structured Streaming
    epoch ids are monotonically increasing across restarts (they come
    from the checkpoint's offset log), so a replayed epoch satisfies
    ``epoch_id <= committed_epoch`` and is skipped; a crash between
    the version-parquet write and the pointer replace leaves an orphan
    dir the replay overwrites before committing. Superseded version
    dirs are pruned after each commit (Iceberg's snapshot-expiry
    analogue), so the state dir holds O(1) versions and the commit
    check is one small file read, regardless of stream lifetime.
    """
    import os

    from information_extraction_spark.operators.graph import (
        triple_support,
    )
    from information_extraction_spark.plans.pipeline import extract_triples

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        batch_support = triple_support(
            extract_triples(spark, batch_df, kb, schemas)
        )
        merge_support_batch(spark, batch_support, state_dir, epoch_id)

    return (
        deduped_turns(stream, watermark=watermark)
        .writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_path)
        .start()
    )


def merge_support_batch(
    spark: SparkSession,
    batch_support: DataFrame,
    state_dir: str,
    epoch_id: int,
) -> None:
    """One epoch's idempotent support merge (the foreachBatch body,
    factored out so replay semantics are directly testable): skip if
    ``epoch_id`` is already covered by the ``_committed`` pointer,
    else merge into the committed version, write ``v=<k+1>``
    (overwriting any orphan from a crash), atomically advance the
    pointer, and prune superseded version dirs."""

    def merge(merged_in: DataFrame) -> DataFrame:
        return merged_in.groupBy("subject", "predicate", "object").agg(
            F.sum("support").cast("long").alias("support"),
            F.sum("n_convs").cast("long").alias("n_convs"),
            F.min("first_turn").cast("int").alias("first_turn"),
        )

    merge_versioned_batch(spark, batch_support, state_dir, epoch_id, merge)


def merge_cms_batch(
    spark: SparkSession,
    batch_counts: DataFrame,
    state_dir: str,
    epoch_id: int,
) -> None:
    """One epoch's Count-Min merge: CMS counters are ADDITIVE (every
    token occurrence belongs to exactly one micro-batch, and the
    sketch is a sum of per-occurrence indicator vectors), so the
    state merge is a plain (seed, bucket) counter sum — the
    mergeability that makes the sketch a streaming-native summary.
    Same exactly-once versioned-commit machinery as the support
    merge."""

    def merge(merged_in: DataFrame) -> DataFrame:
        return merged_in.groupBy("seed", "bucket").agg(
            F.sum("bucket_n").cast("long").alias("bucket_n")
        )

    merge_versioned_batch(spark, batch_counts, state_dir, epoch_id, merge)


def merge_versioned_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    state_dir: str,
    epoch_id: int,
    merge,
) -> None:
    """Generic exactly-once versioned state merge (the commit shape
    merge_support_batch documents): skip replayed epochs, union the
    committed version with the batch, apply ``merge``, write
    ``v=<k+1>``, atomically swing the ``_committed`` pointer, prune
    superseded versions."""
    import os
    import shutil

    committed = committed_state(state_dir)
    if committed is not None and epoch_id <= committed[0]:
        return  # replayed epoch already merged — exactly-once
    if committed is not None:
        old = spark.read.parquet(
            os.path.join(state_dir, f"v={committed[1]}")
        )
        merged_in = old.unionByName(batch_df)
    else:
        merged_in = batch_df
    merged = merge(merged_in)
    new_v = (committed[1] + 1) if committed is not None else 0
    os.makedirs(state_dir, exist_ok=True)
    merged.write.mode("overwrite").parquet(
        os.path.join(state_dir, f"v={new_v}")
    )
    # Commit point: temp-write + fsync + atomic replace — a reader (or
    # a replay's skip check) sees either the old pointer or the new
    # one, never a torn marker. An orphan v= dir from a crash before
    # this line is invisible (the pointer still names the old version)
    # and is overwritten when the epoch replays.
    pointer = os.path.join(state_dir, "_committed")
    tmp = pointer + ".tmp"
    with open(tmp, "w") as f:
        f.write(f"{epoch_id}:{new_v}")
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, pointer)
    # Snapshot expiry: the previous committed version (and any orphan
    # dirs) are superseded — prune so the state dir holds O(1)
    # versions no matter how long the stream runs.
    for name in os.listdir(state_dir):
        if name.startswith("v=") and name != f"v={new_v}":
            shutil.rmtree(os.path.join(state_dir, name), ignore_errors=True)


def committed_state(state_dir: str) -> tuple[int, int] | None:
    """(last committed epoch_id, its state version), or None before
    the first commit."""
    import os

    pointer = os.path.join(state_dir, "_committed")
    try:
        with open(pointer) as f:
            txt = f.read().strip()
    except FileNotFoundError:
        return None
    epoch_s, _, version_s = txt.partition(":")
    # os.replace is atomic, so a malformed pointer is corruption (a
    # hand-edit or torn disk), not a crash artifact — fail loudly
    # rather than silently restarting the state from scratch.
    if not (epoch_s.lstrip("-").isdigit() and version_s.isdigit()):
        raise ValueError(f"corrupt _committed pointer: {txt!r}")
    return int(epoch_s), int(version_s)


def start_streaming_cms_merge(
    spark: SparkSession,
    doc_stream: DataFrame,
    state_dir: str,
    checkpoint_path: str,
    width: int = 16,
    seeds: tuple[str, ...] = ("a", "b", "c"),
):
    """foreachBatch streaming Count-Min maintenance: each micro-batch
    of documents contributes its (seed, bucket) partial counts (the
    same explicit md5-48bit bucketing as the batch a11 sketch), and
    the versioned state MERGE adds them — after the stream drains,
    the state table must equal the batch CMS over the full corpus
    (the st_cms_merge catalog query value-checks exactly that).

    This is the sketch's reason to exist in a streaming pipeline: the
    live state is d×w counters regardless of how much text has
    streamed past, and any window of history merges into any other by
    addition — no raw recount, no unbounded keyed state."""
    from information_extraction_spark.functions.hashing import h48

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        words = batch_df.select(
            F.explode(F.split(F.col("text"), " ")).alias("word")
        )
        seed_col = F.explode(F.array(*[F.lit(x) for x in seeds]))
        counts = (
            words.withColumn("seed", seed_col)
            .withColumn(
                "bucket", h48(F.concat(F.col("seed"), F.col("word"))) % width
            )
            .groupBy("seed", "bucket")
            .agg(F.count("*").cast("long").alias("bucket_n"))
        )
        merge_cms_batch(spark, counts, state_dir, epoch_id)

    return (
        doc_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_path)
        .start()
    )


def latest_state(spark: SparkSession, state_dir: str) -> DataFrame:
    """Read the COMMITTED versioned state (orphan uncommitted dirs
    from a crash are ignored)."""
    import os

    committed = committed_state(state_dir)
    if committed is None:
        raise FileNotFoundError(
            f"no committed state versions under {state_dir}"
        )
    return spark.read.parquet(os.path.join(state_dir, f"v={committed[1]}"))


def latest_support_state(spark: SparkSession, state_dir: str) -> DataFrame:
    """Back-compat name: the committed state written by
    start_streaming_support_merge."""
    return latest_state(spark, state_dir)


def start_conversation_sessions(
    stream: DataFrame,
    query_name: str = "conv_sessions",
    watermark: str = "10 minutes",
    gap_seconds: int = 300,
):
    """Custom stateful operator (applyInPandasWithState): per-
    conversation running session stats with event-time timeout.

    The reference has no streaming at all (SURVEY.md §2.8); this is
    the Spark-native shape for "conversation-level rollups over an
    unbounded transcript stream": state per conv_id accumulates
    (n_turns, n_chars, first/last event time) across micro-batches,
    emits an updated row per batch, and when the watermark passes
    last_ts + gap the conversation times out and emits a final row
    with closed=true, freeing its state — bounded memory at any
    number of conversations, because state lives in the state store
    keyed by conv_id and expires by event time, never wall clock
    (deterministic under replay/resume).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import (
        GroupState,
        GroupStateTimeout,
    )

    def track(key, pdfs, state: GroupState):
        (conv_id,) = key
        if state.hasTimedOut:
            n_turns, n_chars, first_ts, last_ts = state.get
            state.remove()
            yield pd.DataFrame(
                [
                    {
                        "conv_id": conv_id,
                        "n_turns": n_turns,
                        "n_chars": n_chars,
                        "first_ts": first_ts,
                        "last_ts": last_ts,
                        "closed": True,
                    }
                ]
            )
            return
        if state.exists:
            n_turns, n_chars, first_ts, last_ts = state.get
        else:
            n_turns, n_chars, first_ts, last_ts = 0, 0, None, None
        for pdf in pdfs:
            n_turns += len(pdf)
            n_chars += int(pdf["text"].fillna("").str.len().sum())
            # Epochs come from the Spark-side unix_timestamp column
            # (`ts_epoch`, added below) — pandas .timestamp() on the
            # tz-naive ts values Arrow delivers would assume UTC and
            # silently shift by the offset if the session timezone
            # ever changed (ADVICE r01).
            lo = int(pdf["ts_epoch"].min())
            hi = int(pdf["ts_epoch"].max())
            first_ts = lo if first_ts is None else min(first_ts, lo)
            last_ts = hi if last_ts is None else max(last_ts, hi)
        state.update((n_turns, n_chars, first_ts, last_ts))
        state.setTimeoutTimestamp((last_ts + gap_seconds) * 1000)
        yield pd.DataFrame(
            [
                {
                    "conv_id": conv_id,
                    "n_turns": n_turns,
                    "n_chars": n_chars,
                    "first_ts": first_ts,
                    "last_ts": last_ts,
                    "closed": False,
                }
            ]
        )

    sessions = (
        # Null event times can't participate in watermarking (and are
        # NOT dropped by it: null < watermark is null); without this
        # filter an all-null-ts group would reach track() as NaT and
        # kill the query on int(NaT.timestamp()).
        stream.filter(F.col("ts").isNotNull())
        .withColumn("ts_epoch", F.unix_timestamp("ts"))
        .withWatermark("ts", watermark)
        .groupBy("conv_id")
        .applyInPandasWithState(
            track,
            outputStructType=(
                "conv_id string, n_turns bigint, n_chars bigint, "
                "first_ts bigint, last_ts bigint, closed boolean"
            ),
            stateStructType=(
                "n_turns bigint, n_chars bigint, "
                "first_ts bigint, last_ts bigint"
            ),
            outputMode="update",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
    return (
        sessions.writeStream.outputMode("update")
        .format("memory")
        .queryName(query_name)
        .start()
    )


def start_streaming_cdc_upsert(
    spark: SparkSession,
    cdc_stream: DataFrame,
    state_dir: str,
    checkpoint_path: str,
):
    """foreachBatch streaming CDC apply: each micro-batch of change
    rows (user_id, sec, event_id, op, event_type, value) upserts into
    the versioned state via latest-op-wins — per key the state keeps
    exactly ONE row, the struct-max by (sec, event_id). Tombstones
    ('D' ops) STAY in the state: a delete must keep suppressing
    earlier-sequence updates that arrive in later micro-batches (CDC
    sources do not promise key-ordered delivery across batches) —
    reads filter them out (read_cdc_state). Because the merge is a
    total-order max per key, the final state is independent of how
    the log was split into batches, which is what the st_cdc_upsert
    catalog query value-checks against the batch compaction.
    State size is one row per live-or-tombstoned key — the same
    bounded-state argument as the support merge; at warehouse scale
    the state parquet is bucketed by the key."""

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return

        def merge(merged_in: DataFrame) -> DataFrame:
            return (
                merged_in.groupBy("user_id")
                .agg(
                    F.max(
                        F.struct(
                            "sec", "event_id", "op", "event_type", "value"
                        )
                    ).alias("w")
                )
                .select(
                    "user_id",
                    F.col("w.sec").alias("sec"),
                    F.col("w.event_id").alias("event_id"),
                    F.col("w.op").alias("op"),
                    F.col("w.event_type").alias("event_type"),
                    F.col("w.value").alias("value"),
                )
            )

        merge_versioned_batch(spark, batch_df, state_dir, epoch_id, merge)

    return (
        cdc_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_path)
        .start()
    )


def read_cdc_state(spark: SparkSession, state_dir: str) -> DataFrame:
    """The LIVE view of the CDC state: committed version minus
    tombstones, projected to the compaction's output shape."""
    return latest_state(spark, state_dir).filter(F.col("op") != "D").select(
        "user_id",
        F.col("event_type").alias("current_type"),
        F.col("value").alias("current_value"),
        F.col("sec").alias("updated_sec"),
    )


MG_DECREMENT_KEY = " decrement "  # contains spaces — whitespace-split
# tokens can never collide with it, so the cumulative-decrement
# accumulator can ride inside the counter table itself and share the
# exactly-once versioned-commit machinery unchanged.


def merge_mg_batch(
    spark: SparkSession,
    batch_counts: DataFrame,
    state_dir: str,
    epoch_id: int,
    k: int = 8,
) -> None:
    """One epoch's Misra-Gries merge — the counter-based heavy-hitter
    summary next to the hash-based CMS (st_cms_merge): state is AT
    MOST k (word, cnt) counters plus the decrement accumulator, and
    one merge step is: sum the committed counters with the batch's
    exact word counts, find t = the (k+1)-th largest combined count
    (0 when ≤ k survive), subtract t from every counter, drop the
    non-positive. The subtrahend t is a VALUE picked at an ordered
    rank, so boundary ties cannot make it ambiguous — the merge is
    deterministic, which the CMS's additivity gets for free and MG
    has to earn.

    The accumulated Σt rides as the reserved ``MG_DECREMENT_KEY`` row
    and is the summary's error certificate: counters only ever
    UNDERCOUNT, by at most Σt — st_mg_topk's audit checks both
    inequalities against the exact counts. Scale shape: the merge
    input is (≤ k+1 state rows) ∪ (batch vocabulary counts) — one
    map-side-combined word aggregate; the rank runs over that
    bounded table; the state written back is ≤ k+1 rows however much
    text has streamed past."""
    from pyspark.sql import Window

    def merge(merged_in: DataFrame) -> DataFrame:
        summed = merged_in.groupBy("word").agg(
            F.sum("cnt").cast("long").alias("cnt")
        )
        d_prev = summed.filter(F.col("word") == MG_DECREMENT_KEY)
        counters = summed.filter(F.col("word") != MG_DECREMENT_KEY)
        w = Window.orderBy(F.col("cnt").desc(), "word")
        ranked = counters.withColumn("rn", F.row_number().over(w))
        # The oracle's exact shape: coalesce(max(CASE WHEN rn = k+1
        # THEN cnt END), 0) — one aggregate, no per-epoch driver-side
        # DataFrame on the streaming hot path.
        t = ranked.agg(
            F.coalesce(
                F.max(F.when(F.col("rn") == k + 1, F.col("cnt"))),
                F.lit(0),
            )
            .cast("long")
            .alias("t")
        )
        kept = (
            ranked.crossJoin(F.broadcast(t))
            .filter(F.col("cnt") - F.col("t") > 0)
            .select("word", (F.col("cnt") - F.col("t")).alias("cnt"))
        )
        d_new = (
            d_prev.select("cnt")
            .unionByName(t.select(F.col("t").alias("cnt")))
            .agg(F.sum("cnt").cast("long").alias("cnt"))
            .select(F.lit(MG_DECREMENT_KEY).alias("word"), "cnt")
        )
        return kept.unionByName(d_new)

    merge_versioned_batch(spark, batch_counts, state_dir, epoch_id, merge)


def start_streaming_mg_merge(
    spark: SparkSession,
    doc_stream: DataFrame,
    state_dir: str,
    checkpoint_path: str,
    k: int = 8,
):
    """foreachBatch streaming Misra-Gries maintenance: each
    micro-batch contributes its exact word counts, and the versioned
    state merge keeps at most ``k`` counters (merge_mg_batch). After
    the stream drains, the state must equal the sequential MG replay
    over the same batch sequence — st_mg_topk value-checks exactly
    that, with the batch sequence pinned by file modification times
    (the file source processes oldest-first)."""

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        counts = (
            batch_df.select(
                F.explode(F.split(F.col("text"), " ")).alias("word")
            )
            .groupBy("word")
            .agg(F.count("*").cast("long").alias("cnt"))
        )
        merge_mg_batch(spark, counts, state_dir, epoch_id, k=k)

    return (
        doc_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_path)
        .start()
    )


def stage_ordered_slices(
    df: DataFrame,
    src_dir: str,
    n_slices: int = 4,
    key_col: str = "doc_id",
) -> None:
    """Stage ``df`` as ``n_slices`` single-file parquet slices
    (``key_col % n_slices``) with STAGGERED MODIFICATION TIMES so a
    file-source stream (maxFilesPerTrigger=1, oldest-first pickup)
    processes them in slice order — the batch-sequence pin every
    ORDER-SENSITIVE state merge needs (Misra-Gries; the additive CMS
    doesn't care). Single implementation shared by the st_mg_topk
    catalog query and tools/stream_bench.py so the pinned-order
    discipline cannot silently diverge between the gate and the
    bench."""
    import glob as _glob
    import os
    import shutil
    import time as _time

    os.makedirs(src_dir, exist_ok=True)
    base = _time.time() - 3600
    parent = os.path.dirname(src_dir.rstrip("/"))
    for b in range(n_slices):
        tmp = os.path.join(parent, f"_slice_tmp{b}")
        df.filter(F.col(key_col) % n_slices == b).coalesce(1).write.mode(
            "overwrite"
        ).parquet(tmp)
        parts = _glob.glob(os.path.join(tmp, "part-*.parquet"))
        if not parts:
            # An empty slice (skewed/small corpus: no doc_id with this
            # residue) can legally produce a parquet dir with no part
            # file. Skip it — the staged batch sequence stays
            # deterministic because slice order is pinned by mtime,
            # and an absent batch merges the same state as an empty
            # one for every order-sensitive merge we stage (MG/CMS).
            shutil.rmtree(tmp, ignore_errors=True)
            continue
        part = parts[0]
        dst = os.path.join(src_dir, f"b{b}.parquet")
        shutil.copyfile(part, dst)
        os.utime(dst, (base + 60 * b, base + 60 * b))
        shutil.rmtree(tmp, ignore_errors=True)
