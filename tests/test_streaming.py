"""Structured Streaming ingest: watermarked dedup + foreachBatch
extraction parity with the batch pipeline."""

from __future__ import annotations

import os

from information_extraction_spark import schemas as S
from information_extraction_spark.plans.pipeline import extract_triples
from information_extraction_spark.sources.tables import read_transcripts
from information_extraction_spark.streaming.ingest import (
    read_transcript_stream,
    start_streaming_extraction,
    start_windowed_turn_counts,
)


def _write_transcripts(spark, pdf, path):
    spark.createDataFrame(pdf, schema=S.TRANSCRIPTS).write.mode(
        "overwrite"
    ).parquet(path)


def test_windowed_turn_counts(spark, transcripts_pdf, tmp_dir):
    src = os.path.join(tmp_dir, "stream_src1")
    _write_transcripts(spark, transcripts_pdf, src)
    q = start_windowed_turn_counts(
        read_transcript_stream(spark, src), query_name="tc_test"
    )
    try:
        q.processAllAvailable()
        got = spark.sql(
            "SELECT sum(n_turns) AS n FROM tc_test"
        ).collect()[0]["n"]
        assert got == len(transcripts_pdf)
    finally:
        q.stop()


def test_streaming_extraction_matches_batch(
    spark, world, transcripts_pdf, tmp_dir
):
    src = os.path.join(tmp_dir, "stream_src2")
    out = os.path.join(tmp_dir, "stream_out")
    ckpt = os.path.join(tmp_dir, "stream_ckpt")
    # Include duplicated rows — the watermarked dedup must collapse them.
    dup = transcripts_pdf.head(200)
    _write_transcripts(
        spark,
        __import__("pandas").concat([transcripts_pdf, dup], ignore_index=True),
        src,
    )
    kb = spark.createDataFrame(world.kb_clean, schema=S.KNOWLEDGE_BASE)
    sch = spark.createDataFrame(world.schemas, schema=S.RELATION_SCHEMAS)
    q = start_streaming_extraction(
        spark, read_transcript_stream(spark, src), kb, sch, out, ckpt
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    key = ["conv_id", "turn_idx", "predicate", "subject", "object"]
    streamed = sorted(
        map(tuple, spark.read.parquet(out).select(key).collect())
    )
    tdf = read_transcripts(spark, src)
    batch = sorted(
        map(
            tuple,
            extract_triples(spark, tdf, kb, sch).select(key).collect(),
        )
    )
    assert streamed == batch


def test_incremental_extraction_runs_multiple_microbatches(
    spark, world, transcripts_pdf, tmp_dir
):
    """The st_extract_triples shape: 4 source files +
    maxFilesPerTrigger=1 must yield MULTIPLE foreachBatch epochs whose
    union still equals the batch run (the sink's epoch_id records
    which micro-batch produced each triple). The widened watermark is
    the deduped_turns backfill contract — file pickup order is not
    event-time order, and the live-sized default would drop
    out-of-order micro-batches as late."""
    import pandas as pd
    from pyspark.sql import functions as F

    src = os.path.join(tmp_dir, "stream_src_mb")
    out = os.path.join(tmp_dir, "stream_out_mb")
    ckpt = os.path.join(tmp_dir, "stream_ckpt_mb")
    spark.createDataFrame(
        pd.DataFrame(transcripts_pdf), schema=S.TRANSCRIPTS
    ).repartition(4).write.mode("overwrite").parquet(src)
    kb = spark.createDataFrame(world.kb_clean, schema=S.KNOWLEDGE_BASE)
    sch = spark.createDataFrame(world.schemas, schema=S.RELATION_SCHEMAS)
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = start_streaming_extraction(
        spark, stream, kb, sch, out, ckpt, watermark="87600 hours"
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    sink = spark.read.parquet(out)
    n_epochs = sink.select("epoch_id").distinct().count()
    assert n_epochs >= 3  # genuinely incremental, not one big batch
    key = ["conv_id", "turn_idx", "predicate", "subject", "object"]
    streamed = sorted(map(tuple, sink.select(key).collect()))
    tdf = read_transcripts(spark, src)
    batch = sorted(
        map(
            tuple,
            extract_triples(spark, tdf, kb, sch).select(key).collect(),
        )
    )
    assert streamed == batch
    assert sink.filter(F.col("epoch_id").isNull()).count() == 0


def test_stateful_conversation_sessions(spark, tmp_dir):
    """applyInPandasWithState: per-conv state accumulates across
    micro-batches and closes by EVENT-time timeout once the watermark
    passes last_ts + gap (deterministic — no wall clock)."""
    import pandas as pd

    from information_extraction_spark.streaming.ingest import (
        start_conversation_sessions,
    )

    src = os.path.join(tmp_dir, "stream_src3")
    os.makedirs(src, exist_ok=True)
    base = pd.Timestamp("2026-01-01 00:00:00")

    def turns(conv, n, t0):
        return pd.DataFrame(
            {
                "conv_id": [conv] * n,
                "turn_idx": range(n),
                "role": ["user"] * n,
                "text": ["hello world"] * n,
                "tool": [None] * n,
                "ts": [t0 + pd.Timedelta(seconds=10 * i) for i in range(n)],
            }
        )

    def write_chunk(pdf, name):
        spark.createDataFrame(pdf, schema=S.TRANSCRIPTS).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(src, name))

    # Each chunk subdir becomes its own micro-batch for the file
    # source (recursiveFileLookup picks up new subdirs). A null-ts
    # turn rides along: it must be excluded from session state (a NaT
    # reaching the state function would kill the query) — c1 still
    # counts 3 turns.
    nullts = turns("c1", 1, base).assign(turn_idx=[99], ts=[pd.NaT])
    write_chunk(
        pd.concat([turns("c1", 3, base), turns("c2", 2, base), nullts]),
        "chunk1",
    )
    stream = spark.readStream.schema(S.TRANSCRIPTS).option(
        "recursiveFileLookup", "true"
    ).parquet(src)
    q = start_conversation_sessions(
        stream, query_name="cs_test", watermark="1 minute", gap_seconds=60
    )
    try:
        q.processAllAvailable()
        # Batch 2: late traffic 1h later advances the watermark.
        write_chunk(turns("c3", 1, base + pd.Timedelta(hours=1)), "chunk2")
        q.processAllAvailable()
        # Batch 3: triggers timeout processing under the new watermark.
        write_chunk(turns("c4", 1, base + pd.Timedelta(hours=2)), "chunk3")
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM cs_test").collect()
    finally:
        q.stop()
    live = {(r.conv_id, r.n_turns) for r in rows if not r.closed}
    closed = {(r.conv_id, r.n_turns, r.n_chars) for r in rows if r.closed}
    assert ("c1", 3) in live and ("c2", 2) in live
    # c1/c2 timed out and emitted final summaries with state removed.
    assert ("c1", 3, 3 * len("hello world")) in closed
    assert ("c2", 2, 2 * len("hello world")) in closed
    # Freshest conversation is still open.
    assert not any(r.conv_id == "c4" and r.closed for r in rows)


def test_streaming_support_merge_matches_batch(
    spark, world, transcripts_pdf, tmp_dir
):
    from information_extraction_spark.operators.graph import triple_support
    from information_extraction_spark.streaming.ingest import (
        latest_support_state,
        start_streaming_support_merge,
    )

    src = os.path.join(tmp_dir, "support_src")
    state = os.path.join(tmp_dir, "support_state")
    ckpt = os.path.join(tmp_dir, "support_ckpt")
    # Hash-partition staging on conv_id: the n_convs additivity
    # contract requires each conversation wholly within one file.
    spark.createDataFrame(transcripts_pdf, schema=S.TRANSCRIPTS).repartition(
        4, "conv_id"
    ).write.mode("overwrite").parquet(src)
    kb = spark.createDataFrame(world.kb_clean, schema=S.KNOWLEDGE_BASE)
    sch = spark.createDataFrame(world.schemas, schema=S.RELATION_SCHEMAS)
    stream = (
        spark.readStream.schema(S.TRANSCRIPTS)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = start_streaming_support_merge(
        spark, stream, kb, sch, state, ckpt, watermark="87600 hours"
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # Multiple genuine epochs reached the commit pointer (superseded
    # version DIRS are pruned, so count epochs, not directories).
    from information_extraction_spark.streaming.ingest import (
        committed_state,
    )

    epoch, version = committed_state(state)
    assert epoch >= 2 and version >= 2
    assert [n for n in os.listdir(state) if n.startswith("v=")] == [
        f"v={version}"
    ]
    got = sorted(
        map(tuple, latest_support_state(spark, state).collect())
    )
    batch = sorted(
        map(
            tuple,
            triple_support(
                extract_triples(
                    spark, read_transcripts(spark, src), kb, sch
                )
            ).collect(),
        )
    )
    assert got == batch


def test_support_merge_epoch_replay_is_exactly_once(spark, tmp_dir):
    """foreachBatch is at-least-once: a replayed epoch must NOT
    double-merge, and an orphan version dir from a crash (parquet
    written, marker never committed) must be ignored and overwritten."""
    from information_extraction_spark.streaming.ingest import (
        latest_support_state,
        merge_support_batch,
    )

    state = os.path.join(tmp_dir, "replay_state")
    schema = (
        "subject string, predicate string, object string, "
        "support long, n_convs long, first_turn int"
    )
    b0 = spark.createDataFrame([("s", "p", "o", 2, 1, 0)], schema)
    b1 = spark.createDataFrame(
        [("s", "p", "o", 3, 2, 1), ("x", "q", "y", 1, 1, 5)], schema
    )

    def snapshot():
        return sorted(map(tuple, latest_support_state(spark, state).collect()))

    merge_support_batch(spark, b0, state, epoch_id=0)
    merge_support_batch(spark, b1, state, epoch_id=1)
    want = [("s", "p", "o", 5, 3, 0), ("x", "q", "y", 1, 1, 5)]
    assert snapshot() == want
    # Replay of a committed epoch: no double-count.
    merge_support_batch(spark, b1, state, epoch_id=1)
    assert snapshot() == want
    # Crash simulation: an epoch wrote its parquet but crashed before
    # advancing the _committed pointer — the orphan must be invisible
    # to readers and get overwritten when the epoch replays.
    orphan = os.path.join(state, "v=2")
    b2 = spark.createDataFrame([("z", "r", "w", 9, 9, 9)], schema)
    b2.write.mode("overwrite").parquet(orphan)  # garbage content
    assert snapshot() == want  # reader ignores the orphan
    merge_support_batch(spark, b2, state, epoch_id=2)
    assert snapshot() == sorted(want + [("z", "r", "w", 9, 9, 9)])
    # Snapshot expiry: only the committed version dir survives.
    from information_extraction_spark.streaming.ingest import (
        committed_state,
    )

    epoch, version = committed_state(state)
    assert (epoch, version) == (2, 2)
    assert [n for n in os.listdir(state) if n.startswith("v=")] == ["v=2"]


def test_stream_stream_join_matches_batch(spark):
    """st_stream_join (4 genuine micro-batches per side, symmetric
    join state) must equal the same 6-hour attribution join run as
    one batch over the same events table."""
    from information_extraction_spark.driver_queries.streamq import (
        _ATTR_WINDOW_H,
        st_stream_join,
    )
    from pyspark.sql import functions as F

    sf_dir = "/root/testdata/sf0.001"
    got = sorted(
        tuple(r) for r in st_stream_join(spark, sf_dir).collect()
    )
    e = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .filter(F.col("ts").isNotNull())
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    a = e.filter(F.col("event_type") == "view").select(
        "user_id", F.col("event_id").alias("view_id"), F.col("ts").alias("a_ts")
    )
    b = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("b_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("b_ts"),
        "value",
    )
    want = sorted(
        tuple(r)
        for r in a.join(
            b,
            (F.col("user_id") == F.col("b_user"))
            & (F.col("b_ts") >= F.col("a_ts"))
            & (
                F.col("b_ts")
                <= F.col("a_ts") + F.expr(f"INTERVAL {_ATTR_WINDOW_H} HOURS")
            ),
        )
        .select(
            "user_id",
            "view_id",
            "purchase_id",
            F.unix_timestamp("a_ts").alias("view_ts"),
            F.unix_timestamp("b_ts").alias("purchase_ts"),
            F.round("value", 2).alias("purchase_value"),
        )
        .collect()
    )
    assert len(got) > 0 and got == want


def test_session_window_gap_boundary_is_inclusive(spark):
    """Spark's session_window MERGES an event whose gap to the
    previous event is exactly the session gap (a new session needs a
    STRICTLY greater gap) — the `>` break the W7 oracle encodes.
    Pinned empirically so an engine-semantics change breaks loudly
    here rather than as an oracle mismatch."""
    from pyspark.sql import functions as F

    rows = [
        (1, "2024-01-01 00:00:00", 1.0),
        (1, "2024-01-01 00:10:00", 1.0),   # inside gap -> same session
        (1, "2024-01-01 00:40:00", 1.0),   # EXACTLY prev+30m -> merges
        (1, "2024-01-01 01:10:01", 1.0),   # 30m01s later -> NEW session
        (2, "2024-01-01 00:00:00", 1.0),
    ]
    df = spark.createDataFrame(rows, "user_id long, s string, value double")
    e = df.withColumn("ts", F.col("s").cast("timestamp"))
    got = sorted(
        (r["user_id"], r["start"], r["n"])
        for r in e.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count("*").alias("n"))
        .select(
            "user_id",
            F.unix_timestamp(F.col("session_window.start")).alias("start"),
            "n",
        )
        .collect()
    )
    t0 = got[0][1]  # epoch of 2024-01-01 00:00:00 in the session tz
    assert got == [(1, t0, 3), (1, t0 + 4201, 1), (2, t0, 1)]


def test_streaming_dedup_suppresses_cross_batch_duplicates(
    spark, tmp_path
):
    """st_dedup stages the corpus + a re-crawl as 4 micro-batches so
    every duplicate pair crosses a batch boundary; the state store
    must suppress the second arrival. Also pins that duplicates
    already inside the base corpus collapse to one emission."""
    import os

    from pyspark.sql import functions as F

    from information_extraction_spark.driver_queries.streamq import (
        st_dedup,
    )

    docs = [
        (1, "alpha beta"),
        (2, "gamma delta"),
        (3, "alpha beta"),  # in-corpus duplicate of doc 1
        (4, "epsilon"),
    ]
    df = spark.createDataFrame(
        [(i, t, "en", "web", len(t)) for i, t in docs],
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(str(tmp_path), "documents.parquet")
    )
    out = st_dedup(spark, str(tmp_path)).collect()
    # 8 arrivals (4 docs × 2 crawls) -> 3 distinct fingerprints.
    assert len(out) == 3
    got = {(r["fingerprint"], r["n_chars"]) for r in out}
    want = {
        (
            spark.sql(
                f"SELECT md5('{t}') f"
            ).first()["f"],
            len(t),
        )
        for _, t in docs
    }
    assert got == want


def test_cms_merge_adds_and_skips_replayed_epoch(spark, tmp_path):
    """CMS counters ADD across epochs; a replayed epoch_id is a no-op
    (exactly-once), and the committed pointer survives."""
    import os

    from information_extraction_spark.streaming.ingest import (
        latest_state,
        merge_cms_batch,
    )

    state = os.path.join(str(tmp_path), "state")
    b1 = spark.createDataFrame(
        [("a", 3, 5), ("b", 3, 2)], "seed string, bucket int, bucket_n long"
    )
    b2 = spark.createDataFrame(
        [("a", 3, 7), ("c", 1, 1)], "seed string, bucket int, bucket_n long"
    )
    merge_cms_batch(spark, b1, state, epoch_id=0)
    merge_cms_batch(spark, b2, state, epoch_id=1)
    # Replay of epoch 1 (at-least-once delivery) must not double-add.
    merge_cms_batch(spark, b2, state, epoch_id=1)
    got = {
        (r["seed"], r["bucket"]): r["bucket_n"]
        for r in latest_state(spark, state).collect()
    }
    assert got == {("a", 3): 12, ("b", 3): 2, ("c", 1): 1}


def test_cdc_upsert_tombstone_survives_and_resurrects(spark, tmp_path):
    """Hand-driven epochs against the CDC state merge: (1) a delete
    in epoch 0 must keep suppressing an EARLIER-seq update that
    arrives in a LATER batch (tombstones persist in state); (2) a
    NEWER-seq update after the delete resurrects the key; (3) a
    replayed epoch is a no-op."""
    import os

    from information_extraction_spark.streaming.ingest import (
        merge_versioned_batch,
        read_cdc_state,
    )

    state = os.path.join(str(tmp_path), "state")
    schema = (
        "user_id long, sec long, event_id long, op string,"
        " event_type string, value double"
    )

    def merge(merged_in):
        from pyspark.sql import functions as F

        return (
            merged_in.groupBy("user_id")
            .agg(
                F.max(
                    F.struct("sec", "event_id", "op", "event_type", "value")
                ).alias("w")
            )
            .select(
                "user_id",
                "w.sec", "w.event_id", "w.op", "w.event_type", "w.value",
            )
        )

    # epoch 0: u1 updated at sec 100, then deleted at sec 200;
    #          u2 updated at sec 50
    b0 = spark.createDataFrame(
        [(1, 100, 10, "U", "click", 1.0), (1, 200, 11, "D", "error", 0.0),
         (2, 50, 12, "U", "view", 2.0)],
        schema,
    )
    merge_versioned_batch(spark, b0, state, 0, merge)
    live = {r["user_id"] for r in read_cdc_state(spark, state).collect()}
    assert live == {2}

    # epoch 1: an OUT-OF-ORDER earlier-seq update for u1 (sec 150 <
    # the tombstone's 200) — must stay suppressed
    b1 = spark.createDataFrame([(1, 150, 13, "U", "click", 3.0)], schema)
    merge_versioned_batch(spark, b1, state, 1, merge)
    live = {r["user_id"] for r in read_cdc_state(spark, state).collect()}
    assert live == {2}

    # epoch 1 REPLAYED with different content must be ignored
    b1_replay = spark.createDataFrame(
        [(1, 999, 14, "U", "click", 9.0)], schema
    )
    merge_versioned_batch(spark, b1_replay, state, 1, merge)
    live = {r["user_id"] for r in read_cdc_state(spark, state).collect()}
    assert live == {2}

    # epoch 2: a NEWER-seq update resurrects u1
    b2 = spark.createDataFrame([(1, 300, 15, "U", "signup", 4.0)], schema)
    merge_versioned_batch(spark, b2, state, 2, merge)
    rows = {r["user_id"]: r for r in read_cdc_state(spark, state).collect()}
    assert set(rows) == {1, 2}
    assert rows[1]["current_type"] == "signup"
    assert rows[1]["updated_sec"] == 300


def test_mg_merge_prune_decrement_and_replay(spark, tmp_path):
    """Hand-driven Misra-Gries epochs at k = 2: epoch 0 prunes with
    t = the 3rd-largest count (value picked at an ordered rank, so
    the boundary tie between 'b' and 'c' cannot change it); epoch 1
    re-sums with the surviving counters and prunes again; the
    decrement accumulator carries Sigma-t; a replayed epoch is a
    no-op; and state never exceeds k counters + the reserved row."""
    import os

    from information_extraction_spark.streaming.ingest import (
        MG_DECREMENT_KEY,
        latest_state,
        merge_mg_batch,
    )

    state = os.path.join(str(tmp_path), "state")
    # epoch 0: a=5, b=3, c=3 -> ranked a,b,c; t = cnt at rank 3 = 3
    # (the b/c tie sits at the boundary; the VALUE is 3 either way).
    # survivors: a=2 (b and c both drop); D = 3.
    b0 = spark.createDataFrame(
        [("a", 5), ("b", 3), ("c", 3)], "word string, cnt long"
    )
    merge_mg_batch(spark, b0, state, epoch_id=0, k=2)
    got0 = {r["word"]: r["cnt"] for r in latest_state(spark, state).collect()}
    assert got0 == {"a": 2, MG_DECREMENT_KEY: 3}

    # epoch 1: batch c=4, d=1 -> combined a=2, c=4, d=1; t = 1;
    # survivors a=1, c=3; D = 3 + 1 = 4.
    b1 = spark.createDataFrame(
        [("c", 4), ("d", 1)], "word string, cnt long"
    )
    merge_mg_batch(spark, b1, state, epoch_id=1, k=2)
    # replayed epoch must not re-merge
    merge_mg_batch(spark, b1, state, epoch_id=1, k=2)
    got1 = {r["word"]: r["cnt"] for r in latest_state(spark, state).collect()}
    assert got1 == {"a": 1, "c": 3, MG_DECREMENT_KEY: 4}
    assert len(got1) <= 2 + 1


def test_stage_ordered_slices_skips_empty_slice(spark, tmp_path):
    """A residue class with no doc_id may produce a parquet dir with
    no part file (skewed/small corpora); the stager must skip it, not
    IndexError, and still stage the non-empty slices in pinned mtime
    order (round-5 ADVICE, streaming/ingest.py)."""
    import glob
    import os

    from information_extraction_spark.streaming.ingest import (
        stage_ordered_slices,
    )

    # skewed-but-nonempty slices still stage (possibly as empty files)
    df = spark.createDataFrame(
        [(4 * i, f"text {i}") for i in range(8)], "doc_id long, text string"
    )
    src = os.path.join(str(tmp_path), "src")
    stage_ordered_slices(df, src, n_slices=4)
    staged = sorted(glob.glob(os.path.join(src, "b*.parquet")))
    assert "b0.parquet" in [os.path.basename(p) for p in staged]
    assert spark.read.parquet(os.path.join(src, "b0.parquet")).count() == 8

    # the IndexError repro: a ZERO-partition DataFrame writes no
    # part-*.parquet at all; the stager must skip, not raise
    from pyspark.sql.types import LongType, StringType, StructField
    from pyspark.sql.types import StructType

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("text", StringType()),
        ]
    )
    empty = spark.createDataFrame(spark.sparkContext.emptyRDD(), schema)
    src2 = os.path.join(str(tmp_path), "src2")
    stage_ordered_slices(empty, src2, n_slices=2)  # must not IndexError
    for p in glob.glob(os.path.join(src2, "b*.parquet")):
        assert spark.read.parquet(p).count() == 0
