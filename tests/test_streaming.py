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
