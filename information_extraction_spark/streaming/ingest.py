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
    dropDuplicates on the explicit key (never positional)."""
    return stream.withWatermark("ts", watermark).dropDuplicates(
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
):
    """foreachBatch bridge into the batch extraction pipeline —
    microbatch triples appended to the graph table."""
    from information_extraction_spark.plans.pipeline import extract_triples

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        triples = extract_triples(spark, batch_df, kb, schemas)
        triples.withColumn("epoch_id", F.lit(epoch_id)).write.mode(
            "append"
        ).parquet(out_path)

    return (
        deduped_turns(stream)
        .writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_path)
        .start()
    )
