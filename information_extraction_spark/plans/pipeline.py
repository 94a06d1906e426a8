"""The end-to-end KG-construction pipeline.

read transcripts → stable ordering → classify (pandas UDF) →
explode(predicates) → tag (pandas UDF) → span decode → dedup/filter →
cartesian SUB×OBJ → broadcast-join schema dim → triples.

This is the Spark shape of the reference's six-process legacy
pipeline (SURVEY.md §3.1); every process boundary that used to be a
line-aligned text file is either fused into the DAG or an explicit
Parquet checkpoint with a lineage manifest (operators/checkpoint.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from information_extraction_spark.operators.extract import (
    FALLBACK_K,
    MIN_ENTITY_LEN,
    THRESHOLD,
    assemble_triples,
    broadcast_kb,
    classify_stage,
    classify_tag_decode_stage,
    decode_stage,
    fanout_predicates,
    ordered_transcripts,
    tag_decode_stage,
    tag_stage,
)


def extract_triples(
    spark: SparkSession,
    transcripts: DataFrame,
    kb: DataFrame,
    schemas: DataFrame,
    threshold: float = THRESHOLD,
    fallback_k: int = FALLBACK_K,
    checkpointer=None,
    kernel_partitions: int | None = None,
) -> DataFrame:
    """Run the full extraction DAG; returns the triples DataFrame.

    ``checkpointer`` (operators.checkpoint.CheckpointManager) makes
    each stage resumable; None fuses everything into one DAG (fastest
    when no resume is needed — Catalyst pipelines the narrow stages
    into a single pass over the data).

    ``kernel_partitions``: explicit partition count for the Python
    kernel stages. The kernels are CPU-bound, so their parallelism
    must track cores, not bytes — AQE's byte-based coalescing would
    otherwise squeeze a small-byte/high-cost stage onto a couple of
    cores (observed: 50k turns coalesced to 2 partitions). Default
    3x defaultParallelism; the explicit repartition count is exempt
    from AQE coalescing. 0 disables the repartition (use when the
    upstream partitioning is already right, e.g. a bucketed table).
    """
    kb_bc = broadcast_kb(spark, kb)

    if kernel_partitions is None:
        kernel_partitions = spark.sparkContext.defaultParallelism * 3
    if kernel_partitions:
        # Repartition BEFORE the dedup window: the window's
        # partitionBy(conv_id, turn_idx) is satisfied by this exact
        # hash partitioning, so the whole pre-kernel path costs ONE
        # shuffle and the kernels inherit the explicit (AQE-exempt)
        # partition count.
        transcripts = transcripts.repartition(
            kernel_partitions, "conv_id", "turn_idx"
        )
    ordered = ordered_transcripts(transcripts)
    if checkpointer is not None:
        # Resumable variant: materialize each stage separately.
        classified = checkpointer.stage(
            classify_stage(
                ordered, kb_bc, threshold=threshold, fallback_k=fallback_k
            ),
            "classified",
        )
        fanned = fanout_predicates(classified)
        tagged = checkpointer.stage(tag_stage(fanned, kb_bc), "tagged")
        decoded = decode_stage(tagged)
    elif 0.5 <= threshold < 1.0:
        # Fully fused fast path: classify+fanout+tag+decode in one
        # Arrow round-trip (triple-exact with the staged path; the
        # fused kernel's fired/fallback split assumes the default
        # threshold regime — see classify_tag_decode_stage). The
        # kernel also pre-cleans entities (assemble_entities at memo
        # time, once per distinct text), so assemble_triples skips its
        # per-unit-row array lambdas (pre_cleaned below).
        decoded = classify_tag_decode_stage(
            ordered,
            kb_bc,
            threshold=threshold,
            fallback_k=fallback_k,
            min_entity_len=MIN_ENTITY_LEN,
        )
        return assemble_triples(decoded, schemas, pre_cleaned=True)
    else:
        classified = classify_stage(
            ordered, kb_bc, threshold=threshold, fallback_k=fallback_k
        )
        fanned = fanout_predicates(classified)
        # Fused tag+decode (one Arrow round-trip).
        decoded = tag_decode_stage(fanned, kb_bc)
    triples = assemble_triples(decoded, schemas)
    if checkpointer is not None:
        triples = checkpointer.stage(triples, "triples")
    return triples
