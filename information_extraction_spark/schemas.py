"""Explicit StructType schemas for every table in the engine.

The reference keeps schemas implicit (field names hard-coded at JSON
read sites, e.g. classification/dataset.py:32-40); we make them
explicit so reads never infer and writers are stable across runs.
"""

from __future__ import annotations

from pyspark.sql import types as T

# Primary input (BASELINE.json input_hint): multi-turn transcripts.
TRANSCRIPTS = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)

# 50-relation schema dimension (reference all_50_schemas,
# classification/utils.py:19-25; one predicate may carry two rows with
# different subject types — produce_submit_json_file.py:63).
RELATION_SCHEMAS = T.StructType(
    [
        T.StructField("schema_id", T.IntegerType(), False),
        T.StructField("predicate", T.StringType(), False),
        T.StructField("subject_type", T.StringType(), False),
        T.StructField("object_type", T.StringType(), False),
    ]
)

# Knowledge base driving the deterministic kernels (stand-in for model
# weights; FIXTURES.md §5).
KNOWLEDGE_BASE = T.StructType(
    [
        T.StructField("predicate", T.StringType(), False),
        T.StructField("subject", T.StringType(), False),
        T.StructField("object", T.StringType(), False),
    ]
)

# Emitted triples (reference spo_list rows,
# produce_submit_json_file.py:284-288) keyed by turn.
TRIPLES = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("predicate", T.StringType(), False),
        T.StructField("subject", T.StringType(), False),
        T.StructField("object", T.StringType(), False),
        T.StructField("subject_type", T.StringType(), True),
        T.StructField("object_type", T.StringType(), True),
    ]
)

# Alias dictionary, exploded one row per (canonical, alias)
# (reference TSV format, calc_pr.py:122-138).
ALIAS_DICT = T.StructType(
    [
        T.StructField("canonical", T.StringType(), False),
        T.StructField("alias", T.StringType(), False),
    ]
)

# Stage-1 classifier output: per-turn predicted predicates + scores.
CLASSIFIED = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("predicates", T.ArrayType(T.StringType()), False),
        T.StructField("scores", T.ArrayType(T.FloatType()), False),
    ]
)

# Stage-2 tagger output: one row per (turn, predicate) work unit with a
# per-character BIESO tag sequence (labeling/tagging.py:9-51 alphabet).
TAGGED = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("predicate", T.StringType(), False),
        T.StructField("tags", T.ArrayType(T.StringType()), False),
    ]
)

# Checkpoint lineage manifest (replaces the reference's pickle/txt
# stage files + newest-ckpt-by-mtime resume,
# produce_submit_json_file.py:6-24).
MANIFEST = T.StructType(
    [
        T.StructField("run_id", T.StringType(), False),
        T.StructField("stage", T.StringType(), False),
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("row_count", T.LongType(), False),
        T.StructField("params_hash", T.StringType(), False),
        T.StructField("completed_ts", T.TimestampType(), False),
    ]
)
