"""Pure-Python extraction kernels (no Spark imports).

These are the deterministic stand-ins for the reference's NN inference
kernels (SURVEY.md §2.9). They are pure functions of the row, so the
Spark layer can batch them through Arrow/pandas UDFs and the test
suite can golden-test them directly.
"""

from information_extraction_spark.kernels.extraction import (  # noqa: F401
    KnowledgeBase,
    assemble_entities,
    bieso_tags,
    classify_predicates,
    decode_bieso,
    decode_bio_tokens,
    find_occurrences,
    reference_extract,
)
