"""Flagship golden-oracle equivalence inside the test suite: the
pure-Python direct-path golden (driver_queries/kg._python_golden_rows
— own turn-splitting + KB arithmetic + classify_predicates/bieso_tags/
decode_bieso) must equal the Spark pipeline's triples exactly. This
mirrors the driver's CORRECTNESS gate for kg_extract_triples without
DuckDB in the loop, so `python -m pytest -x -q` alone carries the
flagship value check."""

from __future__ import annotations

import os

import pytest

SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present"
)


def test_flagship_matches_python_golden(spark):
    from information_extraction_spark.driver_queries.kg import (
        _python_golden_rows,
        kg_extract_triples,
    )

    golden = set(map(tuple, _python_golden_rows(spark, SF_DIR)))
    got = {
        (
            r["conv_id"],
            r["turn_idx"],
            r["text"],
            r["predicate"],
            r["subject"],
            r["object"],
            r["subject_type"],
            r["object_type"],
        )
        for r in kg_extract_triples(spark, SF_DIR).collect()
    }
    assert len(golden) > 10_000  # non-degenerate corpus
    assert got == golden
