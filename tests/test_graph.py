"""PageRank operator: hand-worked small graphs vs an independent pure-
Python power iteration, plus structural invariants."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from information_extraction_spark.operators.graph import (
    pagerank,
    triple_edges,
)


def _py_pagerank(edges, iterations=3, damping=0.85):
    """Independent driver-side reference: dict-based power iteration
    with the identical leaked-mass dangling-node rule."""
    nodes = sorted({n for e in edges for n in e})
    out = {}
    for s, _ in edges:
        out[s] = out.get(s, 0) + 1
    ranks = {n: 1.0 for n in nodes}
    for _ in range(iterations):
        contrib = {n: 0.0 for n in nodes}
        for s, d in edges:
            contrib[d] += ranks[s] / out[s]
        ranks = {n: (1 - damping) + damping * contrib[n] for n in nodes}
    return ranks


EDGES = [
    ("a", "b"),
    ("b", "a"),
    ("c", "a"),
    ("c", "b"),
    ("d", "c"),  # d is a source (rank floor), a/b form a 2-cycle
]


def test_pagerank_matches_reference_power_iteration(spark):
    df = spark.createDataFrame(EDGES, "src string, dst string")
    got = {
        r["entity"]: r["rank"] for r in pagerank(df, iterations=3).collect()
    }
    want = _py_pagerank(EDGES, iterations=3)
    assert set(got) == set(want)
    for n in want:
        assert got[n] == pytest.approx(want[n], abs=1e-12)


def test_pagerank_dangling_and_source_nodes(spark):
    df = spark.createDataFrame(EDGES, "src string, dst string")
    got = {
        r["entity"]: r["rank"] for r in pagerank(df, iterations=3).collect()
    }
    # d has no in-edges: rank is exactly the (1-d) floor every step.
    assert got["d"] == pytest.approx(0.15, abs=1e-12)
    # b has no out-edges in {a,b}-cycle? b -> a exists; sanity: the
    # 2-cycle members outrank the feeder c.
    assert got["a"] > got["c"] and got["b"] > got["c"]


def test_triple_edges_drops_self_loops_and_dedups(spark):
    triples = spark.createDataFrame(
        [
            ("x", "r1", "y"),
            ("x", "r2", "y"),  # same endpoint pair via another pred
            ("x", "r1", "x"),  # self loop
        ],
        "subject string, predicate string, object string",
    )
    rows = triple_edges(triples).collect()
    assert [(r["src"], r["dst"]) for r in rows] == [("x", "y")]


def test_pagerank_zero_iterations_is_uniform(spark):
    df = spark.createDataFrame(EDGES, "src string, dst string")
    got = pagerank(df, iterations=0).collect()
    assert {r["rank"] for r in got} == {1.0}
    assert len(got) == 4
