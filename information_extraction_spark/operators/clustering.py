"""Distributed Lloyd's k-means over an embedding column.

The training-data pipeline's clustering primitive: topic/domain
clustering of document embeddings (cluster-balanced sampling,
near-dup triage, domain-mix curation all start from an assignment
table). The reference has no clustering stage — this generalizes its
nearest-candidate selection (the same argmin-over-centroids shape as
the IVF quantizer assignment in driver_queries/textdata.py) into the
standard fixed-iteration Lloyd loop.

Scale shape (what survives 100 TB of vectors):

- Centroids are a k×dim literal — broadcast by construction (they are
  baked into the plan as a column literal, not even a broadcast
  exchange). The ASSIGNMENT pass is therefore completely narrow: one
  whole-stage-codegen map over the vector table per iteration, no
  crossJoin row expansion, no shuffle.
- The UPDATE pass is ONE map-side-combined shuffle per iteration,
  keyed on (cid, pos) — k×dim groups regardless of corpus size, and
  partial aggregation collapses each map task's contribution to at
  most k×dim rows before the exchange.
- The per-iteration driver collect is exactly k×dim averaged floats
  (the same bounded-dim collect as the IVF quantizer) — never the
  vectors.
- Iteration count is FIXED (a hyperparameter), so the loop runs a
  deterministic number of jobs and the result is exactly expressible
  as chained SQL CTEs — which is what the DuckDB oracle does.

Determinism contract (shared with the oracle): init centroids are the
vectors with the k smallest ids; updated centroid components round to
``round_dp`` decimals (double sums are order-sensitive at ~1e-15 —
rounding makes both engines agree; 6dp keeps the flip probability per
component around 1e-9 while distorting geometry not at all); empty
clusters keep their previous centroid; argmin ties break on the lower
cid. Distances are SQUARED L2 in pure double arithmetic, accumulated
in position order on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dist2(v, c):
    """Squared L2 between two array<double> columns, accumulated in
    position order (deterministic double arithmetic, matching the
    oracle's list_sum over list_transform)."""
    return F.aggregate(
        F.zip_with(v, c, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _centroid_literal(cents: list[tuple[int, list[float]]]):
    """k centroids as a plan literal: array<struct<cid:int,
    c:array<double>>>. k×dim literals — the broadcast-by-construction
    side of the assignment map."""
    return F.array(
        *[
            F.struct(
                F.lit(int(cid)).alias("cid"),
                F.array(*[F.lit(float(x)) for x in vec]).alias("c"),
            )
            for cid, vec in cents
        ]
    )


def assign_to_centroids(
    vectors: DataFrame, cents: list[tuple[int, list[float]]]
) -> DataFrame:
    """(vec_id, v, cid, dist2): each vector assigned to its nearest
    centroid (squared L2, ties to the lower cid). Completely narrow —
    the k distances and the argmin evaluate per-row inside one
    codegen stage; nothing shuffles."""
    best = F.array_min(
        F.transform(
            _centroid_literal(cents),
            lambda s: F.struct(
                _dist2(F.col("v"), s.c).alias("d"), s.cid.alias("cid")
            ),
        )
    )
    return vectors.withColumn("_b", best).select(
        "vec_id",
        "v",
        F.col("_b.cid").alias("cid"),
        F.col("_b.d").alias("dist2"),
    )


def lloyd_kmeans(
    vectors: DataFrame,
    k: int = 8,
    iterations: int = 3,
    round_dp: int = 6,
) -> DataFrame:
    """Fixed-iteration Lloyd k-means over (vec_id, embedding) rows.

    Returns (vec_id, cid, dist2) — the final assignment under the
    iteration-``iterations`` centroids, dist2 rounded to 4dp. Init
    centroids are the k smallest vec_ids' vectors (deterministic,
    oracle-expressible); see the module docstring for the full
    determinism contract and scale shape.
    """
    v = vectors.select(
        F.col("vec_id").cast("long").alias("vec_id"),
        F.col("embedding").cast("array<double>").alias("v"),
    )
    # Bounded collect: exactly k rows (the IVF-quantizer pattern).
    init = v.orderBy("vec_id").limit(k).collect()
    if len(init) < k:
        raise ValueError(f"need at least k={k} vectors, got {len(init)}")
    cents = [(i, list(r["v"])) for i, r in enumerate(init)]

    for _ in range(iterations):
        members = assign_to_centroids(v, cents)
        # ONE map-side-combined shuffle: k×dim groups total.
        sums = (
            members.select("cid", F.posexplode("v").alias("pos", "val"))
            .groupBy("cid", "pos")
            .agg(F.avg("val").alias("m"))
            .collect()
        )
        by_cid: dict[int, dict[int, float]] = {}
        for r in sums:
            by_cid.setdefault(r["cid"], {})[r["pos"]] = round(
                r["m"], round_dp
            )
        cents = [
            (
                cid,
                [by_cid[cid][p] for p in range(len(prev))]
                if cid in by_cid
                else prev,  # empty cluster keeps its centroid
            )
            for cid, prev in cents
        ]

    return assign_to_centroids(v, cents).select(
        "vec_id", "cid", F.round("dist2", 4).alias("dist2")
    )
