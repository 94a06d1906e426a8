"""Entity linking: connected components over alias chains +
canonicalization joins, and the salted-join helper."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from information_extraction_spark.functions.skew import salted_count, salted_join
from information_extraction_spark.operators.linking import (
    canonical_mapping,
    canonicalize_triples,
    connected_components,
)


def _edges(spark, pairs):
    return spark.createDataFrame(
        pd.DataFrame(pairs, columns=["src", "dst"])
    )


def test_connected_components_chain_and_islands(spark):
    """Chain a-b-c merges into one component (min member id); the
    isolated pair keeps its own."""
    comps = connected_components(
        _edges(spark, [("b", "a"), ("b", "c"), ("x", "y"), ("m", "m2")])
    )
    got = {r["node"]: r["component"] for r in comps.collect()}
    assert got == {
        "a": "a", "b": "a", "c": "a",
        "x": "x", "y": "x",
        "m": "m", "m2": "m",
    }


def test_connected_components_long_chain_converges(spark):
    """Forces the DISTRIBUTED hash-min loop (driver_threshold=0): a
    13-node chain needs multiple propagation iterations to converge —
    the case the iterative path must get right at >100k-edge scale."""
    n = 12
    pairs = [(f"n{i:02d}", f"n{i + 1:02d}") for i in range(n)]
    comps = connected_components(_edges(spark, pairs), driver_threshold=0)
    got = {r["node"]: r["component"] for r in comps.collect()}
    assert set(got.values()) == {"n00"}
    assert len(got) == n + 1


def test_canonicalize_triples_with_world_aliases(spark, world):
    mapping = canonical_mapping(
        spark.createDataFrame(world.alias_dict)
    ).collect()
    by_surface = {r["surface"]: r["canonical_id"] for r in mapping}
    # Chain entities must share a canonical id.
    chain_rows = world.alias_dict[
        world.alias_dict.alias.str.startswith(world.alias_dict.canonical.iloc[0][:1])
    ]
    # Head entity aliases (skew) all map to one id.
    head = world.alias_dict.canonical.value_counts().idxmax()
    head_aliases = world.alias_dict[world.alias_dict.canonical == head].alias
    head_ids = {by_surface[a] for a in head_aliases if a in by_surface}
    assert len(head_ids) == 1

    triples = spark.createDataFrame(
        pd.DataFrame(
            {
                "subject": [head_aliases.iloc[0], "unknown entity"],
                "predicate": ["rel00", "rel00"],
                "object": [head, "《另一个》"],
            }
        )
    )
    out = canonicalize_triples(
        triples, spark.createDataFrame(world.alias_dict)
    ).collect()
    rows = {r["subject"]: r for r in out}
    # Alias and canonical surface agree on one canonical id.
    assert (
        rows[head_aliases.iloc[0]]["subject_canonical"]
        == rows[head_aliases.iloc[0]]["object_canonical"]
    )
    # Unknown surfaces canonicalize to their normalized selves.
    assert rows["unknown entity"]["subject_canonical"] == "unknown entity"
    assert rows["unknown entity"]["object_canonical"] == "另一个"


def test_salted_join_matches_plain_join(spark):
    fact = spark.range(0, 1000).select(
        (F.col("id") % 7).cast("string").alias("k"), F.col("id").alias("v")
    )
    dim = spark.createDataFrame(
        pd.DataFrame({"k": [str(i) for i in range(7)], "name": [f"d{i}" for i in range(7)]})
    )
    plain = fact.join(dim, "k").groupBy("name").count()
    salted = salted_join(fact, dim, "k").groupBy("name").count()
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_count_matches_groupby(spark):
    df = spark.range(0, 5000).select((F.col("id") % 3).alias("k"))
    expected = sorted(map(tuple, df.groupBy("k").count().collect()))
    got = sorted(map(tuple, salted_count(df, ["k"]).collect()))
    assert got == expected


def test_cc_driver_and_distributed_paths_agree(spark):
    """The size-dispatched union-find must label identically to the
    distributed hash-min loop (forced via driver_threshold=0)."""
    pairs = [("b", "a"), ("b", "c"), ("x", "y"), ("m", "m2"),
             ("c", "d"), ("q", "b")]
    e = _edges(spark, pairs)
    fast = {(r["node"], r["component"])
            for r in connected_components(e).collect()}
    dist = {(r["node"], r["component"])
            for r in connected_components(e, driver_threshold=0).collect()}
    assert fast == dist and len(fast) > 0
