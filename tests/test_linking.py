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


# --- er_candidates ----------------------------------------------------------


def test_er_candidates_blocked_jaccard(spark):
    from information_extraction_spark.operators.linking import er_candidates

    rows = [
        # e1 and e2 share 2 of their union-of-3 slots -> jaccard 2/3
        ("c", 0, "e1", "p", "o1"),
        ("c", 1, "e1", "p", "o2"),
        ("c", 2, "e2", "p", "o1"),
        ("c", 3, "e2", "p", "o2"),
        ("c", 4, "e2", "q", "o3"),
        # e3 shares nothing discriminative
        ("c", 5, "e3", "q", "o9"),
    ]
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, subject string, predicate string,"
        " object string",
    )
    got = {
        (r["s1"], r["s2"]): (r["shared"], r["jaccard"])
        for r in er_candidates(df, tau=0.5).collect()
    }
    assert got == {("e1", "e2"): (2, 0.6667)}
    # tau above the pair's jaccard filters it out
    assert er_candidates(df, tau=0.7).count() == 0


def test_er_candidates_stop_slot_cap(spark):
    from information_extraction_spark.operators.linking import er_candidates

    # (p, hub) is asserted by 3 subjects; with max_slot_freq=2 it is a
    # stop-slot and leaves BOTH intersection and union, so e1/e2's
    # only remaining shared slot is (q, x): jaccard = 1/1 = 1.0 (each
    # has exactly one non-stop slot).
    rows = [
        ("c", 0, "e1", "p", "hub"),
        ("c", 1, "e2", "p", "hub"),
        ("c", 2, "e3", "p", "hub"),
        ("c", 3, "e1", "q", "x"),
        ("c", 4, "e2", "q", "x"),
    ]
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, subject string, predicate string,"
        " object string",
    )
    got = {
        (r["s1"], r["s2"]): (r["shared"], r["jaccard"])
        for r in er_candidates(df, tau=0.5, max_slot_freq=2).collect()
    }
    # e3's only slot was the stop-slot: it exits the universe entirely.
    assert got == {("e1", "e2"): (1, 1.0)}
    # Without the cap the hub slot counts: shared=2 of union 2 -> all
    # three pairs appear (e1-e3 and e2-e3 share 1 of 2 -> 0.5).
    got_all = {
        (r["s1"], r["s2"]) for r in er_candidates(df, tau=0.5).collect()
    }
    assert got_all == {("e1", "e2"), ("e1", "e3"), ("e2", "e3")}


# --- build_er_slot_index + er_probe -----------------------------------------


def test_er_probe_against_built_index(spark):
    from information_extraction_spark.operators.linking import (
        build_er_slot_index,
        er_probe,
    )

    schema = (
        "conv_id string, turn_idx int, subject string, predicate string,"
        " object string"
    )
    base = spark.createDataFrame(
        [
            ("c", 0, "b1", "p", "o1"),
            ("c", 1, "b1", "p", "o2"),
            ("c", 2, "b2", "q", "o9"),
            # (p, hub) hits 3 base subjects -> stop-slot at cap 2
            ("c", 3, "b1", "p", "hub"),
            ("c", 4, "b2", "p", "hub"),
            ("c", 5, "b3", "p", "hub"),
        ],
        schema,
    )
    new = spark.createDataFrame(
        [
            # n1 shares both of b1's non-stop slots -> jaccard 2/2=1.0
            ("d", 0, "n1", "p", "o1"),
            ("d", 1, "n1", "p", "o2"),
            # the stop slot must NOT create pairs or count in degrees
            ("d", 2, "n1", "p", "hub"),
            # n2 shares nothing non-stop
            ("d", 3, "n2", "p", "hub"),
        ],
        schema,
    )
    index, stop = build_er_slot_index(base, max_slot_freq=2)
    assert {(r["predicate"], r["object"]) for r in stop.collect()} == {
        ("p", "hub")
    }
    # b3's only slot was the stop slot: it leaves the index entirely.
    assert "b3" not in {r["subject"] for r in index.collect()}
    got = {
        (r["s_base"], r["s_new"]): (r["shared"], r["jaccard"])
        for r in er_probe(index, stop, new, tau=0.5).collect()
    }
    assert got == {("b1", "n1"): (2, 1.0)}
    # identity pairs are excluded even when surfaces coincide
    new_same = spark.createDataFrame([("d", 0, "b1", "p", "o1")], schema)
    assert er_probe(index, stop, new_same, tau=0.0).count() == 0


def test_apply_er_merge_rewrites_and_reaggregates(spark):
    from information_extraction_spark.operators.linking import apply_er_merge

    rows = [
        # e1/e2 jaccard 2/3 >= 0.5 -> one component, min member e1
        ("c1", 0, "e1", "p", "o1"),
        ("c1", 1, "e1", "p", "o2"),
        ("c2", 2, "e2", "p", "o1"),
        ("c2", 3, "e2", "p", "o2"),
        ("c2", 4, "e2", "q", "o3"),
        # e3 shares nothing -> stays itself
        ("c1", 5, "e3", "q", "o9"),
    ]
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, subject string, predicate string,"
        " object string",
    )
    got = {
        (r["subject"], r["predicate"], r["object"]): (
            r["support"],
            r["n_convs"],
            r["n_surfaces"],
        )
        for r in apply_er_merge(df, tau=0.5).collect()
    }
    assert got == {
        ("e1", "p", "o1"): (2, 2, 2),
        ("e1", "p", "o2"): (2, 2, 2),
        ("e1", "q", "o3"): (1, 1, 1),  # surface e2, canonical e1
        ("e3", "q", "o9"): (1, 1, 1),
    }


def test_apply_er_merge_transitive_chain(spark):
    from information_extraction_spark.operators.linking import apply_er_merge

    # a~b and b~c each meet tau, a~c does NOT (0 shared slots):
    # the CC closure must still fold all three into component "a".
    rows = [
        ("c", 0, "a", "p", "o1"),
        ("c", 1, "a", "p", "o2"),
        ("c", 2, "b", "p", "o1"),
        ("c", 3, "b", "p", "o2"),
        ("c", 4, "b", "q", "o3"),
        ("c", 5, "b", "q", "o4"),
        ("c", 6, "cc", "q", "o3"),
        ("c", 7, "cc", "q", "o4"),
    ]
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, subject string, predicate string,"
        " object string",
    )
    merged = apply_er_merge(df, tau=0.5).collect()
    assert {r["subject"] for r in merged} == {"a"}
    # 4 distinct slots survive, each folding its contributing surfaces
    by_slot = {
        (r["predicate"], r["object"]): r["n_surfaces"] for r in merged
    }
    assert by_slot == {
        ("p", "o1"): 2,
        ("p", "o2"): 2,
        ("q", "o3"): 2,
        ("q", "o4"): 2,
    }


def test_resource_alloc_scores_and_hub_cap(spark):
    """Hand graph: s1,s2 share objects oA (deg 2 -> 500000 ppm) and
    oB (deg 3 -> 333333 ppm); s2,s3 and s1,s3 share only oB; a hub
    object above the cap contributes nothing."""
    from information_extraction_spark.operators.linking import (
        resource_alloc_pairs,
    )
    from pyspark.sql import functions as F  # noqa: F401

    rows = [
        ("s1", "p", "oA"), ("s2", "p", "oA"),
        ("s1", "p", "oB"), ("s2", "q", "oB"), ("s3", "p", "oB"),
        # duplicate assertion must not double-count the edge:
        ("s1", "q", "oA"),
    ]
    # hub object shared by 5 subjects, cap at 4 -> excluded entirely.
    rows += [(f"s{i}", "p", "hub") for i in range(1, 6)]
    df = spark.createDataFrame(rows, "subject string, predicate string, object string")
    got = {
        (r["s1"], r["s2"]): (r["n_shared"], r["ra_ppm"])
        for r in resource_alloc_pairs(df, max_obj_deg=4).collect()
    }
    assert got == {
        ("s1", "s2"): (2, 500000 + 333333),
        ("s1", "s3"): (1, 333333),
        ("s2", "s3"): (1, 333333),
    }


def test_jaccard_neighbors_consistent_capped_universe(spark):
    """Degrees and pairs share the hub-capped edge set: dropping a
    hub shrinks BOTH intersection and union. Hand graph: N(s1) =
    {oA, oB}, N(s2) = {oA, oB, oC} -> J = 2/3; with a hub edge added
    to both, the capped score is UNCHANGED (the hub leaves the
    universe), while an uncapped run would score 3/4."""
    from information_extraction_spark.operators.linking import (
        jaccard_neighbor_pairs,
    )

    rows = [
        ("s1", "p", "oA"), ("s2", "p", "oA"),
        ("s1", "p", "oB"), ("s2", "p", "oB"),
        ("s2", "p", "oC"),
        # duplicate assertion: distinct() must collapse it.
        ("s1", "q", "oA"),
    ]
    rows += [(f"s{i}", "p", "hub") for i in range(1, 6)]
    df = spark.createDataFrame(
        rows, "subject string, predicate string, object string"
    )
    got = {
        (r["s1"], r["s2"]): (r["n_shared"], r["jaccard_ppm"])
        for r in jaccard_neighbor_pairs(df, max_obj_deg=4).collect()
    }
    # capped: d(s1)=2, d(s2)=3, shared=2 -> 2*1e6 div 3 = 666666.
    assert got[("s1", "s2")] == (2, 666666)
    # hub pairs (e.g. s3,s4) share ONLY the hub -> absent entirely.
    assert ("s3", "s4") not in got
    # uncapped control: hub joins the universe; s1,s2 now share 3 of
    # 4 -> 750000, and a hub-only pair (N = {hub} on both sides) is
    # a perfect match: union = 1, J = 1.
    unc = {
        (r["s1"], r["s2"]): (r["n_shared"], r["jaccard_ppm"])
        for r in jaccard_neighbor_pairs(df, max_obj_deg=100).collect()
    }
    assert unc[("s1", "s2")] == (3, 750000)
    assert unc[("s3", "s4")] == (1, 1000000)


def test_cc_two_phase_matches_hash_min_on_random_graphs(spark):
    """Large-star/small-star must produce byte-identical labels to
    connected_components on adversarial shapes: a long chain (worst
    case for hash-min), a star rooted at the LARGEST id, islands, and
    seeded random graphs with dup/self edges."""
    import random

    from information_extraction_spark.operators.linking import cc_two_phase

    cases = [
        [(f"n{i:02d}", f"n{i + 1:02d}") for i in range(12)],  # chain
        [("z", f"m{i}") for i in range(6)],  # star at max id
        [("b", "a"), ("b", "c"), ("x", "y"), ("q", "q")],  # islands+self
    ]
    rng = random.Random(7)
    for _ in range(3):
        n = 18
        cases.append(
            [
                (f"v{rng.randrange(n):02d}", f"v{rng.randrange(n):02d}")
                for _ in range(22)
            ]
        )
    for pairs in cases:
        e = _edges(spark, pairs)
        want = {
            r["node"]: r["component"]
            for r in connected_components(e).collect()
        }
        got = {
            r["node"]: r["component"] for r in cc_two_phase(e).collect()
        }
        # connected_components keeps self-loop-only nodes; cc_two_phase
        # drops self loops up front, so compare on the shared universe
        # after restoring those singletons.
        for k in set(want) - set(got):
            assert want[k] == k
            got[k] = k
        assert got == want


def test_sorted_neighborhood_window_and_normalization(spark):
    """A typo pair lands in different hash blocks but adjacent sort
    positions; normalization ignores case/punctuation; pairs appear
    only within window-1 sort positions; gap and lev are exact."""
    from information_extraction_spark.operators.linking import (
        sorted_neighborhood_pairs,
    )

    # normalized sort order: aaaa, aaab, mmmm, mmmn, zzzz
    ents = spark.createDataFrame(
        [("aaaa",), ("A.A-a b!",), ("mmmm",), ("mmmn",), ("zzzz",)],
        "e string",
    )
    got = {
        (r["ea"], r["eb"]): (r["gap"], r["lev"])
        for r in sorted_neighborhood_pairs(ents, window=3).collect()
    }
    # "A.A-a b!" normalizes to "aaab": sorts right after "aaaa".
    assert got[("aaaa", "A.A-a b!")] == (1, 7)
    assert got[("mmmm", "mmmn")][1] == 1
    # window=3 -> gaps 1..2 only; (aaaa, mmmn) is 3 apart -> absent.
    assert all(g in (1, 2) for g, _ in got.values())
    assert ("aaaa", "mmmn") not in got
    # every adjacent pair present: 4 gap-1 + 3 gap-2 pairs.
    assert len(got) == 7
