"""Randomized brute-force parity for the consolidation operators
(resolve_functional, infer_entity_types, triple_provenance,
predicate_profile, er_candidates): one seeded corpus with tiny
alphabets so collisions, multi-object slots, and exact ties all
actually occur, checked row-exactly against independent pure-Python
implementations. Complements test_graph/test_linking's hand-built
cases with breadth (hundreds of groups per run, deterministic)."""

from __future__ import annotations

from collections import Counter, defaultdict
from decimal import ROUND_HALF_UP, Decimal

import numpy as np
import pytest


def _round4(x: float) -> float:
    """Spark's round(col, 4) on DOUBLE: BigDecimal.valueOf(double)
    (shortest decimal repr) then HALF_UP — mirrored via repr()."""
    return float(Decimal(repr(float(x))).quantize(Decimal("0.0001"), ROUND_HALF_UP))


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.RandomState(7)
    rows = []
    for i in range(700):
        rows.append(
            (
                f"c{rng.randint(12)}",                 # conv_id
                int(rng.randint(20)),                   # turn_idx
                f"s{rng.randint(15)}",                  # subject
                f"p{rng.randint(4)}",                   # predicate
                f"o{rng.randint(6)}",                   # object
                f"T{rng.randint(3)}",                   # subject_type
                f"U{rng.randint(2)}",                   # object_type
            )
        )
    return rows


@pytest.fixture(scope="module")
def corpus_df(spark, corpus):
    return spark.createDataFrame(
        corpus,
        "conv_id string, turn_idx int, subject string, predicate string,"
        " object string, subject_type string, object_type string",
    ).cache()


def test_resolve_functional_brute_force(corpus, corpus_df):
    from information_extraction_spark.operators.graph import (
        resolve_functional,
    )

    sup: dict = defaultdict(lambda: [0, set(), None])
    for c, t, s, p, o, *_ in corpus:
        e = sup[(s, p, o)]
        e[0] += 1
        e[1].add(c)
    slots: dict = defaultdict(list)
    for (s, p, o), (n, convs, _) in sup.items():
        slots[(s, p)].append((n, len(convs), o))
    want = {}
    for (s, p), cands in slots.items():
        best = max(cands)  # (support, n_convs, object) tuple order
        total = sum(c[0] for c in cands)
        want[(s, p)] = (
            best[2],
            best[0],
            best[1],
            len(cands),
            _round4(best[0] / total),
        )
    got = {
        (r["subject"], r["predicate"]): (
            r["object"],
            r["support"],
            r["n_convs"],
            r["n_candidates"],
            r["confidence"],
        )
        for r in resolve_functional(corpus_df).collect()
    }
    assert got == want
    # the corpus must actually exercise multi-object slots and ties
    assert any(v[3] > 1 for v in want.values())


def test_infer_entity_types_brute_force(corpus, corpus_df):
    from information_extraction_spark.operators.graph import (
        infer_entity_types,
    )

    votes: dict = defaultdict(Counter)
    for c, t, s, p, o, st_, ot in corpus:
        votes[s][st_] += 1
        votes[o][ot] += 1
    want = {}
    for e, cnt in votes.items():
        best = max((n, ty) for ty, n in cnt.items())
        total = sum(cnt.values())
        want[e] = (best[1], best[0], total, len(cnt), _round4(best[0] / total))
    got = {
        r["entity"]: (
            r["etype"],
            r["votes"],
            r["n_votes"],
            r["n_types"],
            r["share"],
        )
        for r in infer_entity_types(corpus_df).collect()
    }
    assert got == want
    assert any(v[3] > 1 for v in want.values())


def test_triple_provenance_brute_force(corpus, corpus_df):
    from information_extraction_spark.operators.graph import (
        triple_provenance,
    )

    ev: dict = defaultdict(list)
    for c, t, s, p, o, *_ in corpus:
        ev[(s, p, o)].append("%s#%010d" % (c, t))
    want = {
        k: (len(v), "|".join(sorted(v)[:3])) for k, v in ev.items()
    }
    got = {
        (r["subject"], r["predicate"], r["object"]): (
            r["n_evidence"],
            r["evidence"],
        )
        for r in triple_provenance(corpus_df, k=3).collect()
    }
    assert got == want
    assert any(v[0] > 3 for v in want.values())  # the cap binds somewhere


def test_predicate_profile_brute_force(corpus, corpus_df):
    from information_extraction_spark.operators.graph import (
        predicate_profile,
    )

    sup = Counter(
        (s, p, o, st_, ot) for c, t, s, p, o, st_, ot in corpus
    )
    by_slot: dict = defaultdict(list)
    for (s, p, o, st_, ot), n in sup.items():
        by_slot[(p, st_, ot)].append((s, o, n))
    want = {}
    for k, triples in by_slot.items():
        n_subj = len({s for s, o, n in triples})
        want[k] = (
            sum(n for *_, n in triples),
            len(triples),
            n_subj,
            len({o for s, o, n in triples}),
            _round4(len(triples) / n_subj),
        )
    got = {
        (r["predicate"], r["subject_type"], r["object_type"]): (
            r["n_assertions"],
            r["n_triples"],
            r["n_subjects"],
            r["n_objects"],
            r["functionality"],
        )
        for r in predicate_profile(corpus_df).collect()
    }
    assert got == want


def test_er_candidates_brute_force(corpus, corpus_df):
    from information_extraction_spark.operators.linking import (
        er_candidates,
    )

    # cap=12 keeps 82/301 slots (the cap binds) and tau=0.3 passes 85
    # of 103 blocked pairs (the threshold binds) on this seed.
    cap, tau = 12, 0.3
    slots = {(s, p, o) for c, t, s, p, o, *_ in corpus}
    freq = Counter((p, o) for s, p, o in slots)
    kept = {(s, p, o) for s, p, o in slots if freq[(p, o)] <= cap}
    by_subj: dict = defaultdict(set)
    for s, p, o in kept:
        by_subj[s].add((p, o))
    want = {}
    subjects = sorted(by_subj)
    for i, s1 in enumerate(subjects):
        for s2 in subjects[i + 1 :]:
            shared = len(by_subj[s1] & by_subj[s2])
            if not shared:
                continue
            jac = _round4(
                shared / (len(by_subj[s1]) + len(by_subj[s2]) - shared)
            )
            if jac >= tau:
                want[(s1, s2)] = (shared, jac)
    got = {
        (r["s1"], r["s2"]): (r["shared"], r["jaccard"])
        for r in er_candidates(
            corpus_df, tau=tau, max_slot_freq=cap
        ).collect()
    }
    assert got == want
    # the cap must actually drop slots and the threshold must filter
    assert len(kept) < len(slots)
    assert want
