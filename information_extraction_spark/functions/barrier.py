"""Named Catalyst optimizer barrier.

``pushdown_barrier(cond)`` returns ``cond`` OR-ed with a
constant-FALSE disjunct built on ``F.rand`` — which Catalyst marks
NONDETERMINISTIC. That taints the WHOLE predicate: a nondeterministic
filter cannot be pushed past a join or project (PushDownPredicate's
``deterministic`` guard — a documented cross-version CONTRACT, since
reordering a nondeterministic expression changes semantics), and a
disjunction, unlike a conjunction, cannot be split to push its
deterministic part alone.

That last point is the load-bearing subtlety: the naive barrier
``(rand() >= -1) AND cond`` does NOT work — Catalyst splits
conjunctions and pushes each deterministic conjunct independently,
so ``cond`` lands in the join condition anyway (observed on Spark
4.1; verified by tests/test_aqe_skew.py's plan assertion, which is
why this helper exists as NAMED code instead of an inline trick).

Use it when a filter is EXPENSIVE and must run only on the survivors
of earlier cheap predicates (e.g. a per-pair ``array_intersect``
jaccard that must not be folded into a join condition where it would
evaluate on every candidate pair). ``floor(rand(seed))`` is always
``0`` and seeded for reproducibility across task retries; the
disjunct costs one PRNG draw per row reaching the filter.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def pushdown_barrier(cond: Column, seed: int = 0) -> Column:
    """``cond``, pinned at its written plan position (see module
    docstring). ``floor(rand(seed)) > 0`` is constant-false, so the
    disjunction is value-identical to ``cond``."""
    return cond | (F.floor(F.rand(seed=seed)) > F.lit(0))
