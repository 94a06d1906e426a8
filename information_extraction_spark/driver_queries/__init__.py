"""Driver-facing query catalog: one entry per implemented operator
from SURVEY.md §2, each with a DuckDB oracle (or rows-only for kernel
stages). Aggregated registry consumed by __spark_entry__.py."""

from __future__ import annotations

from information_extraction_spark.driver_queries import (
    core,
    core2,
    core3,
    kg,
    streamq,
    textdata,
)

_MODULES = (core, core2, core3, kg, streamq, textdata)

QUERIES = {}
ORACLES = {}
for mod in _MODULES:
    dup = set(QUERIES) & set(mod.QUERIES)
    # Disjointness is load-bearing: current_oracle() below resolves
    # names by module scan while these dicts resolve last-wins; a
    # duplicate registration would make the local checker and the
    # driver gate silently validate different SQL. A real raise (not
    # assert — stripped under python -O) so the guard always holds.
    if dup:
        raise ValueError(f"duplicate query names across modules: {dup}")
    QUERIES.update(mod.QUERIES)
    ORACLES.update(mod.ORACLES)


def current_oracle(name: str) -> str | None:
    """Live per-module oracle lookup. The aggregated ORACLES above is
    a snapshot taken at import; the flagship queries re-point their
    oracle SQL at the just-written per-sf golden when they run, so a
    checker that wants the post-run oracle must read it live."""
    for mod in _MODULES:
        if name in mod.ORACLES:
            return mod.ORACLES[name]
    return None
