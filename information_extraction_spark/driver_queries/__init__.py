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

QUERIES = {}
ORACLES = {}
for mod in (core, core2, core3, kg, streamq, textdata):
    QUERIES.update(mod.QUERIES)
    ORACLES.update(mod.ORACLES)
