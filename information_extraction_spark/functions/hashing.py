"""Cross-engine-portable hashing: the 48-bit md5 prefix as a BIGINT.

Used wherever a query's DuckDB oracle must recompute the SAME hash
bit-for-bit (sketches, streaming sketch merges): Spark computes it
with conv(); DuckDB has no hex->int cast, so the SQL side expands the
base-16 positional sum digit by digit (the ta_split idiom).
"""

from __future__ import annotations

from pyspark.sql import functions as F

HEX_DIGITS = "0123456789abcdef"


def h48(col):
    """Spark side: first 12 hex digits of md5 as a long in [0, 2^48)."""
    return F.conv(F.substring(F.md5(col), 1, 12), 16, 10).cast("long")


def h48_sql(expr: str) -> str:
    """DuckDB side: identical 48-bit md5 prefix."""
    terms = [
        f"(strpos('{HEX_DIGITS}', substring(md5({expr}), {k}, 1)) - 1)"
        f" * {16 ** (12 - k)}"
        for k in range(1, 13)
    ]
    return "(" + " + ".join(terms) + ")"
