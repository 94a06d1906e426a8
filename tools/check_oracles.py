"""Local mimic of the driver's correctness gate: run every
queries()/oracle_sql() pair at a given sf dir, compare row count,
schema (sorted column names), and order-insensitive values.

Usage: python tools/check_oracles.py [sf_dir] [name_filter...]
                                     [--skip=substr ...]

--skip excludes queries whose name contains the substring — for
oracle-scale limitations (e.g. dd_dup_clusters' all-pairs recursive
closure oracle is exponential-ish at sf0.1 while the engine side
runs in seconds; skip it there and value-check it at sf0.001/0.01).
"""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _canon(pdf: pd.DataFrame) -> list[tuple]:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)

    def conv(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return None
        if isinstance(v, float):
            return round(v, 9)
        if hasattr(v, "item"):
            v = v.item()
            if isinstance(v, float):
                return round(v, 9)
        return v

    rows = [tuple(conv(v) for v in row) for row in pdf.itertuples(index=False)]
    return sorted(rows, key=lambda r: tuple(str(x) for x in r))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    skips = [
        a.split("=", 1)[1] for a in sys.argv[2:] if a.startswith("--skip=")
    ]
    filters = [a for a in sys.argv[2:] if not a.startswith("--skip=")]

    from information_extraction_spark.driver_queries import (
        QUERIES,
        current_oracle,
    )
    from information_extraction_spark.session import get_spark

    spark = get_spark(app_name="oracle-check", master="local[8]")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )

    import time

    failures = 0
    for name, fn in sorted(QUERIES.items()):
        if filters and not any(f in name for f in filters):
            continue
        if any(s in name for s in skips):
            print(f"skip {name} (--skip)")
            continue
        t0 = time.time()
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failures += 1
            continue
        # Resolve golden-based oracles through the PURE (name, sf_dir)
        # template — call-order independent since round 5. The query
        # still runs first because executing the oracle needs the
        # golden parquet the Spark query materializes.
        oracle = current_oracle(name, sf_dir)
        if oracle is not None and "ie_spark_golden" in oracle:
            import re as _re

            missing = [
                p
                for p in _re.findall(r"read_parquet\('([^']+)/\*", oracle)
                if not os.path.isdir(p)
            ]
            if missing:
                print(
                    f"FAIL {name}: golden parquet absent at "
                    f"{missing[0]} — run the Spark query first (it "
                    f"materializes the golden for this sf_dir)"
                )
                failures += 1
                continue
        if oracle is None:
            print(
                f"ok   {name}: rows-only ({len(got)} rows)"
                f" [{time.time() - t0:.1f}s]"
            )
            continue
        try:
            exp = con.execute(oracle).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {str(e).splitlines()[0]}")
            failures += 1
            continue
        problems = []
        if len(got) != len(exp):
            problems.append(f"row count {len(got)} vs {len(exp)}")
        if sorted(got.columns) != sorted(exp.columns):
            problems.append(
                f"columns {sorted(got.columns)} vs {sorted(exp.columns)}"
            )
        if not problems:
            g, e = _canon(got), _canon(exp)
            if g != e:
                diff = [
                    (a, b) for a, b in zip(g, e) if a != b
                ][:3]
                problems.append(f"values differ, e.g. {diff}")
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)}")
            failures += 1
        else:
            print(
                f"ok   {name}: {len(got)} rows match oracle"
                f" [{time.time() - t0:.1f}s]"
            )
    print(f"\n{failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
