"""Build a NULL-injected copy of a testdata sf dir for the
NULL-contract robustness sweep (round-4 finding, made durable in
round 5: the ad-hoc /tmp corpus evaporated between sessions).

Every table is hardlink/copied unchanged except ``documents``, which
gets a deterministic fraction of NULLs injected into the
contract-nullable columns the catalog actually branches on:

- ``text``    NULL on doc_id % 50 == 7   (2%)
- ``lang``    NULL on doc_id % 50 == 11  (2%)
- ``n_chars`` NULL on doc_id % 50 == 23  (2%)
- ``source``  NULL on doc_id % 50 == 31  (2%)

Deterministic (keyed on doc_id, no RNG) so both engines and every
rerun see the identical corpus.

Usage: python tools/make_null_corpus.py [src_sf_dir] [dst_dir]
       (defaults: /root/testdata/sf0.001 -> /tmp/nullsf0.001)
"""

from __future__ import annotations

import os
import shutil
import sys

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def build(src: str, dst: str) -> str:
    os.makedirs(dst, exist_ok=True)
    for t in TABLES:
        s = os.path.join(src, f"{t}.parquet")
        d = os.path.join(dst, f"{t}.parquet")
        if t == "documents":
            duckdb.sql(
                f"""
                COPY (
                  SELECT doc_id,
                         CASE WHEN doc_id % 50 = 7  THEN NULL ELSE text END
                           AS text,
                         CASE WHEN doc_id % 50 = 11 THEN NULL ELSE lang END
                           AS lang,
                         CASE WHEN doc_id % 50 = 31 THEN NULL
                              ELSE source END AS source,
                         CASE WHEN doc_id % 50 = 23 THEN NULL
                              ELSE n_chars END AS n_chars
                  FROM '{s}'
                ) TO '{d}' (FORMAT PARQUET)
                """
            )
        else:
            if os.path.exists(d):
                os.remove(d)
            try:
                os.link(s, d)
            except OSError:
                shutil.copyfile(s, d)
    return dst


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/nullsf0.001"
    print(build(src, dst))
