"""Scale-up linearity evidence beyond sf0.1 (round-5 verdict #3).

All prior scaling claims were plan-shape arguments at <= 1.1M
triples; this tool measures them:

1. FLAGSHIP: bench.py --skip-queries at replicate 64 and 128 over
   sf0.1 (~1.6M and ~3.2M turns) in fresh subprocesses — wall-time
   ratio t(2x)/t(x) should be ~2 for a linear pipeline (ratios well
   under 2 mean fixed overhead still dominates; well over 2 is a
   found bug).
2. HEAVY CATALOG QUERIES: the 10 slowest BENCH_r04 entries run
   against sf0.1 and a deterministically DOUBLED corpus
   (documents + embeddings replicated with id offsets, per-replica
   text markers so the kernel memo cannot collapse duplicates,
   embedding[0] perturbed so ANN structure is not degenerate),
   warmup + best-of-2 each, with per-query max completed-stage
   shuffle write bytes and max single-task shuffle write bytes
   pulled from the Spark REST API — the number that decides whether
   a partition still fits an executor at the next scale-up.

Writes BENCH/SCALE.md. Run on an IDLE machine (same discipline as
tools/scale_bench.py).

Usage: python tools/scale_linearity.py [sf_dir] [--skip-flagship]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

HEAVY = [
    "a22_bh_fdr",
    "kg_wl_kernel",
    "kg_motif_census",
    "kg_betweenness",
    "ann_graph_search",
    "a14_hll_distinct",
    "kg_truth_discovery",
    "kg_pagerank",
    "kg_er_merge",
    "kg_provenance",
]

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def build_scaled(src: str, dst: str, factor: int) -> str:
    """Deterministic factor-x corpus: documents/embeddings replicated
    with id offsets (replica r gets ids + r*OFFSET) and a per-replica
    text marker (mirrors bench.py's replica discipline — byte-
    identical replicas collapse in the extraction memo and the run
    measures fixed overhead, not throughput)."""
    import duckdb

    os.makedirs(dst, exist_ok=True)
    offset = 10_000_000
    reps_docs = " UNION ALL ".join(
        f"SELECT doc_id + {r * offset} AS doc_id, "
        + ("text" if r == 0 else f"text || ' zq{r}'")
        + " AS text, lang, source, n_chars "
        f"FROM src"
        for r in range(factor)
    )
    duckdb.sql(
        f"""
        CREATE OR REPLACE VIEW src AS
        SELECT * FROM read_parquet('{src}/documents.parquet');
        COPY ({reps_docs}) TO '{dst}/documents.parquet' (FORMAT PARQUET)
        """
    )
    reps_emb = " UNION ALL ".join(
        f"SELECT vec_id + {r * offset} AS vec_id, "
        f"list_prepend(embedding[1] + {r} * 0.001, embedding[2:]) "
        "AS embedding, label FROM emb"
        for r in range(factor)
    )
    duckdb.sql(
        f"""
        CREATE OR REPLACE VIEW emb AS
        SELECT * FROM read_parquet('{src}/embeddings.parquet');
        COPY ({reps_emb}) TO '{dst}/embeddings.parquet' (FORMAT PARQUET)
        """
    )
    for t in TABLES:
        if t in ("documents", "embeddings"):
            continue
        d = os.path.join(dst, f"{t}.parquet")
        if not os.path.exists(d):
            try:
                os.link(os.path.join(src, f"{t}.parquet"), d)
            except OSError:
                import shutil

                shutil.copyfile(os.path.join(src, f"{t}.parquet"), d)
    return dst


def flagship_pair(sf_dir: str) -> dict:
    out = {}
    for rep in (64, 128):
        cmd = [
            sys.executable, os.path.join(REPO, "bench.py"),
            "--sf-dir", sf_dir, "--replicate", str(rep),
            "--skip-queries",
        ]
        r = subprocess.run(
            cmd, capture_output=True, text=True, check=True, cwd=REPO
        )
        line = [x for x in r.stdout.splitlines() if x.startswith("{")][-1]
        d = json.loads(line)
        out[rep] = {
            "n_turns": d["n_turns"],
            "n_triples": d["n_triples"],
            "e2e_best_sec": d["queries"]["kg_extract_e2e"],
            "e2e_median_sec": d.get("e2e_median_sec"),
            "triples_per_sec": d["value"],
            "steal_pct": (d.get("host_e2e") or {}).get("steal_pct"),
        }
    out["ratio_best"] = round(
        out[128]["e2e_best_sec"] / out[64]["e2e_best_sec"], 3
    )
    out["ratio_median"] = round(
        out[128]["e2e_median_sec"] / out[64]["e2e_median_sec"], 3
    )
    return out


def _rest(app_base: str, path: str):
    with urllib.request.urlopen(app_base + path, timeout=10) as r:
        return json.loads(r.read())


def _stage_window(app_base: str):
    try:
        stages = _rest(app_base, "/stages?status=complete")
        return {(s["stageId"], s["attemptId"]) for s in stages}, stages
    except Exception:
        return set(), []


def _shuffle_stats(app_base: str, before: set) -> dict:
    """Max completed-stage shuffle write bytes and max single-task
    shuffle write bytes among stages completed since ``before``."""
    seen, stages = _stage_window(app_base)
    new = [
        s for s in stages if (s["stageId"], s["attemptId"]) not in before
    ]
    max_stage = max((s.get("shuffleWriteBytes", 0) for s in new), default=0)
    max_task = 0
    top = sorted(
        new, key=lambda s: s.get("shuffleWriteBytes", 0), reverse=True
    )[:3]
    for s in top:
        try:
            summ = _rest(
                app_base,
                f"/stages/{s['stageId']}/{s['attemptId']}/taskSummary"
                "?quantiles=1.0",
            )
            max_task = max(
                max_task,
                int(summ.get("shuffleWriteMetrics", {}).get(
                    "writeBytes", [0])[-1]),
            )
        except Exception:
            pass
    return {
        "max_stage_shuffle_write_bytes": int(max_stage),
        "max_task_shuffle_write_bytes": int(max_task),
    }


def heavy_pair(sf_dir: str, scaled_dir: str) -> dict:
    from information_extraction_spark.driver_queries import QUERIES
    from information_extraction_spark.session import get_spark

    spark = get_spark(
        app_name="scale-linearity",
        extra_conf={"spark.ui.enabled": "true"},
    )
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    app_base = f"{ui}/api/v1/applications/{app_id}"
    out: dict[str, dict] = {}
    for name in HEAVY:
        fn = QUERIES[name]
        row: dict = {}
        for tag, d in (("x1", sf_dir), ("x2", scaled_dir)):
            fn(spark, d).count()  # warmup (includes golden materialize)
            best = 1e18
            before, _ = _stage_window(app_base)
            for _ in range(2):
                t0 = time.time()
                fn(spark, d).count()
                best = min(best, time.time() - t0)
            row[f"t_{tag}"] = round(best, 3)
            row[f"shuffle_{tag}"] = _shuffle_stats(app_base, before)
        row["ratio"] = round(row["t_x2"] / row["t_x1"], 3)
        out[name] = row
        print(f"{name}: x1={row['t_x1']}s x2={row['t_x2']}s "
              f"ratio={row['ratio']}", flush=True)
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    skip_flagship = "--skip-flagship" in sys.argv
    scaled = build_scaled(sf_dir, "/tmp/ie_scale_x2", 2)
    res: dict = {"sf_dir": sf_dir, "scaled_dir": scaled}
    if not skip_flagship:
        res["flagship"] = flagship_pair(sf_dir)
    res["heavy"] = heavy_pair(sf_dir, scaled)

    lines = [
        "# Scale-up linearity (round 5, verdict #3)",
        "",
        "Method: flagship e2e at replicate 64 vs 128 (fresh "
        "subprocesses, bench.py methodology); 10 heaviest catalog "
        "queries at sf0.1 vs a deterministically doubled corpus "
        "(id-offset replicas, per-replica text markers, perturbed "
        "embeddings), warmup + best-of-2, shuffle maxima from the "
        "Spark REST API. Linear = ratio ~2; superlinear (>2.4) is a "
        "found bug.",
        "",
    ]
    if "flagship" in res:
        f = res["flagship"]
        lines += [
            "## Flagship e2e",
            "",
            "| replicate | turns | triples | best (s) | median (s) | "
            "triples/s | steal% |",
            "|---|---|---|---|---|---|---|",
        ]
        for rep in (64, 128):
            d = f[rep]
            lines.append(
                f"| {rep} | {d['n_turns']} | {d['n_triples']} | "
                f"{d['e2e_best_sec']} | {d['e2e_median_sec']} | "
                f"{d['triples_per_sec']} | {d['steal_pct']} |"
            )
        lines += [
            "",
            f"2x input ratio: best {f['ratio_best']}, median "
            f"{f['ratio_median']} (linear = 2.0; < 2 means fixed "
            "overhead still amortizing).",
            "",
        ]
    lines += [
        "## Heavy catalog queries (x1 = sf0.1, x2 = doubled)",
        "",
        "| query | t_x1 (s) | t_x2 (s) | ratio | max stage shuffle "
        "x2 (MB) | max task shuffle x2 (MB) |",
        "|---|---|---|---|---|---|",
    ]
    for name, row in res["heavy"].items():
        sx2 = row["shuffle_x2"]
        lines.append(
            f"| {name} | {row['t_x1']} | {row['t_x2']} | {row['ratio']} "
            f"| {sx2['max_stage_shuffle_write_bytes'] / 1e6:.1f} "
            f"| {sx2['max_task_shuffle_write_bytes'] / 1e6:.2f} |"
        )
    worst = max(res["heavy"].values(), key=lambda r: r["ratio"])
    lines += [
        "",
        f"Worst ratio: {worst['ratio']}. JSON: see SCALE.json next to "
        "this file.",
        "",
    ]
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "SCALE.md"), "w") as fh:
        fh.write("\n".join(lines))
    with open(os.path.join(REPO, "BENCH", "SCALE.json"), "w") as fh:
        json.dump(res, fh, indent=1)
    print(json.dumps({"worst_heavy_ratio": worst["ratio"]}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
