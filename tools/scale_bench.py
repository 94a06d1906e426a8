"""Two-cluster-size scaling evidence (north rule: throughput at N and
4N executors with scaling efficiency >= 0.8).

No real cluster exists in this sandbox, so — per the driver
instructions — the same job runs at two parallelism levels on
identical input. Crucially, each run is pinned to a CPU set with
``taskset`` (N cores vs 4N cores for the WHOLE process tree): a bare
``local[N]`` caps only task slots, while the JVM's shuffle/Arrow/GC
helper threads spill onto extra cores — flattering the small-N run
and understating true scaling. Affinity pinning is the faithful
stand-in for "a cluster with N total cores".

Each bench run warms up with a full untimed pipeline pass (every
Python worker pays ~1s of pandas/pyarrow import on its first task)
and reads a pre-materialized transcripts parquet table.

Writes BENCH/BASELINE.md.

Usage: python tools/scale_bench.py [sf_dir] [replicate] [N] [N4]
       (defaults: $SPARK_GRAFT_SF_DIR, 4, 2, 8)
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench(
    cpus: int, sf_dir: str, replicate: int, skip_queries: bool = False
) -> dict:
    cmd = [
        sys.executable,
        os.path.join(REPO, "bench.py"),
        "--master",
        f"local[{cpus}]",
        "--sf-dir",
        sf_dir,
        "--replicate",
        str(replicate),
    ]
    if skip_queries:
        cmd.append("--skip-queries")
    if shutil.which("taskset"):
        cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
    out = subprocess.run(
        cmd, capture_output=True, text=True, check=True, cwd=REPO
    )
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    # replicate=16 sizes the timed region (~90s at N cores) so fixed
    # driver/JVM costs (~2s: job submission, broadcast, Arrow spin-up)
    # amortize — exactly as they would on a real cluster where a job
    # runs minutes, not seconds. Measuring scaling on a 5-second job
    # mostly measures that constant.
    replicate = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    n4 = int(sys.argv[4]) if len(sys.argv) > 4 else 4 * n

    # Efficiency is a RATIO, so it must be computed within an
    # adjacent (N, 4N) pair — this VM's throughput drifts over minutes
    # (shared tenancy), and mixing samples from different epochs
    # biases the ratio (observed swings 0.74-1.10 for identical code,
    # including a spurious super-linear pair from a degraded N
    # sample). Three back-to-back pairs are measured and the MEDIAN
    # pair reported; all pairs are listed in the output for honesty.
    pairs = []
    r_4n_full = None
    for trial in range(3):
        r_n_i = run_bench(n, sf_dir, replicate, skip_queries=True)
        # skip_queries on EVERY leg since round 5: bench.py now times
        # the whole 281-query catalog, which at a pinned 8 cores is
        # an hour of work irrelevant to the N->4N e2e scaling ratio;
        # full-catalog timings live in the unpinned bench JSON
        # (BENCH_r{N}.json / BENCH/R5_LOCAL.json).
        r_4n_i = run_bench(n4, sf_dir, replicate, skip_queries=True)
        if r_4n_full is None:
            r_4n_full = r_4n_i
        pairs.append((r_n_i, r_4n_i))

    def pair_eff(p):
        return (
            p[0]["queries"]["kg_extract_e2e"]
            / p[1]["queries"]["kg_extract_e2e"]
        ) / (n4 / n)

    ranked = sorted(pairs, key=pair_eff)
    all_effs = [round(pair_eff(p), 3) for p in ranked]
    # Per-pair evidence: each bench run samples /proc/stat steal% over
    # its own e2e window, so a noise-degraded pair is attributable
    # inline instead of needing post-hoc adjudication.
    pair_evidence = [
        {
            "t_n": p[0]["queries"]["kg_extract_e2e"],
            "t_4n": p[1]["queries"]["kg_extract_e2e"],
            "eff": round(pair_eff(p), 3),
            # `host_e2e` can be present-but-null (unreadable /proc/stat)
            # — `or {}` guards the value, not just the key.
            "steal_n_pct": (p[0].get("host_e2e") or {}).get("steal_pct"),
            "steal_4n_pct": (p[1].get("host_e2e") or {}).get("steal_pct"),
        }
        for p in pairs
    ]
    # The median pair's numbers are reported AS MEASURED — never
    # stitched with samples from another trial (ADVICE r01: the old
    # merge presented trial-0 per-query timings under the median
    # pair's headline). Trial 0's full query sweep is listed
    # separately, labeled with its provenance.
    r_n, r_4n = ranked[len(ranked) // 2]

    t_n = r_n["queries"]["kg_extract_e2e"]
    t_4n = r_4n["queries"]["kg_extract_e2e"]
    efficiency = (t_n / t_4n) / (n4 / n)
    tp_n, tp_4n = r_n["value"], r_4n["value"]

    md = f"""# BENCH baseline — measured by tools/scale_bench.py

End-to-end KG extraction (classify → fan-out → tag+decode →
assemble) over a pre-materialized transcripts table derived from
`{sf_dir}/documents.parquet` (replicate={replicate}), identical input
at two cluster sizes in fresh JVMs. Each run is PINNED with
`taskset` to its core budget ({n} vs {n4} cores for the whole
process tree — JVM helpers included), the faithful local stand-in
for N vs 4N executors (no real cluster in this sandbox, per driver
instructions). Warmup = one full untimed pipeline pass so every
Python worker has paid its import cost before timing.

| cluster size | turns | triples | e2e sec | triples/sec |
|---|---|---|---|---|
| {n} cores (N)   | {r_n["n_turns"]} | {r_n["n_triples"]} | {t_n} | {tp_n} |
| {n4} cores (4N) | {r_4n["n_turns"]} | {r_4n["n_triples"]} | {t_4n} | {tp_4n} |

**Scaling efficiency (N → 4N)** = (T_N / T_4N) / {n4 // n} =
({t_n} / {t_4n}) / {n4 // n} = **{efficiency:.3f}** (target ≥ 0.8).

Median of three back-to-back (N, 4N) pairs; all pair efficiencies
this run: {all_effs} (shared-VM drift makes any single pair
unreliable — one degraded-N sample even reads super-linear).

Per-pair evidence (in measurement order; steal% sampled from
/proc/stat over each run's own e2e window, so a degraded pair is
attributable inline):

```json
{json.dumps(pair_evidence, indent=2)}
```

Environment control: a pure-CPU multiprocessing burn on this VM
scales at ~0.89-0.93 efficiency over the same core range (VM
frequency/noise ceiling); the extraction kernels alone measure 0.93
(2→8 procs) outside Spark.

Reference baseline context (BASELINE.md): the reference publishes
quality numbers only (single multi-GPU box, no throughput); the
binding targets are triple P/R ≥ 0.95 vs reference-semantics goldens
(enforced by tests/test_evaluation.py) and the scaling efficiency
above.

Per-query e2e seconds at {n4} cores (trial 0; since round 5 the
scaling legs run --skip-queries — full-catalog per-query timings
live in the unpinned bench JSON, BENCH_r{{N}}.json / BENCH/R5_LOCAL.json):

```json
{json.dumps(r_4n_full["queries"], indent=2)}
```

Determinism: both runs produce identical triple counts
({r_n["n_triples"]} == {r_4n["n_triples"]}:
{r_n["n_triples"] == r_4n["n_triples"]}).
"""
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)
    print(md)
    print(
        json.dumps(
            {
                "t_n": t_n,
                "t_4n": t_4n,
                "efficiency": round(efficiency, 3),
                "tp_n": tp_n,
                "tp_4n": tp_4n,
                "n": n,
                "n4": n4,
                "pairs": pair_evidence,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
