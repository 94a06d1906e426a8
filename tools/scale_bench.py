"""Two-cluster-size scaling evidence (north rule: throughput at N and
4N executors with scaling efficiency >= 0.8).

No real cluster exists in this sandbox, so — per the driver
instructions — the same job runs at two local parallelism levels
(local[8] standing in for N executors, local[32] for 4N) on identical
input, each in a fresh JVM (subprocess) so the level is actually
honored. Writes BENCH/BASELINE.md.

Usage: python tools/scale_bench.py [sf_dir] [replicate]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench(master: str, sf_dir: str, replicate: int) -> dict:
    out = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "bench.py"),
            "--master",
            master,
            "--sf-dir",
            sf_dir,
            "--replicate",
            str(replicate),
        ],
        capture_output=True,
        text=True,
        check=True,
        cwd=REPO,
    )
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    replicate = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    r8 = run_bench("local[8]", sf_dir, replicate)
    r32 = run_bench("local[32]", sf_dir, replicate)

    t8 = r8["queries"]["kg_extract_e2e"]
    t32 = r32["queries"]["kg_extract_e2e"]
    # Efficiency of the 4x scale-up: ideal is t32 == t8/4.
    efficiency = (t8 / t32) / 4.0
    tp8, tp32 = r8["value"], r32["value"]

    md = f"""# BENCH baseline — measured by tools/scale_bench.py

End-to-end KG extraction (classify → fan-out → tag → decode →
assemble) over transcripts derived from `{sf_dir}/documents.parquet`
(replicate={replicate}), identical input at two parallelism levels in
fresh JVMs. `local[8]` stands in for N executors and `local[32]` for
4N (no real cluster in this sandbox — per driver instructions).

| parallelism | turns | triples | e2e sec | triples/sec |
|---|---|---|---|---|
| local[8]  (N)  | {r8["n_turns"]} | {r8["n_triples"]} | {t8} | {tp8} |
| local[32] (4N) | {r32["n_turns"]} | {r32["n_triples"]} | {t32} | {tp32} |

**Scaling efficiency (N → 4N)** = (T_N / T_4N) / 4 =
({t8} / {t32}) / 4 = **{efficiency:.3f}** (target ≥ 0.8).

Throughput ratio 4N/N = {tp32 / tp8:.2f}x.

Reference baseline context (BASELINE.md): the reference publishes
quality only (single multi-GPU box, no throughput numbers); the
binding targets are triple P/R ≥ 0.95 vs reference-semantics goldens
(enforced by tests/test_evaluation.py) and the scaling efficiency
above.

Per-query seconds at local[32]:

```json
{json.dumps(r32["queries"], indent=2)}
```

Determinism: both runs produce identical triple counts
({r8["n_triples"]} == {r32["n_triples"]}: {r8["n_triples"] == r32["n_triples"]}).
"""
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)
    print(md)
    print(
        json.dumps(
            {
                "t8": t8,
                "t32": t32,
                "efficiency": round(efficiency, 3),
                "tp8": tp8,
                "tp32": tp32,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
