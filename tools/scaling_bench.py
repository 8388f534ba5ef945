"""Two-parallelism scaling evidence for the north_rule criterion.

A real multi-node cluster is unavailable in this sandbox, so the N -> 4N
executor criterion is evidenced by running the SAME job (bench.py headline)
at local[8] and local[32] on identical input, per BASELINE.md.  Each level
runs in its own subprocess (a JVM's master is fixed at startup).

Writes BENCH/BASELINE.md with docs/sec at both levels and
scaling_efficiency = (throughput_32 / throughput_8) / 4.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_level(cores: int, sf_dir: str) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cores), SPARK_GRAFT_SF_DIR=sf_dir)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=3600,
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    lo = run_level(8, sf_dir)
    hi = run_level(32, sf_dir)
    eff = (hi["value"] / lo["value"]) / 4 if lo["value"] else 0.0
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    md = f"""# BENCH/BASELINE.md — measured scaling evidence

Same job (bench.py headline: PIP join + tile rollup), same input
({sf_dir}), two parallelism levels (sandbox proxy for N vs 4N executors
per BASELINE.md):

| level | cores | docs/sec (headline) | headline sec | total sec |
|---|---|---|---|---|
| N  | 8  | {lo['value']} | {lo['queries']['pip_tile']} | {lo['total_sec']} |
| 4N | 32 | {hi['value']} | {hi['queries']['pip_tile']} | {hi['total_sec']} |

**scaling_efficiency = (docs_per_sec_32 / docs_per_sec_8) / 4 =
{eff:.3f}** (target >= 0.8 per BASELINE.json north_rule).

Per-query seconds:

| query | local[8] | local[32] |
|---|---|---|
""" + "\n".join(
        f"| {q} | {lo['queries'].get(q, '-')} | {hi['queries'].get(q, '-')} |"
        for q in lo["queries"]
    ) + "\n"
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)
    print(json.dumps({"eff": round(eff, 3), "n8": lo["value"], "n32": hi["value"]}))


if __name__ == "__main__":
    main()
