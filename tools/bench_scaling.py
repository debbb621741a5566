"""Two-parallelism scaling run (the north rule's N -> 4N evidence).

Runs bench.py's headline suite at local[8] and local[32] in separate JVMs
(fresh SparkSession each), computes throughput at both and scaling
efficiency, and rewrites BENCH/BASELINE.md.

Efficiency definition: with fixed input (strong scaling),
  eff = (T_N / T_4N) / 4
i.e. perfect 4x speedup -> 1.0; >= 0.8 passes the north rule.
For suites dominated by fixed overheads at tiny scale we also report the
per-query breakdown so the scalable fraction is visible.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_at(cpus: int, sf_dir: str) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus), SPARK_GRAFT_SF_DIR=sf_dir)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        timeout=3600,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    lo, hi = 8, 32
    r_lo = run_at(lo, sf_dir)
    r_hi = run_at(hi, sf_dir)
    speedup = r_lo["value"] / r_hi["value"] if r_hi["value"] else float("nan")
    eff = speedup / (hi / lo)
    lines = [
        "# BENCH/BASELINE — measured scaling evidence",
        "",
        f"Input: `{sf_dir}` (fixed input, strong scaling), headline suite of",
        f"{len(r_lo['queries'])} queries (see `bench.py`). Sandbox stand-in for",
        "N vs 4N executors: same job at `local[8]` vs `local[32]`.",
        "",
        "| parallelism | suite sec | output rows | rows/sec |",
        "|---|---|---|---|",
        f"| local[{lo}] (N) | {r_lo['value']} | {r_lo['output_rows']} | {r_lo['throughput_rows_per_sec']} |",
        f"| local[{hi}] (4N) | {r_hi['value']} | {r_hi['output_rows']} | {r_hi['throughput_rows_per_sec']} |",
        "",
        f"**Speedup N->4N: {speedup:.2f}x; scaling efficiency: {eff:.2f}**",
        "(eff = speedup / 4; >= 0.8 meets the north rule at this scale;",
        "fixed JVM/session overheads dominate small-SF runs — per-query",
        "breakdown below shows the data-bound fraction).",
        "",
        "| query | sec @N | sec @4N | speedup |",
        "|---|---|---|---|",
    ]
    for q in r_lo["queries"]:
        a, b = r_lo["queries"][q], r_hi["queries"][q]
        sp = a / b if b else float("nan")
        lines.append(f"| {q} | {a} | {b} | {sp:.2f}x |")
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print(json.dumps({"eff": eff, "speedup": speedup, "lo": r_lo, "hi": r_hi}))


if __name__ == "__main__":
    main()
