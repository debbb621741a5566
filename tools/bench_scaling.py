"""Two-parallelism scaling run (the north rule's N -> 4N evidence).

Runs the DATA-BOUND scale workload (plans/scale_job.py: synthesized pages
table -> extract + tile + spatial join + dedup ladder) at local[8] and
local[32] in separate JVMs, computes throughput at both and the scaling
efficiency, and rewrites BENCH/BASELINE.md. The sf0.1 contract suite is
reported alongside for context but NOT used for the efficiency number —
at sub-MB inputs it measures Spark's fixed per-stage latency, not the
engine.

Efficiency definition (strong scaling, fixed input):
  eff = (T_N / T_4N) / 4      (perfect 4x speedup -> 1.0; >= 0.8 passes)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCALE_PAGES = int(os.environ.get("SPARK_GRAFT_SCALE_PAGES", "8000000"))


def run_at(cpus: int) -> dict:
    code = (
        "import sys, json; sys.path.insert(0, %r);\n"
        "from geotiff_tiler_spark.session import get_spark\n"
        "from geotiff_tiler_spark.plans.scale_job import run_scale_workload\n"
        "spark = get_spark(master='local[%d]', shuffle_partitions=%d)\n"
        "spark.range(1000).count()\n"
        "print('RESULT ' + json.dumps(run_scale_workload(spark, %d)))\n"
        "spark.stop()\n" % (REPO, cpus, max(cpus, 8), SCALE_PAGES)
    )
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=3000
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("RESULT ")][-1]
    return json.loads(line[len("RESULT ") :])


def main() -> None:
    lo, hi = 8, 32
    # best-of-2 per level: the sandbox runs periodic background jobs that
    # randomly contend with one run; the min is the least-contended sample
    r_lo = min((run_at(lo) for _ in range(2)), key=lambda r: r["sec_total"])
    r_hi = min((run_at(hi) for _ in range(2)), key=lambda r: r["sec_total"])
    t_lo, t_hi = r_lo["sec_total"], r_hi["sec_total"]
    speedup = t_lo / t_hi if t_hi else float("nan")
    eff = speedup / (hi / lo)
    lines = [
        "# BENCH/BASELINE — measured scaling evidence",
        "",
        f"Workload: data-bound scale job over a {SCALE_PAGES:,}-row synthesized",
        "pages table (input_hint shape) — text extraction, geocode + stride-grid",
        "tiling + patch filter + split, point-in-box spatial join (20k label",
        "boxes), MinHash+LSH dedup ladder. Fixed input, strong scaling;",
        "sandbox stand-in for N vs 4N executors: `local[8]` vs `local[32]`.",
        "",
        "| parallelism | workload sec | tiles | join rows | tiles+join rows/sec |",
        "|---|---|---|---|---|",
        f"| local[{lo}] (N) | {t_lo} | {r_lo['tiles']} | {r_lo['join_rows']} | {r_lo['tiles_join_rows_per_sec']} |",
        f"| local[{hi}] (4N) | {t_hi} | {r_hi['tiles']} | {r_hi['join_rows']} | {r_hi['tiles_join_rows_per_sec']} |",
        "",
        f"**Speedup N->4N: {speedup:.2f}x; scaling efficiency: {eff:.2f}** "
        f"(eff = speedup / 4; north rule requires >= 0.8)",
        "",
        "Stage breakdown (sec):",
        "",
        "| stage | @N | @4N | speedup |",
        "|---|---|---|---|",
    ]
    for st in ("sec_gen", "sec_tiling", "sec_join", "sec_dedup"):
        a, b = r_lo[st], r_hi[st]
        sp = (a / b) if b else float("nan")
        lines.append(f"| {st[4:]} | {a} | {b} | {sp:.2f}x |")
    lines += [
        "",
        "Output parity across parallelism levels (same input -> same results):",
        f"tiles {r_lo['tiles']}=={r_hi['tiles']}, join_rows {r_lo['join_rows']}=={r_hi['join_rows']}, "
        f"lsh_pairs {r_lo['lsh_pairs']}=={r_hi['lsh_pairs']}, dedup_groups {r_lo['dedup_groups']}=={r_hi['dedup_groups']}.",
    ]
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as fh:
        fh.write("\n".join(lines) + "\n")
    with open(os.path.join(REPO, "BENCH", "scaling.json"), "w") as fh:
        json.dump(
            {
                "n_pages": SCALE_PAGES,
                "sec_n8": t_lo,
                "sec_n32": t_hi,
                "speedup": round(speedup, 3),
                "efficiency": round(eff, 3),
                "throughput_n8": r_lo["tiles_join_rows_per_sec"],
                "throughput_n32": r_hi["tiles_join_rows_per_sec"],
            },
            fh,
        )
    print(json.dumps({"eff": round(eff, 3), "speedup": round(speedup, 2), "lo": r_lo, "hi": r_hi}))


if __name__ == "__main__":
    main()
