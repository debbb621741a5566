"""A/B: run_ivf_stage / run_pq_stage with the corpus persisted vs
recomputed-per-consumer.

CLAUDE.md A/B rule: one session's second variant wins on warm-state
recency regardless of variant, so each sample is its OWN subprocess
(fresh JVM) and the schedule alternates BOTH orders; compare per-variant
minima. Appends one JSON line per sample to BENCH/{stage}_ab_samples.jsonl.

Usage: python tools/bench_ivf_ab.py [cpus] [n_rows] [schedule] [stage]
  schedule: comma list of p|r (default p,r,r,p)
  stage: ivf (default) | pq
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def one(cpus: int, n_rows: int, persist: bool, stage: str = "ivf") -> dict:
    code = (
        "import sys, json; sys.path.insert(0, %r)\n"
        "from geotiff_tiler_spark.session import get_spark\n"
        "from geotiff_tiler_spark.plans.scale_job import run_%s_stage as stage_fn\n"
        "spark = get_spark(master='local[%d]', shuffle_partitions=%d,\n"
        "    extra_conf={'spark.driver.memory': '16g',\n"
        "                'spark.ui.showConsoleProgress': 'false'})\n"
        "r = stage_fn(spark, %d, persist=%r)\n"
        "print('RESULT ' + json.dumps(r))\n"
        "spark.stop()\n" % (REPO, stage, cpus, max(cpus, 8), n_rows, persist)
    )
    load0 = os.getloadavg()[0]
    sys.path.insert(0, os.path.join(REPO, "tools"))
    from steal import read_cpu, steal_pct

    cpu0 = read_cpu()
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=3000, cwd=REPO,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("RESULT ")][-1]
    rec = json.loads(line[len("RESULT "):])
    rec.update(
        cpus=cpus,
        persist=persist,
        load_at_start=round(load0, 2),
        steal_pct=steal_pct(cpu0, read_cpu()),
        ts=int(time.time()),
    )
    return rec


def main() -> None:
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    n_rows = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    sched = (sys.argv[3] if len(sys.argv) > 3 else "p,r,r,p").split(",")
    stage = sys.argv[4] if len(sys.argv) > 4 else "ivf"
    path = os.path.join(REPO, "BENCH", f"{stage}_ab_samples.jsonl")
    for item in sched:
        rec = one(cpus, n_rows, persist=item.strip() == "p", stage=stage)
        with open(path, "a") as fh:
            fh.write(json.dumps(rec) + "\n")
        print(json.dumps(rec))


if __name__ == "__main__":
    main()
