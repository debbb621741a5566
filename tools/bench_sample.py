"""One exclusive scale-workload sample at a given parallelism; appends a
JSON line to BENCH/samples.jsonl. Used to accumulate best-of-all-exclusive
samples per level across idle windows (the sandbox's periodic background
jobs randomly contend with any single run — see BENCH/BASELINE.md).

Usage: python tools/bench_sample.py <cpus>
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCALE_PAGES = int(os.environ.get("SPARK_GRAFT_SCALE_PAGES", "8000000"))


def main() -> None:
    cpus = int(sys.argv[1])
    # fixed partition count across levels (strong scaling should vary ONLY
    # parallelism; partitions change spill behavior of the big dedup agg)
    parts = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", max(cpus, 8)))
    code = (
        "import sys, json; sys.path.insert(0, %r);\n"
        "from geotiff_tiler_spark.session import get_spark\n"
        "from geotiff_tiler_spark.plans.scale_job import run_scale_workload\n"
        "spark = get_spark(master='local[%d]', shuffle_partitions=%d)\n"
        "spark.range(1000).count()\n"
        "print('RESULT ' + json.dumps(run_scale_workload(spark, %d)))\n"
        "spark.stop()\n" % (REPO, cpus, parts, SCALE_PAGES)
    )
    load0 = os.getloadavg()[0]
    sys.path.insert(0, os.path.join(REPO, "tools"))
    from steal import read_cpu, steal_pct
    cpu0 = read_cpu()
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=3000
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("RESULT ")][-1]
    rec = json.loads(line[len("RESULT "):])
    rec["cpus"] = cpus
    rec["load_at_start"] = round(load0, 2)
    rec["steal_pct"] = steal_pct(cpu0, read_cpu())
    rec["git"] = subprocess.run(
        ["git", "rev-parse", "--short", "HEAD"], capture_output=True, text=True,
        cwd=REPO,
    ).stdout.strip()  # code provenance: which commit produced this sample
    rec["ts"] = int(time.time())
    rec["heap"] = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g")
    rec["gc"] = os.environ.get("SPARK_GRAFT_GC", "default")
    rec["parts"] = parts
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "samples.jsonl"), "a") as fh:
        fh.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
