"""One exclusive IVF-PQ-stage sample (1M rows, nlist=4000, m=8 codes, local[32] by
default); appends a JSON line to BENCH/ivfpq_samples.jsonl.

The composed IVF-PQ path (coarse prune + 8-byte-code ADC) measured
under the same best-of-exclusive-samples estimator as the component IVF
and PQ stages, so the three numbers are directly comparable.

Usage: python tools/bench_ivfpq_sample.py [cpus] [n_rows]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    n_rows = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    code = (
        "import sys, json; sys.path.insert(0, %r)\n"
        "from geotiff_tiler_spark.session import get_spark\n"
        "from geotiff_tiler_spark.plans.scale_job import run_ivfpq_stage\n"
        "spark = get_spark(master='local[%d]', shuffle_partitions=%d,\n"
        "    extra_conf={'spark.driver.memory': '16g',\n"
        "                'spark.ui.showConsoleProgress': 'false'})\n"
        "r = run_ivfpq_stage(spark, %d)\n"
        "print('RESULT ' + json.dumps(r))\n"
        "spark.stop()\n" % (REPO, cpus, max(cpus, 8), n_rows)
    )
    load0 = os.getloadavg()[0]
    sys.path.insert(0, os.path.join(REPO, "tools"))
    from steal import read_cpu, steal_pct
    cpu0 = read_cpu()
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=3000,
        cwd=REPO,
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
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "ivfpq_samples.jsonl"), "a") as fh:
        fh.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
