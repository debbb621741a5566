"""One exclusive URL/graph-tier sample (8M pages, local[32] by default);
appends a JSON line to BENCH/urlgraph_samples.jsonl.

Same estimator rationale as the other stage samplers (bench_ivf_sample):
background jobs contend with single runs, contention biases timings up
and never down, so the per-field minimum over EXCLUSIVE samples is the
defensible number. The stage itself warms the session untimed first
(run_urlgraph_stage warm=True: 8M cold 43.6 s vs warm 9.6 s on
identical plans — JIT + heap first-touch, not the operators).

Usage: python tools/bench_urlgraph_sample.py [cpus] [n_pages]
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
    n_pages = int(sys.argv[2]) if len(sys.argv) > 2 else 8_000_000
    code = (
        "import sys, json; sys.path.insert(0, %r)\n"
        "from geotiff_tiler_spark.session import get_spark\n"
        "from geotiff_tiler_spark.plans.scale_job import run_urlgraph_stage\n"
        "spark = get_spark(master='local[%d]', shuffle_partitions=%d,\n"
        "    extra_conf={'spark.driver.memory': '16g',\n"
        "                'spark.ui.showConsoleProgress': 'false'})\n"
        "r = run_urlgraph_stage(spark, %d)\n"
        "print('RESULT ' + json.dumps(r))\n"
        "spark.stop()\n" % (REPO, cpus, max(cpus, 8), n_pages)
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
    with open(os.path.join(REPO, "BENCH", "urlgraph_samples.jsonl"), "a") as fh:
        fh.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
