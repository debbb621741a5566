"""One exclusive headline-suite sample (sf0.1, local[32] by default);
appends a JSON line to BENCH/headline_samples.jsonl.

Same estimator rationale as the scale-workload sampler
(tools/bench_sample.py): the sandbox's background jobs contend with any
single run, so round-over-round per-query deltas are only signal when
taken as the per-query MINIMUM over exclusive samples (contention biases
timings up, never down). Round-2 VERDICT asked for exactly this so the
headline regressions (q35, q24, q17) could be separated from noise.

Usage: python tools/bench_headline_sample.py [cpus]
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
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    code = (
        "import sys, json; sys.path.insert(0, %r)\n"
        "import bench\n"
        "from geotiff_tiler_spark.session import get_spark\n"
        "spark = get_spark(master='local[%d]', shuffle_partitions=%d)\n"
        "t, r, total = bench.run_headline(spark, %r)\n"
        "print('RESULT ' + json.dumps({'queries': t, 'rows': r, 'total': total}))\n"
        "spark.stop()\n" % (REPO, cpus, max(cpus, 8), sf_dir)
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
    rec["sf_dir"] = sf_dir
    rec["load_at_start"] = round(load0, 2)
    rec["steal_pct"] = steal_pct(cpu0, read_cpu())
    rec["git"] = subprocess.run(
        ["git", "rev-parse", "--short", "HEAD"], capture_output=True, text=True,
        cwd=REPO,
    ).stdout.strip()  # code provenance: which commit produced this sample
    rec["ts"] = int(time.time())
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "headline_samples.jsonl"), "a") as fh:
        fh.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
