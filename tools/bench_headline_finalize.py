"""Merge BENCH/headline_samples.jsonl into BENCH/headline_best.json:
per-query minimum over the exclusive samples (the least-contended
measurement of each query) plus the best whole-suite total. Output-row
parity across samples is asserted — identical code on identical input
must count identical rows at every sample.

Usage: python tools/bench_headline_finalize.py
"""

from __future__ import annotations

import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    path = os.path.join(REPO, "BENCH", "headline_samples.jsonl")
    with open(path) as fh:
        samples = [json.loads(l) for l in fh if l.strip()]
    samples = [s for s in samples if s.get("cpus") == 32]
    assert samples, "no local[32] headline samples"
    # per-query row parity: the headline set can grow between rounds, so
    # compare each query's row count across the samples that ran it
    rows_by_q: dict[str, set] = {}
    for s in samples:
        for q, n in s["rows"].items():
            rows_by_q.setdefault(q, set()).add(n)
    bad = {q: v for q, v in rows_by_q.items() if len(v) != 1}
    assert not bad, ("row parity violated", bad)
    all_q = sorted(rows_by_q)
    best_q = {
        q: min(s["queries"][q] for s in samples if q in s["queries"]) for q in all_q
    }
    # whole-suite total only over samples that ran the FULL current set;
    # right after HEADLINE grows, older samples are partial — demand at
    # least one full-set sample instead of letting min() raise ValueError
    full = [s["total"] for s in samples if set(s["queries"]) == set(all_q)]
    assert full, (
        "no sample covers the full current headline set "
        f"({sorted(all_q)}); run tools/bench_headline_sample.py at least "
        "once after adding a query before finalizing"
    )
    out = {
        "n_samples": len(samples),
        "sf_dir": samples[0]["sf_dir"],
        "queries_best": best_q,
        "sum_of_best": round(sum(best_q.values()), 3),
        "best_total": min(full),
    }
    with open(os.path.join(REPO, "BENCH", "headline_best.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
