"""Host CPU-steal provenance for bench samples.

The sandbox VM shows ~25% cumulative steal time in /proc/stat: under
load, the hypervisor takes cores away from the guest at unpredictable
times, which is why identical code measures 5x apart (IVF topk 21 s vs
119 s) on a box whose OWN loadavg is near zero. Recording the steal
fraction over each sample's wall window lets the best-of-exclusive
estimator's provenance show WHY slow samples were slow.
"""

from __future__ import annotations


def read_cpu() -> list[int]:
    with open("/proc/stat") as fh:
        for line in fh:
            if line.startswith("cpu "):
                return [int(x) for x in line.split()[1:]]
    return []


def steal_pct(before: list[int], after: list[int]) -> float | None:
    """Percent of total guest CPU ticks stolen between two read_cpu()."""
    if not before or not after:
        return None
    total = sum(a - b for a, b in zip(after, before))
    if total <= 0:
        return None
    steal = after[7] - before[7] if len(after) > 7 else 0
    return round(100.0 * steal / total, 2)
