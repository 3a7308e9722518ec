#!/usr/bin/env python3
"""Wholesale re-pin outlier check (ADVICE r14).

When bench_pins.json is regenerated on a slower/faster box, every pin moves
by roughly one global factor; a GENUINE per-query regression introduced in
the same round would be folded into the new baseline and become
undetectable. This compares an old and a new pin file, estimates the global
factor as the median per-query ratio, and flags queries whose ratio deviates
from that factor by more than TOL either way — the ones that must be
hand-adjudicated (plan change? deliberate rework? contention?) before the
re-pin is committed.

Usage: python3 tools/pin_drift.py <old_pins.json> <new_pins.json> [tol]
       (old file conveniently via: git show HEAD:bench_pins.json > /tmp/old.json)
Exit 0 with "CLEAN" when nothing deviates, else lists outliers and exits 1.
"""
import json
import statistics
import sys


def main(old_path: str, new_path: str, tol: float = 1.5) -> int:
    def load(p):
        d = json.load(open(p))
        return {k: v for k, v in d.items() if isinstance(v, (int, float))}
    old = load(old_path)
    new = load(new_path)
    common = sorted(set(old) & set(new))
    added = sorted(set(new) - set(old))
    removed = sorted(set(old) - set(new))
    ratios = {q: new[q] / old[q] for q in common if old[q] > 0}
    med = statistics.median(ratios.values())
    print(f"pins: {len(common)} common, {len(added)} added, {len(removed)} removed; "
          f"global factor (median new/old) = {med:.2f}x")
    # tiny pins are scheduler noise, not plan signal: only flag queries where
    # at least one side is >= 0.2 s
    outliers = [
        (q, r) for q, r in sorted(ratios.items(), key=lambda kv: -kv[1])
        if (r > med * tol or r < med / tol) and max(old[q], new[q]) >= 0.2
    ]
    for q, r in outliers:
        print(f"OUTLIER {q}: {old[q]:.2f}s -> {new[q]:.2f}s = {r:.2f}x "
              f"(global {med:.2f}x, tol {tol}x)")
    if added:
        print("added (no prior pin, not checked): " + ", ".join(added))
    print("CLEAN" if not outliers else f"{len(outliers)} outlier(s) need adjudication")
    return 0 if not outliers else 1


if __name__ == "__main__":
    tol = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    sys.exit(main(sys.argv[1], sys.argv[2], tol))
