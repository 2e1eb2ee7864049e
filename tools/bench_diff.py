"""Per-query bench diff: compare two BENCH detail files (bench.py
output with the ``queries`` map populated, e.g. the tracked
``BENCH_DETAIL_r*.json`` snapshots) and flag regressions.

Usage: python tools/bench_diff.py OLD.json NEW.json [threshold]

Prints the suite totals (headline + full registry when present), the
measured BOX FACTOR, and one line per query whose calibration-ADJUSTED
NEW/OLD ratio exceeds the threshold (default 1.3, the round-7
verdict's investigate bar), plus queries added/removed. Exit code 1
when any adjusted regression crosses the threshold — usable as a gate.

Box factor (round-9 verdict task 4: the cross-round normalization was
prose in SCALE.md; now it's in the artifact): the shared VM's speed
drifts between rounds (r8→r9 measured a uniform 1.26× slowdown on
untouched queries), so raw ratios conflate box drift with real
regressions. The factor is the median NEW/OLD ratio of the pinned
``calibration`` queries both snapshots carry (bench.py CALIBRATION —
stable code since round 4); when either file predates the calibration
field, it falls back to the median ratio over ALL common queries
(robust unless most of the registry regressed at once, which per-query
lines would show anyway).

Context: the r6→r7 driver-suite rise (64.8 s → 73.4 s on identical
code) could not be attributed per-query because no detail file was
persisted; the tracked snapshots + this diff close that gap.
"""

from __future__ import annotations

import json
import sys
from statistics import median


def box_factor(old: dict, new: dict) -> tuple[float, str]:
    oc, nc = old.get("calibration") or {}, new.get("calibration") or {}
    common = [n for n in oc if n in nc and oc[n] > 0]
    if len(common) >= 2:
        return median(nc[n] / oc[n] for n in common), "calibration"
    oq, nq = old.get("queries") or {}, new.get("queries") or {}
    ratios = [nq[n] / oq[n] for n in oq if n in nq and oq[n] > 0]
    if ratios:
        return median(ratios), "median-of-common (no calibration field)"
    return 1.0, "none (disjoint query sets)"


def main(argv: list[str]) -> int:
    if len(argv) < 2:
        print(__doc__)
        return 2
    old = json.load(open(argv[0]))
    new = json.load(open(argv[1]))
    thr = float(argv[2]) if len(argv) > 2 else 1.3
    oq, nq = old.get("queries") or {}, new.get("queries") or {}
    if not oq or not nq:
        print("one of the files has no per-query detail", file=sys.stderr)
        return 2
    print(
        f"suite: {old.get('value')} s / {old.get('n_queries', len(oq))}q  →  "
        f"{new.get('value')} s / {new.get('n_queries', len(nq))}q  "
        f"(sf {old.get('sf')}→{new.get('sf')})"
    )
    if old.get("full_value") or new.get("full_value"):
        print(
            f"full registry: {old.get('full_value', old.get('value'))} s /"
            f" {old.get('full_n_queries', len(oq))}q  →  "
            f"{new.get('full_value', new.get('value'))} s /"
            f" {new.get('full_n_queries', len(nq))}q"
        )
    box, src = box_factor(old, new)
    print(f"box factor: {box:.3f}x  (from {src})")
    added = sorted(set(nq) - set(oq))
    removed = sorted(set(oq) - set(nq))
    if added:
        print("added:", ", ".join(added))
    if removed:
        print("removed:", ", ".join(removed))
    regressions = []
    for name in sorted(set(oq) & set(nq)):
        a, b = oq[name], nq[name]
        if a > 0 and (b / a) / box > thr:
            regressions.append((b / a, name, a, b))
    for raw, name, a, b in sorted(regressions, reverse=True):
        print(
            f"  {raw / box:5.2f}x adj ({raw:5.2f}x raw)  "
            f"{name}: {a:.2f}s → {b:.2f}s"
        )
    if not regressions:
        print(f"no query regressed past {thr}x box-adjusted")
    return 1 if regressions else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
