"""Per-query bench diff: compare two BENCH detail files (bench.py
output with the ``queries`` map populated, e.g. the tracked
``BENCH_DETAIL_r*.json`` snapshots) and flag regressions.

Usage: python tools/bench_diff.py OLD.json NEW.json [threshold]

Prints one line per query whose NEW/OLD time ratio exceeds the
threshold (default 1.3, the round-7 verdict's investigate bar), plus
queries added/removed and the suite totals. Exit code 1 when any
regression crosses the threshold — usable as a gate.

Context: the r6→r7 driver-suite rise (64.8 s → 73.4 s on identical
code) could not be attributed per-query because no detail file was
persisted; the tracked snapshots + this diff close that gap.
"""

from __future__ import annotations

import json
import sys


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
        f"suite: {old.get('value')} s / {len(oq)}q  →  "
        f"{new.get('value')} s / {len(nq)}q  (sf {old.get('sf')}→{new.get('sf')})"
    )
    added = sorted(set(nq) - set(oq))
    removed = sorted(set(oq) - set(nq))
    if added:
        print("added:", ", ".join(added))
    if removed:
        print("removed:", ", ".join(removed))
    regressions = []
    for name in sorted(set(oq) & set(nq)):
        a, b = oq[name], nq[name]
        if a > 0 and b / a > thr:
            regressions.append((b / a, name, a, b))
    for ratio, name, a, b in sorted(regressions, reverse=True):
        print(f"  {ratio:5.2f}x  {name}: {a:.2f}s → {b:.2f}s")
    if not regressions:
        print(f"no query regressed past {thr}x")
    return 1 if regressions else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
