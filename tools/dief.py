"""Diefficiency metrics over CLI answer traces.

Reference parity: the reference ships a dief@t experiment harness
(``scripts/run_dief_experiment.py:28-180``) that times each answer's
arrival and computes the diefficiency metric (Acosta, Vidal, Sure-
Vetter: "Diefficiency Metrics: Measuring the Continuous Efficiency of
Query Processing Approaches", ISWC 2017). Here the engine's CLI
already records per-answer arrival times (``cli.py run(trace=True)``
→ ``out["trace"]``); this tool turns such traces into dief@t / dief@k
numbers so continuous-delivery behavior (streamed `toLocalIterator`
results vs batch collect) is quantifiable, not anecdotal.

Usage:
    python tools/dief.py RESPONSE.json [--t SECONDS] [--k ANSWERS]
where RESPONSE.json is the CLI's JSON output run with --trace.
"""

from __future__ import annotations

import argparse
import json
import sys


def dief_at_t(trace: list[float], t: float) -> float:
    """Area under the answers-vs-time step curve from 0 to ``t``:
    higher = more answers delivered earlier. ``trace[i]`` is the
    arrival time of answer i+1 (sorted ascending)."""
    if t <= 0:
        return 0.0
    times = sorted(x for x in trace if x <= t)
    area = 0.0
    for i, x in enumerate(times):
        # answer i+1 is "held" from its arrival until t
        area += t - x
    return area


def dief_at_k(trace: list[float], k: int) -> float:
    """Area under the answers-vs-time curve until the k-th answer
    arrives (lower bound k ≤ len(trace)); measures how steadily the
    first k answers stream out."""
    times = sorted(trace)
    if k <= 0 or k > len(times):
        raise ValueError(f"k={k} outside 1..{len(times)}")
    t_k = times[k - 1]
    return dief_at_t(times[:k], t_k)


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("response", help="CLI --trace JSON output file")
    ap.add_argument("--t", type=float, default=None,
                    help="dief@t horizon (default: last arrival)")
    ap.add_argument("--k", type=int, default=None,
                    help="dief@k answer count (default: all answers)")
    args = ap.parse_args(argv)
    out = json.load(open(args.response))
    trace = out.get("trace")
    if trace is None:  # [] is a legitimate 0-answer trace
        print("no trace in response (run the CLI with --trace)",
              file=sys.stderr)
        return 1
    if not trace:
        print(json.dumps({"n_answers": 0, "dief@t": 0.0, "dief@k": 0.0}))
        return 0
    t = args.t if args.t is not None else max(trace)
    k = args.k if args.k is not None else len(trace)
    try:
        d_k = dief_at_k(trace, k)
    except ValueError as exc:
        print(str(exc), file=sys.stderr)
        return 1
    print(json.dumps({
        "n_answers": len(trace),
        "t": t,
        "dief@t": round(dief_at_t(trace, t), 6),
        "k": k,
        "dief@k": round(d_k, 6),
        "first": min(trace),
        "last": max(trace),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
