"""Print the physical (or any) plan of registry queries — the manual
companion to tests/test_plans.py's pinned assertions. Use it after
touching an operator to confirm the plan is still the one you want
(scan pushdown visible, codegen spans wide, no Python nodes in hot
paths, joins on hashed keys).

Usage: python tools/show_plan.py QUERY [QUERY ...] [--mode formatted|simple|extended|cost]
       [--sf /root/testdata/sf0.001]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--mode", default="formatted",
                    choices=["formatted", "simple", "extended", "cost"])
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    args = ap.parse_args()

    from ontario_spark.queries import all_queries
    from ontario_spark.session import get_spark

    spark = get_spark("ontario-show-plan")
    spark.sparkContext.setLogLevel("ERROR")
    registry = all_queries()
    unknown = sorted(set(args.queries) - set(registry))
    if unknown:
        raise SystemExit(f"not in registry: {unknown}")
    for name in args.queries:
        print(f"{'=' * 20} {name} {'=' * 20}")
        df = registry[name](spark, args.sf)
        print(df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                args.mode
            )
        ))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
