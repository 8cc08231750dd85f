"""Print the plan-shape report for declared queries — the audit trail
behind SCALE.md's shuffle/broadcast/pushdown claims.

Usage:
    python tools/plan_report.py q01_pricing_summary q_pq_topk ...
    python tools/plan_report.py --all          # every registry entry
    python tools/plan_report.py --sf /root/testdata/sf0.01 q06_revenue_change

One JSON line per query: pushed filters, per-scan read schemas,
broadcast-join presence, shuffle-exchange count, codegen spans. Queries
are EXECUTED by default — under AQE the codegen spans only materialize
in the final adaptive plan, so a pre-execution report would read 0 and
hide codegen regressions (r4 review); pass --no-execute for a fast
static look at everything except codegen.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--no-execute", action="store_true",
                    help="static plans only (codegen_stages reads 0 under AQE)")
    ap.add_argument(
        "--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    )
    args = ap.parse_args()

    from pydala_spark.plans import plan_report
    from pydala_spark.queries import QUERIES
    from pydala_spark.session import get_session

    if args.all and args.queries:
        print("pass either --all or query names, not both", file=sys.stderr)
        return 2
    names = list(QUERIES) if args.all else args.queries
    unknown = [n for n in names if n not in QUERIES]
    if unknown or not names:
        print(f"unknown or missing queries: {unknown or '(none given)'}; "
              f"known: {', '.join(QUERIES)}", file=sys.stderr)
        return 2
    spark = get_session(master="local[4]", shuffle_partitions=4)
    for name in names:
        rep = plan_report(
            QUERIES[name](spark, args.sf), executed=not args.no_execute
        )
        print(json.dumps({"query": name, **rep}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
