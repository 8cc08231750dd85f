#!/usr/bin/env python
"""Round-16 optimization measurement harness (guide §1).

Times individual declared queries in isolation — same collect-based
methodology as bench.py, median of N adjacent runs after a warm-up at
sf0.001 — and writes each query's ``explain("formatted")`` to
``plans/<rdir>/<query>_<tag>.txt`` so plan claims in OPTIMIZATION_r16.md
are checkable without running Spark.

Usage:
  python tools/opt_measure.py --tag before q_stats_summary q_lang_predict
  python tools/opt_measure.py --tag before --all-bench   # all 26 bench rows
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--tag", default="before")
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--all-bench", action="store_true")
    ap.add_argument("--no-plans", action="store_true")
    ap.add_argument("--rdir", default="r17", help="plans/<rdir>/ output dir")
    args = ap.parse_args()

    from bench import EXTENDED, HEADLINE

    from pydala_spark.plans import explain_str
    from pydala_spark.queries import QUERIES
    from pydala_spark.session import get_session

    names = list(args.queries)
    if args.all_bench:
        names = HEADLINE + EXTENDED
    if not names:
        ap.error("no queries given")

    spark = get_session(app_name="opt_measure_r16")
    spark.sparkContext.setLogLevel("ERROR")
    warm_dir = "/root/testdata/sf0.001"
    if not os.path.isdir(warm_dir):
        warm_dir = args.sf
    for name in names:
        QUERIES[name](spark, warm_dir).collect()

    plans_dir = Path(__file__).resolve().parent.parent / "plans" / args.rdir
    plans_dir.mkdir(parents=True, exist_ok=True)

    out: dict[str, dict] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"opt_measure:{name}")
        vals = []
        for _ in range(args.runs):
            t0 = time.perf_counter()
            QUERIES[name](spark, args.sf).collect()
            vals.append(round(time.perf_counter() - t0, 3))
        med = sorted(vals)[len(vals) // 2]
        out[name] = {"median": med, "runs": vals}
        if not args.no_plans:
            txt = explain_str(QUERIES[name](spark, args.sf))
            (plans_dir / f"{name}_{args.tag}.txt").write_text(txt)
        print(f"{name}: median {med}s runs {vals}", file=sys.stderr)
    spark.sparkContext.setJobDescription(None)
    print(json.dumps({"tag": args.tag, "sf": args.sf, "timings": out}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
