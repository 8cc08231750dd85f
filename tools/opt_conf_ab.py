#!/usr/bin/env python
"""Round-17 per-knob config A/B (VERDICT r16 #3, guide §9).

Interleaved A/B of one configuration knob over a representative query
subset (the heaviest shufflers + one broadcast-block control). SQL confs
flip at runtime inside ONE session (drift hits both arms equally); core
confs (``spark.io.compression.codec``) need a JVM restart per arm, so
those interleave session PAIRS (slower, still adjacent in time).

Usage:
  python tools/opt_conf_ab.py --knob spark.sql.join.preferSortMergeJoin \
      --a true --b false [--pairs 4]
  python tools/opt_conf_ab.py --knob spark.io.compression.codec \
      --a lz4 --b zstd --restart [--pairs 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

QUERIES_DEFAULT = [
    "q_minhash_lsh",          # biggest shuffle: exploded shingles, 4 Ex
    "q_stats_summary",        # collect_list partial state through the Ex
    "q_fingerprint_winnowing",  # widest plan, 16 Ex
    "q01_pricing_summary",    # spread exchange of 600k pruned rows
    "q05_local_supplier",     # broadcast-block control (1 Ex)
]


def run_queries(spark, names, sf, out):
    from pydala_spark.queries import QUERIES

    for name in names:
        spark.sparkContext.setJobDescription(f"conf_ab:{name}")
        t0 = time.perf_counter()
        QUERIES[name](spark, sf).collect()
        out[name].append(round(time.perf_counter() - t0, 3))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--knob", required=True)
    ap.add_argument("--a", required=True, help="arm A value (baseline)")
    ap.add_argument("--b", required=True, help="arm B value (candidate)")
    ap.add_argument("--pairs", type=int, default=4)
    ap.add_argument("--restart", action="store_true",
                    help="knob needs a fresh JVM per arm (core conf)")
    ap.add_argument("--queries", nargs="*", default=QUERIES_DEFAULT)
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    from pydala_spark.queries import QUERIES
    from pydala_spark.session import get_session

    warm = "/root/testdata/sf0.001"
    if not os.path.isdir(warm):
        warm = args.sf
    runs = {arm: {q: [] for q in args.queries} for arm in ("a", "b")}
    vals = {"a": args.a, "b": args.b}

    if args.restart:
        from pyspark.sql import SparkSession

        for i in range(args.pairs):
            for arm in ("a", "b"):
                spark = get_session(
                    app_name=f"conf_ab_{arm}{i}",
                    extra_conf={args.knob: vals[arm]},
                )
                spark.sparkContext.setLogLevel("ERROR")
                got = spark.conf.get(args.knob, None)
                assert got == vals[arm], (args.knob, got, vals[arm])
                for q in args.queries:  # warm codegen/JIT per fresh JVM
                    QUERIES[q](spark, warm).collect()
                    QUERIES[q](spark, args.sf).collect()
                run_queries(spark, args.queries, args.sf, runs[arm])
                spark.stop()
                SparkSession.builder._options = {}
    else:
        spark = get_session(app_name="conf_ab")
        spark.sparkContext.setLogLevel("ERROR")
        for arm in ("a", "b"):
            spark.conf.set(args.knob, vals[arm])
            for q in args.queries:
                QUERIES[q](spark, warm).collect()
                QUERIES[q](spark, args.sf).collect()
        for _ in range(args.pairs):
            for arm in ("a", "b"):
                spark.conf.set(args.knob, vals[arm])
                run_queries(spark, args.queries, args.sf, runs[arm])
        spark.conf.unset(args.knob)

    report = {"knob": args.knob, "a": args.a, "b": args.b, "per_query": {}}
    tot = {"a": 0.0, "b": 0.0}
    for q in args.queries:
        med = {arm: sorted(runs[arm][q])[len(runs[arm][q]) // 2]
               for arm in ("a", "b")}
        wins = sum(x > y for x, y in zip(runs["a"][q], runs["b"][q]))
        tot["a"] += med["a"]
        tot["b"] += med["b"]
        report["per_query"][q] = {
            "a_median": med["a"], "b_median": med["b"],
            "b_speedup": round(med["a"] / max(med["b"], 1e-9), 3),
            "b_wins_pairs": f"{wins}/{args.pairs}",
            "a_runs": runs["a"][q], "b_runs": runs["b"][q]}
        print(f"{q}: a {med['a']}s b {med['b']}s "
              f"(b {report['per_query'][q]['b_speedup']}x, wins {wins}/"
              f"{args.pairs})", file=sys.stderr)
    report["total_a"] = round(tot["a"], 3)
    report["total_b"] = round(tot["b"], 3)
    report["total_b_speedup"] = round(tot["a"] / max(tot["b"], 1e-9), 3)
    print(f"TOTAL: a {report['total_a']}s b {report['total_b']}s "
          f"(b {report['total_b_speedup']}x)", file=sys.stderr)
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
