#!/usr/bin/env python
"""Interleaved A/B timing for PYDALA_SPREAD-gated optimizations.

The round-16 host's single-core speed drifts minute to minute (probes
0.52-0.77 vs the 0.40-0.46 r13/r15 idle band), so sequential
before/after runs are not comparable. This harness alternates
off-mode and auto-mode executions of the SAME query in ONE session
(off, auto, off, auto, ...), so drift affects both arms equally, and
reports per-arm medians.

Usage: python tools/opt_ab.py q_stats_summary q_lang_predict [--pairs 4]
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
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--pairs", type=int, default=4)
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    from pydala_spark.queries import QUERIES
    from pydala_spark.session import get_session

    spark = get_session(app_name="opt_ab_r16")
    spark.sparkContext.setLogLevel("ERROR")
    warm = "/root/testdata/sf0.001"
    if not os.path.isdir(warm):
        warm = args.sf

    out = {}
    for name in args.queries:
        # warm both arms (codegen/JIT) before timing
        for mode in ("off", "auto"):
            os.environ["PYDALA_SPREAD"] = mode
            QUERIES[name](spark, warm).collect()
            QUERIES[name](spark, args.sf).collect()
        runs: dict[str, list[float]] = {"off": [], "auto": []}
        for _ in range(args.pairs):
            for mode in ("off", "auto"):
                os.environ["PYDALA_SPREAD"] = mode
                spark.sparkContext.setJobDescription(f"ab:{name}:{mode}")
                t0 = time.perf_counter()
                QUERIES[name](spark, args.sf).collect()
                runs[mode].append(round(time.perf_counter() - t0, 3))
        med = {m: sorted(v)[len(v) // 2] for m, v in runs.items()}
        out[name] = {"off_median": med["off"], "auto_median": med["auto"],
                     "speedup": round(med["off"] / max(med["auto"], 1e-9), 2),
                     "runs": runs}
        print(f"{name}: off {med['off']}s auto {med['auto']}s "
              f"({out[name]['speedup']}x)  runs={runs}", file=sys.stderr)
    os.environ.pop("PYDALA_SPREAD", None)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
