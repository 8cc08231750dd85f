#!/usr/bin/env python
"""Round-17 bisect of VERDICT r16 #1: interleaved A/B of each r16 change
arm on q_semantic_dedup (the two rows the driver measured slower in both
r16 runs), plus a build-vs-execute decomposition of q_pq_topk (whose
operator path git shows UNCHANGED since r15 — there is no code arm to
bisect; the decomposition attributes its time instead).

Arms (reverted by monkeypatch inside one session, interleaved with the
current code so host drift hits both arms equally):
  nondet  — undo the r16 ``.asNondeterministic()`` on the semantic
            assigner (ann._assigner proxy whose asNondeterministic is a
            no-op, reproducing the r15 duplicated-UDF plan).
  colnorm — undo the r16 string-SQL norm forms (wrap similarity.norm /
            sim_from_norms / dot / lsh_bucket to coerce str -> F.col,
            forcing the r15 Column-algebra build path).

Usage: python tools/opt_bisect_r17.py [--pairs 6]
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
    ap.add_argument("--pairs", type=int, default=6)
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from pydala_spark.operators import ann, similarity
    from pydala_spark.queries import QUERIES
    from pydala_spark.session import get_session

    spark = get_session(app_name="opt_bisect_r17")
    spark.sparkContext.setLogLevel("ERROR")

    # --- arm patches -----------------------------------------------------
    orig_assigner = ann._assigner

    class _NoNondet:
        """Proxy so .asNondeterministic() returns the ORIGINAL udf."""

        def __init__(self, udf):
            self._udf = udf

        def asNondeterministic(self):
            return self._udf

        def __call__(self, *a, **k):  # pragma: no cover - not used
            return self._udf(*a, **k)

    def assigner_r15(*a, **k):
        return _NoNondet(orig_assigner(*a, **k))

    orig = {n: getattr(similarity, n)
            for n in ("norm", "sim_from_norms", "dot", "lsh_bucket")}

    def _c(x):
        return F.col(x) if isinstance(x, str) else x

    col_forms = {
        "norm": lambda a: orig["norm"](_c(a)),
        "sim_from_norms": lambda a, b, na, nb: orig["sim_from_norms"](
            _c(a), _c(b), _c(na), _c(nb)),
        "dot": lambda a, b: orig["dot"](_c(a), _c(b)),
        "lsh_bucket": lambda vec, dim, bits=8: orig["lsh_bucket"](
            _c(vec), dim, bits),
    }

    def set_arm(arm: str) -> None:
        ann._assigner = assigner_r15 if arm == "nondet" else orig_assigner
        for n in orig:
            setattr(similarity, n,
                    col_forms[n] if arm == "colnorm" else orig[n])

    # --- q_semantic_dedup interleaved A/Bs -------------------------------
    q = QUERIES["q_semantic_dedup"]
    warm = "/root/testdata/sf0.001"
    out = {}
    for arm in ("nondet", "colnorm"):
        for mode in ("cur", arm):
            set_arm(mode if mode != "cur" else "none")
            q(spark, warm).collect()
            q(spark, args.sf).collect()
        runs: dict[str, list[float]] = {"cur": [], arm: []}
        for _ in range(args.pairs):
            for mode in ("cur", arm):
                set_arm(mode if mode != "cur" else "none")
                spark.sparkContext.setJobDescription(
                    f"bisect:q_semantic_dedup:{mode}")
                t0 = time.perf_counter()
                q(spark, args.sf).collect()
                runs[mode].append(round(time.perf_counter() - t0, 3))
        set_arm("none")
        med = {m: sorted(v)[len(v) // 2] for m, v in runs.items()}
        wins = sum(a < b for a, b in zip(runs["cur"], runs[arm]))
        out[f"semantic_dedup:{arm}"] = {
            "cur_median": med["cur"], "reverted_median": med[arm],
            "cur_over_reverted": round(med[arm] / max(med["cur"], 1e-9), 3),
            "cur_wins_pairs": f"{wins}/{args.pairs}", "runs": runs}
        print(f"q_semantic_dedup vs {arm}-reverted: cur {med['cur']}s "
              f"reverted {med[arm]}s cur_wins {wins}/{args.pairs} "
              f"runs={runs}", file=sys.stderr)

    # --- q_pq_topk build-vs-execute decomposition ------------------------
    qp = QUERIES["q_pq_topk"]
    qp(spark, warm).collect()
    qp(spark, args.sf).collect()
    build, execute, total = [], [], []
    for _ in range(args.pairs):
        spark.sparkContext.setJobDescription("bisect:q_pq_topk:decomp")
        t0 = time.perf_counter()
        df = qp(spark, args.sf)
        t1 = time.perf_counter()
        df.collect()
        t2 = time.perf_counter()
        build.append(round(t1 - t0, 3))
        execute.append(round(t2 - t1, 3))
        total.append(round(t2 - t0, 3))
    mid = len(build) // 2
    out["pq_topk_decomp"] = {
        "build_median": sorted(build)[mid],
        "execute_median": sorted(execute)[mid],
        "total_median": sorted(total)[mid],
        "build": build, "execute": execute}
    print(f"q_pq_topk: build {sorted(build)[mid]}s execute "
          f"{sorted(execute)[mid]}s total {sorted(total)[mid]}s",
          file=sys.stderr)

    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
