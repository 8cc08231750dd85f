#!/usr/bin/env python
"""Deep drive: IVFADC+R full-pool == brute-force cosine up to 800
vectors x 32 dims (round 15, VERDICT r14 #4 — the round-14 scratch
drive, committed as a one-command reproducible script).

    python tools/deep_drive_ivfadc.py

Seeded geometries up to (800 vectors, 32 dims, m=8): whenever the
rerank pool covers every candidate (all cells probed, C = corpus
size), IVFADC+R must degenerate to brute-force cosine EXACTLY — same
rows, same ranks, same doubles — regardless of how coarse the PQ
ranking underneath is. The committed 3-geometry version (to 60x8)
lives in tests/test_ann.py::test_ivfpq_rerank_full_pool_equals_exact_
fuzz; this drives the same theorem an order of magnitude further.

On-demand, NOT part of the default suite: run after touching
ann.ivf_pq_topk's pool selection / exact-rescore plumbing or
train_residual_pq. Exit 0 = bit-exact on every geometry; one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _write_last(verdict: dict) -> None:
    """Durable greenness record (round 16, VERDICT r15 #2): persist the
    verdict JSON beside the script after every run, so COVERAGE.md's
    "drives green" claim is checkable/diffable without re-running the
    drive. Committed after a green run; the next run overwrites it."""
    out = os.path.join(REPO, "tools", "deep_drive_ivfadc_last.json")
    with open(out, "w") as f:
        json.dump({**verdict, "argv": sys.argv[1:]}, f, indent=1,
                  sort_keys=True)
        f.write("\n")
sys.path.insert(0, REPO)

#: (seed, n_vectors, dim, m, n_codes, n_centroids, k, n_probes)
GEOMETRIES = (
    (0, 40, 4, 2, 4, 3, 7, 4),
    (1, 60, 8, 4, 4, 3, 7, 4),
    (2, 120, 16, 4, 8, 4, 10, 4),
    (3, 300, 16, 8, 8, 6, 10, 8),
    (4, 500, 32, 8, 16, 8, 10, 8),
    (5, 800, 32, 8, 16, 8, 10, 8),
)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--probes", type=int, default=6,
                    help="probe vectors per geometry")
    args = ap.parse_args()

    import numpy as np
    from pyspark.sql import functions as F

    from pydala_spark.operators.ann import (
        ivf_pq_topk,
        kmeans_centroids,
        train_residual_pq,
    )
    from pydala_spark.operators.similarity import cosine_topk
    from pydala_spark.session import get_session

    spark = get_session(app_name="deep_drive_ivfadc",
                        master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()
    results = []
    ok = True
    for seed, n, dim, m, n_codes, n_cents, k, n_probe in GEOMETRIES:
        rng = np.random.default_rng(seed)
        rows = [(i, [float(x) for x in rng.normal(size=dim)])
                for i in range(n)]
        df = spark.createDataFrame(rows, ["vec_id", "embedding"])
        cents = kmeans_centroids(df, n_centroids=n_cents, seed=seed)
        anchors, books = train_residual_pq(df, cents, m=m,
                                           n_codes=n_codes, seed=seed)
        probes = df.where(F.col("vec_id") < args.probes)
        exact = sorted(map(tuple, cosine_topk(
            df, probes, id_col="vec_id", vec_col="embedding",
            k=k).collect()))
        rr = sorted(map(tuple, ivf_pq_topk(
            df, probes, cents, books, k=k,
            n_probe_centroids=max(n_probe, n_cents),  # every cell probed
            residual=True, anchors=anchors, rerank_top=n,
        ).collect()))
        match = rr == exact
        ok = ok and match
        results.append({"seed": seed, "n": n, "dim": dim, "m": m,
                        "n_codes": n_codes, "cells": n_cents,
                        "rows_compared": len(exact), "exact": match})
        if not match:
            diff = [a for a, b in zip(exact, rr) if a != b][:5]
            print(json.dumps({"MISMATCH": {"seed": seed, "n": n,
                                           "first_diffs": diff}}))
    verdict = {"drive": "ivfadc_full_pool", "geometries": results,
               "ok": ok, "sec": round(time.time() - t0, 1)}
    print(json.dumps(verdict))
    _write_last(verdict)
    spark.stop()
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
