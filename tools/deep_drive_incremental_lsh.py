#!/usr/bin/env python
"""Deep drive: the partial-incremental LSH theorem over 12 seeded
corpora of 200-400 docs (round 15, VERDICT r14 #4 — the round-14
scratch drive, committed as a one-command reproducible script).

    python tools/deep_drive_incremental_lsh.py [--corpora 12] \
        [--min-docs 200] [--max-docs 400]

For each seeded corpus (varied duplicate rates, changed subsets,
hash/band counts and bucket caps): build yesterday's pairs over the
unchanged subset, then assert `lsh_candidate_pairs_delta` over today's
corpus returns EXACTLY `lsh_candidate_pairs` run from scratch — or
refuses (None) only on a GENUINE cap-status transition (the over-cap
bucket sets of yesterday and today differ), which is the documented
fall-back-to-full contract (operators/dedup.py, delta path).

On-demand, NOT part of the default suite (the committed 6-seed
20-50-doc version lives in tests/test_operators.py::
test_lsh_delta_equals_full_fuzz). Exit 0 = every corpus either exact
or a verified-legal refusal; prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import random
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _write_last(verdict: dict) -> None:
    """Durable greenness record (round 16, VERDICT r15 #2): persist the
    verdict JSON beside the script after every run, so COVERAGE.md's
    "drives green" claim is checkable/diffable without re-running the
    drive. Committed after a green run; the next run overwrites it."""
    out = os.path.join(REPO, "tools",
                       "deep_drive_incremental_lsh_last.json")
    with open(out, "w") as f:
        json.dump({**verdict, "argv": sys.argv[1:]}, f, indent=1,
                  sort_keys=True)
        f.write("\n")
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpora", type=int, default=12)
    ap.add_argument("--min-docs", type=int, default=200)
    ap.add_argument("--max-docs", type=int, default=400)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from pydala_spark.operators.dedup import (
        lsh_buckets,
        lsh_candidate_pairs,
        lsh_candidate_pairs_delta,
        minhash_signatures,
    )
    from pydala_spark.session import get_session

    spark = get_session(app_name="deep_drive_incremental_lsh",
                        master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()
    words = [f"tok{i}" for i in range(60)]
    rows_out = []
    equal = refused = 0
    ok = True
    for seed in range(args.corpora):
        rng = random.Random(1000 + seed)
        n_docs = rng.randint(args.min_docs, args.max_docs)
        dup_groups = rng.randint(2, 8)
        templates = [
            " ".join(rng.choice(words) for _ in range(10))
            for _ in range(dup_groups)
        ]
        rows = []
        for i in range(n_docs):
            if rng.random() < 0.4:
                rows.append((i, rng.choice(templates)))
            else:
                rows.append((i, " ".join(
                    rng.choice(words) for _ in range(10))))
        docs = spark.createDataFrame(rows, ["doc_id", "text"])
        changed_mod = rng.choice([3, 5, 7, 11])
        cap = rng.choice([None, 3, 6, 12])
        n_hashes = rng.choice([8, 12, 16])
        n_bands = rng.choice([2, 4])

        yesterday = docs.where(F.col("doc_id") % changed_mod != 0)
        sig_y = minhash_signatures(yesterday, "doc_id", "text",
                                   n_hashes=n_hashes, shingle_size=3)
        prior = lsh_candidate_pairs(sig_y, "doc_id", n_bands=n_bands,
                                    max_bucket_size=cap,
                                    log_dropped=False)
        prior_overcap = []
        if cap is not None:
            prior_overcap = [
                (int(r["band_id"]), r["band_hash"])
                for r in lsh_buckets(sig_y, "doc_id", n_bands)
                .where(F.size("ids") > cap)
                .select("band_id", "band_hash").collect()
            ]
        sig_t = minhash_signatures(docs, "doc_id", "text",
                                   n_hashes=n_hashes, shingle_size=3)
        full = sorted(map(tuple, lsh_candidate_pairs(
            sig_t, "doc_id", n_bands=n_bands, max_bucket_size=cap,
            log_dropped=False).collect()))
        delta = lsh_candidate_pairs_delta(
            sig_t, "doc_id",
            is_changed=(F.col("doc_id") % changed_mod == 0),
            prior_pairs_unchanged=prior,
            prior_overcap=prior_overcap,
            n_bands=n_bands, max_bucket_size=cap,
        )
        row = {"seed": seed, "docs": n_docs, "n_hashes": n_hashes,
               "n_bands": n_bands, "cap": cap,
               "changed_mod": changed_mod, "full_pairs": len(full)}
        if delta is None:
            legal = cap is not None
            if legal:
                today_over = {
                    (int(r["band_id"]), r["band_hash"])
                    for r in lsh_buckets(sig_t, "doc_id", n_bands)
                    .where(F.size("ids") > cap)
                    .select("band_id", "band_hash").collect()
                }
                legal = today_over != set(prior_overcap)
            row["verdict"] = "legal_cap_refusal" if legal else "ILLEGAL"
            refused += 1
            ok = ok and legal
        else:
            got = sorted(map(tuple, delta.collect()))
            row["verdict"] = "delta==full" if got == full else "MISMATCH"
            equal += got == full
            ok = ok and got == full
        rows_out.append(row)
    verdict = {"drive": "incremental_lsh",
               "corpora": rows_out,
               "delta_equals_full": equal,
               "legal_refusals": refused, "ok": ok,
               "sec": round(time.time() - t0, 1)}
    print(json.dumps(verdict))
    _write_last(verdict)
    spark.stop()
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
