#!/usr/bin/env python
"""Deep drive: streaming dedup at ~30x suite scale with multi-run
checkpoint resume (round 15, closing VERDICT r14 #4 / nit 3 — the
round-14 scratch drives, committed as a one-command reproducible
script; the committed small versions live in tests/test_operators.py
and tests/test_skew_stateful.py).

    python tools/deep_drive_streaming.py [--seed 9]

Phase 1 — exact streaming_dedup over 5000 docs / 10 files / 3 RESUMED
runs (shared checkpoint, availableNow, maxFilesPerTrigger=1): across
all runs the sink must hold every distinct content fingerprint EXACTLY
once — duplicates planted within files, across files, and across runs
all collapse; distinct docs all survive.

Phase 2 — streaming_semantic_dedup over 1200 vectors / 12 micro-
batches / 4 RESUMED runs under one pinned codebook: the streamed
survivor set must equal batch semantic_dedup's kept set on the same
frame (in-order arrival, mutually-similar clone groups — the
documented equality conditions).

On-demand, NOT part of the default suite. Exit 0 = both phases exact;
prints one JSON line per phase + a summary line.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _write_last(verdict: dict) -> None:
    """Durable greenness record (round 16, VERDICT r15 #2): persist the
    verdict JSON beside the script after every run, so COVERAGE.md's
    "drives green" claim is checkable/diffable without re-running the
    drive. Committed after a green run; the next run overwrites it."""
    out = os.path.join(REPO, "tools", "deep_drive_streaming_last.json")
    with open(out, "w") as f:
        json.dump({**verdict, "argv": sys.argv[1:]}, f, indent=1,
                  sort_keys=True)
        f.write("\n")
sys.path.insert(0, REPO)

WORK = "/tmp/deep_drive_streaming"


def drive_exact_dedup(spark, seed: int) -> dict:
    from pyspark.sql import functions as F

    from pydala_spark.operators.textstats import fingerprint
    from pydala_spark.streaming import streaming_dedup

    src = f"{WORK}/dedup_src"
    out = f"{WORK}/dedup_out"
    ckpt = f"{WORK}/dedup_ckpt"
    for d in (src, out, ckpt):
        shutil.rmtree(d, ignore_errors=True)

    def text(j: int) -> str:
        return " ".join(
            hashlib.md5(f"{seed}|pool{j}|{w}".encode()).hexdigest()[:5]
            for w in range(9))

    # 5000 docs over 10 files: doc i reuses pool entry i % 3500, so
    # 1500 duplicates land within files, across files, and across runs
    n_docs, n_files, n_pool = 5000, 10, 3500
    per_file = n_docs // n_files
    rows_all = [(i, text(i % n_pool)) for i in range(n_docs)]
    schema = "doc_id long, text string"

    def land(f: int):
        # files ARRIVE in the watched dir between runs (append mode
        # writes one part file per call into the one streaming source)
        spark.createDataFrame(
            rows_all[f * per_file:(f + 1) * per_file], schema
        ).coalesce(1).write.mode("append").parquet(src)

    def run():
        # one resumed run: fresh query, same checkpoint -> state carries
        stream = spark.readStream.schema(schema) \
            .option("maxFilesPerTrigger", "1").parquet(src)
        q = (streaming_dedup(stream, text_col="text")
             .writeStream.outputMode("append").format("parquet")
             .option("path", out).option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(300)

    landed = 0
    for upto in (4, 7, 10):  # 3 resumed runs over 10 arriving files
        while landed < upto:
            land(landed)
            landed += 1
        run()

    emitted = spark.read.parquet(out)
    n_emitted = emitted.count()
    fp = F.coalesce(fingerprint("text"),
                    F.md5(F.concat(F.lit("\x00raw\x00"),
                                   F.coalesce(F.col("text"), F.lit("")))))
    n_emitted_fps = emitted.select(fp.alias("f")).distinct().count()
    corpus_fps = spark.createDataFrame(rows_all, schema) \
        .select(fp.alias("f")).distinct().count()
    ok = (n_emitted == n_emitted_fps == corpus_fps == n_pool)
    return {"phase": "exact_dedup", "docs": n_docs, "files": n_files,
            "resumed_runs": 3, "distinct_fingerprints": corpus_fps,
            "emitted_rows": n_emitted,
            "emitted_distinct_fps": n_emitted_fps,
            "every_fp_exactly_once": ok, "ok": ok}


def drive_semantic(spark, seed: int) -> dict:
    import numpy as np

    from pydala_spark.operators.similarity import semantic_dedup
    from pydala_spark.streaming.stateful import streaming_semantic_dedup

    src = f"{WORK}/sem_src"
    out = f"{WORK}/sem_out"
    ckpt = f"{WORK}/sem_ckpt"
    for d in (src, out, ckpt):
        shutil.rmtree(d, ignore_errors=True)

    rng = np.random.default_rng(seed)
    dim, n_files, per_file = 16, 12, 100
    cents = [[float(x) for x in v]
             for v in rng.normal(size=(8, dim))]
    # 1200 vectors in strictly increasing id order; 60 clone groups:
    # a group's FIRST member is a fresh random vector, each later
    # member (1-3 more, spread over later positions/files) is an exact
    # clone — mutually similar, in-order arrival: both equality
    # conditions of the committed test, at 30x its scale
    rows: list = []
    clones_of: dict[int, int] = {}
    originals: list[int] = []
    for i in range(n_files * per_file):
        make_clone = originals and rng.random() < 0.12
        if make_clone:
            src_i = int(rng.choice(originals))
            rows.append((i, rows[src_i][1]))
            clones_of[i] = src_i
        else:
            v = [float(x) for x in rng.normal(size=dim)]
            rows.append((i, v))
            originals.append(i)
    schema = "vec_id long, embedding array<double>"

    df_all = spark.createDataFrame(rows, schema)
    batch_kept = {
        r["id"] for r in semantic_dedup(
            df_all, cents, threshold=0.98).collect() if r["kept"]
    }

    def land(f: int):
        spark.createDataFrame(
            rows[f * per_file:(f + 1) * per_file], schema
        ).coalesce(1).write.mode("append").parquet(src)

    def run():
        stream = spark.readStream.schema(schema) \
            .option("maxFilesPerTrigger", "1").parquet(src)
        q = (streaming_semantic_dedup(stream, cents, threshold=0.98)
             .writeStream.outputMode("append").format("parquet")
             .option("path", out).option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(600)

    landed = 0
    for upto in (3, 6, 9, 12):  # 4 resumed runs over 12 arriving files
        while landed < upto:
            land(landed)
            landed += 1
        run()

    streamed = {r["id"] for r in spark.read.parquet(out).collect()}
    ok = streamed == batch_kept
    extra = sorted(streamed - batch_kept)[:5]
    missing = sorted(batch_kept - streamed)[:5]
    return {"phase": "semantic", "vectors": len(rows),
            "micro_batches": n_files, "resumed_runs": 4,
            "clone_groups": len(set(clones_of.values())),
            "batch_kept": len(batch_kept), "streamed_kept": len(streamed),
            "streamed_equals_batch": ok,
            "first_extra": extra, "first_missing": missing, "ok": ok}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seed", type=int, default=9)
    args = ap.parse_args()

    from pydala_spark.session import get_session

    spark = get_session(app_name="deep_drive_streaming",
                        master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()
    ok = True
    phase_results = []
    for driver in (drive_exact_dedup, drive_semantic):
        res = driver(spark, args.seed)
        ok = ok and res["ok"]
        phase_results.append(res)
        print(json.dumps(res))
    print(json.dumps({"drive": "streaming", "ok": ok,
                      "sec": round(time.time() - t0, 1)}))
    _write_last({"drive": "streaming", "ok": ok,
                 "phases": phase_results,
                 "sec": round(time.time() - t0, 1)})
    spark.stop()
    shutil.rmtree(WORK, ignore_errors=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
