#!/usr/bin/env python
"""Deep drive: the three lake-global sweeps + decontaminate on
8-dataset lakes, each driven full -> fresh -> mutate-2-of-8 -> partial,
then STATE-WIPED and rebuilt from scratch with partial == full-rebuild
verdict equality (round 15, VERDICT r14 #4 — the round-14 scratch
drive, committed as a one-command reproducible script; the committed
2-3-dataset versions live in tests/test_lake_sweeps*.py).

    python tools/deep_drive_lake_sweeps.py [--seed 5] [--datasets 8] \
        [--phases neardup,semantic,span,decon]

Phases (all seeded, ~1150-1500 docs / ~1250 vectors per lake):
- neardup: 12 cross-dataset dup families; partial night's verdict
  table (dataset, id, cluster, kept, rep_*) must equal a full sweep
  rebuilt after wiping `_neardup/`.
- semantic: 10 cross-dataset near-dup vector groups, scored survivors,
  LAKE-PINNED codebook kept across the state wipe (wiping
  `_semantic_dedup/` but not `_codebooks/` — retraining would shift
  cell boundaries, the documented rotation contract).
- span: lake-wide duplicated-span report incl. the df 1->2 flip (the
  mutation's new copy must propagate a span into an UNCHANGED
  dataset); `_span_dedup/_spans` equality after wiping `_span_dedup/`.
- decon: two 25-question benchmarks, planted leaks of varied widths
  (57 at the default seed/datasets); incremental verdicts ==
  state-wiped rebuild == planted ground truth, zero false +/-.

On-demand, NOT part of the default suite. Exit 0 = every phase exact;
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
    out = os.path.join(REPO, "tools", "deep_drive_lake_sweeps_last.json")
    with open(out, "w") as f:
        json.dump({**verdict, "argv": sys.argv[1:]}, f, indent=1,
                  sort_keys=True)
        f.write("\n")
sys.path.insert(0, REPO)

WORK = "/tmp/deep_drive_lake_sweeps"


def words(tag: str, n: int) -> str:
    """n seeded pseudo-random 5-char words — tags never collide across
    phases/datasets, so unrelated docs can share no shingle."""
    return " ".join(
        hashlib.md5(f"{tag}|{j}".encode()).hexdigest()[:5]
        for j in range(n)
    )


def table_rows(spark, path: str, cols=None):
    df = spark.read.parquet(path)
    use = cols or sorted(df.columns)
    return sorted(map(tuple, df.select(*use).collect()))


def drive_neardup(spark, seed: int, n_ds: int) -> dict:
    from pydala_spark.catalog import Datalake

    root = f"{WORK}/neardup"
    shutil.rmtree(root, ignore_errors=True)
    lake = Datalake(spark, root)
    names = [f"d{i}" for i in range(n_ds)]
    # 12 cross-dataset dup families of size 2-4: family f's template
    # text is planted (one doc) into each member dataset
    families = {}
    for f in range(12):
        size = 2 + f % 3
        members = [(f + j * 3) % n_ds for j in range(size)]
        families[f] = (words(f"{seed}|fam{f}", 12), sorted(set(members)))
    per_ds_rows: dict[str, list] = {d: [] for d in names}
    nid = 0
    for f, (text, members) in families.items():
        for m in members:
            per_ds_rows[names[m]].append((nid, text))
            nid += 1
    for i, d in enumerate(names):
        base = 10_000 * (i + 1)
        for j in range(180):
            per_ds_rows[d].append((base + j, words(f"{seed}|{d}|u{j}", 10)))
        spark.createDataFrame(per_ds_rows[d], ["doc_id", "text"]) \
            .write.parquet(os.path.join(root, d))
        lake.add_dataset(d)
    n_docs = sum(len(v) for v in per_ds_rows.values())

    r1 = lake.neardup_dedup(incremental=True)
    r2 = lake.neardup_dedup(incremental=True)
    # mutate 2 of 8: d1 gains a member of family 0, d2 a member of
    # family 5, and a brand-new family spans exactly d1+d2
    new_fam = words(f"{seed}|famX", 12)
    spark.createDataFrame(
        [(90_001, families[0][0]), (90_002, new_fam)],
        ["doc_id", "text"],
    ).write.mode("append").parquet(os.path.join(root, names[1]))
    spark.createDataFrame(
        [(90_011, families[5][0]), (90_012, new_fam)],
        ["doc_id", "text"],
    ).write.mode("append").parquet(os.path.join(root, names[2]))
    r3 = lake.neardup_dedup(incremental=True)
    v_part = table_rows(spark, os.path.join(root, "_neardup", "_verdicts"),
                        ["dataset", "id", "cluster", "kept",
                         "rep_dataset", "rep_id"])
    # state-wiped rebuild: same lake, sweep state gone, full from scratch
    shutil.rmtree(os.path.join(root, "_neardup"))
    rf = lake.neardup_dedup()
    v_full = table_rows(spark, os.path.join(root, "_neardup", "_verdicts"),
                        ["dataset", "id", "cluster", "kept",
                         "rep_dataset", "rep_id"])
    ok = (r1["_sweep_mode"] == "full" and r2["_sweep_mode"] == "fresh"
          and r3["_sweep_mode"] == "partial" and v_part == v_full
          and r3["_lake"]["n_clusters"] == rf["_lake"]["n_clusters"])
    return {"phase": "neardup", "docs": n_docs + 4,
            "modes": [r1["_sweep_mode"], r2["_sweep_mode"],
                      r3["_sweep_mode"]],
            "edges": r3["_edges"], "clusters": rf["_lake"]["n_clusters"],
            "verdict_rows": len(v_full),
            "partial_equals_wiped_full": v_part == v_full, "ok": ok}


def drive_semantic(spark, seed: int, n_ds: int) -> dict:
    import numpy as np

    from pydala_spark.catalog import Datalake

    root = f"{WORK}/semantic"
    shutil.rmtree(root, ignore_errors=True)
    lake = Datalake(spark, root)
    names = [f"e{i}" for i in range(n_ds)]
    rng = np.random.default_rng(seed)
    anchors = rng.normal(size=(6, 8))
    # 10 cross-dataset near-dup groups: the group vector is planted
    # EXACTLY into 2-3 datasets (threshold 0.999 pairs only clones)
    groups = [( [float(x) for x in anchors[g % 6] + rng.normal(
        scale=0.25, size=8)], [(g + j * 5) % n_ds for j in range(2 + g % 2)])
        for g in range(10)]
    nid = 0
    per_ds: dict[str, list] = {d: [] for d in names}
    for vec, members in groups:
        for m in sorted(set(members)):
            per_ds[names[m]].append((nid, vec, 0.9 - nid * 0.001))
            nid += 1
    for i, d in enumerate(names):
        base = 10_000 * (i + 1)
        for j in range(150):
            v = [float(x) for x in anchors[j % 6]
                 + rng.normal(scale=0.25, size=8)]
            per_ds[d].append((base + j, v, 0.5))
        spark.createDataFrame(
            per_ds[d], "vec_id long, embedding array<double>, q double"
        ).write.parquet(os.path.join(root, d))
        lake.add_dataset(d)
    n_vecs = sum(len(v) for v in per_ds.values())

    kw = dict(threshold=0.999, n_centroids=4, score_col="q",
              cross_dataset=True, incremental=True, seed=seed)
    r1 = lake.semantic_dedup(**kw)
    r2 = lake.semantic_dedup(**kw)
    # mutate 2 of 8: clones of group 0 land in e3, of group 7 in e4
    spark.createDataFrame(
        [(90_001, groups[0][0], 0.05)],
        "vec_id long, embedding array<double>, q double",
    ).write.mode("append").parquet(os.path.join(root, names[3]))
    spark.createDataFrame(
        [(90_011, groups[7][0], 0.99)],
        "vec_id long, embedding array<double>, q double",
    ).write.mode("append").parquet(os.path.join(root, names[4]))
    r3 = lake.semantic_dedup(**kw)
    v_part = table_rows(spark,
                        os.path.join(root, "_semantic_dedup", "_verdicts"))
    # state-wiped rebuild KEEPING the lake-pinned codebook
    assert os.path.exists(os.path.join(root, "_codebooks",
                                       "semantic_dedup.json"))
    shutil.rmtree(os.path.join(root, "_semantic_dedup"))
    rf = lake.semantic_dedup(threshold=0.999, n_centroids=4,
                             score_col="q", cross_dataset=True, seed=seed)
    v_full = table_rows(spark,
                        os.path.join(root, "_semantic_dedup", "_verdicts"))
    ok = (r1["_sweep_mode"] == "full" and r2["_sweep_mode"] == "fresh"
          and r3["_sweep_mode"] == "partial" and v_part == v_full
          and r3["_lake"]["n_dropped"] == rf["_lake"]["n_dropped"])
    return {"phase": "semantic", "vectors": n_vecs + 2,
            "modes": [r1["_sweep_mode"], r2["_sweep_mode"],
                      r3["_sweep_mode"]],
            "dropped": rf["_lake"]["n_dropped"],
            "verdict_rows": len(v_full),
            "partial_equals_wiped_full": v_part == v_full, "ok": ok}


def drive_span(spark, seed: int, n_ds: int) -> dict:
    from pydala_spark.catalog import Datalake

    root = f"{WORK}/span"
    shutil.rmtree(root, ignore_errors=True)
    lake = Datalake(spark, root)
    names = [f"s{i}" for i in range(n_ds)]
    boiler_l = words(f"{seed}|boilerL", 20)  # lake df >= 2: flagged
    boiler_m = words(f"{seed}|boilerM", 20)  # df 1 until the mutation
    per_ds: dict[str, list] = {d: [] for d in names}
    for i, d in enumerate(names):
        base = 10_000 * (i + 1)
        for j in range(140):
            per_ds[d].append((base + j, words(f"{seed}|{d}|b{j}", 16)))
    # boiler_l into datasets 0,1,5 (df=3); boiler_m ONCE into dataset 6
    for i in (0, 1, 5):
        per_ds[names[i]].append(
            (20_000 + i, words(f"{seed}|pre{i}", 6) + " " + boiler_l
             + " " + words(f"{seed}|post{i}", 6)))
    per_ds[names[6]].append(
        (21_000, words(f"{seed}|preM", 6) + " " + boiler_m + " "
         + words(f"{seed}|postM", 6)))
    for d in names:
        spark.createDataFrame(per_ds[d], ["doc_id", "text"]) \
            .write.parquet(os.path.join(root, d))
        lake.add_dataset(d)
    n_docs = sum(len(v) for v in per_ds.values())

    kw = dict(min_df=2, min_span=50, incremental=True)
    r1 = lake.span_dedup_report(**kw)
    flip_before = r1[names[6]]["n_spans"]
    r2 = lake.span_dedup_report(**kw)
    # mutate 2 of 8: s2 gains a SECOND copy of boiler_m — its df flips
    # 1 -> 2, so the UNCHANGED dataset s6's doc must gain a span; s3
    # gains another boiler_l carrier (df 3 -> 4, spans unchanged class)
    spark.createDataFrame(
        [(90_001, words(f"{seed}|preM2", 6) + " " + boiler_m + " "
          + words(f"{seed}|postM2", 6))], ["doc_id", "text"],
    ).write.mode("append").parquet(os.path.join(root, names[2]))
    spark.createDataFrame(
        [(90_011, words(f"{seed}|preL2", 6) + " " + boiler_l + " "
          + words(f"{seed}|postL2", 6))], ["doc_id", "text"],
    ).write.mode("append").parquet(os.path.join(root, names[3]))
    r3 = lake.span_dedup_report(**kw)
    flip_after = r3[names[6]]["n_spans"]
    v_part = table_rows(spark, os.path.join(root, "_span_dedup", "_spans"),
                        ["dataset", "id", "span_start", "span_end"])
    shutil.rmtree(os.path.join(root, "_span_dedup"))
    rf = lake.span_dedup_report(min_df=2, min_span=50)
    v_full = table_rows(spark, os.path.join(root, "_span_dedup", "_spans"),
                        ["dataset", "id", "span_start", "span_end"])
    ok = (r1["_sweep_mode"] == "full" and r2["_sweep_mode"] == "fresh"
          and r3["_sweep_mode"] == "partial" and v_part == v_full
          and flip_before == 0 and flip_after >= 1
          and r3["_lake"]["n_spans"] == rf["_lake"]["n_spans"])
    return {"phase": "span", "docs": n_docs + 2,
            "modes": [r1["_sweep_mode"], r2["_sweep_mode"],
                      r3["_sweep_mode"]],
            "unchanged_ds_span_flip": [flip_before, flip_after],
            "lake_spans": rf["_lake"]["n_spans"],
            "partial_equals_wiped_full": v_part == v_full, "ok": ok}


def drive_decon(spark, seed: int, n_ds: int) -> dict:
    from pydala_spark.catalog import Datalake

    root = f"{WORK}/decon"
    shutil.rmtree(root, ignore_errors=True)
    lake = Datalake(spark, root)
    names = [f"c{i}" for i in range(n_ds)]
    # two 25-question benchmarks
    bench_q = {b: [words(f"{seed}|bench{b}|q{q}", 14) for q in range(25)]
               for b in ("evalA", "evalB")}
    benchmarks = {
        b: spark.createDataFrame(list(enumerate(qs)), ["doc_id", "text"])
        for b, qs in bench_q.items()
    }
    # 57 planted leaks of varied widths: a prefix slice of the question
    # (>= 60 chars keeps >= 2 winnowing fingerprints at k=8/window=4)
    truth: dict[str, set] = {d: set() for d in names}
    per_ds: dict[str, list] = {d: [] for d in names}
    for i, d in enumerate(names):
        base = 10_000 * (i + 1)
        for j in range(155):
            per_ds[d].append((base + j, words(f"{seed}|{d}|f{j}", 14)))
    for n in range(57):
        d = names[n % n_ds]
        b = "evalA" if n % 2 == 0 else "evalB"
        q = bench_q[b][n % 25]
        width = 60 + (n * 7) % (len(q) - 60)  # varied leak widths
        leak = q[:width]
        doc_id = 50_000 + n
        per_ds[d].append(
            (doc_id, words(f"{seed}|pre{n}", 4) + " " + leak + " "
             + words(f"{seed}|post{n}", 4)))
        truth[d].add(doc_id)
    for d in names:
        spark.createDataFrame(per_ds[d], ["doc_id", "text"]) \
            .write.parquet(os.path.join(root, d))
        lake.add_dataset(d)
    n_docs = sum(len(v) for v in per_ds.values())

    def flagged(res) -> dict[str, set]:
        out = {}
        for d in names:
            rep = res[d].get("report")
            out[d] = set(
                int(r["id"]) for r in
                spark.read.parquet(rep).select("id").collect()
            ) if rep and os.path.isdir(rep) else set()
        return out

    r1 = lake.decontaminate(benchmarks, incremental=True)
    r2 = lake.decontaminate(benchmarks, incremental=True)
    fresh_ok = all(r2[d].get("fresh", "").startswith("unchanged")
                   for d in names)
    # mutate 2 of 8: two fresh leaks land in c5 and c6
    for k, (d_i, b, q_i) in enumerate(((5, "evalA", 3), (6, "evalB", 9))):
        doc_id = 60_000 + k
        q = bench_q[b][q_i]
        spark.createDataFrame(
            [(doc_id, words(f"{seed}|mpre{k}", 4) + " " + q + " "
              + words(f"{seed}|mpost{k}", 4))], ["doc_id", "text"],
        ).write.mode("append").parquet(os.path.join(root, names[d_i]))
        truth[names[d_i]].add(doc_id)
    r3 = lake.decontaminate(benchmarks, incremental=True)
    got_inc = flagged(r3)
    shutil.rmtree(os.path.join(root, "_decontamination"))
    r4 = lake.decontaminate(benchmarks)
    got_full = flagged(r4)
    ok = (fresh_ok and got_inc == got_full == truth)
    return {"phase": "decon", "docs": n_docs + 2, "planted_leaks": 59,
            "fresh_night_all_skipped": fresh_ok,
            "incremental_equals_wiped_full": got_inc == got_full,
            "equals_ground_truth": got_full == truth,
            "false_pos": sum(len(got_full[d] - truth[d]) for d in names),
            "false_neg": sum(len(truth[d] - got_full[d]) for d in names),
            "ok": ok}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seed", type=int, default=5)
    ap.add_argument("--datasets", type=int, default=8)
    ap.add_argument("--phases", default="neardup,semantic,span,decon")
    args = ap.parse_args()

    from pydala_spark.session import get_session

    spark = get_session(app_name="deep_drive_lake_sweeps",
                        master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()
    drivers = {"neardup": drive_neardup, "semantic": drive_semantic,
               "span": drive_span, "decon": drive_decon}
    ok = True
    phase_results = []
    for phase in args.phases.split(","):
        res = drivers[phase](spark, args.seed, args.datasets)
        ok = ok and res["ok"]
        phase_results.append(res)
        print(json.dumps(res))
    print(json.dumps({"drive": "lake_sweeps", "ok": ok,
                      "sec": round(time.time() - t0, 1)}))
    _write_last({"drive": "lake_sweeps", "ok": ok,
                 "phases": phase_results,
                 "sec": round(time.time() - t0, 1)})
    spark.stop()
    shutil.rmtree(WORK, ignore_errors=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
