#!/usr/bin/env python
"""Deep drive: sub-document span dedup vs the sequential Python
reference on 500-doc corpora (round 15, VERDICT r14 #4 — the round-14
scratch drive, committed as a one-command reproducible script).

    python tools/deep_drive_span_fuzz.py [--docs 500] [--seeds 11 22] \
        [--params "20,8,50,2" "12,6,40,2" "20,8,50,3"]

Builds seeded pseudo-random corpora with planted shared passages at
random offsets (the committed 30-doc fuzz's generator, scaled), runs
`operators.dedup.duplicate_spans` distributed, and compares EVERY
(doc, span_start, span_end) against `_py_duplicate_spans` — the
sequential reference implementation imported from
tests/test_operators.py so the two can never drift apart.

On-demand, NOT part of the default suite: run after touching
dedup.duplicate_spans / winnowing staging. Exit 0 = exact agreement on
every seed x parameter combo; prints one JSON line.
"""

from __future__ import annotations

import argparse
import hashlib
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
    out = os.path.join(REPO, "tools", "deep_drive_span_fuzz_last.json")
    with open(out, "w") as f:
        json.dump({**verdict, "argv": sys.argv[1:]}, f, indent=1,
                  sort_keys=True)
        f.write("\n")
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def build_corpus(seed: int, n_docs: int) -> dict[int, str]:
    """The committed fuzz generator (tests/test_operators.py::
    test_duplicate_spans_randomized_fuzz) scaled: every 3rd doc carries
    shared passage A, every 3rd+1 passage B, the rest are pure body."""
    def words(tag, n):
        return " ".join(
            hashlib.md5(f"{seed}|{tag}|{j}".encode()).hexdigest()[:5]
            for j in range(n)
        )

    shared_a = words("passage-a", 18)
    shared_b = words("passage-b", 15)
    texts = {}
    for i in range(n_docs):
        h = hashlib.md5(f"{seed}|doc|{i}".encode()).digest()
        body = words(f"body|{i}", 25)
        cut = (h[0] % 20) * 5
        if i % 3 == 0:
            texts[i] = body[:cut] + " " + shared_a + " " + body[cut:]
        elif i % 3 == 1:
            texts[i] = body[:cut] + " " + shared_b + " " + body[cut:]
        else:
            texts[i] = body
    return texts


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=500)
    ap.add_argument("--seeds", type=int, nargs="+", default=[11, 22])
    ap.add_argument("--params", nargs="+",
                    default=["20,8,50,2", "12,6,40,2", "20,8,50,3"],
                    help="k,window,min_span,min_df combos")
    args = ap.parse_args()

    from pydala_spark.operators.dedup import duplicate_spans
    from pydala_spark.session import get_session
    from test_operators import _py_duplicate_spans  # sequential reference

    spark = get_session(app_name="deep_drive_span_fuzz",
                        master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()
    combos = []
    ok = True
    for seed in args.seeds:
        texts = build_corpus(seed, args.docs)
        df = spark.createDataFrame(list(texts.items()),
                                   ["doc_id", "text"])
        for combo in args.params:
            k, window, min_span, min_df = map(int, combo.split(","))
            want = _py_duplicate_spans(texts, k, window, min_span, min_df)
            got: dict[int, list] = {}
            for r in duplicate_spans(
                df, "doc_id", k=k, window=window,
                min_span=min_span, min_df=min_df,
            ).collect():
                got.setdefault(r["id"], []).append(
                    (r["span_start"], r["span_end"]))
            got = {i: sorted(v) for i, v in got.items()}
            match = got == want
            ok = ok and match
            combos.append({"seed": seed, "params": combo,
                           "docs_flagged": len(want), "exact": match})
            if not match:
                diff = {i for i in set(want) ^ set(got)} | {
                    i for i in set(want) & set(got)
                    if want[i] != got[i]}
                print(json.dumps({"MISMATCH": combo, "seed": seed,
                                  "docs": sorted(diff)[:10]}))
    verdict = {"drive": "span_fuzz", "docs": args.docs,
               "combos": combos, "ok": ok,
               "sec": round(time.time() - t0, 1)}
    print(json.dumps(verdict))
    _write_last(verdict)
    spark.stop()
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
