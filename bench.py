#!/usr/bin/env python
"""Benchmark: run the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE JSON line.

Measures wall time to fully materialize each query result (collect), after
a session warm-up query so JVM/codegen startup isn't billed to q01.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from pydala_spark.queries import QUERIES  # noqa: E402
from pydala_spark.session import get_session  # noqa: E402

#: queries timed in the headline number: the TPC-H-ish relational core +
#: one representative of each extension family (dedup, similarity, text).
HEADLINE = [
    "q01_pricing_summary",
    "q03_shipping_priority",
    "q04_order_priority",
    "q05_local_supplier",
    "q06_revenue_change",
    "q08_market_share",
    "q10_returned_items",
    "q_top_customers",
    "q_window_topk",
    "q_dedup_keep_last",
    "q_time_bucket_daily",
    "q_sessionize",
    "q_asof_purchase",
    "q_delta_diff_events",
    "q_minhash_lsh",
    "q_simhash",
    "q_token_freq",
    "q_cosine_topk",
    "q_embedding_neardup",
]

#: round-6 rebaseline (VERDICT r5 #5): rounds 3-5's flagship operators
#: were invisible to the bench. The legacy HEADLINE block stays frozen
#: for cross-round continuity; this EXTENDED block is timed separately
#: and reported beside it ("extended"/"extended_total") so perf
#: regressions in the newer operator families show up round-over-round.
EXTENDED = [
    "q_pq_topk",              # IVF-PQ / residual IVFADC ANN search
    "q_semantic_dedup",       # SemDeDup + embedding decontamination
    "q_fingerprint_winnowing",  # winnowing (MOSS) fingerprints + contam
    "q_decontaminate",        # n-gram benchmark decontamination
    "q_shard_packing",        # token-budget shard packing
    "q_stats_summary",        # moments/quantiles + LM perplexity (ppl)
    "q_lang_predict",         # two-stage language ID + confidence
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    # machine-state recording (VERDICT r9 #1): two straight rounds of
    # driver-bench noise (r8 bimodal, r9 uniform ~1.8x inflation) each
    # cost a judge re-run. Record loadavg at start/end so the artifact
    # classifies itself; SCALE.md documents the accept/reject rule.
    # settle-and-retry (VERDICT r10 #1): classifying noise wasn't enough —
    # BENCH_r10 landed quiet:false purely because the driver benched at
    # loadavg 3.81 right after the scale probe. Before the measured block,
    # wait for the 1-min loadavg to drop below the quiet gate (bounded:
    # SETTLE_MAX_ATTEMPTS x SETTLE_WAIT_S, ~10 min worst case), then
    # proceed either way and record the attempts so the artifact shows
    # whether it settled or gave up. Disable with SPARK_GRAFT_NO_SETTLE=1
    # (used by tests and by anyone who wants the old fire-and-classify).
    settle_attempts = 0
    if os.environ.get("SPARK_GRAFT_NO_SETTLE", "") != "1":
        max_attempts = int(os.environ.get("SPARK_GRAFT_SETTLE_ATTEMPTS", "10"))
        wait_s = float(os.environ.get("SPARK_GRAFT_SETTLE_WAIT_S", "60"))
        while os.getloadavg()[0] >= 2.0 and settle_attempts < max_attempts:
            settle_attempts += 1
            print(
                f"[bench] loadavg {os.getloadavg()[0]:.2f} >= 2.0; "
                f"settle wait {settle_attempts}/{max_attempts}",
                file=sys.stderr,
            )
            time.sleep(wait_s)
    loadavg_start = [round(x, 2) for x in os.getloadavg()]
    spark = get_session(app_name="pydala_spark_bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm-up: run every headline shape once at the smallest SF so JVM
    # JIT + whole-stage-codegen compilation isn't billed to the timed
    # runs (timed runs still scan/compute the full sf_dir data)
    warm_dir = "/root/testdata/sf0.001"
    if not os.path.isdir(warm_dir):
        warm_dir = sf_dir
    for name in HEADLINE + EXTENDED:
        QUERIES[name](spark, warm_dir).collect()

    # best-of-3 per query: the local bench sits at the ~0.3-1 s JVM/
    # planning floor, where GC and machine-load jitter would otherwise
    # drown the round-over-round signal. Per-run totals are kept so the
    # artifact records its own run-to-run spread ("runs" below).
    def run_block(names: list[str]) -> tuple[dict[str, float], list[float]]:
        timings: dict[str, float] = {}
        run_totals = [0.0, 0.0, 0.0]
        for name in names:
            best = float("inf")
            for i in range(3):
                t0 = time.time()
                rows = QUERIES[name](spark, sf_dir).collect()
                dt = time.time() - t0
                run_totals[i] += dt
                best = min(best, dt)
                del rows
            timings[name] = round(best, 3)
        return timings, [round(t, 3) for t in run_totals]

    timings, headline_runs = run_block(HEADLINE)
    extended, extended_runs = run_block(EXTENDED)
    total = round(sum(timings.values()), 3)
    loadavg_end = [round(x, 2) for x in os.getloadavg()]
    # self-classifying noise verdict (SCALE.md "Bench accept/reject"):
    # a run is QUIET when the 1-min loadavg at start is below ~2 (the
    # bench itself pushes it up, so only the start value is gating) and
    # headline runs 2 and 3 agree within 25% (run 1 carries residual
    # JIT past the warm-up and is systematically slower — measured
    # ~+35% even on an idle host — so it never votes). Anything else
    # is marked noisy and should be read against the r6+ band, not
    # the immediately prior round.
    tail_runs = headline_runs[1:]
    spread = (max(tail_runs) - min(tail_runs)) / max(min(tail_runs), 1e-9)
    quiet = loadavg_start[0] < 2.0 and spread < 0.25
    print(
        json.dumps(
            {
                # "value"/"queries" stay the FROZEN legacy block so
                # BENCH_r{N}.json remains comparable across every round;
                # the round-6+ operator families report beside them
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "extended": extended,
                "extended_total": round(sum(extended.values()), 3),
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                # machine-state + noise self-diagnosis (VERDICT r9 #1)
                "loadavg_start": loadavg_start,
                "loadavg_end": loadavg_end,
                "headline_runs": headline_runs,
                "extended_runs": extended_runs,
                "quiet": quiet,
                "settle_attempts": settle_attempts,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
