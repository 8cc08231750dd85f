#!/usr/bin/env python
"""Benchmark: run the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE JSON line.

Measures wall time to fully materialize each query result (collect), after
a session warm-up query so JVM/codegen startup isn't billed to q01.

Round 13 (VERDICT r12 #1): the artifact self-classifies against MID-RUN
co-tenant interference, which the loadavg_start + run-agreement gate
demonstrably missed (two judge runs read 12.2/15.8 s with `quiet: true`
on an unchanged tree). Each query's three timed runs are preceded by a
fixed-work CPU calibration probe (sha256 over 1 MiB x PROBE_ITERS —
deterministic, no allocation churn); the per-query probe times are
recorded in the artifact and `quiet` additionally requires every probe
near the SCALE.md-recorded idle band (band +/- PROBE_TOLERANCE) with
intra-run agreement (PROBE_MAX_SPREAD) — so a reader can see not just
THAT interference arrived mid-run but WHICH query it landed on. (The verdict asked for one probe per measured pass; probing
per query is strictly finer — ~0.4 s granularity — and was chosen
after measuring that pass-major run ordering itself inflates query
times ~60-80% through Spark codegen-cache/JIT thrash, so the three
runs of a query stay adjacent as they always were.) Primary per-query
numbers are MEDIANS of the three runs (a single GC pause can't define
a query, and unlike best-of-3 a median can't hide two corrupted runs
behind one clean one); best-of-3 is still emitted beside them for
continuity with BENCH_r12 and earlier.

The probe is single-threaded: on this 32-core host it only slows once
the machine is oversubscribed (runnable threads > cores), which is
exactly the observed interference mode (uniform inflation across all
queries). Partial contention below saturation can still hide from it
— the run-agreement gate stays on for that reason.

Round 14 (VERDICT r13 #1/#2): output is now three artifacts — the full
JSON line on stdout (unchanged shape), a durable file copy at
tools/bench_last_full.json, and a <1800-char COMPACT summary line
printed LAST so the driver's 2000-char tail capture can never again
truncate the headline medians out of BENCH_r{N}.json (round 13's full
line outgrew the window and its canonical medians were lost). The
artifact also carries `quiet_extended`: `quiet` AND no gross
memory-probe excursion (idle floor x MEM_PROBE_FACTOR), the
machine-check for the documented JVM-side blind spot where extended
queries inflate 3-4x while the driver-side cpu probes stay in-band.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

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

#: fixed-work CPU calibration probe: sha256 of a 1 MiB buffer this many
#: times. Single-threaded C-speed work — its wall time moves only when
#: the machine can't give the process a full core, i.e. exactly the
#: co-tenant contention that corrupts the query timings.
PROBE_ITERS = 600

#: idle-host probe band for THIS machine (SCALE.md "Round-13 probe
#: band"): idle sessions measured 0.409-0.438 s and 0.436-0.448 s on
#: different same-day windows (the host's effective single-core speed
#: drifts a few percent), so the band is (0.40, 0.46). A probe outside
#: band*(1 +/- PROBE_TOLERANCE) means the query it preceded ran on a
#: contended (or different) machine and the artifact must not be read
#: as comparison evidence.
PROBE_BAND = (0.40, 0.46)

#: tolerance around PROBE_BAND for the quiet verdict (VERDICT r12 #1).
#: Calibrated against a CAUGHT interference episode (SCALE.md round-13
#: probe table): contended probes read 0.455-0.489 while idle tops out
#: ~0.46, so the ceiling is band_hi*1.05 = 0.483 — 10% would have let
#: the episode through.
PROBE_TOLERANCE = 0.05

#: intra-run dispersion gate: idle runs keep all probes within ~10% of
#: each other; the caught episode spread 19% (0.411 -> 0.489) as the
#: co-tenant arrived mid-run. Checked alongside the band so a run that
#: STARTS contended (uniformly high probes, small spread) still fails
#: the band while a mid-run arrival fails the spread.
PROBE_MAX_SPREAD = 0.12

#: idle-host band for the MEMORY-bandwidth probe (SCALE.md round-13/14
#: probe notes): idle sessions on this host read 0.186-0.269 s (the
#: r13 driver artifact's 26 probes span exactly that; the live caught
#: episode's recovery value was 0.211). The idle spread (~45% during a
#: run, Spark JVM activity included) is why this probe never gates
#: `quiet` itself — only a GROSS excursion is signal.
MEM_PROBE_IDLE_BAND = (0.18, 0.27)

#: gross-excursion factor for the memory probe, applied to the idle
#: FLOOR (0.18 * 2.0 = 0.36 s ceiling). Calibrated against the caught
#: live episode (SCALE.md "Live validation of the two-probe design"):
#: JVM-side co-tenancy pushed the mem probe 0.18 -> 0.30-0.41 ("2.2x
#: floor") across exactly the six inflated extended queries while idle
#: runs top out ~0.27 — floor*2.0 = 0.36 rejects that episode's 0.41
#: peak with 34% headroom over the clean-run max; a hi-based 2x bound
#: (0.54) would have let the whole episode through.
MEM_PROBE_FACTOR = 2.0


def calibration_probe(iters: int = PROBE_ITERS) -> float:
    """Seconds to run the fixed CPU workload once. Deterministic work
    (same bytes, same digest every call), so the only variable is how
    much CPU the machine actually gives this process."""
    buf = b"\x5a" * (1 << 20)
    h = hashlib.sha256()
    t0 = time.perf_counter()
    for _ in range(iters):
        h.update(buf)
    h.digest()
    return time.perf_counter() - t0


_MEM_PROBE_ARR = None


def memory_probe(mb: int = 256, passes: int = 8) -> float:
    """Seconds to stream ``mb`` MiB through memory ``passes`` times
    (numpy sum over a cached float64 array). RECORDED ONLY — never
    gates `quiet`: its idle spread on this host is too wide (~25%) for
    an absolute band, but a gross (2x+) excursion flags the
    memory-bandwidth/IO co-tenancy the L1-bound sha256 probe is nearly
    blind to (observed: extended-block queries inflating 3-4x while
    cpu probes moved only +10-15%)."""
    global _MEM_PROBE_ARR
    import numpy as np

    if _MEM_PROBE_ARR is None:
        _MEM_PROBE_ARR = np.arange(mb * 131072, dtype=np.float64)
    t0 = time.perf_counter()
    s = 0.0
    for _ in range(passes):
        s += float(_MEM_PROBE_ARR.sum())
    assert s == s  # consume
    return time.perf_counter() - t0


def probes_in_band(
    probes: list[float],
    band: tuple[float, float] = PROBE_BAND,
    tolerance: float = PROBE_TOLERANCE,
    max_spread: float = PROBE_MAX_SPREAD,
) -> bool:
    """True when every calibration probe landed inside the idle band
    (widened by the tolerance on both sides) AND the run's probes agree
    with each other within ``max_spread``. Too-slow = contention;
    too-fast = a different machine — either way the band is invalid;
    a wide spread = interference arriving or leaving mid-run."""
    if not probes:
        return False
    lo = band[0] * (1.0 - tolerance)
    hi = band[1] * (1.0 + tolerance)
    if not all(lo <= p <= hi for p in probes):
        return False
    return (max(probes) - min(probes)) / min(probes) <= max_spread


def mem_probes_ok(
    probes: list[float],
    band: tuple[float, float] = MEM_PROBE_IDLE_BAND,
    factor: float = MEM_PROBE_FACTOR,
) -> bool:
    """True when every memory-bandwidth probe stays under the
    gross-excursion ceiling (idle floor x ``factor`` = 0.36 s).

    This is the round-14 `quiet_extended` ingredient (VERDICT r13 #2):
    the CPU probes live in the Python driver and are nearly blind to
    the co-tenancy mode that starves the 32-thread executor JVM
    (extended-block queries inflating 3-4x with cpu probes in-band —
    SCALE.md's documented blind spot). The recorded mem probe's 2x+
    excursions track that mode. Ceiling-only on purpose: "too fast"
    machine-identity is already covered by the cpu probe band, and the
    mem probe's wide idle spread makes a floor meaningless."""
    if not probes:
        return False
    return all(p <= band[0] * factor for p in probes)


def classify_quiet(
    loadavg_start: list[float],
    headline_runs: list[float],
    probes: list[float],
) -> bool:
    """Self-classifying noise verdict (SCALE.md "Bench accept/reject"):
    QUIET requires all three of
    - 1-min loadavg below ~2 at start (the bench itself pushes it up,
      so only the start value gates),
    - headline runs 2 and 3 agree within 25% (run 1 carries residual
      JIT past the warm-up and is systematically slower — measured
      ~+35% even on an idle host — so it never votes),
    - every calibration probe inside the recorded idle band (the
      round-13 gate: this is the one that sees interference ARRIVING
      MID-RUN, which the first two cannot).
    """
    tail_runs = headline_runs[1:]
    spread = (max(tail_runs) - min(tail_runs)) / max(min(tail_runs), 1e-9)
    return (
        loadavg_start[0] < 2.0
        and spread < 0.25
        and probes_in_band(probes)
    )


#: compact-summary budget: the driver wrapper stores only the LAST
#: 2000 chars of bench stdout in BENCH_r{N}.json["tail"], and round
#: 13's full artifact grew past that window, permanently truncating
#: the headline medians out of the canonical record (VERDICT r13 #1).
#: The compact line printed LAST must always fit the window whole.
COMPACT_LIMIT = 1800


def compact_summary(artifact: dict, limit: int = COMPACT_LIMIT) -> str:
    """One-line JSON summary of a full bench artifact, guaranteed
    under ``limit`` chars so the driver's 2000-char tail capture
    always contains it whole (VERDICT r13 #1). Carries the primary
    numbers a reader needs (metric, headline total, per-query +
    extended medians, noise verdicts); the full artifact — probes,
    bests, run vectors — goes to stdout one line earlier AND to
    tools/bench_last_full.json. With the frozen 26-name headline set
    the full form is ~1.2 kB (pinned by tests/test_bench.py); if the
    per-query maps ever outgrow the budget, detail is shed in a
    documented order (extended first, then queries) rather than
    emitting JSON a tail capture would cut mid-token."""
    keys = (
        "metric", "value", "unit", "timing", "queries", "extended",
        "extended_total", "sf", "quiet", "quiet_extended",
        "settle_attempts", "probes_ok", "probe_max", "dirty",
    )
    slim = {k: artifact[k] for k in keys if k in artifact}
    slim["compact"] = True
    line = json.dumps(slim, separators=(",", ":"))
    for drop in ("extended", "queries", "dirty"):
        if len(line) <= limit:
            break
        if drop not in slim:
            continue  # never claim to have dropped an absent key
        slim.pop(drop)
        slim.setdefault("compact_dropped", []).append(drop)
        line = json.dumps(slim, separators=(",", ":"))
    if len(line) > limit:
        # last-resort floor (round 15, ADVICE r14): the shed loop only
        # drops the three map keys, so a pathological fixed field (a
        # huge sf string, a future scalar) could still overflow — fall
        # back to the minimal object rather than emit a line a tail
        # capture would cut mid-token
        slim = {"metric": artifact.get("metric"),
                "value": artifact.get("value"),
                "quiet": artifact.get("quiet"),
                "compact": True,
                "compact_dropped": ["all-but-minimal"]}
        line = json.dumps(slim, separators=(",", ":"))
    assert len(line) <= limit, len(line)  # the documented guarantee
    return line


def main() -> None:
    from pydala_spark.queries import QUERIES
    from pydala_spark.session import get_session

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    # machine-state recording (VERDICT r9 #1): two straight rounds of
    # driver-bench noise (r8 bimodal, r9 uniform ~1.8x inflation) each
    # cost a judge re-run. Record loadavg at start/end so the artifact
    # classifies itself; SCALE.md documents the accept/reject rule.
    # settle-and-retry (VERDICT r10 #1): before the measured block,
    # wait for the 1-min loadavg to drop below the quiet gate (bounded:
    # SETTLE_MAX_ATTEMPTS x SETTLE_WAIT_S, ~10 min worst case), then
    # proceed either way and record the attempts so the artifact shows
    # whether it settled or gave up. Disable with SPARK_GRAFT_NO_SETTLE=1
    # (used by tests and by anyone who wants the old fire-and-classify).
    settle_attempts = 0
    if os.environ.get("SPARK_GRAFT_NO_SETTLE", "") != "1":
        max_attempts = int(os.environ.get("SPARK_GRAFT_SETTLE_ATTEMPTS", "10"))
        wait_s = float(os.environ.get("SPARK_GRAFT_SETTLE_WAIT_S", "60"))
        # round 13: the settle gate also requires an in-band calibration
        # probe — loadavg is a 1-minute average and misses a co-tenant
        # that just started, which the probe reads instantly (0.4 s).
        # Same bounded wait; the run proceeds either way and the quiet
        # verdict still judges what actually happened.
        probe_hi = PROBE_BAND[1] * (1.0 + PROBE_TOLERANCE)
        while settle_attempts < max_attempts:
            load_ok = os.getloadavg()[0] < 2.0
            probe_now = calibration_probe()
            if load_ok and probe_now <= probe_hi:
                break
            settle_attempts += 1
            print(
                f"[bench] loadavg {os.getloadavg()[0]:.2f} / probe "
                f"{probe_now:.3f} (gate <2.0, <={probe_hi:.3f}); "
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

    # query-major, median-of-3 (round 13): each query's three timed
    # runs stay adjacent (pass-major ordering was measured to inflate
    # times 60-80% via codegen-cache/JIT thrash — see module
    # docstring); a calibration probe runs immediately before each
    # query's group so mid-run interference is attributable to the
    # query it corrupted.
    mem_probes: dict[str, float] = {}

    def run_block(
        names: list[str],
    ) -> tuple[
        dict[str, float], dict[str, float], list[float], dict[str, float]
    ]:
        medians: dict[str, float] = {}
        bests: dict[str, float] = {}
        run_totals = [0.0, 0.0, 0.0]
        probes: dict[str, float] = {}
        for name in names:
            probes[name] = round(calibration_probe(), 3)
            mem_probes[name] = round(memory_probe(), 3)
            vals = []
            for i in range(3):
                t0 = time.time()
                rows = QUERIES[name](spark, sf_dir).collect()
                dt = time.time() - t0
                run_totals[i] += dt
                vals.append(dt)
                del rows
            medians[name] = round(sorted(vals)[1], 3)
            bests[name] = round(min(vals), 3)
        return medians, bests, [round(t, 3) for t in run_totals], probes

    timings, timings_best, headline_runs, headline_probes = run_block(HEADLINE)
    extended, extended_best, extended_runs, extended_probes = run_block(
        EXTENDED
    )
    total = round(sum(timings.values()), 3)
    loadavg_end = [round(x, 2) for x in os.getloadavg()]
    probes = {**headline_probes, **extended_probes}
    quiet = classify_quiet(
        loadavg_start, headline_runs, list(probes.values()))
    artifact = {
        # "value"/"queries" are per-query MEDIANS of the three
        # passes as of round 13 (the primary numbers; VERDICT
        # r12 #1) — the query LIST stays the frozen legacy
        # block so BENCH_r{N}.json remains comparable across
        # rounds, and best-of-3 is emitted beside for reading
        # r12-and-earlier artifacts (which were best-of-3).
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "timing": "median_of_3",
        "queries": timings,
        "queries_best": timings_best,
        "extended": extended,
        "extended_best": extended_best,
        "extended_total": round(sum(extended.values()), 3),
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        # machine-state + noise self-diagnosis (VERDICT r9 #1)
        "loadavg_start": loadavg_start,
        "loadavg_end": loadavg_end,
        "headline_runs": headline_runs,
        "extended_runs": extended_runs,
        # fixed-work CPU calibration, one probe immediately
        # before each query's timed group (VERDICT r12 #1); quiet
        # requires every one inside PROBE_BAND widened by
        # +/- PROBE_TOLERANCE (5% — the 10% alternative would have
        # admitted the caught interference episode, SCALE.md)
        "probes": probes,
        "probe_band": list(PROBE_BAND),
        "probes_ok": probes_in_band(list(probes.values())),
        "probe_max": round(max(probes.values()), 3) if probes else None,
        # per-query dirtiness, compactly (round 14): the names whose
        # cpu probe exceeded the band ceiling or whose mem probe
        # exceeded the gross-excursion ceiling — carried in the
        # compact line (usually []) so a truncated wrapper can still
        # adjudicate per-row without the full probe maps
        "dirty": sorted(
            q for q in probes
            if probes[q] > PROBE_BAND[1] * (1.0 + PROBE_TOLERANCE)
            or mem_probes.get(q, 0.0)
            > MEM_PROBE_IDLE_BAND[0] * MEM_PROBE_FACTOR),
        # memory-bandwidth probe, recorded only (see
        # memory_probe docstring): a 2x+ excursion flags the
        # co-tenancy mode the cpu probe cannot see
        "probes_mem": mem_probes,
        "mem_probe_idle_band": list(MEM_PROBE_IDLE_BAND),
        "quiet": quiet,
        # round 14 (VERDICT r13 #2): the extended-block verdict —
        # quiet AND no gross memory-probe excursion. Never gates
        # `quiet` itself (the mem probe's wide idle spread); carried
        # so bench_compare can tag extended rows `contended` when
        # the JVM-side co-tenancy mode the cpu probe can't see was
        # present (SCALE.md blind-spot episode).
        "quiet_extended": quiet and mem_probes_ok(
            list(mem_probes.values())),
        "settle_attempts": settle_attempts,
    }
    # full artifact: one line to stdout (as always) AND a file copy —
    # the driver wrapper keeps only the last 2000 chars of stdout, so
    # the file is the durable full record (VERDICT r13 #1/#3)
    full_line = json.dumps(artifact)
    print(full_line)
    try:
        out_path = Path(__file__).resolve().parent / "tools" \
            / "bench_last_full.json"
        out_path.write_text(full_line + "\n")
    except OSError as exc:  # never fail the bench over the file copy
        print(f"[bench] full-artifact file not written: {exc}",
              file=sys.stderr)
    # compact summary LAST: always fits the driver's tail window whole
    print(compact_summary(artifact))
    spark.stop()


if __name__ == "__main__":
    main()
