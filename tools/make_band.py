#!/usr/bin/env python
"""Build a per-query bench band file from fully-quiet control artifacts
(round 15, VERDICT r14 #2 — rebaseline the degenerate r13 bands).

    python tools/make_band.py tools/bench_controls_r15/*.json \
        --out tools/bench_band_r15.json

Every input must be a FULL bench artifact (probes present) that
self-classified ``quiet: true`` AND ``quiet_extended: true`` — the r13
band's degenerate rows (q_lang_predict 2.2-4.9) came from admitting
per-query samples of partially-contended runs; this builder refuses
them so a ~1.5x code regression can actually trip the widened band.

Band per query = [min, max] of the control MEDIANS (bench_compare
widens 10% both sides at verdict time, so the file itself stays the
raw observed spread). Totals bands, probe ceilings, and the mem-probe
ceiling are carried so the file is a drop-in for
``bench_compare --band`` and the default-band search.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))


def build_band(artifacts: list[dict], source: str) -> dict:
    """Pure core: per-query [min, max] of quiet-control medians.

    Raises ValueError on a non-quiet control, a non-median artifact, or
    a query-set mismatch — a band silently built from mixed inputs is
    exactly the r13 failure mode this replaces."""
    if len(artifacts) < 2:
        raise ValueError("need >= 2 quiet controls for a spread")
    names = None
    for a in artifacts:
        if a.get("timing") != "median_of_3":
            raise ValueError("control is not a median-of-3 artifact")
        if not (a.get("quiet") and a.get("quiet_extended")):
            raise ValueError(
                "control is not fully quiet (quiet + quiet_extended)")
        got = set(a.get("queries", {})) | set(a.get("extended", {}))
        if names is None:
            names = got
        elif got != names:
            raise ValueError(f"query-set mismatch: {sorted(names ^ got)}")
    queries = {}
    for q in sorted(names):
        vals = sorted(
            {**a["queries"], **a["extended"]}[q] for a in artifacts
        )
        row = {
            "lo": round(vals[0], 3),
            "hi": round(vals[-1], 3),
            "n": len(vals),
        }
        # spike watermark (n >= 5 only): fully-quiet controls still
        # carry ~1 spiking row per run (q_stats_summary read 7.03 once
        # vs 3.98-4.82 on four other quiet controls — minutes-scale
        # residual variance below the mem-probe ceiling), so the HARD
        # `slow` boundary stays the raw max (a band that flags its own
        # controls would turn every future driver run red). `hi_typ` =
        # second_max * 1.15 is the TYPICAL ceiling: bench_compare
        # prints `high` for clean rows between hi_typ and hi — visible
        # on every artifact a genuine regression touches, silent on
        # one-off spikes — without tripping the exit code.
        if len(vals) >= 5:
            typ = round(vals[-2] * 1.15, 3)
            # only a REACHABLE watermark is recorded: after the 10%
            # verdict widening a typ within 10% of the hard max leaves
            # an empty `high` range — that close a gap is band noise,
            # not a spike
            if typ * 1.1 < row["hi"]:
                row["hi_typ"] = typ
        queries[q] = row
    heads = [a["value"] for a in artifacts]
    exts = [a["extended_total"] for a in artifacts]
    first = artifacts[0]
    return {
        "source": source,
        "timing": "median_of_3",
        "queries": queries,
        "headline_total": {"lo": round(min(heads), 3),
                           "hi": round(max(heads), 3)},
        "extended_total": {"lo": round(min(exts), 3),
                           "hi": round(max(exts), 3)},
        # machine-identity constants carry over unchanged: the probe
        # bands describe the HOST, not the tree, and are calibrated
        # against the caught interference episodes (bench.py docstrings)
        "probe_band": first.get("probe_band", [0.40, 0.46]),
        "probe_ceiling": round(
            first.get("probe_band", [0.40, 0.46])[1] * 1.05, 3),
        "probe_mem_idle_band": first.get("mem_probe_idle_band",
                                         [0.18, 0.27]),
        "probe_mem_ceiling": round(
            first.get("mem_probe_idle_band", [0.18, 0.27])[0] * 2.0, 3),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("controls", nargs="+",
                    help="full quiet-control artifacts (json)")
    ap.add_argument("--out", default=os.path.join(HERE,
                                                  "bench_band_r15.json"))
    ap.add_argument("--source", default=None,
                    help="provenance string recorded in the band file")
    args = ap.parse_args()
    artifacts = []
    for path in args.controls:
        with open(path) as f:
            artifacts.append(json.load(f))
    # tree provenance lives in the control FILENAMES (control_01_r14tree
    # vs control_04_r15tree…), so the default label stays neutral rather
    # than hardcoding a tree tag that goes stale as controls accrue
    # (round 16, ADVICE r15)
    source = args.source or (
        f"{len(artifacts)} fully-quiet controls "
        f"({', '.join(os.path.basename(p) for p in args.controls)}); "
        "medians-of-3 at sf0.1")
    band = build_band(artifacts, source)
    with open(args.out, "w") as f:
        json.dump(band, f, indent=1, sort_keys=True)
        f.write("\n")
    wide = {q: b for q, b in band["queries"].items()
            if b["hi"] > 1.36 * b["lo"]}
    typ_catches = {q: b for q, b in wide.items()
                   if b.get("hi_typ", b["hi"]) <= 1.36 * b["lo"]}
    print(json.dumps({
        "out": args.out, "controls": len(artifacts),
        "headline_total": band["headline_total"],
        "extended_total": band["extended_total"],
        # rows whose HARD band cannot trip on a 1.5x regression after
        # the 10% widening (hi*1.1 >= 1.5*lo) — the rebaseline's whole
        # point; of those, the ones whose `high` watermark still
        # catches it (visible marker, no exit-code trip)
        "rows_too_wide_for_1p5x_hard": sorted(wide),
        "of_those_high_watermark_catches": sorted(typ_catches),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
