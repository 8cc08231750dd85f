#!/usr/bin/env python
"""Adjudicate a BENCH_r{N}.json artifact against the recorded band
(round 13 — the per-round bench-noise adjudication, automated).

    python tools/bench_compare.py BENCH_r13.json            # vs band
    python tools/bench_compare.py BENCH_r13.json BENCH_r12.json  # + delta

Per query it reports the artifact's primary number (median-of-3 for
r13+ artifacts, best-of-3 for older ones — detected by the ``timing``
key), whether that query's own calibration probe was clean
(<= the band's probe ceiling), and the verdict vs
``tools/bench_band_r13.json``:

- ``in-band``   — inside [lo, hi] (widened 10% both sides: single-run
  noise on this host, SCALE.md reading rule)
- ``fast``/``slow`` — outside the widened band with a CLEAN probe —
  the only rows that are evidence of an engine change
- ``contended`` — outside band but the probe says the machine was not
  giving the query a full core: NOT evidence in either direction

With a second artifact, prints the per-query delta on matching keys
(best-vs-best when either side is pre-median) so round-over-round
reads take one command instead of a judge afternoon.

Exit code: 0 when no CLEAN-probe out-of-band slow rows exist, 2
otherwise (so a cron can trip on a real regression but never on
co-tenant noise).
"""

from __future__ import annotations

import json
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
WIDEN = 0.10


def load_band(path: str | None = None) -> dict:
    with open(path or os.path.join(HERE, "bench_band_r13.json")) as f:
        return json.load(f)


def load_artifact(path: str) -> dict:
    """Load a bench artifact: either the raw one-line JSON bench.py
    prints, or the driver's BENCH_r{N}.json wrapper (which embeds that
    line at the end of its captured ``tail`` text)."""
    with open(path) as f:
        d = json.load(f)
    if "queries" in d:
        return d
    tail = d.get("tail", "")
    start = tail.rfind('{"metric"')
    if start < 0:
        raise ValueError(f"{path}: neither a bench line nor a driver "
                         "wrapper with an embedded one")
    return json.loads(tail[start:])


def primary_numbers(artifact: dict) -> dict[str, float]:
    """The artifact's per-query primaries: medians for r13+ artifacts,
    best-of-3 (the only numbers) for older ones."""
    return {**artifact.get("queries", {}), **artifact.get("extended", {})}


def comparable_numbers(a: dict, b: dict) -> tuple[dict, dict, str]:
    """Pick the key pair that compares like-for-like across artifact
    generations: median vs median when both have it, else best vs best
    (r13+ artifacts carry queries_best for exactly this)."""
    a_med = a.get("timing") == "median_of_3"
    b_med = b.get("timing") == "median_of_3"
    if a_med and b_med:
        return primary_numbers(a), primary_numbers(b), "median_of_3"

    def bests(d):
        if d.get("timing") == "median_of_3":
            return {**d.get("queries_best", {}), **d.get("extended_best", {})}
        return {**d.get("queries", {}), **d.get("extended", {})}

    return bests(a), bests(b), "best_of_3"


def verdict(value: float, lo: float, hi: float, probe_clean: bool) -> str:
    if lo * (1 - WIDEN) <= value <= hi * (1 + WIDEN):
        return "in-band"
    if not probe_clean:
        return "contended"
    return "fast" if value < lo else "slow"


def adjudicate(artifact: dict, band: dict) -> tuple[list[tuple], bool]:
    nums = primary_numbers(artifact)
    probes = artifact.get("probes", {})
    ceiling = band.get("probe_ceiling", 0.483)
    rows = []
    any_slow = False
    for q, v in nums.items():
        b = band["queries"].get(q)
        if b is None:
            rows.append((q, v, None, "no-band", None))
            continue
        pr = probes.get(q)
        clean = pr is not None and pr <= ceiling
        verd = verdict(v, b["lo"], b["hi"], clean)
        any_slow = any_slow or verd == "slow"
        rows.append((q, v, f"{b['lo']}-{b['hi']}", verd, pr))
    return rows, any_slow


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__)
        return 1
    artifact = load_artifact(sys.argv[1])
    band = load_band()
    timing = artifact.get("timing", "best_of_3 (pre-r13)")
    print(f"artifact: {sys.argv[1]}  timing={timing}  "
          f"quiet={artifact.get('quiet')}  "
          f"loadavg_start={artifact.get('loadavg_start')}")
    rows, any_slow = adjudicate(artifact, band)
    for q, v, b, verd, pr in rows:
        mark = {"in-band": " ", "fast": "+", "slow": "!",
                "contended": "~", "no-band": "?"}[verd]
        probe_s = f"probe {pr:.3f}" if pr is not None else "probe n/a"
        print(f" {mark} {q:28s} {v:7.3f}  band {b or '—':12s} "
              f"{verd:9s} {probe_s}")
    if artifact.get("timing") != "median_of_3":
        print("NOTE: pre-round-13 artifact (best-of-3) judged against "
              "the median band — bests read LOW; fast verdicts here "
              "are not evidence.")
    if len(sys.argv) > 2:
        other = load_artifact(sys.argv[2])
        a, b, kind = comparable_numbers(artifact, other)
        print(f"\ndelta vs {sys.argv[2]} ({kind}):")
        for q in a:
            if q in b and b[q]:
                d = (a[q] - b[q]) / b[q] * 100
                flag = "" if abs(d) < 25 else "  <-- past single-run noise"
                print(f"   {q:28s} {a[q]:7.3f} vs {b[q]:7.3f}  "
                      f"{d:+6.1f}%{flag}")
    return 2 if any_slow else 0


if __name__ == "__main__":
    sys.exit(main())
