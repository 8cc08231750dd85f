#!/usr/bin/env python
"""Deep drive: the hypothesis property suite at 2000 examples x 3 seeds
(round 15, VERDICT r14 #4 — the round-14 scratch drive, committed as a
one-command reproducible script).

    python tools/deep_drive_property.py [--examples 2000] [--seeds 101 202 303]

Re-runs tests/test_properties.py (schema promotion lattice, interval
grammar, sampling thresholds, TOML round-trip) with the example budget
raised via PYDALA_PROPERTY_EXAMPLES and a distinct --hypothesis-seed per
pass. On-demand, NOT part of the default suite (tools/, not tests/):
run it after touching schema.py's lattice, writer.py's interval
grammar, sampling's hash thresholds, or utils/tomlout.py.

Exit 0 = every seed's full run green; prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _write_last(verdict: dict) -> None:
    """Durable greenness record (round 16, VERDICT r15 #2): persist the
    verdict JSON beside the script after every run, so COVERAGE.md's
    "drives green" claim is checkable/diffable without re-running the
    drive. Committed after a green run; the next run overwrites it."""
    out = os.path.join(REPO, "tools", "deep_drive_property_last.json")
    with open(out, "w") as f:
        json.dump({**verdict, "argv": sys.argv[1:]}, f, indent=1,
                  sort_keys=True)
        f.write("\n")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--examples", type=int, default=2000)
    ap.add_argument("--seeds", type=int, nargs="+",
                    default=[101, 202, 303])
    args = ap.parse_args()
    results = {}
    ok = True
    t0 = time.time()
    for seed in args.seeds:
        env = dict(os.environ,
                   PYDALA_PROPERTY_EXAMPLES=str(args.examples))
        p = subprocess.run(
            [sys.executable, "-m", "pytest", "-q",
             "-p", "no:cacheprovider",
             f"--hypothesis-seed={seed}",
             os.path.join(REPO, "tests", "test_properties.py")],
            env=env, cwd=REPO, capture_output=True, text=True)
        tail = p.stdout.strip().splitlines()[-1] if p.stdout.strip() else ""
        results[str(seed)] = {"rc": p.returncode, "tail": tail}
        ok = ok and p.returncode == 0
        if p.returncode != 0:
            print(p.stdout)
    verdict = {"drive": "property", "examples": args.examples,
               "seeds": results, "ok": ok,
               "sec": round(time.time() - t0, 1)}
    print(json.dumps(verdict))
    _write_last(verdict)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
