#!/usr/bin/env python
"""Adjudicate a BENCH_r{N}.json artifact against the recorded band
(round 13 — the per-round bench-noise adjudication, automated).

    python tools/bench_compare.py BENCH_r13.json            # vs band
    python tools/bench_compare.py BENCH_r13.json BENCH_r12.json  # + delta

Per query it reports the artifact's primary number (median-of-3 for
r13+ artifacts, best-of-3 for older ones — detected by the ``timing``
key), whether that query's own calibration probe was clean
(<= the band's probe ceiling), and the verdict vs the selected band
(default ``tools/bench_band_r15.json``):

- ``in-band``   — inside [lo, hi] (widened 10% both sides: single-run
  noise on this host, SCALE.md reading rule)
- ``fast``/``slow`` — outside the widened band with a CLEAN probe —
  the only rows that are evidence of an engine change
- ``contended`` — outside band but a probe says the machine was not
  giving the query a full core (cpu probe past the band ceiling) OR
  was starving the executor JVM's memory bandwidth (mem probe past
  the gross-excursion ceiling, round 14 — the SCALE.md blind-spot
  mode): NOT evidence in either direction
- ``high``      — (round 15) inside the hard band but past the row's
  ``hi_typ`` watermark (second-highest quiet control x 1.15): the
  spike-prone rows' visibility marker. One artifact = quiet-run spike
  noise; the same row high across consecutive artifacts = a
  regression the hard band is too wide to trip on. Never affects the
  exit code.

With a second artifact, prints the per-query delta on matching keys,
picked like-for-like PER KEY (median vs median whenever both sides
carry one, best vs best else, a labeled mixed fallback only for
truncated wrappers) so round-over-round reads take one command
instead of a judge afternoon.

Exit code: 0 when no CLEAN-probe out-of-band slow rows exist on a
quiet run; 2 when a quiet run has clean-probe slow rows (a cron can
trip on a real regression but never on co-tenant noise); 3 when the
artifact carries no per-query numbers at all (content-free must not
read as all-clear); 4 when slow rows exist but the run self-classified
`quiet: false` — INCONCLUSIVE, not all-clear (round 15, ADVICE r14:
per-query probes run before each group and can miss a co-tenant that
arrives mid-group, so a non-quiet run is not evidence in either
direction, but on a host that is never quiet automation must still be
able to distinguish "nothing slow" from "not evidence").

Band file: ``tools/bench_band_r15.json`` by default (round-15
rebaseline from the fully-quiet controls committed whole under
``tools/bench_controls_r15/`` — byte-reproducibility is test-pinned,
so the directory, not this docstring, is the authoritative count);
pass ``--band`` to adjudicate against another band (e.g. the retired
``tools/bench_band_r13.json``).
"""

from __future__ import annotations

import json
import os
import re
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
WIDEN = 0.10

#: keys worth pulling out of a TRUNCATED driver tail (round 14,
#: VERDICT r13 #1): every value is a flat object, a flat array, a
#: scalar, or a string, so a non-nesting regex recovers each one that
#: survived the 2000-char window whole. BENCH_r13.json is the
#: motivating casualty — its tail starts mid-`extended`, so the
#: headline medians are gone forever, but extended_best/probes/quiet
#: are all intact and must be readable rather than a ValueError.
_RECOVER_KEYS = (
    "metric", "value", "unit", "timing", "queries", "queries_best",
    "extended", "extended_best", "extended_total", "sf",
    "loadavg_start", "loadavg_end", "headline_runs", "extended_runs",
    "probes", "probe_band", "probes_mem", "mem_probe_idle_band",
    "quiet", "quiet_extended", "settle_attempts", "probes_ok",
    "probe_max", "dirty",
)


#: newest band first: the round-15 rebaseline (quiet r14-tree
#: controls) when present, else the round-13 band — so a tree that
#: predates the rebaseline still adjudicates
DEFAULT_BANDS = ("bench_band_r15.json", "bench_band_r13.json")


def load_band(path: str | None = None) -> dict:
    if path is None:
        for name in DEFAULT_BANDS:
            cand = os.path.join(HERE, name)
            if os.path.exists(cand):
                path = cand
                break
        else:
            # name the searched candidates instead of letting open(None)
            # raise a bare TypeError (round 16, ADVICE r15)
            raise FileNotFoundError(
                "no band file found; searched "
                + ", ".join(os.path.join(HERE, n) for n in DEFAULT_BANDS)
                + " — pass --band explicitly")
    with open(path) as f:
        return json.load(f)


def recover_truncated(tail: str) -> dict:
    """Regex-salvage whatever whole key/value pairs survived a
    tail-window truncation of the full bench line."""
    out: dict = {}
    dropped: list[str] = []
    for key in _RECOVER_KEYS:
        m = re.search(
            r'"%s":\s*(\{[^{}]*\}|\[[^\[\]]*\]|true|false|null'
            r'|-?[\d.eE+]+|"[^"]*")' % re.escape(key), tail)
        if m:
            try:
                out[key] = json.loads(m.group(1))
            except ValueError:
                # the regex matched but the fragment isn't valid JSON
                # (escaped quote, malformed exponent): record the key as
                # DROPPED rather than silently absent (round 15, ADVICE
                # r14) so a reader knows the field was skipped, not
                # missing from the capture
                dropped.append(key)
                continue
    if out:
        out["recovered_truncated"] = True
        if dropped:
            out["recovered_dropped"] = dropped
    return out


def load_artifact(path: str) -> dict:
    """Load a bench artifact from any of its shapes: the compact
    summary line (r14+, printed last so it always survives the
    driver's tail window), the full one-line JSON bench.py prints,
    raw multi-line bench stdout, or the driver's BENCH_r{N}.json
    wrapper — including a wrapper whose captured tail truncated the
    embedded line (recovered field-by-field, VERDICT r13 #1)."""
    with open(path) as f:
        text = f.read()
    try:
        d = json.loads(text)
    except ValueError:
        # raw bench stdout: full line first, compact line last — take
        # the LAST parseable bench line; a raw capture whose final
        # line is itself cut mid-token falls through to piecewise
        # recovery like a truncated wrapper tail would
        d = None
        for line in reversed(text.strip().splitlines()):
            line = line.strip()
            if line.startswith('{"metric"'):
                try:
                    d = json.loads(line)
                except ValueError:
                    continue
                break
        if d is None:
            recovered = recover_truncated(text)
            if not recovered:
                raise ValueError(f"{path}: no bench JSON line found")
            return recovered
    if "queries" in d or d.get("compact"):
        return d
    if isinstance(d.get("parsed"), dict) and "queries" in d["parsed"]:
        return d["parsed"]
    tail = d.get("tail", "")
    start = tail.rfind('{"metric"')
    if start >= 0:
        try:
            return json.loads(tail[start:])
        except ValueError:
            pass  # the embedded line itself was cut — salvage below
    recovered = recover_truncated(tail)
    if not recovered:
        raise ValueError(f"{path}: neither a bench line nor a driver "
                         "wrapper with a recoverable one")
    return recovered


def primary_numbers(artifact: dict) -> dict[str, float]:
    """The artifact's per-query primaries: medians for r13+ artifacts,
    best-of-3 (the only numbers) for older ones."""
    return {**artifact.get("queries", {}), **artifact.get("extended", {})}


def comparable_numbers(
    a: dict, b: dict
) -> tuple[dict, dict, str, dict[str, str]]:
    """Pick, PER KEY, the pair that compares like-for-like across
    artifact generations (round 15, VERDICT r14 #3): median vs median
    whenever both sides carry a median for that key (every r13+
    artifact — compact lines always do), else best vs best (pre-r13
    primaries ARE bests; truncated r13-style wrappers keep only
    ``*_best`` maps), else the labeled mixed fallback — so the r14
    "+29.8%" class of bias (medians on one side judged against bests
    on the other without a per-row flag) cannot recur.

    Returns (newer_nums, older_nums, summary_kind, per_key_modes)."""
    def meds(d: dict) -> dict:
        return primary_numbers(d) if d.get("timing") == "median_of_3" \
            else {}

    def bests(d: dict) -> dict:
        if d.get("timing") == "median_of_3" or d.get("recovered_truncated"):
            return {**d.get("queries_best", {}), **d.get("extended_best", {})}
        return primary_numbers(d)

    a_med, b_med = meds(a), meds(b)
    a_best, b_best = bests(a), bests(b)
    na: dict = {}
    nb: dict = {}
    modes: dict[str, str] = {}
    for k in {**a_med, **a_best}:
        if k in a_med and k in b_med:
            na[k], nb[k], modes[k] = a_med[k], b_med[k], "median_of_3"
        elif k in a_best and k in b_best:
            na[k], nb[k], modes[k] = a_best[k], b_best[k], "best_of_3"
        elif k in a_med and k in b_best:
            # mixed: newer medians read HIGH vs a true best-of-3
            na[k], nb[k] = a_med[k], b_best[k]
            modes[k] = "median_vs_best (newer reads HIGH)"
        elif k in a_best and k in b_med:
            na[k], nb[k] = a_best[k], b_med[k]
            modes[k] = "best_vs_median (newer reads LOW)"
    kinds = sorted(set(modes.values()))
    if len(kinds) == 1:
        kind = f"{kinds[0]} vs {kinds[0]}" \
            if kinds[0] in ("median_of_3", "best_of_3") else kinds[0]
    elif kinds:
        kind = "mixed per-row (see row labels)"
    else:
        kind = "no common keys"
    return na, nb, kind, modes


def verdict(
    value: float, lo: float, hi: float, probe_clean: bool,
    hi_typ: float | None = None,
) -> str:
    if lo * (1 - WIDEN) <= value <= hi * (1 + WIDEN):
        # `high` (round 15): past the TYPICAL ceiling (second-highest
        # quiet control x 1.15) but inside the observed spike range —
        # a one-off is noise, the same row `high` across consecutive
        # artifacts is a regression the hard band can't see. Never
        # trips the exit code.
        if hi_typ is not None and probe_clean \
                and value > hi_typ * (1 + WIDEN):
            return "high"
        return "in-band"
    if not probe_clean:
        return "contended"
    return "fast" if value < lo else "slow"


def adjudicate(
    artifact: dict, band: dict, nums: dict | None = None
) -> tuple[list[tuple], bool]:
    nums = primary_numbers(artifact) if nums is None else nums
    probes = artifact.get("probes", {})
    mems = artifact.get("probes_mem", {})
    ceiling = band.get("probe_ceiling", 0.483)
    # memory-probe gross-excursion ceiling (round 14, VERDICT r13 #2):
    # idle floor 0.18 x factor 2.0 — a row whose mem probe exceeded it
    # ran under the JVM-side co-tenancy the cpu probe is blind to
    # (SCALE.md blind-spot episode), so it is tagged `contended` even
    # with a clean cpu probe
    mem_ceiling = band.get("probe_mem_ceiling", 0.36)
    # compact r14+ lines carry no probe maps but do carry `dirty` (the
    # names whose cpu/mem probe exceeded its ceiling, usually []) —
    # per-row adjudication works from it; with neither, a probe-less
    # row can never be `slow` (conservative)
    dirty = set(artifact.get("dirty") or [])
    have_dirty = "dirty" in artifact
    rows = []
    any_slow = False
    for q, v in nums.items():
        b = band["queries"].get(q)
        if b is None:
            rows.append((q, v, None, "no-band", None))
            continue
        pr = probes.get(q)
        if pr is not None:
            clean = pr <= ceiling
            mem = mems.get(q)
            if clean and mem is not None and mem > mem_ceiling:
                clean = False
        elif have_dirty:
            clean = q not in dirty
        else:
            clean = False
        verd = verdict(v, b["lo"], b["hi"], clean, b.get("hi_typ"))
        any_slow = any_slow or verd == "slow"
        rows.append((q, v, f"{b['lo']}-{b['hi']}", verd, pr))
    return rows, any_slow


def main() -> int:
    argv = list(sys.argv[1:])
    band_path = None
    if "--band" in argv:
        i = argv.index("--band")
        if i + 1 >= len(argv):
            print("--band requires a path", file=sys.stderr)
            return 1
        band_path = argv[i + 1]
        del argv[i:i + 2]
    if not argv:
        print(__doc__)
        return 1
    artifact = load_artifact(argv[0])
    band = load_band(band_path)
    timing = artifact.get(
        "timing",
        "unknown (truncated)" if artifact.get("recovered_truncated")
        else "best_of_3 (pre-r13)")
    print(f"artifact: {argv[0]}  timing={timing}  "
          f"quiet={artifact.get('quiet')}  "
          f"quiet_extended={artifact.get('quiet_extended', 'n/a')}  "
          f"loadavg_start={artifact.get('loadavg_start')}  "
          f"band={band_path or 'default (' + band.get('source', '?')[:40] + '…)'}")
    if artifact.get("recovered_dropped"):
        print("NOTE: recovery skipped unparseable fragment(s) for: "
              f"{', '.join(artifact['recovered_dropped'])} — these "
              "fields were present in the tail but dropped, not absent.")
    nums = primary_numbers(artifact)
    bests_note = False
    if not nums:
        # a truncated r13-style wrapper (medians cut out of the tail
        # window) or a compact line that shed its per-query maps:
        # salvage whatever best-of-3 maps survive so the artifact
        # still reads (VERDICT r13 #1 acceptance)
        nums = {**artifact.get("queries_best", {}),
                **artifact.get("extended_best", {})}
        bests_note = bool(nums)
    if not nums:
        # nothing per-query survived at all — exit distinctly so a
        # cron never mistakes a content-free artifact for a clean one
        print("NOTE: no per-query numbers in this artifact "
              f"(keys: {', '.join(sorted(artifact))}); consult "
              "tools/bench_last_full.json for the full record.")
        return 3
    if artifact.get("recovered_truncated"):
        print("NOTE: truncated driver tail — fields recovered "
              f"piecewise ({', '.join(sorted(artifact))}); "
              "headline medians may be lost for this round.")
    rows, any_slow = adjudicate(artifact, band, nums=nums)
    mems = artifact.get("probes_mem", {})
    mem_ceiling = band.get("probe_mem_ceiling", 0.36)
    for q, v, b, verd, pr in rows:
        mark = {"in-band": " ", "fast": "+", "slow": "!", "high": "^",
                "contended": "~", "no-band": "?"}[verd]
        probe_s = f"probe {pr:.3f}" if pr is not None else "probe n/a"
        mem = mems.get(q)
        if mem is not None and mem > mem_ceiling:
            probe_s += f" mem {mem:.3f}>!"
        print(f" {mark} {q:28s} {v:7.3f}  band {b or '—':12s} "
              f"{verd:9s} {probe_s}")
    highs = [q for q, _, _, verd, _ in rows if verd == "high"]
    if highs:
        print(f"NOTE: {len(highs)} row(s) past the typical ceiling but "
              f"inside the observed spike range ({', '.join(highs)}) — "
              "a one-off is quiet-run spike noise (~1 row/control); the "
              "SAME row high across consecutive artifacts is a "
              "regression. Does not trip the exit code.")
    if bests_note:
        print("NOTE: best-of-3 numbers (medians truncated away) judged "
              "against the median band — bests read LOW; fast verdicts "
              "here are not evidence.")
    elif artifact.get("timing") != "median_of_3":
        print("NOTE: pre-round-13 artifact (best-of-3) judged against "
              "the median band — bests read LOW; fast verdicts here "
              "are not evidence.")
    if len(argv) > 1:
        other = load_artifact(argv[1])
        a, b, kind, modes = comparable_numbers(artifact, other)
        uniform = len(set(modes.values())) <= 1
        print(f"\ndelta vs {argv[1]} ({kind}):")
        for q in a:
            if q in b and b[q]:
                d = (a[q] - b[q]) / b[q] * 100
                flag = "" if abs(d) < 25 else "  <-- past single-run noise"
                mode_s = "" if uniform else f"  [{modes[q]}]"
                print(f"   {q:28s} {a[q]:7.3f} vs {b[q]:7.3f}  "
                      f"{d:+6.1f}%{mode_s}{flag}")
        # the `high` watermark's discriminator, automated (round 15):
        # one high row is quiet-run spike noise; the SAME row high in
        # BOTH artifacts is the regression signal the hard band is too
        # wide to trip on — surface it so no reader has to cross-check
        # two outputs by hand
        recurrent = sorted(set(highs) & {
            q for q, _, _, verd, _ in adjudicate(other, band)[0]
            if verd == "high"})
        if recurrent:
            print("WARNING: row(s) past the typical ceiling in BOTH "
                  f"artifacts: {', '.join(recurrent)} — recurrence is "
                  "the spike-row regression signal; investigate before "
                  "the next round.")
    # run-level quiet gates the exit code (round 14): per-query probes
    # run BEFORE each query's group, so a co-tenant arriving mid-group
    # inflates the query while ITS probe reads clean (the next group's
    # probe catches it — observed live, SCALE.md round-14 episode). A
    # `quiet: false` run is not comparison evidence in either
    # direction, so its slow rows must not trip a cron — but it is not
    # an all-clear either: exit 4 = INCONCLUSIVE (round 15, ADVICE
    # r14), distinct from 0, so automation on a never-quiet host can
    # tell "nothing slow" from "not evidence".
    if any_slow and artifact.get("quiet") is False:
        print("NOTE: run is not quiet — slow rows above are NOT "
              "evidence of a regression; re-measure on a quiet window "
              "(exit 4: inconclusive, not all-clear).")
        return 4
    return 2 if any_slow else 0


if __name__ == "__main__":
    sys.exit(main())
