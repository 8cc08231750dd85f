"""Pins for bench.py's self-classification plumbing (VERDICT r12 #1).

All session-free: the probe and the quiet verdict are pure functions so
the gate's semantics are testable without running the bench.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import bench  # noqa: E402


def test_calibration_probe_is_fixed_work():
    # two probes of the same work agree within a loose factor (this is
    # a CI-safe sanity pin, not the idle band — the band lives in
    # PROBE_BAND and is machine-specific); a quarter of the work takes
    # meaningfully less time than the full probe
    full = bench.calibration_probe()
    again = bench.calibration_probe()
    quarter = bench.calibration_probe(bench.PROBE_ITERS // 4)
    assert full > 0 and again > 0
    assert max(full, again) / min(full, again) < 3.0
    assert quarter < full


def test_probes_in_band_gate():
    lo, hi = bench.PROBE_BAND
    mid = (lo + hi) / 2
    assert bench.probes_in_band([mid, mid, mid])
    # a single too-slow probe (mid-run contention) rejects the run
    assert not bench.probes_in_band([mid, mid, hi * 1.5])
    # too-FAST also rejects: the recorded band is for THIS machine, a
    # faster probe means the band itself is invalid for comparison
    assert not bench.probes_in_band([lo * 0.5, mid, mid])
    assert not bench.probes_in_band([])
    # intra-run dispersion: probes individually inside the widened band
    # but spread past PROBE_MAX_SPREAD = interference arrived mid-run
    # (the caught round-13 episode: 0.411 -> 0.489 = 19% spread)
    wide_lo = lo * (1 - bench.PROBE_TOLERANCE / 2)
    wide_hi = hi * (1 + bench.PROBE_TOLERANCE / 2)
    if (wide_hi - wide_lo) / wide_lo > bench.PROBE_MAX_SPREAD:
        assert not bench.probes_in_band([wide_lo, mid, wide_hi])
    # the REAL caught episode must fail the gate with the shipped
    # constants — this pin is the round-13 acceptance criterion
    episode = [0.426, 0.430, 0.411, 0.447, 0.461, 0.455,
               0.457, 0.475, 0.474, 0.456, 0.489]
    assert not bench.probes_in_band(episode)
    # and a genuinely idle session must pass it
    idle = [0.426, 0.430, 0.429, 0.422, 0.411, 0.434, 0.428, 0.423]
    assert bench.probes_in_band(idle)


def test_classify_quiet_requires_all_three_gates():
    lo, hi = bench.PROBE_BAND
    mid = (lo + hi) / 2
    good_probes = [mid] * 6
    good_runs = [12.0, 9.0, 9.5]  # pass 1 never votes; 2-3 within 25%
    assert bench.classify_quiet([0.5, 1.0, 1.0], good_runs, good_probes)
    # loadavg gate
    assert not bench.classify_quiet([2.5, 1.0, 1.0], good_runs, good_probes)
    # run-agreement gate (passes 2-3 disagree > 25%)
    assert not bench.classify_quiet(
        [0.5, 1.0, 1.0], [9.0, 9.0, 12.0], good_probes)
    # pass 1 is excused from agreement (residual JIT)
    assert bench.classify_quiet(
        [0.5, 1.0, 1.0], [30.0, 9.0, 9.5], good_probes)
    # probe gate: one contended pass rejects even when loadavg and the
    # block totals look clean — the round-13 mid-run interference case
    assert not bench.classify_quiet(
        [0.5, 1.0, 1.0], good_runs, [mid] * 5 + [hi * 1.5])


def test_partest_shards_cover_every_file():
    # the parallel runner's pass-count invariant: every test file lands
    # in exactly one shard, for any worker count
    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))
    import partest

    files = sorted(
        str(p) for p in (Path(__file__).resolve().parent).glob("test_*.py"))
    for n in (1, 3, 4, 8, 99):
        shards = partest.shard_files(list(files), n)
        flat = sorted(f for s in shards for f in s)
        assert flat == files, (n, len(flat))
        assert len(shards) <= n


def test_partest_record_durations(tmp_path):
    # the self-maintaining balancer input: pytest --durations=0 lines
    # aggregate (call+setup) into per-file totals, merged over the
    # existing map so files absent from a run keep their last figure
    import json as _json

    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))
    import partest

    sandbox = tmp_path / "dur.json"
    sandbox.write_text(_json.dumps({"test_old.py": 9.9}))
    orig = partest.DURATIONS
    partest.DURATIONS = sandbox
    try:
        out = ("0.55s call     tests/test_a.py::test_x\n"
               "1.20s setup    tests/test_a.py::test_y\n"
               "0.30s call     tests/test_b.py::t\n"
               "garbage line\n")
        got = partest.record_durations([out])
        assert got == {"test_a.py": 1.75, "test_b.py": 0.3}
        stored = _json.loads(sandbox.read_text())
        assert stored["test_a.py"] == 1.8 and stored["test_old.py"] == 9.9
        # empty outputs leave the map untouched
        assert partest.record_durations(["nothing"]) == {}
        assert _json.loads(sandbox.read_text()) == stored
    finally:
        partest.DURATIONS = orig


def test_bench_compare_adjudication():
    # the round-13 adjudication tool: verdicts, wrapper unwrap, and
    # like-for-like key selection across artifact generations
    import json as _json

    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))
    import bench_compare as bc

    assert bc.verdict(1.0, 0.9, 1.1, True) == "in-band"
    assert bc.verdict(1.2, 0.9, 1.1, True) == "in-band"  # 10% widening
    assert bc.verdict(1.5, 0.9, 1.1, True) == "slow"
    assert bc.verdict(0.5, 0.9, 1.1, True) == "fast"
    assert bc.verdict(1.5, 0.9, 1.1, False) == "contended"

    band = {"probe_ceiling": 0.483,
            "queries": {"qa": {"lo": 1.0, "hi": 1.2}}}
    art = {"timing": "median_of_3", "queries": {"qa": 2.0},
           "extended": {}, "probes": {"qa": 0.42}}
    rows, any_slow = bc.adjudicate(art, band)
    assert any_slow and rows[0][3] == "slow"
    art["probes"]["qa"] = 0.6  # contended probe: not evidence
    rows, any_slow = bc.adjudicate(art, band)
    assert not any_slow and rows[0][3] == "contended"

    old = {"queries": {"qa": 1.0}}  # pre-r13: best-of-3 primaries
    new = {"timing": "median_of_3", "queries": {"qa": 1.3},
           "queries_best": {"qa": 1.1}}
    a, b, kind = bc.comparable_numbers(new, old)
    assert kind == "best_of_3" and a["qa"] == 1.1 and b["qa"] == 1.0

    # driver-wrapper unwrap: the bench line is embedded in "tail"
    line = _json.dumps({"metric": "headline_queries_total_wall",
                        "queries": {"qa": 1.0}})
    wrapper = {"n": 1, "rc": 0, "tail": "noise [Stage 1] \r" + line}
    import tempfile

    with tempfile.NamedTemporaryFile("w", suffix=".json",
                                     delete=False) as f:
        _json.dump(wrapper, f)
    got = bc.load_artifact(f.name)
    assert got["queries"] == {"qa": 1.0}

    # the shipped band file covers every headline+extended query
    shipped = bc.load_band()
    for name in bench.HEADLINE + bench.EXTENDED:
        assert name in shipped["queries"], name


def test_headline_and_extended_are_registered_queries():
    from pydala_spark.queries import QUERIES

    for name in bench.HEADLINE + bench.EXTENDED:
        assert name in QUERIES, name
    # the headline list is FROZEN for cross-round comparability
    # (CLAUDE.md); a change here is a deliberate rebaseline, not drift
    assert len(bench.HEADLINE) == 19 and len(bench.EXTENDED) == 7
