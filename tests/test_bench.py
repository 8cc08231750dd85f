"""Pins for bench.py's self-classification plumbing (VERDICT r12 #1).

All session-free: the probe and the quiet verdict are pure functions so
the gate's semantics are testable without running the bench.
"""

import sys
from pathlib import Path

import pytest

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
    # existing map so files absent from THIS RUN keep their last
    # figure (partial runs stay safe) — while entries whose file no
    # longer exists on disk are pruned, so the stale-entry drift
    # warning clears by following its own instruction (round 14)
    import json as _json

    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))
    import partest

    tests_dir = tmp_path / "tests"
    tests_dir.mkdir()
    for name in ("test_a.py", "test_b.py", "test_keep.py"):
        (tests_dir / name).write_text("")
    sandbox = tmp_path / "dur.json"
    sandbox.write_text(_json.dumps({"test_keep.py": 9.9,
                                    "test_gone.py": 5.0}))
    orig = partest.DURATIONS
    partest.DURATIONS = sandbox
    try:
        out = ("0.55s call     tests/test_a.py::test_x\n"
               "1.20s setup    tests/test_a.py::test_y\n"
               "0.30s call     tests/test_b.py::t\n"
               "garbage line\n")
        got = partest.record_durations([out], tests_dir=tests_dir)
        assert got == {"test_a.py": 1.75, "test_b.py": 0.3}
        stored = _json.loads(sandbox.read_text())
        assert stored["test_a.py"] == 1.8 and stored["test_b.py"] == 0.3
        assert stored["test_keep.py"] == 9.9   # exists, not in this run
        assert "test_gone.py" not in stored    # deleted file: pruned
        # empty outputs leave the map untouched
        assert partest.record_durations(["nothing"], tests_dir=tests_dir) == {}
        assert _json.loads(sandbox.read_text()) == stored
    finally:
        partest.DURATIONS = orig


def test_partest_duration_drift(tmp_path):
    # round 14 (VERDICT r13 #4): partest warns when the measured
    # durations map drifts from the files on disk — an unlisted file
    # falls back to the size heuristic (skewed balance), a stale entry
    # means a file was deleted/renamed; both mean --record-durations
    import json as _json

    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))
    import partest

    (tmp_path / "test_a.py").write_text("")
    (tmp_path / "test_b.py").write_text("")
    files = [str(tmp_path / "test_a.py"), str(tmp_path / "test_b.py")]
    sandbox = tmp_path / "dur.json"
    orig = partest.DURATIONS
    partest.DURATIONS = sandbox
    try:
        # no durations file at all: everything is unlisted
        unlisted, missing = partest.duration_drift(files)
        assert unlisted == ["test_a.py", "test_b.py"] and missing == []
        sandbox.write_text(_json.dumps({"test_a.py": 1.0,
                                        "test_gone.py": 5.0}))
        unlisted, missing = partest.duration_drift(files)
        assert unlisted == ["test_b.py"]
        assert missing == ["test_gone.py"]
        sandbox.write_text(_json.dumps({"test_a.py": 1.0,
                                        "test_b.py": 2.0}))
        assert partest.duration_drift(files) == ([], [])
    finally:
        partest.DURATIONS = orig
    # and the REAL map is in sync with the REAL suite right now — this
    # is the self-maintenance pin: adding a test file without running
    # --record-durations fails here, not in a judge's wall-clock
    real_files = sorted(
        str(p)
        for p in (Path(__file__).resolve().parent).glob("test_*.py"))
    unlisted, missing = partest.duration_drift(real_files)
    assert unlisted == [] and missing == [], (unlisted, missing)


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
    a, b, kind, modes = bc.comparable_numbers(new, old)
    assert kind == "best_of_3 vs best_of_3"
    assert a["qa"] == 1.1 and b["qa"] == 1.0
    assert modes == {"qa": "best_of_3"}

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


def test_bench_compare_median_vs_median_per_key():
    # round 15 (VERDICT r14 #3): when both sides carry medians for a
    # key, the delta MUST be median-vs-median — the r14 "+29.8%" bias
    # class (compact-newer medians judged against truncated-older
    # bests with a single whole-comparison label) cannot recur
    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))
    import bench_compare as bc

    newer = {"timing": "median_of_3", "compact": True,
             "queries": {"qa": 1.3, "qb": 2.0}}
    older = {"timing": "median_of_3", "compact": True,
             "queries": {"qa": 1.2, "qb": 2.1}}
    a, b, kind, modes = bc.comparable_numbers(newer, older)
    assert kind == "median_of_3 vs median_of_3"
    assert a == newer["queries"] and b == older["queries"]
    assert set(modes.values()) == {"median_of_3"}

    # mixed generations: per-key modes, labeled — a compact newer line
    # (medians only) vs a truncated r13 wrapper (bests only) compares
    # median-vs-best WITH the HIGH-read label on that row
    truncated = {"recovered_truncated": True,
                 "extended_best": {"qb": 1.8}, "queries_best": {}}
    a, b, kind, modes = bc.comparable_numbers(newer, truncated)
    assert modes["qb"].startswith("median_vs_best")
    assert "HIGH" in modes["qb"]
    assert a["qb"] == 2.0 and b["qb"] == 1.8
    assert "qa" not in a  # no comparable older number at all
    # and a full r14 artifact (medians AND bests) vs the same wrapper
    # prefers best-vs-best for that key — like-for-like wins
    full = {"timing": "median_of_3", "queries": {"qb": 2.0},
            "queries_best": {"qb": 1.9}, "extended_best": {}}
    a, b, kind, modes = bc.comparable_numbers(full, truncated)
    assert modes["qb"] == "best_of_3" and a["qb"] == 1.9


def test_bench_compare_not_quiet_exits_4(tmp_path, capsys, monkeypatch):
    # round 15 (ADVICE r14): slow rows on a non-quiet run are
    # INCONCLUSIVE — exit 4, not 0 — so automation on a never-quiet
    # host can distinguish all-clear from not-evidence
    import json as _json

    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))
    import bench_compare as bc

    band = bc.load_band()
    qa = next(iter(band["queries"]))
    hi = band["queries"][qa]["hi"]
    art = tmp_path / "noisy.json"
    art.write_text(_json.dumps(
        {"metric": "headline_queries_total_wall", "value": 1.0,
         "timing": "median_of_3", "quiet": False, "dirty": [],
         "queries": {qa: hi * 3.0}}))
    monkeypatch.setattr(sys, "argv", ["bench_compare.py", str(art)])
    assert bc.main() == 4
    assert "inconclusive" in capsys.readouterr().out
    # same slow row on a QUIET run is evidence: exit 2
    art.write_text(_json.dumps(
        {"metric": "headline_queries_total_wall", "value": 1.0,
         "timing": "median_of_3", "quiet": True, "dirty": [],
         "queries": {qa: hi * 3.0}}))
    assert bc.main() == 2
    capsys.readouterr()


def test_recover_truncated_reports_dropped_keys():
    # round 15 (ADVICE r14): a matched-but-unparseable fragment is
    # recorded as DROPPED, not silently absent
    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))
    import bench_compare as bc

    # "sf" matches the string alternative but holds an escaped quote
    # the non-greedy [^"]* match cuts mid-value -> invalid JSON
    tail = '"quiet": true, "sf": "0.1\\"oops", "extended_total": 15.0'
    got = bc.recover_truncated(tail)
    assert got["quiet"] is True and got["extended_total"] == 15.0
    assert got["recovered_dropped"] == ["sf"]
    # fully clean tails carry no dropped list
    clean = bc.recover_truncated('"quiet": true, "sf": 0.1')
    assert "recovered_dropped" not in clean


def test_compact_summary_hard_floor():
    # round 15 (ADVICE r14): even a pathological fixed field (here a
    # huge sf string) cannot push the compact line past the budget —
    # the minimal fallback keeps metric/value/quiet intact
    import json as _json

    art = {"metric": "headline_queries_total_wall", "value": 9.9,
           "unit": "sec", "timing": "median_of_3",
           "queries": {"qa": 1.0}, "extended": {"qb": 2.0},
           "sf": "x" * 5000, "quiet": True, "dirty": []}
    line = bench.compact_summary(art)
    assert len(line) <= bench.COMPACT_LIMIT
    d = _json.loads(line)
    assert d["metric"] and d["value"] == 9.9 and d["quiet"] is True
    assert d["compact_dropped"] == ["all-but-minimal"]


def test_partest_record_durations_skips_failed_shards(tmp_path):
    # round 15 (ADVICE r14): a shard that crashed early must not
    # overwrite its files' realistic weights. Refined round 16 (ADVICE
    # r15): only collection/internal/usage-error shards (rc 2/3/4) are
    # dropped — a shard with an isolated TEST failure (rc 1) ran to
    # completion and its durations are valid, so one flaky test no
    # longer keeps stale weights until a fully green run
    import json as _json

    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))
    import partest

    tests_dir = tmp_path / "tests"
    tests_dir.mkdir()
    for name in ("test_ok.py", "test_flaky.py", "test_crash.py"):
        (tests_dir / name).write_text("")
    sandbox = tmp_path / "dur.json"
    sandbox.write_text(_json.dumps({"test_crash.py": 120.0}))
    orig = partest.DURATIONS
    partest.DURATIONS = sandbox
    try:
        ok_out = "3.00s call     tests/test_ok.py::test_x\n"
        flaky_out = "2.00s call     tests/test_flaky.py::test_y\n"
        crash_out = "0.10s call     tests/test_crash.py::test_z\n"
        got = partest.record_durations(
            [ok_out, flaky_out, crash_out], tests_dir=tests_dir,
            returncodes=[0, 1, 2])
        # rc 0 and rc 1 shards both contribute; the rc 2 shard does not
        assert got == {"test_ok.py": 3.0, "test_flaky.py": 2.0}
        stored = _json.loads(sandbox.read_text())
        assert stored["test_ok.py"] == 3.0
        assert stored["test_flaky.py"] == 2.0
        assert stored["test_crash.py"] == 120.0  # protected
        # without returncodes (legacy call shape) everything merges
        got = partest.record_durations(
            [crash_out], tests_dir=tests_dir)
        assert got == {"test_crash.py": 0.1}
    finally:
        partest.DURATIONS = orig


def test_mem_probe_gate_and_quiet_extended():
    # round 14 (VERDICT r13 #2): the memory-probe gross-excursion gate
    # that machine-checks the documented JVM-side blind spot. Idle
    # vectors are literals from the r13 driver artifact's probes_mem
    # (0.186-0.269); the caught live episode (SCALE.md "Live
    # validation of the two-probe design") rose 0.18 -> 0.30-0.41 and
    # MUST fail with the shipped constants.
    idle = [0.216, 0.269, 0.186, 0.190, 0.254, 0.198, 0.211]
    assert bench.mem_probes_ok(idle)
    episode = [0.18, 0.19, 0.30, 0.34, 0.41, 0.38, 0.211]
    assert not bench.mem_probes_ok(episode)
    assert not bench.mem_probes_ok([])
    # ceiling is floor-based (0.18 * 2.0 = 0.36): a hi-based 2x bound
    # (0.54) would have admitted the episode's 0.41 peak
    ceiling = bench.MEM_PROBE_IDLE_BAND[0] * bench.MEM_PROBE_FACTOR
    assert abs(ceiling - 0.36) < 1e-9
    assert max(episode) > ceiling > max(idle)


def test_compact_summary_fits_driver_tail_window():
    # round 14 (VERDICT r13 #1): the driver stores only the LAST 2000
    # chars of bench stdout; the compact line printed last must always
    # fit that window whole — r13's full line didn't, and its headline
    # medians were permanently lost from the canonical artifact.
    import json as _json

    def fake_artifact(names):
        return {
            "metric": "headline_queries_total_wall", "value": 123.456,
            "unit": "sec", "timing": "median_of_3",
            "queries": {n: 99.999 for n in names[:19]},
            "extended": {n: 99.999 for n in names[19:]},
            "extended_total": 999.999, "sf": 0.1, "quiet": True,
            "quiet_extended": False, "settle_attempts": 10,
            "probes_ok": True, "probe_max": 0.483,
            # worst realistic dirtiness: every query flagged
            "dirty": list(names),
        }

    # the real frozen 26-name headline+extended set fits with room
    line = bench.compact_summary(fake_artifact(bench.HEADLINE + bench.EXTENDED))
    assert len(line) < bench.COMPACT_LIMIT == 1800
    d = _json.loads(line)
    assert d["compact"] and d["value"] == 123.456
    assert set(d["queries"]) == set(bench.HEADLINE)
    assert set(d["extended"]) == set(bench.EXTENDED)
    # stress: 50 registry-length names (the CLAUDE.md registry cap) —
    # the guard sheds detail in documented order rather than emitting
    # a line a tail capture would cut mid-token
    long_names = [f"q_registry_stress_query_name_{i:02d}" for i in range(50)]
    line50 = bench.compact_summary(fake_artifact(long_names))
    assert len(line50) < bench.COMPACT_LIMIT
    d50 = _json.loads(line50)
    assert d50["metric"] and d50["value"] == 123.456
    # whatever was shed is declared, and the headline medians go last
    if "compact_dropped" in d50:
        assert d50["compact_dropped"][0] == "extended"
        # only keys that were actually present may be declared dropped
        assert set(d50["compact_dropped"]) <= {"extended", "queries",
                                               "dirty"}
    over = fake_artifact(long_names)
    del over["dirty"]   # absent key must never appear in compact_dropped
    d_nd = _json.loads(bench.compact_summary(over))
    assert "dirty" not in d_nd.get("compact_dropped", [])


def test_bench_compare_recovers_truncated_wrapper(tmp_path):
    # the r13 casualty in miniature: a driver wrapper whose tail
    # starts mid-dict (the medians cut away) must still load, expose
    # the surviving fields, and adjudicate bests with a LOW-read note
    import json as _json

    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))
    import bench_compare as bc

    tail = ('winnowing": 2.601, "q_lang_predict": 2.563}, '
            '"extended_best": {"q_pq_topk": 0.644, "q_lang_predict": 2.549}, '
            '"extended_total": 15.092, "sf": 0.1, '
            '"headline_runs": [16.356, 12.17, 11.2], '
            '"probes": {"q_pq_topk": 0.422, "q_lang_predict": 0.442}, '
            '"probe_band": [0.4, 0.46], '
            '"probes_mem": {"q_pq_topk": 0.201, "q_lang_predict": 0.254}, '
            '"quiet": true, "settle_attempts": 1}')
    wrapper = tmp_path / "wrapped.json"
    wrapper.write_text(_json.dumps({"n": 13, "rc": 0, "tail": tail}))
    got = bc.load_artifact(str(wrapper))
    assert got["recovered_truncated"] and got["quiet"] is True
    assert got["extended_best"]["q_pq_topk"] == 0.644
    assert got["extended_total"] == 15.092
    assert "queries" not in got and "extended" not in got  # cut mid-dict
    # and the real canonical BENCH_r13.json (the motivating artifact)
    # loads rather than raising — the round-14 acceptance criterion
    real = Path(__file__).resolve().parents[1] / "BENCH_r13.json"
    if real.exists():
        r13 = bc.load_artifact(str(real))
        assert r13["recovered_truncated"]
        assert r13["extended_best"]["q_stats_summary"] == 3.999
        assert bc.primary_numbers(r13) == {}  # medians truly gone

    # the compact r14+ line is preferred whole from a healthy tail
    compact = _json.dumps({"metric": "headline_queries_total_wall",
                           "value": 1.0, "timing": "median_of_3",
                           "queries": {"qa": 1.0}, "compact": True})
    healthy = tmp_path / "healthy.json"
    healthy.write_text(_json.dumps(
        {"n": 14, "rc": 0, "tail": "…full line cut [Stage 9]\n" + compact}))
    got = bc.load_artifact(str(healthy))
    assert got.get("compact") and got["queries"] == {"qa": 1.0}
    # raw multi-line bench stdout: the LAST bench line (compact) wins
    stdout = tmp_path / "stdout.txt"
    stdout.write_text(
        _json.dumps({"metric": "headline_queries_total_wall",
                     "value": 2.0, "queries": {"qa": 2.0}})
        + "\n" + compact + "\n")
    assert bc.load_artifact(str(stdout))["value"] == 1.0
    # a raw capture whose only bench line is cut mid-token recovers
    # piecewise instead of raising (round-14 review finding)
    cut = tmp_path / "cut.txt"
    cut.write_text('{"metric": "headline_queries_total_wall", '
                   '"extended_best": {"qa": 1.5}, "quiet": true, '
                   '"queries": {"qa": 1.')
    got = bc.load_artifact(str(cut))
    assert got["recovered_truncated"]
    assert got["extended_best"] == {"qa": 1.5} and got["quiet"] is True


def test_bench_compare_content_free_artifact_exits_3(tmp_path, capsys,
                                                     monkeypatch):
    # a compact line that shed its per-query maps (or any artifact with
    # none) must not read as all-clear: exit 3, not 0 (round-14 review)
    import json as _json

    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))
    import bench_compare as bc

    art = tmp_path / "empty.json"
    art.write_text(_json.dumps(
        {"metric": "headline_queries_total_wall", "value": 12.3,
         "timing": "median_of_3", "quiet": True, "compact": True,
         "compact_dropped": ["extended", "queries"]}))
    monkeypatch.setattr(sys, "argv", ["bench_compare.py", str(art)])
    assert bc.main() == 3
    assert "no per-query numbers" in capsys.readouterr().out


def test_bench_compare_mem_probe_tags_contended():
    # round 14 (VERDICT r13 #2): a row outside its band whose cpu
    # probe is clean but whose MEM probe shows a gross excursion is
    # `contended`, not `slow` — the JVM-side co-tenancy mode
    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))
    import bench_compare as bc

    band = {"probe_ceiling": 0.483, "probe_mem_ceiling": 0.36,
            "queries": {"qa": {"lo": 1.0, "hi": 1.2}}}
    art = {"timing": "median_of_3", "queries": {"qa": 3.0},
           "probes": {"qa": 0.42}, "probes_mem": {"qa": 0.41}}
    rows, any_slow = bc.adjudicate(art, band)
    assert not any_slow and rows[0][3] == "contended"
    art["probes_mem"]["qa"] = 0.21  # idle mem -> the row IS evidence
    rows, any_slow = bc.adjudicate(art, band)
    assert any_slow and rows[0][3] == "slow"
    # the shipped band carries the ceiling and it matches bench.py
    shipped = bc.load_band()
    assert shipped["probe_mem_ceiling"] == bench.MEM_PROBE_IDLE_BAND[0] \
        * bench.MEM_PROBE_FACTOR
    # compact r14+ line: no probe maps, per-row cleanliness comes from
    # the `dirty` list instead (round-14 live episode: without it every
    # out-of-band row degraded to `contended` and no cron could trip)
    compact = {"timing": "median_of_3", "queries": {"qa": 3.0},
               "dirty": [], "compact": True}
    rows, any_slow = bc.adjudicate(compact, band)
    assert any_slow and rows[0][3] == "slow"
    compact["dirty"] = ["qa"]
    rows, any_slow = bc.adjudicate(compact, band)
    assert not any_slow and rows[0][3] == "contended"
    # no probes AND no dirty list (pre-r13 artifact): conservative —
    # never `slow`
    rows, any_slow = bc.adjudicate({"queries": {"qa": 3.0}}, band)
    assert not any_slow and rows[0][3] == "contended"


def test_driver_tail_roundtrip_end_to_end(tmp_path):
    # the whole round-14 acceptance path in one test: bench stdout
    # (full line + compact line) -> the driver's last-2000-chars tail
    # capture -> load_artifact -> every headline median intact. This is
    # the invariant whose violation silently destroyed BENCH_r13.json.
    import json as _json

    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))
    import bench_compare as bc

    names = bench.HEADLINE + bench.EXTENDED
    band = bc.load_band()["queries"]
    mid = {n: round((band[n]["lo"] + band[n]["hi"]) / 2, 3) for n in names}
    artifact = {
        "metric": "headline_queries_total_wall", "value": 12.345,
        "unit": "sec", "timing": "median_of_3",
        "queries": {n: mid[n] for n in bench.HEADLINE},
        "queries_best": {n: mid[n] for n in bench.HEADLINE},
        "extended": {n: mid[n] for n in bench.EXTENDED},
        "extended_best": {n: mid[n] for n in bench.EXTENDED},
        "extended_total": 16.415, "sf": 0.1,
        "loadavg_start": [0.1, 0.2, 0.3], "loadavg_end": [1.0, 0.5, 0.3],
        "headline_runs": [13.0, 12.4, 12.3],
        "extended_runs": [17.0, 16.4, 16.4],
        "probes": {n: 0.42 for n in names},
        "probe_band": [0.4, 0.46], "probes_ok": True, "probe_max": 0.42,
        "probes_mem": {n: 0.21 for n in names},
        "mem_probe_idle_band": [0.18, 0.27],
        "quiet": True, "quiet_extended": True, "settle_attempts": 0,
        "dirty": [],
    }
    stdout = _json.dumps(artifact) + "\n" + bench.compact_summary(artifact) + "\n"
    assert len(stdout) > 2000  # the full line alone must overflow —
    # that's the regime that destroyed r13's medians
    wrapper = tmp_path / "BENCH_sim.json"
    wrapper.write_text(_json.dumps(
        {"n": 14, "rc": 0, "tail": stdout[-2000:], "parsed": None}))
    got = bc.load_artifact(str(wrapper))
    assert got.get("compact") and got["value"] == 12.345
    assert got["queries"] == artifact["queries"]
    assert got["extended"] == artifact["extended"]
    assert got["quiet"] and got["quiet_extended"] and got["dirty"] == []
    rows, any_slow = bc.adjudicate(got, bc.load_band())
    assert len(rows) == 26 and not any_slow


def test_make_band_build_band():
    # round 15 (VERDICT r14 #2): the band builder refuses non-quiet /
    # non-median controls and emits min-max rows with the spike
    # watermark at n >= 5
    import pytest

    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))
    import make_band as mb

    def control(vals: dict, quiet=True, quiet_ext=True):
        qs = dict(list(vals.items())[:1])
        ext = dict(list(vals.items())[1:])
        return {"timing": "median_of_3", "quiet": quiet,
                "quiet_extended": quiet_ext, "queries": qs,
                "extended": ext,
                "value": round(sum(qs.values()), 3),
                "extended_total": round(sum(ext.values()), 3),
                "probe_band": [0.40, 0.46],
                "mem_probe_idle_band": [0.18, 0.27]}

    ctrls = [control({"qa": v, "qb": w})
             for v, w in [(1.0, 4.2), (1.1, 4.0), (1.05, 4.5),
                          (1.2, 4.8), (1.0, 7.0)]]
    band = mb.build_band(ctrls, source="test")
    qb = band["queries"]["qb"]
    assert qb["lo"] == 4.0 and qb["hi"] == 7.0 and qb["n"] == 5
    # watermark: second_max 4.8 * 1.15 = 5.52, under the spiked max
    assert qb["hi_typ"] == 5.52
    # no watermark when the max is not a spike past second_max * 1.15
    qa = band["queries"]["qa"]
    assert qa == {"lo": 1.0, "hi": 1.2, "n": 5}
    assert band["probe_ceiling"] == 0.483
    assert band["probe_mem_ceiling"] == 0.36
    assert band["headline_total"]["lo"] == 1.0
    # refusals: the r13 failure mode (mixed/contended inputs) is an
    # error, never a silently wider band
    with pytest.raises(ValueError, match="not fully quiet"):
        mb.build_band([ctrls[0], control({"qa": 1, "qb": 4},
                                         quiet=False)], "t")
    with pytest.raises(ValueError, match="not fully quiet"):
        mb.build_band([ctrls[0], control({"qa": 1, "qb": 4},
                                         quiet_ext=False)], "t")
    with pytest.raises(ValueError, match="median"):
        mb.build_band([ctrls[0], {**ctrls[1], "timing": None}], "t")
    with pytest.raises(ValueError, match="mismatch"):
        mb.build_band([ctrls[0], control({"qa": 1, "qc": 4})], "t")
    with pytest.raises(ValueError, match=">= 2"):
        mb.build_band([ctrls[0]], "t")


def test_high_watermark_verdict():
    # round 15: `high` = inside the hard band but past hi_typ — the
    # spike-prone rows' visibility marker; never trips the exit code
    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))
    import bench_compare as bc

    assert bc.verdict(5.0, 4.0, 7.0, True, hi_typ=5.5) == "in-band"
    assert bc.verdict(6.5, 4.0, 7.0, True, hi_typ=5.5) == "high"
    # a dirty probe suppresses `high` (not evidence of anything)
    assert bc.verdict(6.5, 4.0, 7.0, False, hi_typ=5.5) == "in-band"
    # beyond the hard band stays `slow` regardless of the watermark
    assert bc.verdict(8.0, 4.0, 7.0, True, hi_typ=5.5) == "slow"
    # rows without a watermark behave exactly as before
    assert bc.verdict(6.5, 4.0, 7.0, True) == "in-band"
    band = {"probe_ceiling": 0.483,
            "queries": {"qa": {"lo": 4.0, "hi": 7.0, "hi_typ": 5.5}}}
    art = {"timing": "median_of_3", "queries": {"qa": 6.5},
           "probes": {"qa": 0.42}}
    rows, any_slow = bc.adjudicate(art, band)
    assert not any_slow and rows[0][3] == "high"


def test_r15_band_acceptance():
    # VERDICT r14 #2 acceptance: the r15 band is the default; green on
    # r14's artifacts; red (not all-clear) on the pinned interference
    # episode; and a synthetic 1.5x regression on the previously
    # degenerate rows now trips where the r13 band could not
    import json as _json

    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))
    import bench_compare as bc

    repo = Path(__file__).resolve().parents[1]
    band = bc.load_band()
    # neutral provenance label (round 16, ADVICE r15): tree tags live in
    # the control filenames, not the band's source string
    assert "fully-quiet controls" in band["source"]
    assert "r14-tree" not in band["source"]
    # the shipped default IS the r15 band (newest-first search)
    assert bc.load_band(str(repo / "tools" / "bench_band_r15.json")) == band

    # green on the r14 driver artifact and both committed r14 controls
    for name in ("BENCH_r14.json",
                 "tools/bench_controls_r15/control_01_r14tree.json",
                 "tools/bench_controls_r15/control_02_r14tree.json"):
        art = bc.load_artifact(str(repo / name))
        rows, any_slow = bc.adjudicate(art, band)
        assert not any_slow, (name, [r for r in rows if r[3] == "slow"])

    # red on the pinned episode: its inflated rows stay out-of-band
    # (the run is non-quiet, so the tool exits 4 — inconclusive — but
    # the rows must never read in-band under the rebaselined band)
    ep = bc.load_artifact(str(repo / "tools"
                              / "bench_episode_r14_contended.json"))
    rows, _ = bc.adjudicate(ep, band)
    verdicts = {q: v for q, _, _, v, _ in rows}
    assert verdicts["q_semantic_dedup"] in ("slow", "contended")
    assert verdicts["q_fingerprint_winnowing"] in ("slow", "contended")
    assert ep.get("quiet") is False  # which is why the exit code is 4

    # the r13 degenerate rows now trip on a 1.5x regression: simulate
    # each query at 1.5x its typical (mid-band) value on a quiet run
    for q in ("q_lang_predict", "q_fingerprint_winnowing"):
        b = band["queries"][q]
        typical = (b["lo"] + b["hi"]) / 2
        art = {"timing": "median_of_3", "quiet": True, "dirty": [],
               "queries": {q: round(typical * 1.5, 3)}}
        rows, any_slow = bc.adjudicate(art, band)
        assert any_slow, (q, rows)
        # while the same reading passed inside the r13 band's width
        if q == "q_lang_predict":
            old = bc.load_band(str(repo / "tools" / "bench_band_r13.json"))
            rows_old, slow_old = bc.adjudicate(art, old)
            assert not slow_old, rows_old


def test_recurrent_high_warning(tmp_path, capsys, monkeypatch):
    # round 15: the same row `high` in BOTH compared artifacts prints a
    # recurrence warning — the automated form of the spike-row
    # discriminator (one high = noise, recurrent high = regression)
    import json as _json

    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))
    import bench_compare as bc

    band = bc.load_band()
    spiky = [q for q, b in band["queries"].items() if "hi_typ" in b]
    assert spiky, "r15 band must carry at least one watermark row"
    q = spiky[0]
    b = band["queries"][q]
    v = round((b["hi_typ"] * 1.1 + b["hi"]) / 2, 3)  # high, not slow
    art = {"metric": "headline_queries_total_wall", "value": 1.0,
           "timing": "median_of_3", "quiet": True, "dirty": [],
           "queries": {q: v}}
    p1, p2 = tmp_path / "a1.json", tmp_path / "a2.json"
    p1.write_text(_json.dumps(art))
    p2.write_text(_json.dumps(art))
    monkeypatch.setattr(sys, "argv",
                        ["bench_compare.py", str(p1), str(p2)])
    assert bc.main() == 0  # high never trips the exit code
    out = capsys.readouterr().out
    assert "BOTH artifacts" in out and q in out
    # a high row against a clean older artifact does NOT warn
    p2.write_text(_json.dumps({**art, "queries": {q: b["lo"]}}))
    assert bc.main() == 0
    assert "BOTH artifacts" not in capsys.readouterr().out


def test_r15_band_reproducible_from_committed_controls():
    # the shipped band file is exactly what make_band produces from the
    # control artifacts committed under tools/bench_controls_r15/ (six
    # as of round 15 — the directory is the authoritative count) — a
    # hand-edited band (or a control quietly swapped out) fails here,
    # so the band's provenance is checkable without trusting prose
    import json as _json

    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))
    import bench_compare as bc
    import make_band as mb

    repo = Path(__file__).resolve().parents[1]
    controls_dir = repo / "tools" / "bench_controls_r15"
    paths = sorted(controls_dir.glob("control_*.json"))
    assert len(paths) >= 4, paths  # the rebaseline minimum
    arts = [_json.loads(p.read_text()) for p in paths]
    rebuilt = mb.build_band(arts, source="rebuild")
    shipped = bc.load_band(str(repo / "tools" / "bench_band_r15.json"))
    for key in ("queries", "headline_total", "extended_total",
                "probe_band", "probe_ceiling", "probe_mem_ceiling"):
        assert rebuilt[key] == shipped[key], key
    # every committed control self-classified fully quiet — the
    # builder's refusal path guarantees it, but pin the inputs too
    for a in arts:
        assert a["quiet"] and a["quiet_extended"]
        assert a["timing"] == "median_of_3"


def test_contended_episode_exits_inconclusive_4(monkeypatch, capsys):
    # round 16 (VERDICT r15 #3): pin the LIVE contended episode's exit
    # code under the shipped r15 band. test_r15_band_acceptance pins its
    # rows as out-of-band; this pins the CLI verdict itself — exit 4
    # (inconclusive: slow rows on a non-quiet run), never 0 (all-clear)
    # and never 2 (real-regression), so the inconclusive/all-clear split
    # can't regress silently.
    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))
    import bench_compare as bc

    repo = Path(__file__).resolve().parents[1]
    ep = str(repo / "tools" / "bench_episode_r14_contended.json")
    monkeypatch.setattr(sys, "argv", ["bench_compare.py", ep])
    assert bc.main() == 4
    out = capsys.readouterr().out
    assert "inconclusive" in out and "not all-clear" in out


def test_load_band_missing_raises_named_paths(monkeypatch, tmp_path):
    # round 16 (ADVICE r15): when neither default band file exists,
    # load_band(None) names the searched candidates instead of letting
    # open(None) raise a bare TypeError
    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))
    import bench_compare as bc

    monkeypatch.setattr(bc, "HERE", str(tmp_path))
    with pytest.raises(FileNotFoundError) as exc:
        bc.load_band(None)
    msg = str(exc.value)
    for name in bc.DEFAULT_BANDS:
        assert name in msg
    assert "--band" in msg


def test_headline_and_extended_are_registered_queries():
    from pydala_spark.queries import QUERIES

    for name in bench.HEADLINE + bench.EXTENDED:
        assert name in QUERIES, name
    # the headline list is FROZEN for cross-round comparability
    # (CLAUDE.md); a change here is a deliberate rebaseline, not drift
    assert len(bench.HEADLINE) == 19 and len(bench.EXTENDED) == 7
