"""Command-line entry points for lake maintenance workflows.

Parity surface for the reference's runnable scripts
(``/root/reference/scripts/repartition.py`` and ``scripts/timefly.py``,
typer apps driven by a TOML config whose string ``"None"`` values mean
null): a migrating user's cron jobs call scripts, not Python APIs.

Two invocation styles, both per subcommand:

- **Config parity** — pass a ``.toml`` path (the reference's calling
  convention)::

      python -m pydala_spark.cli repartition job.toml
      python -m pydala_spark.cli timefly add job.toml
      python -m pydala_spark.cli pipeline clean.toml
      python -m pydala_spark.cli cron lake.toml      # maintain + sweeps
      python -m pydala_spark.cli profile --source /lake/docs
      python -m pydala_spark.cli signatures --root /lake --verify

  with the options under a ``[repartition]`` / ``[timefly]`` table
  (keys = the flag names below; ``"None"`` strings are nulls, matching
  the reference's NestedDictReplacer semantics).

- **Flags** — plain argparse options, no file needed::

      python -m pydala_spark.cli repartition --source /lake/ds \\
          --partition-by l_returnflag --sort-by l_orderkey
      python -m pydala_spark.cli timefly add --path /lake/ds

Everything delegates to the library operators
(:class:`~pydala_spark.dataset.repartition.Repartition`,
:class:`~pydala_spark.dataset.timefly.TimeFly`) — the CLI only parses.
"""

from __future__ import annotations

import argparse
import sys


def _load_toml_config(path: str, section: str) -> dict:
    """Read ``[section]`` from a TOML config, mapping the reference's
    ``"None"`` string sentinel to real nulls (NestedDictReplacer
    parity, reference scripts/repartition.py:8-11)."""
    import tomllib

    with open(path, "rb") as f:
        raw = tomllib.load(f)
    table = raw.get(section, raw)  # flat files work too

    def _none(v):
        if isinstance(v, dict):
            return {k: _none(x) for k, x in v.items()}
        if isinstance(v, list):
            return [_none(x) for x in v]
        return None if v == "None" else v

    return {k: _none(v) for k, v in table.items()}


def _csv(value):
    if value is None or isinstance(value, list):
        return value
    return [p for p in str(value).split(",") if p]


def _session(args):
    from pydala_spark.session import get_session

    return get_session(
        app_name="pydala-spark-cli",
        master=args.master,
        shuffle_partitions=args.shuffle_partitions,
    )


#: flag-backed option names (read off args in the loop below); the
#: config whitelist derives from this ONE tuple plus the two
#: boolean-only keys, so the lists cannot desynchronize (r5 review)
_REPARTITION_FLAG_KEYS = (
    "source", "dest", "source_format", "dest_format", "partition_by",
    "sort_by", "drop", "compression", "mode", "max_records_per_file",
)
_REPARTITION_KEYS = set(_REPARTITION_FLAG_KEYS) | {"distinct", "with_snapshot"}


def _cmd_repartition(args) -> int:
    opts: dict = {}
    if args.config:
        opts.update(_load_toml_config(args.config, "repartition"))
        unknown = sorted(set(opts) - _REPARTITION_KEYS)
        if unknown:
            # a clean exit-2 diagnosis beats the raw TypeError a splat
            # into Repartition(**opts) would raise (r5 review)
            print(
                f"repartition: unknown config key(s) {unknown} — "
                f"valid keys: {sorted(_REPARTITION_KEYS)}",
                file=sys.stderr,
            )
            return 2
    for key in _REPARTITION_FLAG_KEYS:
        v = getattr(args, key)
        if v is not None:
            opts[key] = v
    if args.distinct:
        opts["distinct"] = True
    if args.no_snapshot:
        opts["with_snapshot"] = False
    source = opts.pop("source", None)
    if not source:
        print("repartition: --source (or config key 'source') is required",
              file=sys.stderr)
        return 2
    from pydala_spark.dataset.repartition import Repartition

    spark = _session(args)
    Repartition(
        spark,
        source,
        dest_path=opts.pop("dest", None),
        partition_by=_csv(opts.pop("partition_by", None)),
        sort_by=opts.pop("sort_by", None),
        drop=_csv(opts.pop("drop", None)),
        **opts,
    ).run()
    print(f"repartitioned {source}")
    return 0


def _cmd_timefly(args) -> int:
    opts: dict = {}
    if args.config:
        opts.update(_load_toml_config(args.config, "timefly"))
        unknown = sorted(set(opts) - {"path", "ts", "snapshot_mode"})
        if unknown:
            print(
                f"timefly: unknown config key(s) {unknown} — valid keys: "
                "['path', 'snapshot_mode', 'ts']",
                file=sys.stderr,
            )
            return 2
    if args.path is not None:
        opts["path"] = args.path
    if args.ts is not None:
        opts["ts"] = args.ts
    if args.snapshot_mode is not None:
        opts["snapshot_mode"] = args.snapshot_mode
    path = opts.get("path")
    if not path:
        print("timefly: --path (or config key 'path') is required",
              file=sys.stderr)
        return 2
    from pydala_spark.dataset.timefly import TimeFly

    spark = _session(args)
    tf = TimeFly(spark, path, snapshot_mode=opts.get("snapshot_mode", "copy"))
    action = args.action
    if action == "init":
        # reference timefly.py `init`: materialize the manifest and the
        # current/ layout (migrating loose root files into current/)
        tf.new()
        tf.create_current()
        print(f"initialized TimeFly at {path}")
    elif action == "add":
        ts = tf.add_snapshot()
        print(f"snapshot {ts}")
    elif action == "delete":
        if not opts.get("ts"):
            print("timefly delete: --ts is required", file=sys.stderr)
            return 2
        tf.delete_snapshot(opts["ts"])
        print(f"deleted snapshot {opts['ts']}")
    elif action == "load":
        if not opts.get("ts"):
            print("timefly load: --ts is required", file=sys.stderr)
            return 2
        tf.load_snapshot(opts["ts"])
        print(f"restored snapshot {opts['ts']}")
    elif action == "list":
        for ts in tf.snapshots():
            print(ts)
    else:  # pragma: no cover - argparse restricts choices
        return 2
    return 0


#: CLI-level keys for the pipeline subcommand (IO wiring); the cleaning
#: knobs themselves are whitelisted against prep_documents' signature at
#: run time so the two can never desynchronize
_PIPELINE_IO_KEYS = (
    "source", "dest", "source_format", "dest_format",
    "benchmark", "benchmark_format", "mode", "report",
    "signatures", "signatures_path", "signatures_verify",
)


def _pipeline_prep_keys() -> set:
    import inspect

    from pydala_spark.operators.pipeline import prep_documents

    params = set(inspect.signature(prep_documents).parameters)
    # frames / hooks are not expressible in a TOML config
    return params - {"df", "benchmark", "stage_frames",
                     "precomputed_minhash", "precomputed_fps",
                     "precomputed_spans", "precomputed_cells"}


def _cmd_pipeline(args) -> int:
    """The third thing a production cron runs beside repartition and
    timefly: the cleaning pipeline itself — ``[pipeline]`` TOML keys map
    onto :func:`~pydala_spark.operators.pipeline.prep_documents` kwargs
    plus source/dest/benchmark IO wiring."""
    prep_keys = _pipeline_prep_keys()
    opts: dict = {}
    if args.config:
        opts.update(_load_toml_config(args.config, "pipeline"))
        unknown = sorted(set(opts) - set(_PIPELINE_IO_KEYS) - prep_keys)
        if unknown:
            print(
                f"pipeline: unknown config key(s) {unknown} — valid keys: "
                f"{sorted(set(_PIPELINE_IO_KEYS) | prep_keys)}",
                file=sys.stderr,
            )
            return 2
    for key in ("source", "dest", "benchmark", "min_quality",
                "shard_tokens"):
        v = getattr(args, key)
        if v is not None:
            opts[key] = v
    if args.report:
        opts["report"] = True
    source = opts.pop("source", None)
    dest = opts.pop("dest", None)
    if not source or not dest:
        print("pipeline: --source and --dest (or config keys) are required",
              file=sys.stderr)
        return 2
    src_fmt = opts.pop("source_format", None) or "parquet"
    dest_fmt = opts.pop("dest_format", None) or "parquet"
    bench_path = opts.pop("benchmark", None)
    bench_fmt = opts.pop("benchmark_format", None) or src_fmt
    mode = opts.pop("mode", None) or "overwrite"
    report = bool(opts.pop("report", False))
    sig_kinds = opts.pop("signatures", None) or ()
    sig_path = opts.pop("signatures_path", None) or source
    sig_verify = bool(opts.pop("signatures_verify", True))

    from pydala_spark.operators.pipeline import prep_documents

    spark = _session(args)
    df = spark.read.format(src_fmt).load(source)
    bench = (
        spark.read.format(bench_fmt).load(bench_path)
        if bench_path else None
    )
    if sig_kinds:
        # ingest-materialized signature sidecars feed the pipeline's
        # hashing stages; the content marker is re-verified against the
        # live corpus BY DEFAULT (signatures_verify=false to opt out) —
        # one narrow aggregate per sidecar buys out the silent
        # zero-overlap failure a stale sidecar would otherwise produce.
        # Params the config also sets become expect= pins, so a config/
        # sidecar hashing mismatch fails loud instead of finding nothing.
        from pydala_spark.dataset.maintain import read_signatures

        verify = df if sig_verify else None
        _expect_map = {
            "minhash": {"n_hashes": "n_hashes",
                        "seed": "near_dup_seed",
                        "shingle_mode": "near_dup_shingle_mode",
                        "shingle_size": "near_dup_shingle_size"},
            "winnowing": {"k": "winnowing_k", "window": "winnowing_window"},
            # the sidecar's recorded k/window DRIVE the span math via
            # params=; pinning config-set values here turns a config/
            # sidecar contradiction into a loud error instead of a
            # silent override
            "spans": {"k": "span_k", "window": "span_window"},
            # the recorded vec_col must be the one the semantic stage
            # reads — cells assigned from a different embedding column
            # would block-dedup the wrong space
            "embedding_cells": {"vec_col": "vec_col"},
        }
        for kind in sig_kinds:
            if kind not in ("spans", "minhash", "winnowing",
                            "embedding_cells"):
                print(
                    f"pipeline: unknown signatures kind {kind!r} — valid: "
                    "spans, minhash, winnowing, embedding_cells",
                    file=sys.stderr,
                )
                return 2
            expect = {
                rec: opts[opt]
                for rec, opt in _expect_map.get(kind, {}).items()
                if opt in opts
            } or None
            frame, params = read_signatures(
                spark, sig_path, kind, expect=expect, verify_against=verify
            )
            if kind == "spans":
                # (frame, params) tuple: the recorded k/window drive the
                # span-boundary math inside prep_documents
                opts["precomputed_spans"] = (frame, params)
            elif kind == "minhash":
                opts["precomputed_minhash"] = frame
            elif kind == "embedding_cells":
                # (frame, params) tuple: the recorded codebook_sha then
                # refuses cells assigned under a retrained codebook
                opts["precomputed_cells"] = (frame, params)
            else:
                opts["precomputed_fps"] = frame
    if report:
        # ONE lazy program serves both the per-stage counts and the
        # final write (round-6 advice: the old spelling ran the whole
        # pipeline twice). Each stage frame is persisted just before its
        # count and released once the next stage's count has built on
        # top of it — every stage computes exactly once, at most two
        # stage caches are live at any moment, and the write reuses the
        # last cached stage's plan subtree instead of re-running the
        # lineage from the scan.
        stages: dict = {}
        out = prep_documents(df, benchmark=bench, stage_frames=stages,
                             **opts)
        live: list = []  # currently-persisted frames; finally drains ALL
        try:
            prev = None
            for stage, frame in stages.items():
                frame.persist()
                live.append(frame)
                print(f"{stage}: {frame.count()}")
                if prev is not None:
                    prev.unpersist()
                    live.remove(prev)
                prev = frame
            out.write.format(dest_fmt).mode(mode).save(dest)
        finally:
            for frame in live:
                frame.unpersist()
    else:
        out = prep_documents(df, benchmark=bench, **opts)
        out.write.format(dest_fmt).mode(mode).save(dest)
    print(f"pipeline: wrote {dest}")
    return 0


def _cmd_profile(args) -> int:
    """One-line JSON corpus health summary (operators.textstats.
    corpus_profile) — the first look a cron/runbook takes at a new
    crawl drop."""
    if not args.source:
        print("profile: --source is required", file=sys.stderr)
        return 2
    import json

    from pydala_spark.operators.textstats import corpus_profile

    spark = _session(args)
    df = spark.read.format(args.format or "parquet").load(args.source)
    row = corpus_profile(df, text_col=args.text_col).collect()[0]
    print(json.dumps(row.asDict(), default=float))
    return 0


def _cmd_decontaminate(args) -> int:
    """Lake-wide benchmark-decontamination sweep
    (catalog.Datalake.decontaminate) — serves every dataset from its
    signature sidecar (materializing/refreshing as needed), writes
    per-dataset hit reports + a lake summary, prints the summary."""
    if not args.root or not args.benchmark:
        print("decontaminate: --root and --benchmark are required",
              file=sys.stderr)
        return 2
    import json

    from pydala_spark.catalog import Datalake

    spark = _session(args)
    benchmarks = {}
    for spec in args.benchmark:
        name, _, path = spec.rpartition("=")
        if not name:
            name, path = "benchmark", spec
        benchmarks[name] = spark.read.format(
            args.format or "parquet"
        ).load(path)
    results = Datalake(spark, args.root).decontaminate(
        benchmarks,
        id_col=args.id_col, text_col=args.text_col,
        min_hits=args.min_hits,
        materialize=not args.no_materialize,
        verify=not args.no_verify,
        report_dir=args.report_dir,
        mode=args.mode, vec_col=args.vec_col,
        threshold=args.threshold, block_bits=args.block_bits,
        dim=args.dim, n_probes=args.n_probes,
        shingle_size=args.shingle_size, shingle_mode=args.shingle_mode,
        signatures_root=args.signatures_root,
        incremental=args.incremental,
        max_concurrency=args.max_concurrency,
    )
    print(json.dumps(results, indent=2, sort_keys=True, default=str))
    flagged = [
        n for n, r in results.items()
        if any(v > 0 for v in r.get("contaminated", {}).values())
    ]
    return 1 if any("error" in r for r in results.values()) else (
        3 if flagged and args.fail_on_hits else 0
    )


def _cmd_semantic_dedup(args) -> int:
    """Lake-wide SemDeDup sweep (catalog.Datalake.semantic_dedup) —
    cells-sidecar served under the lake-pinned codebook, per-dataset
    (id, cell, kept) reports + summary, printed as JSON."""
    if not args.root:
        print("semantic-dedup: --root is required", file=sys.stderr)
        return 2
    import json

    from pydala_spark.catalog import Datalake

    spark = _session(args)
    results = Datalake(spark, args.root).semantic_dedup(
        id_col=args.id_col, vec_col=args.vec_col,
        threshold=args.threshold, n_centroids=args.n_centroids,
        codebook_path=args.codebook, score_col=args.score_col,
        materialize=not args.no_materialize,
        verify=not args.no_verify,
        report_dir=args.report_dir,
        signatures_root=args.signatures_root,
        incremental=args.incremental,
        max_concurrency=args.max_concurrency,
        cross_dataset=args.cross_dataset,
        partial_max_cell_fraction=args.partial_max_cell_fraction,
    )
    print(json.dumps(results, indent=2, sort_keys=True, default=str))
    dropped = [n for n, r in results.items()
               if r.get("n_dropped", 0) > 0]
    return 1 if any(
        "error" in r for r in results.values() if isinstance(r, dict)
    ) else (3 if dropped and args.fail_on_dups else 0)


def _cmd_neardup_dedup(args) -> int:
    """Lake-wide cross-dataset text near-dup sweep
    (catalog.Datalake.neardup_dedup) — minhash-sidecar served, LSH +
    connected components across every dataset, per-dataset verdict
    partitions + summary, printed as JSON."""
    if not args.root:
        print("neardup-dedup: --root is required", file=sys.stderr)
        return 2
    import json

    from pydala_spark.catalog import Datalake

    spark = _session(args)
    results = Datalake(spark, args.root).neardup_dedup(
        id_col=args.id_col, text_col=args.text_col,
        n_hashes=args.n_hashes, n_bands=args.n_bands,
        shingle_size=args.shingle_size, shingle_mode=args.shingle_mode,
        seed=args.seed, max_bucket_size=args.max_bucket_size,
        score_col=args.score_col,
        materialize=not args.no_materialize,
        verify=not args.no_verify,
        report_dir=args.report_dir,
        signatures_root=args.signatures_root,
        incremental=args.incremental,
        max_concurrency=args.max_concurrency,
        edge_warn_multiple=args.edge_warn_multiple,
    )
    print(json.dumps(results, indent=2, sort_keys=True, default=str))
    dropped = [n for n, r in results.items()
               if isinstance(r, dict) and r.get("n_dropped", 0) > 0]
    return 1 if any(
        "error" in r for r in results.values() if isinstance(r, dict)
    ) else (3 if dropped and args.fail_on_dups else 0)


def _cmd_ann(args) -> int:
    """ANN index maintenance (round 9) — the two jobs a nightly
    embedding-index cron runs: ``ann append`` grows a persisted IVFADC
    index with new vectors (``--if-exists skip`` is the idempotent form
    — point it at the full, growing embeddings dataset every night and
    exactly the unseen rows index; codebooks stay pinned), and
    ``ann stats`` prints the index health report, exiting 3 with
    ``--fail-imbalance X`` when the hot-cell ratio drifts past X (the
    "rebuild the codebook" alert — see operators/ann.py
    append_ivfpq_index on drift); ``ann eval`` measures recall@k
    against exact brute force on a deterministic probe panel — the
    number imbalance only proxies — exiting 3 with ``--fail-recall R``
    when it drops below R. ``ann remove`` deletes vectors by id (the
    GDPR path — only the affected cell partitions rewrite)."""
    import json

    from pydala_spark.operators.ann import (
        append_ivfpq_index,
        index_recall,
        index_stats,
        remove_from_ivfpq_index,
    )

    if not args.index:
        print("ann: --index is required", file=sys.stderr)
        return 2
    spark = _session(args)
    if args.action == "remove":
        if not args.source:
            print("ann remove: --source is required (a dataset whose "
                  "FIRST column holds the ids to delete)",
                  file=sys.stderr)
            return 2
        ids = spark.read.format(args.source_format).load(args.source)
        n = remove_from_ivfpq_index(
            spark, args.index, ids, id_col=args.id_col)
        print(json.dumps({"removed": n}))
        return 0
    if args.action == "append":
        if not args.source:
            print("ann append: --source is required", file=sys.stderr)
            return 2
        df = spark.read.format(args.source_format).load(args.source)
        n = append_ivfpq_index(
            spark, args.index, df,
            id_col=args.id_col, vec_col=args.vec_col,
            check_ids=not args.no_check_ids,
            if_exists=args.if_exists,
        )
        print(json.dumps({"appended": n}))
        return 0
    if args.action == "eval":
        if not args.source:
            print("ann eval: --source is required (the vector dataset "
                  "the exact side scans)", file=sys.stderr)
            return 2
        df = spark.read.format(args.source_format).load(args.source)
        rep = index_recall(
            spark, args.index, df,
            id_col=args.id_col, vec_col=args.vec_col,
            k=args.k, n_probe_centroids=args.n_probe_centroids,
            n_probes=args.n_probes, rerank_top=args.rerank_top,
        )
        print(json.dumps(rep, indent=2, sort_keys=True))
        if args.fail_recall is not None and (
                rep["recall_at_k"] is None
                or rep["recall_at_k"] < args.fail_recall):
            return 3
        return 0
    stats = index_stats(spark, args.index)
    print(json.dumps(stats, indent=2, sort_keys=True, default=str))
    if args.fail_imbalance is not None \
            and stats["imbalance"] > args.fail_imbalance:
        return 3
    return 0


def _cmd_signatures(args) -> int:
    """Sidecar-freshness dashboard (catalog.Datalake.signatures_report)
    — which datasets the next sweep serves from sidecars and which pay
    re-hashing; --verify re-checks every marker against live data.
    Exit 3 with --fail-on-stale when anything is stale or pre-marker."""
    if not args.root:
        print("signatures: --root is required", file=sys.stderr)
        return 2
    import json

    from pydala_spark.catalog import Datalake

    spark = _session(args)
    results = Datalake(spark, args.root).signatures_report(
        verify=args.verify, signatures_root=args.signatures_root,
    )
    print(json.dumps(results, indent=2, sort_keys=True, default=str))
    if any("error" in r for r in results.values()):
        return 1
    if args.fail_on_stale:
        stale = any(
            info.get("fresh") is False or info.get("marker") is None
            for r in results.values()
            for info in r.get("sidecars", {}).values()
        )
        if stale:
            return 3
    return 0


#: sweep sections a cron config may carry, in execution order; each
#: maps onto the same-named Datalake method, kwargs whitelisted against
#: its signature at run time so the lists can never desynchronize
#: maintain (compaction) runs FIRST — sidecars carry over compaction
#: (round 8 lifecycle matrix), so the sweeps that follow still reuse them
#: signatures_report runs LAST: after the sweeps have re-materialized
#: whatever was stale, it is the post-sweep invariant check — with
#: fail_on_stale the cron exits 3 when anything STILL fails to verify
_CRON_SECTIONS = ("maintain", "prep_sweep", "decontaminate",
                  "semantic_dedup", "neardup_dedup", "span_dedup_report",
                  "signatures_report", "ann_maintain")


def _cmd_cron(args) -> int:
    """ONE config file = the whole lake-maintenance cron: run any of
    ``[decontaminate]`` / ``[semantic_dedup]`` / ``[neardup_dedup]``
    tables — plus ``[maintain]`` (lake-wide compaction, run first) —
    against one lake root in order, printing a combined summary
    — the config-parity calling convention the repartition / timefly /
    pipeline subcommands already use (a production crontab holds one
    line, not three). Section keys are the Datalake method's kwargs
    (whitelisted against its signature); ``[decontaminate]`` takes
    ``benchmark = ["name=path", ...]`` specs like the flag form, plus
    ``fail_on_hits``; the dedup sections take ``fail_on_dups``;
    ``[ann_maintain]`` (round 10) runs the nightly index sequence —
    append new vectors, health stats, optional measured recall — with
    ``fail_imbalance`` / ``fail_recall`` as its alert thresholds. Exit:
    2 on a method-level :class:`ConfigError` (fix the TOML; remaining
    sections are not attempted), 1 on any per-dataset error OR a
    mid-sweep runtime exception (recorded against the section, the
    remaining sections still run), else 3 when a fail_on_* or ann
    alert tripped, else 0."""
    import inspect
    import json
    import tomllib

    from pydala_spark.catalog import Datalake
    from pydala_spark.utils.errors import ConfigError

    with open(args.config, "rb") as f:
        raw = tomllib.load(f)

    def _none(v):
        if isinstance(v, dict):
            return {k: _none(x) for k, x in v.items()}
        if isinstance(v, list):
            return [_none(x) for x in v]
        return None if v == "None" else v

    raw = {k: _none(v) for k, v in raw.items()}
    root = args.root or raw.get("root")
    if not root:
        print("cron: --root (or top-level config key 'root') is required",
              file=sys.stderr)
        return 2
    sections = [s for s in _CRON_SECTIONS if s in raw]
    if not sections:
        print(f"cron: config has none of {list(_CRON_SECTIONS)}",
              file=sys.stderr)
        return 2
    unknown = sorted(set(raw) - set(_CRON_SECTIONS) - {"root"})
    if unknown:
        print(f"cron: unknown top-level key(s) {unknown} — valid: "
              f"{['root', *_CRON_SECTIONS]}", file=sys.stderr)
        return 2

    spark = _session(args)
    lake = Datalake(spark, root)
    combined: dict = {}
    rc = 0
    for section in sections:
        opts = dict(raw[section])
        fail_on = bool(opts.pop("fail_on_hits", False)
                       or opts.pop("fail_on_dups", False))
        method = getattr(lake, section)
        valid = set(inspect.signature(method).parameters) - {"benchmarks"}
        if section == "prep_sweep":
            # the section's knobs pass through **prep_kwargs; surface
            # prep_documents' own signature so a typo'd cleaning knob
            # still fails the config check, not 500 per-dataset errors
            valid -= {"prep_kwargs"}
            valid |= _pipeline_prep_keys()
        bad = sorted(set(opts) - valid
                     - {"benchmark", "benchmark_format", "fail_on_stale"})
        if bad:
            print(f"cron: unknown [{section}] key(s) {bad} — valid: "
                  f"{sorted(valid)}", file=sys.stderr)
            return 2
        call_args = []
        if section == "prep_sweep":
            if not opts.get("dest_root"):
                print("cron: [prep_sweep] needs dest_root = "
                      "\"<cleaned-copies root, OUTSIDE the lake root>\"",
                      file=sys.stderr)
                return 2
            bpath = opts.pop("benchmark", None)
            fmt = opts.pop("benchmark_format", None) or "parquet"
            if bpath:
                opts["benchmark"] = spark.read.format(fmt).load(bpath)
        if section == "ann_maintain":
            if not (opts.get("index_path") and opts.get("source")):
                print("cron: [ann_maintain] needs index_path = "
                      "\"<persisted IVFADC index>\" and source = "
                      "\"<lake embeddings dataset name (or path)>\"",
                      file=sys.stderr)
                return 2
        if section == "decontaminate":
            specs = opts.pop("benchmark", None) or []
            if not specs:
                print("cron: [decontaminate] needs benchmark = "
                      "[\"name=path\", ...]", file=sys.stderr)
                return 2
            fmt = opts.pop("benchmark_format", None) or "parquet"
            benchmarks = {}
            for spec in specs:
                name, _, path = str(spec).rpartition("=")
                if not name:
                    name, path = "benchmark", spec
                benchmarks[name] = spark.read.format(fmt).load(path)
            call_args = [benchmarks]
        if section == "signatures_report":
            fail_on = bool(opts.pop("fail_on_stale", False)) or fail_on
        try:
            results = method(*call_args, **opts)
        except ConfigError as exc:
            # a method-level config refusal (ann_maintain's inert
            # fail_recall, neardup's non-dividing n_bands, ...) is a
            # CONFIG error: route it through the documented exit-2
            # path instead of crashing the cron with a traceback and
            # losing the sections that already ran. ONLY the typed
            # ConfigError takes this path (ADVICE r10): a genuine
            # runtime ValueError from mid-sweep driver-side code
            # (numpy, sidecar parsing) is a per-section FAILURE, not
            # a config typo
            print(f"cron: [{section}] {exc}", file=sys.stderr)
            if combined:
                print(json.dumps(combined, indent=2, sort_keys=True,
                                 default=str))
            return 2
        except Exception as exc:  # noqa: BLE001 — cron containment
            # runtime failure mid-sweep: record it against THIS
            # section (exit 1, same contract as a per-dataset error)
            # and keep running the remaining sections
            combined[section] = {
                "error": f"{type(exc).__name__}: {exc}"[:500]}
            print(f"cron: [{section}] failed: "
                  f"{type(exc).__name__}: {exc}", file=sys.stderr)
            rc = 1
            continue
        combined[section] = results
        if any(isinstance(r, dict) and "error" in r
               for r in results.values()):
            rc = 1
        elif rc == 0 and section == "ann_maintain":
            # the thresholds ARE the fail knobs here (fail_imbalance /
            # fail_recall in the section): any fired alert -> exit 3,
            # the same contract the fail_on_* sections follow
            if any(isinstance(r, dict) and r.get("tripped")
                   for r in results.values()):
                rc = 3
        elif rc == 0 and fail_on and section == "signatures_report":
            stale = any(
                info.get("fresh") is False or info.get("marker") is None
                for r in results.values()
                for info in r.get("sidecars", {}).values()
            )
            if stale:
                rc = 3
        elif rc == 0 and fail_on:
            tripped = any(
                isinstance(r, dict) and (
                    r.get("n_dropped", 0) > 0
                    or any(v > 0 for v in r.get("contaminated", {}).values())
                )
                for r in results.values()
            )
            if tripped:
                rc = 3
    print(json.dumps(combined, indent=2, sort_keys=True, default=str))
    return rc


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(
        prog="python -m pydala_spark.cli",
        description="pydala_spark lake maintenance CLI",
    )
    ap.add_argument("--master", default=None,
                    help="Spark master (default: local[*])")
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    sub = ap.add_subparsers(dest="command", required=True)

    rp = sub.add_parser("repartition", help="rewrite a dataset "
                        "(repartition/compact/re-sort), reference "
                        "scripts/repartition.py parity")
    rp.add_argument("config", nargs="?", default=None,
                    help="TOML config with a [repartition] table")
    rp.add_argument("--source", default=None)
    rp.add_argument("--dest", default=None)
    rp.add_argument("--source-format", dest="source_format", default=None)
    rp.add_argument("--dest-format", dest="dest_format", default=None)
    rp.add_argument("--partition-by", dest="partition_by", default=None,
                    help="comma-separated partition columns")
    rp.add_argument("--sort-by", dest="sort_by", default=None)
    rp.add_argument("--drop", default=None, help="comma-separated columns")
    rp.add_argument("--compression", default=None)
    rp.add_argument("--mode", default=None)
    rp.add_argument("--max-records-per-file", dest="max_records_per_file",
                    type=int, default=None)
    rp.add_argument("--distinct", action="store_true")
    rp.add_argument("--no-snapshot", action="store_true",
                    help="skip the pre-rewrite TimeFly snapshot on "
                    "in-place rewrites")
    rp.set_defaults(func=_cmd_repartition)

    tf = sub.add_parser("timefly", help="snapshot lifecycle, reference "
                        "scripts/timefly.py parity")
    tf.add_argument("action",
                    choices=["init", "add", "delete", "load", "list"])
    tf.add_argument("config", nargs="?", default=None,
                    help="TOML config with a [timefly] table")
    tf.add_argument("--path", default=None)
    tf.add_argument("--ts", default=None)
    tf.add_argument("--snapshot-mode", dest="snapshot_mode", default=None,
                    choices=["copy", "pointer"])
    tf.set_defaults(func=_cmd_timefly)

    pl = sub.add_parser("pipeline", help="run the document-cleaning "
                        "pipeline (prep_documents) from a TOML config "
                        "or flags and write the cleaned corpus")
    pl.add_argument("config", nargs="?", default=None,
                    help="TOML config with a [pipeline] table "
                    "(IO keys + any prep_documents kwarg)")
    pl.add_argument("--source", default=None)
    pl.add_argument("--dest", default=None)
    pl.add_argument("--benchmark", default=None,
                    help="decontamination benchmark dataset path")
    pl.add_argument("--min-quality", dest="min_quality", type=int,
                    default=None)
    pl.add_argument("--shard-tokens", dest="shard_tokens", type=int,
                    default=None)
    pl.add_argument("--report", action="store_true",
                    help="print per-stage survivor counts before writing")
    pl.set_defaults(func=_cmd_pipeline)

    pf = sub.add_parser("profile", help="one-line JSON corpus health "
                        "summary (volume, token distribution, dup-rate "
                        "estimate)")
    pf.add_argument("--source", default=None)
    pf.add_argument("--format", default=None)
    pf.add_argument("--text-col", dest="text_col", default="text")
    pf.set_defaults(func=_cmd_profile)

    dc = sub.add_parser("decontaminate", help="lake-wide benchmark-"
                        "decontamination sweep served from signature "
                        "sidecars (per-dataset reports + summary)")
    dc.add_argument("--root", default=None, help="lake root directory")
    dc.add_argument("--benchmark", action="append", default=None,
                    help="benchmark dataset as [name=]path "
                    "(repeatable)")
    dc.add_argument("--format", default=None)
    dc.add_argument("--id-col", dest="id_col", default="doc_id")
    dc.add_argument("--text-col", dest="text_col", default="text")
    dc.add_argument("--min-hits", dest="min_hits", type=int, default=2)
    dc.add_argument("--report-dir", dest="report_dir", default=None)
    dc.add_argument("--signatures-root", dest="signatures_root",
                    default=None, help="host signature sidecars at "
                    "<root>/<dataset> instead of next to the data "
                    "(read-only lakes)")
    dc.add_argument("--no-materialize", action="store_true",
                    help="fail datasets without a fresh sidecar instead "
                    "of hashing them")
    dc.add_argument("--max-concurrency", dest="max_concurrency",
                    type=int, default=4, help="sweep N datasets' "
                    "independent jobs concurrently (thread pool)")
    dc.add_argument("--incremental", action="store_true",
                    help="skip datasets whose verified content "
                    "marker matches the previous summary (reuse "
                    "their reports)")
    dc.add_argument("--no-verify", action="store_true",
                    help="skip the sidecar content-marker check")
    dc.add_argument("--fail-on-hits", dest="fail_on_hits",
                    action="store_true",
                    help="exit 3 when any dataset has contaminated docs")
    dc.add_argument("--mode", default="winnowing",
                    choices=["winnowing", "embedding", "ngram"],
                    help="overlap modality: winnowing fingerprints "
                    "(sidecar-served), embedding cosine proximity, or "
                    "exact n-gram shingle overlap")
    dc.add_argument("--shingle-size", dest="shingle_size", type=int,
                    default=3, help="n-gram size (ngram mode)")
    dc.add_argument("--shingle-mode", dest="shingle_mode",
                    default="word", choices=["word", "char"],
                    help="shingle unit (ngram mode; char for CJK)")
    dc.add_argument("--vec-col", dest="vec_col", default="embedding")
    dc.add_argument("--threshold", type=float, default=0.9,
                    help="cosine cutoff (embedding mode)")
    dc.add_argument("--block-bits", dest="block_bits", type=int,
                    default=None, help="LSH sign-bit blocking for large "
                    "embedding benchmarks (requires --dim)")
    dc.add_argument("--dim", type=int, default=None)
    dc.add_argument("--n-probes", dest="n_probes", type=int, default=1)
    dc.set_defaults(func=_cmd_decontaminate)

    sd = sub.add_parser("semantic-dedup", help="lake-wide SemDeDup "
                        "sweep served from embedding_cells sidecars "
                        "under the lake-pinned codebook")
    sd.add_argument("--root", default=None, help="lake root directory")
    sd.add_argument("--id-col", dest="id_col", default="vec_id")
    sd.add_argument("--vec-col", dest="vec_col", default="embedding")
    sd.add_argument("--threshold", type=float, default=0.9,
                    help="cosine cutoff for 'same content'")
    sd.add_argument("--n-centroids", dest="n_centroids", type=int,
                    default=16, help="codebook size when training "
                    "(ignored once the lake codebook exists)")
    sd.add_argument("--codebook", default=None,
                    help="pinned codebook JSON (default "
                    "<root>/_codebooks/semantic_dedup.json)")
    sd.add_argument("--score-col", dest="score_col", default=None,
                    help="keep the best-scored member of each group")
    sd.add_argument("--report-dir", dest="report_dir", default=None)
    sd.add_argument("--signatures-root", dest="signatures_root",
                    default=None, help="host signature sidecars at "
                    "<root>/<dataset> instead of next to the data "
                    "(read-only lakes)")
    sd.add_argument("--no-materialize", action="store_true",
                    help="fail datasets without a fresh cells sidecar "
                    "instead of assigning them")
    sd.add_argument("--incremental", action="store_true",
                    help="skip datasets whose verified content "
                    "marker matches the previous summary (reuse "
                    "their reports)")
    sd.add_argument("--cross-dataset", dest="cross_dataset",
                    action="store_true",
                    help="ONE lake-global sweep over the unioned cell "
                    "sidecars: a vector duplicated across datasets "
                    "keeps one copy lake-wide")
    sd.add_argument("--partial-max-cell-fraction",
                    dest="partial_max_cell_fraction", type=float,
                    default=1.0,
                    help="cross+incremental economy guard: run the "
                    "cell-partial night only when touched cells stay "
                    "under this fraction of the codebook (default "
                    "1.0 = off since the round-11 doc-level partial "
                    "is delta-sized even with every cell touched)")
    sd.add_argument("--max-concurrency", dest="max_concurrency",
                    type=int, default=4, help="sweep N datasets' "
                    "independent jobs concurrently (thread pool)")
    sd.add_argument("--no-verify", action="store_true",
                    help="skip the sidecar content-marker check")
    sd.add_argument("--fail-on-dups", dest="fail_on_dups",
                    action="store_true",
                    help="exit 3 when any dataset has near-duplicates")
    sd.set_defaults(func=_cmd_semantic_dedup)

    nd = sub.add_parser("neardup-dedup", help="lake-wide cross-dataset "
                        "text near-dup sweep served from minhash "
                        "sidecars (LSH + connected components)")
    nd.add_argument("--root", default=None, help="lake root directory")
    nd.add_argument("--id-col", dest="id_col", default="doc_id")
    nd.add_argument("--text-col", dest="text_col", default="text")
    nd.add_argument("--n-hashes", dest="n_hashes", type=int, default=8)
    nd.add_argument("--n-bands", dest="n_bands", type=int, default=4)
    nd.add_argument("--shingle-size", dest="shingle_size", type=int,
                    default=3)
    nd.add_argument("--shingle-mode", dest="shingle_mode",
                    default="word", choices=("word", "char"))
    nd.add_argument("--seed", type=int, default=0)
    nd.add_argument("--max-bucket-size", dest="max_bucket_size",
                    type=int, default=256,
                    help="drop viral LSH buckets larger than this "
                    "(route them through exact dedup instead)")
    nd.add_argument("--score-col", dest="score_col", default=None,
                    help="keep the best-scored member of each cluster")
    nd.add_argument("--report-dir", dest="report_dir", default=None)
    nd.add_argument("--signatures-root", dest="signatures_root",
                    default=None, help="host signature sidecars at "
                    "<root>/<dataset> instead of next to the data "
                    "(read-only lakes)")
    nd.add_argument("--no-materialize", action="store_true",
                    help="fail datasets without a fresh minhash sidecar "
                    "instead of hashing them")
    nd.add_argument("--incremental", action="store_true",
                    help="ALL-FRESH fast path: when every dataset's "
                    "verified marker (and score marker) matches the "
                    "previous summary under the same config, reuse the "
                    "prior verdict wholesale; any change falls back to "
                    "the full lake-global sweep")
    nd.add_argument("--max-concurrency", dest="max_concurrency",
                    type=int, default=4, help="sweep N datasets' "
                    "independent jobs concurrently (thread pool)")
    nd.add_argument("--edge-warn-multiple", dest="edge_warn_multiple",
                    type=float, default=4.0,
                    help="incremental: add a balloon_warning to the "
                    "summary's _state when the persisted edge set "
                    "exceeds this multiple of the corpus doc count "
                    "(viral-duplicate night tripwire)")
    nd.add_argument("--no-verify", action="store_true",
                    help="skip the sidecar content-marker check")
    nd.add_argument("--fail-on-dups", dest="fail_on_dups",
                    action="store_true",
                    help="exit 3 when any dataset has near-duplicates")
    nd.set_defaults(func=_cmd_neardup_dedup)

    cr = sub.add_parser("cron", help="run the lake-maintenance sweeps "
                        "([maintain]/[prep_sweep]/[decontaminate]/"
                        "[semantic_dedup]/[neardup_dedup]/"
                        "[span_dedup_report]/[signatures_report] "
                        "tables) from ONE TOML config")
    cr.add_argument("config", help="TOML config; top-level 'root' plus "
                    "one table per sweep (keys = Datalake method kwargs)")
    cr.add_argument("--root", default=None,
                    help="lake root (overrides the config key)")
    cr.set_defaults(func=_cmd_cron)

    an = sub.add_parser("ann", help="ANN index maintenance: append new "
                        "vectors to a persisted IVFADC index under its "
                        "pinned codebooks, or print/alert on its health "
                        "report")
    an.add_argument("action", choices=("append", "stats", "eval",
                                       "remove"))
    an.add_argument("--index", default=None, help="persisted index path "
                    "(save_ivfpq_index output)")
    an.add_argument("--source", default=None,
                    help="dataset with new (id, vector) rows")
    an.add_argument("--source-format", dest="source_format",
                    default="parquet")
    an.add_argument("--id-col", dest="id_col", default="vec_id")
    an.add_argument("--vec-col", dest="vec_col", default="embedding")
    an.add_argument("--if-exists", dest="if_exists", default="raise",
                    choices=("raise", "skip"),
                    help="'skip' = idempotent cron form: only unseen "
                    "ids append")
    an.add_argument("--no-check-ids", dest="no_check_ids",
                    action="store_true",
                    help="trust ingest to deliver fresh ids (skips the "
                    "narrow id overlap check)")
    an.add_argument("--fail-imbalance", dest="fail_imbalance",
                    type=float, default=None,
                    help="stats: exit 3 when max_cell/avg_cell exceeds "
                    "this (codebook drift alert)")
    an.add_argument("--k", type=int, default=10,
                    help="eval: recall@k depth")
    an.add_argument("--n-probes", dest="n_probes", type=int, default=50,
                    help="eval: deterministic probe panel size")
    an.add_argument("--n-probe-centroids", dest="n_probe_centroids",
                    type=int, default=2,
                    help="eval: cells probed per query")
    an.add_argument("--rerank-top", dest="rerank_top", type=int,
                    default=None,
                    help="eval: measure the IVFADC+R configuration "
                    "(exact re-rank of the top-C PQ pool)")
    an.add_argument("--fail-recall", dest="fail_recall", type=float,
                    default=None,
                    help="eval: exit 3 when recall@k drops below this")
    an.set_defaults(func=_cmd_ann)

    sg = sub.add_parser("signatures", help="sidecar-freshness dashboard "
                        "— which datasets the next sweep serves from "
                        "sidecars and which re-hash")
    sg.add_argument("--root", default=None, help="lake root directory")
    sg.add_argument("--verify", action="store_true",
                    help="re-check every marker against live data "
                    "(one narrow aggregate per dataset)")
    sg.add_argument("--signatures-root", dest="signatures_root",
                    default=None, help="out-of-place sidecar layout")
    sg.add_argument("--fail-on-stale", dest="fail_on_stale",
                    action="store_true",
                    help="exit 3 when any sidecar is stale or predates "
                    "content markers")
    sg.set_defaults(func=_cmd_signatures)
    return ap


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    return args.func(args)


if __name__ == "__main__":
    raise SystemExit(main())
