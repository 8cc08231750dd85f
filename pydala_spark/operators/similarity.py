"""Similarity search over embedding columns (north-star extension).

- :func:`cosine_topk` — brute-force top-k: broadcast the (small) probe
  set against the corpus; one scan, no shuffle until the final per-probe
  top-k window. The right baseline, and at 100 TB still the right answer
  when the probe set is small (it's a broadcast map-side job).
- :func:`lsh_bucket` / :func:`lsh_topk` — random-hyperplane LSH with
  hyperplanes derived deterministically from md5 (no RNG, reproducible
  across runs/engines). Bucketing reduces candidate sets by ~2^bits for
  large corpus×query workloads at a recall cost; probe multiple buckets
  (hamming-adjacent) to trade back.

Dot products use ``F.zip_with`` + ``F.aggregate`` — JVM-side array
algebra, no Python. Floats are promoted to double before accumulation so
the fold is well-defined.

Round 16 (guide §7.3 — driver/planning time): the scoring helpers accept
either a Column or a plain COLUMN-NAME string. The string form builds
the identical expression through ONE parsed SQL fragment (``F.expr``)
instead of the Column algebra's py4j chatter — the lambda conversion in
``zip_with``/``aggregate`` plus per-literal round trips made expression
BUILD time a measurable slice of every similarity query (profiled:
~0.7 s of the q_embedding_neardup row was driver-side build). Both
spellings produce the same Catalyst tree; a focused test pins
string-path == Column-path results for every helper.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot_sql(a: str, b: str) -> str:
    """SQL text of :func:`dot` over two SQL fragments (same ops, same
    order: double-cast per element, fold from 0.0)."""
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE)"
        " * CAST(y AS DOUBLE)), 0.0D, (acc, v) -> acc + v)"
    )


def _q(name: str) -> str:
    return f"`{name}`"


def _col(x: Column | str) -> Column:
    """Coerce a column-NAME string to a Column for the algebra fallback
    paths (ADVICE r16: a mixed str/Column call would otherwise lift the
    string into a STRING LITERAL via Column operator overloading —
    ``'na' * nb`` — silently producing NULL/wrong sims)."""
    return F.col(x) if isinstance(x, str) else x


def dot(a: Column | str, b: Column | str) -> Column:
    if isinstance(a, str) and isinstance(b, str):
        return F.expr(_dot_sql(_q(a), _q(b)))
    return F.aggregate(
        F.zip_with(
            _col(a), _col(b),
            lambda x, y: x.cast("double") * y.cast("double"),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column | str) -> Column:
    if isinstance(a, str):
        return F.expr(f"sqrt({_dot_sql(_q(a), _q(a))})")
    return F.sqrt(dot(a, a))


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    if isinstance(a, str) and isinstance(b, str):
        return F.expr(
            f"{_dot_sql(_q(a), _q(b))} / (sqrt({_dot_sql(_q(a), _q(a))})"
            f" * sqrt({_dot_sql(_q(b), _q(b))}))"
        )
    return dot(a, b) / (norm(_col(a)) * norm(_col(b)))


def sim_from_norms(
    a: Column | str, b: Column | str, na: Column | str, nb: Column | str
) -> Column:
    """Cosine from PRE-COMPUTED norms: one array pass per pair instead
    of three. Hoist ``norm(vec)`` onto each side's projection BELOW the
    join (once per row — a corpus row meets every probe) and pass the
    norm columns here; same doubles as :func:`cosine_similarity`
    (identical ops and order, just not repeated). Every similarity
    operator in this package scores through this helper so the hoisting
    invariant lives in one place."""
    if all(isinstance(x, str) for x in (a, b, na, nb)):
        return F.expr(
            f"{_dot_sql(_q(a), _q(b))} / ({_q(na)} * {_q(nb)})"
        )
    return dot(a, b) / (_col(na) * _col(nb))


def cosine_topk(
    corpus: DataFrame,
    probes: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    probe_id_col: str | None = None,
) -> DataFrame:
    """Exact top-k cosine neighbors of each probe (self excluded when ids
    collide). Probes are broadcast; ranking ties break on neighbor id.

    Norms are computed BELOW the join (once per corpus/probe row, not
    once per pair — a corpus row meets every probe): one array pass per
    pair instead of three, measured −12% at sf0.1 with identical
    doubles (same ops, same order, just not repeated)."""
    probe_id_col = probe_id_col or id_col
    p = probes.select(
        F.col(probe_id_col).alias("probe_id"), F.col(vec_col).alias("probe_vec")
    ).withColumn("__pn", norm("probe_vec"))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("vec")
    ).withColumn("__cn", norm("vec"))
    scored = (
        c.join(F.broadcast(p))
        .where(F.col("neighbor_id") != F.col("probe_id"))
        .withColumn(
            "sim",
            sim_from_norms(
                "probe_vec", "vec", "__pn", "__cn"
            ),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= k)
        .select("probe_id", "neighbor_id", "rnk", "sim")
    )


# ---------------------------------------------------------------------------
# LSH (random hyperplane / sign bits)


def _hyperplane(plane: int, dim: int) -> list[float]:
    """Deterministic pseudo-random ±1 hyperplane from md5(plane, i)."""
    return [
        1.0
        if int(hashlib.md5(f"{plane}|{i}".encode()).hexdigest()[:2], 16) % 2 == 0
        else -1.0
        for i in range(dim)
    ]


def lsh_bucket(vec: Column | str, dim: int, bits: int = 8) -> Column:
    """Sign-bit bucket id: bit p is 1 iff vec · hyperplane_p >= 0.

    The string form builds the whole ``bits``-plane expression in ONE
    parsed SQL fragment — the Column spelling paid ``dim`` literal
    round trips per plane (512 py4j calls at dim=64/bits=8) for the
    identical tree (module docstring, round 16)."""
    if isinstance(vec, str):
        terms = ["0"]
        for p in range(bits):
            plane = "array(%s)" % ", ".join(
                f"{v!r}D" for v in _hyperplane(p, dim)
            )
            terms.append(
                f"(CASE WHEN {_dot_sql(_q(vec), plane)} >= 0"
                f" THEN {2 ** p} ELSE 0 END)"
            )
        return F.expr(" + ".join(terms))
    bucket = F.lit(0)
    for p in range(bits):
        plane = F.array(*[F.lit(v) for v in _hyperplane(p, dim)])
        bucket = bucket + F.when(dot(vec, plane) >= 0, F.lit(2**p)).otherwise(F.lit(0))
    return bucket


def lsh_topk(
    corpus: DataFrame,
    probes: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    bits: int = 8,
    n_probes: int = 1,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the probe's LSH bucket.
    Equi-join on bucket replaces the cross product — the scale path when
    the probe set is itself large.

    ``n_probes > 1`` is the recall knob: each probe also searches the
    ``n_probes - 1`` hamming-adjacent buckets (one sign bit flipped —
    the buckets a near-neighbor most likely fell into). Candidate volume
    grows linearly in ``n_probes`` while the join stays an equi-join;
    each (probe, neighbor) pair still appears at most once because a
    corpus vector lives in exactly one bucket."""
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("vec"),
        lsh_bucket(vec_col, dim, bits).alias("bucket"),
    ).withColumn("__cn", norm("vec"))
    p = probes.select(
        F.col(id_col).alias("probe_id"),
        F.col(vec_col).alias("probe_vec"),
        lsh_bucket(vec_col, dim, bits).alias("bucket"),
    ).withColumn("__pn", norm("probe_vec"))
    if n_probes > bits + 1:
        raise ValueError(
            f"n_probes={n_probes} exceeds the {bits + 1} single-bit-flip "
            f"buckets available at bits={bits}; raise bits or lower n_probes"
        )
    if n_probes > 1:
        # explode_cheaply, not F.explode: the bucket column is an alias
        # over the lsh_bucket expression, and InferFiltersFromGenerate's
        # size()>0 filter would re-substitute and re-evaluate it below
        # the projection (CLAUDE.md rule — round-6 review; the earlier
        # "already-materialized int column" justification was wrong in
        # Catalyst terms)
        from pydala_spark.operators.dedup import explode_cheaply

        flips = F.array(
            F.col("bucket"),
            *[F.col("bucket").bitwiseXOR(F.lit(2**b)) for b in range(bits)],
        )
        p = explode_cheaply(
            p.withColumn("__flips", flips).drop("bucket"),
            F.slice(F.col("__flips"), 1, n_probes), "bucket",
        ).drop("__flips")
    scored = (
        c.join(p, "bucket")
        .where(F.col("neighbor_id") != F.col("probe_id"))
        .withColumn(
            "sim",
            sim_from_norms(
                "probe_vec", "vec", "__pn", "__cn"
            ),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= k)
        .select("probe_id", "neighbor_id", "rnk", "sim")
    )


def neardup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str | None = None,
    threshold: float = 0.9,
) -> DataFrame:
    """Embedding near-duplicate pairs above a cosine threshold, blocked by
    ``block_col`` (e.g. an LSH bucket or label) to avoid the full cross
    join. Norms compute once per row below the self-join (not per
    pair), same trick as :func:`cosine_topk`."""
    base = df.select(
        F.col(id_col).alias("__id"),
        F.col(vec_col).alias("__vec"),
        *( [F.col(block_col).alias("blk")] if block_col else [] ),
    ).withColumn("__n", norm("__vec"))
    a = base.select(
        F.col("__id").alias("id_a"), F.col("__vec").alias("vec_a"),
        F.col("__n").alias("__na"), *( ["blk"] if block_col else [] ),
    )
    b = base.select(
        F.col("__id").alias("id_b"), F.col("__vec").alias("vec_b"),
        F.col("__n").alias("__nb"), *( ["blk"] if block_col else [] ),
    )
    cond = F.col("id_a") < F.col("id_b")
    joined = a.join(b, (["blk"] if block_col else [])).where(cond)
    return (
        joined.withColumn(
            "sim",
            sim_from_norms(
                "vec_a", "vec_b", "__na", "__nb"
            ),
        )
        .where(F.col("sim") >= threshold)
        .select("id_a", "id_b", "sim", *(["blk"] if block_col else []))
    )


def quantize_embeddings(
    df: DataFrame, vec_col: str = "embedding", out_col: str = "q_vec"
) -> DataFrame:
    """Symmetric per-vector int8 quantization: ``q[i] = round(v[i] /
    scale)`` with ``scale = max|v| / 127``, stored as ``array<tinyint>``
    plus a ``{out_col}_scale`` double.

    At 100 TB this is the embedding-storage workhorse: 4x less scan IO
    and shuffle width than float32 (and 8x vs the double Spark would
    otherwise promote to), at ~1% cosine error for typical normalized
    embeddings. Pure column algebra — stays in whole-stage codegen.
    All-zero vectors get scale 1.0 (quantize to zeros) rather than a
    divide-by-zero NaN.
    """
    v = F.col(vec_col)
    amax = F.aggregate(
        v, F.lit(0.0), lambda acc, x: F.greatest(acc, F.abs(x.cast("double")))
    )
    scale = F.when(amax > 0.0, amax / F.lit(127.0)).otherwise(F.lit(1.0))
    df = df.withColumn(f"{out_col}_scale", scale)
    return df.withColumn(
        out_col,
        F.transform(
            v,
            lambda x: F.round(x.cast("double") / F.col(f"{out_col}_scale")).cast(
                "tinyint"
            ),
        ),
    )


def quantized_cosine_topk(
    corpus_q: DataFrame,
    probes_q: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "q_vec",
    k: int = 5,
) -> DataFrame:
    """Approximate top-k cosine over :func:`quantize_embeddings` output.

    The integer dot product times the two scales reconstructs the real
    dot product to quantization error; norms likewise — so the ranking
    approximates exact cosine while scanning tinyint arrays. Same
    broadcast-probes shape as :func:`cosine_topk`.
    """
    # scales cancel inside the cosine ratio, so score on the raw integer
    # arrays alone — carrying the scale columns through the broadcast
    # would only widen it
    p = probes_q.select(
        F.col(id_col).alias("probe_id"),
        F.col(vec_col).alias("probe_vec"),
    ).withColumn("__pn", norm("probe_vec"))
    c = corpus_q.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("vec"),
    ).withColumn("__cn", norm("vec"))
    sim = sim_from_norms(
        "probe_vec", "vec", "__pn", "__cn"
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.desc("sim"), F.asc("neighbor_id")
    )
    return (
        c.join(F.broadcast(p))
        .where(F.col("neighbor_id") != F.col("probe_id"))
        .withColumn("sim", sim)
        .withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("probe_id", "neighbor_id", "rnk", "sim")
    )


def semantic_dedup(
    df: DataFrame,
    centroids=None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.2,
    score_col: str | None = None,
    cells: DataFrame | None = None,
    params: dict | None = None,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023): cluster
    the embedding space with a k-means codebook, compare pairs only
    WITHIN a cluster, and drop every document that has a sufficiently
    similar cluster-mate with a smaller id (a deterministic, engine-
    reproducible stand-in for the paper's keep-one-per-group choice).
    With ``score_col`` the BEST-SCORED member of each similar group
    survives instead (ties break to the smaller id) — e.g. keep the
    highest quality_stats/classifier_score document among semantic
    near-dups rather than an arbitrary lowest id.
    Returns ``(id, cell, kept)`` — callers semi-join ``kept`` against the
    corpus to prune it.

    Shape at 100 TB: cell assignment is one Arrow-batched matmul scan;
    the pair comparison is an equi-join on ``cell``. In-cell work is
    quadratic in cell size, so the codebook size — not this operator —
    is the scale knob: train ``N / target_cell_size`` centroids (the
    paper fixes ~100k clusters for its corpus) via :func:`pydala_spark.
    operators.ann.kmeans_centroids` — centroid count growing WITH the
    corpus keeps expected cell size, and therefore per-cell pair work,
    constant, making total cost linear in N (measured:
    tools/scale_probe.py);
    degenerate semantic hotspots should be exact-deduped first (the same
    pre-pass the LSH bucket cap expects, operators/dedup.py). For
    repeated runs, materialize ``(id, cell, norm)`` ONCE with the pinned
    codebook — ``maintain.materialize_signatures(kinds=
    ("embedding_cells",), centroids=cb)`` — and pass the sidecar here as
    ``cells=`` (+ its recorded ``params=`` from ``read_signatures``,
    which pins ``codebook_sha`` so the table can't answer for a
    retrained codebook): the assignment matmul (n_centroids × dim flops
    per vector — the sweep's dominant cost at SemDeDup codebook sizes)
    is replaced by one id-keyed equi-join, and the pair join's cell
    shuffle is unchanged. An id missing from ``cells`` fails LOUD
    (``raise_error``) instead of silently keeping an unassigned doc.
    """
    cols = [F.col(id_col).alias("id"), F.col(vec_col).alias("vec")]
    if score_col:
        cols.append(F.col(score_col).cast("double").alias("__s"))
    if params is not None:
        if cells is None:
            raise ValueError(
                "semantic_dedup: params= without cells= — pass the "
                "sidecar frame read_signatures returned alongside its "
                "params"
            )
        if params.get("kind") != "embedding_cells":
            raise ValueError(
                f"semantic_dedup: params recorded kind "
                f"{params.get('kind')!r}, not 'embedding_cells' — a "
                "text-signature sidecar cannot drive cell blocking"
            )
        if centroids is not None and "codebook_sha" in params:
            from pydala_spark.operators.ann import codebook_sha

            got = codebook_sha(centroids)
            if got != params["codebook_sha"]:
                raise ValueError(
                    f"semantic_dedup: caller codebook ({got}) is not "
                    f"the one the cells sidecar was assigned under "
                    f"({params['codebook_sha']}) — re-materialize the "
                    "embedding_cells sidecar or load the pinned "
                    "codebook (operators.ann.load_codebook)"
                )
    if cells is not None:
        need = {"id", "cell", "norm"}
        if not need <= set(cells.columns):
            raise ValueError(
                f"semantic_dedup: cells= needs columns {sorted(need)} "
                f"(an embedding_cells sidecar); got {cells.columns}"
            )
        # left join + loud per-row null guard, not an inner join: an id
        # the sidecar doesn't cover must RAISE, not silently vanish
        # from the dedup verdict (the same zero-overlap failure class
        # the content marker kills; read_signatures(verify_against=) is
        # the first line of defense, this is the belt-and-braces one)
        base = (
            df.select(*cols)
            .join(cells.select("id", "cell",
                               F.col("norm").alias("__n")), "id", "left")
            .withColumn(
                "cell",
                F.when(F.col("cell").isNotNull(), F.col("cell")).otherwise(
                    F.raise_error(F.lit(
                        "semantic_dedup: precomputed cells miss ids "
                        "present in the corpus — stale or partial "
                        "embedding_cells sidecar; re-materialize"
                    ))
                ),
            )
        )
    else:
        import numpy as np

        from pydala_spark.operators.ann import _assigner

        if centroids is None:
            raise ValueError(
                "semantic_dedup: pass centroids= (inline assignment) "
                "or cells= (a materialized embedding_cells sidecar)"
            )
        # asNondeterministic (round 16, guide §4.4): the cell join's
        # inferred isnotnull(cell) filter was pushed BELOW the UDF
        # projection on the build side, so the codebook matmul — the
        # dominant per-row cost at SemDeDup codebook sizes — ran TWICE
        # per build-side row (plan showed 3 ArrowEvalPython nodes for
        # 2 logical assigns). The marking only pins evaluation order;
        # the assignment itself is deterministic and unchanged.
        assign = _assigner(
            np.asarray(centroids, dtype=np.float64), 1
        ).asNondeterministic()
        base = (
            df.select(*cols)
            .withColumn("cell", F.element_at(assign(F.col("vec")), 1))
            .withColumn("__n", norm("vec"))
        )
    return semantic_kept_against(base, base, threshold=threshold,
                                 scored=bool(score_col))


def semantic_kept_against(
    a_base: DataFrame,
    b_base: DataFrame,
    threshold: float,
    scored: bool = False,
) -> DataFrame:
    """Per-doc SemDeDup verdict for the ``a_base`` rows against the
    ``b_base`` cell-mates only — the pair-formula core of
    :func:`semantic_dedup` (which calls it with ``a == b``), exposed so
    partial-incremental sweeps can keep the pair join DELTA-sized
    (round 11, VERDICT r10 #2).

    Both frames carry ``(id, cell, vec, __n)`` (+ ``__s`` when
    ``scored``). Returns ``(id, cell, kept)`` for every a-row: kept iff
    NO b-row in the same cell ranks ahead of it (score desc, id asc;
    NULL scores as -inf) AND is ``>= threshold`` cosine-similar. An
    a-row whose cell has no b-rows is kept (left join); a self-row in
    ``b_base`` is harmless because the ranking is strict.

    Soundness of the delta decomposition (the caller's contract): for
    an unchanged doc whose PRIOR verdict was kept, the prior sweep
    already proved no unchanged cell-mate beats it (prior mates ⊇
    tonight's unchanged mates under dataset-level freshness), so
    ``b_base = changed docs`` suffices. A previously-DROPPED doc may
    revive when its beater was removed, and a changed doc has no prior
    — both need the full ``b_base = all current members``.
    """
    a = a_base.select(
        "id", "cell", F.col("vec").alias("vec_a"), F.col("__n").alias("__na"),
        *([F.col("__s").alias("__sa")] if scored else []),
    )
    b = b_base.select(
        F.col("id").alias("id_b"), "cell",
        F.col("vec").alias("vec_b"), F.col("__n").alias("__nb"),
        *([F.col("__s").alias("__sb")] if scored else []),
    )
    # a doc is dropped iff SOME smaller-id cell-mate is similar enough.
    # One left join on cell + a per-doc MAX aggregate: every a-row
    # survives (its own cell row matches at worst), the qualifying-pair
    # flag collapses map-side in the partial agg, and the expensive
    # cell-assignment scan runs exactly twice (the two join sides) —
    # not a third time for a corpus re-join. For repeated sweeps,
    # materialize (id, cell) once instead (see docstring).
    # the "b beats a" order: by (score desc, id asc) when scored, by
    # id asc otherwise — a is dropped iff some similar cell-mate ranks
    # ahead of it, so exactly the group's top-ranked member survives.
    # NULL scores rank as -inf (a scored doc always beats an unscored
    # near-dup; two NULLs fall back to id order) — without the coalesce
    # a NULL on either side would null the comparison and silently keep
    # BOTH near-duplicates (r4 review).
    if scored:
        neg_inf = F.lit(float("-inf"))
        sa = F.coalesce(F.col("__sa"), neg_inf)
        sb = F.coalesce(F.col("__sb"), neg_inf)
        beats = (sb > sa) | ((sb == sa) & (F.col("id_b") < F.col("id")))
    else:
        beats = F.col("id_b") < F.col("id")
    sim_ok = beats & (
        sim_from_norms(
            "vec_a", "vec_b", "__na", "__nb"
        )
        >= F.lit(threshold)
    )
    return (
        a.join(b, "cell", "left")
        .withColumn("__d", F.when(sim_ok, F.lit(1)).otherwise(F.lit(0)))
        .groupBy("id", "cell")
        .agg((F.max("__d") == 0).alias("kept"))
    )


def semantic_partial_verdicts(
    sub_base: DataFrame,
    prior_verdicts: DataFrame,
    is_changed,
    threshold: float,
    scored: bool = True,
) -> DataFrame:
    """Tonight's SemDeDup verdicts for every member of the TOUCHED
    cells, decomposed at doc level so the pair join stays delta-sized
    (round 11, VERDICT r10 #2 — the spanning-ingest de-cliff):

    - **changed docs** (``is_changed``) and **previously-DROPPED
      unchanged docs** get a full verdict vs all current members of
      their cell — a dropped doc's beater may have been removed (the
      revive case), and a changed doc has no usable prior;
    - **previously-KEPT unchanged docs** only re-check against CHANGED
      cell-mates: the prior sweep already proved no unchanged mate
      beats them (prior mates ⊇ tonight's unchanged mates under
      dataset-level freshness — see :func:`semantic_kept_against`).

    ``sub_base``: ``(id, cell, vec, __n[, __s])`` for every current
    member of a touched cell. ``prior_verdicts``: ``(id, kept)`` prior
    rows of the UNCHANGED datasets within those cells (lake-qualified
    ids; covers AT MOST the unchanged members — rows can be missing,
    see below). Returns ``(id, cell, kept)`` covering every
    ``sub_base`` row exactly once.

    The split is keyed on "provably prior-kept", NOT on ``is_changed``:
    everything else — changed docs, prior-dropped docs, and any doc
    whose prior row is MISSING (e.g. a verdict partition lost
    out-of-band while the summary survived) — takes the full-verdict
    leg, so a corrupted prior self-heals into recomputation instead of
    silently vanishing from the rewritten table (round-11 review find;
    the round-10 cell-level partial re-verdicted every touched-cell
    member and had this robustness implicitly). NOTE this heals only
    docs INSIDE ``sub_base`` (touched cells) — the caller must protect
    its untouched-cell carry-over separately: the sweep demotes any
    unchanged dataset whose verdict-table row count disagrees with the
    prior summary to CHANGED before taking the partial path
    (``catalog_sweeps.py`` carry-over integrity check).

    Scale shape: with ``C`` changed docs, ``D`` docs lacking a
    prior-kept row and ``M`` touched-cell members, the pair join
    materializes ``(C + D) × cell_size + |kept| × C`` rows instead of
    the full path's quadratic ``Σ cell²`` — measured 0.61× shuffle
    bytes / 0.45× wall on the all-cells-touched cliff shape (SCALE.md).
    """
    prior_kept_ids = prior_verdicts.where(F.col("kept")).select("id")
    a_full = sub_base.join(
        F.broadcast(prior_kept_ids), "id", "left_anti")
    v_full = semantic_kept_against(
        a_full, sub_base, threshold=threshold, scored=scored)
    o_kept_base = sub_base.join(
        F.broadcast(prior_kept_ids), "id", "left_semi")
    v_kept = semantic_kept_against(
        o_kept_base, sub_base.where(is_changed),
        threshold=threshold, scored=scored)
    return v_full.unionByName(v_kept)


def semantic_contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    block_bits: int | None = None,
    dim: int | None = None,
    n_probes: int = 1,
) -> DataFrame:
    """Ids of corpus rows whose embedding lies within cosine
    ``threshold`` of ANY benchmark embedding — EMBEDDING-SPACE benchmark
    decontamination, the semantic complement of the n-gram
    :func:`~pydala_spark.operators.dedup.contamination_hits` (paraphrased
    eval leakage shares no shingles but sits next to the benchmark in
    embedding space).

    Shape at 100 TB: the benchmark (an eval set — thousands of vectors)
    broadcasts with pre-hoisted norms; the corpus joins it with a LEFT
    SEMI broadcast-nested-loop on the similarity predicate, so each
    corpus row stops at its FIRST qualifying benchmark neighbor and
    non-matching pairs never materialize. The corpus is scanned once and
    never shuffled; cost is O(|corpus| × |benchmark| × dim) JVM flops
    worst-case. For LARGE benchmarks set ``block_bits`` (round 6): both
    sides get a :func:`lsh_bucket` sign-bit key and the join becomes a
    broadcast HASH join on bucket with the cosine as a post-join filter
    — per-corpus-row work drops from |benchmark| to the benchmark rows
    sharing its bucket (×``n_probes``), an EXPECTED ~2^block_bits/
    n_probes reduction in comparisons at a bounded recall cost (a pair
    within ``threshold`` may still land in buckets more than
    ``n_probes-1`` bit-flips apart; raise ``n_probes`` to trade
    comparisons back for recall — hyperplanes are md5-deterministic, so
    recall is reproducible, measurable with :func:`topk_recall`-style
    planted tests, and identical across runs/engines). ``dim`` (the
    embedding width) is required with ``block_bits``. Returns ``(id,)``
    of contaminated rows.
    """
    return (
        _semantic_bench_join(
            corpus, benchmark, vec_col, threshold, "left_semi",
            block_bits=block_bits, dim=dim, n_probes=n_probes,
        )
        .select(F.col(id_col).alias("id"))
    )


def _semantic_bench_join(
    corpus: DataFrame,
    benchmark: DataFrame,
    vec_col: str,
    threshold: float,
    how: str,
    block_bits: int | None = None,
    dim: int | None = None,
    n_probes: int = 1,
) -> DataFrame:
    """ONE broadcast semi/anti join of the corpus against the benchmark
    on the cosine predicate — the corpus is scanned once and never
    shuffled for either direction (a derived-hits anti-join on id would
    plan a full-corpus shuffle AND a second scan — r5 review).

    With ``block_bits`` the join carries an LSH-bucket EQUI key, so
    Catalyst plans a broadcast HASH join (bucket lookup) instead of a
    nested loop, with the cosine predicate evaluated only on same-bucket
    pairs. The benchmark side (small, already broadcast) expands to its
    own bucket plus ``n_probes - 1`` hamming-adjacent buckets — the
    recall knob, same convention as :func:`lsh_topk`; semi/anti
    semantics dedup the expansion for free."""
    c = corpus.withColumn("__cn", norm(vec_col))
    b = benchmark.select(F.col(vec_col).alias("__bv")).withColumn(
        "__bn", norm("__bv")
    )
    cond = (
        sim_from_norms(vec_col, "__bv", "__cn", "__bn")
        >= F.lit(float(threshold))
    )
    if block_bits is None:
        return c.join(F.broadcast(b), cond, how).drop("__cn")
    if dim is None:
        raise ValueError(
            "block_bits requires dim (the embedding width) — the LSH "
            "hyperplanes are materialized per dimension"
        )
    if n_probes > block_bits + 1:
        raise ValueError(
            f"n_probes={n_probes} exceeds the {block_bits + 1} "
            f"single-bit-flip buckets available at block_bits={block_bits}"
        )
    c = c.withColumn("__cb", lsh_bucket(vec_col, dim, block_bits))
    b = b.withColumn("__bb", lsh_bucket("__bv", dim, block_bits))
    if n_probes > 1:
        # explode_cheaply, not F.explode (CLAUDE.md rule — the alias
        # substitution would re-evaluate lsh_bucket per generated row)
        from pydala_spark.operators.dedup import explode_cheaply

        flips = F.array(
            F.col("__bb"),
            *[
                F.col("__bb").bitwiseXOR(F.lit(2**p))
                for p in range(block_bits)
            ],
        )
        b = explode_cheaply(
            b.withColumn("__flips", flips).drop("__bb"),
            F.slice(F.col("__flips"), 1, n_probes), "__bb",
        ).drop("__flips")
    return c.join(
        F.broadcast(b), (F.col("__cb") == F.col("__bb")) & cond, how
    ).drop("__cn", "__cb")


def semantic_decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    block_bits: int | None = None,
    dim: int | None = None,
    n_probes: int = 1,
) -> DataFrame:
    """Corpus minus semantically contaminated rows — the LEFT ANTI twin
    of :func:`semantic_contamination` (same single broadcast join on
    the cosine predicate; original corpus columns preserved; same
    ``block_bits``/``n_probes`` LSH-blocking knobs — note that in the
    anti direction a blocking MISS keeps a contaminated doc, so size
    ``n_probes`` for the recall the cleaning contract requires)."""
    return _semantic_bench_join(
        corpus, benchmark, vec_col, threshold, "left_anti",
        block_bits=block_bits, dim=dim, n_probes=n_probes,
    )


def topk_recall(approx: DataFrame, exact: DataFrame) -> DataFrame:
    """Recall@k evaluation for ANN tuning: per-probe fraction of the
    EXACT top-k neighbors the approximate result retrieved. Both inputs
    use the (probe_id, neighbor_id, ...) shape every top-k operator in
    this package emits. One equi-join on (probe_id, neighbor_id) + one
    per-probe aggregate — evaluation is itself distributed, so recall
    can be measured on a full production probe set, not a toy sample.
    Both sides deduplicate on (probe_id, neighbor_id) first, so a
    multi-strategy union (e.g. q_ann_topk's family-tagged output) or
    concatenated runs can't fan the join out and inflate the counts.
    Returns (probe_id, n_exact, n_hit, recall)."""
    e = exact.select("probe_id", "neighbor_id").distinct()
    a = (
        approx.select("probe_id", "neighbor_id")
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    return (
        e.join(a, ["probe_id", "neighbor_id"], "left")
        .groupBy("probe_id")
        .agg(
            F.count("*").alias("n_exact"),
            F.count("__hit").alias("n_hit"),
        )
        .withColumn(
            "recall", F.col("n_hit").cast("double") / F.col("n_exact")
        )
    )
