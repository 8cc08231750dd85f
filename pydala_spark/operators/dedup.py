"""Deduplication operators: exact, subset-keyed, MinHash+LSH, SimHash,
n-gram Jaccard (north-star extension, BASELINE.json).

Scale design:

- exact dedup is a hash groupBy on a fingerprint — one shuffle keyed by
  a 128-bit hash, perfectly balanced;
- MinHash signatures are computed with ``n_hashes`` MIN aggregates over
  exploded shingles (map-side partial aggregation collapses the explosion
  before the shuffle);
- LSH candidate generation is a self-equi-join on (band_id, band_hash) —
  the classic band trick turns O(n²) near-dup search into a bucket join;
- n-gram Jaccard avoids any cross join: intersections are found by
  joining exploded distinct shingles with themselves, so only pairs that
  actually share a shingle materialize;
- everything is md5-based so oracles (and reruns on other engines)
  reproduce bit-identical results; no RNG, no Python UDFs.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from pydala_spark.dataset.reader import apply_distinct
from pydala_spark.operators.textstats import (
    _sql_ident,
    fingerprint,
    word_regex_tokens,
)


def explode_cheaply(df: DataFrame, arr: Column, alias: str) -> DataFrame:
    """Explode without the optimizer's inferred ``size(arr) > 0`` filter.

    Plain ``explode`` makes InferFiltersFromGenerate add that filter, and
    predicate pushdown then re-evaluates the ENTIRE array expression a
    second time below any repartition — for expensive arrays (regex
    tokenization, shingling) that doubles the work and pins it to the
    unsplit scan task (measured 2-3x on minhash). ``explode_outer`` infers
    nothing; the null rows it adds for empty/null arrays are dropped
    after, which is cheap.
    """
    other = [c for c in df.columns]
    return (
        df.select(*other, F.explode_outer(arr).alias(alias))
        .where(F.col(alias).isNotNull())
    )


def dedup_exact(
    df: DataFrame, id_col: str, text_col: str = "text"
) -> DataFrame:
    """One row per distinct normalized text: keeps the minimum id
    (deterministic), adds the group size as ``n_dups``.

    A NULL fingerprint (empty normalized text — punctuation-only doc,
    see :func:`~pydala_spark.operators.textstats.fingerprint`) never
    joins a dedup group: the groupBy key falls back to a per-row
    surrogate (``\\x00`` prefix — outside md5's hex alphabet, so it can
    never collide with a real fingerprint), keeping every contentless
    doc as its own singleton instead of collapsing them all into one
    NULL group.

    Round 16: ``fp`` is recovered FROM the group key after the agg
    (every member of a group shares it by construction) instead of a
    ``min(fp)`` aggregate — a string-buffered min forced the whole
    per-doc aggregation onto SortAggregate (rows sorted by key on both
    sides of the exchange); with only long buffers it is a codegen
    HashAggregate. Output bit-identical (surrogate groups map back to
    the NULL fp they came from)."""
    surrogate = F.concat(F.lit("\x00id:"), F.col(id_col).cast("string"))
    return (
        df.withColumn("fp", fingerprint(text_col))
        .groupBy(F.coalesce(F.col("fp"), surrogate).alias("__gk"))
        .agg(
            F.min(id_col).alias(id_col),
            F.count("*").alias("n_dups"),
        )
        .select(
            F.when(
                F.col("__gk").startswith("\x00"), F.lit(None).cast("string")
            )
            .otherwise(F.col("__gk"))
            .alias("fp"),
            id_col,
            "n_dups",
        )
    )


def dedup_subset(
    df: DataFrame,
    subset: Sequence[str],
    keep: str = "first",
    presort: Sequence[tuple[str, bool]] | None = None,
) -> DataFrame:
    """Subset-keyed dedup (reference utils/table.py:230-288) — see
    :func:`pydala_spark.dataset.reader.apply_distinct`."""
    return apply_distinct(df, subset=subset, keep=keep, presort=presort)


# ---------------------------------------------------------------------------
# MinHash + LSH


def shingles_of_tokens(tok_col: Column, k: int = 3) -> Column:
    """Word k-shingles over an already-materialized token array column.

    Take the tokens as a *column reference*, not the tokenization
    expression: Catalyst substitutes expressions into lambda bodies
    verbatim, so passing ``word_regex_tokens(...)`` here would re-run the
    regex split once per shingle index (measured 3x slowdown).

    The common path builds each shingle from ``k`` direct ``element_at``
    lookups (measured −13% vs slicing a sub-array per shingle); docs
    with fewer than ``k`` tokens keep the historical concat_ws behavior
    — their tokens join into ONE partial shingle.
    """
    idx = F.sequence(F.lit(0), F.size(tok_col) - k)

    def _shingle(i: Column) -> Column:
        parts: list[Column] = []
        for j in range(k):
            if j:
                parts.append(F.lit(" "))
            parts.append(F.element_at(tok_col, i + (j + 1)))
        return F.concat(*parts)

    shingled = F.when(
        F.size(tok_col) >= k,
        F.array_distinct(F.transform(idx, _shingle)),
    ).otherwise(F.array(F.concat_ws(" ", tok_col)))
    # empty/null text would otherwise yield a '' shingle, making every
    # contentless doc an LSH near-dup of every other
    return F.filter(shingled, lambda s: s != F.lit(""))


def char_shingles(text_col: str | Column, k: int = 5) -> Column:
    """Distinct character k-shingles over the NORMALIZED text — the
    near-dup unit for unsegmented scripts (round 5): word shingles
    degenerate on CJK (no spaces → a whole clause is one "token", so a
    one-character edit changes every word-shingle), while character
    n-grams stay fine-grained in any script. Normalization is the same
    Unicode :func:`~pydala_spark.operators.textstats.normalize_text`
    the fingerprint path uses. Built-ins only: one substring per index
    over the MATERIALIZED normalized string (callers must pass a
    materialized column — Catalyst substitutes expressions into lambda
    bodies, re-normalizing once per shingle otherwise). Texts shorter
    than ``k`` yield their whole normalized text as one shingle; empty
    text yields none."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    n = F.greatest(F.length(c) - (k - 1), F.lit(1))
    shingled = F.array_distinct(
        F.transform(F.sequence(F.lit(1), n), lambda i: F.substr(c, i, F.lit(k)))
    )
    return F.filter(shingled, lambda s: s != F.lit(""))


def doc_shingles(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    k: int = 3,
    mode: str = "word",
) -> DataFrame:
    """(id, shs) frame of distinct k-shingles per document.

    ``mode="word"`` (default): word k-shingles over regex tokens.
    ``mode="char"`` (round 5): character k-shingles over the normalized
    text — use for CJK/unsegmented corpora, where word shingling
    collapses to one shingle per punctuation-separated run (k should be
    larger, e.g. 5-9 chars ≈ 2-3 words of signal)."""
    if mode == "char":
        from pydala_spark.operators.textstats import normalize_text

        return df.select(
            F.col(id_col).alias("id"), normalize_text(text_col).alias("__n")
        ).select("id", char_shingles(F.col("__n"), k).alias("shs"))
    if mode != "word":
        raise ValueError("mode must be 'word' or 'char'")
    return df.select(
        F.col(id_col).alias("id"), word_regex_tokens(text_col).alias("__t")
    ).select("id", shingles_of_tokens(F.col("__t"), k).alias("shs"))


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    n_hashes: int = 8,
    shingle_size: int = 3,
    seed: int = 0,
    shingle_mode: str = "word",
) -> DataFrame:
    """MinHash signature per document: hash_i(doc) = lexicographic MIN
    over the doc's shingles of an 8-hex-digit (32-bit) slice of
    ``md5(j || '|' || shingle)``, where md5 number ``j = i // 4``
    contributes four non-overlapping slices.

    Output: one row per id with columns ``mh_0 .. mh_{n-1}``. Slicing
    one strong hash into several independent 32-bit min-hashes is the
    standard trick for cutting hash cost: ``ceil(n/4)`` md5 evaluations
    per shingle instead of ``n`` (measured −25% on the LSH pipeline at
    sf0.1). 32 bits per hash keeps the in-doc collision probability
    negligible (a 10k-shingle doc collides within one slice with
    p ≈ 1e-2... per *pair* 2^-32; fixed-width hex compares
    lexicographically == numerically). md5-hex keeps it engine-portable
    (DuckDB: same md5/substring). Executes as explode + one groupBy with
    n MIN aggregates (partial-agg friendly); the md5s are MATERIALIZED
    once per shingle row so the n agg expressions only slice.

    ``seed`` (round 5) salts the hash family: a nonzero seed draws a
    fresh, independent set of min-hash functions, so a SECOND near-dup
    pass (the documented chain-iteration strategy, pipeline.py) can
    recover pairs the first pass's banding happened to miss. ``seed=0``
    is bit-identical to the historical unseeded hashes, which the
    ``q_minhash_lsh`` oracle pins.

    Round 16: the MIN itself runs in the LONG domain — each hex lane is
    ``conv``-ed to a 64-bit int per shingle row and converted back to
    the identical lowercase zero-padded hex AFTER the per-doc aggregate.
    ``min(string)`` has an immutable agg buffer, so Spark planned the
    whole aggregation as SortAggregate: every exploded shingle row was
    SORTED by doc id on both sides of the exchange. Longs make it a
    codegen HashAggregate (no sorts) and the partial rows crossing the
    exchange carry 8 longs instead of 8 strings (guide §2.3). On fixed
    width lowercase hex, lexicographic order == numeric order, so the
    min — and the signatures — are bit-identical (equivalence-checked
    across SFs, seeds, modes and widths; the oracle pins it too).
    """
    n_md5 = (n_hashes + 3) // 4
    salt = f"{seed}:" if seed else ""
    # round 16 (guide §7.3): the per-lane loops are GENERATED SQL — the
    # Column spelling paid ~150 py4j round trips per build for the
    # identical tree; the q_minhash_lsh oracle pins the values
    exploded = explode_cheaply(
        doc_shingles(df, id_col, text_col, shingle_size, mode=shingle_mode),
        F.col("shs"),
        "sh",
    ).selectExpr(
        f"id AS {_sql_ident(id_col)}",
        *[
            f"md5(concat('{salt}{j}|', sh)) AS __h{j}"
            for j in range(n_md5)
        ],
    )
    aggs = [
        F.expr(
            f"min(CAST(conv(substring(__h{i // 4}, {(i % 4) * 8 + 1}, 8),"
            " 16, 10) AS BIGINT))"
        ).alias(f"__m{i}")
        for i in range(n_hashes)
    ]
    return exploded.groupBy(id_col).agg(*aggs).selectExpr(
        f"{_sql_ident(id_col)}",
        *[
            f"lower(lpad(hex(__m{i}), 8, '0')) AS mh_{i}"
            for i in range(n_hashes)
        ],
    )


def lsh_tuning(
    target_jaccard: float,
    n_hashes: int = 8,
) -> list[dict]:
    """Banding-parameter decision table (round 6): for every banding of
    ``n_hashes`` MinHash rows, the standard S-curve numbers — collision
    probability ``1 - (1 - j^r)^b`` at the target Jaccard, at a clear
    non-dup (j/2) and at a clear dup ((1+j)/2), plus the curve's
    threshold ``(1/b)^(1/r)`` (where collision probability crosses
    ~0.5). Driver-side math, no Spark — run it BEFORE a corpus-sized
    LSH sweep instead of guessing ``n_bands``: pick the row whose
    threshold brackets your target with acceptable miss/noise rates,
    then pass its ``n_bands`` to :func:`minhash_signatures` +
    :func:`lsh_candidate_pairs` (chained seeded passes halve the miss
    rate again — see their ``seed`` docs). Sorted by bands ascending;
    rows where ``n_bands`` doesn't divide ``n_hashes`` are omitted, the
    same divisibility contract lsh_candidate_pairs enforces."""
    if not 0.0 < target_jaccard < 1.0:
        raise ValueError(
            f"target_jaccard must be in (0, 1), got {target_jaccard}"
        )

    def p_collide(j: float, r: int, b: int) -> float:
        return 1.0 - (1.0 - j**r) ** b

    out = []
    for b in range(1, n_hashes + 1):
        if n_hashes % b:
            continue
        r = n_hashes // b
        out.append({
            "n_bands": b,
            "rows_per_band": r,
            "threshold": (1.0 / b) ** (1.0 / r),
            "p_at_target": p_collide(target_jaccard, r, b),
            "p_at_nondup": p_collide(target_jaccard / 2.0, r, b),
            "p_at_cleardup": p_collide((1.0 + target_jaccard) / 2.0, r, b),
        })
    return out


def band_frame(
    signatures: DataFrame,
    id_col: str,
    n_bands: int,
    seed: int = 0,
) -> DataFrame:
    """The banding step of LSH as a standalone frame: one ``(id,
    band_id, band_hash)`` row per document per band, with the SAME
    column ordering, seed rotation and md5 band hash as
    :func:`lsh_candidate_pairs` uses internally — factored out (round-6
    review) so streaming's persisted bucket store and the batch pair
    stage can never silently diverge on what a band hash is. Guards:
    missing ``mh_*`` columns and non-dividing ``n_bands`` raise instead
    of silently truncating signature rows."""
    sig_cols = sorted(
        (c for c in signatures.columns if c.startswith("mh_")),
        key=lambda c: int(c.split("_")[1]),
    )
    if not sig_cols:
        # 0 % n_bands == 0 would sail past the divisibility guard and
        # return ZERO candidate pairs — a silently no-op near-dup stage
        raise ValueError(
            "band_frame: no mh_* signature columns in the input "
            "(pass minhash_signatures output)"
        )
    if len(sig_cols) % n_bands != 0:
        # silently dropping the trailing columns would lower recall with
        # no signal that paid-for signature rows went unused
        raise ValueError(
            f"n_bands={n_bands} must divide the signature width "
            f"({len(sig_cols)} mh_ columns)"
        )
    rows_per_band = len(sig_cols) // n_bands
    if seed:
        shift = seed % len(sig_cols)
        sig_cols = sig_cols[shift:] + sig_cols[:shift]
    # round 16 (guide §7.3): the band array is GENERATED SQL (one parse
    # instead of ~8 py4j calls per band); identical tree, oracle-pinned
    bands = []
    for b in range(n_bands):
        cols = sig_cols[b * rows_per_band : (b + 1) * rows_per_band]
        bands.append(
            f"struct({b} AS band_id, md5(concat_ws('|',"
            f" {', '.join(cols)})) AS band_hash)"
        )
    # explode_cheaply, not F.explode: the band array carries one md5 per
    # band and the inferred size(...)>0 filter would re-hash every row
    # (CLAUDE.md rule)
    return explode_cheaply(
        signatures, F.expr("array(%s)" % ", ".join(bands)), "band"
    ).select(id_col, "band.band_id", "band.band_hash")


def lsh_candidate_pairs(
    signatures: DataFrame,
    id_col: str,
    n_bands: int = 4,
    max_bucket_size: int | None = None,
    log_dropped: bool = True,
    seed: int = 0,
) -> DataFrame:
    """Banded LSH over a MinHash signature frame: docs agreeing on all
    rows of any band become a candidate pair (id_a < id_b, distinct).

    Implemented as ONE shuffle: group by (band_id, band_hash), collect
    the bucket's ids, and explode in-bucket pairs — a self-join would
    recompute the entire signature pipeline for each join side (measured
    2-3x). In-bucket pair explosion is quadratic per bucket, which is the
    point of LSH (buckets are tiny).

    ``max_bucket_size`` guards the degenerate corpus (one viral duplicate
    -> a giant bucket whose pair explosion is quadratic in corpus size):
    oversized buckets are dropped, because at that size the bucket's
    members are already known-near-identical — route them through exact
    dedup instead of pairwise scoring. When ``log_dropped`` the dropped
    bucket count/sizes are logged (costs one extra aggregation job; set
    False on hot paths).

    ``seed`` (round 5) rotates which signature rows group into which
    band (band b of a seeded pass covers ``mh_{(b*r+seed) % n} ...``):
    two passes with different seeds slice the SAME signatures along
    different band boundaries, so a pair whose agreeing hashes straddle
    every seed-0 band can still collide in a seed-1 band — the cheap
    half of the chain-iteration recall strategy (pair it with a
    ``minhash_signatures(seed=...)`` resalt for fully independent
    passes). ``seed=0`` preserves the historical banding, which the
    ``q_minhash_lsh`` oracle pins.
    """
    buckets = lsh_buckets(signatures, id_col, n_bands, seed=seed)
    if max_bucket_size is not None:
        if log_dropped:
            import logging

            dropped = (
                buckets.where(F.size("ids") > max_bucket_size)
                .agg(
                    F.count("*").alias("n_buckets"),
                    F.sum(F.size("ids")).alias("n_members"),
                )
                .first()
            )
            if dropped["n_buckets"]:
                logging.getLogger("pydala_spark").warning(
                    "lsh_candidate_pairs: dropping %d oversized bucket(s) "
                    "(> %d members, %d total members) — run exact dedup on "
                    "these first",
                    dropped["n_buckets"], max_bucket_size, dropped["n_members"],
                )
        buckets = buckets.where(F.size("ids") <= max_bucket_size)
    return bucket_pairs(buckets)


def lsh_buckets(
    signatures: DataFrame,
    id_col: str,
    n_bands: int,
    seed: int = 0,
) -> DataFrame:
    """The grouped middle of :func:`lsh_candidate_pairs` — one
    ``(band_id, band_hash, ids)`` row per non-singleton bucket, sorted
    member array — exposed (round 10) so a caller needing BOTH the
    pairs and bucket-level facts (the partial-incremental sweep records
    over-cap bucket keys beside its edge set) can pay the banding
    shuffle ONCE: checkpoint this frame, derive over-cap keys and
    :func:`bucket_pairs` from it, instead of re-running band+shuffle
    per consumer."""
    banded = band_frame(signatures, id_col, n_bands, seed=seed)
    return (
        banded.groupBy("band_id", "band_hash")
        .agg(F.array_sort(F.collect_set(F.col(id_col))).alias("ids"))
        .where(F.size("ids") > 1)
    )


def bucket_pairs(buckets: DataFrame) -> DataFrame:
    """In-bucket pair explosion over an :func:`lsh_buckets` frame:
    all (id_a < id_b) member pairs, distinct across bands — the back
    half of :func:`lsh_candidate_pairs`, factored (round 10) for the
    same never-diverge reason as :func:`band_frame`."""
    # GENERATED SQL (round 16, guide §7.3): same nested-transform tree
    # as the Column spelling, one parse instead of the two-level lambda
    # conversion; q_minhash_lsh oracle + the incremental-LSH deep drive
    # pin the values
    pairs = F.expr(
        "flatten(transform(ids, (x, i) -> transform("
        "slice(ids, i + 2, size(ids)),"
        " y -> struct(x AS id_a, y AS id_b))))"
    )
    # explode_cheaply: ``pairs`` is the QUADRATIC in-bucket pair builder —
    # plain explode's inferred size(...)>0 filter would evaluate it twice
    # per bucket (CLAUDE.md rule)
    return (
        explode_cheaply(buckets, pairs, "p")
        .select("p.id_a", "p.id_b")
        .distinct()
    )


def lsh_candidate_pairs_delta(
    signatures: DataFrame,
    id_col: str,
    is_changed: Column,
    prior_pairs_unchanged: DataFrame,
    prior_overcap: list | None,
    n_bands: int = 4,
    max_bucket_size: int | None = None,
    seed: int = 0,
) -> DataFrame | None:
    """Partial-incremental banded LSH (round 10, VERDICT r9 #5): the
    candidate-pair set of the FULL current corpus, computed WITHOUT
    re-shuffling the full signature union, when only some documents
    changed since a prior :func:`lsh_candidate_pairs` run whose edges
    were persisted.

    ``signatures`` is the full CURRENT signature frame; ``is_changed``
    is a Column (evaluated against the banded frame, so it may only
    reference ``id_col``) marking rows whose source dataset changed
    since the prior run. ``prior_pairs_unchanged`` is the prior edge
    set ALREADY FILTERED by the caller to pairs whose BOTH endpoints
    are unchanged (those are exactly the prior pairs still valid — an
    unchanged doc's band hashes cannot move, so two unchanged docs
    share a bucket tonight iff they shared it last night).
    ``prior_overcap`` lists the prior run's over-cap bucket keys as
    ``(band_id, band_hash)`` (empty/None when ``max_bucket_size`` is
    None or nothing was viral).

    Shape (the economy): banding is a map-side projection over the
    signature scan — the expensive part of the full sweep is the
    (band, band_hash) shuffle of EVERY row plus the in-bucket pair
    explosion. Here only buckets TOUCHED by a changed row group: the
    touched-key set (changed_docs × n_bands, small on a 1%-changed
    night) broadcasts against the full banded scan, so the unchanged
    99% streams through one broadcast hash join with no exchange, and
    the bucket aggregation that follows shuffles only the touched
    buckets' membership. New pairs = in-bucket pairs with at least one
    changed endpoint; the result is ``prior_pairs_unchanged ∪ new``.

    **Cap-transition fallback** — returns ``None`` (caller must run
    the full :func:`lsh_candidate_pairs`) when the viral-bucket cap's
    verdict changed for any bucket, because then the prior edge set is
    not reusable:

    - a prior over-cap bucket whose CURRENT distinct-member count
      dropped to ``<= max_bucket_size`` (the full sweep would now emit
      its pairs, which the prior run suppressed), or
    - a touched bucket NOT previously over cap whose current count
      exceeds it (the full sweep would now suppress pairs the prior
      run emitted).

    Both checks are bounded: the prior over-cap set is tiny by
    construction (``<= n_docs / cap`` buckets) and the touched set is
    delta-sized. Equivalence to the full sweep under these rules is
    pinned by the lake-level property test
    (``tests/test_lake_sweeps.py``, split out of test_timefly_catalog
    in round 13).
    """
    spark = signatures.sparkSession
    bands = band_frame(signatures, id_col, n_bands, seed=seed)
    bands = bands.withColumn("__chg", is_changed)
    touched = (
        bands.where(F.col("__chg"))
        .select("band_id", "band_hash").distinct()
    )
    oc = spark.createDataFrame(
        [(int(b), str(h)) for b, h in (prior_overcap or [])],
        "band_id int, band_hash string",
    )
    if max_bucket_size is not None and prior_overcap:
        # over -> under transition: every prior over-cap bucket must
        # still be over cap with its CURRENT membership
        still_over = (
            bands.join(F.broadcast(oc), ["band_id", "band_hash"])
            .groupBy("band_id", "band_hash")
            .agg(F.count_distinct(id_col).alias("n"))
            .where(F.col("n") > max_bucket_size)
            .count()
        )
        if still_over != len(prior_overcap):
            return None
    rows = bands.join(F.broadcast(touched), ["band_id", "band_hash"])
    buckets = (
        rows.groupBy("band_id", "band_hash")
        .agg(F.array_sort(F.collect_set(F.struct(
            F.col(id_col).alias("i"), F.col("__chg").alias("c"),
        ))).alias("ms"))
        .where(F.size("ms") > 1)
    )
    if max_bucket_size is not None:
        # under -> over transition: a touched bucket newly past the cap
        # means the prior run emitted pairs the full sweep would now
        # suppress. Membership here IS the bucket's full current
        # membership (unchanged docs' hashes cannot move), so the size
        # test is exact. Cut the lineage first — the transition probe
        # and the pair build below both consume `buckets`, and the
        # touched-bucket set is delta-sized by construction.
        buckets = buckets.localCheckpoint(eager=True)
        newly_over = (
            buckets.where(F.size("ms") > max_bucket_size)
            .join(F.broadcast(oc), ["band_id", "band_hash"], "left_anti")
            .limit(1).count()
        )
        if newly_over:
            return None
        buckets = buckets.where(F.size("ms") <= max_bucket_size)
    pairs = F.flatten(
        F.transform(
            F.col("ms"),
            lambda x, i: F.filter(
                F.transform(
                    F.slice(F.col("ms"), i + 2, F.size(F.col("ms"))),
                    lambda y: F.struct(
                        x["i"].alias("id_a"), y["i"].alias("id_b"),
                        (x["c"] | y["c"]).alias("keep"),
                    ),
                ),
                lambda s: s["keep"],
            ),
        )
    )
    new_pairs = (
        explode_cheaply(buckets, pairs, "p")
        .select("p.id_a", "p.id_b")
    )
    return (
        prior_pairs_unchanged.select("id_a", "id_b")
        .unionByName(new_pairs)
        .distinct()
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    shingle_size: int = 3,
    threshold: float = 0.1,
    max_shingle_df: int | None = None,
    shingle_mode: str = "word",
) -> DataFrame:
    """Pairwise Jaccard similarity over word-shingle sets, computed by
    self-joining exploded shingles (pairs materialize only where they
    share at least one shingle — no cross join). Jaccard is an exact
    integer ratio. Returns (id_a, id_b, inter, size_a, size_b, jaccard).

    ``max_shingle_df`` is the stop-shingle skew guard (SCALE.md): a
    shingle present in nearly every document (a boilerplate header, a
    license block) makes the self-join quadratic in corpus size through
    that one join key. With the cap set, one cheap pre-aggregate counts
    each shingle's document frequency, the over-cap shingles (at most
    total-occurrences/cap of them — usually tiny, but NOT provably under
    the broadcast limit at web scale, so the anti-join carries no forced
    broadcast hint; AQE broadcasts it when the stop set is actually
    small and falls back to a shuffle join when it is not) are
    anti-joined away, and per-doc set sizes are recomputed
    over the retained shingles, so ``jaccard`` stays an exact ratio —
    over the reduced, informative-shingle universe. Ubiquitous shingles
    carry no near-dup signal, which is why dropping them is the standard
    mitigation rather than an accuracy loss in practice. Documents whose
    every shingle is dropped can no longer pair (they only ever shared
    boilerplate). Cost: one extra aggregation plus one exchange keyed by
    id; the join stays an equi-join on ``sh``.
    """
    sh = doc_shingles(
        df, id_col, text_col, shingle_size, mode=shingle_mode
    ).withColumn("sh_size", F.size("shs").cast("long"))
    exploded = explode_cheaply(sh, F.col("shs"), "sh").select(
        "id", "sh_size", "sh"
    )
    if max_shingle_df is not None:
        from pyspark.sql import Window

        stop = (
            exploded.groupBy("sh")
            .agg(F.count("*").alias("__df"))
            .where(F.col("__df") > max_shingle_df)
            .select("sh")
        )
        exploded = (
            exploded.join(stop, "sh", "left_anti")
            .withColumn(
                "sh_size",
                F.count("*").over(Window.partitionBy("id")).cast("long"),
            )
            .select("id", "sh_size", "sh")
        )
    a, b = exploded.alias("a"), exploded.alias("b")
    inter = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.sh_size").alias("size_a"),
            F.col("b.sh_size").alias("size_b"),
        )
        .agg(F.count("*").alias("inter"))
    )
    jac = F.col("inter").cast("double") / (
        F.col("size_a") + F.col("size_b") - F.col("inter")
    ).cast("double")
    return (
        inter.withColumn("jaccard", jac)
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "inter", "size_a", "size_b", "jaccard")
    )


def shingle_keys(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    shingle_size: int = 3,
    shingle_mode: str = "word",
) -> DataFrame:
    """Exploded per-doc-DISTINCT ``(id, key)`` shingle pairs — the
    shared front half of :func:`contamination_hits` /
    :func:`contamination_report`, factored out (round 16) so a caller
    running BOTH (the hits view and the per-benchmark audit share one
    corpus) can compute the shingle explosion once, checkpoint it, and
    feed the two aggregations from the materialized pairs instead of
    re-tokenizing the corpus per consumer."""
    return explode_cheaply(
        doc_shingles(df, id_col, text_col, shingle_size, mode=shingle_mode),
        F.col("shs"),
        "key",
    ).select("id", "key")


def contamination_hits(
    corpus: DataFrame | None,
    benchmark: DataFrame | None,
    id_col: str = "id",
    text_col: str = "text",
    shingle_size: int = 3,
    min_hits: int = 1,
    shingle_mode: str = "word",
    corpus_keys: DataFrame | None = None,
    bench_keys: DataFrame | None = None,
) -> DataFrame:
    """Corpus documents sharing at least ``min_hits`` distinct word
    ``shingle_size``-grams with ANY benchmark document — the standard
    n-gram-overlap benchmark-decontamination test for training corpora.

    Shape at 100 TB: the benchmark (an eval set — thousands of docs, not
    billions) collapses to a distinct-shingle set and is broadcast, so
    the corpus is never shuffled raw; the only exchange is the per-doc
    distinct-hit count. Returns ``(id, n_hits)``.

    ``corpus_keys``/``bench_keys`` (round 16) take precomputed
    :func:`shingle_keys` frames — ``corpus``/``benchmark`` are then
    ignored for that side — so a caller that also runs
    :func:`contamination_report` pays the shingle explosion once
    (the ``precomputed_fps`` pattern from winnowing_contamination).
    """
    if corpus_keys is None:
        corpus_keys = shingle_keys(
            corpus, id_col, text_col, shingle_size, shingle_mode
        )
    if bench_keys is None:
        bench_keys = shingle_keys(
            benchmark, id_col, text_col, shingle_size, shingle_mode
        )
    return _overlap_hits(
        corpus_keys.select("id", "key"), bench_keys.select("key"), min_hits
    )


def _overlap_hits(
    corpus_keys: DataFrame, bench_keys: DataFrame, min_hits: int
) -> DataFrame:
    """Shared broadcast-overlap counter behind BOTH decontamination
    modalities: ``corpus_keys`` is an exploded ``(id, key)`` frame whose
    pairs are PER-DOC DISTINCT (every caller explodes an
    ``array_distinct``-built array — shingles_of_tokens, char_shingles,
    winnowing_fingerprints all dedup per doc), ``bench_keys`` a
    ``(key,)`` frame (made distinct and broadcast here). One exchange —
    the per-doc hit count. Round 16 (guide §2.4): ``count(*)`` instead
    of ``count_distinct(key)`` — the pairs are already unique, and the
    distinct-count's two-phase (id, key) aggregation added a full extra
    exchange of every surviving pair for nothing."""
    b = bench_keys.distinct()
    return (
        corpus_keys.join(F.broadcast(b), "key")
        .groupBy("id")
        .agg(F.count("*").alias("n_hits"))
        .where(F.col("n_hits") >= min_hits)
    )


def contamination_report(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str = "text",
    shingle_size: int = 3,
    min_hits: int = 1,
    shingle_mode: str = "word",
    mode: str = "ngram",
    winnowing_k: int = 8,
    winnowing_window: int = 4,
    corpus_keys: DataFrame | None = None,
    bench_keys: DataFrame | None = None,
) -> DataFrame:
    """Per-BENCHMARK-document leak audit (round 6) — the drop operators
    (:func:`decontaminate` et al.) answer "which corpus docs are dirty";
    a cleaning team ALSO needs "which eval items leaked, and how
    widely": a benchmark question that appears verbatim in thousands of
    scraped pages is a different problem (and a different eval-set
    decision) than one matching a single mirror. Returns one row per
    leaked benchmark doc: ``(bench_id, n_docs, total_hits)`` — the
    number of corpus documents sharing at least ``min_hits`` distinct
    shingles with it, and the summed distinct-shingle overlap.

    Shape at 100 TB: both sides reduce to DISTINCT (id, shingle) pairs;
    the benchmark side (eval-set sized) broadcasts, the corpus side is
    scanned once — the equi-join on shingle emits only ACTUAL overlaps,
    so the pair aggregation shuffles rows bounded by the leak volume,
    not the corpus. Two exchanges (per-pair count, per-bench rollup).

    ``mode="winnowing"`` audits with the MOSS robust fingerprints
    instead of exact shingles (``winnowing_k``/``winnowing_window``) —
    the edit-tolerant modality: a benchmark item copied with churned
    punctuation/casing still counts toward its leak spread.

    ``corpus_keys``/``bench_keys`` (round 16) take precomputed
    :func:`shingle_keys` frames (ngram mode only; the corresponding
    doc frame is then ignored) so the explosion is paid once when the
    hits view runs beside this audit. Round 16 also removed the
    explicit ``.distinct()`` on the exploded sides: every key builder
    (shingles_of_tokens, char_shingles, winnowing_fingerprints) emits
    ``array_distinct`` arrays, so the pairs were already unique and the
    distinct was a full extra exchange of the exploded corpus —
    guide §2.4's "a distinct on data that is already unique".
    """
    if mode not in ("ngram", "winnowing"):
        raise ValueError(
            f"mode={mode!r} (expected 'ngram' or 'winnowing')"
        )
    if mode == "winnowing":
        from pydala_spark.operators.textstats import winnowing_fingerprints

        def keys(frame, alias):
            fps = winnowing_fingerprints(
                frame, id_col, text_col,
                k=winnowing_k, window=winnowing_window,
            )
            return explode_cheaply(fps, F.col("fps"), "key").select(
                F.col("id").alias(alias), "key"
            )

        c = keys(corpus, "corpus_id")
        b = keys(benchmark, "bench_id")
    else:
        if corpus_keys is None:
            corpus_keys = shingle_keys(
                corpus, id_col, text_col, shingle_size, shingle_mode
            )
        if bench_keys is None:
            bench_keys = shingle_keys(
                benchmark, id_col, text_col, shingle_size, shingle_mode
            )
        c = corpus_keys.select(F.col("id").alias("corpus_id"), "key")
        b = bench_keys.select(F.col("id").alias("bench_id"), "key")
    pair = (
        c.join(F.broadcast(b), "key")
        .groupBy("bench_id", "corpus_id")
        .agg(F.count("*").alias("pair_hits"))
        .where(F.col("pair_hits") >= min_hits)
    )
    return pair.groupBy("bench_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("pair_hits").alias("total_hits"),
    )


def winnowing_contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str = "text",
    k: int = 8,
    window: int = 4,
    min_hits: int = 1,
    precomputed_fps: bool = False,
) -> DataFrame:
    """Corpus documents sharing at least ``min_hits`` WINNOWING
    fingerprints with any benchmark document — the robust-hash third
    decontamination modality (round 5), between exact n-gram overlap
    (:func:`contamination_hits` — word-order-exact) and embedding
    similarity (:func:`~pydala_spark.operators.similarity.
    semantic_contamination` — fully semantic): winnowing selects
    content-defined character k-gram hashes, so a benchmark passage
    survives tokenizer-hostile edits (inserted punctuation, spacing,
    casing) and is GUARANTEED to share a fingerprint with any document
    containing a run of ``k + window − 1`` normalized characters from
    it. Character-level, so it works on unsegmented scripts without a
    shingle-mode switch.

    Same 100 TB shape as the n-gram variant (shared
    :func:`_overlap_hits` skeleton): the benchmark's distinct
    fingerprint set broadcasts, the corpus is never shuffled raw; one
    exchange for the per-doc distinct-hit count. Returns ``(id,
    n_hits)``. With ``precomputed_fps`` the inputs are ``(id, fps)``
    frames from :func:`~pydala_spark.operators.textstats.
    winnowing_fingerprints` (skip the hashing when the fingerprints
    already exist — e.g. materialized at ingest).
    """
    from pydala_spark.operators.textstats import winnowing_fingerprints

    if precomputed_fps:
        cf, bf = corpus, benchmark
    else:
        cf = winnowing_fingerprints(corpus, id_col, text_col, k=k, window=window)
        bf = winnowing_fingerprints(
            benchmark, id_col, text_col, k=k, window=window
        )
    c = explode_cheaply(cf.select("id", "fps"), F.col("fps"), "key").select(
        "id", "key"
    )
    b = explode_cheaply(bf.select("fps"), F.col("fps"), "key").select("key")
    return _overlap_hits(c, b, min_hits)


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str = "text",
    shingle_size: int = 3,
    min_hits: int = 1,
    shingle_mode: str = "word",
) -> DataFrame:
    """Corpus minus contaminated documents (anti-join on
    :func:`contamination_hits`). ``shingle_mode="char"`` for
    CJK/unsegmented benchmarks (see :func:`doc_shingles`)."""
    hits = contamination_hits(
        corpus, benchmark, id_col, text_col, shingle_size, min_hits,
        shingle_mode=shingle_mode,
    ).select(F.col("id").alias(id_col))
    return corpus.join(hits, id_col, "left_anti")


# ---------------------------------------------------------------------------
# SimHash

def dedup_clusters(
    pairs: DataFrame,
    max_iterations: int = 10,
) -> DataFrame:
    """Connected components over candidate pairs -> (id, cluster_id).

    Greedy pair-drop (pipeline.py) under-merges duplicate CHAINS
    (a~b, b~c but a!~c); this resolves full clusters by iterative
    min-label propagation with POINTER JUMPING: each round every node
    adopts the smallest label reachable over an edge, then additionally
    adopts its label's label (label-of-label join — the shortcut step of
    pointer-jumping / hash-to-min CC). The jump halves the distance to
    the cluster minimum every round, so convergence is O(log diameter)
    instead of O(diameter): the default ``max_iterations=10`` covers
    chains ~2^10 deep, making the safety raise unreachable for any
    realistic duplicate topology. Each round is three shuffles over the
    EDGE set (candidate pairs — already LSH-reduced, orders of magnitude
    smaller than the corpus), so the loop is cheap. Returns one row per
    node appearing in ``pairs`` with its cluster's minimum id as
    ``cluster_id``.
    """
    edges = (
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .union(pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst")))
        .distinct()
        # cut the lineage ONCE before the loop: edges joins into every
        # round, and without this the whole upstream candidate-pair
        # pipeline (minhash + LSH in the prep_documents usage) would
        # re-execute per iteration
        .localCheckpoint(eager=True)
    )
    labels = edges.select(F.col("src").alias("id")).distinct().withColumn(
        "cluster_id", F.col("id")
    )
    for _ in range(max_iterations):
        neighbor_min = (
            edges.join(labels, edges.dst == labels.id)
            .groupBy("src")
            .agg(F.min("cluster_id").alias("nbr_min"))
        )
        updated = (
            labels.join(neighbor_min, labels.id == neighbor_min.src, "left")
            .select(
                "id",
                F.least(
                    F.col("cluster_id"), F.coalesce(F.col("nbr_min"), F.col("cluster_id"))
                ).alias("cluster_id"),
            )
        )
        # pointer jump: adopt my label's label. Every cluster_id is some
        # node's id (labels cover all nodes; mins propagate node ids), so
        # the mapping join always hits; coalesce guards the self-row case
        # only. This is what turns O(diameter) into O(log diameter).
        mapping = updated.select(
            F.col("id").alias("__mid"), F.col("cluster_id").alias("__mcl")
        )
        updated = (
            updated.join(mapping, updated.cluster_id == F.col("__mid"), "left")
            .select(
                "id",
                F.least(
                    F.col("cluster_id"),
                    F.coalesce(F.col("__mcl"), F.col("cluster_id")),
                ).alias("cluster_id"),
            )
        )
        updated = updated.localCheckpoint(eager=True)  # cut the lineage per round
        changed = (
            updated.alias("u")
            .join(labels.alias("l"), "id")
            .where(F.col("u.cluster_id") != F.col("l.cluster_id"))
            .limit(1)
            .count()
        )
        labels = updated
        if changed == 0:
            return labels
    raise RuntimeError(
        f"dedup_clusters did not converge in {max_iterations} iterations "
        "(duplicate chains deeper than expected — raise max_iterations)"
    )


#: hex-digit -> int via instr into this table: identical semantics in
#: Spark SQL and DuckDB (unlike conv/from_hex).
_HEX = "0123456789abcdef"


def simhash(
    df: DataFrame, id_col: str, text_col: str = "text", bits: int = 16
) -> DataFrame:
    """SimHash over regex tokens: bit j of a token's hash comes from the
    md5 hex digits; per-document bit j is 1 iff more tokens set it than
    clear it. ``bits`` must be <= 32 (8 hex digits).

    Fully built-in-function: explode tokens -> per-bit conditional sums
    -> reassemble the integer. Duplicated tokens weigh multiply (the
    classic frequency-weighted SimHash). The hex-digit values are
    MATERIALIZED once per token row before the aggregation — referencing
    the substring/instr expressions inside the ``bits`` agg expressions
    re-evaluates them per bit (measured −15% at sf0.1 from hoisting).
    """
    if bits > 32:
        raise ValueError("bits must be <= 32")
    n_digits = (bits + 3) // 4
    toks = explode_cheaply(
        df.select(F.col(id_col), word_regex_tokens(text_col).alias("__toks")),
        F.col("__toks"),
        "tok",
    ).select(id_col, F.md5("tok").alias("h"))
    # round 16 (guide §7.3): the per-digit / per-bit loops are GENERATED
    # SQL — the Column spelling paid ~200 py4j round trips per build for
    # the identical tree (CASE WHEN == when/otherwise, same left-assoc
    # reassembly sum); old-vs-new pinned bit-identical by test
    toks = toks.selectExpr(
        f"{_sql_ident(id_col)}",
        *[
            f"instr('{_HEX}', substring(h, {d + 1}, 1)) - 1 AS __d{d}"
            for d in range(n_digits)
        ],
    )
    bit_aggs = []
    for j in range(bits):
        d, shift = divmod(j, 4)
        bit_aggs.append(
            F.expr(
                f"sum(CASE WHEN shiftright(__d{d}, {3 - shift}) % 2 = 1"
                " THEN 1 ELSE -1 END)"
            ).alias(f"b_{j}")
        )
    summed = toks.groupBy(id_col).agg(*bit_aggs)
    value_sql = " + ".join(
        f"(CASE WHEN b_{j} > 0 THEN {2 ** j} ELSE 0 END)"
        for j in range(bits)
    )
    return summed.selectExpr(
        f"{_sql_ident(id_col)}", f"CAST({value_sql} AS BIGINT) AS simhash"
    )


def keep_cluster_representatives(
    df: DataFrame,
    clusters: DataFrame,
    id_col: str,
    score_col: str | None = None,
) -> DataFrame:
    """Prune a corpus to ONE representative per duplicate cluster — the
    selection step after :func:`dedup_clusters`: keep the member with the
    highest ``score_col`` (e.g. a quality score from
    ``textstats.quality_stats`` / ``classifier_score``), ties and the
    no-score case falling back to the smallest id (deterministic).
    Documents that appear in no cluster are kept as-is.

    Shape at 100 TB: one equi-join of the corpus against the (id,
    cluster_id) map (the map is dup-cluster-sized, typically a small
    fraction of the corpus — AQE broadcasts it when it fits), one window
    ranked within cluster_id. Returns the pruned corpus with the
    original columns.
    """
    from pyspark.sql import Window

    cols = df.columns
    cl = clusters.select(
        F.col("id").alias("__cid"), F.col("cluster_id").alias("__cluster")
    )
    joined = df.join(cl, df[id_col] == F.col("__cid"), "left")
    order = (
        [F.desc(score_col), F.asc(id_col)] if score_col else [F.asc(id_col)]
    )
    w = Window.partitionBy(
        # singletons (no cluster) rank alone under their own id. The key
        # is a (is_singleton, key) STRUCT, not a bare coalesce: cluster
        # ids are drawn from the id domain, so if a doc's id equals some
        # cluster_id whose min member was filtered out upstream, a
        # coalesced key would merge the unrelated singleton into that
        # cluster's window and silently drop one of them (r4 advice)
        F.struct(
            F.col("__cluster").isNull().alias("s"),
            F.coalesce(F.col("__cluster"), F.col(id_col)).alias("k"),
        )
    ).orderBy(*order)
    return (
        joined.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") == 1)
        .select(*cols)
    )


def split_leakage_report(
    df: DataFrame,
    id_col: str,
    split_col: str,
    text_col: str = "text",
    shingle_size: int = 3,
    threshold: float = 0.5,
    max_shingle_df: int | None = None,
    shingle_mode: str = "word",
) -> DataFrame:
    """Near-duplicate pairs that CROSS split boundaries (round 6) — the
    train/test leakage audit: a test doc with a near-dup in train
    inflates eval scores exactly like benchmark contamination, and a
    hash-based split assigns near-duplicates to different splits
    freely (only EXACT duplicates share a hash). Run it after
    :func:`~pydala_spark.operators.sampling.train_test_split` (or any
    split assignment) and before trusting the eval; fix = dedup before
    splitting, or move/drop the flagged pairs.

    Returns ``(id_a, id_b, split_a, split_b, jaccard)`` for pairs at or
    above ``threshold`` whose splits differ. Shape at 100 TB: the pair
    set comes from :func:`ngram_jaccard_pairs` (shingle-keyed equi-join,
    never a cross join; ``max_shingle_df`` caps stop-shingles); the two
    label joins run against the (id, split) projection, and AQE
    broadcasts the Jaccard-reduced pair side."""
    pairs = ngram_jaccard_pairs(
        df, id_col, text_col, shingle_size, threshold,
        max_shingle_df=max_shingle_df, shingle_mode=shingle_mode,
    )
    labels = df.select(F.col(id_col).alias("__lid"),
                       F.col(split_col).alias("__split"))
    return (
        pairs.join(labels, pairs["id_a"] == F.col("__lid"))
        .withColumnRenamed("__split", "split_a")
        .drop("__lid")
        .join(labels, pairs["id_b"] == F.col("__lid"))
        .withColumnRenamed("__split", "split_b")
        .drop("__lid")
        .where(F.col("split_a") != F.col("split_b"))
        .select("id_a", "id_b", "split_a", "split_b", "jaccard")
    )


def span_fingerprints(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    k: int = 20,
    window: int = 8,
) -> DataFrame:
    """The hashing half of :func:`duplicate_spans` (round 7), split out
    so it can be materialized ONCE at ingest as a signature sidecar
    (:func:`~pydala_spark.dataset.maintain.materialize_signatures`
    ``kinds=("spans",)``) — per-char-window hashing is the single most
    expensive pass in the engine, and every ``span_dedup`` sweep used to
    replay it over the full corpus text.

    Returns ``(id, fp, pos, len)``: one row per character window, where
    ``fp`` is ``xxhash64`` of the window's winnowing-selected minimum
    md5 ``k``-gram (the 64-bit narrowing changes NO grouping — selection
    happens on the md5 strings first, and fingerprint identity across
    copies survives any deterministic mapping; it does make the
    fingerprint-keyed shuffle and the persisted sidecar 4× narrower than
    32-char hex), ``pos`` the window's 1-based char offset and ``len``
    the doc's char length (denormalized so consumers never re-join the
    corpus for boundary clamping)."""
    from pydala_spark.operators.textstats import _win_min_sql

    base = df.select(F.col(id_col).alias("id"), F.col(text_col).alias("__t"))
    # staged projections (winnowing rule): lambdas must reference
    # MATERIALIZED columns or Catalyst re-substitutes the hashing
    # expression per consumer. GENERATED SQL (round 16, guide §7.3):
    # identical tree as the Column spelling — least-of-gets per window
    # position (least skips the NULLs get() yields past the tail), one
    # parse per stage instead of ~window py4j calls per position.
    h = base.selectExpr(
        "id",
        "length(__t) AS len",
        f"transform(sequence(1, greatest(length(__t) - {k - 1}, 1)),"
        f" i -> md5(substr(__t, i, {k}))) AS __hashes",
    )
    wins = h.selectExpr(
        "id",
        "len",
        f"transform(sequence(1, greatest(size(__hashes) - {window - 1},"
        f" 1)), j -> struct(j AS pos,"
        f" xxhash64({_win_min_sql('__hashes', window)}) AS fp)) AS __wins",
    )
    return explode_cheaply(wins, F.col("__wins"), "z").select(
        "id", F.col("z.fp").alias("fp"), F.col("z.pos").alias("pos"), "len"
    )


def duplicate_spans(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    k: int = 20,
    window: int = 8,
    min_span: int = 50,
    min_df: int = 2,
    fingerprints: DataFrame | None = None,
    params: dict | None = None,
) -> DataFrame:
    """Character ranges covered by CROSS-DOCUMENT duplicated content
    (round 6) — the sub-document complement of doc/paragraph dedup, in
    the spirit of ExactSubstr (Lee et al., "Deduplicating Training Data
    Makes Language Models Better") by way of BFF-style n-gram
    membership: instead of a suffix array, every char ``k``-gram is
    hashed, winnowing picks the per-window minimum (content-defined, so
    BOTH copies of a duplicated passage select the same fingerprints at
    the same content offsets), fingerprints occurring in >= ``min_df``
    documents mark their coverage, and maximal runs of marked windows
    longer than ``min_span`` chars become spans. Guarantee: a passage
    of >= ``k + window - 1`` chars duplicated across docs shares
    fingerprints; boundaries are approximate within ~``window`` chars
    (the standard trade of sketch-based span dedup — Lee et al. trim
    boundaries too). Raw text, no normalization: span offsets must map
    back to the document for surgery, and exact-substring dedup is
    case/punctuation-sensitive by definition.

    Returns ``(id, span_start, span_end)`` — 1-based inclusive char
    ranges, disjoint per doc. Shape at 100 TB: one row per WINDOW
    (corpus chars / 1, the honest cost of sub-document dedup — same
    order as a suffix array build), ONE fingerprint-keyed shuffle for
    the document-frequency count, one join back (hits only), one
    id-keyed shuffle for the run grouping. Every stage is
    partial-agg/window algebra; no Python.

    ``fingerprints`` (round 7) takes a precomputed
    :func:`span_fingerprints` frame — e.g. the ``spans`` signature
    sidecar — and skips the hashing pass entirely: ``df``/``text_col``
    are then IGNORED and the plan never touches corpus text. Pass the
    sidecar's ``_params.json`` dict as ``params`` (the second element
    ``read_signatures`` returns) and the run-gap / span-extent math
    derives ``k``/``window`` from the RECORDED values — a caller-side
    mismatch would otherwise produce silently wrong span boundaries
    (round-7 advice). Without ``params``, the caller-supplied
    ``k``/``window`` MUST equal the values the sidecar was hashed under
    (guard with ``expect={"k": ..., "window": ...}`` on
    ``read_signatures``). ``min_df``/``min_span`` remain free per sweep
    — the document-frequency count runs on the sidecar, which is
    exactly why the sidecar stores positions, not spans.

    Collision floor: fingerprints are 64-bit (xxhash64-narrowed), so at
    trillion-window scale isolated collisions can mark a single stray
    window; the resulting span is ≈ ``k + window - 1`` chars, below the
    default ``min_span=50`` and filtered. Keep ``min_span`` above
    ``k + window - 1`` (27 for the defaults) — lowering it beneath that
    floor lets a hash collision cut real text.
    """
    if params is not None:
        if fingerprints is None:
            raise ValueError(
                "duplicate_spans: params= describes a precomputed "
                "fingerprints frame — pass fingerprints= alongside it"
            )
        if params.get("kind", "spans") != "spans":
            raise ValueError(
                f"duplicate_spans: params kind={params.get('kind')!r} is "
                "not a 'spans' sidecar — span boundaries need the "
                "k/window the positional fingerprints were hashed under"
            )
        k = int(params["k"])
        window = int(params["window"])
    if fingerprints is None:
        # round 16 note: the positional frame feeds BOTH the
        # document-frequency aggregate and the hits join, so the
        # per-char hashing lineage replays once per consumer. A
        # localCheckpoint here was A/B'd and REGRESSED the 10x scale
        # probe 3.98x -> 39x: materializing one row per corpus char
        # costs far more than re-running the hash pass (CPU-cheap md5
        # vs storing/GC-ing the exploded frame). Recompute stands; the
        # store-once answer remains the spans signature sidecar
        # (span_fingerprints materialized at ingest).
        fingerprints = span_fingerprints(
            df, id_col, text_col, k=k, window=window
        )
    pos = fingerprints.select(
        "id", F.col("len").alias("__len"), "fp", "pos"
    )
    if min_df == 2:
        # round 16 (guide §2.3): "appears in >= 2 distinct docs" is
        # exactly min(id) != max(id) — one partial-agg exchange of
        # (fp, min, max) instead of count_distinct's two-phase
        # (fp, id) expansion, which re-shuffled every window position
        dup = (
            pos.groupBy("fp")
            .agg((F.min("id") != F.max("id")).alias("__multi"))
            .where(F.col("__multi"))
            .select("fp")
        )
    else:
        dup = (
            pos.groupBy("fp")
            .agg(F.count_distinct("id").alias("__df"))
            .where(F.col("__df") >= min_df)
            .select("fp")
        )
    hits = pos.join(dup, "fp")
    return span_runs(hits, k, window, min_span)


def span_runs(
    hits: DataFrame,
    k: int,
    window: int,
    min_span: int,
) -> DataFrame:
    """The run-grouping back half of :func:`duplicate_spans` — maximal
    runs of flagged window positions become ``(id, span_start,
    span_end)`` ranges — factored out (round 10, the
    :func:`band_frame` never-diverge rule) so the partial-incremental
    span sweep can re-group only the re-evaluated docs' flagged rows
    against the same math. ``hits`` carries ``(id, __len, pos)`` rows
    (one per FLAGGED window position; ``__len`` is the doc's char
    length); the decision is per-doc local, which is exactly what
    makes the partial sweep sound."""
    gap = k + window - 1
    w_ord = Window.partitionBy("id").orderBy("pos")
    runs = hits.withColumn(
        "__new",
        F.when(F.col("pos") - F.lag("pos").over(w_ord) <= gap, F.lit(0))
        .otherwise(F.lit(1)),
    ).withColumn(
        "__grp",
        F.sum("__new").over(
            w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    spans = runs.groupBy("id", "__grp").agg(
        F.min("pos").alias("span_start"),
        F.least(
            F.max("pos") + F.lit(k + window - 2), F.min("__len")
        ).alias("span_end"),
    )
    return spans.where(
        F.col("span_end") - F.col("span_start") + 1 >= min_span
    ).select("id", "span_start", "span_end")


def remove_duplicate_spans(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    k: int = 20,
    window: int = 8,
    min_span: int = 50,
    min_df: int = 2,
    spans: DataFrame | None = None,
    fingerprints: DataFrame | None = None,
    params: dict | None = None,
) -> DataFrame:
    """Rewrite ``text_col`` with :func:`duplicate_spans` ranges CUT OUT
    — the surgery half of sub-document dedup. Pass a precomputed
    ``spans`` frame to reuse one span computation across sweeps, or a
    ``fingerprints`` frame (the ``spans`` signature sidecar, round 7) to
    skip only the hashing pass while keeping ``min_df``/``min_span``
    free per sweep — with either, the corpus text is scanned exactly
    ONCE (the surgery itself) instead of once more for the per-char
    window hashing. The cut is a JVM-side fold over the doc's sorted
    disjoint spans (``F.aggregate`` carrying a (cursor, acc) struct — no
    Python, no explode): docs without spans pass through untouched, so
    the rewrite joins only the affected rows' span lists (AQE broadcasts
    the span side when small)."""
    if spans is not None and fingerprints is not None:
        raise ValueError(
            "pass spans OR fingerprints, not both — spans already bake "
            "in a min_df/min_span decision, fingerprints defer it"
        )
    if spans is None:
        spans = duplicate_spans(
            df, id_col, text_col, k=k, window=window,
            min_span=min_span, min_df=min_df, fingerprints=fingerprints,
            params=params,
        )
    per_doc = spans.groupBy("id").agg(
        F.array_sort(
            F.collect_list(F.struct("span_start", "span_end"))
        ).alias("__spans")
    )
    joined = df.join(
        per_doc, df[id_col] == per_doc["id"], "left"
    ).drop(per_doc["id"])
    t = F.col(text_col)
    cut = F.aggregate(
        F.col("__spans"),
        F.struct(
            F.lit(1).cast("int").alias("cur"), F.lit("").alias("acc")
        ),
        lambda acc, s: F.struct(
            (s["span_end"] + 1).cast("int").alias("cur"),
            F.concat(
                acc["acc"],
                F.substr(t, acc["cur"], s["span_start"] - acc["cur"]),
            ).alias("acc"),
        ),
        lambda acc: F.concat(
            acc["acc"],
            F.substr(t, acc["cur"], F.length(t) - acc["cur"] + 1),
        ),
    )
    return joined.withColumn(
        text_col,
        F.when(F.col("__spans").isNull(), t).otherwise(cut),
    ).drop("__spans")


def cluster_size_stats(clusters: DataFrame) -> DataFrame:
    """Cluster-size histogram over :func:`dedup_clusters` output —
    ``(cluster_size, n_clusters)`` (round 6). The corpus-health view of
    near-dup structure: a heavy tail of large clusters means viral
    templates/boilerplate the pipeline should route through paragraph
    or exact dedup BEFORE pairwise scoring (the same diagnosis
    ``lsh_candidate_pairs``'s bucket cap enforces mechanically).
    Two partial-agg-friendly exchanges over the cluster map, which is
    dup-cluster-sized — tiny relative to the corpus."""
    sizes = clusters.groupBy("cluster_id").agg(
        F.count("*").alias("cluster_size")
    )
    return sizes.groupBy("cluster_size").agg(
        F.count("*").alias("n_clusters")
    )


def dedup_paragraphs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n",
    max_occurrences: int | None = None,
) -> DataFrame:
    """Corpus-wide paragraph-level exact dedup (the Dolma/RefinedWeb
    sub-document step that document-level dedup can't express): every
    distinct paragraph survives only at its FIRST occurrence — smallest
    (doc id, position) — and documents are reassembled from their
    surviving paragraphs in order. Whitespace-only paragraphs drop.
    Returns ``(id, text, n_paras, n_kept)`` with ``text`` rebuilt via
    ``sep`` (empty string when nothing survived — the caller decides
    whether to drop hollowed-out docs).

    ``sep`` is a LITERAL separator string (regex metacharacters are
    escaped before the split, so ``sep="."`` splits on dots — and the
    reassembly joins the same literal).

    ``max_occurrences`` is the Dolma-style boilerplate killer: a
    paragraph whose corpus-wide occurrence count EXCEEDS it is dropped
    from every document INCLUDING the first (a navigation header seen a
    million times carries no content; keeping one stranded copy just
    pollutes one arbitrary document). None keeps the plain
    first-occurrence-wins rule. The count rides the same MIN
    aggregation — no extra shuffle.

    Shape at 100 TB: ``n_paras`` is pure column algebra on the split
    array (no second explode); paragraphs explode via ``posexplode_outer``
    (like :func:`explode_cheaply`, it infers no ``size(...) > 0`` guard,
    so the document-wide regex split is NOT re-evaluated below the
    generate — r4 review caught plain ``posexplode`` tripling the split);
    the first-occurrence choice is a ``groupBy(md5(paragraph))`` MIN over
    ``struct(id, pos, para)`` — partial-aggregated map-side, so a
    boilerplate paragraph repeated a billion times collapses within each
    task instead of funneling into one window partition (the skew
    discipline of :func:`dedup_exact`); reassembly is one aggregation
    keyed by doc id using ``array_sort(collect_list(struct(pos, para)))``
    — buffers bounded by one document's surviving paragraphs. Two
    shuffles total, both on high-cardinality keys.
    """
    import re

    base = df.select(
        F.col(id_col).alias("id"),
        F.split(F.col(text_col), re.escape(sep)).alias("__ps"),
    ).withColumn(
        # coalesce: a NULL text column splits to NULL, and size(NULL) is
        # NULL — the contract promises 0 (matching text='' / n_kept=0)
        "__np",
        F.coalesce(
            F.size(F.filter("__ps", lambda p: F.trim(p) != F.lit(""))).cast(
                "long"
            ),
            F.lit(0).cast("long"),
        ),
    )
    paras = (
        base.select("id", F.posexplode_outer("__ps").alias("pos", "para"))
        .where(F.col("para").isNotNull() & (F.trim(F.col("para")) != ""))
    )
    # min over (id, pos, para): (id, pos) is unique, so the struct min IS
    # the first occurrence, and it carries the paragraph text along; the
    # occurrence count shares the aggregation for the max_occurrences gate
    grouped = paras.groupBy(F.md5(F.col("para")).alias("__ph")).agg(
        F.min(F.struct("id", "pos", "para")).alias("w"),
        F.count("*").alias("__occ"),
    )
    if max_occurrences is not None:
        grouped = grouped.where(F.col("__occ") <= max_occurrences)
    kept = grouped.select("w.id", "w.pos", "w.para")
    rebuilt = kept.groupBy("id").agg(
        F.count("*").cast("long").alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "para"))),
                lambda s: s["para"],
            ),
            sep,
        ).alias("__text"),
    )
    return (
        base.select("id", F.col("__np").alias("n_paras"))
        .join(rebuilt, "id", "left")
        .select(
            "id",
            F.coalesce(F.col("__text"), F.lit("")).alias("text"),
            "n_paras",
            F.coalesce(F.col("n_kept"), F.lit(0)).alias("n_kept"),
        )
    )
