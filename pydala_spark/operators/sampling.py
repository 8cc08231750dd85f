"""Deterministic sampling for training-data pipelines.

The reference has no sampling surface of its own (query execution is
delegated to DuckDB, src/pydala/dataset/reader.py:478-484); these are
north-star extension operators (BASELINE.json). All selections are a
pure function of a key column — ``md5(key)`` plays the RNG — so every
run, every engine, and every executor picks the SAME rows:

- reproducible experiments (a re-run of the pipeline resamples
  identically, no seed plumbing, no RNG state);
- no coordination: on a 1000-executor cluster the Bernoulli sample and
  the split are narrow map-side filters/projections — zero shuffle,
  zero driver involvement, trivially restartable;
- nested samples for free: ``hash_sample(f1)`` is a strict subset of
  ``hash_sample(f2)`` whenever ``f1 <= f2`` (threshold sampling), so a
  10% dev slice is contained in the 50% training slice.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: hash space: the first 8 hex digits of md5, i.e. [0, 2^32).
HASH_SPACE = 1 << 32


def _key(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


def hash_bucket(
    col: str | Column, num_buckets: int = HASH_SPACE, salt: str | None = None
) -> Column:
    """Uniform deterministic bucket in ``[0, num_buckets)`` for a key:
    the first 8 md5 hex digits as an integer (optionally folded by mod).
    md5 is identical across engines, so bucket assignments are portable.

    ``salt`` prefixes the key (``md5(salt || '|' || key)``), yielding an
    INDEPENDENT bucket assignment — required when COMPOSING the sampling
    operators: with the shared unsalted hash, ``train_test_split`` after
    ``hash_sample(0.1)`` would label every surviving row 'test' (both
    decisions read the same bucket value).
    """
    keyed = _key(col).cast("string")
    if salt is not None:
        keyed = F.concat(F.lit(str(salt)), F.lit("|"), keyed)
    v = F.conv(F.substring(F.md5(keyed), 1, 8), 16, 10).cast("long")
    return v if num_buckets == HASH_SPACE else v % F.lit(num_buckets)


def sample_threshold(fraction: float) -> int:
    """The bucket threshold selecting ``fraction`` of the hash space."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    return int(fraction * HASH_SPACE)


def hash_sample(
    df: DataFrame, key: str | Column, fraction: float, salt: str | None = None
) -> DataFrame:
    """Deterministic Bernoulli sample: keep rows whose hash bucket falls
    in the first ``fraction`` of the space. A narrow filter — no shuffle,
    no RNG; at 100 TB it runs entirely map-side during the scan.
    Pass a distinct ``salt`` when composing with the other sampling
    operators (see :func:`hash_bucket`); samples at different fractions
    nest only under the SAME salt."""
    return df.where(
        hash_bucket(key, salt=salt) < F.lit(sample_threshold(fraction))
    )


def train_test_split(
    df: DataFrame,
    key: str | Column,
    test_fraction: float = 0.2,
    val_fraction: float = 0.0,
    split_col: str = "split",
    salt: str | None = None,
) -> DataFrame:
    """Deterministic train/test(/val) assignment as a ``split`` column.

    Disjoint + exhaustive by construction (threshold ranges on one
    bucket value); membership depends only on the key, so re-ingesting a
    document lands it in the same split — no train/test leakage across
    pipeline runs. Narrow projection: zero shuffle at any scale.
    Splitting a frame that already went through :func:`hash_sample` /
    :func:`weighted_domain_sample` needs a distinct ``salt`` — the
    shared unsalted hash would put every sampled row in 'test'.
    """
    if test_fraction + val_fraction > 1.0:
        raise ValueError(
            f"test_fraction + val_fraction must be <= 1 "
            f"(got {test_fraction} + {val_fraction})"
        )
    v = hash_bucket(key, salt=salt)
    test_hi = sample_threshold(test_fraction)
    val_hi = test_hi + sample_threshold(val_fraction)
    split = (
        F.when(v < test_hi, F.lit("test"))
        .when(v < val_hi, F.lit("val"))
        .otherwise(F.lit("train"))
    )
    return df.withColumn(split_col, split)


def weighted_domain_sample(
    df: DataFrame,
    key: str | Column,
    domain_col: str,
    rates: dict[str, float],
    default_rate: float = 1.0,
    salt: str | None = None,
) -> DataFrame:
    """Per-domain Bernoulli resampling — the mixture-weighting step of an
    LLM data pipeline (down-weight boilerplate-heavy sources, keep
    high-quality ones at 1.0). ``rates`` maps domain value -> keep
    fraction; unlisted domains use ``default_rate``.

    Same zero-shuffle shape as :func:`hash_sample`: the per-row
    threshold is a CASE over the domain column and membership is a pure
    function of the key, so the sweep is a narrow map-side filter at any
    scale, re-runs pick identical rows, and a domain's sample at rate r1
    is a strict subset of its sample at r2 >= r1 (threshold nesting —
    you can cheaply re-cut the mixture downward without touching the
    other domains).
    """
    for d, r in rates.items():
        if not 0.0 <= r <= 1.0:
            raise ValueError(f"rate for domain {d!r} must be in [0, 1], got {r}")
    threshold = F.lit(sample_threshold(default_rate))
    for domain, rate in rates.items():
        threshold = F.when(
            F.col(domain_col) == F.lit(domain), F.lit(sample_threshold(rate))
        ).otherwise(threshold)
    return df.where(hash_bucket(key, salt=salt) < threshold)


def token_budget_mixture(
    df: DataFrame,
    key: str,
    domain_col: str,
    token_col: str | Column,
    budgets: dict[str, int],
    default_budget: int | None = None,
    salt: str | None = None,
    n_buckets: int | None = None,
) -> DataFrame:
    """Execute a TOKEN-budgeted data recipe (round 6): per domain, keep
    documents in deterministic md5(key) order until the domain's token
    budget is reached — the mixture step of an LLM pipeline when the
    recipe is "X billion tokens of web, Y of code, Z of books", which
    doc-fraction resampling (:func:`weighted_domain_sample`) cannot
    express because token counts per doc vary by orders of magnitude.

    ``budgets`` maps domain value -> token budget; unlisted domains use
    ``default_budget`` (``None`` = uncapped). A document straddling its
    domain's boundary is KEPT (``cum_before < budget`` — the same
    gap-free contract as :func:`~pydala_spark.operators.packing.
    pack_shards`: budgets are floors of what you get, not ceilings).
    Deterministic: same inputs + salt => same docs, and a domain's
    selection under budget b1 is a strict PREFIX of its selection under
    b2 >= b1, so recipes can be re-cut downward without touching other
    domains.

    Scale shape: the naive spelling is a per-domain ORDER BY window —
    one task per domain, single-core for a 50 TB web domain. Here the
    md5 order key range-buckets (hash prefixes are uniform, and the
    bucket is order-monotonic in the full (md5, key) order since equal
    prefixes share a bucket), local prefix sums run per (domain,
    bucket), and per-bucket totals (tiny) carry the only per-domain
    window before broadcasting back as offsets — the pack_shards
    decomposition, partitioned by recipe domain. Adds ``n_tokens`` and
    ``cum_before`` (tokens before this doc within its domain's order).
    """
    for d, b in budgets.items():
        if b < 0:
            raise ValueError(f"budget for domain {d!r} must be >= 0, got {b}")
    tok = F.col(token_col) if isinstance(token_col, str) else token_col
    if n_buckets is None:
        n_buckets = int(
            df.sparkSession.conf.get("spark.sql.shuffle.partitions")
        )
    n_buckets = max(int(n_buckets), 1)
    prefix = f"{salt}|" if salt else ""
    ordk = F.md5(F.concat(F.lit(prefix), F.col(key).cast("string")))
    bucket = F.floor(
        F.conv(F.substring(ordk, 1, 4), 16, 10).cast("long")
        * n_buckets
        / 65536
    ).cast("int")
    with_b = (
        df.withColumn("__ord", ordk)
        .withColumn("__bucket", bucket)
        # NULL token counts would make cum_before NULL — dropped in
        # budgeted domains (NULL < budget is NULL) yet kept in uncapped
        # ones, and invisible to the prefix sums. Coalesce to 0 so the
        # keep/drop contract is uniform: a NULL-count doc costs nothing
        # against the budget and is kept wherever its hash order falls.
        .withColumn("n_tokens", F.coalesce(tok.cast("long"), F.lit(0)))
    )
    local = with_b.withColumn(
        "__local",
        F.sum("n_tokens").over(
            Window.partitionBy(domain_col, "__bucket")
            .orderBy("__ord", key)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    offsets = (
        with_b.groupBy(domain_col, "__bucket")
        .agg(F.sum("n_tokens").alias("__btotal"))
        .withColumn(
            "__offset",
            F.coalesce(
                F.sum("__btotal").over(
                    Window.partitionBy(domain_col)
                    .orderBy("__bucket")
                    .rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .drop("__btotal")
    )
    cum = (
        local.join(F.broadcast(offsets), [domain_col, "__bucket"])
        .withColumn(
            "cum_before",
            F.col("__offset") + F.col("__local") - F.col("n_tokens"),
        )
        .drop("__ord", "__bucket", "__local", "__offset")
    )
    if default_budget is None:
        budget = F.lit(None).cast("long")
    else:
        budget = F.lit(int(default_budget))
    for domain, b in budgets.items():
        budget = F.when(
            F.col(domain_col) == F.lit(domain), F.lit(int(b))
        ).otherwise(budget)
    return cum.where(budget.isNull() | (F.col("cum_before") < budget))


def shuffle_key(col: str | Column, seed: int = 0) -> Column:
    """The permutation key :func:`deterministic_shuffle` sorts by:
    ``md5(seed || '|' || key)``. Exposed so the declared query surface
    and the operator share one definition (oracle-checkable — md5 hex is
    identical across engines). ``concat`` not ``concat_ws``: a NULL key
    yields a NULL sort key, matching SQL ``||`` semantics exactly
    (concat_ws would silently collapse every NULL-key row onto
    ``md5(seed)``); NULL-key rows group at one end of the order — give
    rows a real key if that matters."""
    return F.md5(F.concat(F.lit(str(seed)), F.lit("|"), _key(col).cast("string")))


def deterministic_shuffle(
    df: DataFrame, key: str | Column, seed: int = 0, n_partitions: int | None = None
) -> DataFrame:
    """Deterministic global shuffle for training-example order: sort by
    ``md5(seed || key)`` (key as tiebreak). Changing ``seed`` gives an
    independent permutation; the same seed reproduces the same order on
    any engine/run — no RNG state to plumb through restarts.

    Cost shape: one range-partitioning exchange + per-partition sort
    (Spark samples split points, so skew self-balances); writing the
    result with ``maxRecordsPerFile`` yields shards whose row order is
    the global permutation. At 100 TB this is the cheapest global
    total order Spark offers — there is no single-task sort anywhere.
    """
    k = _key(key)
    order = shuffle_key(k, seed)
    if n_partitions is not None:
        return df.repartitionByRange(n_partitions, order, k).sortWithinPartitions(
            order, k
        )
    return df.orderBy(order, k)


def stratified_sample(
    df: DataFrame,
    key: str | Column,
    group_cols: list[str],
    n_per_group: int,
) -> DataFrame:
    """Exactly ``n_per_group`` rows per group, chosen by hash order —
    a deterministic class-balanced sample (e.g. N docs per language).

    One shuffle on ``group_cols``; the per-group order is
    ``(md5(key), key)`` so ties are impossible and the pick is stable.
    At scale this is a window top-N: Spark's ``row_number`` ranks within
    each hash partition without a global sort, and AQE handles skewed
    groups. For heavily skewed group keys pre-filter with
    ``hash_sample`` to cap the per-group sort input.
    """
    k = _key(key)
    w = Window.partitionBy(*group_cols).orderBy(F.md5(k.cast("string")), k)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= n_per_group)
        .drop("__rn")
    )


def _exact_quantile_distributed(
    df: DataFrame,
    score_col: str,
    q: float,
    accuracy: int = 10_000,
    max_bracket: int = 2_000_000,
) -> float | None:
    """Exact interpolated ``q``-quantile WITHOUT the single-task sort
    (round 8): Spark's ``percentile`` buffers and sorts EVERY value in
    one reducer — the old exact path's scale-killer and the dominant
    cost of ``q_stats_summary``. This computes the same value from
    order statistics in three map-side passes over one double column:

    1. one agg → non-null count ``n`` plus a Greenwald-Khanna bracket
       ``[lo, hi]`` around the quantile (``percentile_approx`` at
       ``q ± 2/accuracy`` — GK's rank error is ≤ n/accuracy, so the
       true order statistics land inside);
    2. one agg → exact ranks: ``below`` = #values < lo, ``inbr`` =
       #values in the bracket (verifies the GK guarantee and bounds the
       collect);
    3. collect the bracket (≈ 4·n/accuracy values — tiny) and index the
       exact k-th / (k+1)-th order statistics out of it.

    Interpolation replicates Spark's ``Percentile`` formula
    ``(higher - pos)·v_k + (pos - lower)·v_{k+1}`` bit-for-bit, so the
    result is indistinguishable from the buffered path (and from DuckDB
    ``quantile_cont``, which the oracle pins). Returns None when the
    bracket would exceed ``max_bracket`` or a rank check fails (heavy
    ties around the quantile) — the caller falls back to the buffered
    path, trading speed, never exactness. Values are compared as
    doubles, matching ``percentile``'s own double conversion."""
    import math

    vals = (
        df.select(F.col(score_col).cast("double").alias("__v"))
        .where(F.col("__v").isNotNull())
    )
    eps = 2.0 / accuracy
    first = vals.agg(
        F.count("*").alias("n"),
        F.percentile_approx(
            "__v", F.lit(max(0.0, q - eps)), F.lit(accuracy)
        ).alias("lo"),
        F.percentile_approx(
            "__v", F.lit(min(1.0, q + eps)), F.lit(accuracy)
        ).alias("hi"),
    ).first()
    n = int(first["n"])
    if n == 0:
        return None
    pos = (n - 1) * q
    k = int(math.floor(pos))
    k2 = min(k + 1, n - 1)
    lo, hi = float(first["lo"]), float(first["hi"])
    ranks = vals.agg(
        F.count(F.when(F.col("__v") < lo, 1)).alias("below"),
        F.count(
            F.when((F.col("__v") >= lo) & (F.col("__v") <= hi), 1)
        ).alias("inbr"),
    ).first()
    below, inbr = int(ranks["below"]), int(ranks["inbr"])
    if inbr > max_bracket or below > k or below + inbr <= k2:
        return None
    bracket = sorted(
        r["__v"]
        for r in vals.where(
            (F.col("__v") >= lo) & (F.col("__v") <= hi)
        ).collect()
    )
    v_k, v_k2 = bracket[k - below], bracket[k2 - below]
    if k == pos:
        return v_k
    return (k + 1 - pos) * v_k + (pos - k) * v_k2


def quantile_threshold(
    df: DataFrame,
    score_col: str,
    q: float,
    exact: bool = False,
    relative_error: float = 0.001,
) -> float:
    """The ``q``-quantile of ``score_col`` as a driver scalar — the
    cutoff a percentile-based corpus filter needs. Default is the
    one-pass bounded-memory approximation (``percentile_approx``,
    Greenwald-Khanna — the 100 TB path: cost of one aggregation, error
    bounded by ``relative_error``); ``exact=True`` computes the exact
    interpolated percentile distributed (three map-side passes + a tiny
    bracket collect — :func:`_exact_quantile_distributed`), falling
    back to Spark's buffered single-task ``percentile`` only when heavy
    ties around the quantile defeat the bracket. Both exact spellings
    return bit-identical values."""
    if not 0.0 <= q <= 1.0:
        raise ValueError("q must be in [0, 1]")
    if exact:
        t = _exact_quantile_distributed(df, score_col, q)
        if t is not None:
            return float(t)
        expr = F.expr(f"percentile({score_col}, {q!r})")
    else:
        expr = F.percentile_approx(
            score_col, F.lit(q), F.lit(max(1, int(1.0 / relative_error)))
        )
    t = df.agg(expr.alias("t")).first()["t"]
    if t is None:  # zero non-null scores: percentile comes back NULL
        raise ValueError(
            f"quantile_threshold: no non-null values in {score_col!r} — "
            "empty corpus or all-NULL score column"
        )
    return float(t)


def filter_by_quantile(
    df: DataFrame,
    score_col: str,
    keep_top_frac: float = 0.5,
    exact: bool = False,
    relative_error: float = 0.001,
) -> DataFrame:
    """Keep the rows whose ``score_col`` reaches the top
    ``keep_top_frac`` of the corpus — the standard form of a learned
    quality cutoff ("keep the best-scoring 30%"), e.g. over
    ``classifier_score``'s logit. One aggregation derives the threshold
    (approximate by default — see :func:`quantile_threshold`); the
    filter itself is a map-side predicate that composes with downstream
    stages and pushes into scans where the score is a stored column."""
    if not 0.0 < keep_top_frac <= 1.0:
        raise ValueError("keep_top_frac must be in (0, 1]")
    thr = quantile_threshold(
        df, score_col, 1.0 - keep_top_frac, exact=exact,
        relative_error=relative_error,
    )
    return df.where(F.col(score_col) >= F.lit(thr))
