import os

from pydala_spark.operators.sampling import (
    HASH_SPACE,
    hash_bucket,
    hash_sample,
    sample_threshold,
    stratified_sample,
    train_test_split,
)
from pydala_spark.sources import load_table

from pyspark.sql import functions as F


def test_hash_sample_deterministic_and_nested(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    total = docs.count()

    s10 = {r["doc_id"] for r in hash_sample(docs, "doc_id", 0.10).collect()}
    s30 = {r["doc_id"] for r in hash_sample(docs, "doc_id", 0.30).collect()}
    # deterministic: a second run picks the identical rows
    assert s10 == {r["doc_id"] for r in hash_sample(docs, "doc_id", 0.10).collect()}
    # nested: smaller fraction is a strict subset of the larger
    assert s10 < s30
    # roughly proportional (md5 is uniform; wide tolerance at 500 rows)
    assert 0.03 * total < len(s10) < 0.20 * total
    assert 0.18 * total < len(s30) < 0.45 * total


def test_train_test_split_disjoint_exhaustive(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    split = train_test_split(docs, "doc_id", test_fraction=0.2, val_fraction=0.1)
    counts = {r["split"]: r["n"] for r in
              split.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "test", "val"}
    assert sum(counts.values()) == docs.count()
    # split agrees with the standalone sample at the same threshold
    test_ids = {r["doc_id"] for r in
                split.where("split = 'test'").select("doc_id").collect()}
    assert test_ids == {
        r["doc_id"] for r in hash_sample(docs, "doc_id", 0.2).collect()
    }


def test_stratified_sample_exact_per_group(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    out = stratified_sample(docs, "doc_id", ["lang"], 7)
    per_group = {r["lang"]: r["n"] for r in
                 out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    avail = {r["lang"]: r["n"] for r in
             docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    for lang, n in per_group.items():
        assert n == min(7, avail[lang])
    # deterministic pick
    ids1 = sorted(r["doc_id"] for r in out.collect())
    ids2 = sorted(
        r["doc_id"] for r in stratified_sample(docs, "doc_id", ["lang"], 7).collect()
    )
    assert ids1 == ids2


def test_hash_bucket_range_and_threshold():
    assert sample_threshold(0.0) == 0
    assert sample_threshold(1.0) == HASH_SPACE
    assert sample_threshold(0.5) == HASH_SPACE // 2


def test_hash_sample_plan_is_narrow(spark, sf_dir):
    # the sample must be a map-side filter: no shuffle in the plan
    docs = load_table(spark, sf_dir, "documents")
    plan = hash_sample(docs, "doc_id", 0.1)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_weighted_domain_sample(spark):
    from pydala_spark.operators.sampling import weighted_domain_sample

    df = spark.createDataFrame(
        [(i, ["web", "books", "code"][i % 3]) for i in range(900)],
        "id long, domain string",
    )
    out = weighted_domain_sample(
        df, "id", "domain", {"web": 0.3, "books": 1.0, "code": 0.0}
    )
    got = out.groupBy("domain").count().collect()
    counts = {r["domain"]: r["count"] for r in got}
    assert counts["books"] == 300          # rate 1.0 keeps everything
    assert "code" not in counts            # rate 0.0 drops the domain
    assert 40 < counts.get("web", 0) < 140  # ~30% of 300

    # threshold nesting: web@0.3 is a strict subset of web@0.6
    lo = {r["id"] for r in weighted_domain_sample(
        df, "id", "domain", {"web": 0.3}, default_rate=0.0).collect()}
    hi = {r["id"] for r in weighted_domain_sample(
        df, "id", "domain", {"web": 0.6}, default_rate=0.0).collect()}
    assert lo < hi

    # unlisted domains take default_rate
    dflt = weighted_domain_sample(df, "id", "domain", {"web": 0.0},
                                  default_rate=1.0)
    assert dflt.where("domain <> 'web'").count() == 600
    assert dflt.where("domain = 'web'").count() == 0

    import pytest

    with pytest.raises(ValueError, match="must be in"):
        weighted_domain_sample(df, "id", "domain", {"web": 1.5})


def test_deterministic_shuffle(spark):
    from pydala_spark.operators.sampling import deterministic_shuffle

    df = spark.createDataFrame([(i,) for i in range(500)], "id long")
    a = [r["id"] for r in deterministic_shuffle(df, "id", seed=1).collect()]
    b = [r["id"] for r in deterministic_shuffle(df, "id", seed=1).collect()]
    c = [r["id"] for r in deterministic_shuffle(df, "id", seed=2).collect()]
    assert a == b                      # same seed -> identical order
    assert a != c                      # different seed -> different permutation
    assert sorted(a) == list(range(500)) == sorted(c)  # nothing lost
    assert a != list(range(500))       # actually shuffled

    # the sharded form (range partitioning) yields the SAME global order
    sharded = deterministic_shuffle(df, "id", seed=1, n_partitions=5)
    assert [r["id"] for r in sharded.collect()] == a
    assert sharded.rdd.getNumPartitions() == 5


def test_weighted_domain_sample_null_domain_uses_default(spark):
    from pydala_spark.operators.sampling import weighted_domain_sample

    df = spark.createDataFrame(
        [(1, "web"), (2, None), (3, None), (4, "web")],
        "id long, domain string",
    )
    # NULL domain never equals any listed domain -> default rate applies
    kept = weighted_domain_sample(df, "id", "domain", {"web": 0.0},
                                  default_rate=1.0)
    assert sorted(r["id"] for r in kept.collect()) == [2, 3]
    dropped = weighted_domain_sample(df, "id", "domain", {"web": 1.0},
                                     default_rate=0.0)
    assert sorted(r["id"] for r in dropped.collect()) == [1, 4]


def test_salted_composition_not_degenerate(spark, sf_dir):
    # r4 review: composing sample -> split on the SAME unsalted hash
    # puts every surviving row in 'test'; a distinct salt decorrelates
    docs = load_table(spark, sf_dir, "documents")
    sampled = hash_sample(docs, "doc_id", 0.3)
    degenerate = train_test_split(sampled, "doc_id", test_fraction=0.3)
    assert degenerate.where("split <> 'test'").count() == 0  # documented hazard
    salted = train_test_split(sampled, "doc_id", test_fraction=0.3, salt="split")
    counts = {r["split"]: r["n"] for r in
              salted.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert counts.get("train", 0) > 0 and counts.get("test", 0) > 0
    # and the salted assignment is still deterministic
    again = train_test_split(sampled, "doc_id", test_fraction=0.3, salt="split")
    assert {(r["doc_id"], r["split"]) for r in salted.collect()} == {
        (r["doc_id"], r["split"]) for r in again.collect()
    }


def test_train_test_split_validates_fraction_sum(spark, sf_dir):
    import pytest

    docs = load_table(spark, sf_dir, "documents")
    with pytest.raises(ValueError, match="<= 1"):
        train_test_split(docs, "doc_id", test_fraction=0.8, val_fraction=0.4)


def test_filter_by_quantile(spark):
    # r4: percentile-cutoff filter — exact path matches a hand-computed
    # threshold; approx path keeps roughly the requested fraction
    from pydala_spark.operators.sampling import (
        filter_by_quantile,
        quantile_threshold,
    )

    df = spark.createDataFrame(
        [(i, float(i)) for i in range(100)], ["id", "score"]
    )
    thr = quantile_threshold(df, "score", 0.75, exact=True)
    assert thr == 74.25  # interpolated percentile of 0..99
    kept = filter_by_quantile(df, "score", keep_top_frac=0.25, exact=True)
    ids = {r["id"] for r in kept.collect()}
    assert ids == set(range(75, 100))
    approx = filter_by_quantile(df, "score", keep_top_frac=0.5).count()
    assert 45 <= approx <= 55
    import pytest as _pt

    with _pt.raises(ValueError):
        filter_by_quantile(df, "score", keep_top_frac=0.0)
    with _pt.raises(ValueError):
        quantile_threshold(df, "score", 1.5)


def test_quantile_threshold_empty_corpus_clear_error(spark):
    # r4 review: NULL percentile (empty / all-null) must raise a clear
    # ValueError, not TypeError on float(None)
    from pydala_spark.operators.sampling import quantile_threshold

    df = spark.createDataFrame([(1, 1.0)], ["id", "score"]).where("id < 0")
    import pytest as _pt

    with _pt.raises(ValueError, match="no non-null values"):
        quantile_threshold(df, "score", 0.5)

def test_token_budget_mixture_recipe(spark):
    # round 6: per-domain token budgets in deterministic hash order
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from pydala_spark.operators.sampling import token_budget_mixture

    rows = [
        (i, "web" if i % 3 else "code", 10 + (i % 7) * 5)
        for i in range(1, 201)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "domain", "tok"])
    out = token_budget_mixture(
        df, "doc_id", "domain", "tok",
        budgets={"web": 300}, default_budget=None,
    )
    got = out.collect()
    # bit-identical to the naive single-window spelling
    w = Window.partitionBy("domain").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    naive = (
        df.withColumn("n_tokens", F.col("tok").cast("long"))
        .withColumn("cum_before", F.sum("n_tokens").over(w) - F.col("n_tokens"))
        .where((F.col("domain") != "web") | (F.col("cum_before") < 300))
    )
    assert sorted((r["doc_id"], r["cum_before"]) for r in got) == sorted(
        (r["doc_id"], r["cum_before"]) for r in naive.collect()
    )
    # uncapped default keeps every code doc; web stops past the budget
    # (boundary doc included -> total may overshoot, never undershoot)
    by_dom = {}
    for r in got:
        by_dom.setdefault(r["domain"], []).append(r)
    assert len(by_dom["code"]) == sum(1 for _, d, _t in rows if d == "code")
    web_total = sum(r["n_tokens"] for r in by_dom["web"])
    assert web_total >= 300
    assert max(r["cum_before"] for r in by_dom["web"]) < 300

    # budget monotonicity: the 300-token web selection is a strict
    # subset of the 600-token one (recipes re-cut downward cleanly)
    bigger = {
        r["doc_id"]
        for r in token_budget_mixture(
            df, "doc_id", "domain", "tok",
            budgets={"web": 600}, default_budget=None,
        ).collect()
    }
    assert {r["doc_id"] for r in got} < bigger

    import pytest as _pt

    with _pt.raises(ValueError, match="budget"):
        token_budget_mixture(df, "doc_id", "domain", "tok", {"web": -1})


def test_token_budget_mixture_null_tokens_uniform(spark):
    # round-7 advice: NULL token counts used to make cum_before NULL —
    # dropped in budgeted domains (NULL < budget is NULL) yet kept in
    # uncapped ones, and invisible to the prefix sums. Now coalesced to
    # 0: kept everywhere, costing nothing against the budget.
    from pydala_spark.operators.sampling import token_budget_mixture

    rows = [
        (1, "web", 100), (2, "web", None), (3, "web", 100),
        (4, "code", None), (5, "code", 50),
    ]
    df = spark.createDataFrame(rows, "doc_id long, domain string, tok long")
    out = token_budget_mixture(
        df, "doc_id", "domain", "tok",
        budgets={"web": 10_000}, default_budget=None,
    ).collect()
    assert {r["doc_id"] for r in out} == {1, 2, 3, 4, 5}
    by_id = {r["doc_id"]: r for r in out}
    assert by_id[2]["n_tokens"] == 0 and by_id[4]["n_tokens"] == 0
    # prefix sums stay non-null and the NULL doc contributes nothing
    assert all(r["cum_before"] is not None for r in out)
    assert sum(r["n_tokens"] for r in out if r["domain"] == "web") == 200

def test_split_leakage_report_flags_cross_split_neardups(spark):
    # round 6: near-dup pairs straddling the split boundary are the
    # leakage audit's output; same-split near-dups and cross-split
    # non-dups stay silent
    from pydala_spark.operators.dedup import split_leakage_report

    base = ("alpha bravo charlie delta echo foxtrot golf hotel india "
            "juliet kilo lima mike november oscar papa quebec")
    rows = [
        (1, base + " one", "train"),
        (2, base + " two", "test"),      # near-dup of 1, crosses split
        (3, base + " three", "train"),   # near-dup of 1, SAME split
        (4, "totally different content about gardening soil and plants "
            "growing under glass with care", "test"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "split"])
    leaks = split_leakage_report(
        df, "doc_id", "split", threshold=0.5
    ).collect()
    got = {(r["id_a"], r["id_b"]): (r["split_a"], r["split_b"]) for r in leaks}
    assert (1, 2) in got and got[(1, 2)] == ("train", "test")
    assert (2, 3) in got  # the other cross pair of the triangle
    assert (1, 3) not in got  # same split -> not leakage
    assert all(4 not in pair for pair in got)

def test_token_budget_mixture_bucket_count_invariance(spark):
    # the bucketed per-domain prefix sum must be EXACTLY independent of
    # n_buckets — the decomposition's core invariant (any dependence
    # would mean bucket-major order != global order somewhere)
    from pydala_spark.operators.sampling import token_budget_mixture

    rows = [
        (i, ["web", "code", "books"][i % 3], 5 + (i * 7) % 40)
        for i in range(1, 151)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "domain", "tok"])
    results = {}
    for nb in (1, 7, 32):
        out = token_budget_mixture(
            df, "doc_id", "domain", "tok",
            budgets={"web": 400, "code": 250}, default_budget=300,
            n_buckets=nb,
        )
        results[nb] = sorted(
            (r["doc_id"], r["cum_before"]) for r in out.collect()
        )
    assert results[1] == results[7] == results[32]


def test_exact_quantile_distributed_matches_buffered(spark):
    # round 8: the distributed exact percentile (bracket + order
    # statistics) is bit-identical to Spark's buffered percentile —
    # including interpolation, ties, negatives, and n=1 — and falls
    # back (returns None) when ties defeat the bracket
    import struct

    from pyspark.sql import functions as F

    from pydala_spark.operators.sampling import (
        _exact_quantile_distributed,
        quantile_threshold,
    )

    def buffered(df, q):
        return float(
            df.agg(F.expr(f"percentile(s, {q!r})").alias("t")).first()["t"]
        )

    fixtures = [
        [float(v) for v in (5, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5)],  # ties
        [-2.5, -0.1, -9.75],
        [42.0],
        [float(i) * 1.01 for i in range(100)],
    ]
    for vals in fixtures:
        df = spark.createDataFrame([(v,) for v in vals], "s double")
        for q in (0.0, 0.25, 0.5, 0.75, 1.0):
            a = quantile_threshold(df, "s", q, exact=True)
            b = buffered(df, q)
            assert struct.pack("d", a) == struct.pack("d", b), (vals, q)

    # all-tie corpus defeats the bracket cap -> distributed path bows
    # out, the public API falls back to the buffered path, same value
    ties = spark.createDataFrame([(2.0,)] * 50, "s double")
    assert _exact_quantile_distributed(ties, "s", 0.5, max_bracket=5) is None
    assert quantile_threshold(ties, "s", 0.5, exact=True) == 2.0
