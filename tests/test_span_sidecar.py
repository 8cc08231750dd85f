"""Round 8: contract tests for the round-7 span-fingerprint sidecar
(materialize_signatures kinds=("spans",)) and the sidecar content-
staleness marker (read_signatures verify_against=) — the tests the
round-7 snapshot commit shipped without (VERDICT r7 item 1)."""

import json
import posixpath

import pytest
from pyspark.sql import functions as F

from pydala_spark.dataset.maintain import (
    SIGNATURES_DIR,
    materialize_signatures,
    read_signatures,
)
from pydala_spark.operators.dedup import (
    duplicate_spans,
    remove_duplicate_spans,
    span_fingerprints,
)

_SHARED = ("it was the best of times it was the worst of times it was "
           "the age of wisdom it was the age of foolishness indeed")


def _span_docs(spark):
    texts = {
        1: f"unique opening about gardens and trees. {_SHARED} unique "
           "closing about rivers and stones in the valley below here",
        2: f"completely different preamble text goes here now. {_SHARED} "
           "and then a different ending altogether for this one too",
        3: "this document shares nothing with the others at all and "
           "talks at length about cooking pasta with garlic and olive "
           "oil on a slow flame until fragrant and golden",
    }
    return spark.createDataFrame(list(texts.items()), ["doc_id", "text"])


K, WINDOW, MIN_SPAN, MIN_DF = 20, 8, 50, 2


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_spans_sidecar_roundtrip_equals_inline(spark, tmp_path):
    # (a) sidecar round-trip == inline span_fingerprints, and
    # duplicate_spans(fingerprints=sidecar) row-equal to the inline path
    base = str(tmp_path / "ds")
    df = _span_docs(spark)
    df.write.parquet(base + "/data")
    out = materialize_signatures(
        spark, df, base, kinds=("spans",), span_k=K, span_window=WINDOW
    )
    assert out == {"spans": posixpath.join(base, SIGNATURES_DIR, "spans")}

    sidecar, params = read_signatures(
        spark, base, "spans", expect={"k": K, "window": WINDOW}
    )
    inline_fps = span_fingerprints(df, "doc_id", k=K, window=WINDOW)
    assert _rows(sidecar) == _rows(inline_fps)

    inline = duplicate_spans(
        df, "doc_id", k=K, window=WINDOW, min_span=MIN_SPAN, min_df=MIN_DF
    )
    pre = duplicate_spans(
        df, "doc_id", min_span=MIN_SPAN, min_df=MIN_DF,
        fingerprints=sidecar, params=params,
    )
    assert _rows(pre) == _rows(inline)
    assert pre.count() > 0  # the fixture genuinely has duplicated spans

    # the surgery half agrees too, end to end
    inline_cut = remove_duplicate_spans(
        df, "doc_id", k=K, window=WINDOW, min_span=MIN_SPAN, min_df=MIN_DF
    )
    pre_cut = remove_duplicate_spans(
        df, "doc_id", min_span=MIN_SPAN, min_df=MIN_DF,
        fingerprints=sidecar, params=params,
    )
    assert _rows(pre_cut.select("doc_id", "text")) == _rows(
        inline_cut.select("doc_id", "text")
    )


def test_spans_sidecar_plan_never_hashes_or_scans_text(spark, tmp_path):
    # (b) the precomputed-span plan reads ONLY the sidecar: no md5
    # hashing anywhere, no corpus data-file scan, no text column in any
    # ReadSchema (mirror of the winnowing zero-scan pin)
    from pydala_spark.plans import explain_str, read_schema_columns

    base = str(tmp_path / "ds")
    df = _span_docs(spark)
    df.write.parquet(base + "/data")
    materialize_signatures(
        spark, df, base, kinds=("spans",), span_k=K, span_window=WINDOW
    )
    sidecar, params = read_signatures(spark, base, "spans")
    spans = duplicate_spans(
        df, "doc_id", min_span=MIN_SPAN, min_df=MIN_DF,
        fingerprints=sidecar, params=params,
    )
    plan = explain_str(spans)
    assert "md5" not in plan.lower()  # zero hashing in the sweep
    assert "/data" not in plan  # corpus parquet never scanned
    assert "_signatures/spans" in plan  # the sidecar is the only scan
    for cols in read_schema_columns(spans):
        assert "text" not in cols


def test_duplicate_spans_params_guard(spark, tmp_path):
    base = str(tmp_path / "ds")
    df = _span_docs(spark)
    materialize_signatures(
        spark, df, base, kinds=("spans",), span_k=K, span_window=WINDOW
    )
    sidecar, params = read_signatures(spark, base, "spans")
    # params without a fingerprints frame is a caller bug — fail loud
    with pytest.raises(ValueError, match="fingerprints"):
        duplicate_spans(df, "doc_id", params=params)
    # a non-spans sidecar's params must not drive span-boundary math
    with pytest.raises(ValueError, match="kind"):
        duplicate_spans(
            df, "doc_id", fingerprints=sidecar,
            params={"kind": "winnowing", "k": 8, "window": 4},
        )
    # with params=, the RECORDED k/window win over bogus caller values
    inline = duplicate_spans(
        df, "doc_id", k=K, window=WINDOW, min_span=MIN_SPAN, min_df=MIN_DF
    )
    pre = duplicate_spans(
        df, "doc_id", k=5, window=2,  # wrong on purpose — params override
        min_span=MIN_SPAN, min_df=MIN_DF,
        fingerprints=sidecar, params=params,
    )
    assert _rows(pre) == _rows(inline)


def test_verify_against_fresh_passes_and_mutation_raises(spark, tmp_path):
    # (c) staleness marker: fresh corpus verifies; a text mutation (the
    # silent zero-overlap failure mode) raises LOUD
    base = str(tmp_path / "ds")
    df = _span_docs(spark)
    materialize_signatures(
        spark, df, base, kinds=("spans",), span_k=K, span_window=WINDOW
    )
    sidecar, params = read_signatures(spark, base, "spans",
                                      verify_against=df)
    assert params["content_rows"] == df.count()

    mutated = df.withColumn(
        "text",
        F.when(F.col("doc_id") == 1, F.concat(F.col("text"), F.lit(" x")))
        .otherwise(F.col("text")),
    )
    with pytest.raises(ValueError, match="STALE"):
        read_signatures(spark, base, "spans", verify_against=mutated)
    # row-count drift (a dropped doc) is also a mutation
    with pytest.raises(ValueError, match="STALE"):
        read_signatures(
            spark, base, "spans",
            verify_against=df.where(F.col("doc_id") != 3),
        )


def test_verify_against_append_folds_marker(spark, tmp_path):
    # appends fold the marker (rows add, xor xors): after an append the
    # UNION verifies and equals a from-scratch materialization's marker
    base = str(tmp_path / "ds")
    more_base = str(tmp_path / "full")
    df = _span_docs(spark)
    extra = spark.createDataFrame(
        [(4, f"a fourth document carrying the passage too. {_SHARED} "
             "plus trailing words of its own making here")],
        ["doc_id", "text"],
    )
    materialize_signatures(
        spark, df, base, kinds=("spans",), span_k=K, span_window=WINDOW
    )
    materialize_signatures(
        spark, extra, base, kinds=("spans",), span_k=K,
        span_window=WINDOW, mode="append",
    )
    union = df.unionByName(extra)
    _, params = read_signatures(spark, base, "spans", verify_against=union)
    # against only the original slice the folded marker must NOT verify
    with pytest.raises(ValueError, match="STALE"):
        read_signatures(spark, base, "spans", verify_against=df)
    # folded marker == full re-materialization's marker
    materialize_signatures(
        spark, union, more_base, kinds=("spans",), span_k=K,
        span_window=WINDOW,
    )
    _, full = read_signatures(spark, more_base, "spans")
    assert (params["content_rows"], params["content_xor"]) == (
        full["content_rows"], full["content_xor"]
    )


def test_append_onto_premarker_sidecar_raises(spark, tmp_path):
    # r7 advice: a pre-round-7 sidecar (no content marker recorded) must
    # refuse appends instead of folding against an implicit zero marker
    # that would later misdiagnose a complete sidecar as stale
    base = str(tmp_path / "ds")
    df = _span_docs(spark)
    materialize_signatures(spark, df, base, kinds=("spans",))
    params_path = (tmp_path / "ds" / SIGNATURES_DIR / "spans"
                   / "_params.json")
    recorded = json.loads(params_path.read_text())
    recorded.pop("content_rows")
    recorded.pop("content_xor")
    params_path.write_text(json.dumps(recorded))
    # the out-of-band rewrite invalidates Hadoop's local-FS checksum
    crc = params_path.parent / "._params.json.crc"
    if crc.exists():
        crc.unlink()
    with pytest.raises(ValueError, match="predates content markers"):
        materialize_signatures(spark, df, base, kinds=("spans",),
                               mode="append")
    # and the read-side guard gives the same diagnosis
    with pytest.raises(ValueError, match="predates content markers"):
        read_signatures(spark, base, "spans", verify_against=df)
