"""Cross-engine regex portability for the scrub patterns: the SAME
pattern strings must produce the SAME match counts and redactions in
Spark (Java regex) and DuckDB (RE2) — the property the q_text_profile
oracle relies on, checked here over adversarial generated text rather
than only the planted spans."""

import random

import duckdb
import pandas as pd

from pydala_spark.operators.scrub import PII_PATTERNS, pii_stats, redact_pii

from pyspark.sql import functions as F

#: fragments chosen to sit NEAR pattern boundaries: partial emails,
#: almost-IPs, digit runs, URL-ish text, punctuation soup
_FRAGMENTS = [
    "plain words here", "a@b", "@example.com", "user@@host.com",
    "jo.doe+x@corp.example.com", "1.2.3.4", "1.2.3", "999.999.999.999",
    "1.2.3.4.5", "v1.2.3-rc4", "http://", "https://x.io/p?q=1#f",
    "http//broken.example", "ftp://not.matched/x", "call +1 415-555-0100",
    "+12 345-678-9012", "+1 4155550100", "123-45-6789", "123-456-789",
    "12-345-6789", "(555) 123-4567", "a.b.c.d", "x 10.0.0.256 y",
    "trailing dot. 8.8.8.8.", "email: a.b-c_d%e+f@sub.do-main.org!",
    "https://WWW.Mixed.CASE/Path", "..", "---", "1..2..3..4",
]


def _corpus(n=120, seed=7):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        k = rng.randint(1, 6)
        rows.append((i, " ".join(rng.choice(_FRAGMENTS) for _ in range(k))))
    return rows


def test_pii_counts_and_redaction_match_duckdb(spark):
    rows = _corpus()
    sdf = spark.createDataFrame(rows, "doc_id long, text string")
    got = (
        pii_stats(sdf)
        .withColumn("red", redact_pii("text"))
        .orderBy("doc_id")
        .toPandas()
    )

    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    con = duckdb.connect()
    con.register("docs", pdf)
    count_cols = ", ".join(
        f"LEN(regexp_extract_all(text, '{pat}')) AS n_{kind}"
        for kind, pat in PII_PATTERNS.items()
    )
    red_expr = "text"
    for kind, pat in PII_PATTERNS.items():
        red_expr = f"regexp_replace({red_expr}, '{pat}', '<{kind}>', 'g')"
    oracle = con.execute(
        f"SELECT doc_id, {count_cols}, {red_expr} AS red "
        "FROM docs ORDER BY doc_id"
    ).fetchdf()

    for kind in PII_PATTERNS:
        col = f"n_{kind}"
        mism = [
            (int(d), int(a), int(b), rows[int(d)][1])
            for d, a, b in zip(got["doc_id"], got[col], oracle[col])
            if int(a) != int(b)
        ]
        assert not mism, f"{col} diverges between engines: {mism[:3]}"
    red_mism = [
        (int(d), a, b)
        for d, a, b in zip(got["doc_id"], got["red"], oracle["red"])
        if a != b
    ]
    assert not red_mism, f"redaction diverges: {red_mism[:2]}"


def test_strip_html_matches_duckdb(spark):
    # r4: the strip_html chain must be regex-portable like the PII
    # patterns — adversarial markup fragments, same strings both engines
    from pydala_spark.operators.scrub import strip_html
    from pydala_spark.queries.merged import _strip_html_sql

    frags = [
        "<p>plain</p>", "<SCRIPT>var x='</p>';</SCRIPT>", "<script src=\"x\">a</script>",
        "<style media=all>p{}</style>", "<!-- <b>nested?</b> -->", "un<closed",
        "a > b < c", "<br/>", "<  not-a-tag", "&amp;lt; &lt; &amp;amp;",
        "&nbsp;&nbsp;", "text <i>in</i>between", "<div\nclass='x'>multi\nline</div>",
        "<p><p><p>", "&#39;quoted&#39;", "&quot;&quot;", "trailing <", "<>",
        "<script>unterminated", "mixed <B>CASE</B> tags",
    ]
    rng = random.Random(11)
    rows = [
        (i, " ".join(rng.choice(frags) for _ in range(rng.randint(1, 5))))
        for i in range(100)
    ]
    sdf = spark.createDataFrame(rows, "doc_id long, text string")
    got = (
        sdf.select("doc_id", strip_html("text").alias("clean"))
        .orderBy("doc_id")
        .toPandas()
    )
    con = duckdb.connect()
    con.register("docs", pd.DataFrame(rows, columns=["doc_id", "text"]))
    oracle = con.execute(
        f"SELECT doc_id, {_strip_html_sql('text')} AS clean "
        "FROM docs ORDER BY doc_id"
    ).df()
    assert list(got["clean"]) == list(oracle["clean"])


def test_unicode_fingerprint_tokens_match_duckdb(spark):
    """Round 5: the Unicode normalize/tokenize stack must be engine-
    portable — same fingerprints and token counts in Spark (Java regex
    + full Unicode lower) and DuckDB (RE2 + simple lower). The Σ/İ
    translate pre-fold exists exactly for this: Java's context-
    sensitive final-sigma rule and the İ → i+combining-dot expansion
    are the two places the engines' lower() disagree (found by this
    fuzz, fixed by CASE_FOLD_SRC)."""
    import duckdb as _duckdb

    from pydala_spark.operators.textstats import fingerprint, word_regex_tokens
    from pydala_spark.queries.ext import _WORD_SPLIT_SQL, _norm_sql

    edge = "İıßΣσςǅǈŉﬀﬁ"
    scripts = "abcXYZ012 привет ПРИВЕТ 你好日本語한국مرحباहिन्दीΕλλάδα"
    punct = "!?.,—«»'\"()[]{}\t\n  ~@#$%^&*"
    alphabet = edge + scripts + punct
    rng = random.Random(11)
    cases = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 40)))
        for _ in range(80)
    ]
    cases += [e * 3 for e in edge]
    cases += ["ΟΔΟΣ ΚΑΛΟΣ", "İstanbul İİ", "", "   ", "!!!"]

    sdf = spark.createDataFrame(
        [(i, t) for i, t in enumerate(cases)], "i long, t string"
    )
    got = {
        r["i"]: (r["fp"], r["nt"])
        for r in sdf.select(
            "i",
            fingerprint("t").alias("fp"),
            F.size(word_regex_tokens("t")).alias("nt"),
        ).collect()
    }
    con = _duckdb.connect()
    split_sql = _WORD_SPLIT_SQL.replace("(text", "(t")
    for i, t in enumerate(cases):
        fp, nt = con.execute(
            f"SELECT md5(nullif({_norm_sql('t')}, '')), len({split_sql}) "
            "FROM (SELECT ? AS t)",
            [t],
        ).fetchone()
        assert got[i] == (fp, nt), f"case {i}: {t[:40]!r}"
