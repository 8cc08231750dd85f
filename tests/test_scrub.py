"""PII/URL scrubbing + tf-idf keyword extraction (north-star pipeline
operators; no reference counterpart — public C4/Dolma/RefinedWeb steps)."""

from pydala_spark.operators.scrub import (
    PII_PATTERNS,
    extract_urls,
    filter_host_blocklist,
    host_stats,
    pii_stats,
    redact_pii,
)
from pydala_spark.operators.textstats import tfidf_top_terms

from pyspark.sql import functions as F

_DOCS = [
    (1, "mail me at jo.doe+x@corp.example.com or visit https://www.Site-A.com/x?q=1"),
    (2, "server 192.168.1.77 fell over; backup at 10.0.0.8 took +1 415-555-0100"),
    (3, "ssn 123-45-6789 leaked via http://mirror.site-b.org:8080/dump"),
    (4, "perfectly clean prose with no contact information at all"),
    (5, "two links https://site-a.com/y and https://c.example.net/z plus a@b.io"),
]


def _docs_df(spark):
    return spark.createDataFrame(_DOCS, "doc_id long, text string")


def test_pii_stats_counts(spark):
    rows = {r["doc_id"]: r for r in pii_stats(_docs_df(spark)).collect()}
    assert (rows[1]["n_email"], rows[1]["n_url"]) == (1, 1)
    assert (rows[2]["n_ipv4"], rows[2]["n_phone"]) == (2, 1)
    assert (rows[3]["n_ssn"], rows[3]["n_url"]) == (1, 1)
    assert all(
        rows[4][f"n_{k}"] == 0 for k in PII_PATTERNS
    ), "clean doc must report zero everywhere"
    assert (rows[5]["n_url"], rows[5]["n_email"]) == (2, 1)


def test_redact_pii_replaces_every_span(spark):
    red = {
        r["doc_id"]: r["red"]
        for r in _docs_df(spark).select("doc_id", redact_pii("text").alias("red")).collect()
    }
    assert red[1] == "mail me at <email> or visit <url>"
    assert red[2] == "server <ipv4> fell over; backup at <ipv4> took <phone>"
    assert red[3] == "ssn <ssn> leaked via <url>"
    assert red[4] == _DOCS[3][1]  # untouched
    # kinds subset keeps canonical order and leaves other spans alone
    only_url = {
        r["doc_id"]: r["red"]
        for r in _docs_df(spark)
        .select("doc_id", redact_pii("text", kinds=["url"]).alias("red"))
        .collect()
    }
    assert "a@b.io" in only_url[5] and "<url>" in only_url[5]


def test_extract_urls_normalizes_hosts(spark):
    urls = extract_urls(_docs_df(spark)).collect()
    by_host = {}
    for r in urls:
        by_host.setdefault(r["host"], []).append(r["doc_id"])
    # lowercased, www- and port-stripped
    assert sorted(by_host) == ["c.example.net", "mirror.site-b.org", "site-a.com"]
    assert sorted(by_host["site-a.com"]) == [1, 5]


def test_host_stats_counts(spark):
    stats = {r["host"]: (r["n_urls"], r["n_docs"])
             for r in host_stats(_docs_df(spark)).collect()}
    assert stats["site-a.com"] == (2, 2)
    assert stats["mirror.site-b.org"] == (1, 1)


def test_filter_host_blocklist(spark):
    kept = filter_host_blocklist(_docs_df(spark), ["site-a.com"])
    assert sorted(r["doc_id"] for r in kept.collect()) == [2, 3, 4]
    # the corpus side must reach the blocklist as a broadcast, and the
    # final doc filter must be an anti join — never a raw-text shuffle
    plan = kept._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" in plan


def test_tfidf_top_terms_ranking(spark):
    df = spark.createDataFrame(
        [
            (1, "apple apple banana shared shared shared"),
            (2, "banana cherry shared shared"),
            (3, "cherry cherry cherry shared"),
        ],
        "doc_id long, text string",
    )
    top = tfidf_top_terms(df, top_k=2)
    rows = {(r["doc_id"], r["rank"]): r for r in top.collect()}
    # doc 1: apple tf=2 df=1 -> salience 2.0 beats shared tf=3 df=3 -> 1.0
    assert rows[(1, 1)]["term"] == "apple" and rows[(1, 1)]["salience"] == 2.0
    assert rows[(1, 2)]["term"] == "shared"
    # doc 3: cherry tf=3 df=2 -> 1.5
    assert rows[(3, 1)]["term"] == "cherry" and rows[(3, 1)]["df"] == 2
    # doc 2: shared tf=2 df=3 -> 2/3 wins; then banana/cherry tie at
    # tf 1 df 2 -> 0.5, term asc puts banana at rank 2
    assert rows[(2, 1)]["term"] == "shared"
    assert rows[(2, 2)]["term"] == "banana"
    assert all(len([k for k in rows if k[0] == d]) == 2 for d in (1, 2, 3))


def test_tfidf_empty_doc_absent(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta"), (2, "   "), (3, "")], "doc_id long, text string"
    )
    got = tfidf_top_terms(df, top_k=1).select("doc_id").collect()
    assert sorted(r["doc_id"] for r in got) == [1]


def test_filter_host_blocklist_dataframe_mixed_case(spark):
    # r4 review: DataFrame blocklists must normalize like list ones —
    # mixed-case entries previously never matched the lowercased hosts
    block = spark.createDataFrame([("Site-A.com",)], "host string")
    kept = filter_host_blocklist(_docs_df(spark), block)
    assert sorted(r["doc_id"] for r in kept.collect()) == [2, 3, 4]


def test_strip_html(spark):
    # r4: markup -> text. Script/style lose their CONTENT, tags become
    # separators (no word fusion), entities single-decode (&amp;lt; stays
    # a literal &lt;), whitespace collapses.
    from pydala_spark.operators.scrub import strip_html

    src = (
        '<p>Hello</p><p>world</p>'
        '<script type="text/javascript">var x = 1;</script>'
        "<style>p{color:red}</style>"
        "<!-- secret -->"
        "<b>bold</b> &lt;tag&gt; &quot;q&quot; &#39;s&#39;&nbsp;"
        "&amp;nbsp; end"
    )
    df = spark.createDataFrame([(src,)], ["text"])
    out = df.select(strip_html("text").alias("clean")).first()["clean"]
    assert out == 'Hello world bold <tag> "q" \'s\' &nbsp; end'
    assert "var x" not in out and "color" not in out and "secret" not in out
    raw = df.select(
        strip_html("text", collapse_whitespace=False).alias("c")
    ).first()["c"]
    assert "Hello" in raw and "  " in raw  # tags became spaces, uncollapsed
