"""PII / URL scrubbing operators for LLM-pipeline data prep (north-star
extension, BASELINE.json — the reference has no scrubbing surface; this
mirrors the standard public pipeline steps from C4 / Dolma / RefinedWeb:
detect + redact contact info, extract URLs, drop blocklisted hosts).

Everything is built-in-function Column algebra (JVM regex inside
whole-stage codegen, no Python UDFs), so detection/redaction runs at
full scan speed over 100 TB. The patterns deliberately use only syntax
shared by Java regex and RE2 (no lookaround, no backreferences) so the
same pattern is oracle-checkable in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Detection patterns, in REDACTION ORDER. Order matters: URLs first
#: (an URL may embed digits/dots an IP pattern would half-match), then
#: emails, then the purely numeric shapes. Portable across Java regex /
#: RE2 / DuckDB.
PII_PATTERNS: dict[str, str] = {
    "url": r"https?://[A-Za-z0-9./_%?=&#:+~-]+",
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
    "phone": r"\+\d{1,2}[ -]\d{3}[ -]\d{3}[ -]\d{4}",
}


def _text(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


def pii_counts(col: str | Column, kinds: list[str] | None = None) -> dict[str, Column]:
    """Per-kind match-count Columns over ``col`` (one
    ``size(regexp_extract_all(...))`` each — a single scan pass, all
    counts computed in the same codegen stage)."""
    kinds = list(PII_PATTERNS) if kinds is None else kinds
    c = _text(col)
    return {
        kind: F.size(F.regexp_extract_all(c, F.lit(PII_PATTERNS[kind]), F.lit(0)))
        for kind in kinds
    }


def pii_stats(
    df: DataFrame, text_col: str = "text", kinds: list[str] | None = None
) -> DataFrame:
    """Append ``n_<kind>`` match-count columns per document."""
    counts = pii_counts(text_col, kinds)
    return df.select(
        "*", *[cnt.alias(f"n_{kind}") for kind, cnt in counts.items()]
    )


def redact_pii(
    col: str | Column,
    kinds: list[str] | None = None,
    token: str = "<{kind}>",
) -> Column:
    """Redacted text Column: each detected span replaced by the kind's
    token (``<url>``, ``<email>``, ...). The replace chain runs in
    PII_PATTERNS order (URLs before the numeric shapes they may embed);
    Spark's ``regexp_replace`` is global, matching DuckDB's 'g' flag.
    """
    kinds = list(PII_PATTERNS) if kinds is None else [
        k for k in PII_PATTERNS if k in kinds  # keep canonical order
    ]
    out = _text(col)
    for kind in kinds:
        out = F.regexp_replace(out, PII_PATTERNS[kind], token.format(kind=kind))
    return out


def extract_urls(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """One row per URL occurrence: (id, url, host). Host is lowercased,
    port- and ``www.``-stripped — the join key for host-level stats and
    blocklists. Explodes via ``explode_cheaply`` so the extraction regex
    runs once per document, not once per emitted URL."""
    from pydala_spark.operators.dedup import explode_cheaply

    base = df.select(
        F.col(id_col).alias("id"),
        F.regexp_extract_all(
            _text(text_col), F.lit(PII_PATTERNS["url"]), F.lit(0)
        ).alias("__urls"),
    )
    ex = explode_cheaply(base, F.col("__urls"), "url")
    host = F.lower(F.regexp_extract(F.col("url"), r"https?://([^/:]+)", 1))
    host = F.regexp_replace(host, r"^www\.", "")
    return ex.select(F.col("id").alias(id_col), "url", host.alias("host"))


def host_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-host URL occurrence count + distinct-document count, ordered
    for inspection by the caller. ONE shuffle keyed by host (the
    distinct-doc count rides the same aggregation via a two-level
    groupBy: (host, id) partial first, so a mega-host never funnels raw
    rows into one task)."""
    urls = extract_urls(df, id_col, text_col)
    per_doc = urls.groupBy("host", F.col(id_col)).agg(F.count("*").alias("cnt"))
    return per_doc.groupBy("host").agg(
        F.sum("cnt").alias("n_urls"), F.count("*").alias("n_docs")
    )


def filter_host_blocklist(
    df: DataFrame,
    blocked_hosts: list[str] | DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Drop every document that links to ANY blocklisted host (the
    RefinedWeb / Dolma URL-filter step). The blocklist (list or a
    1-column DataFrame) is broadcast; the corpus is reduced to its
    per-doc host set and anti-joined, so the full text is never
    shuffled — at 100 TB the only movement is the doc-id semi-join
    back onto the corpus (left_anti on id, which AQE plans as a
    broadcast when the hit set is small)."""
    spark = df.sparkSession
    if isinstance(blocked_hosts, DataFrame):
        # extract_urls emits lowercased hosts — normalize the blocklist
        # the same way or mixed-case entries would silently never match
        block = blocked_hosts.toDF("host").select(F.lower("host").alias("host"))
    else:
        block = spark.createDataFrame(
            [(h.lower(),) for h in blocked_hosts], "host string"
        )
    doc_hosts = extract_urls(df, id_col, text_col).select(id_col, "host").distinct()
    hit_ids = doc_hosts.join(F.broadcast(block), "host", "left_semi").select(
        id_col
    ).distinct()
    return df.join(hit_ids, id_col, "left_anti")


#: markup-stripping patterns, in APPLICATION ORDER (script/style blocks
#: with their content first, then comments, then remaining tags). Same
#: Java-regex/RE2 portable subset as PII_PATTERNS (inline (?is) flags,
#: lazy quantifiers, no lookaround/backreferences) so the DuckDB oracle
#: runs the identical strings.
HTML_BLOCK_PATTERNS: list[str] = [
    r"(?is)<script\b[^>]*>.*?</script>",
    r"(?is)<style\b[^>]*>.*?</style>",
    r"(?s)<!--.*?-->",
]
HTML_TAG_PATTERN = r"<[^>]+>"
#: entity decode order: named/numeric entities first, bare ``&amp;``
#: LAST — so ``&amp;lt;`` single-decodes to the literal ``&lt;`` instead
#: of double-decoding to ``<`` (the standard one-pass decode contract).
HTML_ENTITIES: list[tuple[str, str]] = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
]


def strip_html(
    col: str | Column,
    collapse_whitespace: bool = True,
    preserve_newlines: bool = False,
) -> Column:
    """HTML/markup to plain text — the first step of every web-corpus
    pipeline (C4/RefinedWeb strip markup before any quality signal):
    script/style blocks go WITH their content, comments go, remaining
    tags become spaces (so ``a</p><p>b`` doesn't fuse into ``ab``), the
    six ubiquitous entities decode (one pass, ``&amp;`` last), and
    whitespace collapses. Pure JVM regex column algebra in one codegen
    stage — no Python, no shuffle, full scan speed at 100 TB.

    ``preserve_newlines=True`` collapses only HORIZONTAL whitespace and
    keeps (deduplicated) line breaks — required when line-structured
    stages follow (``dedup_paragraphs``: the default full collapse would
    fuse each document into one line and silently neuter paragraph
    dedup, r4 review)."""
    c = _text(col)
    for pat in HTML_BLOCK_PATTERNS:
        c = F.regexp_replace(c, pat, " ")
    c = F.regexp_replace(c, HTML_TAG_PATTERN, " ")
    for ent, ch in HTML_ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(ch))
    if collapse_whitespace:
        if preserve_newlines:
            c = F.regexp_replace(c, r"[^\S\n]+", " ")  # horizontal only
            c = F.regexp_replace(c, r" ?\n ?", "\n")
            c = F.trim(F.regexp_replace(c, r"\n+", "\n"))
        else:
            c = F.trim(F.regexp_replace(c, r"\s+", " "))
    return c
