"""Consolidated function-family queries (SURVEY §2.5-2.7).

Round 1 declared each scalar/collection/set-op family as its own query;
the correctness driver records only the first ~50 registry entries, so
round 2 folds the single-family demos into tagged multi-family queries.
Each merged query still exercises every original operator — the branches
are unioned under a ``family`` tag with NULL-padded columns, so the
DuckDB oracle stays value-exact per family.

Exactness note for the padding: a BIGINT/INT column that is NULL in any
branch arrives in pandas as float64 (NaN) from BOTH engines (verified),
so the canonical-string compare still matches; strings pad to None
("NULL") identically.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pydala_spark.queries.core import (
    _dsum_str,
    _rev,
    _sql_dsum_str,
    _REV,
)
from pydala_spark.sources import load_table, spread_scan


def _tagged_union(parts: list[tuple[str, DataFrame]]) -> DataFrame:
    """Union heterogeneous family results under a ``family`` tag.

    The output schema is the first-appearance-ordered superset of all
    branch columns; absent columns are NULL-padded with the dtype of the
    branch that defines them (so unionByName never coerces).

    The pad-select is GENERATED SQL via ``selectExpr`` (round 16, guide
    §7.3): the Column spelling made 3+ py4j round trips per padded
    column per branch — ~0.3-0.7 s of driver build time per tag-union
    query (profiled) for identical expressions. ``CAST(NULL AS
    <dataType.simpleString()>)`` is the same null-literal cast the
    Column path produced.
    """
    from pydala_spark.operators.textstats import _sql_ident, _sql_str

    fields: dict[str, object] = {}
    for _, df in parts:
        for f in df.schema.fields:
            fields.setdefault(f.name, f.dataType)
    out = None
    for fam, df in parts:
        have = set(df.columns)
        sel = df.selectExpr(
            f"{_sql_str(fam)} AS family",
            *[
                (
                    _sql_ident(n)
                    if n in have
                    else f"CAST(NULL AS {dt.simpleString()}) AS {_sql_ident(n)}"
                )
                for n, dt in fields.items()
            ],
        )
        out = sel if out is None else out.unionByName(sel)
    return out


# ---------------------------------------------------------------------------
# scalar families: date parts + math + conditional (F5)


def q_scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-part, math, CASE/COALESCE/NULLIF, string and regexp scalar
    families in one tag-union (round-2 consolidation of round 1's
    q_scalar_functions + q_string_regexp_functions, freeing a registry
    slot inside the driver's correctness window)."""
    orders = load_table(spark, sf_dir, "orders")
    date = (
        orders.groupBy(
            F.year("o_orderdate").alias("y"),
            F.quarter("o_orderdate").alias("q"),
            F.month("o_orderdate").alias("m"),
        )
        .agg(
            F.count("*").alias("n"),
            F.min(F.dayofmonth("o_orderdate")).alias("min_dom"),
            F.max(F.dayofyear("o_orderdate")).alias("max_doy"),
        )
    )
    supp = load_table(spark, sf_dir, "supplier")
    math = supp.select(
        "s_suppkey",
        F.abs("s_acctbal").alias("abs_bal"),
        F.ceil("s_acctbal").alias("ceil_bal"),
        F.floor("s_acctbal").alias("floor_bal"),
        F.sqrt(F.abs("s_acctbal")).alias("sqrt_bal"),
        (F.col("s_suppkey") % 7).alias("mod7"),
        F.pow(F.lit(2.0), (F.col("s_suppkey") % 10)).alias("pow2"),
        F.greatest("s_acctbal", F.lit(0.0)).alias("pos_bal"),
    )
    status = F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("P")), F.lit("PENDING"))
    band = (
        F.when(F.col("o_totalprice") < 50000, "small")
        .when(F.col("o_totalprice") < 200000, "medium")
        .otherwise("large")
    )
    cond = orders.groupBy(status.alias("status"), band.alias("band")).agg(
        F.count("*").alias("n")
    )
    cust = load_table(spark, sf_dir, "customer").where(F.col("c_name").like("%1%"))
    string = cust.select(
        "c_custkey",
        F.upper("c_name").alias("upper_name"),
        F.length("c_name").cast("long").alias("name_len"),
        F.substring("c_name", 1, 8).alias("prefix"),
        F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias("padded_key"),
        F.replace(F.col("c_name"), F.lit("Customer"), F.lit("Cust")).alias("short_name"),
        F.concat_ws("-", F.col("c_mktsegment"), F.col("c_custkey").cast("string")).alias(
            "seg_key"
        ),
    )
    part = load_table(spark, sf_dir, "part")
    regexp = (
        part.where(F.col("p_name").rlike(r"^[a-z]+ [a-z]+$"))
        .groupBy(F.regexp_extract("p_name", r"^([a-z]+)", 1).alias("first_word"))
        .agg(F.count("*").alias("n"), F.countDistinct("p_brand").alias("n_brands"))
    )
    return _tagged_union(
        [("date", date), ("math", math), ("cond", cond), ("string", string), ("regexp", regexp)]
    )


_NULLS_MATH = """CAST(NULL AS BIGINT) AS s_suppkey, CAST(NULL AS DOUBLE) AS abs_bal,
  CAST(NULL AS BIGINT) AS ceil_bal, CAST(NULL AS BIGINT) AS floor_bal,
  CAST(NULL AS DOUBLE) AS sqrt_bal, CAST(NULL AS BIGINT) AS mod7,
  CAST(NULL AS DOUBLE) AS pow2, CAST(NULL AS DOUBLE) AS pos_bal"""

_NULLS_STRING = """CAST(NULL AS BIGINT) AS c_custkey, CAST(NULL AS VARCHAR) AS upper_name,
  CAST(NULL AS BIGINT) AS name_len, CAST(NULL AS VARCHAR) AS prefix,
  CAST(NULL AS VARCHAR) AS padded_key, CAST(NULL AS VARCHAR) AS short_name,
  CAST(NULL AS VARCHAR) AS seg_key"""

_NULLS_REGEXP = """CAST(NULL AS VARCHAR) AS first_word, CAST(NULL AS BIGINT) AS n_brands"""

_Q_SCALAR_SQL = f"""
SELECT 'date' AS family, CAST(YEAR(o_orderdate) AS INT) AS y,
  CAST(QUARTER(o_orderdate) AS INT) AS q, CAST(MONTH(o_orderdate) AS INT) AS m,
  COUNT(*) AS n, CAST(MIN(DAYOFMONTH(o_orderdate)) AS INT) AS min_dom,
  CAST(MAX(DAYOFYEAR(o_orderdate)) AS INT) AS max_doy,
  {_NULLS_MATH},
  CAST(NULL AS VARCHAR) AS status, CAST(NULL AS VARCHAR) AS band,
  {_NULLS_STRING}, {_NULLS_REGEXP}
FROM orders GROUP BY 2, 3, 4
UNION ALL
SELECT 'math', CAST(NULL AS INT), CAST(NULL AS INT), CAST(NULL AS INT),
  CAST(NULL AS BIGINT), CAST(NULL AS INT), CAST(NULL AS INT),
  s_suppkey, ABS(s_acctbal), CAST(CEIL(s_acctbal) AS BIGINT),
  CAST(FLOOR(s_acctbal) AS BIGINT), SQRT(ABS(s_acctbal)), s_suppkey % 7,
  POW(2.0, s_suppkey % 10), GREATEST(s_acctbal, 0.0),
  CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
  {_NULLS_STRING}, {_NULLS_REGEXP}
FROM supplier
UNION ALL
SELECT 'cond', CAST(NULL AS INT), CAST(NULL AS INT), CAST(NULL AS INT),
  COUNT(*), CAST(NULL AS INT), CAST(NULL AS INT),
  {_NULLS_MATH},
  COALESCE(NULLIF(o_orderstatus, 'P'), 'PENDING'),
  CASE WHEN o_totalprice < 50000 THEN 'small'
       WHEN o_totalprice < 200000 THEN 'medium' ELSE 'large' END,
  {_NULLS_STRING}, {_NULLS_REGEXP}
FROM orders GROUP BY 16, 17
UNION ALL
SELECT 'string', CAST(NULL AS INT), CAST(NULL AS INT), CAST(NULL AS INT),
  CAST(NULL AS BIGINT), CAST(NULL AS INT), CAST(NULL AS INT),
  {_NULLS_MATH},
  CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
  c_custkey, UPPER(c_name), LENGTH(c_name), SUBSTRING(c_name, 1, 8),
  LPAD(CAST(c_custkey AS VARCHAR), 8, '0'),
  REPLACE(c_name, 'Customer', 'Cust'),
  CONCAT_WS('-', c_mktsegment, CAST(c_custkey AS VARCHAR)),
  {_NULLS_REGEXP}
FROM customer WHERE c_name LIKE '%1%'
UNION ALL
SELECT 'regexp', CAST(NULL AS INT), CAST(NULL AS INT), CAST(NULL AS INT),
  COUNT(*), CAST(NULL AS INT), CAST(NULL AS INT),
  {_NULLS_MATH},
  CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
  {_NULLS_STRING},
  regexp_extract(p_name, '^([a-z]+)', 1) AS first_word,
  COUNT(DISTINCT p_brand) AS n_brands
FROM part WHERE regexp_matches(p_name, '^[a-z]+ [a-z]+$')
GROUP BY regexp_extract(p_name, '^([a-z]+)', 1)
"""


# ---------------------------------------------------------------------------
# string + regexp families (F5)


# ---------------------------------------------------------------------------
# collection families: array + map + JSON (F5)


#: planted mixed-script docs for the ``unitok`` family (one list feeds
#: both engines); no quotes/backslashes in the texts (VALUES literals)
_UNITOK_DOCS: list[tuple[int, str]] = [
    (9101, "plain english words here"),
    (9102, "今日は良い天気ですね"),
    (9103, "mixed 中文 text 混合もじ with 한글"),
    (9104, "   "),
]

from pydala_spark.operators.textstats import CJK_CHAR_CLASS as _CJK_CLS  # noqa: E402

_UNITOK_VALUES = ", ".join(f"({i}, '{t}')" for i, t in _UNITOK_DOCS)


def q_collection_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array, map and JSON-extraction families, tag-unioned."""
    from pydala_spark.operators.textstats import word_regex_tokens

    docs = load_table(spark, sf_dir, "documents")
    toks = word_regex_tokens("text")
    arr = docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        # int, not boolean: a NULL-padded bool column canonicalizes as
        # None in Spark's toPandas but NaN in DuckDB's -> value mismatch
        F.array_contains(toks, "spark").cast("int").alias("has_spark"),
        F.array_join(F.slice(F.array_sort(F.array_distinct(toks)), 1, 5), " ").alias(
            "first5_sorted"
        ),
    )
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") < 100)
    m = F.create_map(
        F.lit("qty"), F.col("l_quantity"), F.lit("price"), F.col("l_extendedprice")
    )
    maps = li.select(
        "l_orderkey",
        "l_linenumber",
        F.element_at(m, "qty").alias("qty_val"),
        F.size(m).alias("m_size"),
        F.array_join(F.map_keys(m), ",").alias("m_keys"),
    )
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    js = ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(k.cast("decimal(25,0)")).cast("double").alias("sum_k"),
        (F.sum(k.cast("decimal(25,0)")).cast("double") / F.count("*")).alias("avg_k"),
    )
    # round 3: overlapping token-window document chunking (the
    # embed/train preprocessing step) as a fourth family
    from pydala_spark.operators.textstats import chunk_documents

    chunks = chunk_documents(
        docs.where(F.col("doc_id") < 50), chunk_tokens=32, overlap=4
    ).select(
        "doc_id", "chunk_id",
        F.col("n_chunk_tokens").cast("long").alias("n_tokens"),
        "chunk_text",
    )
    # html family (round 4): plant deterministic markup around each doc
    # (same concat in the oracle) and run the REAL strip_html chain over
    # it — tag count + md5 of the cleaned text pin the full output
    from pydala_spark.operators.scrub import HTML_TAG_PATTERN, strip_html

    did = F.col("doc_id")
    html_src = F.concat(
        F.lit("<p>"), F.col("text"),
        F.lit('</p><script type="text/javascript">var x = '),
        did.cast("string"),
        F.lit(";</script><!-- note --><style>p{color:red}</style><b>bold"
              "</b> &lt;tag&gt; &quot;q&quot; &#39;s&#39;&nbsp;&amp;nbsp; end"),
    )
    html = docs.where(did < 50).select(
        "doc_id",
        F.size(F.regexp_extract_all(html_src, F.lit(HTML_TAG_PATTERN), F.lit(0)))
        .cast("long")
        .alias("n_html_tags"),
        F.md5(strip_html(html_src)).alias("html_md5"),
    )
    # unitok family (round 5): multilingual token counting — planted
    # mixed-script docs pin that CJK/kana/Hangul characters count
    # individually (whitespace counting prices a Chinese clause at ONE
    # token) while plain text counts by whitespace, both engines
    from pydala_spark.operators.textstats import (
        token_count,
        token_count_multilingual,
    )

    uni_src = spark.createDataFrame(
        _UNITOK_DOCS, "doc_id bigint, text string"
    )
    unitok = uni_src.select(
        "doc_id",
        token_count("text").cast("long").alias("n_tokens"),
        token_count_multilingual("text").cast("long").alias("n_tokens_multi"),
    )
    return _tagged_union(
        [("array", arr), ("map", maps), ("json", js), ("chunk", chunks),
         ("html", html), ("unitok", unitok)]
    )


from pydala_spark.queries.ext import _WORD_SPLIT_SQL as _WORD_SPLIT  # noqa: E402
# (one shared DuckDB tokenization expression — it must mirror
# operators/textstats.word_regex_tokens for EVERY text oracle)


def _strip_html_sql(expr: str) -> str:
    """DuckDB expression mirroring scrub.strip_html exactly: the SAME
    pattern strings (portable regex subset) applied in the SAME order."""
    from pydala_spark.operators.scrub import (
        HTML_BLOCK_PATTERNS,
        HTML_ENTITIES,
        HTML_TAG_PATTERN,
    )

    out = expr
    for pat in HTML_BLOCK_PATTERNS:
        out = f"regexp_replace({out}, '{pat}', ' ', 'g')"
    out = f"regexp_replace({out}, '{HTML_TAG_PATTERN}', ' ', 'g')"
    for ent, ch in HTML_ENTITIES:
        out = f"replace({out}, '{ent}', '{ch.replace(chr(39), chr(39) * 2)}')"
    return f"TRIM(regexp_replace({out}, '\\s+', ' ', 'g'))"


_HTML_SRC_SQL = (
    "'<p>' || text || '</p><script type=\"text/javascript\">var x = ' || doc_id"
    " || ';</script><!-- note --><style>p{color:red}</style><b>bold"
    "</b> &lt;tag&gt; &quot;q&quot; &#39;s&#39;&nbsp;&amp;nbsp; end'"
)

from pydala_spark.operators.scrub import HTML_TAG_PATTERN as _HTML_TAG  # noqa: E402
_STRIP_HTML_SRC = _strip_html_sql('src')

_Q_COLLECTION_SQL = f"""
SELECT 'array' AS family, doc_id, LEN(t) AS n_tokens,
  CAST(list_contains(t, 'spark') AS INT) AS has_spark,
  array_to_string(list_sort(list_distinct(t))[1:5], ' ') AS first5_sorted,
  CAST(NULL AS BIGINT) AS l_orderkey, CAST(NULL AS INT) AS l_linenumber,
  CAST(NULL AS DOUBLE) AS qty_val, CAST(NULL AS INT) AS m_size,
  CAST(NULL AS VARCHAR) AS m_keys, CAST(NULL AS VARCHAR) AS event_type,
  CAST(NULL AS BIGINT) AS n, CAST(NULL AS DOUBLE) AS sum_k,
  CAST(NULL AS DOUBLE) AS avg_k,
  CAST(NULL AS BIGINT) AS chunk_id, CAST(NULL AS VARCHAR) AS chunk_text,
  CAST(NULL AS BIGINT) AS n_html_tags, CAST(NULL AS VARCHAR) AS html_md5,
  CAST(NULL AS BIGINT) AS n_tokens_multi
FROM (SELECT doc_id, {_WORD_SPLIT} AS t FROM documents)
UNION ALL
SELECT 'map', CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS INT),
  CAST(NULL AS VARCHAR), l_orderkey, l_linenumber,
  map_extract(map(['qty','price'], [l_quantity, l_extendedprice]), 'qty')[1],
  CAST(cardinality(map(['qty','price'], [l_quantity, l_extendedprice])) AS INT),
  array_to_string(map_keys(map(['qty','price'], [l_quantity, l_extendedprice])), ','),
  CAST(NULL AS VARCHAR), CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE),
  CAST(NULL AS DOUBLE),
  CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR),
  CAST(NULL AS BIGINT) AS n_html_tags, CAST(NULL AS VARCHAR) AS html_md5,
  CAST(NULL AS BIGINT) AS n_tokens_multi
FROM lineitem WHERE l_orderkey < 100
UNION ALL
SELECT 'json', CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS INT),
  CAST(NULL AS VARCHAR), CAST(NULL AS BIGINT), CAST(NULL AS INT),
  CAST(NULL AS DOUBLE), CAST(NULL AS INT), CAST(NULL AS VARCHAR),
  event_type, COUNT(*),
  CAST(SUM(CAST(CAST(props->>'$.k' AS INTEGER) AS DECIMAL(25,0))) AS DOUBLE),
  CAST(SUM(CAST(CAST(props->>'$.k' AS INTEGER) AS DECIMAL(25,0))) AS DOUBLE) / COUNT(*),
  CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR),
  CAST(NULL AS BIGINT) AS n_html_tags, CAST(NULL AS VARCHAR) AS html_md5,
  CAST(NULL AS BIGINT) AS n_tokens_multi
FROM events GROUP BY event_type
UNION ALL
SELECT 'chunk', doc_id, LEN(t[st : st + 31]) AS n_tokens,
  CAST(NULL AS INT), CAST(NULL AS VARCHAR),
  CAST(NULL AS BIGINT), CAST(NULL AS INT),
  CAST(NULL AS DOUBLE), CAST(NULL AS INT), CAST(NULL AS VARCHAR),
  CAST(NULL AS VARCHAR), CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE),
  CAST(NULL AS DOUBLE),
  CAST((st - 1) // 28 AS BIGINT) AS chunk_id,
  array_to_string(t[st : st + 31], ' ') AS chunk_text,
  CAST(NULL AS BIGINT) AS n_html_tags, CAST(NULL AS VARCHAR) AS html_md5,
  CAST(NULL AS BIGINT) AS n_tokens_multi
FROM (
  SELECT doc_id, t, unnest(range(1, LEN(t) + 1, 28)) AS st
  FROM (SELECT doc_id, {_WORD_SPLIT} AS t FROM documents WHERE doc_id < 50)
)
WHERE st = 1 OR LEN(t) >= st + 4
UNION ALL
SELECT 'html', doc_id, CAST(NULL AS BIGINT), CAST(NULL AS INT),
  CAST(NULL AS VARCHAR), CAST(NULL AS BIGINT), CAST(NULL AS INT),
  CAST(NULL AS DOUBLE), CAST(NULL AS INT), CAST(NULL AS VARCHAR),
  CAST(NULL AS VARCHAR), CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE),
  CAST(NULL AS DOUBLE),
  CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR),
  LEN(regexp_extract_all(src, '{_HTML_TAG}')) AS n_html_tags,
  MD5({_STRIP_HTML_SRC}) AS html_md5,
  CAST(NULL AS BIGINT) AS n_tokens_multi
FROM (SELECT doc_id, {_HTML_SRC_SQL} AS src FROM documents WHERE doc_id < 50)
UNION ALL
SELECT 'unitok', doc_id,
  LEN(list_filter(string_split_regex(TRIM(text), '\\s+'), x -> x <> '')),
  CAST(NULL AS INT), CAST(NULL AS VARCHAR),
  CAST(NULL AS BIGINT), CAST(NULL AS INT),
  CAST(NULL AS DOUBLE), CAST(NULL AS INT), CAST(NULL AS VARCHAR),
  CAST(NULL AS VARCHAR), CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE),
  CAST(NULL AS DOUBLE),
  CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR),
  CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR),
  LEN(list_filter(string_split_regex(
        TRIM(regexp_replace(text, '{_CJK_CLS}', ' ', 'g')), '\\s+'),
      x -> x <> ''))
    + LEN(regexp_extract_all(text, '{_CJK_CLS}')) AS n_tokens_multi
FROM (VALUES {_UNITOK_VALUES}) u(doc_id, text)
"""


# ---------------------------------------------------------------------------
# grouping analytics: ROLLUP + CUBE + GROUPING SETS (A5)


def q_grouping_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP, CUBE and explicit GROUPING SETS over the same keys, plus
    the conditional-agg pivot and unpivot+re-agg families (round-2
    consolidation of q_pivot_unpivot, freeing a registry slot)."""
    li = load_table(spark, sf_dir, "lineitem")
    rollup = li.rollup("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"), _dsum_str(_rev()).alias("revenue")
    )
    cube = li.cube("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"), _dsum_str(_rev()).alias("revenue")
    )
    # native grouping sets (pyspark 4.x) — no session-global temp view
    gsets = (
        li.groupingSets(
            [["l_returnflag"], ["l_linestatus"]], "l_returnflag", "l_linestatus"
        )
        .agg(
            F.grouping("l_returnflag").cast("bigint").alias("g_flag"),
            F.grouping("l_linestatus").cast("bigint").alias("g_status"),
            F.count("*").alias("n"),
        )
    )
    orders = load_table(spark, sf_dir, "orders")

    def tot(status: str):
        return F.sum(
            F.when(F.col("o_orderstatus") == status, F.col("o_totalprice"))
            .otherwise(F.lit(0))
            .cast("decimal(25,4)")
        ).cast("double")

    pivot = orders.groupBy("o_orderpriority").agg(
        tot("O").alias("open_total"),
        tot("F").alias("filled_total"),
        tot("P").alias("partial_total"),
        F.count("*").alias("n"),
    )
    long = li.unpivot(["l_returnflag"], ["l_quantity", "l_discount"], "metric", "val")
    unpivot = long.groupBy("l_returnflag", "metric").agg(
        F.sum(F.col("val").cast("decimal(25,6)")).cast("double").alias("total"),
        F.count("*").alias("n"),
    )
    return _tagged_union(
        [("rollup", rollup), ("cube", cube), ("gsets", gsets),
         ("pivot", pivot), ("unpivot", unpivot)]
    )


_NULLS_PIVOT = """CAST(NULL AS VARCHAR) AS o_orderpriority,
  CAST(NULL AS DOUBLE) AS open_total, CAST(NULL AS DOUBLE) AS filled_total,
  CAST(NULL AS DOUBLE) AS partial_total"""

_NULLS_UNPIVOT = """CAST(NULL AS VARCHAR) AS metric, CAST(NULL AS DOUBLE) AS total"""

_Q_GROUPING_SQL = f"""
SELECT 'rollup' AS family, l_returnflag, l_linestatus, COUNT(*) AS n,
  {_sql_dsum_str(_REV)} AS revenue,
  CAST(NULL AS BIGINT) AS g_flag, CAST(NULL AS BIGINT) AS g_status,
  {_NULLS_PIVOT}, {_NULLS_UNPIVOT}
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
UNION ALL
SELECT 'cube', l_returnflag, l_linestatus, COUNT(*), {_sql_dsum_str(_REV)},
  CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
  {_NULLS_PIVOT}, {_NULLS_UNPIVOT}
FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
UNION ALL
SELECT 'gsets', l_returnflag, l_linestatus, COUNT(*), CAST(NULL AS VARCHAR),
  CAST(GROUPING(l_returnflag) AS BIGINT), CAST(GROUPING(l_linestatus) AS BIGINT),
  {_NULLS_PIVOT}, {_NULLS_UNPIVOT}
FROM lineitem GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
UNION ALL
SELECT 'pivot', CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), COUNT(*),
  CAST(NULL AS VARCHAR), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
  o_orderpriority,
  CAST(SUM(CAST(CASE WHEN o_orderstatus='O' THEN o_totalprice ELSE 0 END AS DECIMAL(25,4))) AS DOUBLE),
  CAST(SUM(CAST(CASE WHEN o_orderstatus='F' THEN o_totalprice ELSE 0 END AS DECIMAL(25,4))) AS DOUBLE),
  CAST(SUM(CAST(CASE WHEN o_orderstatus='P' THEN o_totalprice ELSE 0 END AS DECIMAL(25,4))) AS DOUBLE),
  {_NULLS_UNPIVOT}
FROM orders GROUP BY o_orderpriority
UNION ALL
SELECT 'unpivot', l_returnflag, CAST(NULL AS VARCHAR), COUNT(*),
  CAST(NULL AS VARCHAR), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
  {_NULLS_PIVOT},
  metric, CAST(SUM(CAST(val AS DECIMAL(25,6))) AS DOUBLE)
FROM (
  SELECT l_returnflag, 'l_quantity' AS metric, l_quantity AS val FROM lineitem
  UNION ALL
  SELECT l_returnflag, 'l_discount' AS metric, l_discount AS val FROM lineitem
) GROUP BY l_returnflag, metric
"""


# ---------------------------------------------------------------------------
# subqueries: IN-subquery (semi join) + scalar subquery (J4)


def q_subqueries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subquery (left-semi) + scalar-subquery comparison + the
    TPC-H-q21-shaped multi-way correlated EXISTS / NOT EXISTS
    self-join (round 11, VERDICT r10 #4 — the delegated-SQL join shape
    that had no CORRECTNESS row; reference passthrough
    reference/src/pydala/dataset/reader.py:478-484), plus two more
    delegated correlated-subquery shapes (round 11): ``corr_min`` —
    TPC-H-q02-shaped correlated scalar MIN, decorrelated into a
    per-key MIN joined back; ``anti_avg`` — TPC-H-q22-shaped scalar
    average + NOT EXISTS anti-join; ``not_in`` — TPC-H-q16-shaped
    NOT IN exclusion + COUNT(DISTINCT); ``scalar_max`` —
    TPC-H-q15-shaped scalar MAX over an aggregated derived table;
    ``having_frac`` — TPC-H-q11-shaped per-key aggregate HAVING > a
    scalar subquery over the global base (2.0× the average per-part
    value — the scale-free spelling of q11's sum×fraction; round 12);
    ``nested_in`` — TPC-H-q20-shaped nested IN + correlated scalar
    half-sum, the deepest nesting on the delegated surface (round 12).
    All tag-unioned.

    The q21 family ("exists"): suppliers in two nations whose line was
    the ONLY late one (shipped > 45 days after an F-status order was
    placed) on a multi-supplier order. Spark-first shape: the late-line
    frame is computed once and drives BOTH correlated quantifiers — a
    left-semi join (EXISTS another supplier on the order) and a
    left-anti join (NOT EXISTS another supplier late on the order),
    both shuffling on the same l_orderkey key so AQE reuses the
    exchange; supplier/nation are broadcast dims."""
    cust = load_table(spark, sf_dir, "customer")
    big = load_table(spark, sf_dir, "orders").where(F.col("o_totalprice") > 400000)
    insub = cust.join(big, cust.c_custkey == big.o_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_mktsegment"
    )
    mean = cust.agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(25,4)")).cast("double") / F.count("*")
        ).alias("mean_bal")
    )
    scalar = (
        cust.crossJoin(F.broadcast(mean))
        .where(F.col("c_acctbal") > F.col("mean_bal"))
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_above"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    o_f = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    late = (
        li.select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(o_f, F.col("l_orderkey") == F.col("o_orderkey"))
        .where(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 45 DAYS"))
        .select("l_orderkey", "l_suppkey")
    )
    l2 = li.select(
        F.col("l_orderkey").alias("o2"), F.col("l_suppkey").alias("s2")
    )
    l3 = late.select(
        F.col("l_orderkey").alias("o3"), F.col("l_suppkey").alias("s3")
    )
    waiters = late.join(
        l2, (F.col("l_orderkey") == F.col("o2")) & (F.col("l_suppkey") != F.col("s2")),
        "left_semi",
    ).join(
        l3, (F.col("l_orderkey") == F.col("o3")) & (F.col("l_suppkey") != F.col("s3")),
        "left_anti",
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    nat = load_table(spark, sf_dir, "nation").where(
        F.col("n_name").isin("NATION_3", "NATION_7")
    )
    exists = (
        waiters.join(
            F.broadcast(
                supp.join(
                    F.broadcast(nat),
                    supp.s_nationkey == nat.n_nationkey,
                )
            ),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )
    # TPC-H-q02-shaped correlated scalar MIN (round 11): for every
    # size-1 part, the lineitems that hit the part's minimum
    # extendedprice (the min-cost-supplier shape; testdata has no
    # partsupp, so lineitem plays its role). Spark-first: the
    # correlated `= (SELECT MIN(..) WHERE l2.l_partkey = l1.l_partkey)`
    # decorrelates into one per-part MIN aggregation joined back on the
    # key — the part filter broadcasts ahead of both consumers, so only
    # the 38 parts' lines ever shuffle. MIN of doubles is selection,
    # not arithmetic — the equality join back is bit-exact in both
    # engines.
    part1 = (
        load_table(spark, sf_dir, "part")
        .where(F.col("p_size") == 1)
        .select("p_partkey")
    )
    li_p = li.join(
        F.broadcast(part1), li.l_partkey == part1.p_partkey
    ).select("l_partkey", "l_suppkey", "l_extendedprice")
    minp = li_p.groupBy("l_partkey").agg(
        F.min("l_extendedprice").alias("min_price")
    )
    corr_min = (
        li_p.join(minp, "l_partkey")
        .where(F.col("l_extendedprice") == F.col("min_price"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.col("l_suppkey").alias("min_supp"),
            "min_price",
        )
    )
    # TPC-H-q22-shaped family (round 11): customers above the
    # positive-balance average with NOT EXISTS an urgent order,
    # per-nation count + exact-decimal balance total. The scalar
    # average broadcasts (one row); the NOT EXISTS is a left-anti
    # against the urgent-order keys (a filtered, broadcastable side).
    pos_avg = cust.where(F.col("c_acctbal") > 0).agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(25,4)")).cast("double")
            / F.count("*")
        ).alias("avg_bal")
    )
    urgent = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    anti_avg = (
        cust.crossJoin(F.broadcast(pos_avg))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(urgent, cust.c_custkey == urgent.o_custkey, "left_anti")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(
            F.count("*").alias("n_noord"),
            F.sum(F.col("c_acctbal").cast("decimal(25,4)"))
            .cast("double")
            .alias("totbal"),
        )
    )
    # TPC-H-q16-shaped family (round 11): COUNT(DISTINCT supplier) per
    # part attribute, excluding a NOT IN supplier subquery. The NOT IN
    # keys (negative-balance suppliers) are provably non-NULL, so the
    # Spark-first spelling is a plain left-anti against the filtered
    # key set; the part-attribute filter broadcasts ahead of the fact
    # scan so only qualifying parts' lines move into the distinct agg.
    part_f = (
        load_table(spark, sf_dir, "part")
        .where((F.col("p_brand") != "Brand#11") & F.col("p_size").isin(1, 2, 3))
        .select("p_partkey", "p_brand", "p_size")
    )
    bad_supp = (
        load_table(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") < 0)
        .select(F.col("s_suppkey").alias("__bad"))
    )
    not_in = (
        li.select("l_partkey", "l_suppkey")
        .join(F.broadcast(part_f), F.col("l_partkey") == F.col("p_partkey"))
        .join(bad_supp, F.col("l_suppkey") == F.col("__bad"), "left_anti")
        .groupBy("p_brand", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )
    # TPC-H-q15-shaped family (round 11): the supplier(s) achieving the
    # maximum quarterly revenue — a scalar MAX over an aggregated
    # derived table that is consumed twice (join input + subquery).
    # Exactness: the comparison runs on the exact decimal sums, the
    # output column is the decimal's canonical string (_dsum_str rule).
    rev = (
        li.where(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1996-04-01")
        )
        .groupBy("l_suppkey")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount")))
                .cast("decimal(25,6)")
            ).alias("__tr")
        )
    )
    mx = rev.agg(F.max("__tr").alias("__mx"))
    scalar_max = (
        supp.join(rev, supp.s_suppkey == rev.l_suppkey)
        .crossJoin(F.broadcast(mx))
        .where(F.col("__tr") == F.col("__mx"))
        .select(
            "s_suppkey",
            "s_name",
            F.col("__tr").cast("string").alias("total_revenue"),
        )
    )
    # TPC-H-q11-shaped family (round 12, VERDICT r11 #2): per-part
    # value sum restricted to a supplier-nation group, HAVING > a
    # scalar subquery over the global base (q11's `sum(..) * fraction`;
    # here 2.0× the average per-part value — scale-FREE, so the family
    # is non-vacuous at every test SF where q11's fixed fraction would
    # empty out as the part count grows; TPC-H itself scales the
    # fraction by 1/SF for the same reason). Spark-first decorrelation:
    # the per-part aggregate is computed ONCE and the global scalar is
    # the re-aggregation of the per-part sums (exact — decimal addition
    # is associative, and COUNT(*) over the per-part rows ==
    # COUNT(DISTINCT partkey) over the base), so the fact table is
    # scanned a single time instead of the naive twice (plan-pinned:
    # ReusedExchange); the one-row threshold broadcasts into the HAVING
    # filter. Exactness: exact decimal sums on both sides, then the
    # identical IEEE chain (cast double, ×2.0, ÷count).
    grp_supp = supp.join(
        F.broadcast(
            load_table(spark, sf_dir, "nation").where(
                F.col("n_name").isin("NATION_8", "NATION_19")
            )
        ),
        supp.s_nationkey == F.col("n_nationkey"),
    ).select(F.col("s_suppkey").alias("__gs"))
    vals = (
        li.select("l_partkey", "l_suppkey", "l_extendedprice", "l_quantity")
        .join(F.broadcast(grp_supp), F.col("l_suppkey") == F.col("__gs"), "left_semi")
        .groupBy("l_partkey")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * F.col("l_quantity")).cast(
                    "decimal(25,4)"
                )
            ).alias("__pv")
        )
    )
    gtot = vals.agg(
        (F.sum("__pv").cast("double") * F.lit(2.0) / F.count("*"))
        .alias("__thr")
    )
    having_frac = (
        vals.crossJoin(F.broadcast(gtot))
        .where(F.col("__pv").cast("double") > F.col("__thr"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.col("__pv").cast("string").alias("part_value"),
        )
    )
    # TPC-H-q20-shaped family (round 12, VERDICT r11 #2): suppliers in
    # one nation having, for some 'small%'-named part, shipped more
    # than HALF that part's total 1995 quantity — a nested IN (part
    # name prefix) wrapping a correlated scalar half-sum keyed on the
    # outer's partkey. Spark-first decorrelation: the correlated
    # `> (SELECT 0.5*SUM(..) WHERE l.l_partkey = ps.l_partkey)` becomes
    # a per-part total joined back on the key; the half is spelled
    # qty*2 > tot so the comparison stays in exact decimals. The part
    # prefix filter broadcasts ahead of ONE windowed fact scan: the
    # per-part total is the re-aggregation of the per-(supp,part)
    # sums (exact — decimal addition is associative), so AQE reuses
    # the (supp,part) shuffle instead of re-scanning the fact table,
    # and the surviving supplier keys drive a left-semi.
    small = (
        load_table(spark, sf_dir, "part")
        .where(F.col("p_name").like("small%"))
        .select("p_partkey")
    )
    li_w = (
        li.where(
            (F.col("l_shipdate") >= "1995-01-01")
            & (F.col("l_shipdate") < "1996-01-01")
        )
        .join(F.broadcast(small), li.l_partkey == small.p_partkey)
        .select(
            "l_partkey",
            "l_suppkey",
            F.col("l_quantity").cast("decimal(25,4)").alias("__q"),
        )
    )
    ps_qty = li_w.groupBy("l_suppkey", "l_partkey").agg(F.sum("__q").alias("__qty"))
    p_tot = ps_qty.groupBy("l_partkey").agg(F.sum("__qty").alias("__tot"))
    cand = (
        ps_qty.join(p_tot, "l_partkey")
        .where(F.col("__qty") * 2 > F.col("__tot"))
        .select(F.col("l_suppkey").alias("__cand"))
    )
    nested_in = (
        supp.join(
            F.broadcast(
                load_table(spark, sf_dir, "nation").where(
                    F.col("n_name") == "NATION_24"
                )
            ),
            supp.s_nationkey == F.col("n_nationkey"),
        )
        .join(cand, supp.s_suppkey == F.col("__cand"), "left_semi")
        .select("s_suppkey", "s_name")
    )
    return _tagged_union(
        [("in", insub), ("scalar", scalar), ("exists", exists),
         ("corr_min", corr_min), ("anti_avg", anti_avg),
         ("not_in", not_in), ("scalar_max", scalar_max),
         ("having_frac", having_frac), ("nested_in", nested_in)]
    )


_NULLS_CORRMIN = """CAST(NULL AS BIGINT) AS p_partkey,
  CAST(NULL AS BIGINT) AS min_supp, CAST(NULL AS DOUBLE) AS min_price"""

_NULLS_ANTIAVG = """CAST(NULL AS INTEGER) AS nationkey,
  CAST(NULL AS BIGINT) AS n_noord, CAST(NULL AS DOUBLE) AS totbal"""

_NULLS_NOTIN = """CAST(NULL AS VARCHAR) AS p_brand,
  CAST(NULL AS INTEGER) AS p_size, CAST(NULL AS BIGINT) AS supplier_cnt"""

_NULLS_SCALARMAX = """CAST(NULL AS BIGINT) AS s_suppkey,
  CAST(NULL AS VARCHAR) AS total_revenue"""

_NULLS_HAVING = "CAST(NULL AS VARCHAR) AS part_value"

#: the q11-shaped restricted base (suppliers of two nations) — used by
#: both the per-part aggregate and the global-sum scalar subquery
_Q11_BASE = """FROM lineitem
WHERE l_suppkey IN (SELECT s_suppkey FROM supplier JOIN nation
                    ON s_nationkey = n_nationkey
                    WHERE n_name IN ('NATION_8', 'NATION_19'))"""

_REV_Q = """SELECT l_suppkey,
     SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6))) AS tr
   FROM lineitem
   WHERE l_shipdate >= TIMESTAMP '1996-01-01'
     AND l_shipdate < TIMESTAMP '1996-04-01'
   GROUP BY l_suppkey"""

_Q_SUBQUERIES_SQL = f"""
SELECT 'in' AS family, c_custkey, c_name, c_mktsegment,
  CAST(NULL AS BIGINT) AS n_above,
  CAST(NULL AS VARCHAR) AS s_name, CAST(NULL AS BIGINT) AS numwait,
  {_NULLS_CORRMIN}, {_NULLS_ANTIAVG}, {_NULLS_NOTIN}, {_NULLS_SCALARMAX}, {_NULLS_HAVING}
FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000)
UNION ALL
SELECT 'scalar', CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR), c_mktsegment, COUNT(*),
  CAST(NULL AS VARCHAR), CAST(NULL AS BIGINT),
  {_NULLS_CORRMIN}, {_NULLS_ANTIAVG}, {_NULLS_NOTIN}, {_NULLS_SCALARMAX}, {_NULLS_HAVING}
FROM customer
WHERE c_acctbal > (
  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(25,4))) AS DOUBLE) / COUNT(*)
  FROM customer)
GROUP BY c_mktsegment
UNION ALL
SELECT 'exists', CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR),
  CAST(NULL AS VARCHAR), CAST(NULL AS BIGINT), s_name, COUNT(*) AS numwait,
  {_NULLS_CORRMIN}, {_NULLS_ANTIAVG}, {_NULLS_NOTIN}, {_NULLS_SCALARMAX}, {_NULLS_HAVING}
FROM supplier, lineitem l1, orders, nation
WHERE s_suppkey = l1.l_suppkey
  AND o_orderkey = l1.l_orderkey
  AND o_orderstatus = 'F'
  AND l1.l_shipdate > o_orderdate + INTERVAL 45 DAY
  AND EXISTS (SELECT * FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT * FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > o_orderdate + INTERVAL 45 DAY)
  AND s_nationkey = n_nationkey
  AND n_name IN ('NATION_3', 'NATION_7')
GROUP BY s_name
UNION ALL
SELECT 'corr_min', CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR),
  CAST(NULL AS VARCHAR), CAST(NULL AS BIGINT),
  CAST(NULL AS VARCHAR), CAST(NULL AS BIGINT),
  l_partkey AS p_partkey, l_suppkey AS min_supp,
  l_extendedprice AS min_price, {_NULLS_ANTIAVG}, {_NULLS_NOTIN}, {_NULLS_SCALARMAX}, {_NULLS_HAVING}
FROM lineitem l1
WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size = 1)
  AND l_extendedprice = (SELECT MIN(l_extendedprice) FROM lineitem l2
                         WHERE l2.l_partkey = l1.l_partkey)
UNION ALL
SELECT 'anti_avg', CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR),
  CAST(NULL AS VARCHAR), CAST(NULL AS BIGINT),
  CAST(NULL AS VARCHAR), CAST(NULL AS BIGINT), {_NULLS_CORRMIN},
  c_nationkey AS nationkey, COUNT(*) AS n_noord,
  CAST(SUM(CAST(c_acctbal AS DECIMAL(25,4))) AS DOUBLE) AS totbal,
  {_NULLS_NOTIN}, {_NULLS_SCALARMAX}, {_NULLS_HAVING}
FROM customer c
WHERE c_acctbal > (
  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(25,4))) AS DOUBLE) / COUNT(*)
  FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
GROUP BY c_nationkey
UNION ALL
SELECT 'not_in', CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR),
  CAST(NULL AS VARCHAR), CAST(NULL AS BIGINT),
  CAST(NULL AS VARCHAR), CAST(NULL AS BIGINT),
  {_NULLS_CORRMIN}, {_NULLS_ANTIAVG},
  p_brand, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt,
  {_NULLS_SCALARMAX}, {_NULLS_HAVING}
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#11' AND p_size IN (1, 2, 3)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_size
UNION ALL
SELECT 'scalar_max', CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR),
  CAST(NULL AS VARCHAR), CAST(NULL AS BIGINT),
  s_name, CAST(NULL AS BIGINT),
  {_NULLS_CORRMIN}, {_NULLS_ANTIAVG}, {_NULLS_NOTIN},
  s_suppkey, CAST(tr AS VARCHAR) AS total_revenue, {_NULLS_HAVING}
FROM supplier JOIN ({_REV_Q}) rev ON s_suppkey = l_suppkey
WHERE tr = (SELECT MAX(tr) FROM ({_REV_Q}) rev2)
UNION ALL
SELECT 'having_frac', CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR),
  CAST(NULL AS VARCHAR), CAST(NULL AS BIGINT),
  CAST(NULL AS VARCHAR), CAST(NULL AS BIGINT),
  l_partkey AS p_partkey, CAST(NULL AS BIGINT) AS min_supp,
  CAST(NULL AS DOUBLE) AS min_price,
  {_NULLS_ANTIAVG}, {_NULLS_NOTIN}, {_NULLS_SCALARMAX},
  CAST(SUM(CAST(l_extendedprice * l_quantity AS DECIMAL(25,4))) AS VARCHAR)
    AS part_value
{_Q11_BASE}
GROUP BY l_partkey
HAVING CAST(SUM(CAST(l_extendedprice * l_quantity AS DECIMAL(25,4))) AS DOUBLE)
  > (SELECT CAST(SUM(CAST(l_extendedprice * l_quantity AS DECIMAL(25,4)))
             AS DOUBLE) * 2.0 / COUNT(DISTINCT l_partkey)
     {_Q11_BASE})
UNION ALL
SELECT 'nested_in', CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR),
  CAST(NULL AS VARCHAR), CAST(NULL AS BIGINT),
  s_name, CAST(NULL AS BIGINT),
  {_NULLS_CORRMIN}, {_NULLS_ANTIAVG}, {_NULLS_NOTIN},
  s_suppkey, CAST(NULL AS VARCHAR) AS total_revenue, {_NULLS_HAVING}
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_24'
  AND s_suppkey IN (
    SELECT ps.l_suppkey FROM (
      SELECT l_suppkey, l_partkey, SUM(CAST(l_quantity AS DECIMAL(25,4))) AS qty
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1995-01-01'
        AND l_shipdate < TIMESTAMP '1996-01-01'
      GROUP BY l_suppkey, l_partkey) ps
    WHERE ps.l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
      AND ps.qty * 2 > (
        SELECT SUM(CAST(l_quantity AS DECIMAL(25,4))) FROM lineitem l
        WHERE l.l_partkey = ps.l_partkey
          AND l.l_shipdate >= TIMESTAMP '1995-01-01'
          AND l.l_shipdate < TIMESTAMP '1996-01-01'))
"""


# ---------------------------------------------------------------------------
# set operations: UNION ALL + INTERSECT + EXCEPT (J1/J4)


def q_set_operations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL re-agg, INTERSECT, EXCEPT-DISTINCT, FULL OUTER
    (round 11, VERDICT r10 #4) and the TPC-H-q13-shaped LEFT OUTER
    count distribution (round 11), tag-unioned."""
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    ua = cust.unionAll(supp).groupBy("nationkey").agg(F.count("*").alias("n"))
    inter = cust.intersect(supp)
    ev = load_table(spark, sf_dir, "events")
    week1 = ev.where((F.col("ts") >= "2024-01-01") & (F.col("ts") < "2024-01-08")).select(
        "user_id", F.hour("ts").cast("long").alias("h")
    )
    week4 = ev.where((F.col("ts") >= "2024-01-22") & (F.col("ts") < "2024-01-29")).select(
        "user_id", F.hour("ts").cast("long").alias("h")
    )
    diff = week1.subtract(week4)
    # FULL OUTER family (round 11, VERDICT r10 #4): per-nation counts
    # of high-balance customers vs high-balance suppliers — the
    # thresholds make BOTH sides partial (supplier-only and
    # customer-only nations exist at sf0.01), so every outer-join
    # branch (matched, left-null, right-null) carries rows
    c_hi = (
        load_table(spark, sf_dir, "customer")
        .where(F.col("c_acctbal") > 9900)
        .groupBy(F.col("c_nationkey").alias("ck"))
        .agg(F.count("*").alias("n_cust"))
    )
    s_hi = (
        load_table(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") > 8000)
        .groupBy(F.col("s_nationkey").alias("sk"))
        .agg(F.count("*").alias("n_supp"))
    )
    fo = c_hi.join(s_hi, F.col("ck") == F.col("sk"), "full_outer").select(
        F.coalesce(F.col("ck"), F.col("sk")).alias("nationkey"),
        "n_cust",
        "n_supp",
    )
    # TPC-H-q13-shaped family (round 11): order-count distribution via
    # a LEFT OUTER join whose exclusion predicate lives on the RIGHT
    # side of the ON clause (the shape that silently turns into an
    # inner join if the filter is misplaced into WHERE — customers with
    # ONLY urgent orders must survive with c_count = 0). Spark-first:
    # filtering the right side before the left join is the ON-clause
    # predicate; COUNT(o_orderkey) counts matched rows only (NULL-
    # skipping), then the distribution re-aggregates on the count.
    cust_k = load_table(spark, sf_dir, "customer").select("c_custkey")
    ord_nu = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority") != "1-URGENT")
        .select("o_custkey", "o_orderkey")
    )
    lc = (
        cust_k.join(ord_nu, cust_k.c_custkey == ord_nu.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
    )
    return _tagged_union(
        [("union_all", ua), ("intersect", inter), ("except", diff),
         ("full_outer", fo), ("left_count", lc)]
    )


_Q_SET_OPS_SQL = """
SELECT 'union_all' AS family, nationkey, COUNT(*) AS n,
  CAST(NULL AS BIGINT) AS user_id, CAST(NULL AS BIGINT) AS h,
  CAST(NULL AS BIGINT) AS n_cust, CAST(NULL AS BIGINT) AS n_supp,
  CAST(NULL AS BIGINT) AS c_count, CAST(NULL AS BIGINT) AS custdist
FROM (
  SELECT c_nationkey AS nationkey FROM customer
  UNION ALL
  SELECT s_nationkey AS nationkey FROM supplier
) GROUP BY nationkey
UNION ALL
SELECT 'intersect', nationkey, CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
  CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
  CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)
FROM (
  SELECT c_nationkey AS nationkey FROM customer
  INTERSECT
  SELECT s_nationkey AS nationkey FROM supplier
)
UNION ALL
SELECT 'except', CAST(NULL AS INTEGER), CAST(NULL AS BIGINT), user_id, h,
  CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
  CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)
FROM (
  SELECT user_id, HOUR(CAST(ts AS TIMESTAMP)) AS h FROM events
  WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-08'
  EXCEPT
  SELECT user_id, HOUR(CAST(ts AS TIMESTAMP)) AS h FROM events
  WHERE ts >= TIMESTAMP '2024-01-22' AND ts < TIMESTAMP '2024-01-29'
)
UNION ALL
SELECT 'full_outer', COALESCE(ck, sk), CAST(NULL AS BIGINT),
  CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), n_cust, n_supp,
  CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)
FROM (SELECT c_nationkey AS ck, COUNT(*) AS n_cust FROM customer
      WHERE c_acctbal > 9900 GROUP BY c_nationkey) c
FULL JOIN (SELECT s_nationkey AS sk, COUNT(*) AS n_supp FROM supplier
           WHERE s_acctbal > 8000 GROUP BY s_nationkey) s
  ON ck = sk
UNION ALL
SELECT 'left_count', CAST(NULL AS INTEGER), CAST(NULL AS BIGINT),
  CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
  CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
  c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
) GROUP BY c_count
"""


# ---------------------------------------------------------------------------
# statistics: exact quantiles + exact-moment Pearson correlation (A5)


def _pct_interp(arr: Column, p: float) -> Column:
    """Exact interpolated percentile over a SORTED double array,
    replicating ``Percentile.getPercentile`` bit for bit (round 16):
    ``pos = p * (n − 1)``; result is the two-sided weighted form
    ``(ceil(pos) − pos) · v[floor] + (pos − floor(pos)) · v[ceil]``
    with the integer-position special case (the naive
    ``v_lo + (v_hi − v_lo) · frac`` differs by 1 ulp on some groups —
    observed on sf0.1 l_extendedprice p25). Verified value-identical
    to ``percentile()`` on all groups at sf0.001/0.01/0.1, and the
    DuckDB oracle (quantile_cont) was already bit-identical to
    ``percentile()``, so the oracle is untouched."""
    n = F.size(arr)  # collect_list drops NULLs, same as percentile()
    pos = F.lit(p) * (n - 1).cast("double")
    lo0 = F.floor(pos)
    hi0 = F.ceil(pos)
    vlo = F.element_at(arr, lo0.cast("int") + 1)
    vhi = F.element_at(arr, hi0.cast("int") + 1)
    return F.when(lo0 == hi0, vlo).otherwise(
        (hi0.cast("double") - pos) * vlo + (pos - lo0.cast("double")) * vhi
    )


def q_stats_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated quantiles + Pearson correlation from exact decimal
    moments. Round 16 (guide §1/§2): the quantile and moment halves are
    now SEPARATE aggregations joined on the 3-row group key — one
    ``percentile`` expression in an agg forces the WHOLE agg onto the
    interpreted ObjectHashAggregate path, so the six decimal sums were
    paying the no-codegen tax too (combined agg 5.30 s vs 3.94 s split,
    same-session A/B at sf0.1 on the r16 host). The quantiles
    themselves come from ``sort_array(collect_list(...))`` + exact
    interpolation (:func:`_pct_interp`) instead of ``percentile()`` —
    one array sort per group instead of per-row hash-map updates
    (3.11 s → 1.70 s for the three quantiles, same A/B session).
    Values bit-identical (see _pct_interp); oracle untouched.
    """
    # round 16: a spread_scan A/B here measured 0.82x (SLOWER) — the
    # exact-percentile partial-agg state ships every value through the
    # exchange regardless, so the repartition adds a full extra pass of
    # the same bytes with no parallelism gain on the merge side.
    li = load_table(spark, sf_dir, "lineitem")
    # round 16 (second pass): the whole-query spread A/B above was
    # re-decomposed per branch — sums is the DOMINANT branch (2.29 s of
    # the 4.27 s full query, same session) and has exactly q01's shape:
    # order-independent decimal partial aggs whose partial state is 3
    # tiny rows, stuck in the single-row-group scan task. Spreading
    # JUST this branch (not pcts/thr/qcut, whose collect_list partial
    # state ships every value through the exchange regardless — the
    # 0.82x whole-query result above) parallelizes the decimal
    # arithmetic without touching the value-shipping branches.
    li_sums = spread_scan(li)
    x = F.col("l_quantity").cast("decimal(25,4)")
    y = F.col("l_discount").cast("decimal(25,6)")
    xy = (F.col("l_quantity") * F.col("l_discount")).cast("decimal(25,8)")
    xx = (F.col("l_quantity") * F.col("l_quantity")).cast("decimal(25,4)")
    yy = (F.col("l_discount") * F.col("l_discount")).cast("decimal(25,8)")
    sums = li_sums.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(y).cast("double").alias("sy"),
        F.sum(xy).cast("double").alias("sxy"),
        F.sum(xx).cast("double").alias("sxx"),
        F.sum(yy).cast("double").alias("syy"),
    )
    pcts = (
        li.groupBy("l_returnflag")
        .agg(
            F.sort_array(F.collect_list("l_quantity")).alias("__qs"),
            F.sort_array(F.collect_list("l_extendedprice")).alias("__ps"),
        )
        .select(
            "l_returnflag",
            _pct_interp(F.col("__qs"), 0.5).alias("median_qty"),
            _pct_interp(F.col("__ps"), 0.25).alias("p25_price"),
            _pct_interp(F.col("__ps"), 0.75).alias("p75_price"),
        )
    )
    agg = sums.join(F.broadcast(pcts), "l_returnflag")
    n = F.col("n").cast("double")
    num = n * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.sqrt(n * F.col("sxx") - F.col("sx") * F.col("sx")) * F.sqrt(
        n * F.col("syy") - F.col("sy") * F.col("sy")
    )
    moments = agg.select(
        "l_returnflag",
        "n",
        "median_qty",
        "p25_price",
        "p75_price",
        (num / den).alias("corr_qty_disc"),
    )
    # qcut family (round 4; round 11 in-plan rewrite): percentile-
    # threshold corpus filtering, counted per group after the cutoff.
    # The threshold is a broadcast 1-row aggregate INSIDE the plan
    # rather than sampling.quantile_threshold's driver scalar: same
    # bit-identical value (the operator's exact bracket path equals
    # percentile(), == DuckDB quantile_cont), but one job instead of a
    # threshold job serialized before the union job — measured −1 s on
    # this query at sf0.1. The driver-scalar operator remains the
    # production API for filters that REUSE the cutoff across batches.
    # Round 16: the threshold itself is the sorted-array interpolation
    # (percentile() on the same 600 k values measured 2.55 s vs 0.93 s,
    # value bit-identical — see _pct_interp).
    thr_row = (
        li.agg(F.sort_array(F.collect_list("l_extendedprice")).alias("__ps"))
        .select(_pct_interp(F.col("__ps"), 0.75).alias("threshold"))
    )
    qcut = (
        li.join(F.broadcast(thr_row))
        .where(F.col("l_extendedprice") >= F.col("threshold"))
        .groupBy("l_returnflag", "threshold")
        .agg(F.count("*").alias("n_kept"))
        .select("l_returnflag", "n_kept", "threshold")
    )
    # ppl family (round 5): CCNet-style pinned-LM perplexity filter over
    # documents (textstats.lm_perplexity_score) — BIGRAM with stupid
    # backoff; millinat integer log-probs make the distributed sum
    # exact, so both engines hash-match the per-doc scores and
    # head/middle/tail buckets
    from pydala_spark.operators.textstats import lm_perplexity_score

    lm = _LM  # module-level fixture — already parsed for the SQL constants
    # thresholds sit at the synthetic corpus's rough tertiles so all
    # three buckets are exercised (exactness never depends on their
    # placement — avg_millinats is bit-identical in both engines)
    # round 16 (second pass): the per-token bigram scoring (regex
    # tokenize + pair-array transform) otherwise runs inside the single
    # documents-scan task — the q_lang_predict shape. Isolated
    # interleaved A/B at sf0.1: 1.12x, spread arm faster 5/5 pairs.
    ppl = lm_perplexity_score(
        spread_scan(load_table(spark, sf_dir, "documents")),
        lm["vocab"],
        lm["unk_millinats"],
        head_threshold=_PPL_HEAD,
        middle_threshold=_PPL_MIDDLE,
        bigrams=lm["bigrams"],
        backoff_millinats=lm["backoff_millinats"],
    ).select(
        "doc_id",
        F.col("n_tokens").alias("n_lm_tokens"),
        "sum_millinats",
        "avg_millinats",
        "bucket",
    )
    return _tagged_union([("moments", moments), ("qcut", qcut), ("ppl", ppl)])


def _lm_fixture() -> dict:
    import json
    import posixpath

    path = posixpath.join(
        posixpath.dirname(__file__), "fixtures", "unigram_lm_millinats.json"
    )
    with open(path) as f:
        return json.load(f)


_LM = _lm_fixture()
_LM_VALUES = ", ".join(
    f"('{t.replace(chr(39), chr(39) * 2)}', {lp})"
    for t, lp in _LM["vocab"].items()
)
_LM_BI_VALUES = ", ".join(
    f"('{t.replace(chr(39), chr(39) * 2)}', {lp})"
    for t, lp in _LM["bigrams"].items()
)
_LM_UNK = _LM["unk_millinats"]
_LM_BACKOFF = _LM["backoff_millinats"]
#: rough corpus tertiles under the bigram model (bucket spread only;
#: exactness never depends on placement)
_PPL_HEAD = -3391
_PPL_MIDDLE = -3417

_Q_STATS_SQL = f"""
WITH m AS (
  SELECT l_returnflag, COUNT(*) AS n,
    quantile_cont(l_quantity, 0.5) AS median_qty,
    quantile_cont(l_extendedprice, 0.25) AS p25_price,
    quantile_cont(l_extendedprice, 0.75) AS p75_price,
    CAST(SUM(CAST(l_quantity AS DECIMAL(25,4))) AS DOUBLE) AS sx,
    CAST(SUM(CAST(l_discount AS DECIMAL(25,6))) AS DOUBLE) AS sy,
    CAST(SUM(CAST(l_quantity * l_discount AS DECIMAL(25,8))) AS DOUBLE) AS sxy,
    CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(25,4))) AS DOUBLE) AS sxx,
    CAST(SUM(CAST(l_discount * l_discount AS DECIMAL(25,8))) AS DOUBLE) AS syy
  FROM lineitem GROUP BY l_returnflag
)
SELECT 'moments' AS family, l_returnflag, n, median_qty, p25_price, p75_price,
  (CAST(n AS DOUBLE) * sxy - sx * sy)
  / (SQRT(CAST(n AS DOUBLE) * sxx - sx * sx) * SQRT(CAST(n AS DOUBLE) * syy - sy * sy))
    AS corr_qty_disc,
  CAST(NULL AS BIGINT) AS n_kept, CAST(NULL AS DOUBLE) AS threshold,
  CAST(NULL AS BIGINT) AS doc_id, CAST(NULL AS BIGINT) AS n_lm_tokens,
  CAST(NULL AS BIGINT) AS sum_millinats, CAST(NULL AS DOUBLE) AS avg_millinats,
  CAST(NULL AS VARCHAR) AS bucket
FROM m
UNION ALL
SELECT 'qcut', l_returnflag, CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE),
  CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
  COUNT(*) AS n_kept,
  (SELECT quantile_cont(l_extendedprice, 0.75) FROM lineitem) AS threshold,
  CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
  CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE), CAST(NULL AS VARCHAR)
FROM lineitem
WHERE l_extendedprice >= (SELECT quantile_cont(l_extendedprice, 0.75) FROM lineitem)
GROUP BY l_returnflag
UNION ALL
SELECT 'ppl', CAST(NULL AS VARCHAR), CAST(NULL AS BIGINT),
  CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
  CAST(NULL AS DOUBLE), CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE),
  d.doc_id, COALESCE(sc.n, 0), sc.s,
  CAST(sc.s AS DOUBLE) / sc.n,
  CASE WHEN sc.n IS NULL THEN 'unscored'
       WHEN CAST(sc.s AS DOUBLE) / sc.n >= {_PPL_HEAD} THEN 'head'
       WHEN CAST(sc.s AS DOUBLE) / sc.n >= {_PPL_MIDDLE} THEN 'middle'
       ELSE 'tail' END
FROM documents d
LEFT JOIN (
  SELECT doc_id, COUNT(*) AS n,
         CAST(SUM(COALESCE(b.lp,
                COALESCE(v.lp, {_LM_UNK})
                + CASE WHEN pe.pair IS NOT NULL THEN {_LM_BACKOFF}
                       ELSE 0 END)) AS BIGINT) AS s
  FROM (
    SELECT doc_id, p['cur'] AS tok,
           p['prev'] || ' ' || p['cur'] AS pair
    FROM (
      SELECT doc_id,
             unnest(list_transform(range(1, LEN(toks) + 1),
               i -> {{'cur': toks[i],
                      'prev': CASE WHEN i > 1 THEN toks[i - 1] END}})) AS p
      FROM (SELECT doc_id, {_WORD_SPLIT} AS toks FROM documents)
    )
  ) pe
  LEFT JOIN (VALUES {_LM_VALUES}) v(tok, lp) ON pe.tok = v.tok
  LEFT JOIN (VALUES {_LM_BI_VALUES}) b(pair, lp) ON pe.pair = b.pair
  GROUP BY doc_id
) sc ON d.doc_id = sc.doc_id
"""


# ---------------------------------------------------------------------------
# pivot + unpivot (wide<->long reshaping)


MERGED_QUERIES = {
    "q_scalar_functions": q_scalar_functions,
    "q_collection_functions": q_collection_functions,
    "q_grouping_analytics": q_grouping_analytics,
    "q_subqueries": q_subqueries,
    "q_set_operations": q_set_operations,
    "q_stats_summary": q_stats_summary,
}

MERGED_ORACLE = {
    "q_scalar_functions": _Q_SCALAR_SQL,
    "q_collection_functions": _Q_COLLECTION_SQL,
    "q_grouping_analytics": _Q_GROUPING_SQL,
    "q_subqueries": _Q_SUBQUERIES_SQL,
    "q_set_operations": _Q_SET_OPS_SQL,
    "q_stats_summary": _Q_STATS_SQL,
}
