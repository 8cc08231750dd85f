"""Function-family and additional TPC-H-shaped queries (SURVEY §2.5 J4+,
§2.6 A5+, §2.7 F5 — the SQL-passthrough surface made explicit).

Same exactness rules as queries/core.py (decimal sums, identical aliases).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pydala_spark.queries.core import (
    _dsum,
    _dsum_str,
    _rev,
    _sql_dsum,
    _sql_dsum_str,
    _REV,
)
from pydala_spark.sources import load_table


def q07_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: revenue between two nation pairs by year."""
    t = {n: load_table(spark, sf_dir, n) for n in
         ("supplier", "lineitem", "orders", "customer", "nation")}
    n1 = t["nation"].select(F.col("n_nationkey").alias("s_nk"),
                            F.col("n_name").alias("supp_nation"))
    n2 = t["nation"].select(F.col("n_nationkey").alias("c_nk"),
                            F.col("n_name").alias("cust_nation"))
    joined = (
        t["lineitem"]
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .where(
            (
                (F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_9")
            )
            | (
                (F.col("supp_nation") == "NATION_9") & (F.col("cust_nation") == "NATION_3")
            )
        )
    )
    return (
        joined.groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(_dsum(_rev()).alias("revenue"))
    )


_Q07_SQL = f"""
SELECT supp_nation, cust_nation, l_year, {_sql_dsum('volume')} AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(YEAR(l_shipdate) AS INT) AS l_year, {_REV} AS volume
  FROM supplier, lineitem, orders, customer, nation n1, nation n2
  WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
    AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
    AND c_nationkey = n2.n_nationkey
    AND ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_9')
      OR (n1.n_name = 'NATION_9' AND n2.n_name = 'NATION_3'))
)
GROUP BY supp_nation, cust_nation, l_year
"""


def q09_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (no partsupp table: retail price as cost proxy)."""
    t = {n: load_table(spark, sf_dir, n) for n in
         ("part", "supplier", "lineitem", "orders", "nation")}
    profit = _rev() - F.lit(0.5) * F.col("p_retailprice") * F.col("l_quantity")
    return (
        t["lineitem"]
        .join(F.broadcast(t["part"].where(F.col("p_name").like("%gear%"))),
              F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(_dsum_str(profit, 8).alias("sum_profit"))
    )


_Q09_SQL = f"""
SELECT n_name AS nation, CAST(YEAR(o_orderdate) AS INT) AS o_year,
  {_sql_dsum_str(_REV + " - 0.5 * p_retailprice * l_quantity", 8)} AS sum_profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN orders ON l_orderkey = o_orderkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_name LIKE '%gear%'
GROUP BY n_name, YEAR(o_orderdate)
"""


def q12_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: high/low-priority order counts per linestatus."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1998-01-01") & (F.col("l_shipdate") < "1999-01-01")
    )
    orders = load_table(spark, sf_dir, "orders")
    high = F.when(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1
    ).otherwise(0)
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(high).cast("long").alias("high_line_count"),
            F.sum(1 - high).cast("long").alias("low_line_count"),
        )
    )


_Q12_SQL = """
SELECT l_linestatus,
  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1998-01-01' AND l_shipdate < TIMESTAMP '1999-01-01'
GROUP BY l_linestatus
"""


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: conditional revenue share (exact decimal ratio)."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1997-06-01") & (F.col("l_shipdate") < "1997-07-01")
    )
    part = load_table(spark, sf_dir, "part")
    vol = _rev().cast("decimal(25,6)")
    promo = F.when(F.col("p_type") == "PROMO", vol).otherwise(
        F.lit(0).cast("decimal(25,6)")
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (
                F.lit(100.0) * F.sum(promo).cast("double")
                / F.sum(vol).cast("double")
            ).alias("promo_revenue"),
            F.count("*").alias("n"),
        )
    )


_Q14_SQL = f"""
SELECT 100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                       THEN CAST({_REV} AS DECIMAL(25,6))
                       ELSE CAST(0 AS DECIMAL(25,6)) END) AS DOUBLE)
           / CAST(SUM(CAST({_REV} AS DECIMAL(25,6))) AS DOUBLE) AS promo_revenue,
       COUNT(*) AS n
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-06-01' AND l_shipdate < TIMESTAMP '1997-07-01'
"""


def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: orders whose total quantity exceeds a threshold
    (groupBy-HAVING + semi join back)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(25,4)")).alias("sum_qty_dec"))
        .where(F.col("sum_qty_dec") > 150)
    )
    return (
        big.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.col("o_totalprice"),
            F.col("sum_qty_dec").cast("double").alias("sum_qty"),
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(20)
    )


_Q18_SQL = """
SELECT c_name, c_custkey, o_orderkey, o_totalprice,
       CAST(SUM(CAST(l_quantity AS DECIMAL(25,4))) AS DOUBLE) AS sum_qty
FROM customer JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY c_name, c_custkey, o_orderkey, o_totalprice
HAVING SUM(CAST(l_quantity AS DECIMAL(25,4))) > 150
ORDER BY o_totalprice DESC, o_orderkey LIMIT 20
"""


def q19_discounted_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs predicate across join columns."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    cond = (
        (F.col("p_brand") == "Brand#1")
        & (F.col("l_quantity") >= 1) & (F.col("l_quantity") <= 11)
        & (F.col("p_size") <= 5)
    ) | (
        (F.col("p_brand") == "Brand#2")
        & (F.col("l_quantity") >= 10) & (F.col("l_quantity") <= 20)
        & (F.col("p_size") <= 10)
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .where(cond)
        .agg(_dsum(_rev()).alias("revenue"), F.count("*").alias("n"))
    )


_Q19_SQL = f"""
SELECT {_sql_dsum(_REV)} AS revenue, COUNT(*) AS n
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND l_quantity BETWEEN 1 AND 11 AND p_size <= 5)
   OR (p_brand = 'Brand#2' AND l_quantity BETWEEN 10 AND 20 AND p_size <= 10)
"""


def q_window_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-function family: rank, dense_rank, lag, running sum — all
    under a fully deterministic ordering with explicit ROWS frames."""
    orders = load_table(spark, sf_dir, "orders").where(F.col("o_custkey") < 100)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wrun = w.rowsBetween(Window.unboundedPreceding, 0)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.row_number().over(w).cast("long").alias("seq"),
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.sum(F.col("o_totalprice").cast("decimal(25,4)"))
        .over(wrun)
        .cast("double")
        .alias("running_total"),
        F.rank()
        .over(Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey")))
        .cast("long")
        .alias("price_rank"),
    )


_Q_WINDOW_FUNCS_SQL = """
SELECT o_custkey, o_orderkey,
  ROW_NUMBER() OVER w AS seq,
  LAG(o_totalprice) OVER w AS prev_price,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(25,4)))
       OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
    AS running_total,
  RANK() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC)
    AS price_rank
FROM orders WHERE o_custkey < 100
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""


def q_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-part extraction family."""
    orders = load_table(spark, sf_dir, "orders")
    return (
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


_Q_DATE_FUNCS_SQL = """
SELECT CAST(YEAR(o_orderdate) AS INT) AS y, CAST(QUARTER(o_orderdate) AS INT) AS q,
       CAST(MONTH(o_orderdate) AS INT) AS m, COUNT(*) AS n,
       CAST(MIN(DAYOFMONTH(o_orderdate)) AS INT) AS min_dom,
       CAST(MAX(DAYOFYEAR(o_orderdate)) AS INT) AS max_doy
FROM orders GROUP BY 1, 2, 3
"""


def q_math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math scalar family on supplier balances (exact per-row ops)."""
    supp = load_table(spark, sf_dir, "supplier")
    return supp.select(
        "s_suppkey",
        F.abs("s_acctbal").alias("abs_bal"),
        F.ceil("s_acctbal").alias("ceil_bal"),
        F.floor("s_acctbal").alias("floor_bal"),
        F.sqrt(F.abs("s_acctbal")).alias("sqrt_bal"),
        (F.col("s_suppkey") % 7).alias("mod7"),
        F.pow(F.lit(2.0), (F.col("s_suppkey") % 10)).alias("pow2"),
        F.greatest("s_acctbal", F.lit(0.0)).alias("pos_bal"),
    )


_Q_MATH_FUNCS_SQL = """
SELECT s_suppkey, ABS(s_acctbal) AS abs_bal,
       CAST(CEIL(s_acctbal) AS BIGINT) AS ceil_bal,
       CAST(FLOOR(s_acctbal) AS BIGINT) AS floor_bal,
       SQRT(ABS(s_acctbal)) AS sqrt_bal,
       s_suppkey % 7 AS mod7,
       POW(2.0, s_suppkey % 10) AS pow2,
       GREATEST(s_acctbal, 0.0) AS pos_bal
FROM supplier
"""


def q_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String scalar family on customer names."""
    cust = load_table(spark, sf_dir, "customer").where(
        F.col("c_name").like("%1%")
    )
    return cust.select(
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


_Q_STRING_FUNCS_SQL = """
SELECT c_custkey, UPPER(c_name) AS upper_name, LENGTH(c_name) AS name_len,
       SUBSTRING(c_name, 1, 8) AS prefix,
       LPAD(CAST(c_custkey AS VARCHAR), 8, '0') AS padded_key,
       REPLACE(c_name, 'Customer', 'Cust') AS short_name,
       CONCAT_WS('-', c_mktsegment, CAST(c_custkey AS VARCHAR)) AS seg_key
FROM customer WHERE c_name LIKE '%1%'
"""


def q_array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array family: split/sort/distinct/contains/join over doc tokens."""
    from pydala_spark.operators.textstats import word_regex_tokens

    docs = load_table(spark, sf_dir, "documents")
    toks = word_regex_tokens("text")
    return docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.array_contains(toks, "spark").alias("has_spark"),
        F.array_join(F.slice(F.array_sort(F.array_distinct(toks)), 1, 5), " ").alias(
            "first5_sorted"
        ),
    )


_Q_ARRAY_FUNCS_SQL = """
SELECT doc_id,
  LEN(t) AS n_tokens,
  list_contains(t, 'spark') AS has_spark,
  array_to_string(list_sort(list_distinct(t))[1:5], ' ') AS first5_sorted
FROM (SELECT doc_id,
        list_filter(string_split_regex(lower(text), '[^a-z0-9'']+'), x -> x <> '') AS t
      FROM documents)
"""


def q_union_all_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL + re-aggregation."""
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return cust.unionAll(supp).groupBy("nationkey").agg(F.count("*").alias("n"))


_Q_UNION_ALL_SQL = """
SELECT nationkey, COUNT(*) AS n FROM (
  SELECT c_nationkey AS nationkey FROM customer
  UNION ALL
  SELECT s_nationkey AS nationkey FROM supplier
) GROUP BY nationkey
"""


def q_cube_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"), _dsum_str(_rev()).alias("revenue")
    )


_Q_CUBE_SQL = f"""
SELECT l_returnflag, l_linestatus, COUNT(*) AS n, {_sql_dsum_str(_REV)} AS revenue
FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
"""


def q_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subquery (left-semi join form): customers with any order over
    400k."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").where(F.col("o_totalprice") > 400000)
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi")
        .select("c_custkey", "c_name", "c_mktsegment")
    )


_Q_IN_SUBQUERY_SQL = """
SELECT c_custkey, c_name, c_mktsegment FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000)
"""


def q_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-subquery comparison: customers above the mean balance
    (mean as exact decimal-sum / count)."""
    cust = load_table(spark, sf_dir, "customer")
    mean = cust.agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(25,4)")).cast("double")
            / F.count("*")
        ).alias("mean_bal")
    )
    return (
        cust.crossJoin(F.broadcast(mean))
        .where(F.col("c_acctbal") > F.col("mean_bal"))
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_above"))
    )


_Q_SCALAR_SUBQUERY_SQL = """
SELECT c_mktsegment, COUNT(*) AS n_above
FROM customer
WHERE c_acctbal > (
  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(25,4))) AS DOUBLE) / COUNT(*)
  FROM customer)
GROUP BY c_mktsegment
"""


def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated scalar subquery (per-part average
    quantity threshold), expressed as a window/join in the DataFrame."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#3")
    per_part_avg = (
        li.groupBy(F.col("l_partkey").alias("avg_partkey"))
        .agg(
            (
                F.sum(F.col("l_quantity").cast("decimal(25,4)")).cast("double")
                / F.count("*")
            ).alias("avg_qty")
        )
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(per_part_avg, F.col("l_partkey") == F.col("avg_partkey"))
        .where(F.col("l_quantity") < F.lit(0.5) * F.col("avg_qty"))
        .agg(
            (
                F.sum(F.col("l_extendedprice").cast("decimal(25,4)")).cast("double")
                / F.lit(7.0)
            ).alias("avg_yearly"),
            F.count("*").alias("n"),
        )
    )


_Q17_SQL = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,4))) AS DOUBLE) / 7.0 AS avg_yearly,
       COUNT(*) AS n
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand = 'Brand#3'
  AND l_quantity < 0.5 * (
    SELECT CAST(SUM(CAST(l2.l_quantity AS DECIMAL(25,4))) AS DOUBLE) / COUNT(*)
    FROM lineitem l2 WHERE l2.l_partkey = lineitem.l_partkey)
"""


def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS ((flag),(status)) with grouping() markers
    (distinct shape from rollup/cube)."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_gs")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(grouping(l_returnflag) AS BIGINT) AS g_flag,
               CAST(grouping(l_linestatus) AS BIGINT) AS g_status,
               COUNT(*) AS n
        FROM lineitem_gs
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        """
    )


_Q_GROUPING_SETS_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(GROUPING(l_returnflag) AS BIGINT) AS g_flag,
       CAST(GROUPING(l_linestatus) AS BIGINT) AS g_status,
       COUNT(*) AS n
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
"""


def q_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation from EXACT decimal moment sums — built-in
    corr() accumulates doubles in engine-specific order; computing the
    five moments exactly then combining in double is bit-identical."""
    li = load_table(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("decimal(25,4)")
    y = F.col("l_discount").cast("decimal(25,6)")
    xy = (F.col("l_quantity") * F.col("l_discount")).cast("decimal(25,8)")
    xx = (F.col("l_quantity") * F.col("l_quantity")).cast("decimal(25,4)")
    yy = (F.col("l_discount") * F.col("l_discount")).cast("decimal(25,8)")
    agg = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(y).cast("double").alias("sy"),
        F.sum(xy).cast("double").alias("sxy"),
        F.sum(xx).cast("double").alias("sxx"),
        F.sum(yy).cast("double").alias("syy"),
    )
    n = F.col("n").cast("double")
    num = n * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.sqrt(n * F.col("sxx") - F.col("sx") * F.col("sx")) * F.sqrt(
        n * F.col("syy") - F.col("sy") * F.col("sy")
    )
    return agg.select("l_returnflag", "n", (num / den).alias("corr_qty_disc"))


_Q_CORRELATION_SQL = """
WITH m AS (
  SELECT l_returnflag, COUNT(*) AS n,
    CAST(SUM(CAST(l_quantity AS DECIMAL(25,4))) AS DOUBLE) AS sx,
    CAST(SUM(CAST(l_discount AS DECIMAL(25,6))) AS DOUBLE) AS sy,
    CAST(SUM(CAST(l_quantity * l_discount AS DECIMAL(25,8))) AS DOUBLE) AS sxy,
    CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(25,4))) AS DOUBLE) AS sxx,
    CAST(SUM(CAST(l_discount * l_discount AS DECIMAL(25,8))) AS DOUBLE) AS syy
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, n,
  (CAST(n AS DOUBLE) * sxy - sx * sy)
  / (SQRT(CAST(n AS DOUBLE) * sxx - sx * sx) * SQRT(CAST(n AS DOUBLE) * syy - sy * sy))
    AS corr_qty_disc
FROM m
"""


def q_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map type family: build per-row maps, extract keys/values/size
    (outputs scalars — raw map columns have engine-specific ordering)."""
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") < 100)
    m = F.create_map(
        F.lit("qty"), F.col("l_quantity"), F.lit("price"), F.col("l_extendedprice")
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.element_at(m, "qty").alias("qty_val"),
        F.size(m).alias("m_size"),
        F.array_join(F.map_keys(m), ",").alias("m_keys"),
    )


_Q_MAP_FUNCS_SQL = """
SELECT l_orderkey, l_linenumber,
  map_extract(map(['qty','price'], [l_quantity, l_extendedprice]), 'qty')[1] AS qty_val,
  CAST(cardinality(map(['qty','price'], [l_quantity, l_extendedprice])) AS INT) AS m_size,
  array_to_string(map_keys(map(['qty','price'], [l_quantity, l_extendedprice])), ',') AS m_keys
FROM lineitem WHERE l_orderkey < 100
"""


def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (wide -> long) + re-aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    long = li.unpivot(
        ["l_returnflag"],
        ["l_quantity", "l_discount"],
        "metric",
        "val",
    )
    return long.groupBy("l_returnflag", "metric").agg(
        F.sum(F.col("val").cast("decimal(25,6)")).cast("double").alias("total"),
        F.count("*").alias("n"),
    )


_Q_UNPIVOT_SQL = """
SELECT l_returnflag, metric,
       CAST(SUM(CAST(val AS DECIMAL(25,6))) AS DOUBLE) AS total, COUNT(*) AS n
FROM (
  SELECT l_returnflag, 'l_quantity' AS metric, l_quantity AS val FROM lineitem
  UNION ALL
  SELECT l_returnflag, 'l_discount' AS metric, l_discount AS val FROM lineitem
) GROUP BY l_returnflag, metric
"""


def q_regexp_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex family: extract + match-filter + count occurrences."""
    part = load_table(spark, sf_dir, "part")
    first_word = F.regexp_extract("p_name", r"^([a-z]+)", 1)
    return (
        part.where(F.col("p_name").rlike(r"^[a-z]+ [a-z]+$"))
        .groupBy(first_word.alias("first_word"))
        .agg(
            F.count("*").alias("n"),
            F.countDistinct("p_brand").alias("n_brands"),
        )
    )


_Q_REGEXP_SQL = """
SELECT regexp_extract(p_name, '^([a-z]+)', 1) AS first_word,
       COUNT(*) AS n, COUNT(DISTINCT p_brand) AS n_brands
FROM part WHERE regexp_matches(p_name, '^[a-z]+ [a-z]+$')
GROUP BY 1
"""


def q_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated quantiles (Spark ``percentile`` == DuckDB
    ``quantile_cont``, verified bit-identical)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_quantity, 0.5)").alias("median_qty"),
        F.expr("percentile(l_extendedprice, 0.25)").alias("p25_price"),
        F.expr("percentile(l_extendedprice, 0.75)").alias("p75_price"),
        F.count("*").alias("n"),
    )


_Q_QUANTILES_SQL = """
SELECT l_returnflag,
       quantile_cont(l_quantity, 0.5) AS median_qty,
       quantile_cont(l_extendedprice, 0.25) AS p25_price,
       quantile_cont(l_extendedprice, 0.75) AS p75_price,
       COUNT(*) AS n
FROM lineitem GROUP BY l_returnflag
"""


def q_conditional_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE / COALESCE / NULLIF family."""
    orders = load_table(spark, sf_dir, "orders")
    status = F.coalesce(
        F.nullif(F.col("o_orderstatus"), F.lit("P")), F.lit("PENDING")
    )
    band = (
        F.when(F.col("o_totalprice") < 50000, "small")
        .when(F.col("o_totalprice") < 200000, "medium")
        .otherwise("large")
    )
    return orders.groupBy(status.alias("status"), band.alias("band")).agg(
        F.count("*").alias("n")
    )


_Q_CONDITIONAL_SQL = """
SELECT COALESCE(NULLIF(o_orderstatus, 'P'), 'PENDING') AS status,
       CASE WHEN o_totalprice < 50000 THEN 'small'
            WHEN o_totalprice < 200000 THEN 'medium'
            ELSE 'large' END AS band,
       COUNT(*) AS n
FROM orders GROUP BY 1, 2
"""


FUNC_QUERIES = {
    "q07_volume_shipping": q07_volume_shipping,
    "q09_product_profit": q09_product_profit,
    "q12_priority_shipping": q12_priority_shipping,
    "q14_promo_revenue": q14_promo_revenue,
    "q18_large_orders": q18_large_orders,
    "q19_discounted_parts": q19_discounted_parts,
    "q_window_functions": q_window_functions,
    "q_date_functions": q_date_functions,
    "q_math_functions": q_math_functions,
    "q_string_functions": q_string_functions,
    "q_array_functions": q_array_functions,
    "q_union_all_counts": q_union_all_counts,
    "q_cube_revenue": q_cube_revenue,
    "q_in_subquery": q_in_subquery,
    "q_scalar_subquery": q_scalar_subquery,
    "q_quantiles": q_quantiles,
    "q_conditional_functions": q_conditional_functions,
    "q_map_functions": q_map_functions,
    "q_unpivot": q_unpivot,
    "q_regexp_functions": q_regexp_functions,
    "q17_small_quantity": q17_small_quantity,
    "q_grouping_sets": q_grouping_sets,
    "q_correlation": q_correlation,
}

FUNC_ORACLE = {
    "q07_volume_shipping": _Q07_SQL,
    "q09_product_profit": _Q09_SQL,
    "q12_priority_shipping": _Q12_SQL,
    "q14_promo_revenue": _Q14_SQL,
    "q18_large_orders": _Q18_SQL,
    "q19_discounted_parts": _Q19_SQL,
    "q_window_functions": _Q_WINDOW_FUNCS_SQL,
    "q_date_functions": _Q_DATE_FUNCS_SQL,
    "q_math_functions": _Q_MATH_FUNCS_SQL,
    "q_string_functions": _Q_STRING_FUNCS_SQL,
    "q_array_functions": _Q_ARRAY_FUNCS_SQL,
    "q_union_all_counts": _Q_UNION_ALL_SQL,
    "q_cube_revenue": _Q_CUBE_SQL,
    "q_in_subquery": _Q_IN_SUBQUERY_SQL,
    "q_scalar_subquery": _Q_SCALAR_SUBQUERY_SQL,
    "q_quantiles": _Q_QUANTILES_SQL,
    "q_conditional_functions": _Q_CONDITIONAL_SQL,
    "q_map_functions": _Q_MAP_FUNCS_SQL,
    "q_unpivot": _Q_UNPIVOT_SQL,
    "q_regexp_functions": _Q_REGEXP_SQL,
    "q17_small_quantity": _Q17_SQL,
    "q_grouping_sets": _Q_GROUPING_SETS_SQL,
    "q_correlation": _Q_CORRELATION_SQL,
}
