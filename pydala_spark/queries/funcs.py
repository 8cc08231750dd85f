"""Additional TPC-H-shaped queries and the window-function family
(SURVEY §2.5 J4+, §2.6 A5+, §2.7 F5 — the SQL-passthrough surface made
explicit).

The single-family scalar/collection/set-op demos that lived here in
round 1 were consolidated into tagged multi-family queries in
``queries/merged.py`` so the whole registry fits inside the correctness
driver's ~50-query window.

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


FUNC_QUERIES = {
    "q07_volume_shipping": q07_volume_shipping,
    "q09_product_profit": q09_product_profit,
    "q12_priority_shipping": q12_priority_shipping,
    "q14_promo_revenue": q14_promo_revenue,
    "q18_large_orders": q18_large_orders,
    "q19_discounted_parts": q19_discounted_parts,
    "q_window_functions": q_window_functions,
    "q17_small_quantity": q17_small_quantity,
}

FUNC_ORACLE = {
    "q07_volume_shipping": _Q07_SQL,
    "q09_product_profit": _Q09_SQL,
    "q12_priority_shipping": _Q12_SQL,
    "q14_promo_revenue": _Q14_SQL,
    "q18_large_orders": _Q18_SQL,
    "q19_discounted_parts": _Q19_SQL,
    "q_window_functions": _Q_WINDOW_FUNCS_SQL,
    "q17_small_quantity": _Q17_SQL,
}
