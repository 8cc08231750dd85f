"""Core relational query surface (SURVEY.md §2.3-2.7).

The reference exposes its entire relational surface as SQL passthrough to
an embedded engine (src/pydala/dataset/reader.py:478-484); here each query
is the idiomatic DataFrame form (so Catalyst plans pushdown/broadcast) with
a DuckDB oracle string. Explicit library operators are exercised where the
reference implements them in code: subset dedup (utils/table.py:230-288),
EXCEPT-diff (utils/table.py:135-228), time bucketing (writer.py:292-385).

Naming contract: every computed column is aliased identically in the
DataFrame and the oracle SQL.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pydala_spark.sources import load_table, spread_scan


def _dsum(expr: Column, scale: int = 6) -> Column:
    """Exact cross-engine double sum: per-row decimal cast -> exact sum ->
    one cast back to double (see queries/__init__ docstring).

    Only safe while the sum's UNSCALED value stays <= 2^53: beyond that,
    decimal->double suffers double rounding (int->double then /10^scale)
    in one engine vs a single correctly-rounded conversion in the other —
    observed 1-ulp mismatches at sf0.1 with scale 8. Use :func:`_dsum_str`
    for aggregates that can exceed ~15 significant digits.
    """
    return F.sum(expr.cast(f"decimal(25,{scale})")).cast("double")


def _sql_dsum(expr: str, scale: int = 6) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(25,{scale}))) AS DOUBLE)"


def _dsum_str(expr: Column, scale: int = 6) -> Column:
    """Exact sum emitted as the decimal's canonical string — immune to
    the double-rounding hazard at any magnitude (formats verified
    identical across engines, trailing zeros included)."""
    return F.sum(expr.cast(f"decimal(25,{scale})")).cast("string")


def _sql_dsum_str(expr: str, scale: int = 6) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(25,{scale}))) AS VARCHAR)"


_REV = "l_extendedprice * (1 - l_discount)"


def _rev() -> Column:
    return F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))


# ---------------------------------------------------------------------------


def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1: scan + filter + 8-agg groupBy (SURVEY §2.6 A5).

    Round 16 (guide §2.5): ``spread_scan`` before the aggregation — the
    sf tables scan as 1-3 unsplittable row-group tasks, and q01's cost
    is almost entirely the eight decimal partial aggregates, so the
    narrow 6-column exchange buys 32-way decimal summing (interleaved
    A/B at sf0.1: 1.27x, rows identical; exact decimal sums are
    order-independent so the result cannot change). The SAME spread on
    the broadcast-join block (q03/q04/q05/q08/q10) measured 0.40-0.67x
    — their per-row post-scan work is a cheap hash probe, so the raw
    exchange dominates — and is deliberately NOT applied there.
    """
    li = spread_scan(load_table(spark, sf_dir, "lineitem"))
    qty = F.col("l_quantity").cast("decimal(25,4)")
    price = F.col("l_extendedprice").cast("decimal(25,4)")
    n = F.count("*")
    return (
        li.where(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).cast("double").alias("sum_qty"),
            F.sum(price).cast("double").alias("sum_base_price"),
            _dsum(_rev()).alias("sum_disc_price"),
            _dsum_str(_rev() * (F.lit(1) + F.col("l_tax")), 8).alias("sum_charge"),
            (F.sum(qty).cast("double") / n).alias("avg_qty"),
            (F.sum(price).cast("double") / n).alias("avg_price"),
            (F.sum(F.col("l_discount").cast("decimal(25,6)")).cast("double") / n).alias(
                "avg_disc"
            ),
            n.alias("count_order"),
        )
    )


_Q01_SQL = f"""
SELECT l_returnflag, l_linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(25,4))) AS DOUBLE) AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,4))) AS DOUBLE) AS sum_base_price,
  {_sql_dsum(_REV)} AS sum_disc_price,
  {_sql_dsum_str(_REV + ' * (1 + l_tax)', 8)} AS sum_charge,
  CAST(SUM(CAST(l_quantity AS DECIMAL(25,4))) AS DOUBLE) / COUNT(*) AS avg_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,4))) AS DOUBLE) / COUNT(*) AS avg_price,
  CAST(SUM(CAST(l_discount AS DECIMAL(25,6))) AS DOUBLE) / COUNT(*) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def q03_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3: 3-way join + top-N (broadcast the filtered dimension)."""
    cust = load_table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < "1998-06-01"
    )
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > "1998-06-01")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(_dsum(_rev()).alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
        )
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


_Q03_SQL = f"""
SELECT l_orderkey, {_sql_dsum(_REV)} AS revenue,
       STRFTIME(o_orderdate, '%Y-%m-%d') AS o_orderdate
FROM customer JOIN orders ON c_custkey = o_custkey JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
  AND l_shipdate > TIMESTAMP '1998-06-01 00:00:00'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey LIMIT 10
"""


def q04_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS via left-semi join with an inequality
    (SURVEY §2.5 J3)."""
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1997-07-01") & (F.col("o_orderdate") < "1997-10-01")
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        orders.join(
            li,
            (orders.o_orderkey == li.l_orderkey) & (li.l_shipdate > orders.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


_Q04_SQL = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-07-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-10-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
"""


def q05_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5: 6-way join; dims broadcast, facts shuffle on keys."""
    t = {n: load_table(spark, sf_dir, n) for n in
         ("customer", "orders", "lineitem", "supplier", "nation", "region")}
    orders = t["orders"].where(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    return (
        t["lineitem"]
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(t["supplier"]),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .where(F.col("r_name") == "ASIA")
        .groupBy("n_name")
        .agg(_dsum_str(_rev()).alias("revenue"))
    )


_Q05_SQL = f"""
SELECT n_name, {_sql_dsum_str(_REV)} AS revenue
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name
"""


def q06_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pushdown-friendly filter + single agg."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1998-01-01")
            & (F.col("l_discount") >= 0.02)
            & (F.col("l_discount") <= 0.06)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            _dsum_str(F.col("l_extendedprice") * F.col("l_discount"), 8).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


_Q06_SQL = f"""
SELECT {_sql_dsum_str('l_extendedprice * l_discount', 8)} AS revenue, COUNT(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_discount >= 0.02 AND l_discount <= 0.06 AND l_quantity < 24
"""


def q08_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: per-year conditional market share (exact-decimal
    numerator/denominator -> identical double division)."""
    t = {n: load_table(spark, sf_dir, n) for n in
         ("part", "supplier", "lineitem", "orders", "customer", "nation", "region")}
    joined = (
        t["lineitem"]
        .join(F.broadcast(t["part"].where(F.col("p_type") == "ECONOMY")),
              F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"].alias("cn")),
              F.col("c_nationkey") == F.col("cn.n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("cn.n_regionkey") == F.col("r_regionkey"))
        .join(F.broadcast(t["nation"].alias("sn")),
              F.col("s_nationkey") == F.col("sn.n_nationkey"))
        .where(
            (F.col("r_name") == "AMERICA")
            & (F.col("o_orderdate") >= "1996-01-01")
            & (F.col("o_orderdate") < "1998-01-01")
        )
    )
    vol = _rev().cast("decimal(25,6)")
    national = F.when(F.col("sn.n_name") == "NATION_7", vol).otherwise(
        F.lit(0).cast("decimal(25,6)")
    )
    return (
        joined.groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (F.sum(national).cast("double") / F.sum(vol).cast("double")).alias("mkt_share"),
            F.sum(vol).cast("double").alias("total_volume"),
        )
    )


_Q08_SQL = f"""
SELECT CAST(YEAR(o_orderdate) AS INT) AS o_year,
  CAST(SUM(CASE WHEN sn.n_name = 'NATION_7' THEN CAST({_REV} AS DECIMAL(25,6))
                ELSE CAST(0 AS DECIMAL(25,6)) END) AS DOUBLE)
    / CAST(SUM(CAST({_REV} AS DECIMAL(25,6))) AS DOUBLE) AS mkt_share,
  CAST(SUM(CAST({_REV} AS DECIMAL(25,6))) AS DOUBLE) AS total_volume
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
JOIN region ON cn.n_regionkey = r_regionkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY YEAR(o_orderdate)
"""


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: returned-item revenue per customer, top 20."""
    t = {n: load_table(spark, sf_dir, n) for n in
         ("customer", "orders", "lineitem", "nation")}
    orders = t["orders"].where(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1997-04-01")
    )
    return (
        t["lineitem"].where(F.col("l_returnflag") == "R")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(_dsum(_rev()).alias("revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


_Q10_SQL = f"""
SELECT c_custkey, c_name, c_acctbal, n_name, {_sql_dsum(_REV)} AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey LIMIT 20
"""


def q_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate + broadcast join + deterministic top-N (SURVEY §2.6)."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return (
        orders.groupBy("o_custkey")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(25,4)")).cast("double").alias(
                "total_spent"
            ),
            F.count("*").alias("n_orders"),
        )
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .select("c_custkey", "c_name", "total_spent", "n_orders")
        .orderBy(F.desc("total_spent"), "c_custkey")
        .limit(10)
    )


_Q_TOP_CUSTOMERS_SQL = """
SELECT c_custkey, c_name,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(25,4))) AS DOUBLE) AS total_spent,
  COUNT(*) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_custkey, c_name
ORDER BY total_spent DESC, c_custkey LIMIT 10
"""


def q_distinct_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-row distinct (SURVEY §2.4 O2)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select("l_returnflag", "l_linestatus").distinct()


_Q_DISTINCT_SQL = "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem"


def q_dedup_keep_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subset-keyed dedup keep-last (SURVEY §2.4 O3) via the library
    operator (deterministic presort on ts, event_id)."""
    from pydala_spark.dataset.reader import apply_distinct

    ev = load_table(spark, sf_dir, "events")
    out = apply_distinct(
        ev,
        subset=["user_id", "event_type"],
        keep="last",
        presort=[("ts", True), ("event_id", True)],
    )
    return out.select("user_id", "event_type", "event_id", "value")


_Q_DEDUP_SQL = """
SELECT user_id, event_type, event_id, value FROM (
  SELECT user_id, event_type, event_id, value,
         ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events) WHERE rn = 1
"""


def q_window_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K per group via ranking window (SURVEY §2.6 A5 window aggs)."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= 3)
        .select("o_custkey", "o_orderkey", "rnk", "o_totalprice")
    )


_Q_WINDOW_TOPK_SQL = """
SELECT o_custkey, o_orderkey, rnk, o_totalprice FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk
  FROM orders) WHERE rnk <= 3
"""


def q_time_bucket_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-day buckets — the reference's generate_series time grid
    (SURVEY §2.2 W8) as a derived bucket column."""
    from pydala_spark.dataset.writer import bucket_column

    ev = load_table(spark, sf_dir, "events")
    return (
        ev.withColumn("day", F.date_format(bucket_column("ts", "1d"), "yyyy-MM-dd"))
        .groupBy("day", "event_type")
        .agg(F.count("*").alias("n"), _dsum(F.col("value")).alias("sum_value"))
    )


_Q_TIME_BUCKET_SQL = f"""
SELECT STRFTIME(DATE_TRUNC('day', CAST(ts AS TIMESTAMP)), '%Y-%m-%d') AS day, event_type,
       COUNT(*) AS n, {_sql_dsum('value')} AS sum_value
FROM events GROUP BY 1, 2
"""


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: 30-min-gap session counts per user (lag + cumsum)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = 30 * 60 * 1_000_000
    new_session = F.when(
        F.lag("ts").over(w).isNull()
        | ((F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))) > gap_us),
        1,
    ).otherwise(0)
    return (
        ev.withColumn("new_s", new_session)
        .groupBy("user_id")
        .agg(F.sum("new_s").alias("n_sessions"), F.count("*").alias("n_events"))
    )


_Q_SESSIONIZE_SQL = """
SELECT user_id, CAST(SUM(new_s) AS BIGINT) AS n_sessions, COUNT(*) AS n_events
FROM (
  SELECT user_id,
    CASE WHEN lag(ts) OVER w IS NULL
           OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
) GROUP BY user_id
"""


def q_asof_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each click matched to the user's most recent purchase
    at-or-before it (library operator, SURVEY §7.2 extension)."""
    from pydala_spark.operators.asof import asof_join

    ev = load_table(spark, sf_dir, "events")
    purchases = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("purchase_id"))
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id")
    )
    out = asof_join(
        clicks, purchases, on="ts", by="user_id", right_cols=["purchase_id"]
    )
    return out.select("click_id", "purchase_id")


_Q_ASOF_SQL = """
WITH p AS (
  SELECT user_id, ts, MAX(event_id) AS purchase_id
  FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
), c AS (
  SELECT user_id, ts, event_id AS click_id FROM events WHERE event_type = 'click'
)
SELECT c.click_id, p.purchase_id
FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.ts >= p.ts
"""


def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketized interval-containment join (SURVEY §2.5 extension —
    reference range predicates run on DuckDB's IEJoin): clicks attributed
    to the 15-minute window after each same-user error event, aggregated
    per window. Equi-join on (time bin, user_id), never a nested loop."""
    from pydala_spark.operators.rangejoin import time_range_join

    ev = load_table(spark, sf_dir, "events")
    errors = ev.where(F.col("event_type") == "error").select(
        F.col("event_id").alias("err_id"),
        "user_id",
        F.col("ts").alias("w_start"),
        (F.col("ts") + F.expr("INTERVAL 15 MINUTE")).alias("w_end"),
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("c_ts"), "value"
    )
    j = time_range_join(
        clicks, errors, "c_ts", "w_start", "w_end", on=["user_id"], bucket="15min"
    )
    return j.groupBy("err_id").agg(
        F.count("*").alias("n_clicks"), _dsum(F.col("value"), 4).alias("sum_value")
    )


_Q_RANGE_JOIN_SQL = """
WITH e AS (
  SELECT event_id AS err_id, user_id, CAST(ts AS TIMESTAMP) AS w_start,
         CAST(ts AS TIMESTAMP) + INTERVAL 15 MINUTE AS w_end
  FROM events WHERE event_type = 'error'
), c AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS c_ts, value
  FROM events WHERE event_type = 'click'
)
SELECT err_id, CAST(COUNT(*) AS BIGINT) AS n_clicks,
       CAST(SUM(CAST(value AS DECIMAL(25,4))) AS DOUBLE) AS sum_value
FROM c JOIN e ON c.user_id = e.user_id AND c.c_ts BETWEEN e.w_start AND e.w_end
GROUP BY err_id
"""


def q_delta_diff_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-mode anti-diff as a query (SURVEY §2.2 W6): events on Jan 15
    whose (user_id, event_type) key was never seen before Jan 15."""
    from pydala_spark.dataset.writer import tables_diff

    ev = load_table(spark, sf_dir, "events").withColumn("h", F.hour("ts").cast("long"))
    incoming = ev.where(
        (F.col("ts") >= "2024-01-15") & (F.col("ts") < "2024-01-16")
    )
    existing = ev.where(F.col("ts") < "2024-01-15")
    diff = tables_diff(incoming, existing, subset=["user_id", "event_type", "h"])
    return diff.select("event_id", "user_id", "event_type", "h")


_Q_DELTA_DIFF_SQL = """
SELECT event_id, user_id, event_type, HOUR(CAST(ts AS TIMESTAMP)) AS h
FROM events i
WHERE ts >= TIMESTAMP '2024-01-15' AND ts < TIMESTAMP '2024-01-16'
  AND NOT EXISTS (
    SELECT 1 FROM events e
    WHERE e.ts < TIMESTAMP '2024-01-15'
      AND e.user_id IS NOT DISTINCT FROM i.user_id
      AND e.event_type IS NOT DISTINCT FROM i.event_type
      AND HOUR(CAST(e.ts AS TIMESTAMP)) IS NOT DISTINCT FROM
          HOUR(CAST(i.ts AS TIMESTAMP)))
"""


def q_part_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String functions + min/max/count-distinct per group (SURVEY §2.7),
    plus — as a tagged-union 'skew' family (round 4) — the
    ``skew_report`` heavy-hitter diagnostic over ``events.event_type``
    (row counts, row share, x-uniform ratio; exact-integer-division
    doubles, so both engines hash-match)."""
    from pydala_spark.operators.skew import skew_report

    part = load_table(spark, sf_dir, "part")
    null_d = F.lit(None).cast("double")
    brand = (
        part.withColumn("brand_no", F.regexp_replace("p_brand", "Brand#", "").cast("int"))
        .groupBy("brand_no")
        .agg(
            F.count("*").alias("n_parts"),
            F.countDistinct("p_type").alias("n_types"),
            F.min("p_retailprice").alias("min_price"),
            F.max("p_retailprice").alias("max_price"),
            F.max(F.upper(F.substring("p_name", 1, 3))).alias("max_prefix"),
        )
        .select(
            F.lit("brand").alias("src"), "brand_no", "n_parts", "n_types",
            "min_price", "max_price", "max_prefix",
            F.lit(None).cast("string").alias("skew_key"),
            F.lit(None).cast("long").alias("n_rows"),
            null_d.alias("row_share"), null_d.alias("x_uniform"),
        )
    )
    events = load_table(spark, sf_dir, "events")
    skew = skew_report(events, "event_type", top=5).select(
        F.lit("skew").alias("src"),
        F.lit(None).cast("int").alias("brand_no"),
        F.lit(None).cast("long").alias("n_parts"),
        F.lit(None).cast("long").alias("n_types"),
        null_d.alias("min_price"), null_d.alias("max_price"),
        F.lit(None).cast("string").alias("max_prefix"),
        F.col("event_type").alias("skew_key"),
        "n_rows", "row_share", "x_uniform",
    )
    return brand.unionByName(skew)


_Q_PART_STATS_SQL = """
SELECT 'brand' AS src,
  CAST(REGEXP_REPLACE(p_brand, 'Brand#', '', 'g') AS INTEGER) AS brand_no,
  COUNT(*) AS n_parts, COUNT(DISTINCT p_type) AS n_types,
  MIN(p_retailprice) AS min_price, MAX(p_retailprice) AS max_price,
  MAX(UPPER(SUBSTRING(p_name, 1, 3))) AS max_prefix,
  CAST(NULL AS VARCHAR) AS skew_key, CAST(NULL AS BIGINT) AS n_rows,
  CAST(NULL AS DOUBLE) AS row_share, CAST(NULL AS DOUBLE) AS x_uniform
FROM part GROUP BY 2
UNION ALL
SELECT 'skew', CAST(NULL AS INTEGER), CAST(NULL AS BIGINT),
  CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
  CAST(NULL AS VARCHAR), skew_key, n_rows, row_share, x_uniform
FROM (
  SELECT event_type AS skew_key, n_rows,
         CAST(n_rows AS DOUBLE) / total AS row_share,
         CAST(n_rows * nk AS DOUBLE) / total AS x_uniform
  FROM (SELECT event_type, COUNT(*) AS n_rows FROM events GROUP BY 1),
       (SELECT COUNT(*) AS nk, SUM(cnt) AS total
        FROM (SELECT COUNT(*) AS cnt FROM events GROUP BY event_type))
  ORDER BY n_rows DESC, skew_key LIMIT 5
)
"""


CORE_QUERIES = {
    "q01_pricing_summary": q01_pricing_summary,
    "q03_shipping_priority": q03_shipping_priority,
    "q04_order_priority": q04_order_priority,
    "q05_local_supplier": q05_local_supplier,
    "q06_revenue_change": q06_revenue_change,
    "q08_market_share": q08_market_share,
    "q10_returned_items": q10_returned_items,
    "q_top_customers": q_top_customers,
    "q_distinct_flags": q_distinct_flags,
    "q_dedup_keep_last": q_dedup_keep_last,
    "q_window_topk": q_window_topk,
    "q_time_bucket_daily": q_time_bucket_daily,
    "q_sessionize": q_sessionize,
    "q_asof_purchase": q_asof_purchase,
    "q_range_join": q_range_join,
    "q_delta_diff_events": q_delta_diff_events,
    "q_part_stats": q_part_stats,
}

CORE_ORACLE = {
    "q01_pricing_summary": _Q01_SQL,
    "q03_shipping_priority": _Q03_SQL,
    "q04_order_priority": _Q04_SQL,
    "q05_local_supplier": _Q05_SQL,
    "q06_revenue_change": _Q06_SQL,
    "q08_market_share": _Q08_SQL,
    "q10_returned_items": _Q10_SQL,
    "q_top_customers": _Q_TOP_CUSTOMERS_SQL,
    "q_distinct_flags": _Q_DISTINCT_SQL,
    "q_dedup_keep_last": _Q_DEDUP_SQL,
    "q_window_topk": _Q_WINDOW_TOPK_SQL,
    "q_time_bucket_daily": _Q_TIME_BUCKET_SQL,
    "q_sessionize": _Q_SESSIONIZE_SQL,
    "q_asof_purchase": _Q_ASOF_SQL,
    "q_range_join": _Q_RANGE_JOIN_SQL,
    "q_delta_diff_events": _Q_DELTA_DIFF_SQL,
    "q_part_stats": _Q_PART_STATS_SQL,
}
