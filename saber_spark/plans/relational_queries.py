"""Relational operator coverage over the TPC-H-ish star schema.

The reference engine has none of these (SURVEY.md §2.6: no hash/broadcast
joins, no semi/anti/outer, no sorts/limits/top-k, no set ops, no rollup)
— they are required for a complete standalone engine and exercise
Catalyst's physical strategies explicitly:

- broadcast hash join for dimension tables (``F.broadcast``),
- shuffled join + partial aggregation for fact-fact,
- window functions (rank/top-k per group),
- semi/anti joins (EXISTS / NOT EXISTS),
- set operations, rollup.

Numeric discipline for oracle parity: sums over doubles accumulate in
DECIMAL (exact, order-independent) and only then cast to DOUBLE, so
Spark and DuckDB produce bit-identical values regardless of partial-agg
ordering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from saber_spark.plans.registry import register
from saber_spark.sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _dec_sum(col, scale: int = 6):
    """Exact decimal accumulation, surfaced as double (order-independent)."""
    return F.sum(col.cast("decimal(28,6)")).cast("double")


# --------------------------------------------------------------------------
# Q1-style: full-scan grouped aggregate with exact decimal sums
# --------------------------------------------------------------------------

_Q1_ORACLE = """
SELECT l_returnflag,
       l_linestatus,
       CAST(sum(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE)              AS sum_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE)         AS sum_base_price,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE)
                                                                            AS sum_disc_price,
       count(*)                                                             AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


@register("tpch_q1_pricing_summary", _Q1_ORACLE)
def tpch_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_shipdate") <= "1998-09-02")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        _dec_sum(F.col("l_quantity")).alias("sum_qty"),
        _dec_sum(F.col("l_extendedprice")).alias("sum_base_price"),
        _dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("sum_disc_price"),
        F.count(F.lit(1)).alias("count_order"),
    )


# --------------------------------------------------------------------------
# Q3-style: broadcast dimension join -> fact join -> grouped agg -> top-k
# --------------------------------------------------------------------------

_Q3_ORACLE = """
SELECT o.o_orderkey AS o_orderkey,
       CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(28,6))) AS DOUBLE)
           AS revenue,
       CAST(epoch(o.o_orderdate) AS BIGINT) AS orderdate_epoch
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l.l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
GROUP BY o.o_orderkey, o.o_orderdate
"""


@register("tpch_q3_shipping_priority", _Q3_ORACLE)
def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer is broadcast (dimension ≪ fact); lineitem⋈orders shuffles
    on orderkey once. At 100 TB the same plan holds: AQE keeps customer
    broadcast under the 64 MB threshold per partition of the build side."""
    c = _t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderdate") < "1998-03-15")
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > "1995-03-15")
    joined = li.join(o, li.l_orderkey == o.o_orderkey).join(
        F.broadcast(c), o.o_custkey == c.c_custkey
    )
    return joined.groupBy("o_orderkey", "o_orderdate").agg(
        _dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
    ).select(
        "o_orderkey",
        "revenue",
        F.col("o_orderdate").cast("timestamp").cast("long").alias("orderdate_epoch"),
    )


# --------------------------------------------------------------------------
# Top-k per group (window ranking) — absent in reference (§2.6 sorts/topk)
# --------------------------------------------------------------------------

_TOPK_ORACLE = """
SELECT c_custkey, o_orderkey, o_totalprice, rk
FROM (
    SELECT o_custkey AS c_custkey, o_orderkey, o_totalprice,
           row_number() OVER (PARTITION BY o_custkey
                              ORDER BY o_totalprice DESC, o_orderkey) AS rk
    FROM orders
)
WHERE rk <= 3
"""


@register("topk_orders_per_customer", _TOPK_ORACLE)
def topk_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.select(
            F.col("o_custkey").alias("c_custkey"),
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rk"),
        ).where(F.col("rk") <= 3)
    )


# --------------------------------------------------------------------------
# Semi / anti joins (EXISTS / NOT EXISTS)
# --------------------------------------------------------------------------

_SEMI_ORACLE = """
SELECT c_custkey, c_name
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
"""


def semi_join_big_spenders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(F.col("o_totalprice") > 300000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


_ANTI_ORACLE = """
SELECT c_custkey, c_mktsegment
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 250000)
"""


def anti_join_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with no order above 250k (NOT EXISTS → left_anti)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(F.col("o_totalprice") > 250000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_mktsegment"
    )


_JOIN_MODES_ORACLE = """
SELECT 'semi' AS mode, CAST(c_custkey AS VARCHAR) AS key,
       CAST(NULL AS BIGINT) AS n_customers, CAST(NULL AS DOUBLE) AS total_acctbal,
       c_name AS detail
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
UNION ALL
SELECT 'anti' AS mode, CAST(c_custkey AS VARCHAR) AS key,
       CAST(NULL AS BIGINT) AS n_customers, CAST(NULL AS DOUBLE) AS total_acctbal,
       c_mktsegment AS detail
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 250000)
UNION ALL
SELECT 'outer' AS mode, n.n_name AS key,
       count(c.c_custkey) AS n_customers,
       CAST(coalesce(sum(CAST(c.c_acctbal AS DECIMAL(28,6))), 0) AS DOUBLE) AS total_acctbal,
       CAST(NULL AS VARCHAR) AS detail
FROM nation n
LEFT JOIN customer c ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
"""


@register("join_modes_strategies", _JOIN_MODES_ORACLE)
def join_modes_strategies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi + anti + left-outer join in one driver entry (50-entry
    consolidation, absorbing round 3's `semi_anti_join_customers` and
    `outer_join_customers_per_nation`): left_semi (customers WITH a
    >300k order), left_anti (customers WITHOUT a >250k order), and the
    null-handling left-outer per-nation rollup, union-tagged by
    ``mode`` with each keeping its own value-checked rows. The
    standalone builders stay exported."""
    null_n = F.lit(None).cast("long")
    null_v = F.lit(None).cast("double")
    null_s = F.lit(None).cast("string")
    semi = semi_join_big_spenders(spark, sf_dir).select(
        F.lit("semi").alias("mode"),
        F.col("c_custkey").cast("string").alias("key"),
        null_n.alias("n_customers"),
        null_v.alias("total_acctbal"),
        F.col("c_name").alias("detail"),
    )
    anti = anti_join_customers_without_orders(spark, sf_dir).select(
        F.lit("anti").alias("mode"),
        F.col("c_custkey").cast("string").alias("key"),
        null_n.alias("n_customers"),
        null_v.alias("total_acctbal"),
        F.col("c_mktsegment").alias("detail"),
    )
    outer = outer_join_customers_per_nation(spark, sf_dir).select(
        F.lit("outer").alias("mode"),
        F.col("nation").alias("key"),
        "n_customers",
        "total_acctbal",
        null_s.alias("detail"),
    )
    return semi.unionByName(anti).unionByName(outer)


# --------------------------------------------------------------------------
# Outer join with null handling
# --------------------------------------------------------------------------

_OUTER_ORACLE = """
SELECT n.n_name AS nation,
       count(c.c_custkey) AS n_customers,
       CAST(coalesce(sum(CAST(c.c_acctbal AS DECIMAL(28,6))), 0) AS DOUBLE) AS total_acctbal
FROM nation n
LEFT JOIN customer c ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
"""


def outer_join_customers_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-outer + null-coalescing rollup; driver-checked through
    `join_modes_strategies` (oracle twin kept above as _OUTER_ORACLE)."""
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    return (
        n.join(c, c.c_nationkey == n.n_nationkey, "left")
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count("c_custkey").alias("n_customers"),
            F.coalesce(F.sum(F.col("c_acctbal").cast("decimal(28,6)")), F.lit(0))
            .cast("double")
            .alias("total_acctbal"),
        )
    )


# --------------------------------------------------------------------------
# Set operations
# --------------------------------------------------------------------------

_SETOP_ORACLE = """
SELECT user_id FROM events WHERE event_type = 'click'
INTERSECT
SELECT user_id FROM events WHERE event_type = 'purchase'
EXCEPT
SELECT user_id FROM events WHERE event_type = 'error' AND value > 195
"""


@register("setops_click_purchase_no_bigerror", _SETOP_ORACLE)
def setops_click_purchase_no_bigerror(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select("user_id")
    buys = ev.where(F.col("event_type") == "purchase").select("user_id")
    errs = ev.where((F.col("event_type") == "error") & (F.col("value") > 195)).select(
        "user_id"
    )
    return clicks.intersect(buys).exceptAll(errs.distinct())


# --------------------------------------------------------------------------
# Rollup (grouping sets)
# --------------------------------------------------------------------------

_ROLLUP_ORACLE = """
SELECT l_returnflag, l_linestatus,
       count(*) AS n_items,
       CAST(sum(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS sum_qty
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


@register("rollup_lineitem_status", _ROLLUP_ORACLE)
def rollup_lineitem_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(F.col("l_quantity").cast("decimal(28,6)")).cast("double").alias("sum_qty"),
    )


# --------------------------------------------------------------------------
# Scalar function surface beyond the reference (strings, dates, math)
# --------------------------------------------------------------------------

_SCALAR_ORACLE = """
SELECT o_orderkey,
       upper(o_orderpriority)                       AS prio_upper,
       substr(o_orderpriority, 1, 1)                AS prio_code,
       CAST(year(o_orderdate) AS INTEGER)           AS order_year,
       CAST(month(o_orderdate) AS INTEGER)          AS order_month,
       round(sqrt(o_totalprice), 4)                 AS sqrt_price,
       round(ln(o_totalprice + 1), 4)               AS log_price,
       length(o_orderstatus || o_orderpriority)     AS status_len
FROM orders
WHERE o_orderkey % 97 = 0
"""


# Registry rotation: driver-green r1-r3, rotated out in r4 (slot went to
# cep_match_strategies), ROTATED BACK IN for r5 — it is the sole driver
# row for the §2.6 scalar-function surface; the slot came from
# w2_projection_reduction (whose shapes w1 + row_window_aggs cover; its
# oracle lives on in tests/test_rotated_out.py).
@register("scalar_function_surface", _SCALAR_ORACLE)
def scalar_function_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderkey") % 97 == 0)
    return o.select(
        "o_orderkey",
        F.upper("o_orderpriority").alias("prio_upper"),
        F.substring("o_orderpriority", 1, 1).alias("prio_code"),
        F.year("o_orderdate").cast("int").alias("order_year"),
        F.month("o_orderdate").cast("int").alias("order_month"),
        F.round(F.sqrt("o_totalprice"), 4).alias("sqrt_price"),
        F.round(F.log(F.col("o_totalprice") + 1), 4).alias("log_price"),
        F.length(F.concat("o_orderstatus", "o_orderpriority")).alias("status_len"),
    )


# --------------------------------------------------------------------------
# Pivot / unpivot
# --------------------------------------------------------------------------

_PIVOT_ORACLE = """
SELECT user_id,
       CAST(count(*) FILTER (event_type = 'click')    AS BIGINT) AS n_click,
       CAST(count(*) FILTER (event_type = 'view')     AS BIGINT) AS n_view,
       CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT) AS n_purchase,
       CAST(sum(CAST(value AS DECIMAL(28,6))) FILTER (event_type = 'purchase') AS DOUBLE)
           AS purchase_value
FROM events
GROUP BY user_id
"""


def pivot_events_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: per-user event-type counts as wide columns (conditional
    aggregation — the distributed pivot pattern; Spark's .pivot() builds
    the same plan, written explicitly here so column names are stable)."""
    ev = _t(spark, sf_dir, "events")
    is_ = lambda t: F.col("event_type") == t  # noqa: E731
    return ev.groupBy("user_id").agg(
        F.count(F.when(is_("click"), 1)).alias("n_click"),
        F.count(F.when(is_("view"), 1)).alias("n_view"),
        F.count(F.when(is_("purchase"), 1)).alias("n_purchase"),
        F.sum(F.when(is_("purchase"), F.col("value").cast("decimal(28,6)")))
        .cast("double")
        .alias("purchase_value"),
    )


# --------------------------------------------------------------------------
# Unpivot (stack): wide per-row measures -> long (measure, value) rows
# --------------------------------------------------------------------------

_UNPIVOT_ORACLE = """
SELECT l_orderkey, l_linenumber, measure, CAST(val AS DOUBLE) AS val
FROM (
    SELECT l_orderkey, l_linenumber,
           unnest(['quantity', 'extendedprice', 'discount']) AS measure,
           unnest([l_quantity, l_extendedprice, l_discount]) AS val
    FROM lineitem
    WHERE l_orderkey % 199 = 0
)
"""


def unpivot_lineitem_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_orderkey") % 199 == 0)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.expr(
            "stack(3, 'quantity', l_quantity, 'extendedprice', l_extendedprice,"
            " 'discount', l_discount) AS (measure, val)"
        ),
    ).withColumn("val", F.col("val").cast("double"))


_PIVOT_UNPIVOT_ORACLE = """
WITH wide AS (
    SELECT user_id,
           CAST(count(*) FILTER (event_type = 'click')    AS BIGINT) AS n_click,
           CAST(count(*) FILTER (event_type = 'view')     AS BIGINT) AS n_view,
           CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT) AS n_purchase,
           CAST(sum(CAST(value AS DECIMAL(28,6))) FILTER (event_type = 'purchase') AS DOUBLE)
               AS purchase_value
    FROM events GROUP BY user_id
)
SELECT user_id, metric, CAST(val AS DOUBLE) AS val
FROM (
    SELECT user_id,
           unnest(['n_click', 'n_view', 'n_purchase', 'purchase_value']) AS metric,
           unnest([CAST(n_click AS DOUBLE), CAST(n_view AS DOUBLE),
                   CAST(n_purchase AS DOUBLE), purchase_value])          AS val
    FROM wide
)
"""


@register("pivot_unpivot_events", _PIVOT_UNPIVOT_ORACLE)
def pivot_unpivot_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot → unpivot round trip in one driver entry (50-entry
    consolidation): per-user event-type metrics pivoted wide, then
    stacked back to long (user_id, metric, val) rows — both reshaping
    operators value-checked by a single oracle. The standalone builders
    (``pivot_events_by_type``, ``unpivot_lineitem_measures``) stay
    exported and pytest-covered."""
    wide = pivot_events_by_type(spark, sf_dir)
    return wide.select(
        "user_id",
        F.expr(
            "stack(4, 'n_click', CAST(n_click AS DOUBLE),"
            " 'n_view', CAST(n_view AS DOUBLE),"
            " 'n_purchase', CAST(n_purchase AS DOUBLE),"
            " 'purchase_value', purchase_value) AS (metric, val)"
        ),
    )
