"""Relational operator inventory over the TPC-H-ish testdata (SURVEY §2).

Every query here is a declarative DataFrame program — Catalyst handles
pushdown/pruning/join selection; small dimension tables are explicitly
broadcast so the plan is shuffle-free where possible at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from . import QuerySpec, load


def _cents(col):
    """Exact scaled-integer view of a 2-decimal money/percentage column.

    Summing doubles is order-sensitive, and Spark and DuckDB reduce in
    different orders — a sum landing on a .xx5 rounding boundary flips the
    last digit between engines. All source money columns carry exactly two
    decimals, so ``round(x*100)`` as a long is exact, integer sums are
    order-independent, and the final divide-by-100 is bit-identical.
    """
    return F.round(col * 100, 0).cast("long")


def _money2(sum_col, divisor: int):
    """``round(sum/divisor, 2)`` with the tie decided in EXACT integer
    arithmetic (half away from zero — Spark's HALF_UP semantics).

    ``F.round(s / 10000.0, 2)`` ties whenever an integer micro-unit sum
    ends in exactly 50: Spark rounds the decimal shortest-repr UP while
    DuckDB rounds the binary double to nearest — observed flipping
    window_top3_parts_per_supplier at sf0.1 (151706.895 -> 151706.9 vs
    151706.89). Doing the half-step in integers removes the tie from
    float-land entirely; Spark-side values are UNCHANGED (HALF_UP ==
    the +h integer div for every value).

    The quotient itself is DECIMAL division, not double: ``x / step``
    in double arithmetic truncate-casts wrongly once the sum nears a
    large multiple of step (first counterexample at 1e16 micro-units:
    9999999999999999/10000 -> 1000000000000 instead of 999999999999,
    because the >2^53 numerator rounds UP to the multiple before
    dividing). Group sums at the 100 TB design point reach that range,
    so the division is done at decimal(38,0) — exact for every i64 —
    and only the final /100 display step is double (the long->double
    rounding there is identical in both engines).
    """
    step = divisor // 100  # 2dp output
    sign = F.when(sum_col < 0, F.lit(-1)).otherwise(F.lit(1))
    q = (
        ((F.abs(sum_col) + step // 2).cast("decimal(38,0)") / F.lit(step))
        .cast("long")
    )
    return sign * q / F.lit(100.0)


def _money2_sql(expr: str, divisor: int) -> str:
    """DuckDB mirror of :func:`_money2` (``//`` is exact BIGINT div)."""
    step = divisor // 100
    return (
        f"((CASE WHEN ({expr}) < 0 THEN -1 ELSE 1 END)"
        f" * ((abs({expr}) + {step // 2}) // {step})) / 100.0"
    )


_REV_SUM_SQL = (
    "sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)"
    " * (100 - CAST(round(l_discount * 100, 0) AS BIGINT)))"
)


def _revenue_cents():
    """sum(extendedprice * (1 - discount)) in exact integer arithmetic."""
    price_c = _cents(F.col("l_extendedprice"))
    disc_c = _cents(F.col("l_discount"))
    return _money2(F.sum(price_c * (100 - disc_c)), 10000)


# ---------------------------------------------------------------------------
# q1: pricing summary — the canonical groupBy-agg (A* family).
# Full scan + 8 aggregates; map-side partial aggregation keeps the shuffle
# tiny (4 groups) regardless of input size.
def q1_pricing_summary(spark: SparkSession, sf: str) -> DataFrame:
    l = load(spark, sf, "lineitem").where(F.col("l_shipdate") <= "1998-09-02")
    # exact integer-cents arithmetic: prices/discounts/taxes are 2-decimal
    # values, so sums computed over scaled longs are bit-identical across
    # engines (no float-summation-order sensitivity at any scale)
    price_c = _cents(F.col("l_extendedprice"))
    disc_c = _cents(F.col("l_discount"))
    tax_c = _cents(F.col("l_tax"))
    qty_c = _cents(F.col("l_quantity"))
    return (
        l.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum(qty_c) / 100.0, 2).alias("sum_qty"),
            F.round(F.sum(price_c) / 100.0, 2).alias("sum_base_price"),
            _money2(F.sum(price_c * (100 - disc_c)), 10000).alias("sum_disc_price"),
            _money2(
                F.sum(price_c * (100 - disc_c) * (100 + tax_c)), 1000000
            ).alias("sum_charge"),
            F.round(F.sum(qty_c) / 100.0 / F.count("*"), 4).alias("avg_qty"),
            F.round(F.sum(price_c) / 100.0 / F.count("*"), 4).alias("avg_price"),
            F.round(F.sum(disc_c) / 100.0 / F.count("*"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


Q1_SQL = f"""
SELECT l_returnflag, l_linestatus,
       round(sum(qty_c) / 100.0, 2)                                   AS sum_qty,
       round(sum(price_c) / 100.0, 2)                                 AS sum_base_price,
       {_money2_sql('sum(price_c * (100 - disc_c))', 10000)} AS sum_disc_price,
       {_money2_sql('sum(price_c * (100 - disc_c) * (100 + tax_c))', 1000000)} AS sum_charge,
       round(sum(qty_c) / 100.0 / count(*), 4)                        AS avg_qty,
       round(sum(price_c) / 100.0 / count(*), 4)                      AS avg_price,
       round(sum(disc_c) / 100.0 / count(*), 4)                       AS avg_disc,
       count(*)                                                       AS count_order
FROM (SELECT l_returnflag, l_linestatus, l_shipdate,
             CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS price_c,
             CAST(round(l_discount * 100, 0) AS BIGINT)      AS disc_c,
             CAST(round(l_tax * 100, 0) AS BIGINT)           AS tax_c,
             CAST(round(l_quantity * 100, 0) AS BIGINT)      AS qty_c
      FROM lineitem)
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


# ---------------------------------------------------------------------------
# q3: shipping priority — 3-way join + agg + deterministic top-k.
def q3_shipping_priority(spark: SparkSession, sf: str) -> DataFrame:
    c = load(spark, sf, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf, "orders").where(F.col("o_orderdate") < "1996-06-15")
    l = load(spark, sf, "lineitem").where(F.col("l_shipdate") > "1996-06-15")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        # customer is the small side after the segment filter -> broadcast
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(_revenue_cents().alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


Q3_SQL = f"""
SELECT l_orderkey,
       {_money2_sql(_REV_SUM_SQL, 10000)} AS revenue,
       strftime(o_orderdate, '%Y-%m-%d')                 AS orderdate,
       o_orderpriority
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1996-06-15 00:00:00'
  AND l_shipdate  > TIMESTAMP '1996-06-15 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


# ---------------------------------------------------------------------------
# q5: local supplier volume — 6-way star join; all dims broadcast.
def q5_local_supplier_volume(spark: SparkSession, sf: str) -> DataFrame:
    r = load(spark, sf, "region").where(F.col("r_name") == "ASIA")
    n = load(spark, sf, "nation")
    c = load(spark, sf, "customer")
    s = load(spark, sf, "supplier")
    o = load(spark, sf, "orders").where(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    l = load(spark, sf, "lineitem")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(_revenue_cents().alias("revenue"), F.count("*").alias("n_lines"))
    )


Q5_SQL = f"""
SELECT n_name,
       {_money2_sql(_REV_SUM_SQL, 10000)} AS revenue,
       count(*)                                          AS n_lines
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey  = c_custkey
JOIN supplier ON l_suppkey  = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name
"""


# ---------------------------------------------------------------------------
# Semi-join (EXISTS): orders with any heavy line (J-family; left_semi keeps
# the probe side unduplicated — no post-join distinct needed).
def join_semi_heavy_orders(spark: SparkSession, sf: str) -> DataFrame:
    o = load(spark, sf, "orders")
    l = load(spark, sf, "lineitem").where(F.col("l_quantity") >= 48)
    return (
        o.join(l, o.o_orderkey == l.l_orderkey, "left_semi")
        .select(
            "o_orderkey",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            "o_orderstatus",
        )
    )


SEMI_SQL = """
SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice, o_orderstatus
FROM orders o
WHERE EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 48)
"""


# Anti-join (NOT EXISTS): customers with no urgent orders (U-family).
def join_anti_idle_customers(spark: SparkSession, sf: str) -> DataFrame:
    c = load(spark, sf, "customer")
    o = load(spark, sf, "orders").where(F.col("o_orderpriority") == "1-URGENT")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


ANTI_SQL = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
"""


# ---------------------------------------------------------------------------
# Window: deterministic top-3 parts per supplier by revenue (O-family).
# Revenue rounded BEFORE ranking so rank order is engine-independent;
# remaining ties broken by part key.
def window_top3_parts_per_supplier(spark: SparkSession, sf: str) -> DataFrame:
    l = load(spark, sf, "lineitem")
    # ONE shuffle, not two: hash-partitioning on l_suppkey alone satisfies
    # both the (l_suppkey, l_partkey) aggregation (subset clustering) and
    # the window partition — without this, the agg exchanges on both keys
    # and the window re-exchanges on l_suppkey
    rev = (
        l.repartition("l_suppkey")
        .groupBy("l_suppkey", "l_partkey")
        .agg(_revenue_cents().alias("revenue"))
    )
    w = W.partitionBy("l_suppkey").orderBy(F.col("revenue").desc(), F.col("l_partkey"))
    return (
        rev.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 3)
        .select("l_suppkey", "l_partkey", "revenue", "rank")
    )


TOP3_SQL = f"""
WITH rev AS (
  SELECT l_suppkey, l_partkey,
         {_money2_sql(_REV_SUM_SQL, 10000)} AS revenue
  FROM lineitem GROUP BY l_suppkey, l_partkey
)
SELECT l_suppkey, l_partkey, revenue, rank FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY l_suppkey
                                    ORDER BY revenue DESC, l_partkey) AS INT) AS rank
  FROM rev
) WHERE rank <= 3
"""


# Window: running total per customer (frame-based window agg).
def window_running_customer_spend(spark: SparkSession, sf: str) -> DataFrame:
    o = load(spark, sf, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum(_cents(F.col("o_totalprice"))).over(w) / 100.0, 2).alias(
            "running_spend"
        ),
    )


RUNNING_SQL = """
SELECT o_custkey, o_orderkey,
       round(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
               OVER (PARTITION BY o_custkey
                     ORDER BY o_orderdate, o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / 100.0, 2)
       AS running_spend
FROM orders
"""


# Window: lag/lead — days since a customer's previous order (O3/C10 family).
def window_order_gaps(spark: SparkSession, sf: str) -> DataFrame:
    o = load(spark, sf, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.datediff(F.col("o_orderdate"), F.lag("o_orderdate").over(w)).alias(
            "days_since_prev"
        ),
    )


GAPS_SQL = """
SELECT o_custkey, o_orderkey,
       CAST(date_diff('day',
                      lag(o_orderdate) OVER (PARTITION BY o_custkey
                                             ORDER BY o_orderdate, o_orderkey),
                      o_orderdate) AS INT) AS days_since_prev
FROM orders
"""


# ---------------------------------------------------------------------------
# Rollup: hierarchical aggregate (grouping sets).
def agg_rollup_returns(spark: SparkSession, sf: str) -> DataFrame:
    l = load(spark, sf, "lineitem")
    return (
        l.rollup("l_returnflag", "l_linestatus")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"), F.count("*").alias("n"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "sum_qty",
            "n",
        )
    )


ROLLUP_SQL = """
SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
       coalesce(l_linestatus, 'ALL') AS linestatus,
       round(sum(l_quantity), 2)     AS sum_qty,
       count(*)                      AS n
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


# Cube over events (grouping sets, second shape).
def agg_cube_events(spark: SparkSession, sf: str) -> DataFrame:
    e = load(spark, sf, "events")
    return (
        e.withColumn("day", F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd"))
        .cube("event_type", "day")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(_cents(F.col("value"))) / 100.0, 2).alias("total_value"),
        )
        .select(
            F.coalesce("event_type", F.lit("ALL")).alias("event_type"),
            F.coalesce("day", F.lit("ALL")).alias("day"),
            "n",
            "total_value",
        )
    )


CUBE_SQL = """
SELECT coalesce(event_type, 'ALL')                           AS event_type,
       coalesce(strftime(date_trunc('day', ts), '%Y-%m-%d'), 'ALL') AS day,
       count(*)                                              AS n,
       round(sum(CAST(round(value * 100, 0) AS BIGINT)) / 100.0, 2) AS total_value
FROM events
GROUP BY CUBE (event_type, strftime(date_trunc('day', ts), '%Y-%m-%d'))
"""


# ---------------------------------------------------------------------------
# Pivot: event_type counts per user cohort.
_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def pivot_event_cohorts(spark: SparkSession, sf: str) -> DataFrame:
    e = load(spark, sf, "events")
    piv = (
        e.withColumn("cohort", (F.col("user_id") % 10).cast("long"))
        .groupBy("cohort")
        .pivot("event_type", _EVENT_TYPES)
        .count()
    )
    return piv.select(
        "cohort", *[F.coalesce(F.col(t), F.lit(0)).alias(t) for t in _EVENT_TYPES]
    )


PIVOT_SQL = """
SELECT user_id % 10                                   AS cohort,
       count(*) FILTER (event_type = 'click')    AS click,
       count(*) FILTER (event_type = 'error')    AS error,
       count(*) FILTER (event_type = 'purchase') AS purchase,
       count(*) FILTER (event_type = 'signup')   AS signup,
       count(*) FILTER (event_type = 'view')     AS view
FROM events GROUP BY cohort
"""


# Unpivot / stack: wide per-part price stats to long form.
def unpivot_part_metrics(spark: SparkSession, sf: str) -> DataFrame:
    p = load(spark, sf, "part")
    wide = p.groupBy("p_brand").agg(
        F.round(F.min("p_retailprice"), 2).alias("min_price"),
        F.round(F.max("p_retailprice"), 2).alias("max_price"),
        F.round(F.sum(_cents(F.col("p_retailprice"))) / 100.0 / F.count("*"), 4).alias(
            "avg_price"
        ),
    )
    return wide.selectExpr(
        "p_brand",
        "stack(3, 'min_price', min_price, 'max_price', max_price, 'avg_price', avg_price)"
        " AS (metric, value)",
    )


UNPIVOT_SQL = """
WITH wide AS (
  SELECT p_brand,
         round(min(p_retailprice), 2) AS min_price,
         round(max(p_retailprice), 2) AS max_price,
         round(sum(CAST(round(p_retailprice * 100, 0) AS BIGINT)) / 100.0 / count(*), 4)
           AS avg_price
  FROM part GROUP BY p_brand
)
SELECT p_brand, metric, value FROM wide
UNPIVOT (value FOR metric IN (min_price, max_price, avg_price))
"""


# ---------------------------------------------------------------------------
# Set operations (U-family).
def set_ops_segments(spark: SparkSession, sf: str) -> DataFrame:
    c = load(spark, sf, "customer")
    o = load(spark, sf, "orders")
    big_spenders = (
        o.groupBy("o_custkey")
        .agg(F.sum(_cents(F.col("o_totalprice"))).alias("t"))
        .where(F.col("t") > 50000000)
        .select(F.col("o_custkey").alias("custkey"))
    )
    building = c.where(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("custkey")
    )
    inter = big_spenders.intersect(building).withColumn("set_op", F.lit("intersect"))
    # subtract = EXCEPT DISTINCT, matching the oracle's EXCEPT exactly
    # (both inputs are key-distinct here, but keep the semantics aligned
    # rather than relying on that)
    minus = big_spenders.subtract(building).withColumn("set_op", F.lit("except"))
    return inter.unionByName(minus)


SETOPS_SQL = """
WITH big AS (
  SELECT o_custkey AS custkey FROM orders
  GROUP BY o_custkey
  HAVING sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) > 50000000
), bld AS (
  SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
)
SELECT custkey, 'intersect' AS set_op FROM (SELECT * FROM big INTERSECT SELECT * FROM bld)
UNION ALL
SELECT custkey, 'except'    AS set_op FROM (SELECT * FROM big EXCEPT    SELECT * FROM bld)
"""


# ---------------------------------------------------------------------------
# Scalar-function surface (C-family): string/date/math/json in one query.
def scalar_functions_orders(spark: SparkSession, sf: str) -> DataFrame:
    o = load(spark, sf, "orders").where(F.col("o_orderkey") % 100 == 0)
    return o.select(
        "o_orderkey",
        F.concat_ws("-", F.lit("ord"), F.col("o_orderkey").cast("string")).alias("tag"),
        F.upper("o_orderpriority").alias("prio_upper"),
        F.substring("o_orderpriority", 1, 1).cast("int").alias("prio_num"),
        F.date_format("o_orderdate", "yyyy-MM").alias("month"),
        F.year("o_orderdate").alias("yr"),
        F.quarter("o_orderdate").alias("qtr"),
        F.round(F.log(F.col("o_totalprice") + 1), 4).alias("log_price"),
        F.round(F.sqrt("o_totalprice"), 4).alias("sqrt_price"),
        F.length("o_orderstatus").alias("status_len"),
    )


SCALAR_SQL = """
SELECT o_orderkey,
       concat_ws('-', 'ord', CAST(o_orderkey AS VARCHAR)) AS tag,
       upper(o_orderpriority)                              AS prio_upper,
       CAST(substring(o_orderpriority, 1, 1) AS INT)       AS prio_num,
       strftime(o_orderdate, '%Y-%m')                      AS month,
       CAST(year(o_orderdate) AS INT)                      AS yr,
       CAST(quarter(o_orderdate) AS INT)                   AS qtr,
       round(ln(o_totalprice + 1), 4)                      AS log_price,
       round(sqrt(o_totalprice), 4)                        AS sqrt_price,
       CAST(length(o_orderstatus) AS INT)                  AS status_len
FROM orders WHERE o_orderkey % 100 = 0
"""


# JSON extraction from the events.props column (C5 family).
def json_extract_events(spark: SparkSession, sf: str) -> DataFrame:
    e = load(spark, sf, "events")
    return (
        e.withColumn("k", F.get_json_object("props", "$.k").cast("long"))
        .groupBy((F.col("k") % 10).alias("k_mod"))
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(_cents(F.col("value"))) / 100.0, 2).alias("total_value"),
        )
    )


JSON_SQL = """
SELECT CAST(json_extract_string(props, 'k') AS BIGINT) % 10 AS k_mod,
       count(*)                                             AS n,
       round(sum(CAST(round(value * 100, 0) AS BIGINT)) / 100.0, 2) AS total_value
FROM events GROUP BY k_mod
"""


# ---------------------------------------------------------------------------
# Sessionization over events (lag + cumulative flag; SURVEY §2.9 / guide
# pattern). 30-minute inactivity gap.
def sessionize_user_events(spark: SparkSession, sf: str) -> DataFrame:
    e = load(spark, sf, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = e.withColumn(
        "new_session",
        (
            F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w)) > 1800
        ).cast("int"),
    ).withColumn("new_session", F.coalesce("new_session", F.lit(1)))
    return gaps.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.sum("new_session").alias("n_sessions"),
    )


SESSION_SQL = """
WITH g AS (
  SELECT user_id,
         CASE WHEN date_diff('second',
                             lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                             ts) > 1800
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
)
SELECT user_id, count(*) AS n_events, CAST(sum(new_session) AS BIGINT) AS n_sessions
FROM g GROUP BY user_id
"""


# ---------------------------------------------------------------------------
# Interval/range join (J10): clicks within 10 minutes before an error,
# same user. Equi-key on user_id bounds the blow-up; the time predicate
# is applied inside the join.
def range_join_error_attribution(spark: SparkSession, sf: str) -> DataFrame:
    e = load(spark, sf, "events")
    errors = e.where(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        F.col("user_id"),
        F.col("ts").alias("error_ts"),
    )
    clicks = e.where(F.col("event_type") == "click").select(
        F.col("user_id"), F.col("ts").alias("click_ts")
    )
    joined = errors.alias("err").join(
        clicks.alias("clk"),
        (F.col("err.user_id") == F.col("clk.user_id"))
        & (F.col("clk.click_ts") >= F.col("err.error_ts") - F.expr("INTERVAL 10 MINUTES"))
        & (F.col("clk.click_ts") <= F.col("err.error_ts")),
        "left",
    )
    return joined.groupBy("error_id").agg(
        F.count("clk.click_ts").alias("n_recent_clicks")
    )


RANGE_SQL = """
SELECT e.event_id AS error_id, count(c.ts) AS n_recent_clicks
FROM events e
LEFT JOIN events c
  ON c.user_id = e.user_id AND c.event_type = 'click'
 AND c.ts >= e.ts - INTERVAL 10 MINUTE AND c.ts <= e.ts
WHERE e.event_type = 'error'
GROUP BY e.event_id
"""


# ---------------------------------------------------------------------------
# Distinct-count shapes (exact; approx_count_distinct has no cross-engine
# oracle so the approximate variant lives in bench only).
def agg_distinct_parts_per_nation(spark: SparkSession, sf: str) -> DataFrame:
    s = load(spark, sf, "supplier")
    n = load(spark, sf, "nation")
    l = load(spark, sf, "lineitem")
    return (
        l.join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.countDistinct("l_partkey").alias("n_parts"),
            F.countDistinct("l_orderkey").alias("n_orders"),
        )
    )


DISTINCT_SQL = """
SELECT n_name,
       count(DISTINCT l_partkey)  AS n_parts,
       count(DISTINCT l_orderkey) AS n_orders
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
GROUP BY n_name
"""


# ---------------------------------------------------------------------------
# Explicit GROUPING SETS with grouping_id — the general form rollup/cube
# specialise; expressed through spark.sql over a temp view (the DataFrame
# API deliberately exposes only rollup/cube) so the SQL surface is
# exercised too. grouping_id disambiguates a NULL group key from a NULL
# data value — matched exactly across engines.
def agg_grouping_sets(spark: SparkSession, sf: str) -> DataFrame:
    e = load(spark, sf, "events")
    e.withColumn("hour_of_day", F.hour("ts")).createOrReplaceTempView(
        "_gs_events"
    )
    return spark.sql(
        """
        SELECT coalesce(event_type, 'ALL')             AS event_type,
               coalesce(CAST(hour_of_day AS STRING), 'ALL') AS hour_of_day,
               CAST(grouping_id(event_type, hour_of_day) AS INT) AS gid,
               count(*)                                AS n
        FROM _gs_events
        GROUP BY GROUPING SETS ((event_type, hour_of_day), (event_type), ())
        """
    )


GROUPING_SETS_SQL = """
SELECT coalesce(event_type, 'ALL')                  AS event_type,
       coalesce(CAST(hour_of_day AS VARCHAR), 'ALL') AS hour_of_day,
       CAST(grouping_id(event_type, hour_of_day) AS INT) AS gid,
       CAST(count(*) AS BIGINT)                     AS n
FROM (SELECT event_type, CAST(hour(ts) AS INT) AS hour_of_day FROM events) t
GROUP BY GROUPING SETS ((event_type, hour_of_day), (event_type), ())
"""


# ---------------------------------------------------------------------------
# Distribution windows: ntile quartiles + percent_rank over customer
# account balances within each market segment. percent_rank's
# (rank-1)/(n-1) is exact given identical orderings; ties share ranks in
# both engines.
def window_ntile_customers(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window as W

    c = load(spark, sf, "customer")
    bal_c = _cents(F.col("c_acctbal"))
    w = W.partitionBy("c_mktsegment").orderBy(bal_c, "c_custkey")
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
    )


NTILE_SQL = """
SELECT c_custkey, c_mktsegment,
       CAST(ntile(4) OVER w AS INT) AS quartile,
       round(percent_rank() OVER w, 6) AS pct_rank
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment
             ORDER BY CAST(round(c_acctbal * 100, 0) AS BIGINT), c_custkey)
"""


# ---------------------------------------------------------------------------
# RANGE-frame window: per customer, rolling 7-day spend — the frame is a
# VALUE range over event time, not a row count, so simultaneous orders
# are always in/out of the frame together (deterministic under ties,
# unlike a ROWS frame). Ordering key is integer epoch seconds; the sum
# is integer cents.
def window_rolling_week_spend(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window as W

    o = load(spark, sf, "orders")
    epoch = F.unix_timestamp(F.col("o_orderdate")).alias("epoch")
    base = o.select(
        "o_custkey", "o_orderkey", "o_orderdate", epoch, _cents(F.col("o_totalprice")).alias("cents")
    )
    w = (
        W.partitionBy("o_custkey")
        .orderBy("epoch")
        .rangeBetween(-7 * 86400, 0)
    )
    return base.select(
        "o_custkey",
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
        F.round(F.sum("cents").over(w) / 100.0, 2).alias("week_spend"),
    )


ROLLING_SQL = """
WITH b AS (
  SELECT o_custkey, o_orderkey, o_orderdate,
         CAST(epoch(CAST(o_orderdate AS TIMESTAMP)) AS BIGINT) AS ep,
         CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
  FROM orders
)
SELECT o_custkey, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS order_date,
       round(sum(cents) OVER (PARTITION BY o_custkey ORDER BY ep
                              RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW)
             / 100.0, 2) AS week_spend
FROM b
"""


QUERIES = {
    "q1_pricing_summary": QuerySpec(q1_pricing_summary, Q1_SQL),
    "q3_shipping_priority": QuerySpec(q3_shipping_priority, Q3_SQL),
    "q5_local_supplier_volume": QuerySpec(q5_local_supplier_volume, Q5_SQL),
    "join_semi_heavy_orders": QuerySpec(join_semi_heavy_orders, SEMI_SQL),
    "join_anti_idle_customers": QuerySpec(join_anti_idle_customers, ANTI_SQL),
    "window_top3_parts_per_supplier": QuerySpec(window_top3_parts_per_supplier, TOP3_SQL),
    "window_running_customer_spend": QuerySpec(window_running_customer_spend, RUNNING_SQL),
    "window_order_gaps": QuerySpec(window_order_gaps, GAPS_SQL),
    "agg_rollup_returns": QuerySpec(agg_rollup_returns, ROLLUP_SQL),
    "agg_cube_events": QuerySpec(agg_cube_events, CUBE_SQL),
    "pivot_event_cohorts": QuerySpec(pivot_event_cohorts, PIVOT_SQL),
    "unpivot_part_metrics": QuerySpec(unpivot_part_metrics, UNPIVOT_SQL),
    "set_ops_segments": QuerySpec(set_ops_segments, SETOPS_SQL),
    "scalar_functions_orders": QuerySpec(scalar_functions_orders, SCALAR_SQL),
    "json_extract_events": QuerySpec(json_extract_events, JSON_SQL),
    "sessionize_user_events": QuerySpec(sessionize_user_events, SESSION_SQL),
    "range_join_error_attribution": QuerySpec(range_join_error_attribution, RANGE_SQL),
    "agg_distinct_parts_per_nation": QuerySpec(agg_distinct_parts_per_nation, DISTINCT_SQL),
    "agg_grouping_sets": QuerySpec(agg_grouping_sets, GROUPING_SETS_SQL),
    "window_ntile_customers": QuerySpec(window_ntile_customers, NTILE_SQL),
    "window_rolling_week_spend": QuerySpec(window_rolling_week_spend, ROLLING_SQL),
}


# ---------------------------------------------------------------------------
# Skew-salted join, hash-gated for semantics preservation: the salted
# rewrite (operators/skew.py — big side salted, small side replicated
# per salt, join on (key, salt)) must produce EXACTLY the plain join's
# result; the oracle is the plain SQL join+agg, so any row the salting
# duplicated or dropped flips the value hash. Revenue sums are exact
# integer cents, immune to the salt-dependent summation order.
def join_salted_skew_revenue(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.skew import salted_join

    li = load(spark, sf, "lineitem").select(
        "l_suppkey",
        (
            F.round(F.col("l_extendedprice") * 100).cast("long")
            * (100 - F.round(F.col("l_discount") * 100).cast("long"))
        ).alias("rev_c4"),
    )
    sup = load(spark, sf, "supplier").select(
        F.col("s_suppkey").alias("l_suppkey"), "s_nationkey"
    )
    joined = salted_join(li, sup, "l_suppkey", n_salts=8)
    return joined.groupBy("s_nationkey").agg(
        F.count("*").alias("n_items"),
        _money2(F.sum("rev_c4"), 10000).alias("revenue"),
    )


SALTED_JOIN_SQL = f"""
SELECT s_nationkey,
       CAST(count(*) AS BIGINT) AS n_items,
       {_money2_sql(_REV_SUM_SQL, 10000)} AS revenue
FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
GROUP BY s_nationkey
"""

QUERIES["join_salted_skew_revenue"] = QuerySpec(
    join_salted_skew_revenue, SALTED_JOIN_SQL
)
