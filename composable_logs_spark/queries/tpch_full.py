"""TPC-H remainder (Q6, Q8-Q17, Q20, Q21) adapted to the testdata star
schema — completes the 22-query TPC-H surface together with
``relational.py`` (q1/q3/q5) and ``tpch_extra.py`` (q2/q4/q7/q18/q19/q22).

The testdata has no ``partsupp`` table and no
shipmode/commitdate/receiptdate/mfgr columns, so each query keeps the
classic SHAPE (the operator pattern TPC-H exercises) with stand-in
predicates:

- Q9/Q11/Q16/Q20: ``partsupp`` roles are played by the distinct
  (l_partkey, l_suppkey) pairs actually shipped; ``ps_supplycost`` by
  ``p_retailprice``.
- Q12: ``l_shipmode`` is played by ``l_linestatus``.
- Q21: late = shipped >90 days after the order date (no receipt/commit
  dates); the classic double EXISTS/NOT-EXISTS is rewritten as a
  two-level aggregation (per-(order,supplier) late flag, then per-order
  supplier counts) — the formulation a Spark engine should prefer anyway,
  since it is two hash aggregations instead of two correlated semi-joins.

All money math uses exact integer cents (see ``relational._cents``) so
Spark and DuckDB hashes agree regardless of reduction order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from . import QuerySpec, load
from .relational import _cents, _money2, _money2_sql, _revenue_cents

# Shared oracle fragment: exact revenue cents, scale 10^4.
_REV_C_SQL = (
    "CAST(round(l_extendedprice * 100, 0) AS BIGINT)"
    " * (100 - CAST(round(l_discount * 100, 0) AS BIGINT))"
)


# ---------------------------------------------------------------------------
# Q6: forecasting revenue change — pure scan-filter-agg, the pushdown
# showcase: all three predicates reach the parquet scan, no join, no
# shuffle beyond the final single-group reduce.
def q6_forecast_revenue(spark: SparkSession, sf: str) -> DataFrame:
    l = load(spark, sf, "lineitem")
    disc_c = _cents(F.col("l_discount"))
    price_c = _cents(F.col("l_extendedprice"))
    return (
        l.where(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & (F.col("l_quantity") < 24)
        )
        .where(disc_c.between(5, 7))
        .agg(
            _money2(F.sum(price_c * disc_c), 10000).alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


Q6_SQL = f"""
SELECT {_money2_sql('sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)'
                    ' * CAST(round(l_discount * 100, 0) AS BIGINT))', 10000)} AS revenue,
       count(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_quantity < 24
  AND CAST(round(l_discount * 100, 0) AS BIGINT) BETWEEN 5 AND 7
"""


# ---------------------------------------------------------------------------
# Q8: national market share — nested-agg ratio: NATION_2's share of ASIA
# customers' PROMO-part volume per order year. Conditional sum over one
# joined scan; every dimension side is broadcast.
def q8_market_share(spark: SparkSession, sf: str) -> DataFrame:
    l = load(spark, sf, "lineitem")
    o = load(spark, sf, "orders").where(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    p = load(spark, sf, "part").where(F.col("p_type") == "PROMO")
    s = load(spark, sf, "supplier")
    n_s = load(spark, sf, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    c = load(spark, sf, "customer")
    n_c = load(spark, sf, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("c_regionkey")
    )
    r = load(spark, sf, "region").where(F.col("r_name") == "ASIA")
    vol_c = _cents(F.col("l_extendedprice")) * (100 - _cents(F.col("l_discount")))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n_s), s.s_nationkey == F.col("sn_key"))
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n_c), c.c_nationkey == F.col("cn_key"))
        .join(F.broadcast(r), F.col("c_regionkey") == r.r_regionkey)
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_2", vol_c).otherwise(F.lit(0)))
                / F.sum(vol_c),
                4,
            ).alias("mkt_share"),
            _money2(F.sum(vol_c), 10000).alias("total_volume"),
        )
    )


Q8_SQL = f"""
SELECT CAST(year(o_orderdate) AS INT) AS o_year,
       round(sum(CASE WHEN n1.n_name = 'NATION_2' THEN {_REV_C_SQL} ELSE 0 END)
             / sum({_REV_C_SQL}), 4) AS mkt_share,
       {_money2_sql(f'sum({_REV_C_SQL})', 10000)} AS total_volume
FROM lineitem
JOIN orders    ON l_orderkey = o_orderkey
JOIN part      ON l_partkey = p_partkey
JOIN supplier  ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN customer  ON o_custkey = c_custkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
JOIN region    ON n2.n_regionkey = r_regionkey
WHERE r_name = 'ASIA' AND p_type = 'PROMO'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Q9: product-type profit — profit = revenue − cost with p_retailprice
# standing in for ps_supplycost, grouped by supplier nation × year.
def q9_product_profit(spark: SparkSession, sf: str) -> DataFrame:
    l = load(spark, sf, "lineitem")
    o = load(spark, sf, "orders")
    p = load(spark, sf, "part").where(F.col("p_type") == "STANDARD")
    s = load(spark, sf, "supplier")
    n = load(spark, sf, "nation")
    price_c = _cents(F.col("l_extendedprice"))
    disc_c = _cents(F.col("l_discount"))
    retail_c = _cents(F.col("p_retailprice"))
    qty_c = _cents(F.col("l_quantity"))
    amount_c = price_c * (100 - disc_c) - retail_c * qty_c  # both scale 10^4
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(_money2(F.sum(amount_c), 10000).alias("sum_profit"))
    )


Q9_SQL = f"""
SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
       {_money2_sql(f'sum({_REV_C_SQL}'
                    ' - CAST(round(p_retailprice * 100, 0) AS BIGINT)'
                    ' * CAST(round(l_quantity * 100, 0) AS BIGINT))', 10000)} AS sum_profit
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_type = 'STANDARD'
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Q10: returned-item reporting — agg then global top-20. The top-20 runs
# on the POST-aggregation output (one row per customer with returns in the
# window), so the single-partition sort touches thousands of rows, not the
# lineitem scan — fine at any input scale. Ties broken by c_custkey so the
# selected SET is deterministic.
def q10_returned_items(spark: SparkSession, sf: str) -> DataFrame:
    l = load(spark, sf, "lineitem").where(F.col("l_returnflag") == "R")
    o = load(spark, sf, "orders").where(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1997-07-01")
    )
    c = load(spark, sf, "customer")
    n = load(spark, sf, "nation")
    price_c = _cents(F.col("l_extendedprice"))
    disc_c = _cents(F.col("l_discount"))
    agg = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(price_c * (100 - disc_c)).alias("_rev_c"))
    )
    # orderBy().limit() lowers to TakeOrderedAndProject: per-partition
    # top-20 heaps merged on the driver (20 x N rows) — unlike a
    # partition-less row_number() window, which funnels every customer
    # through ONE reducer's sort at scale.
    return (
        agg.orderBy(F.col("_rev_c").desc(), F.col("c_custkey").asc())
        .limit(20)
        .select(
            "c_custkey",
            "c_name",
            F.col("n_name").alias("nation"),
            _money2(F.col("_rev_c"), 10000).alias("revenue"),
        )
    )


Q10_SQL = f"""
WITH agg AS (
  SELECT c_custkey, c_name, n_name,
         sum({_REV_C_SQL}) AS rev_c
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation   ON c_nationkey = n_nationkey
  WHERE l_returnflag = 'R'
    AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
  GROUP BY 1, 2, 3
)
SELECT c_custkey, c_name, n_name AS nation,
       {_money2_sql('rev_c', 10000)} AS revenue
FROM agg
ORDER BY rev_c DESC, c_custkey
LIMIT 20
"""


# ---------------------------------------------------------------------------
# Q11: important stock — per-part shipped value for EUROPE-region
# suppliers, kept where the part's value exceeds 0.05% of the total.
# The scalar total is a lazy broadcast cross-join (no mid-plan collect),
# and the threshold compare is pure integer (value_c * 10000 > total_c * 5).
def q11_important_stock(spark: SparkSession, sf: str) -> DataFrame:
    l = load(spark, sf, "lineitem")
    p = load(spark, sf, "part")
    s = load(spark, sf, "supplier")
    n = load(spark, sf, "nation")
    r = load(spark, sf, "region").where(F.col("r_name") == "EUROPE")
    qty_c = _cents(F.col("l_quantity"))
    retail_c = _cents(F.col("p_retailprice"))
    base = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select(F.col("l_partkey"), (qty_c * retail_c).alias("_v_c"))
    )
    per_part = base.groupBy("l_partkey").agg(F.sum("_v_c").alias("_value_c"))
    total = base.agg(F.sum("_v_c").alias("_total_c"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .where(F.col("_value_c") * 10000 > F.col("_total_c") * 5)
        .select("l_partkey", _money2(F.col("_value_c"), 10000).alias("value"))
    )


Q11_SQL = f"""
WITH base AS (
  SELECT l_partkey,
         CAST(round(l_quantity * 100, 0) AS BIGINT)
         * CAST(round(p_retailprice * 100, 0) AS BIGINT) AS v_c
  FROM lineitem
  JOIN part     ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
),
per_part AS (
  SELECT l_partkey, CAST(sum(v_c) AS BIGINT) AS value_c FROM base GROUP BY 1
),
total AS (
  SELECT CAST(sum(v_c) AS BIGINT) AS total_c FROM base
)
SELECT l_partkey, {_money2_sql('value_c', 10000)} AS value
FROM per_part, total
WHERE value_c * 10000 > total_c * 5
"""


# ---------------------------------------------------------------------------
# Q12: shipping-mode priority classes — l_linestatus stands in for
# l_shipmode; conditional counts of high/low-priority orders per status.
def q12_priority_lines(spark: SparkSession, sf: str) -> DataFrame:
    l = load(spark, sf, "lineitem").where(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    o = load(spark, sf, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


Q12_SQL = """
SELECT l_linestatus,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Q13: customer order-count distribution — left outer join then a
# histogram of per-customer counts (two chained aggregations).
def q13_customer_distribution(spark: SparkSession, sf: str) -> DataFrame:
    c = load(spark, sf, "customer")
    o = load(spark, sf, "orders").where(F.col("o_orderpriority") != "4-NOT SPECIFIED")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
    )


Q13_SQL = """
WITH per_cust AS (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer
  LEFT JOIN orders ON c_custkey = o_custkey
                   AND o_orderpriority <> '4-NOT SPECIFIED'
  GROUP BY 1
)
SELECT c_count, count(*) AS custdist FROM per_cust GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Q14: promotion-revenue ratio — conditional-sum percentage over one
# joined month of lineitem.
def q14_promo_revenue(spark: SparkSession, sf: str) -> DataFrame:
    l = load(spark, sf, "lineitem").where(
        (F.col("l_shipdate") >= "1996-03-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    p = load(spark, sf, "part")
    vol_c = _cents(F.col("l_extendedprice")) * (100 - _cents(F.col("l_discount")))
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", vol_c).otherwise(F.lit(0)))
                / F.sum(vol_c),
                4,
            ).alias("promo_revenue_pct"),
            F.count("*").alias("n_lines"),
        )
    )


Q14_SQL = f"""
SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO' THEN {_REV_C_SQL} ELSE 0 END)
             / sum({_REV_C_SQL}), 4) AS promo_revenue_pct,
       count(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
"""


# ---------------------------------------------------------------------------
# Q15: top supplier — per-supplier quarterly revenue, keep the max.
# The classic view + scalar max is a lazy broadcast cross-join; equality
# is tested on exact cents (long), so "ties all returned" is exact.
def q15_top_supplier(spark: SparkSession, sf: str) -> DataFrame:
    l = load(spark, sf, "lineitem").where(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    s = load(spark, sf, "supplier")
    price_c = _cents(F.col("l_extendedprice"))
    disc_c = _cents(F.col("l_discount"))
    rev = l.groupBy("l_suppkey").agg(F.sum(price_c * (100 - disc_c)).alias("_rev_c"))
    mx = rev.agg(F.max("_rev_c").alias("_max_c"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .where(F.col("_rev_c") == F.col("_max_c"))
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            _money2(F.col("_rev_c"), 10000).alias("total_revenue"),
        )
    )


Q15_SQL = f"""
WITH rev AS (
  SELECT l_suppkey, CAST(sum({_REV_C_SQL}) AS BIGINT) AS rev_c
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY 1
)
SELECT s_suppkey, s_name, {_money2_sql('rev_c', 10000)} AS total_revenue
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE rev_c = (SELECT max(rev_c) FROM rev)
"""


# ---------------------------------------------------------------------------
# Q16: parts/supplier relationship counts — distinct shipped pairs stand
# in for partsupp; negative-balance suppliers stand in for the complaints
# blacklist (excluded via anti-join).
def q16_supplier_part_counts(spark: SparkSession, sf: str) -> DataFrame:
    pairs = load(spark, sf, "lineitem").select("l_partkey", "l_suppkey").distinct()
    p = load(spark, sf, "part").where(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size").isin(3, 9, 14, 19, 23, 36, 45, 49))
    )
    bad = load(spark, sf, "supplier").where(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        pairs.join(F.broadcast(p), pairs.l_partkey == p.p_partkey)
        .join(F.broadcast(bad), pairs.l_suppkey == bad.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


Q16_SQL = """
WITH pairs AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM pairs JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
  AND p_size IN (3, 9, 14, 19, 23, 36, 45, 49)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2, 3
"""


# ---------------------------------------------------------------------------
# Q17: small-quantity-order revenue — correlated per-part average rewritten
# as an aggregate + join; the "below 20% of avg" test is exact integer
# (qty_c * 5 * cnt < sum_qty_c), no float average materialized.
def q17_small_qty_revenue(spark: SparkSession, sf: str) -> DataFrame:
    p = load(spark, sf, "part").where(F.col("p_brand") == "Brand#3")
    l = load(spark, sf, "lineitem").join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
    qty_c = _cents(F.col("l_quantity"))
    per_part = l.groupBy(F.col("l_partkey").alias("_pk")).agg(
        F.sum(qty_c).alias("_sum_qty_c"), F.count("*").alias("_cnt")
    )
    price_c = _cents(F.col("l_extendedprice"))
    return (
        l.join(per_part, F.col("l_partkey") == F.col("_pk"))
        .where(qty_c * 5 * F.col("_cnt") < F.col("_sum_qty_c"))
        .agg(
            F.round(F.sum(price_c) / 700.0, 2).alias("avg_yearly"),
            F.count("*").alias("n_lines"),
        )
    )


Q17_SQL = """
WITH l AS (
  SELECT l_partkey, CAST(round(l_quantity * 100, 0) AS BIGINT) AS qty_c,
         CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS price_c
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = 'Brand#3'
),
per_part AS (
  SELECT l_partkey AS pk, CAST(sum(qty_c) AS BIGINT) AS sum_qty_c,
         count(*) AS cnt
  FROM l GROUP BY 1
)
SELECT round(sum(price_c) / 700.0, 2) AS avg_yearly, count(*) AS n_lines
FROM l JOIN per_part ON l_partkey = pk
WHERE qty_c * 5 * cnt < sum_qty_c
"""


# ---------------------------------------------------------------------------
# Q20: potential part promotion — AMERICA-region suppliers that shipped
# more than 25% of a PROMO part's total volume in 1996. Both aggregation
# levels share the l_partkey grouping, so the second groupBy reuses the
# first's shuffle partitioning (no extra exchange).
def q20_potential_promotion(spark: SparkSession, sf: str) -> DataFrame:
    p = load(spark, sf, "part").where(F.col("p_type") == "PROMO").select("p_partkey")
    l = (
        load(spark, sf, "lineitem")
        .where((F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01"))
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
    )
    qty_c = _cents(F.col("l_quantity"))
    per_pair = l.groupBy("l_partkey", "l_suppkey").agg(F.sum(qty_c).alias("_pair_qty_c"))
    per_part = per_pair.groupBy("l_partkey").agg(F.sum("_pair_qty_c").alias("_part_qty_c"))
    s = load(spark, sf, "supplier")
    n = load(spark, sf, "nation")
    r = load(spark, sf, "region").where(F.col("r_name") == "AMERICA")
    return (
        per_pair.join(per_part, "l_partkey")
        .where(F.col("_pair_qty_c") * 4 > F.col("_part_qty_c"))
        .select("l_suppkey")
        .distinct()
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "s_name", F.col("n_name").alias("nation"))
    )


Q20_SQL = """
WITH l AS (
  SELECT l_partkey, l_suppkey, CAST(round(l_quantity * 100, 0) AS BIGINT) AS qty_c
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_type = 'PROMO'
    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
),
per_pair AS (
  SELECT l_partkey, l_suppkey, CAST(sum(qty_c) AS BIGINT) AS pair_qty_c
  FROM l GROUP BY 1, 2
),
per_part AS (
  SELECT l_partkey, CAST(sum(pair_qty_c) AS BIGINT) AS part_qty_c
  FROM per_pair GROUP BY 1
)
SELECT DISTINCT s_suppkey, s_name, n_name AS nation
FROM per_pair
JOIN per_part USING (l_partkey)
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE pair_qty_c * 4 > part_qty_c AND r_name = 'AMERICA'
"""


# ---------------------------------------------------------------------------
# Q21: suppliers who kept orders waiting — the double EXISTS/NOT-EXISTS
# rewritten as two hash aggregations: per-(order,supplier) late flag, then
# per-order supplier counts; a waiting supplier is the SOLE late supplier
# of a multi-supplier 'F' order. Late = shipped >90 days after order date
# (testdata has no commit/receipt dates).
def q21_waiting_suppliers(spark: SparkSession, sf: str) -> DataFrame:
    o = load(spark, sf, "orders").where(F.col("o_orderstatus") == "F")
    l = load(spark, sf, "lineitem")
    per_os = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.max(
                (F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 90)).cast("int")
            ).alias("_late")
        )
    )
    per_o = per_os.groupBy("l_orderkey").agg(
        F.count("*").alias("_n_supp"), F.sum("_late").alias("_n_late")
    )
    s = load(spark, sf, "supplier")
    return (
        per_os.join(per_o, "l_orderkey")
        .where((F.col("_late") == 1) & (F.col("_n_supp") > 1) & (F.col("_n_late") == 1))
        .groupBy("l_suppkey")
        .agg(F.count("*").alias("numwait"))
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .select("s_suppkey", "s_name", "numwait")
    )


Q21_SQL = """
WITH per_os AS (
  SELECT l_orderkey, l_suppkey,
         max(CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY THEN 1 ELSE 0 END) AS late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
  GROUP BY 1, 2
),
per_o AS (
  SELECT l_orderkey, count(*) AS n_supp, CAST(sum(late) AS BIGINT) AS n_late
  FROM per_os GROUP BY 1
)
SELECT s_suppkey, s_name, count(*) AS numwait
FROM per_os
JOIN per_o USING (l_orderkey)
JOIN supplier ON l_suppkey = s_suppkey
WHERE late = 1 AND n_supp > 1 AND n_late = 1
GROUP BY 1, 2
"""


QUERIES = {
    "q6_forecast_revenue": QuerySpec(q6_forecast_revenue, Q6_SQL),
    "q8_market_share": QuerySpec(q8_market_share, Q8_SQL),
    "q9_product_profit": QuerySpec(q9_product_profit, Q9_SQL),
    "q10_returned_items": QuerySpec(q10_returned_items, Q10_SQL),
    "q11_important_stock": QuerySpec(q11_important_stock, Q11_SQL),
    "q12_priority_lines": QuerySpec(q12_priority_lines, Q12_SQL),
    "q13_customer_distribution": QuerySpec(q13_customer_distribution, Q13_SQL),
    "q14_promo_revenue": QuerySpec(q14_promo_revenue, Q14_SQL),
    "q15_top_supplier": QuerySpec(q15_top_supplier, Q15_SQL),
    "q16_supplier_part_counts": QuerySpec(q16_supplier_part_counts, Q16_SQL),
    "q17_small_qty_revenue": QuerySpec(q17_small_qty_revenue, Q17_SQL),
    "q20_potential_promotion": QuerySpec(q20_potential_promotion, Q20_SQL),
    "q21_waiting_suppliers": QuerySpec(q21_waiting_suppliers, Q21_SQL),
}
