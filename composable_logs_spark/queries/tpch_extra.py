"""Additional classic OLAP query shapes (TPC-H Q2/Q4/Q7/Q18/Q19/Q22
adapted to the testdata star schema — it has no partsupp/dates tables, so
each keeps the SHAPE: correlated subquery, exists semi-join, nation-pair
volume, group-having, disjunctive brackets, scalar-subquery anti-join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from . import QuerySpec, load
from .relational import _REV_SUM_SQL, _cents, _money2_sql, _revenue_cents


# ---------------------------------------------------------------------------
# Q2 shape: correlated min — per part, the cheapest-balance supplier that
# shipped it (min acctbal, tie-break min suppkey) via rank-over-group.
def q2_min_cost_supplier(spark: SparkSession, sf: str) -> DataFrame:
    l = load(spark, sf, "lineitem").select("l_partkey", "l_suppkey").distinct()
    s = load(spark, sf, "supplier")
    pairs = l.join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
    w = W.partitionBy("l_partkey").orderBy(
        F.round("s_acctbal", 2).asc(), F.col("s_suppkey").asc()
    )
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .where(F.col("l_partkey") % 50 == 0)  # sample for output size
        .select(
            "l_partkey",
            F.col("s_suppkey").alias("best_suppkey"),
            F.col("s_name").alias("supplier_name"),
            F.round("s_acctbal", 2).alias("acctbal"),
        )
    )


Q2_SQL = """
WITH pairs AS (
  SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
),
ranked AS (
  SELECT l_partkey, s_suppkey, s_name, round(s_acctbal, 2) AS acctbal,
         row_number() OVER (PARTITION BY l_partkey
                            ORDER BY round(s_acctbal, 2), s_suppkey) AS rn
  FROM pairs JOIN supplier ON l_suppkey = s_suppkey
)
SELECT l_partkey, s_suppkey AS best_suppkey, s_name AS supplier_name, acctbal
FROM ranked WHERE rn = 1 AND l_partkey % 50 = 0
"""


# ---------------------------------------------------------------------------
# Q4 shape: priority count of 1996 orders having a late line (shipped more
# than 60 days after the order date) — EXISTS semi-join + agg.
def q4_late_order_priority(spark: SparkSession, sf: str) -> DataFrame:
    o = load(spark, sf, "orders").where(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    l = load(spark, sf, "lineitem")
    late = o.join(
        l,
        (o.o_orderkey == l.l_orderkey)
        & (l.l_shipdate > F.date_add(o.o_orderdate, 60)),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count("*").alias("order_count"))


Q4_SQL = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
GROUP BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# Q7 shape: volume between nation pairs per year (supplier nation ≠
# customer nation), 1996-1997.
def q7_nation_volume(spark: SparkSession, sf: str) -> DataFrame:
    n1 = load(spark, sf, "nation").select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = load(spark, sf, "nation").select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    s = load(spark, sf, "supplier")
    c = load(spark, sf, "customer")
    o = load(spark, sf, "orders")
    l = load(spark, sf, "lineitem").where(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("s_nkey"))
        .join(F.broadcast(n2), c.c_nationkey == F.col("c_nkey"))
        .where(F.col("supp_nation") != F.col("cust_nation"))
        .where((F.col("s_nationkey") < 3) & (F.col("c_nationkey") < 3))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").cast("int").alias("l_year"))
        .agg(_revenue_cents().alias("revenue"), F.count("*").alias("n_lines"))
    )


Q7_SQL = f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS INT) AS l_year,
       {_money2_sql(_REV_SUM_SQL, 10000)} AS revenue,
       count(*) AS n_lines
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE n1.n_name <> n2.n_name
  AND s_nationkey < 3 AND c_nationkey < 3
  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY 1, 2, 3
"""


# ---------------------------------------------------------------------------
# Q18 shape: large-volume orders — groupBy HAVING sum over a threshold,
# then joined back to customers.
def q18_large_volume_customers(spark: SparkSession, sf: str) -> DataFrame:
    l = load(spark, sf, "lineitem")
    o = load(spark, sf, "orders")
    c = load(spark, sf, "customer")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.round(F.sum(_cents(F.col("l_quantity"))) / 100.0, 2).alias("total_qty"))
        .where(F.col("total_qty") > 150)
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            F.col("l_orderkey").alias("o_orderkey"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.round("o_totalprice", 2).alias("o_totalprice"),
            "total_qty",
        )
    )


Q18_SQL = """
WITH big AS (
  SELECT l_orderkey,
         round(sum(CAST(round(l_quantity * 100, 0) AS BIGINT)) / 100.0, 2) AS total_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING round(sum(CAST(round(l_quantity * 100, 0) AS BIGINT)) / 100.0, 2) > 150
)
SELECT c_custkey, c_name, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
       round(o_totalprice, 2) AS o_totalprice, total_qty
FROM big
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
"""


# ---------------------------------------------------------------------------
# Q19 shape: disjunctive bracket predicates (brand × size × quantity OR
# brackets) evaluated in one scan.
def q19_bracket_revenue(spark: SparkSession, sf: str) -> DataFrame:
    l = load(spark, sf, "lineitem")
    p = load(spark, sf, "part")
    j = l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
    b1 = (F.col("p_brand") == "Brand#1") & (F.col("p_size").between(1, 15)) & (
        F.col("l_quantity").between(1, 20)
    )
    b2 = (F.col("p_brand") == "Brand#2") & (F.col("p_size").between(10, 30)) & (
        F.col("l_quantity").between(10, 30)
    )
    b3 = (F.col("p_brand") == "Brand#3") & (F.col("p_size").between(20, 50)) & (
        F.col("l_quantity").between(20, 50)
    )
    return (
        j.where(b1 | b2 | b3)
        .groupBy("p_brand")
        .agg(_revenue_cents().alias("revenue"), F.count("*").alias("n_lines"))
    )


Q19_SQL = f"""
SELECT p_brand,
       {_money2_sql(_REV_SUM_SQL, 10000)} AS revenue,
       count(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 30)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 50)
GROUP BY p_brand
"""


# ---------------------------------------------------------------------------
# Q22 shape: scalar subquery + anti-join — per segment, rich customers
# (above global average balance) with no orders after 2000.
def q22_idle_rich_customers(spark: SparkSession, sf: str) -> DataFrame:
    c = load(spark, sf, "customer")
    o = load(spark, sf, "orders").where(F.col("o_orderdate") >= "2000-01-01")
    # scalar subquery: global average of positive balances (exact cents),
    # kept lazy as a broadcast cross-join — no mid-plan .collect() job
    avg_df = (
        c.where(F.col("c_acctbal") > 0)
        .agg((F.sum(_cents(F.col("c_acctbal"))) / 100.0 / F.count("*")).alias("_avg_bal"))
    )
    rich = (
        c.crossJoin(F.broadcast(avg_df))
        .where(F.col("c_acctbal") > F.col("_avg_bal"))
        .drop("_avg_bal")
    )
    idle = rich.join(o, rich.c_custkey == o.o_custkey, "left_anti")
    return idle.groupBy("c_mktsegment").agg(
        F.count("*").alias("numcust"),
        F.round(F.sum(_cents(F.col("c_acctbal"))) / 100.0, 2).alias("totacctbal"),
    )


Q22_SQL = """
WITH threshold AS (
  SELECT sum(CAST(round(c_acctbal * 100, 0) AS BIGINT)) / 100.0 / count(*) AS a
  FROM customer WHERE c_acctbal > 0
)
SELECT c_mktsegment,
       count(*) AS numcust,
       round(sum(CAST(round(c_acctbal * 100, 0) AS BIGINT)) / 100.0, 2) AS totacctbal
FROM customer, threshold
WHERE c_acctbal > threshold.a
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c_custkey
                    AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
GROUP BY c_mktsegment
"""


QUERIES = {
    "q2_min_cost_supplier": QuerySpec(q2_min_cost_supplier, Q2_SQL),
    "q4_late_order_priority": QuerySpec(q4_late_order_priority, Q4_SQL),
    "q7_nation_volume": QuerySpec(q7_nation_volume, Q7_SQL),
    "q18_large_volume_customers": QuerySpec(q18_large_volume_customers, Q18_SQL),
    "q19_bracket_revenue": QuerySpec(q19_bracket_revenue, Q19_SQL),
    "q22_idle_rich_customers": QuerySpec(q22_idle_rich_customers, Q22_SQL),
}
