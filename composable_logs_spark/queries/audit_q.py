"""Warehouse-wide auditors: referential-integrity sweep and a
cumulative-distinct time series built from windowed HLL register
merges.

- ``fk_integrity_audit``: every foreign-key edge of the star schema
  checked in one result table (child rows, non-null FKs, orphans,
  distinct parent keys) — the dbt-style relationship test surface as
  ONE query. Each edge is a hash anti-join on the key (broadcast when
  the parent is a dim); the seven edges are independent subplans
  unioned together, so a scheduler runs them concurrently. At 100 TB
  each orphan check is exactly the join the query optimizer would run
  anyway — no row ships twice.
- ``hll_cumulative_users``: distinct users seen UP TO each day,
  estimated by composing two engine primitives: per-day HLL registers
  (hll_q's bit-exact machinery) and a running ``max`` window
  per-register over days. The window IS the sketch merge — register
  state is the only thing carried across time, so the cumulative
  distinct curve over a 100 TB event stream needs |days| x 256 longs
  of state, not user sets. The exact cumulative count rides along for
  error visibility (computed via first-appearance aggregation + a
  30-row broadcast join, NOT a partition-less window).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import QuerySpec, load
from .hll_q import _ALPHA, _M, hll_registers

# (edge name, child table, fk col, parent table, pk col)
_FK_EDGES = [
    ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem.l_partkey->part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders.o_custkey->customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("customer.c_nationkey->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier.s_nationkey->nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation.n_regionkey->region", "nation", "n_regionkey", "region", "r_regionkey"),
]


def fk_integrity_audit(spark: SparkSession, sf: str) -> DataFrame:
    out = None
    for name, child, fk, parent, pk in _FK_EDGES:
        c = load(spark, sf, child).select(F.col(fk).alias("fk"))
        p = load(spark, sf, parent).select(F.col(pk).alias("pk"))
        orphans = c.where(F.col("fk").isNotNull()).join(
            p, F.col("fk") == F.col("pk"), "left_anti"
        )
        row = (
            c.agg(
                F.count("*").alias("n_child_rows"),
                F.count("fk").alias("n_nonnull_fk"),
            )
            .crossJoin(
                F.broadcast(orphans.agg(F.count("*").alias("n_orphans")))
            )
            .crossJoin(
                F.broadcast(
                    p.agg(F.count_distinct("pk").alias("n_parent_keys"))
                )
            )
            .select(
                F.lit(name).alias("fk_edge"),
                "n_child_rows",
                "n_nonnull_fk",
                "n_orphans",
                "n_parent_keys",
            )
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("fk_edge")


FK_AUDIT_SQL = " UNION ALL ".join(
    f"""
SELECT '{name}' AS fk_edge,
       CAST(count(*) AS BIGINT) AS n_child_rows,
       CAST(count({fk}) AS BIGINT) AS n_nonnull_fk,
       CAST(count(*) FILTER (WHERE {fk} IS NOT NULL AND NOT EXISTS
         (SELECT 1 FROM {parent} p WHERE p.{pk} = c.{fk})) AS BIGINT)
         AS n_orphans,
       (SELECT CAST(count(DISTINCT {pk}) AS BIGINT) FROM {parent})
         AS n_parent_keys
FROM {child} c"""
    for name, child, fk, parent, pk in _FK_EDGES
) + " ORDER BY fk_edge"


# ---------------------------------------------------------------------------
def hll_cumulative_users(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = load(spark, sf, "events").select(
        F.to_date(F.date_trunc("day", "ts")).alias("day"), "user_id"
    )
    daily_regs = hll_registers(ev, "user_id", group_cols=["day"])
    days = ev.select("day").distinct()
    # register ids 0..255 as a broadcast dimension
    idx_dim = spark.range(_M).select(F.col("id").cast("long").alias("idx"))
    grid = (
        days.crossJoin(F.broadcast(idx_dim))
        .join(daily_regs, ["day", "idx"], "left")
        .select("day", "idx", F.coalesce("m_j", F.lit(0)).alias("m_j"))
    )
    w = W.partitionBy("idx").orderBy("day").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    cum = grid.withColumn("cm", F.max("m_j").over(w))
    est = cum.groupBy("day").agg(
        F.count(F.when(F.col("cm") > 0, 1)).cast("int").alias("nz"),
        F.sum(
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(53 - cm AS INT))")
        ).alias("s_scaled"),
    )
    raw = F.lit(_ALPHA * _M * _M) / (F.col("s_scaled") / F.pow(F.lit(2.0), 53))
    zeros = F.lit(_M) - F.col("nz")
    corrected = F.when(
        (raw <= 2.5 * _M) & (zeros > 0),
        F.lit(float(_M)) * F.log(F.lit(float(_M)) / zeros),
    ).otherwise(raw)
    # exact cumulative truth: first-appearance day per user, then a
    # 30-row broadcast inequality join (NOT a partition-less window)
    first = ev.groupBy("user_id").agg(F.min("day").alias("d0"))
    per_d0 = first.groupBy("d0").agg(F.count("*").alias("n_new"))
    truth = (
        days.join(F.broadcast(per_d0), F.col("d0") <= F.col("day"))
        .groupBy("day")
        .agg(F.sum("n_new").alias("true_cum_users"))
    )
    return (
        est.join(truth, "day")
        .select(
            "day",
            "nz",
            F.round(corrected, 4).alias("hll_cum_estimate"),
            "true_cum_users",
        )
        .orderBy("day")
    )


_POWERS = ", ".join(f"CAST({1 << i} AS BIGINT)" for i in range(52))

HLL_CUM_SQL = f"""
WITH ev AS (
  SELECT CAST(date_trunc('day', ts) AS DATE) AS day, user_id FROM events
),
h AS (
  SELECT day,
         CAST('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 15) AS BIGINT) AS hv
  FROM ev
),
rho AS (
  SELECT day, hv % {_M} AS idx,
         52 - len(list_filter([{_POWERS}], p -> p <= hv // {_M})) + 1 AS rho
  FROM h
),
regs AS (SELECT day, idx, max(rho) AS m_j FROM rho GROUP BY 1, 2),
days AS (SELECT DISTINCT day FROM ev),
grid AS (
  SELECT d.day, g.idx, coalesce(r.m_j, 0) AS m_j
  FROM days d
  CROSS JOIN (SELECT unnest(range({_M})) AS idx) g
  LEFT JOIN regs r ON r.day = d.day AND r.idx = g.idx
),
cum AS (
  SELECT day, idx,
         max(m_j) OVER (PARTITION BY idx ORDER BY day
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cm
  FROM grid
),
est AS (
  SELECT day,
         CAST(count(*) FILTER (WHERE cm > 0) AS INT) AS nz,
         sum(CAST(1 AS BIGINT) << (53 - cm)) AS s_scaled
  FROM cum GROUP BY day
),
first_seen AS (SELECT user_id, min(day) AS d0 FROM ev GROUP BY user_id),
per_d0 AS (SELECT d0, CAST(count(*) AS BIGINT) AS n_new FROM first_seen GROUP BY d0),
truth AS (
  SELECT d.day, CAST(sum(p.n_new) AS BIGINT) AS true_cum_users
  FROM days d JOIN per_d0 p ON p.d0 <= d.day
  GROUP BY d.day
)
SELECT e.day, e.nz,
       round(CASE WHEN CAST({_ALPHA!r} AS DOUBLE) * {_M} * {_M}
                       / (s_scaled / power(2.0, 53)) <= 2.5 * {_M}
                   AND {_M} - nz > 0
                  THEN CAST({_M} AS DOUBLE)
                       * ln(CAST({_M} AS DOUBLE) / ({_M} - nz))
                  ELSE CAST({_ALPHA!r} AS DOUBLE) * {_M} * {_M}
                       / (s_scaled / power(2.0, 53))
             END, 4) AS hll_cum_estimate,
       t.true_cum_users
FROM est e JOIN truth t USING (day)
ORDER BY e.day
"""


QUERIES = {
    "fk_integrity_audit": QuerySpec(fk_integrity_audit, FK_AUDIT_SQL),
    "hll_cumulative_users": QuerySpec(hll_cumulative_users, HLL_CUM_SQL),
}
