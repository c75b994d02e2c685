"""HyperLogLog distinct-count sketch with a BIT-EXACT cross-engine oracle.

``approx_sketch_stats`` uses the engines' built-in sketches, which
differ by construction and can only be rows-only checked. This operator
implements the HLL register algebra EXPLICITLY — md5-based hashing,
register index/rank extraction, max-merge, raw estimator — so Spark and
DuckDB compute the *same registers bit-for-bit* and the gate
hash-checks an approximate-distinct operator exactly.

Engine-exactness choices (each avoids a real cross-engine hazard):
- rank (leading-zero count) via COUNTING POWER-OF-TWO COMPARISONS, not
  floor(log2(w)): log2 can differ by 1 ulp between JVM and libm right
  where floor() flips.
- the harmonic sum Σ 2^-M_j as exact integers Σ 2^(53-M_j) (fits in a
  long for m=256), divided by 2^53 once — a float sum of powers of two
  spanning >53 bits of magnitude is summation-order-dependent.
- register digest = md5 of the comma-joined registers in index order —
  a checksum proving bit-equality of the whole sketch, not just the
  estimate.

Scale shape: ONE hash-agg to m=256 rows (max-merge is associative and
map-side combined — this is the mergeable-sketch property that lets
every partition sketch independently), then a single-row final agg.
The same register table unions/max-merges across days/partitions for
incremental distinct counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import QuerySpec, load

_B = 8                     # register index bits
_M = 1 << _B               # 256 registers
_W = 52                    # rank-field width (60-bit hash minus 8 index bits)
_ALPHA = 0.7213 / (1.0 + 1.079 / _M)  # standard alpha_m for m >= 128


def hll_registers(df: DataFrame, col: str, group_cols: list[str] | None = None) -> DataFrame:
    """(group..., idx, m_j) register table for one column — the
    mergeable sketch unit: registers of any two frames (or groups)
    max-merge by ``union.groupBy(group..., idx).agg(max(m_j))`` (used by
    the grouped query below and the streaming incremental-distinct
    test)."""
    group_cols = group_cols or []
    h = F.conv(F.substring(F.md5(F.col(col).cast("string")), 1, 15), 16, 10).cast(
        "long"
    )
    # upper 52 bits via bit shift — NOT (h / m).cast("long"): that is
    # double division, where Spark truncates the cast but DuckDB's
    # CAST(hv/256 AS BIGINT) rounds to nearest, so w would differ on
    # ~1/3 of rows (only surviving because rho uses bit_length)
    w = F.shiftright(h, _B)
    # bit_length(w) as length(conv(w, 10, 2)) — the binary digit count,
    # exact integer string arithmetic (w >= 1 has floor(log2 w) + 1
    # binary digits; w = 0 is pinned to 0, conv would say "0" -> 1).
    # r13: this replaced a 52-element filter() over a powers-of-two
    # array whose interpreted per-element lambda dominated every HLL
    # query's scan stage (measured 7.3 s -> 0.5 s for the rho pass at
    # sf0.1; equivalence checked exhaustively against the old
    # expression on the full events table — 0 mismatches). Still no
    # floor(log2(w)): that can differ by 1 ulp between JVM and libm
    # right where floor() flips.
    bitlen = F.when(F.col("w") == 0, F.lit(0)).otherwise(
        F.length(F.conv(F.col("w"), 10, 2))
    )
    return (
        df.select(*group_cols, (h % _M).alias("idx"), w.alias("w"))
        .select(*group_cols, "idx", (F.lit(_W) - bitlen + 1).alias("rho"))
        .groupBy(*group_cols, "idx")
        .agg(F.max("rho").alias("m_j"))
    )


def hll_distinct_customers(spark: SparkSession, sf: str) -> DataFrame:
    o = load(spark, sf, "orders")
    # 60-bit hash from the md5 hex prefix (exact integer on both engines)
    regs = hll_registers(o, "o_custkey")
    # densify: registers never hit stay 0
    full = (
        spark.range(_M)
        .select(F.col("id").cast("long").alias("idx"))
        .join(regs, "idx", "left")
        .select("idx", F.coalesce("m_j", F.lit(0)).alias("m_j"))
    )
    est = full.agg(
        F.count(F.when(F.col("m_j") > 0, 1)).cast("int").alias("n_nonzero_registers"),
        # Σ 2^-M_j as exact longs: Σ 2^(53 - M_j) / 2^53
        F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), CAST(53 - m_j AS INT))")).alias(
            "s_scaled"
        ),
        F.md5(
            F.concat_ws(
                ",",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("idx", "m_j"))),
                    lambda s: s["m_j"].cast("string"),
                ),
            )
        ).alias("register_digest"),
    )
    truth = o.agg(F.count_distinct("o_custkey").cast("long").alias("true_distinct"))
    raw = F.lit(_ALPHA * _M * _M) / (F.col("s_scaled") / F.pow(F.lit(2.0), 53))
    zeros = F.lit(_M) - F.col("n_nonzero_registers")
    # standard small-range correction: below 2.5m the raw estimator is
    # badly biased; linear counting over the zero registers is exact-ish
    corrected = F.when(
        (raw <= 2.5 * _M) & (zeros > 0), F.lit(float(_M)) * F.log(F.lit(float(_M)) / zeros)
    ).otherwise(raw)
    return est.crossJoin(truth).select(
        F.lit(_M).alias("m"),
        "n_nonzero_registers",
        F.round(corrected, 4).alias("hll_estimate"),
        "register_digest",
        "true_distinct",
    )


HLL_SQL = f"""
WITH h AS (
  SELECT CAST('0x' || substring(md5(CAST(o_custkey AS VARCHAR)), 1, 15) AS BIGINT) AS hv
  FROM orders
),
r AS (
  SELECT hv % {_M} AS idx, hv // {_M} AS w FROM h
),
rho AS (
  SELECT idx,
         {_W} - len(list_filter([{", ".join(f"CAST({1 << i} AS BIGINT)" for i in range(_W))}],
                                p -> p <= w)) + 1 AS rho
  FROM r
),
regs AS (
  SELECT idx, max(rho) AS m_j FROM rho GROUP BY idx
),
full_regs AS (
  SELECT g.idx, coalesce(regs.m_j, 0) AS m_j
  FROM (SELECT unnest(range({_M})) AS idx) g LEFT JOIN regs USING (idx)
),
est AS (
  SELECT CAST(count(*) FILTER (WHERE m_j > 0) AS INT) AS n_nonzero_registers,
         sum(CAST(1 AS BIGINT) << (53 - m_j)) AS s_scaled,
         md5(array_to_string(list(CAST(m_j AS VARCHAR) ORDER BY idx), ',')) AS register_digest
  FROM full_regs
),
truth AS (SELECT CAST(count(DISTINCT o_custkey) AS BIGINT) AS true_distinct FROM orders)
SELECT {_M} AS m,
       n_nonzero_registers,
       round(CASE WHEN CAST({_ALPHA!r} AS DOUBLE) * {_M} * {_M}
                       / (s_scaled / power(2.0, 53)) <= 2.5 * {_M}
                   AND {_M} - n_nonzero_registers > 0
                  THEN CAST({_M} AS DOUBLE)
                       * ln(CAST({_M} AS DOUBLE) / ({_M} - n_nonzero_registers))
                  ELSE CAST({_ALPHA!r} AS DOUBLE) * {_M} * {_M}
                       / (s_scaled / power(2.0, 53))
             END, 4) AS hll_estimate,
       register_digest,
       true_distinct
FROM est CROSS JOIN truth
"""


# ---------------------------------------------------------------------------
# HLL set algebra: estimated overlap of two nations' purchased part
# catalogs by inclusion-exclusion over MERGED register sketches. The
# point being showcased: HLL registers are a bounded, mergeable
# summary — the union sketch is just max(m_j) over the two sets'
# registers, so at 100 TB each segment keeps 256 longs and ANY set
# union is estimable without revisiting rows. (Intersection itself is
# not directly sketchable; |A|+|B|-|A∪B| is the standard estimator and
# its error is checked against the exact join in the output row.)
# The two sets genuinely partially overlap (each nation's customers
# buy a large-but-different subset of the catalog) — a same-set demo
# would make all four estimates collapse to one number.
def hll_intersection_parts(spark: SparkSession, sf: str) -> DataFrame:
    ev = _nation_parts(spark, sf)
    regs = hll_registers(ev, "l_partkey", group_cols=["nat"])
    regs_u = (
        regs.groupBy("idx")
        .agg(F.max("m_j").alias("m_j"))
        .select(F.lit("union").alias("nat"), "idx", "m_j")
    )
    all_regs = regs.select("nat", "idx", "m_j").unionByName(regs_u)
    sets = spark.createDataFrame([("n0",), ("n1",), ("union",)], "nat string")
    full = (
        spark.range(_M)
        .select(F.col("id").cast("long").alias("idx"))
        .crossJoin(F.broadcast(sets))
        .join(all_regs, ["nat", "idx"], "left")
        .select("nat", "idx", F.coalesce("m_j", F.lit(0)).alias("m_j"))
    )
    est = full.groupBy("nat").agg(
        F.count(F.when(F.col("m_j") > 0, 1)).cast("int").alias("nz"),
        F.sum(
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(53 - m_j AS INT))")
        ).alias("s_scaled"),
    )
    raw = F.lit(_ALPHA * _M * _M) / (F.col("s_scaled") / F.pow(F.lit(2.0), 53))
    zeros = F.lit(_M) - F.col("nz")
    corrected = F.when(
        (raw <= 2.5 * _M) & (zeros > 0),
        F.lit(float(_M)) * F.log(F.lit(float(_M)) / zeros),
    ).otherwise(raw)
    wide = est.withColumn("e", corrected).groupBy().agg(
        F.max(F.when(F.col("nat") == "n0", F.col("e"))).alias("e_a"),
        F.max(F.when(F.col("nat") == "n1", F.col("e"))).alias("e_b"),
        F.max(F.when(F.col("nat") == "union", F.col("e"))).alias("e_union"),
    )
    base = _nation_parts(spark, sf)
    a = base.where(F.col("nat") == "n0").select("l_partkey").distinct()
    b = base.where(F.col("nat") == "n1").select("l_partkey").distinct()
    truth = a.join(b, "l_partkey", "left_semi").agg(
        F.count("*").cast("long").alias("true_intersection")
    )
    return wide.crossJoin(F.broadcast(truth)).select(
        F.round("e_a", 4).alias("est_a"),
        F.round("e_b", 4).alias("est_b"),
        F.round("e_union", 4).alias("est_union"),
        F.round(F.col("e_a") + F.col("e_b") - F.col("e_union"), 4).alias(
            "est_intersection"
        ),
        "true_intersection",
    )


def _nation_parts(spark: SparkSession, sf: str) -> DataFrame:
    """(nat, l_partkey): parts purchased by customers of nations 0/1."""
    l = load(spark, sf, "lineitem").select("l_orderkey", "l_partkey")
    o = load(spark, sf, "orders").select("o_orderkey", "o_custkey")
    c = (
        load(spark, sf, "customer")
        .where(F.col("c_nationkey").isin(0, 1))
        .select(
            "c_custkey",
            F.when(F.col("c_nationkey") == 0, "n0").otherwise("n1").alias("nat"),
        )
    )
    return (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .select("nat", "l_partkey")
    )


_POWERS_SQL = ", ".join(f"CAST({1 << i} AS BIGINT)" for i in range(_W))

_EST_CASE = f"""CASE WHEN CAST({_ALPHA!r} AS DOUBLE) * {_M} * {_M}
                     / (s_scaled / power(2.0, 53)) <= 2.5 * {_M}
                 AND {_M} - nz > 0
            THEN CAST({_M} AS DOUBLE)
                 * ln(CAST({_M} AS DOUBLE) / ({_M} - nz))
            ELSE CAST({_ALPHA!r} AS DOUBLE) * {_M} * {_M}
                 / (s_scaled / power(2.0, 53))
       END"""

HLL_INTERSECT_SQL = f"""
WITH base AS (
  SELECT CASE WHEN c.c_nationkey = 0 THEN 'n0' ELSE 'n1' END AS nat,
         l.l_partkey
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  WHERE c.c_nationkey IN (0, 1)
),
h AS (
  SELECT nat AS event_type,
         CAST('0x' || substring(md5(CAST(l_partkey AS VARCHAR)), 1, 15) AS BIGINT) AS hv
  FROM base
),
rho AS (
  SELECT event_type, hv % {_M} AS idx,
         {_W} - len(list_filter([{_POWERS_SQL}], p -> p <= hv // {_M})) + 1 AS rho
  FROM h
),
regs AS (
  SELECT event_type, idx, max(rho) AS m_j FROM rho GROUP BY 1, 2
),
all_regs AS (
  SELECT event_type, idx, m_j FROM regs
  UNION ALL
  SELECT 'union', idx, max(m_j) FROM regs GROUP BY idx
),
full_regs AS (
  SELECT s.event_type, g.idx, coalesce(a.m_j, 0) AS m_j
  FROM (SELECT unnest(range({_M})) AS idx) g
  CROSS JOIN (SELECT unnest(['n0', 'n1', 'union']) AS event_type) s
  LEFT JOIN all_regs a ON a.idx = g.idx AND a.event_type = s.event_type
),
est AS (
  SELECT event_type,
         CAST(count(*) FILTER (WHERE m_j > 0) AS INT) AS nz,
         sum(CAST(1 AS BIGINT) << (53 - m_j)) AS s_scaled
  FROM full_regs GROUP BY event_type
),
wide AS (
  SELECT max(CASE WHEN event_type = 'n0' THEN {_EST_CASE} END) AS e_a,
         max(CASE WHEN event_type = 'n1' THEN {_EST_CASE} END) AS e_b,
         max(CASE WHEN event_type = 'union' THEN {_EST_CASE} END) AS e_union
  FROM est
),
truth AS (
  SELECT CAST(count(*) AS BIGINT) AS true_intersection FROM (
    SELECT DISTINCT l_partkey FROM base WHERE nat = 'n0'
    INTERSECT
    SELECT DISTINCT l_partkey FROM base WHERE nat = 'n1'
  )
)
SELECT round(e_a, 4) AS est_a,
       round(e_b, 4) AS est_b,
       round(e_union, 4) AS est_union,
       round(e_a + e_b - e_union, 4) AS est_intersection,
       true_intersection
FROM wide CROSS JOIN truth
"""


QUERIES = {
    "hll_distinct_customers": QuerySpec(hll_distinct_customers, HLL_SQL),
    "hll_intersection_parts": QuerySpec(hll_intersection_parts, HLL_INTERSECT_SQL),
}


# ---------------------------------------------------------------------------
# Count-min sketch heavy hitters — same bit-exact philosophy as the HLL
# above: explicit (row, counter) cells from md5-seeded hashes, so both
# engines build the IDENTICAL sketch and the gate hash-checks the
# estimates. Point-query property: estimate >= true count always (only
# hash collisions inflate), equality w.h.p. for heavy tokens at
# d=4 x w=1024 on this corpus.
#
# Scale shape: the sketch build is one explode + hash agg bounded at
# d*w rows regardless of corpus size (mergeable by cell-wise SUM across
# partitions/days); the probe is a broadcast join of the candidate set
# against the tiny sketch table.
_CMS_D = 4
_CMS_W = 1024
_CMS_TOPK = 10


def cms_heavy_hitters(spark: SparkSession, sf: str) -> DataFrame:
    d = load(spark, sf, "documents")
    toks = d.select(
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("tok")
    )

    def cms_idx(tok_col, row: int):
        return (
            F.conv(F.substring(F.md5(F.concat(F.lit(f"{row}|"), tok_col)), 1, 15), 16, 10)
            .cast("long")
            % _CMS_W
        )

    cells = toks.select(
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(r).alias("r"), cms_idx(F.col("tok"), r).alias("idx"))
                    for r in range(_CMS_D)
                ]
            )
        ).alias("c")
    ).groupBy("c.r", "c.idx").agg(F.count("*").alias("cnt"))

    truth = (
        toks.groupBy("tok")
        .agg(F.count("*").alias("true_count"))
        .orderBy(F.col("true_count").desc(), "tok")
        .limit(_CMS_TOPK)
    )
    probes = truth.select(
        "tok",
        "true_count",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(r).alias("r"), cms_idx(F.col("tok"), r).alias("idx"))
                    for r in range(_CMS_D)
                ]
            )
        ).alias("c"),
    ).select("tok", "true_count", "c.r", "c.idx")
    return (
        probes.join(F.broadcast(cells), ["r", "idx"])
        .groupBy("tok", "true_count")
        .agg(F.min("cnt").alias("cms_estimate"))
        .select("tok", F.col("true_count").cast("long"), F.col("cms_estimate").cast("long"))
    )


CMS_SQL = f"""
WITH toks AS (
  SELECT unnest(string_split_regex(trim(lower(text)), '\\s+')) AS tok FROM documents
),
cells AS (
  SELECT r, CAST('0x' || substring(md5(CAST(r AS VARCHAR) || '|' || tok), 1, 15) AS BIGINT)
            % {_CMS_W} AS idx,
         count(*) AS cnt
  FROM toks CROSS JOIN (SELECT unnest(range({_CMS_D})) AS r)
  GROUP BY 1, 2
),
truth AS (
  SELECT tok, count(*) AS true_count FROM toks GROUP BY tok
  ORDER BY true_count DESC, tok LIMIT {_CMS_TOPK}
),
probes AS (
  SELECT t.tok, t.true_count, g.r,
         CAST('0x' || substring(md5(CAST(g.r AS VARCHAR) || '|' || t.tok), 1, 15) AS BIGINT)
           % {_CMS_W} AS idx
  FROM truth t CROSS JOIN (SELECT unnest(range({_CMS_D})) AS r) g
)
SELECT p.tok, CAST(p.true_count AS BIGINT) AS true_count,
       CAST(min(c.cnt) AS BIGINT) AS cms_estimate
FROM probes p JOIN cells c ON p.r = c.r AND p.idx = c.idx
GROUP BY p.tok, p.true_count
"""

QUERIES["cms_heavy_hitters"] = QuerySpec(cms_heavy_hitters, CMS_SQL)


# ---------------------------------------------------------------------------
# Grouped HLL + in-query merge: distinct users per event type, PLUS an
# 'ALL' row computed by MAX-MERGING the per-type register tables — the
# sketch-algebra point (union of distincts without re-scanning) proven
# inside one hash-checked query. Zero registers are counted implicitly
# (M - present rows each contribute 2^53 to the scaled harmonic sum),
# so no densify join is needed.
def hll_users_by_event_type(spark: SparkSession, sf: str) -> DataFrame:
    e = load(spark, sf, "events")
    per_type = hll_registers(e, "user_id", ["event_type"])
    merged = per_type.groupBy("idx").agg(F.max("m_j").alias("m_j")).select(
        F.lit("ALL").alias("event_type"), "idx", "m_j"
    )
    regs = per_type.unionByName(merged)
    agg = regs.groupBy("event_type").agg(
        F.count("*").cast("int").alias("n_present"),
        F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), CAST(53 - m_j AS INT))")).alias(
            "s_present"
        ),
    )
    s_scaled = F.col("s_present") + (F.lit(_M) - F.col("n_present")) * F.lit(
        1 << 53
    ).cast("long")
    raw = F.lit(_ALPHA * _M * _M) / (s_scaled / F.pow(F.lit(2.0), 53))
    zeros = F.lit(_M) - F.col("n_present")
    corrected = F.when(
        (raw <= 2.5 * _M) & (zeros > 0),
        F.lit(float(_M)) * F.log(F.lit(float(_M)) / zeros),
    ).otherwise(raw)
    est = agg.select("event_type", F.round(corrected, 4).alias("hll_estimate"))

    truth = (
        e.groupBy("event_type")
        .agg(F.count_distinct("user_id").cast("long").alias("true_distinct"))
        .unionByName(
            e.agg(F.count_distinct("user_id").cast("long").alias("true_distinct"))
            .select(F.lit("ALL").alias("event_type"), "true_distinct")
        )
    )
    return est.join(truth, "event_type")


_HLL_EST_SQL = f"""
  round(CASE WHEN CAST({_ALPHA!r} AS DOUBLE) * {_M} * {_M}
                  / ((s_present + ({_M} - n_present) * (CAST(1 AS BIGINT) << 53))
                     / power(2.0, 53)) <= 2.5 * {_M}
              AND {_M} - n_present > 0
             THEN CAST({_M} AS DOUBLE) * ln(CAST({_M} AS DOUBLE) / ({_M} - n_present))
             ELSE CAST({_ALPHA!r} AS DOUBLE) * {_M} * {_M}
                  / ((s_present + ({_M} - n_present) * (CAST(1 AS BIGINT) << 53))
                     / power(2.0, 53))
        END, 4)"""

HLL_BY_TYPE_SQL = f"""
WITH h AS (
  SELECT event_type,
         CAST('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 15) AS BIGINT) AS hv
  FROM events
),
rho AS (
  SELECT event_type, hv % {_M} AS idx,
         {_W} - len(list_filter([{", ".join(f"CAST({1 << i} AS BIGINT)" for i in range(_W))}],
                                p -> p <= hv // {_M})) + 1 AS rho
  FROM h
),
per_type AS (
  SELECT event_type, idx, max(rho) AS m_j FROM rho GROUP BY event_type, idx
),
regs AS (
  SELECT event_type, idx, m_j FROM per_type
  UNION ALL
  SELECT 'ALL', idx, max(m_j) FROM per_type GROUP BY idx
),
agg AS (
  SELECT event_type,
         CAST(count(*) AS INT) AS n_present,
         sum(CAST(1 AS BIGINT) << (53 - m_j)) AS s_present
  FROM regs GROUP BY event_type
),
truth AS (
  SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS true_distinct
  FROM events GROUP BY event_type
  UNION ALL
  SELECT 'ALL', CAST(count(DISTINCT user_id) AS BIGINT) FROM events
)
SELECT agg.event_type, {_HLL_EST_SQL} AS hll_estimate, truth.true_distinct
FROM agg JOIN truth USING (event_type)
"""

QUERIES["hll_users_by_event_type"] = QuerySpec(
    hll_users_by_event_type, HLL_BY_TYPE_SQL
)
