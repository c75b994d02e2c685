"""Dataset-introspection operators: single-pass column profiling, a
two-phase Pareto skyline, and exact-k weighted sampling — the "look at
your data before you train on it" toolkit.

- ``table_profile_lineitem``: ANALYZE-style per-column profile
  (non-null count, exact NDV, null fraction) for every lineitem column
  in ONE scan: `stack` unpivots each row into (col_name, value) pairs
  JVM-side, then a single hash agg computes all columns' stats
  together — versus the naive one-scan-per-column loop (11 scans).
  Values are canonicalised to strings only as distinct-count keys;
  both engines' double/timestamp renderings are injective, so the
  COUNTS agree even though the renderings differ. At 100 TB you'd
  swap exact NDV for the mergeable HLL register sketch this repo
  already ships (``hll_q``) — same plan shape, bounded state.
- ``skyline_parts``: the Pareto frontier of (minimise price, maximise
  size). Naive skyline is an all-pairs NOT-EXISTS (the oracle's
  formulation — deliberately independent); the Spark plan is the
  scale shape: bucket prices into B monotone bins (1-row min/max agg,
  broadcast), prune every row whose size <= the running max size of
  all strictly-cheaper bins (binning is monotone, so a smaller bin
  implies a strictly smaller price — pruning is provably safe and
  every dominated row either gets pruned or retains a surviving
  dominator), then refine the tiny candidate set with one broadcast
  self-join. No CartesianProduct, no partition-less window.
- ``weighted_reservoir_topk``: Efraimidis-Spirakis A-ES weighted
  sampling without replacement — exactly k documents, inclusion
  probability proportional to weight (n_chars): priority =
  -ln(u)/w with u a deterministic md5-uniform, keep the k smallest.
  `orderBy().limit(k)` lowers to TakeOrderedAndProject (per-partition
  heaps of k, driver merge) — the distributed reservoir. Deterministic
  because the "random" u is a content hash, the same device the
  repo's other samplers use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import QuerySpec, load

_LINEITEM_COLS = [
    "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
    "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
    "l_linestatus", "l_shipdate",
]
# r13 typed unpivot split: stack() needs one homogeneous value type per
# call, and the original all-string form paid a double->string rendering
# for 4.8M numeric cells per scan AND shuffled the (longer) renderings
# as distinct-keys. Integers/doubles unpivot as DOUBLE (every integer
# column here is far below 2^53, so the cast is injective and the
# distinct counts are unchanged — the oracle counts DISTINCT on the
# NATIVE columns, so the typed form matches it more directly than the
# string rendering did); flags/dates stay strings. Measured at sf0.1:
# 3.57 -> 2.06 s (min-of-4, same session), identical output rows.
_LINEITEM_NUM_COLS = [
    "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
    "l_extendedprice", "l_discount", "l_tax",
]
_LINEITEM_STR_COLS = ["l_returnflag", "l_linestatus", "l_shipdate"]

_N_BINS = 64
_RESERVOIR_K = 20


# ---------------------------------------------------------------------------
def table_profile_lineitem(spark: SparkSession, sf: str) -> DataFrame:
    d = load(spark, sf, "lineitem")

    def _profile(cols: list[str], cast_to: str) -> DataFrame:
        stack_args = ", ".join(f"'{c}', CAST({c} AS {cast_to})" for c in cols)
        pairs = d.select(
            F.expr(f"stack({len(cols)}, {stack_args}) AS (col_name, val)")
        )
        return pairs.groupBy("col_name").agg(
            F.count("*").alias("n_rows"),
            F.count("val").alias("n_nonnull"),
            F.count_distinct("val").alias("n_distinct"),
        )

    return (
        _profile(_LINEITEM_NUM_COLS, "DOUBLE")
        .unionByName(_profile(_LINEITEM_STR_COLS, "STRING"))
        .withColumn(
            "null_frac",
            F.round(1.0 - F.col("n_nonnull") / F.col("n_rows"), 4),
        )
        .orderBy("col_name")
    )


_PROFILE_SQL = " UNION ALL ".join(
    f"""
SELECT '{c}' AS col_name, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count({c}) AS BIGINT) AS n_nonnull,
       CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,
       round(1.0 - count({c}) / CAST(count(*) AS DOUBLE), 4) AS null_frac
FROM lineitem"""
    for c in _LINEITEM_COLS
) + " ORDER BY col_name"


# ---------------------------------------------------------------------------
def skyline_parts(spark: SparkSession, sf: str) -> DataFrame:
    p = load(spark, sf, "part").select("p_partkey", "p_retailprice", "p_size")
    bounds = p.agg(
        F.min("p_retailprice").alias("lo"), F.max("p_retailprice").alias("hi")
    )
    # monotone binning: bin(x) <= bin(y) whenever x <= y, so rows in a
    # strictly smaller bin have strictly smaller price
    binned = p.crossJoin(F.broadcast(bounds)).withColumn(
        "bin",
        F.least(
            F.lit(_N_BINS - 1),
            F.floor(
                (F.col("p_retailprice") - F.col("lo"))
                / ((F.col("hi") - F.col("lo")) / _N_BINS + 1e-12)
            ).cast("int"),
        ),
    )
    # per-bin max size -> running max over cheaper bins (tiny: B rows)
    bin_max = binned.groupBy("bin").agg(F.max("p_size").alias("bin_max"))
    cheaper = (
        bin_max.alias("x")
        .join(bin_max.alias("y"), F.col("y.bin") < F.col("x.bin"))
        .groupBy(F.col("x.bin").alias("bin"))
        .agg(F.max("y.bin_max").alias("prefix_max"))
    )
    # cached: the candidate set feeds both sides of the refine join —
    # without it the whole scan+prune pipeline runs twice
    cand = (
        binned.join(F.broadcast(cheaper), "bin", "left")
        .where(
            F.col("prefix_max").isNull()
            | (F.col("p_size") > F.col("prefix_max"))
        )
        .select("p_partkey", "p_retailprice", "p_size")
        .cache()
    )
    # exact refine over the small candidate set (broadcast, not cartesian:
    # the dominance predicate prunes via the range condition)
    c2 = cand.select(
        F.col("p_retailprice").alias("q_price"), F.col("p_size").alias("q_size")
    )
    return (
        cand.join(
            F.broadcast(c2),
            (F.col("q_price") <= F.col("p_retailprice"))
            & (F.col("q_size") >= F.col("p_size"))
            & (
                (F.col("q_price") < F.col("p_retailprice"))
                | (F.col("q_size") > F.col("p_size"))
            ),
            "left_anti",
        )
        .select("p_partkey", "p_retailprice", "p_size")
        .orderBy("p_partkey")
    )


SKYLINE_SQL = """
SELECT p_partkey, p_retailprice, p_size
FROM part x
WHERE NOT EXISTS (
  SELECT 1 FROM part y
  WHERE y.p_retailprice <= x.p_retailprice AND y.p_size >= x.p_size
    AND (y.p_retailprice < x.p_retailprice OR y.p_size > x.p_size)
)
ORDER BY p_partkey
"""


# ---------------------------------------------------------------------------
def weighted_reservoir_topk(spark: SparkSession, sf: str) -> DataFrame:
    d = load(spark, sf, "documents").select("doc_id", "n_chars")
    # md5-uniform u in (0,1): top 60 bits of the digest, offset by 0.5
    # so u is never 0 (ln(0) guard)
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10)
        .cast("double")
        + 0.5
    ) / F.lit(float(1 << 60))
    pri = -F.log(u) / F.greatest(F.col("n_chars"), F.lit(1)).cast("double")
    return (
        d.withColumn("priority", pri)
        .orderBy("priority", "doc_id")
        .limit(_RESERVOIR_K)
        .select(
            "doc_id",
            "n_chars",
            F.round("priority", 6).alias("priority"),
        )
    )


# NB the rounded output column must NOT shadow the ranking key: an
# `ORDER BY priority` after `round(...) AS priority` binds to the
# ROUNDED alias in SQL scoping, which ties at the k-boundary and
# breaks the tie by doc_id differently from Spark's raw-value sort
# (observed at sf0.1: rank-20/21 priorities 1.7797e-5 vs 1.8097e-5
# both display-round to 1.8e-5). Rank on the raw value inside, round
# only in the outer projection.
RESERVOIR_SQL = f"""
SELECT doc_id, n_chars, round(p, 6) AS priority
FROM (
  SELECT doc_id, n_chars,
         -ln((CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                   AS BIGINT) + 0.5) / {float(1 << 60)})
           / CAST(greatest(n_chars, 1) AS DOUBLE) AS p
  FROM documents
  ORDER BY p, doc_id
  LIMIT {_RESERVOIR_K}
)
ORDER BY p, doc_id
"""


QUERIES = {
    "table_profile_lineitem": QuerySpec(table_profile_lineitem, _PROFILE_SQL),
    "skyline_parts": QuerySpec(skyline_parts, SKYLINE_SQL),
    "weighted_reservoir_topk": QuerySpec(weighted_reservoir_topk, RESERVOIR_SQL),
}
