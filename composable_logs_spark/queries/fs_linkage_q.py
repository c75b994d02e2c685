"""Fellegi-Sunter probabilistic record linkage (Fellegi & Sunter 1969)
— the scored counterpart to the rule-based fuzzy matcher in
``fuzzy_q``: each comparison field contributes a log-likelihood-ratio
weight (log2 m/u on agreement, log2 (1-m)/(1-u) on disagreement), the
pair's total weight classifies it as match / possible, and the m/u
probabilities make the tradeoff explicit instead of buried in a
distance threshold. This is the linkage model Splink/JedAI-scale ER
pipelines run; at 100 TB it is the same three-stage shape as
``fuzzy_match_partnames`` — canonicalise, block, score — where only
the block-local pair stage is quadratic.

Fixture: a deterministically "dirty" re-keying of the customer table
(every third name gets a one-character corruption; account balances
drift by (key mod 7) * 10 cents), linked back against the clean base.
Both engines build the identical dirty copy, so the driver can
hash-compare the scored pairs.

Comparison vector (all exact in both engines):
- name:   levenshtein <= 1         (strong field: m=.95, u=.001)
- seg:    mktsegment equality      (weak field:   m=.90, u=.20)
- bal:    |balance| within 35 cents as INTEGER cents (m=.85, u=.05)

Weights are precomputed INTEGER milli-bits (the literal reaches both
engines through the query text), so the total score is an exact int64
sum — no float-accumulation hazard. Classification: match >= 10 bits,
possible >= 6 bits, rest dropped.

Blocking on nationkey bounds the candidate stage at sum_b |base_b| x
|dirty_b|; at corpus scale the block key would be a composite
(nation x sorted-neighbourhood window) exactly like the fuzzy_q
docstring describes — the FS scoring is oblivious to how candidates
were generated.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import QuerySpec, load


def _w(m: float, u: float) -> tuple[int, int]:
    return (
        round(1000 * math.log2(m / u)),
        round(1000 * math.log2((1 - m) / (1 - u))),
    )


_NAME_A, _NAME_D = _w(0.95, 0.001)
_SEG_A, _SEG_D = _w(0.90, 0.20)
_BAL_A, _BAL_D = _w(0.85, 0.05)
_MATCH_MILLI = 10000
_POSSIBLE_MILLI = 6000
_BAL_CENTS = 35


def _base_and_dirty(spark: SparkSession, sf: str) -> tuple[DataFrame, DataFrame]:
    c = load(spark, sf, "customer").select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        "c_mktsegment",
        F.round(F.col("c_acctbal") * 100, 0).cast("long").alias("cents"),
    )
    dirty = c.select(
        F.col("c_custkey").alias("d_custkey"),
        F.when(
            F.col("c_custkey") % 3 == 0,
            F.concat(
                F.substring(F.col("c_name"), 1, F.length("c_name") - 1), F.lit("X")
            ),
        )
        .otherwise(F.col("c_name"))
        .alias("d_name"),
        F.col("c_nationkey").alias("d_nationkey"),
        F.col("c_mktsegment").alias("d_mktsegment"),
        (F.col("cents") + (F.col("c_custkey") % 7) * 10).alias("d_cents"),
    )
    return c, dirty


def er_fellegi_sunter(spark: SparkSession, sf: str) -> DataFrame:
    base, dirty = _base_and_dirty(spark, sf)
    # r13 (guide §2.6/§6): the streamed side of this broadcast join is a
    # one-partition scan (the customer file is tiny by BYTES), but each
    # streamed row fans out to |nation block| candidate pairs that each
    # pay two levenshteins — the whole block-quadratic scoring stage ran
    # as ONE task (measured 45-76 s at sf0.1 with 31 cores idle).
    # Width must come from the CONSUMER's cost, not the scan bytes
    # (the ccnet cutd lesson): one round-robin repartition to cluster
    # parallelism spreads the pair generation, 45 s -> ~2 s. Row set is
    # unchanged; the output orderBy fixes the ordering.
    base = base.repartition(spark.sparkContext.defaultParallelism)
    pairs = base.join(dirty, base["c_nationkey"] == dirty["d_nationkey"])
    # bounded edit distance (threshold form returns -1 when the distance
    # exceeds the bound, so ">= 0" is exactly the old "<= 1"): the
    # banded DP is O(len * k) instead of O(len^2) per pair, and this
    # comparison runs twice per candidate pair (join condition +
    # projection) over every block-quadratic candidate
    name_agree = F.levenshtein(F.col("c_name"), F.col("d_name"), 1) >= 0
    seg_agree = F.col("c_mktsegment") == F.col("d_mktsegment")
    bal_agree = F.abs(F.col("cents") - F.col("d_cents")) <= _BAL_CENTS
    score = (
        F.when(name_agree, F.lit(_NAME_A)).otherwise(F.lit(_NAME_D))
        + F.when(seg_agree, F.lit(_SEG_A)).otherwise(F.lit(_SEG_D))
        + F.when(bal_agree, F.lit(_BAL_A)).otherwise(F.lit(_BAL_D))
    ).cast("long")
    return (
        pairs.select(
            F.col("c_custkey").alias("base_key"),
            F.col("d_custkey").alias("cand_key"),
            name_agree.alias("name_agree"),
            seg_agree.alias("seg_agree"),
            bal_agree.alias("bal_agree"),
            score.alias("score_milli"),
        )
        .where(F.col("score_milli") >= _POSSIBLE_MILLI)
        .withColumn(
            "class",
            F.when(F.col("score_milli") >= _MATCH_MILLI, F.lit("match")).otherwise(
                F.lit("possible")
            ),
        )
        .orderBy("base_key", "cand_key")
    )


_FS_SQL = f"""
WITH base AS (
  SELECT c_custkey, c_name, c_nationkey, c_mktsegment,
         CAST(round(c_acctbal * 100, 0) AS BIGINT) AS cents
  FROM customer
),
dirty AS (
  SELECT c_custkey AS d_custkey,
         CASE WHEN c_custkey % 3 = 0
              THEN substr(c_name, 1, length(c_name) - 1) || 'X'
              ELSE c_name END AS d_name,
         c_nationkey AS d_nationkey,
         c_mktsegment AS d_mktsegment,
         cents + (c_custkey % 7) * 10 AS d_cents
  FROM base
),
scored AS (
  SELECT b.c_custkey AS base_key, d.d_custkey AS cand_key,
         levenshtein(b.c_name, d.d_name) <= 1 AS name_agree,
         b.c_mktsegment = d.d_mktsegment AS seg_agree,
         abs(b.cents - d.d_cents) <= {_BAL_CENTS} AS bal_agree,
         CAST(
           (CASE WHEN levenshtein(b.c_name, d.d_name) <= 1
                 THEN {_NAME_A} ELSE {_NAME_D} END)
           + (CASE WHEN b.c_mktsegment = d.d_mktsegment
                   THEN {_SEG_A} ELSE {_SEG_D} END)
           + (CASE WHEN abs(b.cents - d.d_cents) <= {_BAL_CENTS}
                   THEN {_BAL_A} ELSE {_BAL_D} END)
           AS BIGINT) AS score_milli
  FROM base b JOIN dirty d ON b.c_nationkey = d.d_nationkey
)
SELECT base_key, cand_key, name_agree, seg_agree, bal_agree, score_milli,
       CASE WHEN score_milli >= {_MATCH_MILLI} THEN 'match'
            ELSE 'possible' END AS class
FROM scored
WHERE score_milli >= {_POSSIBLE_MILLI}
ORDER BY base_key, cand_key
"""


QUERIES = {
    "er_fellegi_sunter": QuerySpec(er_fellegi_sunter, _FS_SQL),
}
