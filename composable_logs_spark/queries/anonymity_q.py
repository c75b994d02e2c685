"""k-anonymity audit (Sweeney 2002): find quasi-identifier equivalence
classes smaller than k — the privacy gate a pipeline runs BEFORE
releasing or training on user-linked records, complementing the
``pii_scrub_*`` redaction queries (scrubbing removes direct
identifiers; k-anonymity measures whether the remaining quasi-
identifiers still single people out).

Quasi-identifier set on ``customer``: (nation, market segment, account
balance bucketed to 1000s) — the classic coarse-demographics triple.
A class of size n < k means each member is re-identifiable with
probability 1/n given an adversary who knows the QI values;
``risk_micro = 1_000_000 div n`` reports that exactly in integer
micro-units.

100 TB shape: one hash-aggregate on the QI columns (map-side partial
combine, one shuffle on a uniform composite key), then a size filter —
the audit costs one pass regardless of table width because only the QI
columns leave the scan (column pruning).

Reference anchor: none (north-star scope, SURVEY.md §2.10) — the
reference has no privacy surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import QuerySpec, load

_K = 5


def anonymity_k_audit(spark: SparkSession, sf: str) -> DataFrame:
    cust = load(spark, sf, "customer")
    classes = (
        cust.select(
            "c_nationkey",
            "c_mktsegment",
            F.floor(F.col("c_acctbal") / 1000).cast("long").alias("acctbal_kbucket"),
        )
        .groupBy("c_nationkey", "c_mktsegment", "acctbal_kbucket")
        .agg(F.count("*").alias("class_size"))
    )
    return classes.where(F.col("class_size") < _K).select(
        "c_nationkey",
        "c_mktsegment",
        "acctbal_kbucket",
        "class_size",
        F.expr("1000000 div class_size").alias("risk_micro"),
    )


ANONYMITY_SQL = f"""
WITH classes AS (
  SELECT c_nationkey, c_mktsegment,
         CAST(floor(c_acctbal / 1000) AS BIGINT) AS acctbal_kbucket,
         CAST(count(*) AS BIGINT) AS class_size
  FROM customer
  GROUP BY 1, 2, 3
)
SELECT c_nationkey, c_mktsegment, acctbal_kbucket, class_size,
       1000000 // class_size AS risk_micro
FROM classes
WHERE class_size < {_K}
"""


QUERIES = {
    "anonymity_k_audit": QuerySpec(anonymity_k_audit, ANONYMITY_SQL),
}
