"""3-core of the co-purchase graph: the dense recommendation fabric.

``graph_kcore`` extracts the 3-core of the >= 1-co-buy part graph (the
same edge frame the BFS / label-propagation / Adamic-Adar queries walk)
and reports each surviving part with its in-core degree. This fills the
one structural gap in the graph surface: triangles / PMI / link
prediction all score LOCAL structure, components find connectivity at
any density, but nothing yet separated the load-bearing dense fabric
from the peeling tendrils — which is exactly what a pipeline does
before running an expensive community or embedding pass on a
co-occurrence graph.

Correctness: peeling is order-independent (Seidman 1983), so the
bulk-synchronous Spark loop (``operators/kcore.py``) and the DuckDB
oracle — the SAME peel UNROLLED to ``max_rounds`` stages — agree
exactly: once a stage removes nothing, every later unrolled stage is an
identity, so unrolling PAST convergence is harmless, and Spark RAISES
if convergence needs more rounds than the oracle unrolls, turning the
one possible divergence into a loud error instead of a hash mismatch.

100 TB shape: per round one degree hash-aggregate + two left-semi
joins, all on the node key; round count = peel depth (single digits on
co-occurrence graphs); lineage cut per round via persist/unpersist.

Reference anchor: none (north-star scope, SURVEY.md §2.10).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import QuerySpec
from ..operators.kcore import kcore_subgraph
from .basket_q import _edges, _edges_sql

_K = 3
_MAX_ROUNDS = 24


def graph_kcore(spark: SparkSession, sf: str) -> DataFrame:
    e = _edges(spark, sf, 1)
    return kcore_subgraph(e, _K, max_rounds=_MAX_ROUNDS)


def _kcore_sql() -> str:
    """The same peel, unrolled: stage i keeps nodes whose degree within
    the stage-(i-1) induced subgraph is >= k. Idempotent past
    convergence, so a fixed unroll depth equal to the Spark loop's
    ``max_rounds`` is exact (the Spark side raises beyond it)."""
    parts = [f"WITH e0 AS MATERIALIZED ({_edges_sql(1)})"]
    for i in range(1, _MAX_ROUNDS + 1):
        parts.append(
            f"""s{i} AS MATERIALIZED (
  SELECT node FROM (
    SELECT a AS node FROM e{i - 1} UNION ALL SELECT b AS node FROM e{i - 1}
  ) GROUP BY node HAVING count(*) >= {_K}
)"""
        )
        parts.append(
            f"""e{i} AS MATERIALIZED (
  SELECT e.a, e.b FROM e{i - 1} e
  JOIN s{i} x ON e.a = x.node
  JOIN s{i} y ON e.b = y.node
)"""
        )
    head = ",\n".join(parts)
    return f"""{head}
SELECT node, CAST(count(*) AS BIGINT) AS core_deg
FROM (
  SELECT a AS node FROM e{_MAX_ROUNDS}
  UNION ALL SELECT b AS node FROM e{_MAX_ROUNDS}
)
GROUP BY node
"""


QUERIES = {
    "graph_kcore": QuerySpec(graph_kcore, _kcore_sql()),
}
