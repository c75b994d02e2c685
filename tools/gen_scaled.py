"""Synthesize a K-times replica of the sf0.1 testdata (~sf0.1*K) for
SCALING-CURVE benchmarks — evidence that headline queries scale
linearly in rows, beyond the largest driver-provided SF.

Replication keeps the workload SHAPE honest rather than the values:

- fact tables replicate with disjoint key offsets (orders/lineitem/
  customer/supplier/part/events), so joins fan out exactly K-fold and
  group cardinalities grow like real growth;
- dimensions (region, nation) stay fixed — at 100 TB the dim tables do
  not grow with the fact data;
- events keep their time range (more traffic in the same window, so
  sessionisation state per user stays bounded) with user ids offset per
  replica;
- document text is PERTURBED per replica (every 5th token replaced with
  a replica tag): replicas stay plausible documents but fall below
  near-dup thresholds, so dedup workloads scale in corpus size instead
  of drowning in K^2 planted cross-replica pairs;
- embeddings replicate with offset ids and a small per-replica
  component shift.

BENCH-ONLY data: no oracle runs against it (the correctness gate stays
on the driver-provided SFs).

Usage: python tools/gen_scaled.py [K] [out_dir]   (defaults 4, /tmp)
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
K = int(sys.argv[1]) if len(sys.argv) > 1 else 4
OUT = (
    sys.argv[2]
    if len(sys.argv) > 2
    else f"/tmp/spark_graft_scaled_sf{str(0.1 * K).replace('.', 'p')}"
)

_OFF = 10**9  # disjoint id ranges per replica


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    reps = ", ".join(str(i) for i in range(K))

    def copy(table: str, select_sql: str) -> None:
        con.execute(
            f"COPY ({select_sql}) TO '{OUT}/{table}.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(
            f"SELECT count(*) FROM '{OUT}/{table}.parquet'"
        ).fetchone()[0]
        print(f"{table}: {n} rows")

    for t in ("region", "nation"):  # fixed dims
        copy(t, f"SELECT * FROM '{SRC}/{t}.parquet'")

    copy(
        "customer",
        f"""SELECT c_custkey + i::BIGINT * {_OFF} AS c_custkey, c_name, c_nationkey,
                   c_acctbal, c_mktsegment
            FROM '{SRC}/customer.parquet', UNNEST([{reps}]) AS r(i)""",
    )
    copy(
        "supplier",
        f"""SELECT s_suppkey + i::BIGINT * {_OFF} AS s_suppkey, s_name, s_nationkey,
                   s_acctbal
            FROM '{SRC}/supplier.parquet', UNNEST([{reps}]) AS r(i)""",
    )
    copy(
        "part",
        f"""SELECT p_partkey + i::BIGINT * {_OFF} AS p_partkey, p_name, p_brand,
                   p_type, p_size, p_retailprice
            FROM '{SRC}/part.parquet', UNNEST([{reps}]) AS r(i)""",
    )
    copy(
        "orders",
        f"""SELECT o_orderkey + i::BIGINT * {_OFF} AS o_orderkey,
                   o_custkey + i::BIGINT * {_OFF} AS o_custkey,
                   o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
            FROM '{SRC}/orders.parquet', UNNEST([{reps}]) AS r(i)""",
    )
    copy(
        "lineitem",
        f"""SELECT l_orderkey + i::BIGINT * {_OFF} AS l_orderkey,
                   l_partkey + i::BIGINT * {_OFF} AS l_partkey,
                   l_suppkey + i::BIGINT * {_OFF} AS l_suppkey,
                   l_linenumber, l_quantity, l_extendedprice, l_discount,
                   l_tax, l_returnflag, l_linestatus, l_shipdate
            FROM '{SRC}/lineitem.parquet', UNNEST([{reps}]) AS r(i)""",
    )
    copy(
        "events",
        f"""SELECT event_id + i::BIGINT * {_OFF} AS event_id, ts,
                   user_id + i::BIGINT * {_OFF} AS user_id, event_type, value, props
            FROM '{SRC}/events.parquet', UNNEST([{reps}]) AS r(i)""",
    )
    copy(
        "documents",
        f"""SELECT doc_id + i::BIGINT * {_OFF} AS doc_id,
                   CASE WHEN i = 0 THEN text
                        ELSE array_to_string(
                          list_transform(string_split(text, ' '),
                            (w, p) -> CASE WHEN p % 5 = 0
                                      THEN 'r' || i || 'w' || p ELSE w END),
                          ' ')
                   END AS text,
                   lang, source, n_chars
            FROM '{SRC}/documents.parquet', UNNEST([{reps}]) AS r(i)""",
    )
    copy(
        "embeddings",
        f"""SELECT vec_id + i::BIGINT * {_OFF} AS vec_id,
                   list_transform(embedding,
                     x -> CAST(x + i * 0.001 AS FLOAT)) AS embedding,
                   label
            FROM '{SRC}/embeddings.parquet', UNNEST([{reps}]) AS r(i)""",
    )
    print(f"wrote {OUT} (K={K})")


if __name__ == "__main__":
    main()
