"""Local replica of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB at sf0.01, compare
row-count, column names, and order-insensitive values.

Usage: python tools/check_correctness.py [name ...]
"""

from __future__ import annotations

import math
import os
import sys
import time
import traceback

import duckdb

sys.path.insert(0, ".")

import __spark_entry__ as E  # noqa: E402
from composable_logs_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(val):
    """Kind-tagged canonical value.

    Tagging the numeric KIND matters: Python's Counter treats 1864 and
    1864.0 as the same key, but a driver that hashes a pandas/Arrow
    fetch sees DuckDB HUGEINT (-> float64/Decimal) differently from
    Spark's int64 — exactly the round-5 q12/outlier/winsorize reds.
    An int-vs-float divergence must therefore FAIL here, not alias.
    """
    import decimal

    if val is None:
        return None
    if isinstance(val, bool):
        return ("b", val)
    if isinstance(val, float):
        if math.isnan(val):
            return ("f", "NaN")
        # collapse -0.0/representation noise the same way a value-hash
        # canonicaliser would
        return ("f", round(val, 9))
    if isinstance(val, int):
        return ("i", val)
    if isinstance(val, decimal.Decimal):
        return ("d", str(val))
    if isinstance(val, bytes):
        return val.hex()
    return val


def rows_to_multiset(columns, rows):
    from collections import Counter

    cols = sorted(range(len(columns)), key=lambda i: columns[i])
    return Counter(
        tuple(canon(r[i]) for i in cols) for r in rows
    ), [columns[i] for i in cols]


def main():
    only = set(sys.argv[1:])
    spark = get_spark("correctness", cpus=16, shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    qs, oracles = E.queries(), E.oracle_sql()
    failures = []
    for name, fn in sorted(qs.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception:
            print(f"FAIL {name}: spark error")
            traceback.print_exc()
            failures.append(name)
            continue
        if name not in oracles:
            print(f"ok?  {name}: rows-only ({len(srows)} rows) [{time.time()-t0:.1f}s]")
            continue
        try:
            # fetchall() silently narrows HUGEINT to Python int, so probe
            # the planned output types first: a HUGEINT/DECIMAL column
            # reaches a pandas/Arrow-fetching driver as float64/Decimal
            # and hash-mismatches Spark's int64 even when values agree.
            desc = con.execute(
                f"DESCRIBE (SELECT * FROM ({oracles[name]}) q)"
            ).fetchall()
            bad = [(c, t) for c, t, *_ in desc if "HUGEINT" in t or "DECIMAL" in t]
            if bad:
                print(f"FAIL {name}: HUGEINT/DECIMAL oracle columns {bad}")
                failures.append(name)
                continue
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception:
            print(f"FAIL {name}: duckdb error")
            traceback.print_exc()
            failures.append(name)
            continue
        s_ms, s_cols = rows_to_multiset(scols, srows)
        o_ms, o_cols = rows_to_multiset(ocols, orows)
        if s_cols != o_cols:
            print(f"FAIL {name}: columns {s_cols} != {o_cols}")
            failures.append(name)
        elif sum(s_ms.values()) != sum(o_ms.values()):
            print(f"FAIL {name}: rowcount {sum(s_ms.values())} != {sum(o_ms.values())}")
            failures.append(name)
        elif s_ms != o_ms:
            s_only = list((s_ms - o_ms).keys())[:2]
            o_only = list((o_ms - s_ms).keys())[:2]
            print(f"FAIL {name}: values differ; spark-only={s_only} oracle-only={o_only}")
            failures.append(name)
        else:
            print(f"PASS {name} ({len(s_ms)} rows) [{time.time()-t0:.1f}s]")

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
