"""Partition-sensitivity sweep: run EVERY registered query under two
deliberately different session shapes and require identical canonical
results.

Why this exists: the driver's session config (cores, shuffle
partitions, scan split size) is not ours to choose, so any query whose
result depends on partitioning will flake the gate even though it
passes locally. Round 6 caught exactly this in ``percentile_approx``
(GK sketch merge is partial-split-sensitive: p50 52832.76 vs 52847.07
for the same data) — this sweep generalises that probe to the whole
registry. Classic offenders it would catch: ``first()`` over
non-constant groups, float sums surfaced without rounding, limit
without a total order, RDD-order-dependent ids.

Usage: python tools/check_determinism.py [sf_dir]  (default sf0.001)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.check_correctness import canon  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

# two shapes chosen to maximise plan divergence: tiny splits + few
# reducers vs big splits + many reducers, different core counts
SHAPES = [
    {"cores": 4, "shuffle": 3, "max_bytes": 96 * 1024},
    {"cores": 16, "shuffle": 32, "max_bytes": 128 * 1024 * 1024},
]


def run_all(shape):
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{shape['cores']}]")
        .config("spark.sql.shuffle.partitions", str(shape["shuffle"]))
        .config("spark.sql.files.maxPartitionBytes", str(shape["max_bytes"]))
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as E

    out = {}
    for name, fn in sorted(E.queries().items()):
        t0 = time.time()
        df = fn(spark, SF_DIR)
        cols = sorted(df.columns)
        idx = [df.columns.index(c) for c in cols]
        # sort by repr: canon mixes tuples/None/str, which don't compare
        rows = sorted(
            (tuple(canon(r[i]) for i in idx) for r in df.collect()), key=repr
        )
        out[name] = (tuple(cols), rows)
        print(f"  {name}: {len(rows)} rows [{time.time()-t0:.1f}s]", flush=True)
    spark.stop()
    return out


def main():
    print(f"shape A: {SHAPES[0]}")
    a = run_all(SHAPES[0])
    print(f"shape B: {SHAPES[1]}")
    b = run_all(SHAPES[1])
    bad = []
    for name in a:
        if a[name] != b[name]:
            bad.append(name)
            ra, rb = a[name][1], b[name][1]
            diff = next(
                (i for i, (x, y) in enumerate(zip(ra, rb)) if x != y), None
            )
            print(f"NONDETERMINISTIC {name}: first divergent row #{diff}")
            if diff is not None:
                print(f"  A: {ra[diff]}\n  B: {rb[diff]}")
    print(f"\n{len(bad)} partition-sensitive queries" + (f": {bad}" if bad else ""))
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
