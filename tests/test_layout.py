"""Z-order layout: the per-file skipping statistics must show the
multi-dimensional bound the Morton interleave buys — BOTH dimensions
bounded per file under zorder, only the leading one under linear."""

import pandas as pd

from composable_logs_spark.queries.layout_q import (
    _BITS,
    _FILE_BITS,
    zorder_layout_lineitem,
)


def test_zorder_bounds_both_dimensions(spark, sf_dir):
    rows = zorder_layout_lineitem(spark, sf_dir).collect()
    n_li = len(pd.read_parquet(f"{sf_dir}/lineitem.parquet"))
    by_layout = {}
    for r in rows:
        by_layout.setdefault(r["layout"], []).append(r)
    assert set(by_layout) == {"linear", "zorder"}
    for layout, rs in by_layout.items():
        # every row lands in exactly one file per layout
        assert sum(r["n_rows"] for r in rs) == n_li
        assert len({r["file_id"] for r in rs}) == len(rs)
    # linear: file = pk >> 3, so pk_span <= 8 but sk is unbounded
    for r in by_layout["linear"]:
        assert r["pk_span"] <= 1 << (_BITS - _FILE_BITS)
        assert r["pk_min"] >> (_BITS - _FILE_BITS) == r["file_id"]
    # zorder file id fixes ceil(5/2)=3 high pk bits and 2 high sk bits
    for r in by_layout["zorder"]:
        assert r["pk_span"] <= 1 << (_BITS - 3)
        assert r["sk_span"] <= 1 << (_BITS - 2)
        assert r["pk_min"] >> (_BITS - 3) == r["pk_max"] >> (_BITS - 3)
        assert r["sk_min"] >> (_BITS - 2) == r["sk_max"] >> (_BITS - 2)
    # the workload story: summed spans (= equality probes not skipped)
    # must be strictly better on the non-leading dim under zorder
    lin_sk = sum(r["sk_span"] for r in by_layout["linear"])
    z_sk = sum(r["sk_span"] for r in by_layout["zorder"])
    assert z_sk < lin_sk
