"""Matryoshka prefix retrieval: the zero-prefix-norm convention.

A vector whose first ``_PREFIX_D`` dims are all zero has prefix norm 0;
cosine against it must be DEFINED (0.0) on both engines — a raw divide
yields NaN/Inf, and Spark and DuckDB disagree on NaN ordering, so one
pathological vector would nondeterministically reorder top-k instead of
ranking last. The test plants exactly that vector and cross-checks the
Spark result against the DuckDB oracle.
"""

import math
import random

import duckdb
import pandas as pd

from composable_logs_spark.queries.matryoshka_q import (
    _ORACLE,
    _PREFIX_D,
    ann_matryoshka_prefix,
)


def test_zero_prefix_vector_matches_oracle_and_has_no_nan(spark, tmp_path):
    rng = random.Random(7)
    rows = []
    for vec_id in range(30):
        if vec_id == 3:
            # query 3: first _PREFIX_D dims all zero -> prefix norm 0
            vec = [0.0] * _PREFIX_D + [rng.uniform(-1, 1) for _ in range(64 - _PREFIX_D)]
        elif vec_id == 17:
            # candidate 17: zero prefix too, so scored rows hit BOTH
            # zero-norm sides (qpnorm and pnorm)
            vec = [0.0] * _PREFIX_D + [rng.uniform(-1, 1) for _ in range(64 - _PREFIX_D)]
        else:
            vec = [rng.uniform(-1, 1) for _ in range(64)]
        rows.append((vec_id, vec, 0))
    pdf = pd.DataFrame(rows, columns=["vec_id", "embedding", "label"])
    sf = str(tmp_path)
    spark.createDataFrame(
        pdf, "vec_id long, embedding array<float>, label int"
    ).write.parquet(f"{sf}/embeddings.parquet")

    got = ann_matryoshka_prefix(spark, sf).toPandas()
    assert len(got) == 10  # _N_QUERIES
    # no NaN leaked into the rank lists or overlap counts
    for col in ("full_top", "prefix_top"):
        assert got[col].notna().all()
        assert not got[col].str.contains("nan", case=False).any()
    assert not got["n_overlap"].map(lambda v: isinstance(v, float) and math.isnan(v)).any()

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{sf}/embeddings.parquet/*.parquet'"
    )
    want = con.execute(_ORACLE).df()
    g = got.sort_values("query_id").reset_index(drop=True)
    w = want.sort_values("query_id").reset_index(drop=True)
    assert g.shape == w.shape
    assert (g[["query_id", "full_top", "prefix_top", "n_overlap"]].astype(str).values
            == w[["query_id", "full_top", "prefix_top", "n_overlap"]].astype(str).values).all()
