"""Oracle output-type audit — guards the round-5 driver-red failure mode.

The driver gate hash-compares our Spark result against our oracle SQL run
on DuckDB, fetched through pandas/Arrow. DuckDB types ``sum(<integer>)``
as HUGEINT (int128), which that fetch path renders as float64/Decimal —
so a column whose values are bit-identical 64-bit integers on both
engines still hash-mismatches on TYPE KIND. Round 5 lost exactly three
queries (q12_priority_lines, outlier_mad_events, winsorize_doc_lengths)
to this, and pack_sequences carried the same latent flaw.

``DESCRIBE`` binds and plans without executing, so this audit covers the
full registry in seconds: no oracle may emit HUGEINT or DECIMAL.
"""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as E

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


def test_no_hugeint_or_decimal_oracle_columns(con):
    offenders = {}
    for name, sql in E.oracle_sql().items():
        desc = con.execute(f"DESCRIBE (SELECT * FROM ({sql}) q)").fetchall()
        bad = [(c, t) for c, t, *_ in desc if "HUGEINT" in t or "DECIMAL" in t]
        if bad:
            offenders[name] = bad
    assert not offenders, (
        "HUGEINT/DECIMAL oracle output columns (pandas/Arrow fetch turns "
        f"these into float64/Decimal and breaks the driver hash): {offenders}"
    )
