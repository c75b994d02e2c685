"""CDC apply-changes: last-writer-wins over a planted changelog."""

from composable_logs_spark.queries.cdc_q import apply_changes


def _apply(spark, base_rows, change_rows):
    base = spark.createDataFrame(base_rows, "key long, bal_cents long")
    changes = spark.createDataFrame(
        change_rows, "key long, seq long, op string, new_bal_cents long"
    )
    return {r["key"]: r for r in apply_changes(base, changes).collect()}


def test_last_writer_wins_and_tombstones(spark):
    base = [(1, 100), (2, 200), (3, 300)]
    changes = [
        (1, 10, "U", 111),
        (1, 20, "U", 122),  # later seq wins
        (2, 5, "U", 999),
        (2, 6, "D", 0),  # delete AFTER the update: row gone
        (4, 7, "U", 444),  # upsert of a key not in the base
    ]
    got = _apply(spark, base, changes)
    assert got[1]["bal_cents"] == 122 and got[1]["src"] == "upsert"
    assert 2 not in got
    assert got[3]["bal_cents"] == 300 and got[3]["src"] == "base"
    assert got[4]["bal_cents"] == 444 and got[4]["src"] == "upsert"


def test_delete_then_reinsert_survives(spark):
    # a delete followed by a LATER upsert resurrects the key
    got = _apply(spark, [(1, 100)], [(1, 1, "D", 0), (1, 2, "U", 555)])
    assert got[1]["bal_cents"] == 555 and got[1]["src"] == "upsert"
    # and the mirror order tombstones it
    got2 = _apply(spark, [(1, 100)], [(1, 1, "U", 555), (1, 2, "D", 0)])
    assert got2 == {}
