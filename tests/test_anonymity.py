"""k-anonymity audit (queries/anonymity_q): classes at-or-above k are
suppressed, smaller classes surface with the exact integer
re-identification risk, and balance bucketing floors negatives
correctly."""

from composable_logs_spark.queries.anonymity_q import _K, anonymity_k_audit


def _sf(spark, tmp_path, rows):
    spark.createDataFrame(
        [
            (i, f"Customer#{i}", nat, bal, seg)
            for i, (nat, seg, bal) in enumerate(rows)
        ],
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double,"
        " c_mktsegment string",
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "customer.parquet")
    )
    return str(tmp_path)


def test_small_classes_flagged_with_exact_risk(spark, tmp_path):
    rows = (
        # class (1, BUILDING, bucket 1): size 6 >= k -> suppressed
        [(1, "BUILDING", 1500.0)] * 6
        # class (2, AUTO, bucket 2): size 2 -> risk 500000
        + [(2, "AUTOMOBILE", 2100.0), (2, "AUTOMOBILE", 2900.0)]
        # class (3, MACH, bucket -1): NEGATIVE balance floors to -1
        + [(3, "MACHINERY", -500.0)]
    )
    got = {
        (r["c_nationkey"], r["c_mktsegment"], r["acctbal_kbucket"]): r
        for r in anonymity_k_audit(spark, _sf(spark, tmp_path, rows)).collect()
    }
    assert (1, "BUILDING", 1) not in got  # k-anonymous, not reported
    assert got[(2, "AUTOMOBILE", 2)]["class_size"] == 2
    assert got[(2, "AUTOMOBILE", 2)]["risk_micro"] == 500_000
    assert got[(3, "MACHINERY", -1)]["class_size"] == 1
    assert got[(3, "MACHINERY", -1)]["risk_micro"] == 1_000_000
    assert all(r["class_size"] < _K for r in got.values())
