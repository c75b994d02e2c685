"""Temperature sampling must FLATTEN the language distribution:
sqrt-weighting pulls every share toward uniform, never past it."""

from composable_logs_spark.queries.mix_q import mix_temperature_sample


def test_temperature_flattens_shares(spark, sf_dir):
    df = mix_temperature_sample(spark, sf_dir)
    rows = df.collect()
    assert len(rows) >= 2
    # EVERY language appears in the report, even one whose integer quota
    # floors to 0 (left join + coalesce, not an inner join drop)
    sdf = df.sparkSession.read.parquet(f"{sf_dir}/documents.parquet")
    assert len(rows) == sdf.select("lang").distinct().count()
    uniform = 1000 // len(rows)
    for r in rows:
        assert 0 <= r["n_sampled"] <= r["n_available"]
        # integer-floor shares allow 1-milli slack around strictness
        if r["raw_share_milli"] > uniform:
            assert r["temp_share_milli"] <= r["raw_share_milli"] + 1
        if r["raw_share_milli"] < uniform:
            assert r["temp_share_milli"] >= r["raw_share_milli"] - 1
    # the spread strictly contracts overall
    raw = [r["raw_share_milli"] for r in rows]
    tmp = [r["temp_share_milli"] for r in rows]
    assert max(tmp) - min(tmp) <= max(raw) - min(raw)
