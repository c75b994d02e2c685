"""Fellegi-Sunter linkage: the planted dirty copy of every customer
must be recovered, with the classification the field weights predict."""

import pandas as pd

from composable_logs_spark.queries.fs_linkage_q import (
    _BAL_A,
    _BAL_D,
    _MATCH_MILLI,
    _NAME_A,
    _SEG_A,
    er_fellegi_sunter,
)


def test_fs_recovers_every_planted_pair(spark, sf_dir):
    keys = pd.read_parquet(f"{sf_dir}/customer.parquet")["c_custkey"]
    got = er_fellegi_sunter(spark, sf_dir).collect()
    true_pairs = {r["base_key"]: r for r in got if r["base_key"] == r["cand_key"]}
    # 100% recall on the planted duplicates
    assert set(true_pairs) == set(keys.tolist())
    for k, r in true_pairs.items():
        # the one-char corruption stays within the levenshtein<=1 agree band
        assert r["name_agree"] and r["seg_agree"]
        # balance drift (k%7)*10 cents crosses the 35-cent band at k%7>=4
        assert r["bal_agree"] == (k % 7 < 4)
        expect = _NAME_A + _SEG_A + (_BAL_A if k % 7 < 4 else _BAL_D)
        assert r["score_milli"] == expect
        assert r["class"] == ("match" if expect >= _MATCH_MILLI else "possible")


def test_fs_no_weak_pairs_leak(spark, sf_dir):
    got = er_fellegi_sunter(spark, sf_dir).collect()
    # with these weights, neither name disagreement (max 1936 milli-bits)
    # nor name alone (4229) reaches the 6000 possible band: every emitted
    # pair agrees on name AND on at least one corroborating field
    for r in got:
        assert r["name_agree"] and (r["seg_agree"] or r["bal_agree"])
