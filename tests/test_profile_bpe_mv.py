"""profile_q, bpe_q, mv_q: independent Python references.

The BPE test re-implements the Sennrich trainer with Python's
``str.replace`` — the same left-to-right continue-after-replacement
convention Spark's and DuckDB's ``replace`` use — so the full merge
sequence must agree token-for-token.
"""

import hashlib
import math
from collections import Counter

import duckdb
import pandas as pd

from composable_logs_spark.queries.bpe_q import _N_MERGES, bpe_train_merges
from composable_logs_spark.queries.mv_q import mv_incremental_merge
from composable_logs_spark.queries.profile_q import (
    _RESERVOIR_K,
    skyline_parts,
    table_profile_lineitem,
    weighted_reservoir_topk,
)


def _bpe_reference(word_counts: Counter, k: int):
    vocab = {
        " " + " ".join(w) + " ": c for w, c in word_counts.items()
    }
    merges = []
    for rank in range(1, k + 1):
        pairs = Counter()
        for sym, cnt in vocab.items():
            arr = sym.split()
            for i in range(len(arr) - 1):
                pairs[(arr[i], arr[i + 1])] += cnt
        if not pairs:
            break
        # deterministic tie-break: count desc, then (l, r) ascending
        top = max(pairs.values())
        l, r = min(pair for pair, c in pairs.items() if c == top)
        total = top
        merges.append((rank, l, r, l + r, total))
        vocab = {
            sym.replace(f" {l} {r} ", f" {l}{r} "): cnt
            for sym, cnt in vocab.items()
        }
        # identical symbol strings can collapse after a merge
        merged = Counter()
        for sym, cnt in vocab.items():
            merged[sym] += cnt
        vocab = dict(merged)
    return merges


def test_bpe_merges_match_reference(spark, sf_dir):
    con = duckdb.connect()
    words = Counter(
        dict(
            con.execute(
                f"SELECT word, count(*) FROM (SELECT unnest(string_split(text,' ')) AS word"
                f" FROM '{sf_dir}/documents.parquet') WHERE word <> '' GROUP BY 1"
            ).fetchall()
        )
    )
    expect = _bpe_reference(words, _N_MERGES)
    got = [
        (r["merge_rank"], r["left_sym"], r["right_sym"], r["merged"], r["pair_count"])
        for r in bpe_train_merges(spark, sf_dir).collect()
    ]
    assert got == expect
    # merges are well-formed: merged token = concatenation, counts positive
    for _, l, r, m, c in got:
        assert m == l + r and c > 0


def test_local_trainer_equals_distributed(spark, sf_dir):
    """train_bpe_local (the vocab-sized driver-side path for real merge
    counts) must produce the exact merge sequence of the distributed
    K-job loop on the same corpus."""
    from composable_logs_spark.queries.bpe_q import (
        _collect_word_counts,
        _train_distributed,
        train_bpe_local,
    )

    local = train_bpe_local(_collect_word_counts(spark, sf_dir))
    # r13: the query surface now trains via train_bpe_local; the K-job
    # loop is kept as _train_distributed precisely so this parity test
    # still compares two INDEPENDENT implementations.
    dist = [(r, l, rt, m, c) for r, l, rt, m, c in _train_distributed(spark, sf_dir)[0]]
    assert local == dist


def test_adaptive_trainer_switch(spark, sf_dir, monkeypatch):
    """r13 verdict item 1: _train_merges must gate the driver-side
    collect on the vocab size — past _LOCAL_VOCAB_MAX it falls back to
    the distributed loop, with an identical merge sequence."""
    from composable_logs_spark.queries import bpe_q

    local = bpe_q._train_merges(spark, sf_dir)  # fits: driver-side path
    monkeypatch.setattr(bpe_q, "_LOCAL_VOCAB_MAX", 0)  # nothing "fits"
    forced_dist = bpe_q._train_merges(spark, sf_dir)
    assert local == forced_dist


def test_encode_oov_tokenizes_unseen_words(spark, sf_dir):
    """Merge application at encode time must tokenize words ABSENT from
    the training vocabulary (the train-time vocab join can't), and must
    agree with a Python replay of the same merges."""
    from pyspark.sql import functions as F

    from composable_logs_spark.queries import load
    from composable_logs_spark.queries.bpe_q import (
        _collect_word_counts,
        bpe_encode_oov,
        train_bpe_local,
    )

    train_vocab = {w for w, _ in _collect_word_counts(spark, sf_dir)}
    got = {r["word"]: r["n_tokens"] for r in bpe_encode_oov(spark, sf_dir).collect()}
    oov = set(got) - train_vocab
    assert oov, "fixture regression: p_name must contain words unseen in documents"
    merges = train_bpe_local(_collect_word_counts(spark, sf_dir))
    for word, n_tokens in got.items():
        sym = " " + " ".join(word) + " "
        for _, l, r, _m, _ in merges:
            sym = sym.replace(f" {l} {r} ", f" {l}{r} ")
        assert n_tokens == len(sym.split()), word
        assert 1 <= n_tokens <= len(word)
    # and every p_name word is covered
    expect_words = {
        r["word"]
        for r in load(spark, sf_dir, "part")
        .select(F.explode(F.split("p_name", " ")).alias("word"))
        .where(F.col("word") != "")
        .distinct()
        .collect()
    }
    assert set(got) == expect_words


def test_profile_matches_pandas(spark, sf_dir):
    pdf = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    got = {r["col_name"]: r for r in table_profile_lineitem(spark, sf_dir).collect()}
    assert set(got) == set(pdf.columns)
    for c in pdf.columns:
        assert got[c]["n_rows"] == len(pdf)
        assert got[c]["n_nonnull"] == pdf[c].notna().sum()
        assert got[c]["n_distinct"] == pdf[c].nunique(dropna=True)


def test_skyline_matches_bruteforce(spark, sf_dir):
    pdf = pd.read_parquet(f"{sf_dir}/part.parquet")
    pts = list(zip(pdf.p_partkey, pdf.p_retailprice, pdf.p_size))
    expect = {
        (k, p, s)
        for k, p, s in pts
        if not any(
            (p2 <= p and s2 >= s and (p2 < p or s2 > s))
            for _, p2, s2 in pts
        )
    }
    got = {
        (r["p_partkey"], r["p_retailprice"], r["p_size"])
        for r in skyline_parts(spark, sf_dir).collect()
    }
    assert got == expect
    # frontier is a chain: sorted by price, sizes strictly decrease...
    # (min-price / max-size skyline: cheaper frontier points have
    # smaller sizes)
    chain = sorted(got, key=lambda t: t[1])
    sizes = [s for _, _, s in chain]
    assert all(a > b for a, b in zip(sizes[1:], sizes))


def test_weighted_reservoir_matches_reference(spark, sf_dir):
    pdf = pd.read_parquet(f"{sf_dir}/documents.parquet")
    pri = []
    for doc_id, n_chars in zip(pdf.doc_id, pdf.n_chars):
        h = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:15], 16)
        u = (h + 0.5) / float(1 << 60)
        pri.append((-math.log(u) / max(n_chars, 1), doc_id, n_chars))
    expect = [
        (d, n) for _, d, n in sorted(pri)[:_RESERVOIR_K]
    ]
    got = [
        (r["doc_id"], r["n_chars"])
        for r in weighted_reservoir_topk(spark, sf_dir).collect()
    ]
    assert got == expect


def test_mv_merge_equals_flat_recompute(spark, sf_dir):
    """The incremental path must be indistinguishable from a flat
    aggregation — including keys present only in base, only in delta,
    or in both (the events span Jan 1-30 and the cutoff is Jan 20, so
    all three cases occur naturally per event_type)."""
    from composable_logs_spark.queries import load
    from pyspark.sql import functions as F

    got = mv_incremental_merge(spark, sf_dir).collect()
    ev = load(spark, sf_dir, "events")
    flat = (
        ev.groupBy(
            "event_type", F.to_date(F.date_trunc("day", "ts")).alias("day")
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.expr("CAST(round(value * 1000000, 0) AS BIGINT)")).alias(
                "sm"
            ),
        )
        .collect()
    )
    flat_map = {(r["event_type"], r["day"]): r for r in flat}
    assert len(got) == len(flat_map)
    days = set()
    for r in got:
        f = flat_map[(r["event_type"], r["day"])]
        assert r["n_events"] == f["n_events"]
        assert abs(r["sum_value"] - f["sm"] / 1e6) < 0.006
        days.add(r["day"])
    # both segments genuinely contribute
    import datetime

    cutoff = datetime.date(2024, 1, 20)
    assert any(d < cutoff for d in days) and any(d >= cutoff for d in days)


def test_seasonal_anomaly_matches_pandas(spark, sf_dir):
    from composable_logs_spark.queries.seasonal_q import (
        _Z_CUT,
        seasonal_anomaly_events,
    )

    pdf = pd.read_parquet(f"{sf_dir}/events.parquet")
    pdf["hour"] = pdf.ts.dt.floor("h")
    pdf["hod"] = pdf.ts.dt.hour
    hourly = (
        pdf.groupby(["event_type", "hour", "hod"]).size().reset_index(name="n")
    )
    prof = hourly.groupby(["event_type", "hod"]).n.agg(
        ["count", "mean", "std"]
    )
    expect = set()
    for r in hourly.itertuples():
        cnt, m, s = prof.loc[(r.event_type, r.hod)]
        if cnt >= 3 and s > 0 and abs((r.n - m) / s) > _Z_CUT:
            expect.add((r.event_type, r.hour.strftime("%Y-%m-%d %H:00:00")))
    got = {
        (r["event_type"], r["hour"])
        for r in seasonal_anomaly_events(spark, sf_dir).collect()
    }
    assert got == expect


def test_forecast_linear_matches_numpy(spark, sf_dir):
    import numpy as np

    from composable_logs_spark.queries.seasonal_q import forecast_linear_events

    pdf = pd.read_parquet(f"{sf_dir}/events.parquet")
    pdf["day"] = pdf.ts.dt.floor("d")
    daily = pdf.groupby(["event_type", "day"]).size().reset_index(name="y")
    d0 = daily.day.min()
    got = {r["event_type"]: r for r in forecast_linear_events(spark, sf_dir).collect()}
    assert set(got) == set(daily.event_type.unique())
    for et, g in daily.groupby("event_type"):
        x = (g.day - d0).dt.days.to_numpy(float)
        y = g.y.to_numpy(float)
        slope, intercept = np.polyfit(x, y, 1)
        r = got[et]
        assert abs(r["slope"] - slope) < 1e-3
        assert abs(r["intercept"] - intercept) < 1e-2
        corr = np.corrcoef(x, y)[0, 1]
        assert abs(r["r2"] - corr * corr) < 1e-3
        for h in (1, 2, 3):
            assert abs(r[f"forecast_{h}"] - (intercept + slope * (x.max() + h))) < 0.02
        assert r["n_days"] == len(g)
