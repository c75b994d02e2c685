"""UniMax water-filling: checked against a pure-Python sequential
water-filler (third implementation — the paper's iterative form, NOT
the split-search the distributed plan uses), plus allocation
invariants on planted skewed corpora."""

import pandas as pd

from composable_logs_spark.queries.unimax_q import (
    _BUDGET_DEN,
    _BUDGET_NUM,
    _E,
    mix_unimax_sample,
)


def _py_unimax(counts: dict[str, int]) -> dict[str, int]:
    """Sequential water-filling: allocate the budget uniformly over the
    still-open languages, closing each language when it hits its epoch
    cap, floors throughout."""
    budget = (sum(counts.values()) * _BUDGET_NUM) // _BUDGET_DEN
    caps = {l: _E * n for l, n in counts.items()}
    quota = {l: 0 for l in counts}
    open_langs = sorted(caps, key=lambda l: (caps[l], l))
    remaining = budget
    while open_langs:
        share = remaining // len(open_langs)
        l = open_langs[0]  # smallest capacity first
        if caps[l] <= share:
            quota[l] = caps[l]
            remaining -= caps[l]
            open_langs.pop(0)
        else:
            # nobody else caps either (they're all larger): level off
            for m in open_langs:
                quota[m] = share
            break
    return quota


def test_matches_python_waterfiller_on_corpus(spark, sf_dir):
    got = {r["lang"]: r for r in mix_unimax_sample(spark, sf_dir).collect()}
    counts = (
        pd.read_parquet(f"{sf_dir}/documents.parquet")["lang"]
        .value_counts()
        .to_dict()
    )
    expect = _py_unimax({k: int(v) for k, v in counts.items()})
    assert set(got) == set(expect)
    for lang, q in expect.items():
        r = got[lang]
        assert r["quota"] == q, (lang, q, r)
        assert r["cap"] == _E * counts[lang]
        assert 0 <= r["quota"] <= r["cap"]
        assert r["epochs_milli"] == (1000 * r["quota"]) // r["n_available"]
    budget = (sum(counts.values()) * _BUDGET_NUM) // _BUDGET_DEN
    assert sum(r["quota"] for r in got.values()) <= budget


def test_oracle_matches_waterfiller_on_edge_corpora():
    """The SQL side alone vs the sequential Python water-filler on
    synthetic corpora the real test data cannot produce: extreme skew,
    a single language, exact ties, and a cascade of caps."""
    import duckdb

    from composable_logs_spark.queries.unimax_q import UNIMAX_SQL

    cases = [
        {"a": 1, "b": 1000},
        {"a": 5},
        {"a": 3, "b": 3, "c": 3},
        {"a": 1, "b": 2, "c": 4, "d": 8, "e": 1000, "f": 100000},
    ]
    for counts in cases:
        con = duckdb.connect()
        rows = [(f"{l}{i}", l) for l, n in counts.items() for i in range(n)]
        con.execute(
            "CREATE TABLE documents AS SELECT * FROM (VALUES "
            + ",".join(f"('{d}','{l}')" for d, l in rows)
            + ") t(doc_id, lang)"
        )
        got = {r[0]: r[3] for r in con.execute(UNIMAX_SQL).fetchall()}
        assert got == _py_unimax(counts), counts


def test_oracle_matches_waterfiller_fuzz():
    """Seeded random corpora (50 draws x up to 12 languages, counts
    spanning 5 orders of magnitude): SQL split-search == sequential
    water-filler, always."""
    import random

    import duckdb

    from composable_logs_spark.queries.unimax_q import UNIMAX_SQL

    rng = random.Random(20260815)
    for trial in range(50):
        k = rng.randint(1, 12)
        counts = {
            f"l{j}": rng.choice(
                [1, 2, 3, rng.randint(1, 9), rng.randint(10, 99),
                 rng.randint(100, 9999), rng.randint(10000, 99999)]
            )
            for j in range(k)
        }
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE lang_counts(lang VARCHAR, n BIGINT);"
        )
        con.executemany(
            "INSERT INTO lang_counts VALUES (?, ?)", list(counts.items())
        )
        # expand to a documents view without materialising huge tables
        con.execute(
            "CREATE VIEW documents AS "
            "SELECT lang || '-' || unnest(range(0, n)) AS doc_id, lang "
            "FROM lang_counts"
        )
        got = {r[0]: r[3] for r in con.execute(UNIMAX_SQL).fetchall()}
        assert got == _py_unimax(counts), (trial, counts)


def test_draw_realizes_quota(spark, sf_dir):
    """mix_unimax_draw: n_sampled == quota whenever quota <=
    n_available, realized shares recompose from the counts, and the
    digest proves a non-empty deterministic draw."""
    import hashlib

    from composable_logs_spark.queries.unimax_q import mix_unimax_draw

    rows = mix_unimax_draw(spark, sf_dir).collect()
    assert rows
    s_total = sum(r["n_sampled"] for r in rows)
    empty_digest = hashlib.md5(b"").hexdigest()
    for r in rows:
        assert r["n_sampled"] == min(r["quota"], r["n_available"])
        if r["quota"] <= r["n_available"]:
            assert r["n_sampled"] == r["quota"]
        assert r["realized_share_milli"] == (1000 * r["n_sampled"]) // s_total
        if r["n_sampled"] > 0:
            assert r["sampled_digest"] != empty_digest
        else:
            assert r["sampled_digest"] == empty_digest


def test_draw_oracle_epoch_overflow_and_zero_quota():
    """The draw SQL on corpora the testdata can't produce: (a) a capped
    tiny language whose quota exceeds n_available (epoch cap 2) draws
    every doc exactly once per pass (n_sampled == n_available); (b) the
    degenerate budget < K corpus allocates zero everywhere — every
    language still present with n_sampled = 0, share 0, empty digest."""
    import hashlib

    import duckdb

    from composable_logs_spark.queries.unimax_q import UNIMAX_DRAW_SQL

    def run(counts):
        con = duckdb.connect()
        con.execute("CREATE TABLE lang_counts(lang VARCHAR, n BIGINT);")
        con.executemany(
            "INSERT INTO lang_counts VALUES (?, ?)", list(counts.items())
        )
        con.execute(
            "CREATE VIEW documents AS "
            "SELECT lang || '-' || unnest(range(0, n)) AS doc_id, lang "
            "FROM lang_counts"
        )
        return {r[0]: r for r in con.execute(UNIMAX_DRAW_SQL).fetchall()}

    # (a) skew: lang a caps at quota 2 > n_available 1
    got = run({"a": 1, "b": 1000})
    assert got["a"][2] == 2 and got["a"][3] == 1  # quota 2, drew the 1 doc
    assert got["b"][3] == got["b"][2] <= 1000     # uncapped: drew to quota
    # (b) 10 single-doc languages: budget 6 < K 10 -> level floors to 0
    got = run({f"l{j}": 1 for j in range(10)})
    empty_digest = hashlib.md5(b"").hexdigest()
    assert len(got) == 10
    for lang, r in got.items():
        assert r[2] == 0 and r[3] == 0 and r[4] == 0, (lang, r)
        assert r[5] == empty_digest


def test_invariants_on_collected_output(spark, sf_dir):
    rows = mix_unimax_sample(spark, sf_dir).collect()
    # uncapped languages all sit at the same water level; capped ones
    # are below it and fully taken
    uncapped = [r for r in rows if r["quota"] < r["cap"]]
    capped = [r for r in rows if r["quota"] == r["cap"]]
    assert len(uncapped) + len(capped) == len(rows)
    if uncapped:
        levels = {r["quota"] for r in uncapped}
        assert len(levels) == 1
        level = levels.pop()
        assert all(r["cap"] <= level for r in capped)
    # epoch bound holds everywhere
    assert all(r["epochs_milli"] <= 1000 * _E for r in rows)
