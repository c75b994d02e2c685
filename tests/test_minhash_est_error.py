"""dedup_minhash_est_error: the sketch-calibration table must equal an
independent pure-Python recomputation (third engine next to Spark and
the DuckDB oracle) — same shingles, same universal hashes, same banding,
and the exact integer micro-unit arithmetic the two SQL engines use, so
the decile table matches key-for-key and digit-for-digit."""

import hashlib
import re
from collections import defaultdict
from decimal import ROUND_HALF_UP, Decimal

from composable_logs_spark.queries.dedup_q import (
    _A,
    _B,
    _BANDS,
    _K,
    _M,
    _ROWS,
    _near_dup_corpus,
    dedup_minhash_est_error,
)


def _shingle_hashes(text: str) -> list[int]:
    toks = re.split(r"\s+", text.strip())
    n = max(len(toks) - 2, 1)
    shingles = []
    for i in range(n):
        a = toks[i]
        b = toks[i + 1] if i + 1 < len(toks) else ""
        c = toks[i + 2] if i + 2 < len(toks) else ""
        shingles.append(f"{a} {b} {c}")
    out, seen = [], set()
    for sh in shingles:
        if sh in seen:
            continue
        seen.add(sh)
        h = int(hashlib.md5(sh.encode()).hexdigest()[:15], 16) % _M
        if h not in out:
            out.append(h)
    return out


def test_est_error_matches_pure_python(spark, sf_dir):
    corpus = {
        r["doc_id"]: r["text"]
        for r in _near_dup_corpus(spark, sf_dir).collect()
    }

    hs = {d: _shingle_hashes(t) for d, t in corpus.items()}
    mh = {
        d: [min((h * _A[s] + _B[s]) % _M for h in hsd) for s in range(_K)]
        for d, hsd in hs.items()
    }
    buckets = defaultdict(set)
    for d, sig in mh.items():
        for b in range(_BANDS):
            key = hashlib.md5(
                "|".join(str(sig[b * _ROWS + r]) for r in range(_ROWS)).encode()
            ).hexdigest()
            buckets[(b, key)].add(d)
    cand = set()
    for members in buckets.values():
        ms = sorted(members)
        for i, a in enumerate(ms):
            for b in ms[i + 1:]:
                cand.add((a, b))
    assert cand, "planted variants must produce candidates"

    per_decile = defaultdict(lambda: [0, 0, 0, 0, 0])  # n, sum_match, sum_micro, sum_err, max_err
    for a, b in cand:
        n_match = sum(1 for s in range(_K) if mh[a][s] == mh[b][s])
        sa, sb = set(hs[a]), set(hs[b])
        inter, union = len(sa & sb), len(sa | sb)
        micro = (inter * 20000 + union) // (2 * union)
        err = abs(n_match * 10000 - micro * _K)
        dec = min(micro // 1000, 9)
        row = per_decile[dec]
        row[0] += 1
        row[1] += n_match
        row[2] += micro
        row[3] += err
        row[4] = max(row[4], err)

    def r4(x: float) -> float:
        # Spark's round() is HALF_UP over the double's shortest decimal
        # repr (BigDecimal.valueOf); Python's round() is banker's — match
        # Spark, not Python
        return float(
            Decimal(repr(x)).quantize(Decimal("0.0001"), ROUND_HALF_UP)
        )

    denom = _K * 10000
    expect = {
        dec: (
            n,
            r4(sm / (n * float(_K))),
            r4(sx / (n * 10000.0)),
            r4(se / (n * float(denom))),
            r4(mx / float(denom)),
        )
        for dec, (n, sm, sx, se, mx) in per_decile.items()
    }

    got = {
        r["jaccard_decile"]: (
            r["n_pairs"],
            r["mean_est"],
            r["mean_exact"],
            r["mean_abs_err"],
            r["max_abs_err"],
        )
        for r in dedup_minhash_est_error(spark, sf_dir).collect()
    }
    assert got == expect
