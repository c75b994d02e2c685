"""Bloom-filter join pruning — a DIY runtime filter (SCALE.md; guide
§Joins).

Spark's own `InjectRuntimeFilter` only fires for favourable shapes and
isn't steerable from the API; this operator makes the pattern explicit:
build a compact bitmap of the build side's join keys, semi-join-prune
the probe side against it BEFORE the expensive shuffle, then run the
real join on the survivors.  At 100 TB the win is shuffle volume: a
probe table whose keys are 1% selective ships ~1% of its rows (plus the
false-positive margin ε) instead of all of them.

Representation: the filter is a DATAFRAME of (word_idx, bits) longs —
never a driver-side object — so build, broadcast, and probe all stay on
executors:

- build: explode each key into k bit positions (xxhash64 with k seeds),
  map to (word_idx, single-bit mask), hash-aggregate with bit_or — the
  shuffle carries at most ``n_bits/64`` rows regardless of build size.
- probe: explode probe keys into their k (word_idx, mask) pairs,
  equi-join the (broadcast) filter table, keep keys whose k probes ALL
  land on set bits.  One narrow broadcast join, no shuffle of the big
  side.

Membership is one-sided exact: true keys always survive (bit_or is a
monotone union; no deletions), false positives pass at rate
≈ (1 - e^{-kn/m})^k — callers either tolerate ε extra rows (pure
pre-filter before an exact join, which re-checks equality anyway) or
follow with the exact semi-join on the reduced input.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _positions(key: Column, n_bits: int, k: int) -> Column:
    """Array of k bit positions for one key (k independent xxhash64
    seeds; pmod keeps them in [0, n_bits))."""
    return F.array(
        *[F.pmod(F.xxhash64(key, F.lit(i)), F.lit(n_bits)) for i in range(k)]
    )


def bloom_build(df: DataFrame, key: str, n_bits: int = 1 << 20, k: int = 5) -> DataFrame:
    """Aggregate ``df[key]`` into a bloom bitmap as (word_idx, bits)
    rows. Output has at most ``n_bits/64`` rows — broadcastable for any
    realistic ``n_bits``."""
    pos = F.explode(_positions(F.col(key), n_bits, k)).alias("pos")
    return (
        df.select(pos)
        .select(
            (F.col("pos") / 64).cast("long").alias("word_idx"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").alias(
                "mask"
            ),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("mask").alias("bits"))
    )


def bloom_prefilter(
    df: DataFrame, key: str, bloom: DataFrame, n_bits: int = 1 << 20, k: int = 5
) -> DataFrame:
    """Keep rows of ``df`` whose ``key`` MAY be in the filter (all k bits
    set); drop rows that definitely are not.  ``n_bits``/``k`` must match
    the build call.

    Plan shape: k BroadcastHashJoins against the (tiny) filter table —
    the probe side stays narrow, nothing about ``df`` is shuffled or
    exploded.  A key's k positions can land in k different words, so
    each position is its own lookup.
    """
    import uuid

    # unique per-call prefix: a caller column literally named _p0/_w0/...
    # must not be silently shadowed
    t = f"_bloom_{uuid.uuid4().hex[:8]}"
    out = df
    checks = []
    for i in range(k):
        pos = F.pmod(F.xxhash64(F.col(key), F.lit(i)), F.lit(n_bits))
        out = (
            out.withColumn(f"{t}_p{i}", pos)
            .withColumn(f"{t}_w{i}", (F.col(f"{t}_p{i}") / 64).cast("long"))
            .withColumn(
                f"{t}_m{i}",
                F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST({t}_p{i} % 64 AS INT))"),
            )
            .join(
                F.broadcast(
                    bloom.select(
                        F.col("word_idx").alias(f"{t}_bw{i}"),
                        F.col("bits").alias(f"{t}_bb{i}"),
                    )
                ),
                F.col(f"{t}_w{i}") == F.col(f"{t}_bw{i}"),
                "left",
            )
        )
        checks.append(
            F.col(f"{t}_bb{i}").isNotNull()
            & (F.col(f"{t}_bb{i}").bitwiseAND(F.col(f"{t}_m{i}")) == F.col(f"{t}_m{i}"))
        )
    cond = checks[0]
    for c in checks[1:]:
        cond = cond & c
    return out.where(cond).select(*df.columns)
