"""Poisson-bootstrap confidence intervals (Chamandy et al. 2012, "The
Poisson bootstrap" / Kleiner et al.'s big-data resampling line): the
ONLY bootstrap that distributes — classical resampling draws n rows
WITH replacement per replica, which requires global coordination, while
the Poisson bootstrap gives every row an independent Poisson(1) weight
per replica, so the whole procedure is one scan + one shuffled
aggregation of (key, replica) partials with map-side combine. The
output is what a pipeline actually wants from a metric: the per-group
mean WITH a 95% interval instead of a bare point estimate.

Determinism across engines — no RNG anywhere:

- each (event_id, replica) pair hashes to an integer in [0, 1e6) via
  the repo's md5-prefix convention, and the Poisson(1) weight is read
  off HARD-CODED integer CDF thresholds (floor(1e6 * CDF(k)), k = 0..8,
  tail capped at 9 — the cap bends nothing: P(K >= 9) < 1.2e-6 and both
  engines apply it identically);
- replica sums are integer cents, so neither sum order nor partial
  aggregation can perturb them; each replica mean is ONE double
  division;
- the 95% interval is EXACT order statistics over the B = 200 replica
  means (5th and 196th smallest — floor(0.025*B) below / above), not an
  interpolated percentile, so both engines pick the same two elements.

100 TB shape: the explode-by-B is CPU (B passes over the scan — the
honest cost of bootstrapping; B is a knob), NOT memory or shuffle: the
shuffle carries |groups| x B partial rows after map-side combine, and
the order-statistic window runs over B rows per group. Nothing is
ever collected or broadcast that grows with the corpus.

Reference anchor: none (north-star scope, SURVEY.md §2.10).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from . import QuerySpec, load

_B = 200  # bootstrap replicas
# floor(1e6 * CDF_Poisson(1)(k)) for k = 0..8; tail -> weight 9
_THRESH = (367879, 735758, 919698, 981011, 996340, 999405, 999916, 999989, 999998)
_LO_IDX = _B // 40  # floor(0.025 * B) = 5 -> 5th smallest is the bound
_HI_IDX = _B - _B // 40 + 1  # 196th smallest


def _weight_case(hv: str) -> str:
    """Shared CASE expression mapping a [0, 1e6) hash to a Poisson(1)
    weight — identical text on both engines."""
    arms = " ".join(
        f"WHEN {hv} < {t} THEN {k}" for k, t in enumerate(_THRESH)
    )
    return f"CASE {arms} ELSE 9 END"


def bootstrap_ci_mean(events: DataFrame, b: int = _B) -> DataFrame:
    """Per-event-type mean of ``value`` with a 95% Poisson-bootstrap CI
    over a (event_id, event_type, value) frame — the reusable core."""
    lo_idx = b // 40
    hi_idx = b - b // 40 + 1
    base = events.select(
        "event_id",
        "event_type",
        F.expr("CAST(floor(value * 100) AS BIGINT)").alias("cents"),
    )
    # point estimate: integer sums, one division
    point = base.groupBy("event_type").agg(
        F.sum("cents").alias("tot"), F.count("*").alias("n")
    )

    # r13 (guide §4.2): the B-way replica expansion previously ran as
    # explode(sequence) x (md5 + conv-base-conversion + two CASE
    # ladders) per (event, replica) — B x N rows of interpreted string
    # hashing through the JVM. One Arrow pass now computes, per input
    # batch, the per-(event_type, replica) INTEGER partials directly:
    # hashlib.md5 over the identical "{event_id}:{bi}" bytes, the first
    # 15 hex digits as an integer (digest[:8] big-endian >> 4 — the
    # same 60 bits conv() parsed), % 1e6, and the Poisson weight via
    # searchsorted over the same thresholds (w = #thresholds <= hv,
    # exactly the CASE ladder). All partial sums are exact integers
    # (bincount doubles stay < 2^53), so the global integer sums —
    # and every downstream float op — are bit-identical to the old
    # expression path. The map-side combine the groupBy used to do
    # happens inside the same pass, so only |types| x B rows per batch
    # cross the Python boundary.
    thresh = _THRESH
    out_schema = "event_type string, bi int, wsum long, wn long"

    def _partials(batches):
        import hashlib

        import numpy as np
        import pyarrow as pa

        md5 = hashlib.md5
        suffixes = [f":{bi}".encode() for bi in range(b)]
        tarr = np.asarray(thresh, dtype=np.int64)
        bi_base = np.arange(b, dtype=np.int64)
        for batch in batches:
            n_rows = batch.num_rows
            if n_rows == 0:
                continue
            eids = batch.column(0).to_pylist()
            etypes = batch.column(1).to_pylist()
            cents = batch.column(2).to_numpy(zero_copy_only=False).astype(np.int64)
            codes: dict = {}
            tcode = np.empty(n_rows, dtype=np.int64)
            for i, t in enumerate(etypes):
                c = codes.get(t)
                if c is None:
                    c = codes[t] = len(codes)
                tcode[i] = c

            def gen():
                for e in eids:
                    pre = str(e).encode()
                    for s in suffixes:
                        yield int.from_bytes(md5(pre + s).digest()[:8], "big") >> 4

            hv = np.fromiter(gen(), dtype=np.int64, count=n_rows * b) % 1000000
            w = np.searchsorted(tarr, hv, side="right")
            key = np.repeat(tcode, b) * b + np.tile(bi_base, n_rows)
            nkeys = len(codes) * b
            wsum = np.bincount(key, weights=w * np.repeat(cents, b), minlength=nkeys)
            wn = np.bincount(key, weights=w, minlength=nkeys)
            types_out = np.empty(nkeys, dtype=object)
            for t, c in codes.items():
                types_out[c * b : (c + 1) * b] = t
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(list(types_out), type=pa.string()),
                    pa.array(np.tile(bi_base, len(codes)).astype(np.int32)),
                    pa.array(wsum.astype(np.int64)),
                    pa.array(wn.astype(np.int64)),
                ],
                names=["event_type", "bi", "wsum", "wn"],
            )

    means = (
        # round-robin width: the replica expansion multiplies per-row
        # work x B, so stage width must be set by post-expansion cost,
        # not scan bytes (guide §2.6; a compact parquet input arrives
        # as 1-2 splits). Parameterised by the session's parallelism.
        base.repartition(events.sparkSession.sparkContext.defaultParallelism)
        .mapInArrow(_partials, out_schema)
        .groupBy("event_type", "bi")
        .agg(F.sum("wsum").alias("wsum"), F.sum("wn").alias("wn"))
        .where(F.col("wn") > 0)
        .withColumn(
            "mean_b", F.col("wsum").cast("double") / F.col("wn").cast("double")
        )
    )
    ranked = means.withColumn(
        "rk",
        F.row_number().over(
            W.partitionBy("event_type").orderBy(F.col("mean_b"), F.col("bi"))
        ),
    )
    ci = (
        ranked.where(F.col("rk").isin(lo_idx, hi_idx))
        .groupBy("event_type")
        .agg(
            F.min(F.when(F.col("rk") == lo_idx, F.col("mean_b"))).alias("lo"),
            F.min(F.when(F.col("rk") == hi_idx, F.col("mean_b"))).alias("hi"),
        )
    )
    return (
        point.join(ci, "event_type")
        .select(
            "event_type",
            "n",
            F.round(F.col("tot").cast("double") / F.col("n").cast("double") / 100.0, 4).alias(
                "mean_r"
            ),
            F.round(F.col("lo") / 100.0, 4).alias("ci_lo_r"),
            F.round(F.col("hi") / 100.0, 4).alias("ci_hi_r"),
            F.round((F.col("hi") - F.col("lo")) / 100.0, 4).alias("ci_width_r"),
        )
        .orderBy("event_type")
    )


def events_bootstrap_ci(spark: SparkSession, sf: str) -> DataFrame:
    return bootstrap_ci_mean(load(spark, sf, "events"))


_W_SQL = _weight_case("hv")

BOOTSTRAP_SQL = f"""
WITH base AS (
  SELECT event_id, event_type,
         CAST(floor(value * 100) AS BIGINT) AS cents
  FROM events
),
point AS (
  SELECT event_type, CAST(sum(cents) AS BIGINT) AS tot,
         CAST(count(*) AS BIGINT) AS n
  FROM base GROUP BY event_type
),
rep AS (
  SELECT event_type, cents, bi,
         CAST('0x' || substring(md5(CAST(event_id AS VARCHAR) || ':'
              || CAST(bi AS VARCHAR)), 1, 15) AS BIGINT) % 1000000 AS hv
  FROM base CROSS JOIN (SELECT unnest(generate_series(0, {_B - 1})) AS bi)
),
means AS (
  SELECT event_type, bi,
         CAST(sum(({_W_SQL}) * cents) AS DOUBLE)
           / CAST(sum({_W_SQL}) AS DOUBLE) AS mean_b
  FROM rep
  GROUP BY event_type, bi
  HAVING sum({_W_SQL}) > 0
),
ranked AS (
  SELECT event_type, bi, mean_b,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY mean_b, bi) AS rk
  FROM means
),
ci AS (
  SELECT event_type,
         min(CASE WHEN rk = {_LO_IDX} THEN mean_b END) AS lo,
         min(CASE WHEN rk = {_HI_IDX} THEN mean_b END) AS hi
  FROM ranked WHERE rk IN ({_LO_IDX}, {_HI_IDX})
  GROUP BY event_type
)
SELECT p.event_type, p.n,
       round(CAST(p.tot AS DOUBLE) / CAST(p.n AS DOUBLE) / 100.0, 4) AS mean_r,
       round(c.lo / 100.0, 4) AS ci_lo_r,
       round(c.hi / 100.0, 4) AS ci_hi_r,
       round((c.hi - c.lo) / 100.0, 4) AS ci_width_r
FROM point p JOIN ci c ON c.event_type = p.event_type
ORDER BY p.event_type
"""


QUERIES = {
    "events_bootstrap_ci": QuerySpec(events_bootstrap_ci, BOOTSTRAP_SQL),
}
