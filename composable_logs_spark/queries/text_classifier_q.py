"""Learned quality classifier (fastText shape, Joulin et al. 2016
"Bag of Tricks for Efficient Text Classification") — the discriminative
scorer the quality family lacked: rules (``text_ops.c4_stats``,
``gopher_stats``) and generative LMs (``text_bigram_logprob``) measure
the text against fixed heuristics or its own corpus statistics; a
CLASSIFIER is trained against LABELS and scores "does this look like
the good class".

The reference has no text surface (artifact payloads only,
opentelemetry_task_span_parser.py:119-144) — north-star scope.

Model, exactly the fastText architecture reduced to its linear core:

- features: hashed word unigrams + bigrams (wordNgrams=2), the hashing
  trick with B = 4096 buckets (md5-based bucket hash shared verbatim
  with ``dsir_q``) — model size is B, independent of vocab;
- pooling: MEAN over the example's feature weights (fastText's mean of
  embeddings, with the embedding dimension collapsed to the single
  output logit);
- weights: closed-form naive-Bayes log-odds per bucket,
      w[b] = ln((c_pos+1)/(N_pos+B)) - ln((c_neg+1)/(N_neg+B)),
  the NBSVM-lite baseline (Wang & Manning 2012) — training is two
  hash aggregations, fully distributed and exactly replicable in SQL.
  A gradient-trained logistic layer swaps in through the same
  (bucket -> weight) table without touching any Spark plumbing.

Labels are PLANTED (the corpus ships none): every document is a
positive "prose" example, and a deterministic boilerplate example
(chrome-vocabulary tokens cycled with a doc_id-dependent rotation) is
its negative — the classic web-chrome-vs-content training pair. The
query scores BOTH classes so the gate proves the full train+score
composition end-to-end: boilerplate must land below prose
(property-tested in tests/test_text_classifier.py).

Cross-engine exactness: bucket log-odds rounded ONCE to integer
micro-nats (the ``dsir_q``/``text_ops`` discipline); per-example sums
are exact integer adds; the mean is rounded to 4dp at the end.

100 TB design: the weight table is <= B rows BY CONSTRUCTION (hashing
trick), so broadcasting it is safe at any corpus size — unlike a
vocab-sized table (the BM25 idf boundary); training is two map-side-
combinable hash aggs over the feature stream; scoring is one broadcast
join + integer sum. No stage scales with anything but corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import QuerySpec, load

_B = 4096  # hashed feature buckets (fastText -bucket)

# web-chrome vocabulary for the planted negatives
_BOILER = [
    "click", "here", "subscribe", "now", "accept", "cookies",
    "privacy", "policy", "terms", "login", "register", "menu",
    "home", "share", "follow", "advertisement",
]
_NEG_LEN = 30  # tokens per planted boilerplate example


def _boiler_text(doc_id_col):
    """Deterministic boilerplate: _NEG_LEN tokens cycling the chrome
    vocabulary, rotated by doc_id so examples differ but stay in-class."""
    arr = F.array(*[F.lit(t) for t in _BOILER])
    return F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(0), F.lit(_NEG_LEN - 1)),
            lambda i: F.element_at(arr, ((i + doc_id_col) % len(_BOILER) + 1).cast("int")),
        ),
    )


def labeled_examples(d: DataFrame) -> DataFrame:
    """(ex_id, is_prose, text): each doc as a positive plus its planted
    boilerplate negative (ex_id = 2*doc_id / 2*doc_id+1)."""
    pos = d.select(
        (F.col("doc_id") * 2).alias("ex_id"),
        F.lit(True).alias("is_prose"),
        "text",
    )
    neg = d.select(
        (F.col("doc_id") * 2 + 1).alias("ex_id"),
        F.lit(False).alias("is_prose"),
        _boiler_text(F.col("doc_id")).alias("text"),
    )
    return pos.unionByName(neg)


def _features(examples: DataFrame) -> DataFrame:
    """(ex_id, is_prose, bucket): one row per unigram AND bigram
    occurrence, hashed into _B buckets (dsir_q hash convention)."""
    toks = examples.select(
        "ex_id", "is_prose", F.split(F.trim(F.lower("text")), r"\s+").alias("arr")
    )
    feats = toks.select(
        "ex_id",
        "is_prose",
        F.explode(
            F.expr(
                "concat(arr, transform(sequence(1, size(arr) - 1),"
                " i -> concat(element_at(arr, i), ' ',"
                " element_at(arr, i + 1))))"
            )
        ).alias("feat"),
    )
    return feats.select(
        "ex_id",
        "is_prose",
        (F.conv(F.substring(F.md5("feat"), 1, 15), 16, 10).cast("long") % _B).alias(
            "bucket"
        ),
    )


def nb_logodds_weights(feats: DataFrame) -> DataFrame:
    """(bucket, w_micro): closed-form naive-Bayes log-odds in integer
    micro-nats — <= _B rows by construction.

    r13 (guide §2.4): ONE conditional-sum histogram pass instead of
    four feature-stream scans (per-class bucket counts + per-class
    totals) — the bucket set (either class present) and every count are
    identical to the old full-join formulation, and the class totals
    are exact sums of the bucket histogram, so w_micro is bit-identical.
    """
    counts = (
        feats.groupBy("bucket")
        .agg(
            F.sum(F.when(F.col("is_prose"), 1).otherwise(0)).alias("c_pos"),
            F.sum(F.when(F.col("is_prose"), 0).otherwise(1)).alias("c_neg"),
        )
        # <= _B rows; pinned so the totals agg below doesn't re-scan
        .localCheckpoint(eager=True)
    )
    totals = counts.agg(
        F.sum("c_pos").alias("n_pos"), F.sum("c_neg").alias("n_neg")
    )
    return (
        counts.crossJoin(F.broadcast(totals))
        .select(
            "bucket",
            F.round(
                (
                    F.log((F.col("c_pos") + 1) / (F.col("n_pos") + F.lit(_B)))
                    - F.log((F.col("c_neg") + 1) / (F.col("n_neg") + F.lit(_B)))
                )
                * 1e6
            )
            .cast("long")
            .alias("w_micro"),
        )
    )


def scored_examples(spark: SparkSession, sf: str) -> DataFrame:
    """(ex_id, is_prose, n_feats, logit_micro): the trained classifier
    applied back to its training examples — exact integer logits, the
    frame both the gated query and the AUC evaluation rank."""
    # r13 (guide §3.3/§5): materialize the hashed feature stream — it
    # is consumed by the weight histogram AND the scoring join, and
    # every reference otherwise re-ran the unigram+bigram explode with
    # an md5+conv per feature occurrence. Computed per invocation.
    feats = _features(
        labeled_examples(load(spark, sf, "documents"))
    ).localCheckpoint(eager=True)
    # the weight table is bounded at _B rows REGARDLESS of corpus size
    # (hashing trick) — broadcast is safe where a vocab join would not be
    w = nb_logodds_weights(feats)
    return (
        feats.join(F.broadcast(w), "bucket")
        .groupBy("ex_id", "is_prose")
        .agg(
            F.count("*").cast("int").alias("n_feats"),
            F.sum("w_micro").alias("logit_micro"),
        )
    )


def text_quality_classifier(spark: SparkSession, sf: str) -> DataFrame:
    return (
        scored_examples(spark, sf)
        .select(
            "ex_id",
            "is_prose",
            "n_feats",
            # fastText mean pooling: average weight per feature
            F.round(F.col("logit_micro") / (F.col("n_feats") * 1e6), 4).alias("score"),
            (F.col("logit_micro") > 0).alias("pred_prose"),
        )
        .orderBy("ex_id")
    )


# shared CTE chain: everything through the per-example exact-integer
# logit — CLASSIFIER_SQL's final select and the AUC oracle both build
# on `scored`
_SCORED_CTES = f"""boiler AS (
  SELECT {" UNION ALL SELECT ".join(f"{i} AS i, '{t}' AS tok" for i, t in enumerate(_BOILER))}
),
examples AS (
  SELECT doc_id * 2 AS ex_id, TRUE AS is_prose, text FROM documents
  UNION ALL
  SELECT doc_id * 2 + 1, FALSE,
         (SELECT string_agg(b.tok, ' ' ORDER BY u.i)
          FROM range(0, {_NEG_LEN}) u(i)
          JOIN boiler b ON b.i = (u.i + d.doc_id) % {len(_BOILER)})
  FROM documents d
),
arrs AS (
  SELECT ex_id, is_prose,
         string_split_regex(trim(lower(text)), '\\s+') AS arr
  FROM examples
),
feats AS (
  SELECT ex_id, is_prose,
         CAST('0x' || substring(md5(f), 1, 15) AS BIGINT) % {_B} AS bucket
  FROM (
    SELECT ex_id, is_prose, unnest(arr) AS f FROM arrs
    UNION ALL
    SELECT ex_id, is_prose, arr[x] || ' ' || arr[x + 1]
    FROM arrs, UNNEST(generate_series(1, len(arr) - 1)) AS u(x)
    WHERE len(arr) >= 2
  )
),
np AS (SELECT count(*) AS n_pos FROM feats WHERE is_prose),
nn AS (SELECT count(*) AS n_neg FROM feats WHERE NOT is_prose),
w AS (
  SELECT bucket,
         CAST(round((ln((sum(CASE WHEN is_prose THEN 1 ELSE 0 END) + 1)
                        / CAST((SELECT n_pos FROM np) + {_B} AS DOUBLE))
                     - ln((sum(CASE WHEN is_prose THEN 0 ELSE 1 END) + 1)
                        / CAST((SELECT n_neg FROM nn) + {_B} AS DOUBLE)))
                    * 1000000, 0) AS BIGINT) AS w_micro
  FROM feats GROUP BY bucket
),
scored AS (
  SELECT f.ex_id, f.is_prose,
         CAST(count(*) AS INT) AS n_feats,
         CAST(sum(w.w_micro) AS BIGINT) AS logit_micro
  FROM feats f JOIN w USING (bucket)
  GROUP BY f.ex_id, f.is_prose
)"""

CLASSIFIER_SQL = f"""
WITH {_SCORED_CTES}
SELECT ex_id,
       is_prose,
       n_feats,
       round(logit_micro / (n_feats * 1000000.0), 4) AS score,
       logit_micro > 0 AS pred_prose
FROM scored
ORDER BY ex_id
"""


QUERIES = {
    "text_quality_classifier": QuerySpec(text_quality_classifier, CLASSIFIER_SQL),
}
