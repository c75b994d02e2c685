"""Distributed BPE tokenizer training (Sennrich et al. 2016, word-level
byte-pair encoding) — the tokenizer-fitting step of an LLM data
pipeline, expressed so the iterative merge loop is fully hash-checkable
against an independent SQL formulation.

Shape and scale design:

- The ONLY corpus-sized pass is the first one: whitespace words ->
  (word, count) hash agg with map-side combine. Everything after runs
  on the *vocabulary* table (distinct words), which is orders of
  magnitude smaller than the corpus — exactly how reference BPE
  trainers work (they fit on a word-frequency dict, not the raw text).
- Each merge round is: adjacent-symbol pair counts (one small hash agg
  over the vocab), a 1-row argmax collect (the same driver-side
  convergence pattern as ``operators/components.py``), and a narrow
  map applying the merge. No shuffle grows with corpus size.
- Merge application is a literal string replace over the
  space-delimited symbol string (" d a t a " -> " d at a "): both
  Spark's `replace` and DuckDB's `replace` scan left-to-right,
  non-overlapping, continuing after each replacement — the same
  convention fast BPE implementations use — so the two engines apply
  merges identically and the oracle is REAL SQL (the merge loop is
  unrolled into K CTE stages), not a pinned golden: it holds at every
  scale factor.
- Tie-break is total order (pair count desc, left, right) on binary
  string collation — identical in both engines, so the merge sequence
  is deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import QuerySpec, load

_N_MERGES = 8

_PAIRS_EXPR = (
    "transform(sequence(1, size(arr) - 1),"
    " i -> struct(element_at(arr, i) AS l, element_at(arr, i + 1) AS r))"
)


def _vocab(spark: SparkSession, sf: str) -> DataFrame:
    """(word, sym, cnt): space-delimited symbol string per distinct word."""
    words = (
        load(spark, sf, "documents")
        .select(F.explode(F.split("text", " ")).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )
    # " d a t a " — sentinel spaces make every symbol occurrence
    # match the space-bounded replace pattern exactly once
    return words.select(
        "word",
        F.concat(
            F.lit(" "),
            F.array_join(F.split("word", ""), " "),
            F.lit(" "),
        ).alias("sym"),
        "cnt",
    )


def _train(spark: SparkSession, sf: str):
    """Run the merge loop; return (merge list, final tokenised vocab)."""
    vocab = _vocab(spark, sf).cache()
    merges = []
    for rank in range(1, _N_MERGES + 1):
        pairs = (
            vocab.select(
                F.split(F.trim("sym"), " ").alias("arr"), "cnt"
            )
            .where(F.size("arr") >= 2)
            .select(F.explode(F.expr(_PAIRS_EXPR)).alias("p"), "cnt")
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("cnt").alias("total"))
        )
        best = pairs.orderBy(F.col("total").desc(), "l", "r").limit(1).collect()
        if not best:
            break
        l, r, total = best[0]["l"], best[0]["r"], best[0]["total"]
        merges.append((rank, l, r, l + r, int(total)))
        # eager localCheckpoint: K chained cached layers make Catalyst
        # re-plan a growing tree every round (see basket_q BFS note);
        # checkpointing keeps each round's plan flat
        vocab = vocab.withColumn(
            "sym",
            F.replace(
                F.col("sym"),
                F.lit(f" {l} {r} "),
                F.lit(f" {l}{r} "),
            ),
        ).localCheckpoint(eager=True)
    return merges, vocab


def bpe_train_merges(spark: SparkSession, sf: str) -> DataFrame:
    merges, _ = _train(spark, sf)
    schema = T.StructType(
        [
            T.StructField("merge_rank", T.IntegerType()),
            T.StructField("left_sym", T.StringType()),
            T.StructField("right_sym", T.StringType()),
            T.StructField("merged", T.StringType()),
            T.StructField("pair_count", T.LongType()),
        ]
    )
    return spark.createDataFrame(merges, schema)


def bpe_encode_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Apply the learned merges back to the corpus: per-source token
    statistics (the tokenizer-fertility numbers a data team watches).
    The tokenised vocabulary is joined back broadcast — the corpus pass
    stays a single scan + one hash agg; no per-document Python."""
    _, vocab = _train(spark, sf)
    tok = vocab.select(
        "word", F.size(F.split(F.trim("sym"), " ")).alias("n_tokens")
    )
    words = (
        load(spark, sf, "documents")
        .select("source", F.explode(F.split("text", " ")).alias("word"))
        .where(F.col("word") != "")
    )
    return (
        words.join(F.broadcast(tok), "word")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_words"),
            F.sum("n_tokens").alias("n_tokens"),
            F.round(F.sum("n_tokens") / F.count("*"), 4).alias(
                "tokens_per_word"
            ),
            F.round(
                F.sum(F.length("word")) / F.sum("n_tokens"), 4
            ).alias("chars_per_token"),
        )
        .orderBy("source")
    )


def _bpe_ctes(k: int) -> list[str]:
    """The shared CTE chain: v0 (char-split vocab) through vK."""
    ctes = [
        """v0 AS (
  SELECT word,
         ' ' || array_to_string(string_split(word, ''), ' ') || ' ' AS sym,
         CAST(count(*) AS BIGINT) AS cnt
  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
  WHERE word <> '' GROUP BY word
)"""
    ]
    for i in range(1, k + 1):
        ctes.append(
            f"""p{i} AS (
  SELECT lst[x] AS l, lst[x + 1] AS r, CAST(sum(cnt) AS BIGINT) AS total
  FROM (SELECT string_split(trim(sym), ' ') AS lst, cnt FROM v{i - 1}),
       UNNEST(generate_series(1, len(lst) - 1)) AS t(x)
  GROUP BY 1, 2
)"""
        )
        ctes.append(
            f"b{i} AS (SELECT l, r, total FROM p{i} "
            f"ORDER BY total DESC, l, r LIMIT 1)"
        )
        ctes.append(
            f"""v{i} AS (
  SELECT word, replace(sym, ' ' || b.l || ' ' || b.r || ' ',
                            ' ' || b.l || b.r || ' ') AS sym, cnt
  FROM v{i - 1} CROSS JOIN b{i} b
)"""
        )
    return ctes


def _bpe_sql(k: int = _N_MERGES) -> str:
    """Unroll the merge loop into k CTE stages of pure SQL."""
    selects = " UNION ALL ".join(
        f"SELECT CAST({i} AS INTEGER) AS merge_rank, l AS left_sym,"
        f" r AS right_sym, l || r AS merged, total AS pair_count FROM b{i}"
        for i in range(1, k + 1)
    )
    return "WITH " + ",\n".join(_bpe_ctes(k)) + "\n" + selects


def _encode_sql(k: int = _N_MERGES) -> str:
    ctes = _bpe_ctes(k)
    ctes.append(
        f"tok AS (SELECT word, len(string_split(trim(sym), ' ')) AS n_tokens"
        f" FROM v{k})"
    )
    ctes.append(
        "wordsrc AS (SELECT source, unnest(string_split(text, ' ')) AS word"
        " FROM documents)"
    )
    return (
        "WITH " + ",\n".join(ctes) + """
SELECT source,
       CAST(count(*) AS BIGINT) AS n_words,
       CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
       round(sum(n_tokens) / CAST(count(*) AS DOUBLE), 4) AS tokens_per_word,
       round(sum(length(word)) / CAST(sum(n_tokens) AS DOUBLE), 4)
         AS chars_per_token
FROM wordsrc JOIN tok USING (word)
GROUP BY source ORDER BY source
"""
    )


QUERIES = {
    "bpe_train_merges": QuerySpec(bpe_train_merges, _bpe_sql()),
    "bpe_encode_stats": QuerySpec(bpe_encode_stats, _encode_sql()),
}
