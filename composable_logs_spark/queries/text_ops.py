"""Text-analysis operators over the documents table (north-star L5 ops:
token counting, quality scoring, language-ID heuristic, fingerprinting).

All pure built-in expressions (split/filter/aggregate/md5) — no Python
UDFs — so they run JVM-side at 100 TB. Each has an exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import QuerySpec, load

_STOPWORDS = ["the", "a", "and", "of", "to", "in", "is", "on"]


def _tokens(col):
    return F.split(F.trim(col), r"\s+")


# ---------------------------------------------------------------------------
# Token counting (whitespace tokenization + distinct counts + avg length).
def text_token_stats(spark: SparkSession, sf: str) -> DataFrame:
    d = load(spark, sf, "documents")
    toks = _tokens(F.col("text"))
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_unique_tokens"),
        F.length("text").alias("text_len"),
        F.round(
            F.aggregate(
                F.transform(toks, lambda t: F.length(t).cast("double")),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            / F.size(toks),
            4,
        ).alias("avg_token_len"),
    )


TOKEN_SQL = """
SELECT doc_id,
       CAST(len(string_split_regex(trim(text), '\\s+')) AS INT)            AS n_tokens,
       CAST(len(list_distinct(string_split_regex(trim(text), '\\s+'))) AS INT)
                                                                           AS n_unique_tokens,
       CAST(length(text) AS INT)                                           AS text_len,
       round(list_sum(list_transform(string_split_regex(trim(text), '\\s+'),
                                     t -> CAST(length(t) AS DOUBLE)))
             / len(string_split_regex(trim(text), '\\s+')), 4)             AS avg_token_len
FROM documents
"""


# ---------------------------------------------------------------------------
# Quality scoring: stopword ratio, lexical diversity, length band.
def text_quality_scores(spark: SparkSession, sf: str) -> DataFrame:
    return quality_stats(load(spark, sf, "documents"))


def quality_stats(d: DataFrame) -> DataFrame:
    """Frame-based core over any (doc_id, text) frame — reused by the
    streaming corpus pipeline on micro-batches."""
    toks = _tokens(F.col("text"))
    n_tokens = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda t: t.isin(_STOPWORDS)))
    diversity = F.size(F.array_distinct(toks)) / n_tokens
    return d.select(
        "doc_id",
        F.round(n_stop / n_tokens, 4).alias("stopword_ratio"),
        F.round(diversity, 4).alias("lexical_diversity"),
        F.when(n_tokens < 30, "short")
        .when(n_tokens <= 80, "medium")
        .otherwise("long")
        .alias("length_band"),
        (
            (n_stop / n_tokens > 0.02) & (diversity > 0.2) & (n_tokens >= 20)
        ).alias("passes_quality"),
    )


def _quality_sql(src: str = "documents") -> str:
    return f"""
WITH t AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks FROM {src}
), m AS (
  SELECT doc_id,
         len(toks)                                                          AS n_tokens,
         len(list_filter(toks, x -> x IN ('the','a','and','of','to','in','is','on')))
                                                                            AS n_stop,
         len(list_distinct(toks))                                           AS n_uniq
  FROM t
)
SELECT doc_id,
       round(CAST(n_stop AS DOUBLE) / n_tokens, 4)  AS stopword_ratio,
       round(CAST(n_uniq AS DOUBLE) / n_tokens, 4)  AS lexical_diversity,
       CASE WHEN n_tokens < 30 THEN 'short'
            WHEN n_tokens <= 80 THEN 'medium'
            ELSE 'long' END                         AS length_band,
       (CAST(n_stop AS DOUBLE) / n_tokens > 0.02
        AND CAST(n_uniq AS DOUBLE) / n_tokens > 0.2
        AND n_tokens >= 20)                         AS passes_quality
FROM m
"""


QUALITY_SQL = _quality_sql()


# ---------------------------------------------------------------------------
# Language-ID heuristic: marker-token scoring (n-gram heuristic family).
# The same scoring runs in both engines; prediction = argmax score with a
# deterministic tie-break on language code order.
_LANG_MARKERS = {
    "en": ["the", "a", "fast", "slow"],
    "de": ["agg", "vector", "group"],
    "es": ["data", "stream", "big"],
    "fr": ["window", "line", "small"],
    "zh": ["merge", "batch", "join"],
}


def text_lang_id(spark: SparkSession, sf: str) -> DataFrame:
    return lang_scores(load(spark, sf, "documents"))


def lang_scores(d: DataFrame) -> DataFrame:
    """Frame-based core over any (doc_id, lang, text) frame (see
    quality_stats) — the CCNet recipe runs it on CUT text."""
    toks = _tokens(F.col("text"))
    scored = d.select(
        "doc_id",
        F.col("lang").alias("actual_lang"),
        *[
            F.size(F.filter(toks, lambda t: t.isin(markers))).alias(f"score_{lang}")
            for lang, markers in _LANG_MARKERS.items()
        ],
    )
    # argmax with deterministic tie-break: compare in fixed language order,
    # strict > keeps the earliest language on ties.
    langs = list(_LANG_MARKERS)
    best = F.lit(langs[0])
    best_score = F.col(f"score_{langs[0]}")
    for lang in langs[1:]:
        cond = F.col(f"score_{lang}") > best_score
        best = F.when(cond, F.lit(lang)).otherwise(best)
        best_score = F.when(cond, F.col(f"score_{lang}")).otherwise(best_score)
    return scored.select(
        "doc_id", "actual_lang", best.alias("predicted_lang"), best_score.alias("score")
    )


def _lang_sql(src: str = "documents") -> str:
    score_cols = ",\n         ".join(
        "len(list_filter(toks, x -> x IN ({}))) AS score_{}".format(
            ", ".join(f"'{m}'" for m in markers), lang
        )
        for lang, markers in _LANG_MARKERS.items()
    )
    langs = list(_LANG_MARKERS)
    pred = f"'{langs[0]}'"
    best = f"score_{langs[0]}"
    for lang in langs[1:]:
        pred = f"CASE WHEN score_{lang} > {best} THEN '{lang}' ELSE {pred} END"
        best = f"CASE WHEN score_{lang} > {best} THEN score_{lang} ELSE {best} END"
    return f"""
WITH t AS (
  SELECT doc_id, lang, string_split_regex(trim(text), '\\s+') AS toks FROM {src}
), s AS (
  SELECT doc_id, lang AS actual_lang,
         {score_cols}
  FROM t
)
SELECT doc_id, actual_lang,
       {pred} AS predicted_lang,
       CAST({best} AS INT) AS score
FROM s
"""


# ---------------------------------------------------------------------------
# Document fingerprinting: md5 over the normalised text, plus a coarse
# locality bucket from the fingerprint prefix (rolling-hash family).
def text_fingerprint(spark: SparkSession, sf: str) -> DataFrame:
    d = load(spark, sf, "documents")
    norm = F.regexp_replace(F.lower(F.col("text")), r"[^a-z0-9 ]", "")
    fp = F.md5(norm)
    return d.select(
        "doc_id",
        fp.alias("fingerprint"),
        F.conv(F.substring(fp, 1, 4), 16, 10).cast("long").alias("bucket"),
    )


FINGERPRINT_SQL = """
SELECT doc_id,
       md5(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'))         AS fingerprint,
       CAST(('0x' || substring(md5(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g')), 1, 4))
            AS BIGINT)                                                  AS bucket
FROM documents
"""


# ---------------------------------------------------------------------------
# Repetition signals (the public Gopher/MassiveText repetition-filter
# recipe): duplicate-line fraction, most-frequent-2-gram character
# fraction, duplicate-3-gram character fraction. Character fractions are
# over the summed n-gram lengths (each occurrence counted once), so they
# are bounded by 1 even for self-overlapping grams.
#
# Scale note: everything is computed WITHIN each row (array expressions
# over the doc's own token array) — a narrow map with zero shuffle, unlike
# the explode+groupBy formulation. Per-doc cost is O(tokens ×
# distinct-grams), trivial for real document lengths, and it stays inside
# whole-stage codegen.
def text_repetition(spark: SparkSession, sf: str) -> DataFrame:
    return repetition_stats(load(spark, sf, "documents"))


def _repetition_int_stats(d: DataFrame) -> DataFrame:
    """Per-doc EXACT-INTEGER repetition counters in one Arrow pass:
    (doc_id, n_lines, n_distinct_lines, maxc, top_len, gc2, dup3_chars,
    gc3). Every fraction/round/boolean stays in Spark SQL downstream,
    so float semantics are byte-identical to the old expression form.

    r13 (guide §4.2/§4.4): the former pure-expression formulation was
    correct standalone (5.2 s at sf0.1) but catastrophic the moment a
    consumer FILTERED on a derived column: Catalyst pushes the
    predicate through the projection by substituting the full O(g^2)
    fold expression tree into the Filter (once per column reference —
    measured 5.2 s -> 53.8 s for pipeline_clean_corpus's rep_keep
    branch). A MapInArrow node is opaque to predicate pushdown, so the
    counters are computed exactly once no matter how consumers filter,
    and Counter-based counting is O(g) per doc instead of the fold's
    O(g^2).

    Tokenization replicates the Spark expressions bit-for-bit:
    trim = leading/trailing ASCII spaces only (Spark StringTrim), the
    split regex [ \\t\\n\\x0B\\f\\r]+ is Java's \\s (Python's \\s also
    matches unicode whitespace — deliberately NOT used), short docs pad
    missing gram slots with '' exactly like the zip_with/coalesce
    construction, and the top-bigram tie-break (higher count, then
    lexicographically smaller gram over first-occurrence-ordered
    distincts) matches the old fold's UTF8 binary comparison on this
    ASCII corpus."""

    def gen(batches):
        import re
        from collections import Counter

        import pyarrow as pa

        ws = re.compile(r"[ \t\n\x0b\f\r]+")

        def grams(toks, k):
            n = len(toks)
            m = max(n - k + 1, 1)
            padded = toks + [""] * (k - 1)
            return [" ".join(padded[i : i + k]) for i in range(m)]

        for batch in batches:
            ids = batch.column(0).to_pylist()
            texts = batch.column(1).to_pylist()
            rows = {
                "doc_id": [], "n_lines": [], "n_distinct_lines": [],
                "maxc": [], "top_len": [], "gc2": [], "dup3_chars": [],
                "gc3": [],
            }
            for doc_id, text in zip(ids, texts):
                lines = text.split("\n")
                toks = ws.split(text.strip(" "))
                g2 = grams(toks, 2)
                g3 = grams(toks, 3)
                c2 = Counter(g2)
                best_c, best_g = -1, ""
                for u in dict.fromkeys(g2):
                    c = c2[u]
                    if c > best_c or (c == best_c and u < best_g):
                        best_c, best_g = c, u
                c3 = Counter(g3)
                rows["doc_id"].append(doc_id)
                rows["n_lines"].append(len(lines))
                rows["n_distinct_lines"].append(len(set(lines)))
                rows["maxc"].append(best_c)
                rows["top_len"].append(len(best_g))
                rows["gc2"].append(sum(len(g) for g in g2))
                rows["dup3_chars"].append(
                    sum(c * len(u) for u, c in c3.items() if c > 1)
                )
                rows["gc3"].append(sum(len(g) for g in g3))
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(rows["doc_id"], type=pa.int64()),
                    pa.array(rows["n_lines"], type=pa.int32()),
                    pa.array(rows["n_distinct_lines"], type=pa.int32()),
                    pa.array(rows["maxc"], type=pa.int64()),
                    pa.array(rows["top_len"], type=pa.int32()),
                    pa.array(rows["gc2"], type=pa.int64()),
                    pa.array(rows["dup3_chars"], type=pa.int64()),
                    pa.array(rows["gc3"], type=pa.int64()),
                ],
                names=[
                    "doc_id", "n_lines", "n_distinct_lines", "maxc",
                    "top_len", "gc2", "dup3_chars", "gc3",
                ],
            )

    return d.select("doc_id", "text").mapInArrow(
        gen,
        "doc_id long, n_lines int, n_distinct_lines int, maxc long,"
        " top_len int, gc2 long, dup3_chars long, gc3 long",
    )


def repetition_stats(d: DataFrame) -> DataFrame:
    """Frame-based core (see quality_stats). Integer counters come from
    the Arrow pass; all divisions, 4dp rounding (Spark HALF_UP) and the
    pass/fail booleans are Spark expressions over those exact longs, so
    values are identical to the former all-expression form."""
    ints = _repetition_int_stats(d)
    top_frac = F.col("maxc") * F.col("top_len") / F.col("gc2")
    dup3_frac = F.col("dup3_chars") / F.col("gc3")
    return ints.select(
        "doc_id",
        F.round(
            (F.col("n_lines") - F.col("n_distinct_lines"))
            / F.col("n_lines").cast("double"),
            4,
        ).alias("dup_line_frac"),
        F.round(
            F.col("maxc") * F.col("top_len") / F.col("gc2").cast("double"), 4
        ).alias("top_bigram_char_frac"),
        F.round(F.col("dup3_chars") / F.col("gc3").cast("double"), 4).alias(
            "dup_trigram_char_frac"
        ),
        ((top_frac <= 0.2) & (dup3_frac <= 0.3)).alias("passes_repetition"),
    )


REPETITION_SQL = """
WITH t AS (
  SELECT doc_id, text, string_split_regex(trim(text), '\\s+') AS toks FROM documents
), g AS (
  SELECT doc_id, text,
         list_transform(range(1, greatest(len(toks) - 1, 1) + 1),
                        i -> toks[i] || ' ' || coalesce(toks[i+1], '')) AS g2,
         list_transform(range(1, greatest(len(toks) - 2, 1) + 1),
                        i -> toks[i] || ' ' || coalesce(toks[i+1], '')
                                    || ' ' || coalesce(toks[i+2], '')) AS g3,
         string_split(text, chr(10)) AS lines
  FROM t
), m AS (
  SELECT doc_id, g2, g3, lines,
         list_max(list_transform(list_distinct(g2),
                  u -> len(list_filter(g2, x -> x = u)))) AS maxc
  FROM g
), s AS (
  SELECT doc_id, lines, maxc,
         list_min(list_filter(list_distinct(g2),
                  u -> len(list_filter(g2, x -> x = u)) = maxc)) AS top_gram,
         list_sum(list_transform(g2, x -> CAST(length(x) AS BIGINT))) AS chars2,
         list_sum(list_transform(g3, x -> CAST(length(x) AS BIGINT))) AS chars3,
         coalesce(list_sum(list_transform(
             list_filter(list_distinct(g3),
                         u -> len(list_filter(g3, x -> x = u)) > 1),
             u -> CAST(len(list_filter(g3, x -> x = u)) * length(u) AS BIGINT))), 0)
           AS dup3_chars
  FROM m
)
SELECT doc_id,
       round(CAST(len(lines) - len(list_distinct(lines)) AS DOUBLE) / len(lines), 4)
         AS dup_line_frac,
       round(maxc * length(top_gram) / CAST(chars2 AS DOUBLE), 4) AS top_bigram_char_frac,
       round(dup3_chars / CAST(chars3 AS DOUBLE), 4)              AS dup_trigram_char_frac,
       (maxc * length(top_gram) / CAST(chars2 AS DOUBLE) <= 0.2
        AND dup3_chars / CAST(chars3 AS DOUBLE) <= 0.3)           AS passes_repetition
FROM s
"""


# ---------------------------------------------------------------------------
# C4-style line-level quality filters (the public C4/mC4 cleaning recipe):
# keep lines that end in terminal punctuation, have >= 5 words, and don't
# mention javascript; drop whole docs with < 3 kept lines or boilerplate
# markers (lorem ipsum / curly brace). Like the other text ops this is a
# pure narrow map — per-row array expressions, zero shuffle at any scale.
def text_c4_filters(spark: SparkSession, sf: str) -> DataFrame:
    return c4_stats(load(spark, sf, "documents"))


def c4_stats(d: DataFrame) -> DataFrame:
    """Frame-based core (see quality_stats)."""
    lines = F.split(F.col("text"), "\n")
    kept = F.filter(
        lines,
        lambda l: F.trim(l).rlike('[.!?"]$')
        & (F.size(F.split(F.trim(l), r"\s+")) >= 5)
        & (F.instr(F.lower(l), "javascript") == 0),
    )
    chars = lambda arr: F.aggregate(  # noqa: E731
        F.transform(arr, lambda x: F.length(x).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    has_lorem = F.instr(F.lower(F.col("text")), "lorem ipsum") > 0
    has_brace = F.instr(F.col("text"), "{") > 0
    base = d.select(
        "doc_id",
        lines.alias("lines"),
        kept.alias("kept"),
        has_lorem.alias("has_lorem"),
        has_brace.alias("has_brace"),
    )
    return base.select(
        "doc_id",
        F.size("lines").alias("n_lines"),
        F.size("kept").alias("n_kept_lines"),
        F.round(
            chars(F.col("kept"))
            / F.greatest(chars(F.col("lines")), F.lit(1).cast("long")).cast("double"),
            4,
        ).alias("kept_char_frac"),
        (F.col("has_lorem") | F.col("has_brace")).alias("has_boilerplate"),
        ((F.size("kept") >= 3) & ~F.col("has_lorem") & ~F.col("has_brace")).alias(
            "keep_doc"
        ),
    )


C4_SQL = """
WITH t AS (
  SELECT doc_id, text, string_split(text, chr(10)) AS lines FROM documents
), k AS (
  SELECT doc_id, lines,
         list_filter(lines, l -> regexp_matches(trim(l), '[.!?"]$')
                            AND len(string_split_regex(trim(l), '\\s+')) >= 5
                            AND instr(lower(l), 'javascript') = 0)  AS kept,
         instr(lower(text), 'lorem ipsum') > 0                     AS has_lorem,
         instr(text, '{') > 0                                      AS has_brace
  FROM t
)
SELECT doc_id,
       CAST(len(lines) AS INT) AS n_lines,
       CAST(len(kept) AS INT)  AS n_kept_lines,
       round(CAST(coalesce(list_sum(list_transform(kept,  x -> CAST(length(x) AS BIGINT))), 0) AS DOUBLE)
             / greatest(coalesce(list_sum(list_transform(lines, x -> CAST(length(x) AS BIGINT))), 0), 1),
             4)                AS kept_char_frac,
       (has_lorem OR has_brace)                                    AS has_boilerplate,
       (len(kept) >= 3 AND NOT has_lorem AND NOT has_brace)        AS keep_doc
FROM k
"""


# ---------------------------------------------------------------------------
# Corpus vocabulary heavy hitters: global top-100 tokens by occurrence.
# Scale shape: explode -> hash aggregation (map-side combine shrinks the
# shuffle to distinct tokens per partition) -> orderBy+limit, which Spark
# executes as TakeOrderedAndProject: per-partition top-k then a k-row
# driver merge — the two-phase top-k, never a global sort. Tie-break on
# token keeps the boundary rows deterministic across engines.
_VOCAB_K = 100


def text_vocab_topk(spark: SparkSession, sf: str) -> DataFrame:
    d = load(spark, sf, "documents")
    return (
        d.select(F.explode(_tokens(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "token")
        .limit(_VOCAB_K)
    )


VOCAB_SQL = f"""
SELECT token, CAST(count(*) AS BIGINT) AS n
FROM (SELECT unnest(string_split_regex(trim(text), '\\s+')) AS token
      FROM documents) t
GROUP BY token
ORDER BY n DESC, token
LIMIT {_VOCAB_K}
"""


# ---------------------------------------------------------------------------
# TF-IDF top terms per document. Document frequencies come from one
# explode+distinct+hash-agg over the corpus (map-side combined); the
# per-doc top-3 window partitions by doc_id, so group state is bounded
# by a single document's vocabulary — no global sort, no skew surface.
# N (corpus size) joins in as a broadcast 1-row frame, not a collect().
def text_tfidf_top3(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window as W

    d = load(spark, sf, "documents")
    toks = d.select("doc_id", F.explode(_tokens(F.col("text"))).alias("token"))
    tf = toks.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    df_ = toks.distinct().groupBy("token").agg(F.count("*").alias("df"))
    n = d.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(df_, "token")
        .crossJoin(F.broadcast(n))
        .withColumn("score", F.col("tf") * F.log(F.col("n_docs") / F.col("df")))
    )
    w = W.partitionBy("doc_id").orderBy(F.col("score").desc(), "token")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 3)
        .select("doc_id", "token", F.round("score", 4).alias("score"), "rank")
    )


TFIDF_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS token
  FROM documents
), tf AS (
  SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY 1, 2
), df AS (
  SELECT token, count(*) AS df FROM (SELECT DISTINCT doc_id, token FROM toks) x
  GROUP BY token
), n AS (
  SELECT count(*) AS n_docs FROM documents
), scored AS (
  SELECT tf.doc_id, tf.token,
         tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df) AS score
  FROM tf JOIN df USING (token) CROSS JOIN n
)
SELECT doc_id, token, round(score, 4) AS score, CAST(rank AS INT) AS rank
FROM (SELECT doc_id, token, score,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY score DESC, token) AS rank
      FROM scored) r
WHERE rank <= 3
"""


# ---------------------------------------------------------------------------
# Character-entropy quality signal: gibberish and boilerplate both show up
# as entropy outliers (too low = repeated filler, near-max = random
# noise). Shannon entropy over the per-doc character distribution, pure
# per-row array math — zero shuffle, whole-stage codegen.
#
# Chars come from regexp_extract_all(text, '.') on BOTH engines (split on
# the empty string differs between them: Java regex split may keep a
# trailing empty match). The histogram is ONE aggregate pass over the
# SORTED char array: a (prev, run_length, sum) struct accumulator closes
# each run with its entropy term — O(n log n) sort + O(n) pass instead of
# the former O(n·d) filter-per-distinct-char. ln() can differ by 1 ulp
# between JDK and libm and the two engines sum terms in different char
# orders, so entropy is rounded to 4dp; with ~1e-15 accumulated noise the
# flip probability at a 0.00005 boundary is negligible. Empty docs yield
# 0.0 on both engines (coalesce guards DuckDB's NULL list_sum).
def text_char_entropy(spark: SparkSession, sf: str) -> DataFrame:
    d = load(spark, sf, "documents")
    chars = F.expr("regexp_extract_all(text, '.', 0)")
    base = d.select(
        "doc_id",
        F.size(chars).alias("n_chars_total"),
        F.size(F.array_distinct(chars)).alias("n_distinct_chars"),
        F.array_sort(chars).alias("schars"),
    )

    n = F.col("n_chars_total").cast("double")

    def term(run):
        p = run.cast("double") / n
        return p * F.log(p)

    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0.0).alias("s"),
    )

    def step(acc, c):
        return F.when(
            acc["prev"].isNull() | (acc["prev"] == c),
            F.struct(
                c.alias("prev"),
                (acc["run"] + F.lit(1).cast("long")).alias("run"),
                acc["s"].alias("s"),
            ),
        ).otherwise(
            F.struct(
                c.alias("prev"),
                F.lit(1).cast("long").alias("run"),
                (acc["s"] + term(acc["run"])).alias("s"),
            )
        )

    def fin(acc):
        return F.when(acc["run"] > 0, acc["s"] + term(acc["run"])).otherwise(F.lit(0.0))

    return base.select(
        "doc_id",
        "n_chars_total",
        "n_distinct_chars",
        # + 0.0 canonicalises the empty-doc -0.0
        F.round(-F.aggregate(F.col("schars"), init, step, fin) + F.lit(0.0), 4).alias(
            "entropy_nats"
        ),
    )


ENTROPY_SQL = """
SELECT doc_id,
       CAST(len(chars) AS INT) AS n_chars_total,
       CAST(len(list_distinct(chars)) AS INT) AS n_distinct_chars,
       coalesce(round(-list_sum(list_transform(list_distinct(chars),
              c -> (CAST(len(list_filter(chars, x -> x = c)) AS DOUBLE) / len(chars))
                   * ln(CAST(len(list_filter(chars, x -> x = c)) AS DOUBLE) / len(chars))
            )), 4), 0.0) AS entropy_nats
FROM (SELECT doc_id, regexp_extract_all(text, '.') AS chars FROM documents)
"""


# ---------------------------------------------------------------------------
# Unigram language-model scoring: average token log-probability of each
# document under the corpus's own unigram distribution — the classic
# cheap "perplexity-style" quality signal (low score = rare-token soup:
# gibberish, OCR noise, wrong-language fragments).
#
# Scale shape: one explode + hash agg builds the vocab (map-side
# combined); scoring is a join on the token key — broadcastable while
# the vocab fits (tens of millions of types), else it degrades to one
# hash-partitioned equi-join — then one agg back to doc grain. Per-token
# log-probs are SCALED-INTEGER micro-nats, so the per-doc sums are
# order-independent longs and only the final division is floating point.
def text_unigram_logprob(spark: SparkSession, sf: str) -> DataFrame:
    d = load(spark, sf, "documents").select("doc_id", "text")
    toks = d.select(
        "doc_id", F.explode(_tokens(F.lower(F.col("text")))).alias("tok")
    )
    total = toks.agg(F.count("*").alias("total"))
    vocab = (
        toks.groupBy("tok")
        .agg(F.count("*").alias("c"))
        .crossJoin(F.broadcast(total))
        .select(
            "tok",
            F.round(F.log(F.col("c") / F.col("total")) * 1e6)
            .cast("long")
            .alias("lp_micro"),
        )
    )
    return (
        toks.join(vocab, "tok")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("int").alias("n_tokens"),
            F.round(F.sum("lp_micro") / (F.count("*") * 1e6), 4).alias("avg_logprob"),
        )
    )


UNIGRAM_SQL = """
WITH t AS (
  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS tok
  FROM documents
),
n AS (SELECT count(*) AS total FROM t),
v AS (
  SELECT tok,
         CAST(round(ln(count(*) / (SELECT total FROM n)) * 1000000, 0) AS BIGINT)
           AS lp_micro
  FROM t GROUP BY tok
)
SELECT t.doc_id,
       CAST(count(*) AS INT) AS n_tokens,
       round(sum(v.lp_micro) / (count(*) * 1000000.0), 4) AS avg_logprob
FROM t JOIN v USING (tok)
GROUP BY t.doc_id
"""


# ---------------------------------------------------------------------------
# BPE-style subword pre-tokenization: the GPT-2 pre-tokenizer's regex
# families (contraction suffixes, space-prefixed letter runs, digit
# runs, punctuation runs), restricted to the RE2∩Java-regex subset so
# Spark (java.util.regex) and DuckDB (RE2) extract IDENTICAL token
# streams — the full GPT-2 pattern's lookahead `\\s+(?!\\S)` is not RE2-
# expressible. This is the "token count as a BPE tokenizer would see
# it" estimate a training-data pipeline budgets with, vs the whitespace
# count of text_token_stats. Pure per-row regexp — zero shuffle.
_BPE_PAT = r"('s|'t|'re|'ve|'m|'ll|'d)| ?[\p{L}]+| ?[\p{N}]+| ?[^\s\p{L}\p{N}]+"


def text_bpe_pretokens(spark: SparkSession, sf: str) -> DataFrame:
    d = load(spark, sf, "documents")
    toks = F.regexp_extract_all("text", F.lit(_BPE_PAT), 0)
    ws = _tokens(F.col("text"))
    return d.select(
        "doc_id",
        F.size(toks).alias("n_bpe_tokens"),
        F.size(F.array_distinct(toks)).alias("n_unique_bpe_tokens"),
        F.size(ws).alias("n_ws_tokens"),
        # fertility: BPE-ish pieces per whitespace word (tokenizer cost
        # multiplier; rises on noisy/agglutinative text)
        F.round(F.size(toks) / F.size(ws), 4).alias("fertility"),
    )


_BPE_SQL_PAT = _BPE_PAT.replace("'", "''")
BPE_SQL = f"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{_BPE_SQL_PAT}')) AS INT) AS n_bpe_tokens,
       CAST(len(list_distinct(regexp_extract_all(text, '{_BPE_SQL_PAT}'))) AS INT)
         AS n_unique_bpe_tokens,
       CAST(len(string_split_regex(trim(text), '\\s+')) AS INT) AS n_ws_tokens,
       round(len(regexp_extract_all(text, '{_BPE_SQL_PAT}'))
             / CAST(len(string_split_regex(trim(text), '\\s+')) AS DOUBLE), 4)
         AS fertility
FROM documents
"""


# ---------------------------------------------------------------------------
# Bigram-LM quality scoring — one step up the n-gram ladder from
# text_unigram_logprob: per-doc average log P(w2|w1) under an add-1
# (Laplace) smoothed corpus bigram model. The KenLM-style perplexity
# filter of an LLM data pipeline, reduced to its SQL-provable core:
# fluent/native text scores high, shuffled or boilerplate-injected text
# scores low even when its UNIGRAM distribution is unchanged — which is
# exactly the failure mode the unigram score cannot see.
#
# Scale shape: one corpus pass for bigram counts (map-side-combined
# hash agg on (w1, w2)), one vocab-sized unigram/count join to attach
# denominators, then the doc-bigram stream equi-joins the scored bigram
# table. Cross-engine exactness: ln() rounded to integer micro-nats per
# bigram type (the unigram query's proven recipe), summed exactly.
#
# Known vocabulary quirk (documented, deliberately unchanged): split of
# an empty/whitespace-only doc yields [''], so such a doc counts as one
# '' token in the unigram table (inflating V by at most 1). The trigram
# LM (trigram_q) filters these; here the behaviour is identical in both
# engines and is kept so perplexity_buckets' bucket boundaries stay
# comparable across rounds (no zero-length doc exists in the testdata,
# so the two conventions are indistinguishable on every gated corpus).
def text_bigram_logprob(spark: SparkSession, sf: str) -> DataFrame:
    return bigram_logprob(load(spark, sf, "documents"))


def bigram_logprob(d: DataFrame) -> DataFrame:
    """Frame-based core over any (doc_id, text) frame: the bigram model
    is trained on the GIVEN frame (the CCNet recipe scores cut text
    against a cut-corpus model)."""
    return (
        bigram_doc_scores(d)
        .select(
            "doc_id",
            "n_bigrams",
            F.round(F.col("lp_sum_micro") / (F.col("n_bigrams") * 1e6), 4).alias(
                "avg_logprob"
            ),
        )
    )


def bigram_doc_scores(d: DataFrame) -> DataFrame:
    """Per-doc EXACT-INTEGER bigram-LM totals over any (doc_id, text)
    frame: (doc_id, n_bigrams, lp_sum_micro). ``bigram_logprob`` and the
    perplexity bucketing build on this."""
    d = d.select("doc_id", "text")
    toks = d.select("doc_id", _tokens(F.lower(F.col("text"))).alias("arr"))
    big = toks.where(F.size("arr") >= 2).select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(arr) - 1),"
                " i -> struct(element_at(arr, i) AS w1,"
                " element_at(arr, i + 1) AS w2))"
            )
        ).alias("b"),
    ).select("doc_id", F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
    uni = (
        toks.select(F.explode("arr").alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("c1"))
    )
    vsize = uni.agg(F.count("*").alias("v"))
    lp = (
        big.groupBy("w1", "w2")
        .agg(F.count("*").alias("c2"))
        .join(uni.withColumnRenamed("tok", "w1"), "w1")
        .crossJoin(F.broadcast(vsize))
        .select(
            "w1",
            "w2",
            F.round(
                F.log((F.col("c2") + 1) / (F.col("c1") + F.col("v"))) * 1e6
            )
            .cast("long")
            .alias("lp_micro"),
        )
    )
    return (
        big.join(lp, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("int").alias("n_bigrams"),
            F.sum("lp_micro").alias("lp_sum_micro"),
        )
    )


def _bigram_sql(src: str = "documents") -> str:
    return f"""
WITH arrs AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS arr
  FROM {src}
),
big AS (
  SELECT doc_id, arr[x] AS w1, arr[x + 1] AS w2
  FROM arrs, UNNEST(generate_series(1, len(arr) - 1)) AS u(x)
  WHERE len(arr) >= 2
),
uni AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS c1
  FROM (SELECT unnest(arr) AS tok FROM arrs) GROUP BY tok
),
vs AS (SELECT count(*) AS v FROM uni),
lp AS (
  SELECT b.w1, b.w2,
         CAST(round(ln((count(*) + 1)
                       / CAST(u.c1 + (SELECT v FROM vs) AS DOUBLE))
                    * 1000000, 0) AS BIGINT) AS lp_micro
  FROM big b JOIN uni u ON u.tok = b.w1
  GROUP BY b.w1, b.w2, u.c1
)
SELECT b.doc_id,
       CAST(count(*) AS INT) AS n_bigrams,
       round(sum(lp.lp_micro) / (count(*) * 1000000.0), 4) AS avg_logprob
FROM big b JOIN lp USING (w1, w2)
GROUP BY b.doc_id
"""


BIGRAM_SQL = _bigram_sql()


# ---------------------------------------------------------------------------
# Gopher quality rules (Rae et al. 2021, Table A1) — the third named
# quality-filter family next to the C4 line rules (c4_stats) and the
# stopword/diversity scores (quality_stats): document-level bounds on
# word count, mean word length, symbol ratio, bullet/ellipsis line
# fractions, alphabetic-word fraction, and a stop-word floor. Per-doc
# report with every rule's measurement plus the composite keep flag —
# the numbers a data team tunes before a pretraining run.
_GOPHER_STOPS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_stats(d: DataFrame) -> DataFrame:
    """Frame-based core (see quality_stats)."""
    toks = _tokens(F.col("text"))
    lines = F.split(F.col("text"), "\n")
    base = d.select("doc_id", "text", toks.alias("toks"), lines.alias("lines"))
    n_words = F.size("toks")
    sum_len = F.aggregate(
        F.transform(F.col("toks"), lambda t: F.length(t).cast("long")),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )
    n_hash = F.length("text") - F.length(F.replace(F.col("text"), F.lit("#")))
    n_ellipsis = (
        F.length("text") - F.length(F.replace(F.col("text"), F.lit("...")))
    ) / 3
    n_alpha = F.size(F.filter(F.col("toks"), lambda t: t.rlike("[a-zA-Z]")))
    n_bullet = F.size(
        F.filter(F.col("lines"), lambda l: F.trim(l).rlike(r"^[-*•]"))
    )
    n_ell_lines = F.size(
        F.filter(
            F.col("lines"),
            lambda l: F.rtrim(l).rlike(r"(\.\.\.|…)$"),
        )
    )
    low = F.array_distinct(F.transform(F.col("toks"), F.lower))
    n_stops = F.size(
        F.filter(low, lambda t: t.isin(*_GOPHER_STOPS))
    )
    m = base.select(
        "doc_id",
        n_words.alias("n_words"),
        F.round(sum_len / n_words, 4).alias("mean_word_len"),
        F.round((n_hash + n_ellipsis) / n_words, 4).alias("symbol_word_ratio"),
        F.round(n_alpha / n_words, 4).alias("alpha_word_frac"),
        F.round(n_bullet / F.size("lines"), 4).alias("bullet_line_frac"),
        F.round(n_ell_lines / F.size("lines"), 4).alias("ellipsis_line_frac"),
        n_stops.cast("int").alias("n_gopher_stops"),
    )
    rules = [
        m["n_words"].between(50, 100000),
        m["mean_word_len"].between(3, 10),
        m["symbol_word_ratio"] <= 0.1,
        m["alpha_word_frac"] >= 0.8,
        m["bullet_line_frac"] <= 0.9,
        m["ellipsis_line_frac"] <= 0.3,
        m["n_gopher_stops"] >= 2,
    ]
    n_failed = sum(
        (F.when(r, 0).otherwise(1) for r in rules), start=F.lit(0)
    ).cast("int")
    keep = rules[0]
    for r in rules[1:]:
        keep = keep & r
    # n_rules_failed keeps the report discriminating even on a corpus
    # where one rule fails uniformly (the synthetic vocabulary contains
    # only one of the eight Gopher stop words, so the stop-word floor
    # rejects every doc — the composite flag honestly says so)
    return m.withColumn("n_rules_failed", n_failed).withColumn("keep_doc", keep)


def text_gopher_filters(spark: SparkSession, sf: str) -> DataFrame:
    return gopher_stats(load(spark, sf, "documents"))


GOPHER_SQL = """
WITH t AS (
  SELECT doc_id, text,
         string_split_regex(trim(text), '\\s+') AS toks,
         string_split(text, chr(10)) AS lines
  FROM documents
), m AS (
  SELECT doc_id,
         CAST(len(toks) AS INT) AS n_words,
         round(CAST(list_sum(list_transform(toks, x -> CAST(length(x) AS BIGINT))) AS DOUBLE)
               / len(toks), 4) AS mean_word_len,
         round((CAST(length(text) - length(replace(text, '#', '')) AS DOUBLE)
                + (length(text) - length(replace(text, '...', ''))) / 3.0)
               / len(toks), 4) AS symbol_word_ratio,
         round(CAST(len(list_filter(toks, x -> regexp_matches(x, '[a-zA-Z]'))) AS DOUBLE)
               / len(toks), 4) AS alpha_word_frac,
         round(CAST(len(list_filter(lines, l -> regexp_matches(trim(l), '^[-*•]'))) AS DOUBLE)
               / len(lines), 4) AS bullet_line_frac,
         round(CAST(len(list_filter(lines, l -> regexp_matches(rtrim(l), '(\\.\\.\\.|…)$'))) AS DOUBLE)
               / len(lines), 4) AS ellipsis_line_frac,
         CAST(len(list_filter(list_distinct(list_transform(toks, x -> lower(x))),
                  x -> x IN ('the','be','to','of','and','that','have','with'))) AS INT)
           AS n_gopher_stops
  FROM t
)
SELECT *,
       CAST((CASE WHEN n_words BETWEEN 50 AND 100000 THEN 0 ELSE 1 END)
          + (CASE WHEN mean_word_len BETWEEN 3 AND 10 THEN 0 ELSE 1 END)
          + (CASE WHEN symbol_word_ratio <= 0.1 THEN 0 ELSE 1 END)
          + (CASE WHEN alpha_word_frac >= 0.8 THEN 0 ELSE 1 END)
          + (CASE WHEN bullet_line_frac <= 0.9 THEN 0 ELSE 1 END)
          + (CASE WHEN ellipsis_line_frac <= 0.3 THEN 0 ELSE 1 END)
          + (CASE WHEN n_gopher_stops >= 2 THEN 0 ELSE 1 END) AS INT)
         AS n_rules_failed,
       (n_words BETWEEN 50 AND 100000
        AND mean_word_len BETWEEN 3 AND 10
        AND symbol_word_ratio <= 0.1
        AND alpha_word_frac >= 0.8
        AND bullet_line_frac <= 0.9
        AND ellipsis_line_frac <= 0.3
        AND n_gopher_stops >= 2) AS keep_doc
FROM m
"""


QUERIES = {
    "text_token_stats": QuerySpec(text_token_stats, TOKEN_SQL),
    "text_gopher_filters": QuerySpec(text_gopher_filters, GOPHER_SQL),
    "text_char_entropy": QuerySpec(text_char_entropy, ENTROPY_SQL),
    "text_quality_scores": QuerySpec(text_quality_scores, QUALITY_SQL),
    "text_lang_id": QuerySpec(text_lang_id, _lang_sql()),
    "text_fingerprint": QuerySpec(text_fingerprint, FINGERPRINT_SQL),
    "text_repetition": QuerySpec(text_repetition, REPETITION_SQL),
    "text_c4_filters": QuerySpec(text_c4_filters, C4_SQL),
    "text_vocab_topk": QuerySpec(text_vocab_topk, VOCAB_SQL),
    "text_tfidf_top3": QuerySpec(text_tfidf_top3, TFIDF_SQL),
    "text_unigram_logprob": QuerySpec(text_unigram_logprob, UNIGRAM_SQL),
    "text_bpe_pretokens": QuerySpec(text_bpe_pretokens, BPE_SQL),
    "text_bigram_logprob": QuerySpec(text_bigram_logprob, BIGRAM_SQL),
}
