"""Exact substring deduplication — the EXACT half of Lee et al. 2022
("Deduplicating Training Data Makes Language Models Better"), the one
canonical LLM-corpus dedup modality the near-dup family (MinHash/SimHash/
Jaccard/SRP in ``dedup_q``) and the approximate shingle-overlap query
(``mix_q.crossdoc_ngram_overlap``) do not cover: find every VERBATIM
token span of length >= L that occurs more than once anywhere in the
corpus (across documents or repeated within one), and cut it.

The reference's dedup surface is span-id anti-joins
(opentelemetry_helpers.py:540-546) — this is north-star scope.

Spark-shaped equivalent of the paper's suffix-array method, built on an
exact L-gram identity instead of a suffix array (which is a single-node
data structure):

    a token position p in doc d starts a duplicated L-window
        <=>  hash(tokens[p : p+L]) has corpus frequency >= 2
    and the union of duplicated L-windows, merged where they overlap or
    touch, is EXACTLY the set of maximal duplicated spans of length >= L
    (a duplicated span of length M >= L is the union of its M-L+1
    duplicated L-windows; conversely every duplicated L-window is itself
    a duplicated span).

So the whole computation is: one corpus-sized L-gram pass -> one
frequency hash-agg on 8-byte keys (map-side combined) -> join back ->
per-doc gaps-and-islands window merge. NO all-pairs stage, no candidate
pair materialisation at all — unlike the near-dup family this does not
even need banding, because exact identity IS an equi-join key. Shuffle
volume is one 8-byte hash per corpus token position; the only window
runs per (doc_id) over that doc's duplicated positions — bounded by
document length, never corpus length.

Hash: each token is md5-hashed ONCE to a 60-bit integer; every L-token
window key is then a pair of Horner-rule polynomial combinations of the
per-token hashes mod two ~2^30 primes, packed into one < 2^60 integer.
Exact 64-bit integer arithmetic at every step, so Spark and DuckDB
agree bit-for-bit and the oracle reproduces the pipeline
value-for-value at every scale factor. (At ~60 effective bits a false
collision needs ~2^30 DISTINCT grams for a 50% birthday chance; a
collision would merely flag one extra window.) Unlike the v1 scheme
(md5 over an `array_join` of each window — ~L× the corpus in transient
strings through the hash), the per-position work is L integer
multiply-adds over an int sequence: no window string is ever built.

``cut_dup_spans`` is the removal half: re-emit each document with every
duplicated-span token dropped (Lee et al. cut ALL occurrences, noting
keeping one copy changes results negligibly) — a zero-shuffle array
filter once the spans are known.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import QuerySpec, load

_L = 20  # minimum duplicated-span length in tokens (paper uses 50 BPE
# tokens at web scale; testdata documents average ~56 words)

# Polynomial window-hash constants. Two independent ladders mod ~2^30
# primes give ~60 effective bits; every intermediate stays under 2^61
# (Horner step: acc*B < 2^30 * 2^20 = 2^50, plus a 60-bit token hash),
# so the arithmetic is exact signed-64 in BOTH engines — no ANSI
# overflow, no wrap-around semantics to match.
_P1 = 1073741789  # largest prime < 2^30
_P2 = 1073741783
_B1 = 1000003
_B2 = 999983


def _pow_list(b: int, p: int, l: int) -> list[int]:
    """pw[j] = b^(l-1-j) mod p for j = 0..l-1 — the weight of the j-th
    token in the window under the Horner fold."""
    return [pow(b, l - 1 - j, p) for j in range(l)]


def _with_tokens(docs: DataFrame) -> DataFrame:
    """Ensure a `tok` token-array column (split once; frames that carry
    a pre-tokenized `tok` pass through untouched — the single-tokenize
    perf path hands every consumer ONE cached token frame)."""
    if "tok" in docs.columns:
        return docs
    return docs.withColumn("tok", F.split("text", " "))


def _grams(docs: DataFrame, l: int = _L) -> DataFrame:
    """(doc_id, n_tokens, pos, h): 60-bit polynomial hash of the
    L-token window at every start position — one ``mapInArrow`` pass.

    r13 (guide §4.1/§4.2): the expression form (kept as ``_grams_expr``,
    parity-locked by tests/test_grams_arrow.py) ran the per-token md5
    inside ``transform`` and the per-position Horner fold as
    ``aggregate(sequence(...))`` — interpreted higher-order lambdas, one
    expression-tree walk per token per ladder, allocating a sequence
    array per position. This pass does the same exact-integer math as
    one memoized hashlib loop per distinct token plus 2*L vectorized
    numpy ops per batch (sliding_window_view over the concatenated
    token-hash array; cross-doc windows masked out). All arithmetic is
    int64-exact (acc < 2^30, acc*B < 2^50, +th < 2^61), so ``h`` is
    bit-identical to the expression form and to the DuckDB oracle.

    Tokenization parity: a raw text frame is split in Python with
    ``text.split(" ")`` — identical to Spark ``split(text, ' ')``
    (literal single-space regex keeps empty tokens, including leading/
    trailing). A pre-tokenized frame (``tok`` column, no ``text``)
    ships the arrays instead.
    """
    # r14 (ADVICE): "tok" wins when present — the same precedence as
    # _with_tokens. The old `"text" not in columns` test inverted it for
    # frames carrying BOTH (e.g. _cut_frame's cached token frame), which
    # silently re-split text in Python and bypassed the r11
    # single-tokenization design.
    use_tok = "tok" in docs.columns
    src = docs.select("doc_id", "tok" if use_tok else "text")

    def gen(batches):
        import hashlib

        import numpy as np
        import pyarrow as pa
        from numpy.lib.stride_tricks import sliding_window_view

        memo: dict = {}

        def th_of(tok):
            v = memo.get(tok)
            if v is None:
                v = (
                    int.from_bytes(hashlib.md5(tok.encode("utf-8")).digest()[:8], "big")
                    >> 4
                )
                memo[tok] = v
            return v

        names = ["doc_id", "n_tokens", "pos", "h"]
        for batch in batches:
            ids = batch.column(0).to_pylist()
            vals = batch.column(1).to_pylist()
            th_chunks, doc_ids, lens = [], [], []
            for doc_id, v in zip(ids, vals):
                if v is None:
                    continue  # size(null) = -1 < l in the expression form
                toks = v if use_tok else v.split(" ")
                n = len(toks)
                if n < l:  # docs shorter than L cannot contain a dup span
                    continue
                th_chunks.append(
                    np.fromiter((th_of(t) for t in toks), dtype=np.int64, count=n)
                )
                doc_ids.append(doc_id)
                lens.append(n)
            if not doc_ids:
                continue
            allth = np.concatenate(th_chunks)
            windows = sliding_window_view(allth, l)
            acc1 = np.zeros(len(windows), dtype=np.int64)
            acc2 = np.zeros(len(windows), dtype=np.int64)
            for j in range(l):
                col = windows[:, j]
                acc1 = (acc1 * _B1 + col) % _P1
                acc2 = (acc2 * _B2 + col) % _P2
            h = acc1 * _P2 + acc2
            lens_a = np.asarray(lens, dtype=np.int64)
            starts = np.concatenate(([0], np.cumsum(lens_a)[:-1]))
            counts = lens_a - l + 1
            idx = np.concatenate(
                [np.arange(s, s + c) for s, c in zip(starts, counts)]
            )
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(
                        np.repeat(np.asarray(doc_ids, dtype=np.int64), counts)
                    ),
                    pa.array(
                        np.repeat(lens_a, counts).astype(np.int32), type=pa.int32()
                    ),
                    pa.array(
                        (idx - np.repeat(starts, counts) + 1).astype(np.int32),
                        type=pa.int32(),
                    ),
                    pa.array(h[idx]),
                ],
                names=names,
            )

    return src.mapInArrow(gen, "doc_id long, n_tokens int, pos int, h long")


def _grams_expr(docs: DataFrame, l: int = _L) -> DataFrame:
    """(doc_id, n_tokens, pos, h): 60-bit polynomial hash of the
    L-token window at every start position, from ONE md5 per token.

    Each token hashes once to a 60-bit integer (`th`); the window key
    at position i is Horner-rule fold of th[i..i+L-1] mod _P1 and _P2,
    packed as h1 * _P2 + h2 < 2^60. Per position this is L integer
    multiply-adds over `sequence(i, i+L-1)` — no window string, no
    slice copy, no per-window md5 (the v1 scheme md5-ed an
    `array_join` of every window: ~L× the corpus through the hash).
    Docs shorter than L emit nothing (they cannot contain a
    duplicated span).

    Accepts either a raw (doc_id, text) frame or a pre-tokenized frame
    with a `tok` column (see ``_with_tokens``): the find-and-cut
    queries pass one CACHED token frame so the gram pass and the cut
    pass share a single tokenization of the corpus (r11 SCALE.md: the
    double tokenization was the steepest 64x scaler at 2.20x/4x rows).
    """
    horner = [
        f"aggregate(sequence(i, i + {l} - 1), cast(0 as bigint),"
        f" (a, j) -> (a * {b} + element_at(th, j)) % {p})"
        for b, p in ((_B1, _P1), (_B2, _P2))
    ]
    return (
        _with_tokens(docs).select("doc_id", "tok")
        .where(F.size("tok") >= l)
        .select(
            "doc_id",
            F.size("tok").alias("n_tokens"),
            F.expr(
                "transform(tok, t ->"
                " cast(conv(substring(md5(t), 1, 15), 16, 10) as bigint))"
            ).alias("th"),
        )
        .select(
            "doc_id",
            "n_tokens",
            F.explode(
                F.expr(
                    f"transform(sequence(1, n_tokens - {l} + 1),"
                    f" i -> struct(i AS pos,"
                    f" {horner[0]} * {_P2} + {horner[1]} AS h))"
                )
            ).alias("g"),
        )
        .select(
            "doc_id", "n_tokens", F.col("g.pos").alias("pos"),
            F.col("g.h").alias("h"),
        )
    )


def _gram_cte_sql(l: int) -> str:
    """The DuckDB replica of ``_grams`` as a `g` CTE body over a `toks`
    CTE of (doc_id, tok). Same math, different fold shape: DuckDB has
    no seeded fold, so the Horner result is written as the equivalent
    power-weighted sum sum_j (th[x+j-1] mod p) * b^(l-j) mod p — term
    < 2^60, 20-term sum < 2^35, exact either way."""
    ladders = []
    for b, p in ((_B1, _P1), (_B2, _P2)):
        pw = _pow_list(b, p, l)
        ladders.append(
            f"CAST(list_sum(list_transform(generate_series(1, {l}),"
            f" j -> ((th[x + j - 1] % {p}) * ({pw})[j]) % {p})) % {p}"
            f" AS BIGINT)"
        )
    return f"""
  SELECT doc_id, len(tok) AS n_tokens, x AS pos,
         {ladders[0]} * {_P2}
         + {ladders[1]} AS h
  FROM (SELECT doc_id, tok,
               list_transform(tok, t ->
                 CAST('0x' || substring(md5(t), 1, 15) AS BIGINT)) AS th
        FROM toks) t,
       UNNEST(generate_series(1, len(tok) - {l} + 1)) AS u(x)
  WHERE len(tok) >= {l}
"""


def merge_windows(dup_positions: DataFrame, l: int = _L) -> DataFrame:
    """Gaps-and-islands merge of duplicated L-windows into spans.
    Input: (doc_id, n_tokens, pos) start positions; output:
    (doc_id, n_tokens, span_start, span_end), 1-based inclusive. The
    window runs per doc over ONLY that doc's duplicated positions.

    Merge rule: windows that overlap OR touch (start gap <= L) fuse
    into one reported span. Overlap-merge alone yields exactly the
    maximal duplicated spans; the additional touching-merge also fuses
    two ADJACENT maximal spans into one report — identical token set
    cut either way, identical output cross-engine (the oracle merges
    the same way), but a reported span can cover two adjacent maximal
    duplicates rather than one."""
    from pyspark.sql import Window as W

    w = W.partitionBy("doc_id").orderBy("pos")
    # windows [pos, pos+L-1] all have equal width, so two sorted windows
    # overlap-or-touch exactly when the start gap is <= L
    brk = F.when(
        F.col("pos") - F.lag("pos").over(w) <= l, F.lit(0)
    ).otherwise(F.lit(1))
    isl = dup_positions.withColumn(
        "sid",
        F.sum(brk).over(w.rowsBetween(W.unboundedPreceding, W.currentRow)),
    )
    return isl.groupBy("doc_id", "sid").agg(
        F.max("n_tokens").alias("n_tokens"),
        F.min("pos").alias("span_start"),
        (F.max("pos") + l - 1).alias("span_end"),
    ).drop("sid")


def dup_spans(docs: DataFrame, l: int = _L, min_freq: int = 2) -> DataFrame:
    """Maximal duplicated spans per doc: (doc_id, n_tokens, span_start,
    span_end) in 1-based inclusive token indices.

    ``min_freq`` is the corpus-frequency floor for a window to count as
    duplicated: 2 (default) is the Lee et al. cut; 3+ restricts the cut
    to BOILERPLATE spans, leaving pairwise twins to document-level
    dedup (the CCNet recipe's division of labor, ``ccnet_q``).

    Frequency test: a count window PARTITIONed BY the gram hash, not a
    groupBy + join-back. The join form computes the GRAM PASS TWICE
    (once to count, once to probe — nothing caches the exploded gram
    frame, and the L multiply-adds per position are the dominant CPU),
    and its cheap-join-back leg rests on the filtered frequency table
    fitting a broadcast — untrue on boilerplate-heavy web corpora where
    duplicated grams number in the billions (AQE would fall back to a
    sort-merge join, shuffling the gram frame ANYWAY, on top of the
    second gram pass). The window form does one gram pass and one
    shuffle on the ~uniform 60-bit hash, unconditionally: measured at
    the 16x replica (1.28M docs-scale find stage) it is 1.3-2.1x faster
    here, and at 100 TB it is the only shape without a size assumption.
    A mega-hot gram (one hash with 10^9 occurrences) lands in ONE
    count-window key group — Spark's WindowExec buffers that group via
    a spillable row array, so it degrades to disk, not OOM; rows-per-
    gram is corpus-bounded boilerplate, the exact thing min_freq=3
    callers go on to cut."""
    g = _grams(docs, l)
    from pyspark.sql import Window as W

    dup = (
        g.withColumn("cnt", F.count("*").over(W.partitionBy("h")))
        .where(F.col("cnt") >= min_freq)
        .select("doc_id", "n_tokens", "pos")
    )
    return merge_windows(dup, l)


def _cut_frame(docs: DataFrame, l: int = _L, min_freq: int = 2) -> DataFrame:
    """(doc_id, <passthrough cols>, tok, clean_text): the find-and-cut
    pipeline over ONE cached token-array frame.

    The corpus is tokenized exactly once: the cached `tok` frame feeds
    BOTH the gram/frequency pass (find) and the span-removal filter
    (cut) — previously each pass re-read and re-split the full corpus,
    which made this the steepest 64x scaler (2.20x runtime per 4x rows,
    SCALE.md r11). The cache spills to disk at scale, exactly like the
    oracle's MATERIALIZED cut CTE; consumers needing token counts read
    `size(tok)` instead of re-splitting text."""
    tokd = _with_tokens(docs).cache()
    spans = dup_spans(tokd, l, min_freq).groupBy("doc_id").agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("spans")
    )
    return (
        tokd.join(spans, "doc_id", "left")
        .withColumn(
            "clean_text",
            F.expr(
                "array_join(transform(filter("
                " transform(sequence(1, size(tok)),"
                "   i -> struct(i AS i, element_at(tok, i) AS t)),"
                " s -> NOT exists(coalesce(spans, array()),"
                "   sp -> s.i >= sp.span_start AND s.i <= sp.span_end)),"
                " s -> s.t), ' ')"
            ),
        )
        .drop("spans")
    )


def cut_dup_spans(docs: DataFrame, l: int = _L, min_freq: int = 2) -> DataFrame:
    """(doc_id, text, clean_text): every duplicated-span token removed.
    One left join of docs against their collected span list (vast
    majority of docs have none), then a zero-shuffle array filter.
    Built on ``_cut_frame`` — one tokenization, cached, shared by the
    find and cut passes."""
    return _cut_frame(docs, l, min_freq).select("doc_id", "text", "clean_text")


def substr_cut_docs(spark: SparkSession, sf: str) -> DataFrame:
    """Hash-proof the CUT itself, not just its stats: per document,
    token counts before/after the cut and an md5 of the cleaned text —
    a value match proves both engines dropped EXACTLY the same token
    positions from every document (the planted-fixture pytest proves
    the positions are the right ones; this proves them cross-engine at
    corpus scale). n_tokens reads size(tok) off the shared cached token
    frame — no third split of the corpus."""
    cut = _cut_frame(load(spark, sf, "documents").select("doc_id", "text"))
    return (
        cut.select(
            "doc_id",
            F.size("tok").cast("long").alias("n_tokens"),
            F.when(F.col("clean_text") == "", 0)
            .otherwise(F.size(F.split("clean_text", " ")))
            .cast("long")
            .alias("n_clean_tokens"),
            F.md5("clean_text").alias("clean_md5"),
        )
        .orderBy("doc_id")
    )


CUT_DOCS_SQL = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS tok FROM documents
),
g AS ({_gram_cte_sql(_L)}),
freq AS (SELECT h FROM g GROUP BY h HAVING count(*) >= 2),
dup AS (SELECT doc_id, pos FROM g JOIN freq USING (h)),
isl AS (
  SELECT doc_id, pos,
         CASE WHEN pos - lag(pos) OVER w <= {_L} THEN 0 ELSE 1 END AS brk
  FROM dup WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
),
sid AS (
  SELECT doc_id, pos,
         sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS sid
  FROM isl
),
spans AS (
  SELECT doc_id, min(pos) AS s, max(pos) + {_L} - 1 AS e
  FROM sid GROUP BY doc_id, sid
),
doc_spans AS (
  SELECT doc_id, list({{'s': s, 'e': e}}) AS spans FROM spans GROUP BY doc_id
),
cut AS (
  SELECT t.doc_id, t.tok,
         -- array_to_string([]) is NULL in DuckDB (Spark's array_join
         -- gives ''): coalesce for the whole-document-cut case
         coalesce(array_to_string(
           list_transform(
             list_filter(
               list_transform(range(1, len(t.tok) + 1),
                              i -> {{'i': i, 't': t.tok[i]}}),
               x -> len(list_filter(coalesce(d.spans, []),
                        sp -> x.i >= sp.s AND x.i <= sp.e)) = 0),
             x -> x.t),
           ' '), '') AS clean_text
  FROM toks t LEFT JOIN doc_spans d USING (doc_id)
)
SELECT doc_id,
       CAST(len(tok) AS BIGINT) AS n_tokens,
       CAST(CASE WHEN clean_text = '' THEN 0
                 ELSE len(string_split(clean_text, ' ')) END AS BIGINT)
         AS n_clean_tokens,
       md5(clean_text) AS clean_md5
FROM cut
ORDER BY doc_id
"""


def dedup_exact_substring(spark: SparkSession, sf: str) -> DataFrame:
    """Per-document duplicated-span report over the raw documents table:
    every doc holding at least one verbatim >=L-token span that occurs
    2+ times in the corpus, with a digest of the exact span boundaries
    (proves the SPANS are identical cross-engine, not just their
    count)."""
    spans = dup_spans(load(spark, sf, "documents"))
    return (
        spans.groupBy("doc_id")
        .agg(
            F.max("n_tokens").cast("long").alias("n_tokens"),
            F.count("*").alias("n_dup_spans"),
            F.sum(
                F.col("span_end") - F.col("span_start") + 1
            ).alias("dup_tokens"),
            F.md5(
                F.concat_ws(
                    ",",
                    F.transform(
                        F.array_sort(
                            F.collect_list(
                                F.struct("span_start", "span_end")
                            )
                        ),
                        lambda s: F.concat_ws(
                            ":",
                            s["span_start"].cast("string"),
                            s["span_end"].cast("string"),
                        ),
                    ),
                )
            ).alias("span_digest"),
        )
        # dup ratio at 4dp via the exact integer half-step (tie example:
        # 21/32 -> 6562.5 — round() on the double is engine-dependent)
        .withColumn(
            "dup_ratio",
            F.expr(
                "(dup_tokens * 20000 + n_tokens) div (n_tokens * 2)"
                " / CAST(10000 AS DOUBLE)"
            ),
        )
        .select(
            "doc_id", "n_tokens", "n_dup_spans", "dup_tokens",
            "dup_ratio", "span_digest",
        )
        .orderBy("doc_id")
    )


SUBSTR_SQL = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS tok FROM documents
),
g AS ({_gram_cte_sql(_L)}),
freq AS (SELECT h FROM g GROUP BY h HAVING count(*) >= 2),
dup AS (SELECT doc_id, n_tokens, pos FROM g JOIN freq USING (h)),
isl AS (
  SELECT doc_id, n_tokens, pos,
         CASE WHEN pos - lag(pos) OVER w <= {_L} THEN 0 ELSE 1 END AS brk
  FROM dup WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
),
sid AS (
  SELECT doc_id, n_tokens, pos,
         sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS sid
  FROM isl
),
spans AS (
  SELECT doc_id, max(n_tokens) AS n_tokens,
         min(pos) AS span_start, max(pos) + {_L} - 1 AS span_end
  FROM sid GROUP BY doc_id, sid
)
SELECT doc_id,
       CAST(max(n_tokens) AS BIGINT) AS n_tokens,
       CAST(count(*) AS BIGINT) AS n_dup_spans,
       CAST(sum(span_end - span_start + 1) AS BIGINT) AS dup_tokens,
       (CAST(sum(span_end - span_start + 1) AS BIGINT) * 20000
        + max(n_tokens)) // (max(n_tokens) * 2) / 10000.0 AS dup_ratio,
       md5(array_to_string(
             list(CAST(span_start AS VARCHAR) || ':' ||
                  CAST(span_end AS VARCHAR)
                  ORDER BY span_start), ',')) AS span_digest
FROM spans
GROUP BY doc_id
ORDER BY doc_id
"""


def substr_cut_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Corpus-governance view of the cut: per source, how much text the
    exact-substring pass removes (docs flagged, tokens before/after,
    removal ratio). The numbers a data team watches when tuning L —
    too-low L cuts boilerplate AND legitimate common phrases.

    Scale shape: the span table (output of the banded-free frequency
    pass) joined back to documents on doc_id, one hash agg per source —
    both sides reading ONE cached tokenization of the corpus.
    """
    tokd = (
        load(spark, sf, "documents")
        .select("doc_id", "source", F.split("text", " ").alias("tok"))
        .cache()
    )
    docs = tokd.select("doc_id", "source", F.size("tok").alias("n_tokens"))
    per_doc = (
        dup_spans(tokd)
        .groupBy("doc_id")
        .agg(
            F.sum(
                F.col("span_end") - F.col("span_start") + 1
            ).alias("cut_tokens")
        )
    )
    return (
        docs.join(per_doc, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.count("cut_tokens").alias("n_flagged"),
            F.sum("n_tokens").cast("long").alias("tokens_before"),
            (
                F.sum("n_tokens") - F.sum(F.coalesce("cut_tokens", F.lit(0)))
            ).cast("long").alias("tokens_after"),
            # removal ratio at 4dp, integer half-step (ties: see
            # dedup_exact_substring)
            F.expr(
                "(sum(coalesce(cut_tokens, 0)) * 20000 + sum(n_tokens))"
                " div (sum(n_tokens) * 2) / CAST(10000 AS DOUBLE)"
            ).alias("cut_ratio"),
        )
        .orderBy("source")
    )


def _cut_stats_sql(doc_source: str) -> str:
    """The per-source cut-stats oracle over any (doc_id, source, text)
    source expression — `documents` for the raw-corpus query, a nested
    survivors subquery for the composed pipeline variant."""
    return f"""
WITH src AS ({doc_source}),
toks AS (
  SELECT doc_id, string_split(text, ' ') AS tok FROM src
),
g AS ({_gram_cte_sql(_L)}),
freq AS (SELECT h FROM g GROUP BY h HAVING count(*) >= 2),
dup AS (SELECT doc_id, n_tokens, pos FROM g JOIN freq USING (h)),
isl AS (
  SELECT doc_id, pos,
         CASE WHEN pos - lag(pos) OVER w <= {_L} THEN 0 ELSE 1 END AS brk
  FROM dup WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
),
sid AS (
  SELECT doc_id, pos,
         sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS sid
  FROM isl
),
spans AS (
  SELECT doc_id, min(pos) AS s, max(pos) + {_L} - 1 AS e
  FROM sid GROUP BY doc_id, sid
),
per_doc AS (
  SELECT doc_id, CAST(sum(e - s + 1) AS BIGINT) AS cut_tokens
  FROM spans GROUP BY doc_id
),
d AS (
  SELECT doc_id, source, len(string_split(text, ' ')) AS n_tokens
  FROM src
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(p.cut_tokens) AS BIGINT) AS n_flagged,
       CAST(sum(d.n_tokens) AS BIGINT) AS tokens_before,
       CAST(sum(d.n_tokens) - sum(coalesce(p.cut_tokens, 0)) AS BIGINT)
         AS tokens_after,
       (sum(coalesce(p.cut_tokens, 0))::HUGEINT * 20000 + sum(d.n_tokens))
         // (sum(d.n_tokens) * 2) / 10000.0 AS cut_ratio
FROM d LEFT JOIN per_doc p USING (doc_id)
GROUP BY source
ORDER BY source
"""


CUT_STATS_SQL = _cut_stats_sql("SELECT doc_id, source, text FROM documents")


# ---------------------------------------------------------------------------
# Composed full recipe: document-level dedup + quality filtering FIRST
# (pipeline_clean_corpus: minhash near-dup clusters -> keep-best +
# C4/repetition/quality filters), THEN the exact-substring pass over
# only the SURVIVORS — the Lee et al. 2022 ordering (doc dedup before
# substring dedup, so a near-dup cluster's shared text doesn't inflate
# the substring frequencies it left behind). One oracled query proves
# the whole chain end-to-end; both sides reuse their stage
# implementations verbatim, so a hash match is a proof of COMPOSITION,
# not a reimplementation.
def pipeline_dedup_then_cut(spark: SparkSession, sf: str) -> DataFrame:
    from .pipeline_q import pipeline_clean_corpus

    survivors = pipeline_clean_corpus(spark, sf).select("doc_id")
    tokd = (
        load(spark, sf, "documents")
        .join(survivors, "doc_id")
        .select("doc_id", "source", F.split("text", " ").alias("tok"))
        .cache()
    )
    per_doc = (
        dup_spans(tokd)
        .groupBy("doc_id")
        .agg(
            F.sum(
                F.col("span_end") - F.col("span_start") + 1
            ).alias("cut_tokens")
        )
    )
    docs = tokd.select("doc_id", "source", F.size("tok").alias("n_tokens"))
    return (
        docs.join(per_doc, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.count("cut_tokens").alias("n_flagged"),
            F.sum("n_tokens").cast("long").alias("tokens_before"),
            (
                F.sum("n_tokens") - F.sum(F.coalesce("cut_tokens", F.lit(0)))
            ).cast("long").alias("tokens_after"),
            F.expr(
                "(sum(coalesce(cut_tokens, 0)) * 20000 + sum(n_tokens))"
                " div (sum(n_tokens) * 2) / CAST(10000 AS DOUBLE)"
            ).alias("cut_ratio"),
        )
        .orderBy("source")
    )


def _pipeline_cut_sql() -> str:
    from .pipeline_q import _clean_corpus_sql

    return _cut_stats_sql(
        "SELECT d.doc_id, d.source, d.text FROM documents d"
        f" JOIN (SELECT doc_id FROM ({_clean_corpus_sql()}) c) k"
        " USING (doc_id)"
    )


# ---------------------------------------------------------------------------
# Winnowing fingerprint selection (Schleimer et al. 2003, the MOSS
# algorithm) — the SAMPLED-anchor scale path for substring dedup: when
# even one 8-byte row per token position is too much (the exact
# pipeline above), winnowing keeps only each w-window's minimum k-gram
# hash, cutting the index ~w/2-fold while GUARANTEEING that any two
# occurrences of a shared substring of length >= w + k - 1 (= _L here)
# still share at least one selected fingerprint. This query reports
# the per-doc selection (density + digest); the guarantee itself is
# pytest-proven against dup_spans on the planted fixture.
#
# Cross-engine determinism: per-window argmin with leftmost tie-break,
# encoded as ONE integer min — (40-bit hash) * 2^20 + position — so
# both engines agree bit-for-bit with no struct-min semantics needed.
# Scale shape: one gram pass, one per-doc window (frame of w rows), one
# distinct — all partitioned by doc, never corpus-wide.
_WK = 8                  # winnowing k-gram width
_WW = _L - _WK + 1       # window size w: guarantee threshold == _L
_POS_BITS = 1 << 20      # positions per doc bound (1M tokens)


def winnow_anchors(docs: DataFrame, k: int = _WK, w: int = _WW) -> DataFrame:
    """(doc_id, pos, h): the winnowed fingerprint positions per doc."""
    from pyspark.sql import Window as W

    g = _grams(docs, k).select(
        "doc_id",
        "n_tokens",
        "pos",
        (F.pmod(F.col("h"), F.lit(1 << 40)) * _POS_BITS + F.col("pos")).alias(
            "hp"
        ),
    )
    win = W.partitionBy("doc_id").orderBy("pos").rowsBetween(0, w - 1)
    sel = (
        g.withColumn("sel_hp", F.min("hp").over(win))
        # only FULL windows define selections: the last w-1 start
        # positions see a truncated frame
        .withColumn(
            "n_windows", (F.col("n_tokens") - k + 1 - w + 1).cast("long")
        )
        .where(F.col("pos") <= F.col("n_windows"))
        .select("doc_id", "n_tokens", "sel_hp")
        .distinct()
    )
    return sel.select(
        "doc_id",
        "n_tokens",
        (F.col("sel_hp") % _POS_BITS).cast("int").alias("pos"),
        # integer div, NOT /: sel_hp reaches 2^60, past double's 2^53
        # exact range, so a float division could floor off-by-one
        F.expr(f"sel_hp div {_POS_BITS}").alias("h"),
    )


def substr_winnow_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Per-doc winnowing report: gram count, selected-anchor count,
    selection density (4dp, integer half-step), and a digest of the
    selected positions — proves the SELECTION is identical
    cross-engine, not just its size."""
    anchors = winnow_anchors(load(spark, sf, "documents"))
    return (
        anchors.groupBy("doc_id")
        .agg(
            F.max("n_tokens").cast("long").alias("n_tokens"),
            F.count("*").alias("n_anchors"),
            F.md5(
                F.concat_ws(
                    ",",
                    F.transform(
                        F.array_sort(F.collect_list("pos")),
                        lambda p: p.cast("string"),
                    ),
                )
            ).alias("anchor_digest"),
        )
        .withColumn(
            "n_grams", (F.col("n_tokens") - _WK + 1).cast("long")
        )
        .withColumn(
            "density",
            F.expr(
                "(n_anchors * 20000 + n_grams) div (n_grams * 2)"
                " / CAST(10000 AS DOUBLE)"
            ),
        )
        .select(
            "doc_id", "n_tokens", "n_grams", "n_anchors", "density",
            "anchor_digest",
        )
        .orderBy("doc_id")
    )


WINNOW_SQL = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS tok FROM documents
),
g0 AS ({_gram_cte_sql(_WK)}),
g AS (
  SELECT doc_id, n_tokens, pos,
         (h % {1 << 40}) * {_POS_BITS} + pos AS hp
  FROM g0
),
sel AS (
  SELECT DISTINCT doc_id, n_tokens, sel_hp FROM (
    SELECT doc_id, n_tokens, pos,
           min(hp) OVER (PARTITION BY doc_id ORDER BY pos
                         ROWS BETWEEN CURRENT ROW AND {_WW - 1} FOLLOWING)
             AS sel_hp
    FROM g
  )
  WHERE pos <= n_tokens - {_WK} + 1 - {_WW} + 1
),
a AS (
  SELECT doc_id, n_tokens,
         CAST(sel_hp % {_POS_BITS} AS INT) AS pos
  FROM sel
)
SELECT doc_id,
       CAST(max(n_tokens) AS BIGINT) AS n_tokens,
       CAST(max(n_tokens) - {_WK} + 1 AS BIGINT) AS n_grams,
       CAST(count(*) AS BIGINT) AS n_anchors,
       (count(*) * 20000 + (max(n_tokens) - {_WK} + 1))
         // ((max(n_tokens) - {_WK} + 1) * 2) / 10000.0 AS density,
       md5(array_to_string(list(CAST(pos AS VARCHAR) ORDER BY pos), ','))
         AS anchor_digest
FROM a
GROUP BY doc_id
ORDER BY doc_id
"""


QUERIES = {
    "dedup_exact_substring": QuerySpec(dedup_exact_substring, SUBSTR_SQL),
    "substr_cut_docs": QuerySpec(substr_cut_docs, CUT_DOCS_SQL),
    "substr_cut_stats": QuerySpec(substr_cut_stats, CUT_STATS_SQL),
    "pipeline_dedup_then_cut": QuerySpec(
        pipeline_dedup_then_cut, _pipeline_cut_sql()
    ),
    "substr_winnow_stats": QuerySpec(substr_winnow_stats, WINNOW_SQL),
}
