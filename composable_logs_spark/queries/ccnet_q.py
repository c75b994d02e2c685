"""The CCNet-style full corpus recipe (Wenzek et al. 2020, "CCNet:
Extracting High Quality Monolingual Datasets from Web Crawl Data",
with the Lee et al. 2022 exact-substring cut as the dedup stage and
GPT-3-style decontamination): SIX stages, each reusing its standalone
implementation VERBATIM, gated as one query whose value hash proves
the end-to-end composition (the ``pipeline_dedup_then_cut`` device).

CCNet's actual order puts DEDUP FIRST (paragraph-hash dedup before
LID and LM filtering — Wenzek et al. §3), and that order is what makes
every stage here demonstrably active on this corpus: run the other way
(doc dedup before the substring cut) the near-dup keeper removes every
span-sharing document and the cut stage provably no-ops at all three
scale factors — verified while building this query.

    1. boilerplate cut     — ``substr_q.cut_dup_spans`` over the RAW
                             corpus with min_freq = 3 (the paragraph-
                             dedup stand-in; every later stage sees CUT
                             text). The frequency floor is the division
                             of labor: spans repeated 3+ times are
                             template chrome and get cut here; PAIRWISE
                             verbatim twins are deliberately left for
                             the document-level near-dup stage (4) —
                             with the Lee et al. freq>=2 cut, stage 1
                             hollows out every twin, quality then drops
                             both, and stage 4 provably no-ops
                             (verified at all three scale factors
                             while building this query)
    2. language ID         — ``text_ops.lang_scores`` on cut text;
                             keep marker score >= 2 (the LID-confidence
                             floor; CCNet drops low-confidence pages)
    3. quality             — rules (``text_ops.quality_stats`` keep
                             flag) AND the trigram stupid-backoff LM
                             (``trigram_q.trigram_doc_scores``, reused
                             verbatim, trained on the cut corpus) above
                             the per-language head+middle tercile
                             boundary (CCNet's KenLM-perplexity
                             bucketing, Wenzek et al. §4.4). The
                             boundary is DATA-DERIVED per the
                             ``perplexity_q`` rank-cut device — the
                             score at rank max(2n div 3, 1) by
                             score_micro desc within each language;
                             keep score_micro >= that boundary (ties AT
                             the boundary score are kept, so no
                             doc-grain tie-break ordering exists in
                             either engine). Earlier rounds used a
                             fixed constant on the add-1 bigram scale;
                             the self-trained trigram scale shifts with
                             corpus size (more trigram types => lower
                             conditionals), so a constant cannot stay
                             active across SFs — the rank-cut is both
                             more faithful to CCNet and SF-robust
    4. doc-level dedup     — ``pipeline_q.neardup_keepers`` (minhash
                             pairs -> components -> keep longest); the
                             pair oracle runs over exactly the same
                             survivor frame via the ``_minhash_sql``
                             corpus override
    5. decontamination     — drop survivors sharing any word 8-gram
                             (``pipeline_q._ngram_hashes``) with the
                             raw benchmark slice (doc_id < 20)
    6. target mixture      — per-language quotas realising
                             ``mix_q._MIX_TARGET`` over the final pool,
                             with the DoReMi integer-quota device
                             (quota_k = min_j((n_j*w_k) div w_j); the
                             shares are /100 rationals so w is exact
                             int) and content-hash draw order

Output: one row per language with the cut stage's token removal, every
later stage's survivor count, and a digest of exactly WHICH docs the
final mixture samples — a hash match is a proof of the six-stage
COMPOSITION, not of any one stage.

The reference's pipeline surface is span-DAG orchestration
(wrappers.py run_dag); this is north-star corpus scope.

100 TB design: union of its parts, each documented at its definition —
the gram frequency pass (stage 1), per-doc narrow maps (stage 2 and the
stage-3 rules), the trigram LM's hash-agg count tables + equi-joins
with a histogram-grain rank cut (stage 3's gate, see
``_lm_tercile_keepers``), banded LSH + sparse components (stage 4), a
broadcast benchmark join (stage 5: benchmarks are KBs against a TB
corpus), and one window per language (stage 6). No stage introduces a
new shuffle class. Oracle
note: the reused CTEs are MATERIALIZED — DuckDB otherwise inlines each
reference, re-evaluating the whole upstream chain once per consumer
(measured 30x on this 6-stage chain).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from . import QuerySpec, load
from .mix_q import _MIX_TARGET

_LID_MIN_SCORE = 2
_BENCH_DOCS = 20
_BOILER_FREQ = 3  # stage-1 span-frequency floor (see docstring)
# r14: submit the three independent stage-2/3 gate materializations
# from a driver thread pool (guide §2.6) — results identical either
# way; the flag exists so the A/B stays measurable in one session
_OVERLAP_GATES = True


def _lm_tercile_keepers(cutd: DataFrame) -> DataFrame:
    """Stage-3 LM gate: doc_ids in the head+middle terciles of the
    self-trained trigram stupid-backoff score, per language.

    Scale shape (the ``perplexity_q`` two-pass rank-cut): the only
    doc-grain step is the trigram scoring itself; the cumulative window
    runs over per-(lang, score_micro) HISTOGRAM rows, and the boundary
    frame (one row per language) comes back as a broadcast join. No
    doc-grain sort or row_number anywhere."""
    from pyspark.sql import Window

    from .trigram_q import _with_arr, self_trained_doc_scores

    # r12: tokenize the cut text ONCE into a pinned (doc_id, arr) frame
    # shared by all four LM passes (train trigram/bigram/unigram tables
    # + the scored stream) — previously each pass re-split/lowered the
    # whole cut corpus even though cutd itself was pinned.
    # r13: eager localCheckpoint instead of cache (guide §3.3/§5): a
    # cache dedupes EXECUTION but every consumer still re-analyzes and
    # re-plans the full upstream tree — with the trigram-LM lineage
    # nested under each of the four passes, driver-side planning
    # dominated the recipe's build wall (measured 282 s of build at
    # sf0.1). The checkpoint truncates the logical plan to the
    # materialized result, same rows, computed once per invocation
    # (nothing persists across runs).
    arr = _with_arr(cutd.select("doc_id", "text")).localCheckpoint(eager=True)
    # one row per scored doc; two consumers (histogram + keep filter),
    # so pin it — without it the full trigram-LM pipeline would
    # execute twice (the perplexity_q/dedup_q cache discipline)
    # r14: self_trained_doc_scores — train == scored here, so the
    # specialized scorer (one trigram explode, type-grain join, no
    # backoff tables) is bit-identical to trigram_doc_scores(arr, arr);
    # see its docstring + tests/test_trigram_lm.py parity lock
    lm_lang = (
        self_trained_doc_scores(arr)
        .select("doc_id", F.expr("lp_sum_micro div n_trigrams").alias("score_micro"))
        .join(cutd.select("doc_id", "lang"), "doc_id")
        .localCheckpoint(eager=True)
    )
    hist = lm_lang.groupBy("lang", "score_micro").agg(F.count("*").alias("c"))
    w = Window.partitionBy("lang").orderBy(F.desc("score_micro"))
    cum = hist.withColumn("cum_end", F.sum("c").over(w)).withColumn(
        "cum_start", F.col("cum_end") - F.col("c")
    )
    n = hist.groupBy("lang").agg(F.sum("c").alias("n_lang"))
    # boundary = score at rank k (by score desc), k = max(2n div 3, 1):
    # the worst head+middle score; max(..,1) keeps at least the best
    # doc of a tiny language alive
    floor = (
        cum.join(F.broadcast(n), "lang")
        .withColumn("k", F.greatest(F.expr("(2 * n_lang) div 3"), F.lit(1)))
        .where((F.col("cum_start") < F.col("k")) & (F.col("k") <= F.col("cum_end")))
        .select("lang", F.col("score_micro").alias("s_star"))
    )
    return (
        lm_lang.join(F.broadcast(floor), "lang")
        .where(F.col("score_micro") >= F.col("s_star"))
        .select("doc_id")
    )


def pipeline_ccnet_recipe(spark: SparkSession, sf: str) -> DataFrame:
    from .pipeline_q import _ngram_hashes, neardup_keepers
    from .substr_q import _cut_frame
    from .text_ops import lang_scores, quality_stats

    d = load(spark, sf, "documents")

    # 1: boilerplate cut over the raw corpus; every later stage reads
    # the cut text. _cut_frame tokenizes the corpus ONCE into a cached
    # token frame shared by the find and cut passes (r12: previously the
    # raw text was split a third time here just for n_raw_tokens).
    cut = _cut_frame(d.select("doc_id", "text"), min_freq=_BOILER_FREQ)
    # cache: the Spark-side MATERIALIZE discipline (the oracle's CTEs
    # are MATERIALIZED for the same reason). cutd feeds LID, quality,
    # the trigram model AND its scored stream, the s2..s5 semi-join
    # chain, and cut_stats — uncached, Catalyst re-executes the whole
    # substring-cut per consumer (measured 256 s -> ~60 s at sf0.1).
    # Doc-grain rows; persists spill to disk at scale, exactly like the
    # oracle's materialization. Pinned because the returned plan is lazy
    # (dedup_q.py:255 discipline).
    # Explicit full width BEFORE the cache (r12, found by the 16x stage
    # profile): cutd's lineage ends in the cut-span shuffle, whose BYTES
    # are tiny (spans are narrow), so AQE coalesces it to ~3 partitions
    # — and every consumer below is a CPU-bound per-doc pass (LID
    # regexes, quality stats, trigram tokenize+score, minhash, n-gram
    # hashes) that then ran 3-wide on a 32-core box (measured: the
    # recipe's 16x stages crawled as (31+1)/32 stragglers; lang_scores
    # alone took 18.5 s). AQE sizes partitions by shuffle bytes; a
    # cached frame whose downstream cost is per-row CPU over text needs
    # width set by its CONSUMERS. One repartition of the cut text, paid
    # once, feeds all six consumers; on a real cluster defaultParallelism
    # is total executor cores, which is exactly the width a
    # full-scan-everything consumer set wants.
    cutd = (
        cut.select(
            "doc_id",
            F.size("tok").cast("long").alias("n_raw_tokens"),
            F.when(F.col("clean_text") == "", 0)
            .otherwise(F.size(F.split("clean_text", " ")))
            .cast("long")
            .alias("n_cut_tokens"),
            F.col("clean_text").alias("text"),
        )
        .join(d.select("doc_id", "lang"), "doc_id")
        .repartition(spark.sparkContext.defaultParallelism)
        # r13: localCheckpoint, not cache — ~10 downstream consumers
        # each re-analyzed/re-planned the whole substring-cut lineage
        # (see the _lm_tercile_keepers note); the checkpoint keeps the
        # repartition width and cuts the plan at the materialized rows
        .localCheckpoint(eager=True)
    )

    # 2-3: per-doc filters on the cut text, composed by doc_id
    # semi-joins (each predicate evaluated once — the
    # pipeline_clean_corpus discipline).
    # r14 (guide §2.6): the three gates are INDEPENDENT given cutd (a
    # pinned checkpoint), so their materializations are submitted from
    # a small driver thread pool — the LID regex pass and the quality
    # rules back-fill executors while the trigram-LM chain (the long
    # pole) runs, instead of queueing serially behind it. Each thread
    # produces a pinned doc_id frame; the s3 composition below then
    # joins materialized lists, so results are unchanged.
    from concurrent.futures import ThreadPoolExecutor

    def _lid():
        spark.sparkContext.setJobDescription("ccnet: stage-2 LID gate")
        return (
            lang_scores(cutd)
            .where(F.col("score") >= _LID_MIN_SCORE)
            .select("doc_id")
            .localCheckpoint(eager=True)
        )

    def _qual():
        spark.sparkContext.setJobDescription("ccnet: stage-3 quality rules")
        return (
            quality_stats(cutd)
            .where("passes_quality")
            .select("doc_id")
            .localCheckpoint(eager=True)
        )

    def _lm():
        spark.sparkContext.setJobDescription("ccnet: stage-3 LM tercile gate")
        return _lm_tercile_keepers(cutd)

    if _OVERLAP_GATES:
        with ThreadPoolExecutor(max_workers=3) as pool:
            f_lid, f_qual, f_lm = pool.submit(_lid), pool.submit(_qual), pool.submit(_lm)
            lid, qual, lm = f_lid.result(), f_qual.result(), f_lm.result()
    else:
        lid, qual, lm = _lid(), _qual(), _lm()
    spark.sparkContext.setJobDescription(None)
    s2 = cutd.join(lid, "doc_id", "semi")
    # s3 feeds the near-dup keeper AND the s4/s5 chain AND the
    # per-stage counts; s5 feeds counts, the ranked draw, and the
    # decontamination hits — cache both survivor frames (same
    # MATERIALIZE discipline as cutd)
    s3 = (
        s2.join(qual, "doc_id", "semi")
        .join(lm, "doc_id", "semi")
        .localCheckpoint(eager=True)  # r13: plan truncation, see cutd
    )

    # 4: near-dup dedup over the stage-3 survivors (n_chars of the cut
    # text as the keep-longest key, computed identically in the oracle)
    keep4 = neardup_keepers(
        s3.select("doc_id", "text", F.length("text").alias("n_chars"))
    )
    s4 = s3.join(keep4, "doc_id", "semi")

    # 5: decontaminate the survivors' cut text against the raw benchmark
    bench_grams = (
        d.where(F.col("doc_id") < _BENCH_DOCS)
        .select(F.explode(_ngram_hashes(F.col("text"))).alias("g"))
        .distinct()
    )
    hits = (
        s4.select("doc_id", F.explode(_ngram_hashes(F.col("text"))).alias("g"))
        .join(F.broadcast(bench_grams), "g")
        .select("doc_id")
        .distinct()
    )
    s5 = s4.join(hits, "doc_id", "anti").localCheckpoint(eager=True)

    # 6: realise the target language mixture over the final pool with
    # exact-integer quotas (shares are /100 rationals)
    share = F.coalesce(
        *[F.when(F.col("lang") == k, F.lit(int(v * 100))) for k, v in _MIX_TARGET.items()]
    )
    counts = s5.groupBy("lang").agg(
        F.count("*").alias("n_final")
    ).withColumn("w_int", share)
    other = F.broadcast(
        counts.select(F.col("n_final").alias("n_j"), F.col("w_int").alias("w_j"))
    )
    quota = (
        counts.crossJoin(other)
        .groupBy("lang", "n_final", "w_int")
        .agg(F.min(F.expr("(n_j * w_int) div w_j")).cast("long").alias("n_quota"))
    )
    ranked = s5.withColumn(
        "rn",
        F.row_number().over(
            W.partitionBy("lang").orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id")
        ),
    )
    sampled = (
        ranked.join(F.broadcast(quota.select("lang", "n_quota")), "lang")
        .where(F.col("rn") <= F.col("n_quota"))
        .groupBy("lang")
        .agg(
            F.count("*").cast("long").alias("n_sampled"),
            F.md5(
                F.concat_ws(
                    ",",
                    F.transform(
                        F.array_sort(F.collect_list("doc_id")),
                        lambda v: v.cast("string"),
                    ),
                )
            ).alias("sampled_digest"),
        )
    )

    # per-language report: cut-stage token removal over the whole
    # corpus, then each stage's survivor count
    cut_stats = cutd.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_input"),
        F.sum("n_raw_tokens").cast("long").alias("tokens_before"),
        F.sum("n_cut_tokens").cast("long").alias("tokens_after"),
    )

    def _by_lang(frame: DataFrame, name: str) -> DataFrame:
        return (
            frame.select("doc_id")
            .join(d.select("doc_id", "lang"), "doc_id")
            .groupBy("lang")
            .agg(F.count("*").cast("long").alias(name))
        )

    return (
        cut_stats.join(_by_lang(s2, "n_lid"), "lang")
        .join(_by_lang(s3, "n_quality"), "lang")
        .join(_by_lang(s4, "n_dedup"), "lang")
        .join(quota.select("lang", F.col("n_final").cast("long").alias("n_final")), "lang")
        .join(sampled, "lang")
        .select(
            "lang", "n_input", "tokens_before", "tokens_after",
            "n_lid", "n_quality", "n_dedup", "n_final",
            "n_sampled", "sampled_digest",
        )
        .orderBy("lang")
    )


def _ccnet_sql() -> str:
    from .dedup_q import _minhash_sql
    from .pipeline_q import _NGRAM_SQL_EXPR
    from .substr_q import _L, _gram_cte_sql
    from .text_ops import _lang_sql, _quality_sql
    from .trigram_q import trigram_sums_sql_over

    share_case = "CASE lang " + " ".join(
        f"WHEN '{k}' THEN {int(v * 100)}" for k, v in _MIX_TARGET.items()
    ) + " END"
    return f"""
WITH RECURSIVE
toks AS (SELECT doc_id, string_split(text, ' ') AS tok FROM documents),
g AS ({_gram_cte_sql(_L)}),
freq AS (SELECT h FROM g GROUP BY h HAVING count(*) >= {_BOILER_FREQ}),
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
cut AS MATERIALIZED (
  SELECT t.doc_id, len(t.tok) AS n_raw_tokens,
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
),
cutdocs AS MATERIALIZED (
  SELECT c.doc_id,
         CAST(c.n_raw_tokens AS BIGINT) AS n_raw_tokens,
         CAST(CASE WHEN c.clean_text = '' THEN 0
                   ELSE len(string_split(c.clean_text, ' ')) END AS BIGINT)
           AS n_cut_tokens,
         c.clean_text AS text,
         d.lang
  FROM cut c JOIN documents d USING (doc_id)
),
lid AS MATERIALIZED (
  SELECT doc_id FROM ({_lang_sql("cutdocs")}) x WHERE score >= {_LID_MIN_SCORE}
),
qkeep AS MATERIALIZED (
  SELECT doc_id FROM ({_quality_sql("cutdocs")}) y WHERE passes_quality
),
lm_lang AS MATERIALIZED (
  SELECT s.doc_id, c.lang, s.lp_sum_micro // s.n_trigrams AS score_micro
  FROM ({trigram_sums_sql_over("cutdocs", "cutdocs")}) s
  JOIN cutdocs c USING (doc_id)
),
lm_rank AS (
  SELECT lang, score_micro,
         row_number() OVER (PARTITION BY lang ORDER BY score_micro DESC) AS rn,
         count(*) OVER (PARTITION BY lang) AS n_lang
  FROM lm_lang
),
lm_floor AS (
  -- the score at rank max(2n div 3, 1): ties share a score value, so
  -- any row_number tie order yields the same boundary score
  SELECT lang, score_micro AS s_star
  FROM lm_rank WHERE rn = greatest((2 * n_lang) // 3, 1)
),
lm AS MATERIALIZED (
  SELECT l.doc_id FROM lm_lang l
  JOIN lm_floor f ON f.lang = l.lang AND l.score_micro >= f.s_star
),
s2 AS MATERIALIZED (SELECT c.* FROM cutdocs c JOIN lid USING (doc_id)),
s3 AS MATERIALIZED (
  SELECT s.* FROM s2 s JOIN qkeep USING (doc_id) JOIN lm USING (doc_id)
),
pairs AS MATERIALIZED (
  SELECT doc_a, doc_b
  FROM ({_minhash_sql("SELECT doc_id, text FROM s3")}) mh_pairs
),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION
  SELECT doc_b AS src, doc_a AS dst FROM pairs
),
reach(id, anc) AS (
  SELECT doc_id, doc_id FROM s3
  UNION
  SELECT e.dst AS id, r.anc FROM reach r JOIN edges e ON e.src = r.id
),
comp AS (SELECT id AS doc_id, min(anc) AS cluster_id FROM reach GROUP BY id),
keep4 AS (
  SELECT doc_id FROM (
    SELECT c.doc_id,
           row_number() OVER (PARTITION BY c.cluster_id
                              ORDER BY length(s.text) DESC, c.doc_id) AS rn
    FROM comp c JOIN s3 s USING (doc_id)
  ) WHERE rn = 1
),
s4 AS MATERIALIZED (SELECT s.* FROM s3 s JOIN keep4 USING (doc_id)),
bench AS (
  SELECT DISTINCT unnest({_NGRAM_SQL_EXPR}) AS bg
  FROM documents WHERE doc_id < {_BENCH_DOCS}
),
cg AS (SELECT doc_id, unnest({_NGRAM_SQL_EXPR}) AS bg FROM s4),
hits AS (SELECT DISTINCT cg.doc_id FROM cg JOIN bench USING (bg)),
s5 AS MATERIALIZED (
  SELECT * FROM s4 WHERE doc_id NOT IN (SELECT doc_id FROM hits)
),
counts AS (
  SELECT lang, count(*) AS n_final, {share_case} AS w_int
  FROM s5 GROUP BY lang
),
quota AS (
  SELECT a.lang, a.n_final,
         CAST(min((b.n_final * a.w_int) // b.w_int) AS BIGINT) AS n_quota
  FROM counts a CROSS JOIN counts b
  GROUP BY a.lang, a.n_final, a.w_int
),
ranked AS (
  SELECT lang, doc_id,
         row_number() OVER (PARTITION BY lang
                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
  FROM s5
),
sampled AS (
  SELECT r.lang,
         CAST(count(*) AS BIGINT) AS n_sampled,
         md5(array_to_string(
               list(CAST(r.doc_id AS VARCHAR) ORDER BY r.doc_id), ','))
           AS sampled_digest
  FROM ranked r JOIN quota q USING (lang)
  WHERE r.rn <= q.n_quota
  GROUP BY r.lang
),
cutstats AS (
  SELECT lang,
         CAST(count(*) AS BIGINT) AS n_input,
         CAST(sum(n_raw_tokens) AS BIGINT) AS tokens_before,
         CAST(sum(n_cut_tokens) AS BIGINT) AS tokens_after
  FROM cutdocs GROUP BY lang
),
s2c AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_lid FROM s2 GROUP BY lang),
s3c AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_quality FROM s3 GROUP BY lang),
s4c AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_dedup FROM s4 GROUP BY lang)
SELECT cs.lang, cs.n_input, cs.tokens_before, cs.tokens_after,
       s2c.n_lid, s3c.n_quality, s4c.n_dedup,
       CAST(q.n_final AS BIGINT) AS n_final,
       s.n_sampled, s.sampled_digest
FROM cutstats cs
JOIN s2c USING (lang)
JOIN s3c USING (lang)
JOIN s4c USING (lang)
JOIN quota q ON q.lang = cs.lang
JOIN sampled s ON s.lang = cs.lang
ORDER BY cs.lang
"""


QUERIES = {
    "pipeline_ccnet_recipe": QuerySpec(pipeline_ccnet_recipe, _ccnet_sql()),
}
