"""Incremental exact-substring dedup (streaming/incremental_substr):
new docs matched against a persisted WINNOWED anchor index with exact
candidate-verify, batch==stream span agreement, growing-index
semantics, anchor-density bound, and at-least-once replay idempotence.
"""

from composable_logs_spark.queries.substr_q import _L, _WW, _grams, dup_spans
from composable_logs_spark.streaming.incremental_substr import (
    batch_dup_spans_against_index,
    build_anchor_index,
    init_substr_state,
    make_fold,
    stream_substr_against_index,
)


def _span_set(rows):
    out = {}
    for r in rows:
        out.setdefault(r["doc_id"], set()).add(
            (r["span_start"], r["span_end"])
        )
    return out


def _corpus(spark):
    shared = " ".join(f"sa{i}" for i in range(30))
    uniq = lambda tag, n: " ".join(f"{tag}{i}" for i in range(n))  # noqa: E731
    return spark.createDataFrame(
        [
            (0, uniq("c0_", 8) + " " + shared),
            (1, uniq("c1_", 40)),
        ],
        "doc_id long, text string",
    ), shared


def _empty(spark):
    return spark.createDataFrame([], "doc_id long, text string")


def test_new_doc_matches_corpus_spans_exactly(spark):
    """Despite the anchor index holding only ~2/(w+1) of gram
    positions, the two-phase probe (anchor prune -> exact L-gram
    verify on candidate docs) reports EXACTLY the batch operator's
    spans."""
    corpus, shared = _corpus(spark)
    index = build_anchor_index(corpus).cache()
    new = spark.createDataFrame(
        [
            (10, shared + " nx ny nz"),  # dup vs corpus
            (11, "totally unique words only here "
                 + " ".join(f"u{i}" for i in range(30))),
        ],
        "doc_id long, text string",
    )
    got = _span_set(
        batch_dup_spans_against_index(new, index, corpus).collect()
    )
    assert 10 in got and 11 not in got
    ((s, e),) = got[10]
    assert s == 1 and e == 30  # the whole shared run, exactly

    # agreement with the batch operator on the cumulative corpus,
    # restricted to the new doc (directionality: only new docs flagged)
    full = _span_set(dup_spans(corpus.unionByName(new)).collect())
    assert got[10] == full[10]


def test_anchor_index_density_bound(spark):
    """The index must actually be the sampled path: anchor rows well
    under full k-gram density — the point of winnowing (~2/(w+1)),
    with the hard bound n_windows (one anchor per window)."""
    corpus, _ = _corpus(spark)
    big = spark.createDataFrame(
        [(i, " ".join(f"d{i}_{j}" for j in range(200))) for i in range(5)],
        "doc_id long, text string",
    )
    n_anchors = build_anchor_index(big).count()
    n_grams = _grams(big, 8).count()
    assert n_anchors < n_grams / 3  # well under full density
    assert n_anchors >= 5  # and not degenerate


def test_within_batch_duplicates_caught(spark):
    """Two docs arriving in the SAME batch sharing a span: flagged even
    though the index has never seen either."""
    shared = " ".join(f"wb{i}" for i in range(25))
    batch = spark.createDataFrame(
        [(20, shared + " tail0 tail1"), (21, "head0 head1 " + shared)],
        "doc_id long, text string",
    )
    got = _span_set(
        batch_dup_spans_against_index(
            batch, build_anchor_index(_empty(spark)), _empty(spark)
        ).collect()
    )
    assert set(got) == {20, 21}
    assert got[20] == {(1, 25)} and got[21] == {(3, 27)}


def test_streaming_growing_index(spark, tmp_path):
    """Batch 2's doc must match batch 1's doc through the GROWN index
    (stream-internal duplication across micro-batches)."""
    corpus, shared = _corpus(spark)
    corpus_dir = str(tmp_path / "corpus")
    index_dir = str(tmp_path / "gidx")
    init_substr_state(corpus, corpus_dir, index_dir)

    docs_dir = str(tmp_path / "docs")
    b1 = " ".join(f"s1_{i}" for i in range(28))  # unique vs corpus
    spark.createDataFrame(
        [(30, b1 + " x0 x1")], "doc_id long, text string"
    ).coalesce(1).write.mode("append").parquet(docs_dir)

    out_dir = str(tmp_path / "spans_out")
    q = stream_substr_against_index(
        spark, docs_dir, corpus_dir, index_dir, out_dir,
        str(tmp_path / "ckpt"),
    )
    try:
        q.processAllAvailable()
        # batch 2: repeats batch 1's run AND the original corpus run
        spark.createDataFrame(
            [(31, b1 + " " + shared)], "doc_id long, text string"
        ).coalesce(1).write.mode("append").parquet(docs_dir)
        q.processAllAvailable()
    finally:
        q.stop()

    got = _span_set(spark.read.parquet(out_dir).collect())
    # doc 30 matched nothing at arrival time (directional)
    assert 30 not in got
    # doc 31: one span covering b1 (via grown index) and one covering
    # shared (via corpus index) — b1 is 28 tokens at pos 1..28, shared
    # 30 tokens at pos 29..58; they touch, so the merge may produce one
    # span 1..58 — both token runs must be covered either way
    covered = set()
    for s, e in got[31]:
        covered.update(range(s, e + 1))
    assert set(range(1, 29)) <= covered      # b1 via grown index
    assert set(range(29, 59)) <= covered     # shared via corpus index


def test_replay_is_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: re-running a batch (same
    batch_id) must neither duplicate output rows nor let the batch
    match ITSELF through the state its first attempt persisted."""
    corpus, shared = _corpus(spark)
    corpus_dir = str(tmp_path / "corpus")
    index_dir = str(tmp_path / "gidx")
    out_dir = str(tmp_path / "spans_out")
    init_substr_state(corpus, corpus_dir, index_dir)
    fold = make_fold(spark, corpus_dir, index_dir, out_dir)

    batch = spark.createDataFrame(
        [
            (50, shared + " r0 r1"),  # dup vs corpus
            (51, " ".join(f"rp{i}" for i in range(40))),  # unique
        ],
        "doc_id long, text string",
    )
    fold(batch, 0)
    first = _span_set(spark.read.parquet(out_dir).collect())
    # crash-after-write, replay the same batch
    fold(batch, 0)
    second = _span_set(spark.read.parquet(out_dir).collect())
    assert first == second  # no appended duplicates
    # the unique doc is still NOT flagged: its own grams, already in
    # the index from attempt 1, were excluded by the batch_id filter
    assert 51 not in second
    assert 50 in second and second[50] == {(1, 30)}
    # a later batch still sees batch 0's state (growth unaffected)
    later = spark.createDataFrame(
        [(60, " ".join(f"rp{i}" for i in range(40)) + " z0")],
        "doc_id long, text string",
    )
    fold(later, 1)
    final = _span_set(spark.read.parquet(out_dir).collect())
    assert 60 in final  # matched doc 51 via the grown index


def test_empty_index_batch_unique_docs_flag_nothing(spark):
    batch = spark.createDataFrame(
        [(40, " ".join(f"q{i}" for i in range(_L + 10)))],
        "doc_id long, text string",
    )
    assert (
        batch_dup_spans_against_index(
            batch, build_anchor_index(_empty(spark)), _empty(spark)
        ).count()
        == 0
    )


def test_compaction_preserves_probe_and_replay(spark, tmp_path):
    """compact_state folds old batch partitions into the batch_id=-1
    base: probe results are identical pre/post compaction, the newest
    `retain` partitions survive (so the replay guard still covers
    every redeliverable batch), replaying the newest batch after
    compaction stays idempotent, and a second compaction is a no-op."""
    from composable_logs_spark.streaming.incremental_substr import (
        _batch_ids,
        compact_state,
    )

    corpus, shared = _corpus(spark)
    corpus_dir = str(tmp_path / "corpus")
    index_dir = str(tmp_path / "gidx")
    out_dir = str(tmp_path / "spans_out")
    init_substr_state(corpus, corpus_dir, index_dir)
    fold = make_fold(spark, corpus_dir, index_dir, out_dir)

    runs = {}
    for b in range(5):
        runs[b] = " ".join(f"b{b}_{i}" for i in range(25))
        fold(
            spark.createDataFrame(
                [(100 + b, runs[b])], "doc_id long, text string"
            ),
            b,
        )
    assert _batch_ids(index_dir) == [-1, 0, 1, 2, 3, 4]

    # reference probe BEFORE compaction: a doc repeating batch 1's run
    # (which will be folded) and the initial corpus' shared run
    probe = spark.createDataFrame(
        [(200, runs[1] + " " + shared)], "doc_id long, text string"
    )

    def probe_spans():
        index = spark.read.parquet(index_dir).select("doc_id", "h")
        cdocs = spark.read.parquet(corpus_dir).select("doc_id", "text")
        return _span_set(
            batch_dup_spans_against_index(probe, index, cdocs).collect()
        )

    before = probe_spans()
    compact_state(spark, index_dir, corpus_dir, retain=2)
    assert _batch_ids(index_dir) == [-1, 3, 4]
    assert _batch_ids(corpus_dir) == [-1, 3, 4]
    after = probe_spans()
    assert before == after and 200 in after  # folded state still probes

    # replaying the NEWEST batch after compaction: still idempotent
    # (its partition was protected, so it cannot match itself)
    fold(
        spark.createDataFrame(
            [(104, runs[4])], "doc_id long, text string"
        ),
        4,
    )
    assert 104 not in _span_set(spark.read.parquet(out_dir).collect())

    # second compaction: nothing older than the protected tail -> no-op
    compact_state(spark, index_dir, corpus_dir, retain=2)
    assert _batch_ids(index_dir) == [-1, 3, 4]
    assert probe_spans() == after
