"""Full PII scrub: planted emails/phones/SSNs/digit runs are masked
with the right typed token, counted in the right category exactly once,
and clean text passes through byte-identical."""

from pyspark.sql import functions as F

from composable_logs_spark.queries.pipeline_q import (
    pii_scrub_documents,
    scrub_stages,
)


def _scrub(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    counts, scrubbed = scrub_stages(F.col("text"))
    return (
        df.select(
            "doc_id",
            *[c.alias(n) for n, c in counts.items()],
            scrubbed.alias("scrubbed"),
        )
        .orderBy("doc_id")
        .collect()
    )


def test_each_category_masks_and_counts_once(spark):
    rows = _scrub(
        spark,
        [
            "write to jane.doe+spam@mail.example.org today",
            "call (555) 123-4567 or 555-987-6543 now",
            "ssn is 078-05-1120 ok",
            "account 123456789 and pin 99887766",
            "clean text with short 12345 digits only",
        ],
    )
    email, phone, ssn, ids, clean = rows
    assert email["scrubbed"] == "write to [EMAIL] today"
    assert (email["n_emails"], email["n_phones"], email["n_ssns"], email["n_ids"]) == (1, 0, 0, 0)
    assert phone["scrubbed"] == "call [PHONE] or [PHONE] now"
    assert phone["n_phones"] == 2 and phone["n_emails"] == 0 and phone["n_ids"] == 0
    assert ssn["scrubbed"] == "ssn is [SSN] ok"
    assert ssn["n_ssns"] == 1 and ssn["n_phones"] == 0
    assert ids["scrubbed"] == "account [ID] and pin [ID]"
    assert ids["n_ids"] == 2
    assert clean["scrubbed"] == "clean text with short 12345 digits only"
    assert all(
        clean[k] == 0 for k in ("n_emails", "n_phones", "n_ssns", "n_ids")
    )


def test_sequencing_prevents_double_counting(spark):
    # an email whose local part contains a long digit run: the digit-run
    # stage must NOT also count it (it is already masked), and a phone
    # must not additionally count as an SSN or digit run
    (row,) = _scrub(spark, ["id900123456@example.com then 555-123-4567"])
    assert row["scrubbed"] == "[EMAIL] then [PHONE]"
    assert (row["n_emails"], row["n_phones"], row["n_ssns"], row["n_ids"]) == (1, 1, 0, 0)


def test_fuzz_planted_pii_counts(spark):
    """Seeded fuzz: canonical PII tokens planted at random positions in
    random filler text are each counted exactly once, in the right
    category, and the scrubbed text carries the right mask counts."""
    import random

    rng = random.Random(20260815)
    words = "lorem ipsum dolor sit amet quick brown fox lazy dog".split()
    pii = {
        "n_emails": lambda: f"user{rng.randint(1, 99)}@mail{rng.randint(1, 9)}.org",
        "n_phones": lambda: f"({rng.randint(100, 999)}) {rng.randint(100, 999)}-{rng.randint(1000, 9999)}",
        "n_ssns": lambda: f"{rng.randint(100, 999)}-{rng.randint(10, 99)}-{rng.randint(1000, 9999)}",
        "n_ids": lambda: str(rng.randint(10**5 + 1, 10**10)),
    }
    texts, expected = [], []
    for _ in range(40):
        parts = [rng.choice(words) for _ in range(rng.randint(3, 12))]
        planted = {k: 0 for k in pii}
        for _ in range(rng.randint(0, 5)):
            k = rng.choice(list(pii))
            parts.insert(rng.randint(0, len(parts)), pii[k]())
            planted[k] += 1
        texts.append(" ".join(parts))
        expected.append(planted)
    rows = _scrub(spark, texts)
    masks = {"n_emails": "[EMAIL]", "n_phones": "[PHONE]", "n_ssns": "[SSN]", "n_ids": "[ID]"}
    for r, planted in zip(rows, expected):
        for k, n in planted.items():
            assert r[k] == n, (r["doc_id"], k, n, r)
            assert r["scrubbed"].count(masks[k]) == n


def test_query_plants_pii_in_low_ids(spark, sf_dir):
    rows = pii_scrub_documents(spark, sf_dir).orderBy("doc_id").limit(12).collect()
    for r in rows:
        if r["doc_id"] < 10:
            assert r["n_emails"] >= 1 and r["n_phones"] >= 1
            assert r["n_ssns"] >= 1 and r["n_ids"] >= 1
