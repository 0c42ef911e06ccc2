"""Corpus-curation operators (operators/curate.py): planted-case
semantics for segment dedup, decontamination, repetition gates, and
PII scrubbing. The sf0.01 hash parity vs DuckDB is covered by the
driver gate; these tests pin the SEMANTICS on hand-built corpora."""

from pyspark.sql import functions as F

from web3research_etl_spark.operators.curate import (
    decontaminate,
    ngram_hashes,
    pii_counts,
    repetition_stats,
    scrub_pii,
    segment_dedup,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_segment_dedup_keeps_first_occurrence(spark):
    seg = " ".join(f"w{i}" for i in range(10))  # exactly one segment
    other = " ".join(f"x{i}" for i in range(10))
    docs = _docs(
        spark,
        [
            (1, seg),  # first occurrence — kept
            (2, seg + " " + other),  # seg dup dropped, other kept
            (3, other),  # dup of doc 2's second segment
        ],
    )
    out = {r["doc_id"]: r for r in segment_dedup(docs, seg_words=10).collect()}
    assert out[1]["n_dropped"] == 0 and out[1]["cleaned_text"] == seg
    assert out[2]["n_segs"] == 2 and out[2]["n_dropped"] == 1
    assert out[2]["cleaned_text"] == other
    assert out[3]["n_dropped"] == 1 and out[3]["cleaned_text"] == ""


def test_segment_dedup_drops_intra_doc_repeats(spark):
    seg = " ".join(f"r{i}" for i in range(10))
    docs = _docs(spark, [(7, seg + " " + seg)])  # same segment twice
    row = segment_dedup(docs, seg_words=10).collect()[0]
    assert row["n_segs"] == 2 and row["n_dropped"] == 1
    assert row["cleaned_text"] == seg


def test_ngram_hashes_short_doc_guard(spark):
    # Spark's sequence(1, 0) is DESCENDING [1, 0]; the guard must turn
    # a doc shorter than n into an empty gram set, not a bogus one.
    df = spark.createDataFrame([("a b c",)], "text string")
    out = df.select(
        F.size(ngram_hashes(F.split(F.col("text"), " "), 8)).alias("n")
    ).collect()
    assert out[0]["n"] == 0


def test_decontaminate_flags_shared_ngram(spark):
    bench_text = " ".join(f"b{i}" for i in range(8))
    clean_text = " ".join(f"c{i}" for i in range(12))
    leaked = "pad0 pad1 " + bench_text + " tail0"
    bench = _docs(spark, [(100, bench_text)])
    corpus = _docs(spark, [(1, leaked), (2, clean_text)])
    out = {r["doc_id"]: r for r in decontaminate(corpus, bench, n=8).collect()}
    assert out[1]["contaminated"] == 1 and out[1]["n_hits"] == 1
    assert out[2]["contaminated"] == 0 and out[2]["n_hits"] == 0


def test_repetition_stats_gates(spark):
    repeated = " ".join(["spam ham"] * 20)  # top bigram dominates
    varied = " ".join(f"u{i}" for i in range(40))
    docs = _docs(spark, [(1, repeated), (2, varied)])
    out = {r["doc_id"]: r for r in repetition_stats(docs).collect()}
    assert out[1]["flagged"] == 1
    assert out[1]["dup_word_frac"] > 0.9
    assert out[2]["flagged"] == 0 and out[2]["dup_word_frac"] == 0.0
    assert out[2]["top_bigram_n"] == 1


def test_pii_scrub_known_vectors(spark):
    text = (
        "reach me at jane.doe+spam@mail.example.org or +44 207 946 0958, "
        "server 192.168.0.1 works"
    )
    df = spark.createDataFrame([(text,)], "text string")
    row = df.select(
        scrub_pii(F.col("text")).alias("s"), *pii_counts(F.col("text"))
    ).collect()[0]
    assert row["s"] == "reach me at <EMAIL> or <PHONE>, server <IP> works"
    assert (row["n_email"], row["n_phone"], row["n_ip"]) == (1, 1, 1)


def test_pii_scrub_order_email_digits_not_phone(spark):
    # An email with digit runs must be consumed by the email rule, not
    # half-eaten by the phone rule; a bare version string must survive.
    text = "v1.2.3.4500 build, mail 555 0123 4567a@ex.io ok"
    df = spark.createDataFrame([(text,)], "text string")
    row = df.select(scrub_pii(F.col("text")).alias("s")).collect()[0]
    assert "<EMAIL>" in row["s"] and "<PHONE>" not in row["s"]
