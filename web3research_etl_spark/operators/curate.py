"""Corpus-curation operators a web-scale training-data pipeline runs
between ingest and tokenization: cross-corpus segment dedup (the C4
"discard duplicated spans, keep one occurrence" rule), benchmark
decontamination (n-gram overlap against an eval set, the GPT-3/PaLM
appendix procedure), per-document repetition gates (Gopher §A1-style
duplicate-word / top-n-gram fractions), and PII scrubbing.

All four are pure ``pyspark.sql.functions`` expressions (whole-stage
codegen, no Python in the hot path) and each has an exact DuckDB
oracle in ``__spark_entry__.oracle_sql``. The corpus fixture's
documents are single-line space-separated word streams, so the
segmentation unit is a fixed ``seg_words``-word window — on real
Common-Crawl text the same operators run with a sentence splitter
swapped into ``_segments`` (one expression change; the shuffle shape
is identical).

100-TB shape notes (per operator, also in each docstring):
- segment_dedup: one explode (docs × ~n_words/seg_words rows), one
  map-side-combinable min-agg keyed by a 60-bit segment hash, one
  equi-join back, one per-doc re-assembly agg. No windows over the
  global corpus, no skew (hash keys are uniform by construction).
- decontaminate: the benchmark side is tiny by definition (an eval
  set), so its distinct n-gram hashes broadcast; the corpus side is
  one explode + broadcast semi-join + per-doc count — no shuffle of
  corpus payload at all when the broadcast fires.
- repetition_stats: per-doc array expressions plus one (doc, bigram)
  partial-agg; everything combines map-side.
- scrub_pii: a scan-fused projection (regexp_replace chain).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from web3research_etl_spark.operators.text import md5_int60

# ---------------------------------------------------------------------------
# segmentation
# ---------------------------------------------------------------------------


def _words(text_col: str) -> Column:
    return F.split(F.col(text_col), " ")


def _segments(words: Column, seg_words: int) -> Column:
    """Non-overlapping ``seg_words``-word windows as strings, in doc
    order. ``slice`` truncates the tail window, matching DuckDB list
    slicing."""
    n_segs = F.ceil(F.size(words) / F.lit(seg_words)).cast("int")
    return F.transform(
        F.sequence(F.lit(0), n_segs - 1),
        lambda i: F.array_join(F.slice(words, i * seg_words + 1, seg_words), " "),
    )


def segment_dedup(
    docs: DataFrame,
    seg_words: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """C4-style cross-corpus span dedup: every ``seg_words``-word
    segment is kept exactly once across the whole corpus — the
    occurrence with the smallest (doc_id, seg_idx) wins; all later
    occurrences (in other docs OR later in the same doc) are dropped.

    Returns one row per doc: ``doc_id, n_segs, n_dropped,
    cleaned_text`` (the surviving segments re-joined in original
    order; empty string if every segment was a duplicate).

    Scale shape: explode to (doc, seg_idx, seg_hash) → min-agg per
    hash (map-side combinable; the 60-bit hash is the only shuffled
    payload plus one bigint occurrence key) → equi-join back → per-doc
    sort_array re-assembly. The segment STRINGS cross a shuffle only
    in the final per-doc agg, grouped by doc_id — i.e. bounded by one
    document, never by corpus-global key frequency.
    """
    words = _words(text_col)
    exploded = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(_segments(words, seg_words)).alias("seg_idx", "seg"),
    ).withColumn("seg_hash", md5_int60(F.col("seg")))
    # Single-bigint occurrence key: doc_id * 1e6 + seg_idx (seg counts
    # are tiny; the encoding keeps the min-agg a plain bigint min that
    # DuckDB reproduces bit-identically).
    occ = exploded.withColumn(
        "occ_key", F.col("doc_id") * F.lit(1_000_000) + F.col("seg_idx")
    )
    keepers = occ.groupBy("seg_hash").agg(F.min("occ_key").alias("keep_key"))
    marked = occ.join(keepers, "seg_hash").withColumn(
        "kept", (F.col("occ_key") == F.col("keep_key")).cast("int")
    )
    return (
        marked.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_segs"),
            (F.count("*") - F.sum("kept")).cast("bigint").alias("n_dropped"),
            F.array_join(
                F.transform(
                    F.sort_array(
                        F.collect_list(
                            F.when(
                                F.col("kept") == 1,
                                F.struct(F.col("seg_idx"), F.col("seg")),
                            )
                        )
                    ),
                    lambda s: s["seg"],
                ),
                " ",
            ).alias("cleaned_text"),
        )
        .withColumn("n_segs", F.col("n_segs").cast("bigint"))
    )


# ---------------------------------------------------------------------------
# decontamination
# ---------------------------------------------------------------------------


def ngram_hashes(words: Column, n: int) -> Column:
    """Hashes of every OVERLAPPING n-word window (position 0..len-n),
    distinct. Docs shorter than n contribute nothing — guarded
    explicitly because Spark's sequence(1, 0) yields a DESCENDING
    [1, 0], not an empty array."""
    n_pos = F.size(words) - F.lit(n - 1)
    grams = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), n_pos),
            lambda i: F.conv(
                F.substring(F.md5(F.array_join(F.slice(words, i, n), " ")), 1, 15),
                16,
                10,
            ).cast("bigint"),
        )
    )
    return F.when(n_pos >= 1, grams).otherwise(
        F.array().cast("array<bigint>")
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Benchmark decontamination: flag every corpus doc sharing ANY
    overlapping ``n``-word n-gram with the benchmark set (the GPT-3 /
    PaLM eval-leakage sweep re-expressed as a hash semi-join).

    Returns one row per corpus doc: ``doc_id, n_hits`` (distinct
    contaminated n-grams) and ``contaminated`` (0/1).

    Scale shape: the benchmark's distinct n-gram hashes are small by
    definition (an eval suite, not the corpus) → broadcast; the corpus
    side explodes its hashes once and left-joins the broadcast — no
    corpus-side shuffle of text bytes, the per-doc count agg combines
    map-side.
    """
    bench_hashes = (
        benchmark.select(
            F.explode(ngram_hashes(_words(text_col), n)).alias("gram_hash")
        )
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    corpus = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode_outer(ngram_hashes(_words(text_col), n)).alias("gram_hash"),
    )
    joined = corpus.join(F.broadcast(bench_hashes), "gram_hash", "left")
    return joined.groupBy("doc_id").agg(
        F.count_distinct(
            F.when(F.col("_hit") == 1, F.col("gram_hash"))
        ).alias("n_hits"),
        F.max(F.coalesce(F.col("_hit"), F.lit(0))).cast("int").alias("contaminated"),
    )


# ---------------------------------------------------------------------------
# repetition gates
# ---------------------------------------------------------------------------


def repetition_stats(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    dup_word_max: float = 0.5,
    top_bigram_max: float = 0.18,
) -> DataFrame:
    """Gopher-style per-document repetition gates: duplicate-word
    fraction (1 − distinct/total) and top-bigram frequency fraction
    (most frequent word bigram's share of all bigram positions; the
    frequency analog of Gopher's top-2-gram character fraction —
    documented as such, not a claim of the exact char metric).

    Returns ``doc_id, n_words, dup_word_frac, top_bigram_n,
    top_bigram_frac, flagged``; ``flagged=1`` when either gate trips.

    Scale shape: dup_word_frac is a scan-fused array expression (no
    shuffle); the bigram mode needs one (doc_id, bigram)-keyed partial
    agg + one per-doc max — both map-side combinable, keys bounded by
    document length so no corpus-global skew.
    """
    words = _words(text_col)
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(words).alias("n_words"),
        F.size(F.array_distinct(words)).alias("n_distinct"),
        F.when(
            F.size(words) >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size(words) - 1),
                lambda i: F.array_join(F.slice(words, i, 2), " "),
            ),
        )
        .otherwise(F.array().cast("array<string>"))
        .alias("bigrams"),
    )
    big = (
        base.select("doc_id", F.explode_outer("bigrams").alias("bigram"))
        .groupBy("doc_id", "bigram")
        .count()
        .groupBy("doc_id")
        .agg(F.max(F.when(F.col("bigram").isNotNull(), F.col("count"))).alias("top_n"))
    )
    out = base.join(big, "doc_id").select(
        "doc_id",
        F.col("n_words").cast("bigint").alias("n_words"),
        F.round(
            (F.col("n_words") - F.col("n_distinct"))
            / F.greatest(F.col("n_words"), F.lit(1)),
            6,
        ).alias("dup_word_frac"),
        F.coalesce(F.col("top_n"), F.lit(0)).cast("bigint").alias("top_bigram_n"),
        F.round(
            F.coalesce(F.col("top_n"), F.lit(0))
            / F.greatest(F.col("n_words") - 1, F.lit(1)),
            6,
        ).alias("top_bigram_frac"),
    )
    return out.withColumn(
        "flagged",
        (
            (F.col("dup_word_frac") > dup_word_max)
            | (F.col("top_bigram_frac") > top_bigram_max)
        ).cast("int"),
    )


# ---------------------------------------------------------------------------
# PII scrubbing
# ---------------------------------------------------------------------------

# Patterns are written in the RE2 ∩ java.util.regex common subset so
# Spark (Java regex) and DuckDB (RE2) match byte-identically: no
# backreferences, no lookaround, no possessive quantifiers.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
PHONE_RE = r"\+[0-9]{1,3}[ -][0-9]{3}[ -][0-9]{3,4}[ -][0-9]{3,4}"


def scrub_pii(text: Column) -> Column:
    """Replace emails, then international-format phone numbers, then
    IPv4 addresses with typed sentinels. Order matters: emails can
    contain digit runs, so they are removed first; phones before IPs
    so a phone's digit groups are never half-eaten by the IP rule."""
    out = F.regexp_replace(text, F.lit(EMAIL_RE), F.lit("<EMAIL>"))
    out = F.regexp_replace(out, F.lit(PHONE_RE), F.lit("<PHONE>"))
    return F.regexp_replace(out, F.lit(IPV4_RE), F.lit("<IP>"))


def pii_counts(text: Column) -> list[Column]:
    """Per-kind match counts on the RAW text (pre-scrub), for audit
    metrics. Counted in the same order-sensitive way scrub_pii
    replaces: phones are counted on the email-scrubbed text, IPs on
    the phone-scrubbed text."""
    after_email = F.regexp_replace(text, F.lit(EMAIL_RE), F.lit("<EMAIL>"))
    after_phone = F.regexp_replace(after_email, F.lit(PHONE_RE), F.lit("<PHONE>"))
    return [
        F.regexp_count(text, F.lit(EMAIL_RE)).cast("bigint").alias("n_email"),
        F.regexp_count(after_email, F.lit(PHONE_RE)).cast("bigint").alias("n_phone"),
        F.regexp_count(after_phone, F.lit(IPV4_RE)).cast("bigint").alias("n_ip"),
    ]
