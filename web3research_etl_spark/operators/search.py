"""Inverted-index construction and conjunctive keyword search over the
documents corpus — the "grep the crawl" operators a training-data
pipeline runs for corpus exploration, targeted extraction ("all docs
mentioning X and Y") and building retrieval indexes.

Tokenization is deliberately engine-portable: ``split(lower(text),
'[^a-z0-9]+')`` uses only a character class (RE2 ∩ Java-regex common
subset, same trick as operators/curate.py's PII patterns), so the
DuckDB oracle tokenizes byte-identically and every operator here is
hash-gated, not rows-only.

Scale shape at 10^10 documents:
- ``keyword_search`` pre-filters with scan-fused ``contains()`` on the
  RAW text — a conservative superset of the token predicate (substring
  ⊇ word) that Catalyst pushes into the scan, so the explode (the
  expensive 1→n_tokens row amplification) runs only on candidate
  documents, and only candidate (doc_id, token) pairs — two skinny
  columns — ever cross the shuffle. Payload text never shuffles.
- ``postings``/``term_stats`` are one explode + one combinable
  aggregation: map-side combine collapses a token's per-partition
  occurrences before the exchange, so shuffle volume is
  per-partition-DISTINCT tokens, not token occurrences. The index build
  is the classic MapReduce inverted-index shape — embarrassingly
  partition-parallel.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# one token grammar for index build and search (and the DuckDB oracle)
TOKEN_SPLIT_PATTERN = "[^a-z0-9]+"


def doc_tokens(
    docs: DataFrame, text_col: str = "text", keep: tuple = ("doc_id",)
) -> DataFrame:
    """(*keep, token) — one row per token OCCURRENCE per document.
    Two-stage projection (the operators/text.exploded_shingles lesson:
    no expensive expression inside a per-element lambda — split runs
    once per doc, the explode is pure row amplification)."""
    staged = docs.select(
        *keep, F.split(F.lower(F.col(text_col)), TOKEN_SPLIT_PATTERN).alias("__t")
    )
    return staged.select(*keep, F.explode("__t").alias("token")).filter(
        F.col("token") != ""
    )


def postings(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """The inverted index: (token, doc_id, tf) — one row per distinct
    (token, document) pair with its in-document term frequency. Write
    it bucketed/sorted by token and lookups are a metadata-pruned
    single-bucket read (LakeTable with key=[token, doc_id])."""
    return (
        doc_tokens(docs, text_col=text_col)
        .groupBy("token", "doc_id")
        .agg(F.count("*").alias("tf"))
    )


def term_stats(
    docs: DataFrame, min_df: int = 2, text_col: str = "text"
) -> DataFrame:
    """Per-token corpus statistics: document frequency (docs containing
    the token) and collection frequency (total occurrences) — the df/cf
    table BM25/TF-IDF scoring reads, and the vocabulary report corpus
    curation eyeballs. ``min_df`` bounds the long unique-token tail
    (typos, ids) out of the result."""
    return (
        doc_tokens(docs, text_col=text_col)
        .groupBy("token")
        .agg(
            F.countDistinct("doc_id").alias("df"),
            F.count("*").alias("cf"),
        )
        .filter(F.col("df") >= min_df)
    )


def keyword_search(
    docs: DataFrame,
    terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Conjunctive (AND) keyword search: documents containing EVERY term
    in ``terms`` as a whole token, with the summed term frequency.

    Returns (doc_id, n_terms_matched, tf_sum) — n_terms_matched always
    equals len(terms) on output rows; it is kept so relaxing to
    disjunction is a one-line filter change for callers.

    ``terms`` must already be in token form (lowercase alphanumeric) —
    raise early otherwise, a mixed-case term would silently match
    nothing."""
    import re

    for t in terms:
        if not re.fullmatch("[a-z0-9]+", t):
            raise ValueError(f"term {t!r} is not a lowercase alnum token")
    # scan-fused conservative pre-filter: substring containment is a
    # superset of whole-token match, evaluated on the raw text inside
    # the scan stage — non-candidate docs never reach the explode
    pre = docs
    for t in terms:
        pre = pre.filter(F.contains(F.lower(F.col(text_col)), F.lit(t)))
    tok = doc_tokens(pre, text_col=text_col, keep=(id_col,)).filter(
        F.col("token").isin(list(terms))
    )
    return (
        tok.groupBy(id_col)
        .agg(
            F.countDistinct("token").alias("n_terms_matched"),
            F.count("*").alias("tf_sum"),
        )
        .filter(F.col("n_terms_matched") == len(terms))
    )
