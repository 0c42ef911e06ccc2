"""Extraction UDF: byte-identical golden fixtures + UDF/reference parity.

The golden files under tests/golden_text/ pin the byte contract
(BASELINE.json input_hint: byte-identical extracted text per url)."""

import os

import pandas as pd
from pyspark.sql import functions as F

from web3research_etl_spark.functions.extract import (
    _LANG_RES,
    extract_text_bytes,
)

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden_text")

CASES = {
    "basic": b"<html><body><h1>Hello</h1><p>World &amp; friends</p></body></html>",
    "script_style": (
        b"<html><head><style>p{}</style><script>if(1<2){alert('x')}</script>"
        b"</head><body><p>kept</p></body></html>"
    ),
    "comments_entities": b"<div>a &lt;tag&gt; &quot;q&quot; &#39;s&#39;<!-- no --></div>end",
    "blocks_newlines": b"<p>one</p><p>two</p><ul><li>three</li><li>four</li></ul>",
    "invalid_utf8": b"<p>caf\xc3\xa9 ok \xff broken</p>",
    "empty": b"",
    "no_tags": b"just plain text  with   spaces",
}


def test_goldens_byte_identical():
    for name, html in CASES.items():
        path = os.path.join(GOLDEN_DIR, f"{name}.txt")
        got = extract_text_bytes(html).encode("utf-8")
        with open(path, "rb") as f:
            assert got == f.read(), f"golden mismatch: {name}"


def test_udf_matches_reference_impl(spark):
    rows = [(name, html) for name, html in CASES.items()]
    df = spark.createDataFrame(rows, "name string, html binary")
    from web3research_etl_spark.functions.extract import extract_text_udf

    got = {r["name"]: r["t"] for r in df.select("name", extract_text_udf("html").alias("t")).collect()}
    for name, html in CASES.items():
        assert got[name] == extract_text_bytes(html), name


def test_udf_null_passthrough(spark):
    from web3research_etl_spark.functions.extract import extract_text_udf

    df = spark.createDataFrame([(None,)], "html binary")
    assert df.select(extract_text_udf("html").alias("t")).collect()[0]["t"] is None


def test_lang_detect(spark):
    from web3research_etl_spark.functions.extract import detect_lang_udf

    rows = [
        ("the quick fox and the dog is in that house for now", "en"),
        ("der hund und die katze ist nicht mit das haus ein", "de"),
        ("le chat et la maison est une pour les dans", "fr"),
        ("我是不在和有了的我", "zh"),
        ("zzz qqq xxx", "und"),
    ]
    df = spark.createDataFrame([(t,) for t, _ in rows], "text string")
    got = [r["l"] for r in df.select(detect_lang_udf("text").alias("l")).collect()]
    assert got == [lang for _, lang in rows]


def test_lang_regexes_compiled():
    assert set(_LANG_RES) == {"en", "de", "fr", "es", "it", "pt", "nl", "zh"}


def test_udf_kernel_matches_reference_on_adversarial_bytes():
    """Property check (hypothesis): the pandas batch path and the
    single-value reference path are byte-identical for ARBITRARY input
    bytes — not just the golden fixtures. Generates tag soup, truncated
    entities, invalid UTF-8, and raw unicode whitespace."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from web3research_etl_spark.functions.extract import extract_text_udf

    kernel = extract_text_udf.func  # the pandas function under the udf wrapper

    fragments = st.sampled_from(
        [b"<p>", b"</p>", b"<script>", b"</script >", b"<style>x{}</style>",
         b"<!--", b"-->", b"<div class='a", b">", b"<", b"&amp;", b"&nbsp;",
         b"&lt", b";", b"text", b" ", b"\t", b"\n", b"\r\n", b"\xc3\xa9",
         b"\xff", b"\xc2\xa0", b"<br/>", b"<TABLE>", b"</ li>", b"\x0b\x0c"]
    )
    soup = st.lists(fragments, min_size=0, max_size=30).map(b"".join)

    @settings(max_examples=300, deadline=None)
    @given(st.lists(soup, min_size=1, max_size=8))
    def run(batch):
        got = kernel(pd.Series(batch, dtype=object)).tolist()
        want = [extract_text_bytes(b) for b in batch]
        assert got == want

    run()
