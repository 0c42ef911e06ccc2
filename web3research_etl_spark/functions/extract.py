"""HTML→text extraction + language detection — the engine's single custom
compute slot, per BASELINE.json input_hint: vectorized pandas/Arrow UDFs
only, no per-row Python in the hot path.

This is the Spark expression of the reference's hand-written row mappers
(P9 address normalization, /root/reference/src/ch_tron/schema.rs:23-67):
a deterministic, pure-bytes transformation applied per row, here batched
through Arrow.

Determinism contract (tested byte-identical against golden fixtures):
the output text is a pure function of the input html bytes — fixed
UTF-8 decode policy, fixed regex pipeline, no locale/env dependence.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Pre-compiled pipeline — order matters and is part of the byte-contract.
_RE_SCRIPT = re.compile(r"(?is)<script\b.*?</script\s*>")
_RE_STYLE = re.compile(r"(?is)<style\b.*?</style\s*>")
_RE_COMMENT = re.compile(r"(?s)<!--.*?-->")
# Block-level closers/openers become newlines so paragraph structure survives.
_RE_BLOCK = re.compile(
    r"(?i)</?(?:p|div|br|h[1-6]|li|ul|ol|tr|table|section|article|header|footer|blockquote|pre)\b[^>]*>"
)
_RE_TAG = re.compile(r"(?s)<[^>]*>")
_ENTITIES = [
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&amp;", "&"),  # last, so &amp;lt; → &lt; (literal), matching html.unescape order-of-one-pass closely enough for our contract
]
# Horizontal-whitespace collapse is two steps with one combined
# contract: translate maps \t\r\f\v → ' ' (C-speed, no regex), then only
# runs of ≥2 spaces need a regex sub. Output is identical to the naive
# single `[ \t\r\f\v]+ → " "` pass (exhaustively checked over all
# ≤5-char strings of a whitespace-adversarial alphabet), but the regex
# no longer fires a no-op match+fragment on every single inter-word
# space — the pass that profiling showed was 42% of extraction cost.
_WS_TRANSLATE = str.maketrans({"\t": " ", "\r": " ", "\f": " ", "\v": " "})
_RE_SPACES = re.compile(r" {2,}")


def _squeeze_newlines(s: str) -> str:
    """Exact equivalent of ``re.sub(r"\\s*\\n\\s*", "\\n", s)`` built
    from C-level split/strip/join (str.strip's whitespace set equals
    \\s): ~4× faster because the regex pays a backtracking attempt at
    every space character while split only touches actual newlines.
    Equivalence exhaustively checked over all ≤6-char strings of a
    whitespace-adversarial alphabet (incl. U+00A0)."""
    if "\n" not in s:
        return s
    parts = s.split("\n")
    out = [parts[0].rstrip()]
    for p in parts[1:-1]:
        p = p.strip()
        if p:
            out.append(p)
    out.append(parts[-1].lstrip())
    return "\n".join(out)


def extract_text_bytes(html: bytes | None) -> str | None:
    """Reference implementation on one value (the golden-fixture oracle)."""
    if html is None:
        return None
    s = html.decode("utf-8", errors="replace")
    s = _RE_SCRIPT.sub(" ", s)
    s = _RE_STYLE.sub(" ", s)
    s = _RE_COMMENT.sub(" ", s)
    s = _RE_BLOCK.sub("\n", s)
    s = _RE_TAG.sub(" ", s)
    for ent, rep in _ENTITIES:
        s = s.replace(ent, rep)
    s = _RE_SPACES.sub(" ", s.translate(_WS_TRANSLATE))
    s = _squeeze_newlines(s)
    return s.strip()


@F.pandas_udf(T.StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    """Arrow-vectorized html(binary) → text(string).

    Runs the same compiled-regex pipeline as :func:`extract_text_bytes`
    over a pandas Series per Arrow batch. Regexes execute in C (pandas
    .str → re on a contiguous block); no row-at-a-time Python UDF in the
    Spark plan — the only per-element steps inside the batch are the
    bytes decode and the C-built split/strip/join newline squeeze.
    """
    s = html.map(lambda b: b.decode("utf-8", errors="replace") if b is not None else None)
    s = s.str.replace(_RE_SCRIPT, " ", regex=True)
    s = s.str.replace(_RE_STYLE, " ", regex=True)
    s = s.str.replace(_RE_COMMENT, " ", regex=True)
    s = s.str.replace(_RE_BLOCK, "\n", regex=True)
    s = s.str.replace(_RE_TAG, " ", regex=True)
    for ent, rep in _ENTITIES:
        s = s.str.replace(ent, rep, regex=False)
    s = s.str.translate(_WS_TRANSLATE)
    s = s.str.replace(_RE_SPACES, " ", regex=True)
    s = s.map(_squeeze_newlines, na_action="ignore")
    return s.str.strip()


# ---------------------------------------------------------------------------
# Language identification — stopword-hit heuristic over a fixed 8-language
# pool (FIXTURES.md §1). Vectorized: one regex count per language per batch.
# ---------------------------------------------------------------------------
_LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "mit", "ein"],
    "fr": ["le", "la", "les", "et", "est", "une", "pour", "dans"],
    "es": ["el", "los", "las", "es", "una", "por", "para", "con"],
    "it": ["il", "che", "di", "non", "per", "una", "sono", "con"],
    "pt": ["o", "os", "uma", "não", "para", "com", "por", "mais"],
    "nl": ["de", "het", "een", "en", "van", "niet", "met", "voor"],
    "zh": ["的", "是", "了", "在", "和", "不", "有", "我"],
}
_LANG_RES = {
    # CJK has no \b word boundaries between ideographs — count bare occurrences.
    lang: re.compile(
        "(?:" + "|".join(map(re.escape, words)) + ")"
        if lang == "zh"
        else r"(?i)\b(?:" + "|".join(map(re.escape, words)) + r")\b"
    )
    for lang, words in _LANG_MARKERS.items()
}


@F.pandas_udf(T.StringType())
def detect_lang_udf(text: pd.Series) -> pd.Series:
    """Deterministic n-gram/stopword language ID; ties broken by fixed
    language order (dict order above), unknown → 'und'."""
    filled = text.fillna("")
    counts = pd.DataFrame(
        {lang: filled.str.count(rx) for lang, rx in _LANG_RES.items()}
    )
    best = counts.idxmax(axis=1)
    best[counts.max(axis=1) <= 0] = "und"
    best[text.isna()] = None
    return best
