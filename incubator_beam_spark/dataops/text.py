"""Text analysis operators: tokenization, quality scoring, language ID,
fingerprinting.

All pure Catalyst expressions (no UDFs): at 100 TB these run inside
whole-stage codegen during the scan, shuffle nothing, and push column
pruning to parquet (only ``text`` is read).

Cross-engine determinism contract (for the DuckDB oracle): every operator
uses md5 (not murmur/xxhash, whose implementations differ per engine) and
regex classes shared by Java regex and RE2.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# BPE-ish token pattern: letter runs, digit runs, or single non-space symbol
TOKEN_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

# Tiny stopword inventories for the n-gram language heuristic.
LANG_MARKERS = {
    "en": r"\b(the|and|of|to|is|in)\b",
    "de": r"\b(der|die|das|und|ist|nicht)\b",
    "es": r"\b(el|la|los|las|es|y)\b",
    "fr": r"\b(le|la|les|et|est|dans)\b",
}
_LANG_ORDER = ("en", "de", "es", "fr")


def tokens(text: Column) -> Column:
    """Tokenize with the BPE-ish regex (SURVEY.md training-data ops)."""
    return F.regexp_extract_all(text, F.lit(TOKEN_PATTERN), 0)


def token_count(text: Column) -> Column:
    # long, not int: oracle engines count with 64-bit len()
    return F.size(tokens(text)).cast("long")


def word_count(text: Column) -> Column:
    return F.size(F.split(F.trim(text), r"\s+")).cast("long")


def punct_ratio(text: Column) -> Column:
    """Punctuation chars / total chars."""
    stripped = F.regexp_replace(text, r"[^.,!?;:]", "")
    return F.length(stripped) / F.length(text)


def upper_ratio(text: Column) -> Column:
    return F.length(F.regexp_replace(text, "[^A-Z]", "")) / F.length(text)


def stopword_ratio(text: Column) -> Column:
    """English stopword hits / word count (quality signal)."""
    hits = F.size(F.regexp_extract_all(F.lower(text), F.lit(LANG_MARKERS["en"]), 0))
    return hits / word_count(text)


def quality_score(text: Column) -> Column:
    """Composite quality score in [0, 1]: length band + stopword presence -
    punctuation excess. Deterministic, SQL-expressible (mirrors C4/Gopher
    style rule filters)."""
    len_ok = (F.length(text) >= 100) & (F.length(text) <= 20000)
    score = (
        F.when(len_ok, F.lit(0.4)).otherwise(F.lit(0.0))
        + F.least(stopword_ratio(text) * 2, F.lit(0.4))
        + F.when(punct_ratio(text) <= 0.1, F.lit(0.2)).otherwise(F.lit(0.0))
    )
    return F.round(score, 4)


def lang_scores(text: Column) -> dict[str, Column]:
    low = F.lower(text)
    return {
        lang: F.size(F.regexp_extract_all(low, F.lit(pat), 0))
        for lang, pat in LANG_MARKERS.items()
    }


def detect_lang(text: Column) -> Column:
    """Stopword-marker language ID with deterministic tie-break (first in
    _LANG_ORDER wins); 'und' when no marker hits."""
    scores = lang_scores(text)
    best_score = F.greatest(*scores.values())
    result = F.lit("und")
    # build reversed so earlier languages take precedence on ties
    for lang in reversed(_LANG_ORDER):
        result = F.when(
            (scores[lang] == best_score) & (best_score > 0), F.lit(lang)
        ).otherwise(result)
    return result


def fingerprint(text: Column) -> Column:
    """Document fingerprint: md5 over whitespace-normalized lowercase text,
    truncated to 64 bits (hex). Stable across engines and runs."""
    normalized = F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")
    return F.substring(F.md5(normalized), 1, 16)
