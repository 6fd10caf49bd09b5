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


def dup_ngram_fraction(text: Column, n: int = 3) -> Column:
    """Gopher-style repetition signal: fraction of word n-grams that are
    duplicates within the document (1 - distinct/total). Scan-side array
    expressions — the repetition filter for training corpora runs during
    the scan, nothing shuffles."""
    from .dedup import shingles

    sh = shingles(text, n)
    return F.round(
        F.lit(1.0) - F.size(F.array_distinct(sh)) / F.size(sh), 6
    )


def gopher_rules(text: Column) -> dict[str, Column]:
    """Gopher-style document quality rules (Rae et al. 2021, Table A1 —
    public): per-rule booleans plus the ratios behind them. All pure
    Catalyst expressions (scan-side, whole-stage codegen, nothing
    shuffles); identical semantics in the DuckDB oracle.

    Rules: word count in [50, 100000]; mean word length in [3, 10];
    symbol-to-word ratio (# and ...) <= 0.1; <= 90% of lines bullet-led;
    <= 30% of lines ellipsis-ended; >= 80% of words contain an alphabetic
    char; >= 2 English stopword hits.
    """
    words = F.split(F.trim(text), r"\s+")
    n_words = F.size(words).cast("long")
    mean_word_len = F.aggregate(
        words, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
    ) / n_words
    n_symbols = (
        F.size(F.regexp_extract_all(text, F.lit(r"#|\.\.\."), 0)).cast("long")
    )
    lines = F.filter(F.split(text, "\n"), lambda l: F.length(F.trim(l)) > 0)
    n_lines = F.size(lines)
    bullet_frac = F.when(n_lines == 0, F.lit(0.0)).otherwise(
        F.size(
            F.filter(lines, lambda l: F.trim(l).rlike(r"^([*•▪‣-]|[0-9]+[.)])"))
        )
        / n_lines
    )
    ellipsis_frac = F.when(n_lines == 0, F.lit(0.0)).otherwise(
        F.size(F.filter(lines, lambda l: F.trim(l).rlike(r"(\.\.\.|…)$"))) / n_lines
    )
    alpha_frac = (
        F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]"))) / n_words
    )
    n_stopwords = F.size(
        F.regexp_extract_all(F.lower(text), F.lit(LANG_MARKERS["en"]), 0)
    ).cast("long")
    rules = {
        "word_count_ok": (n_words >= 50) & (n_words <= 100000),
        "mean_word_len_ok": (mean_word_len >= 3) & (mean_word_len <= 10),
        "symbol_ratio_ok": (n_symbols / n_words) <= 0.1,
        "bullet_ok": bullet_frac <= 0.9,
        "ellipsis_ok": ellipsis_frac <= 0.3,
        "alpha_ok": alpha_frac >= 0.8,
        "stopword_ok": n_stopwords >= 2,
    }
    keep = None
    for c in rules.values():
        keep = c if keep is None else (keep & c)
    return {"n_words": n_words, **rules, "keep": keep}


def dup_line_fraction(text: Column) -> Column:
    """Fraction of duplicate lines within the document (the other Gopher
    repetition axis)."""
    lines = F.filter(F.split(text, "\n"), lambda l: F.length(F.trim(l)) > 0)
    return F.when(F.size(lines) == 0, F.lit(0.0)).otherwise(
        F.round(F.lit(1.0) - F.size(F.array_distinct(lines)) / F.size(lines), 6)
    )


# Engine-portable PII patterns: plain char classes + bounded repetition
# only — identical semantics in Java regex (Spark) and RE2 (DuckDB).
PII_PATTERNS: dict[str, str] = {
    "EMAIL": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "PHONE": r"\+?[0-9][0-9()\- ]{7,}[0-9]",
    "IP": r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}",
}


def pii_redact(text: Column) -> Column:
    """Replace emails / phone numbers / IPv4s with typed placeholders —
    the standard pre-training scrub pass, pure regexp_replace chain
    inside codegen. Order matters: IP before PHONE so dotted quads are
    not half-eaten by the phone pattern."""
    out = text
    for tag in ("EMAIL", "IP", "PHONE"):
        out = F.regexp_replace(out, PII_PATTERNS[tag], f"[{tag}]")
    return out


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-type PII hit counts (for filtering/reporting)."""
    return {
        tag: F.size(F.regexp_extract_all(text, F.lit(pat), 0)).cast("long")
        for tag, pat in PII_PATTERNS.items()
    }


def nfc_normalize_df(df, id_col: str = "doc_id", text_col: str = "text"):
    """Unicode NFC + lower + whitespace-collapse normalization — the
    canonical pre-dedup text canonicalization. NFC runs in an Arrow
    batch (Python ``unicodedata`` — Spark SQL has no normalization
    builtin); case-folding and whitespace collapse stay JVM-side so the
    heavy string work is codegen'd. Differential oracle: DuckDB's native
    ``nfc_normalize``."""
    import unicodedata
    from typing import Iterator

    import pandas as pd
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType(), False),
            T.StructField("__nfc", T.StringType(), True),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "__nfc": [
                        unicodedata.normalize("NFC", t) if t is not None else None
                        for t in pdf[text_col]
                    ],
                }
            )

    nfc = df.select(id_col, text_col).mapInPandas(run, schema)
    return nfc.select(
        id_col,
        F.regexp_replace(F.lower(F.trim(F.col("__nfc"))), r"\s+", " ").alias(
            "norm_text"
        ),
    )


def compression_ratio_df(df, id_col: str = "doc_id", text_col: str = "text"):
    """Compression-ratio quality signal (Gopher/RefinedWeb-style):
    zlib-compressed size / raw size — low ratios flag boilerplate or
    repetitive machine-generated text. Deterministic (fixed zlib level),
    computed in Arrow batches; bytes never shuffle, only (id, ratio)."""
    import zlib
    from typing import Iterator

    import pandas as pd
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType(), False),
            T.StructField("compression_ratio", T.DoubleType(), True),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ratios = []
            for t in pdf[text_col]:
                if not t:
                    ratios.append(None)
                    continue
                raw = t.encode("utf-8")
                ratios.append(round(len(zlib.compress(raw, 6)) / len(raw), 6))
            yield pd.DataFrame({id_col: pdf[id_col], "compression_ratio": ratios})

    return df.select(id_col, text_col).mapInPandas(run, schema)


def compression_roundtrip_df(df, id_col: str = "doc_id", text_col: str = "text"):
    """Per-doc zlib self-check backing the compression-ratio signal:
    decompress(compress(text)) must reproduce the text byte-exactly, and
    the ratio must sit in its provable envelope (positive; at most
    (raw+64)/raw — zlib's worst-case stored-block overhead is 5 bytes
    per 32 KiB block plus the 6-byte header/trailer, far under 64 for
    fixture-sized docs). Emits (id, roundtrip_ok, ratio_bounded); bytes
    never shuffle."""
    import zlib
    from typing import Iterator

    import pandas as pd
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType(), False),
            T.StructField("roundtrip_ok", T.BooleanType(), True),
            T.StructField("ratio_bounded", T.BooleanType(), True),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ok, bounded = [], []
            for t in pdf[text_col]:
                raw = (t or "").encode("utf-8")
                comp = zlib.compress(raw, 6)
                ok.append(zlib.decompress(comp) == raw)
                if raw:
                    r = len(comp) / len(raw)
                    bounded.append(0.0 < r <= (len(raw) + 64) / len(raw))
                else:
                    bounded.append(True)
            yield pd.DataFrame(
                {id_col: pdf[id_col], "roundtrip_ok": ok, "ratio_bounded": bounded}
            )

    return df.select(id_col, text_col).mapInPandas(run, schema)


def stratified_sample(df, strata_col: str, fractions: dict, seed: int = 7):
    """Stratified (per-class) sampling for corpus rebalancing —
    ``sampleBy`` with a pinned seed: Bernoulli per row, no shuffle, scan
    stays parallel. Fractions outside [0,1] raise; absent strata drop."""
    return df.sampleBy(strata_col, fractions, seed)


def token_entropy(text: Column) -> tuple[Column, Column]:
    """(n_types, entropy): distinct-token count and Shannon entropy of
    the token distribution — the lexical-diversity quality signal
    (low entropy = repetitive/boilerplate, the Gopher "mostly the same
    token" filter).

    Scan-side run-length histogram: sort the token array, find run
    starts with an indexed filter, diff adjacent starts — no explode, no
    shuffle, the histogram never leaves the row. H = ln(n) - (1/n)*sum
    c*ln(c), rounded to 6 decimals (ln is the only libm call; identical
    fold order keeps engines within rounding distance).
    """
    toks = tokens(text)
    srt = F.sort_array(toks)
    n = F.size(srt)
    starts = F.filter(
        F.sequence(F.lit(1), n),
        lambda i: (i == 1)
        | (F.element_at(srt, F.greatest(i - 1, F.lit(1))) != F.element_at(srt, i)),
    )
    ends = F.concat(F.slice(starts, 2, F.size(starts) - 1), F.array(n + 1))
    counts = F.zip_with(starts, ends, lambda a, b: b - a)
    sum_clnc = F.aggregate(
        counts, F.lit(0.0), lambda acc, c: acc + c.cast("double") * F.log(c.cast("double"))
    )
    entropy = F.round(F.log(n.cast("double")) - sum_clnc / n, 6)
    return F.size(starts).cast("long"), entropy


# --- HTML main-content extraction (the crawl -> training-text step) ---------

# Block-level boilerplate elements removed WHOLE (content included) before
# tag stripping: their text is navigation/chrome, not document content.
_HTML_BLOCK_DROP = ("script", "style", "head", "nav", "footer", "aside")


def html_main_content(html: Column) -> Column:
    """Extract main text from an HTML page — the crawl-to-training-text
    step every web corpus runs (trafilatura/jusText's core move, as a
    deterministic Catalyst chain): drop script/style/head/nav/footer/
    aside blocks WITH their contents (boilerplate text must go, not
    just its markup), strip remaining tags to spaces, and normalize
    whitespace. Pure regexp_replace — scan-side, zero shuffle, shared
    Java-regex/RE2 syntax so a DuckDB oracle can replay it.

    Assumptions (ADVICE r10): tag matching is case-INSENSITIVE
    (``<SCRIPT>`` drops like ``<script>``), but each dropped block
    must be properly CLOSED and non-nested — an unclosed ``<script>``
    leaks its text (the non-greedy close-tag match finds no end), and
    a nested same-tag block ends at the FIRST close tag. Real crawl
    HTML that violates this needs a tolerant parser, not a regex."""
    out = html
    for tag in _HTML_BLOCK_DROP:
        out = F.regexp_replace(out, f"(?is)<{tag}\\b[^>]*>.*?</{tag}>", " ")
    out = F.regexp_replace(out, "<[^>]+>", " ")
    return F.trim(F.regexp_replace(out, r"\s+", " "))


def html_title(html: Column) -> Column:
    """The <title> text (empty string when absent — regexp_extract's
    no-match contract)."""
    return F.regexp_extract(html, "(?s)<title>(.*?)</title>", 1)


def html_link_count(html: Column) -> Column:
    """Number of anchor OPENING tags — the link-density numerator
    boilerplate classifiers use."""
    return F.size(F.regexp_extract_all(html, F.lit(r"<a\b"), 0))
