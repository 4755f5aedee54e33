"""Text-analysis functions for large-scale training-data pipelines:
tokenization, shingling, quality scoring, language-ID heuristic,
document fingerprinting.

All pure Catalyst expressions (split / transform / aggregate / regexp) —
they run inside whole-stage codegen over 100 TB of documents with zero
Python. Each has an exact ANSI-SQL twin used by the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: tiny function-word lists for the language-ID heuristic (public knowledge;
#: deliberately small — langid at scale swaps in a real model via mapInPandas)
LANG_MARKERS = {
    "en": ["the", "of", "and", "a", "to", "in"],
    "es": ["el", "la", "de", "que", "los", "una"],
    "fr": ["le", "la", "les", "des", "est", "une"],
    "de": ["der", "die", "das", "und", "ist", "ein"],
}

STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it"]


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def normalized(col: Column | str) -> Column:
    """lowercase, collapse whitespace, strip non [a-z0-9 ]."""
    return F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(_c(col)), r"[^a-z0-9\s]", " "), r"\s+", " "
        )
    )


def tokens(col: Column | str) -> Column:
    """Whitespace tokens of the normalized text (array<string>)."""
    return F.split(normalized(col), " ")


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


def shingles_from_tokens(toks: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles from a *materialized* tokens column.

    ``toks`` must be a plain column reference, NOT the tokens(...)
    expression: lambda bodies inline their captured expressions per array
    element, so passing the regex-split pipeline here would re-run it
    3× per shingle (measured ~20× slowdown on the LSH stage).

    element_at is 1-based, matching DuckDB list indexing, so the oracle SQL
    is a literal transliteration.
    """

    return F.array_distinct(ngram_windows(toks, n))


def ngram_windows(toks: Column, n: int) -> Column:
    """ALL word n-gram windows, duplicates preserved (array<string>) —
    the raw form :func:`shingles_from_tokens` distincts, needed as-is by
    repetition statistics where the duplicate count IS the signal.
    Same materialized-``toks`` contract as shingles_from_tokens."""

    def shingle_at(i: Column) -> Column:
        parts = [F.element_at(toks, (i + j).cast("int")) for j in range(n)]
        return F.concat_ws(" ", *parts)

    # guard: sequence(1, 0) would DESCEND in Spark, so short docs need an
    # explicit empty array (DuckDB's range(1, 1) is naturally empty)
    idx = F.sequence(F.lit(1), F.size(toks) - (n - 1))
    return F.when(
        F.size(toks) >= n, F.transform(idx, shingle_at)
    ).otherwise(F.array().cast("array<string>"))


def word_shingles(col: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram shingles (array<string>), the MinHash input.
    Convenience form; hot paths should materialize ``tokens()`` into a
    column first and use ``shingles_from_tokens`` (see its docstring)."""
    return shingles_from_tokens(tokens(col), n)


def punct_ratio(col: Column | str) -> Column:
    raw_len = F.length(_c(col))
    alnum = F.length(F.regexp_replace(_c(col), r"[a-zA-Z0-9\s]", ""))
    return F.when(raw_len > 0, alnum / raw_len).otherwise(F.lit(0.0))


def stopword_ratio(col: Column | str) -> Column:
    toks = tokens(col)
    n_stop = F.size(F.filter(toks, lambda t: t.isin(STOPWORDS)))
    return F.when(F.size(toks) > 0, n_stop / F.size(toks)).otherwise(F.lit(0.0))


def mean_word_len(col: Column | str) -> Column:
    toks = tokens(col)
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return F.when(F.size(toks) > 0, total / F.size(toks)).otherwise(F.lit(0.0))


def quality_score(col: Column | str) -> Column:
    """Composite document-quality heuristic in [0,1]: favors mid-length docs
    with a natural stopword rate and low symbol noise. Deterministic,
    SQL-twin-able; a production pipeline would learn these weights."""
    n = token_count(col).cast("double")
    len_score = F.least(n / F.lit(50.0), F.lit(1.0))
    stop_score = F.least(stopword_ratio(col) * 4.0, F.lit(1.0))
    noise_penalty = F.least(punct_ratio(col) * 5.0, F.lit(1.0))
    return F.round(
        0.5 * len_score + 0.5 * stop_score - 0.25 * noise_penalty, 6
    )


def language_id(col: Column | str) -> Column:
    """Heuristic language ID: argmax over marker-token hit counts, 'und' when
    no marker hits. (At scale: swap for a fastText-style model in
    mapInPandas; the plumbing is identical.)"""
    toks = tokens(col)
    scored = []
    for lang, markers in LANG_MARKERS.items():
        cnt = F.size(F.filter(toks, lambda t: t.isin(markers)))
        scored.append(F.struct(cnt.alias("score"), F.lit(lang).alias("lang")))
    best = F.greatest(*scored)  # struct compare: score first, then lang
    return F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und"))


#: BPE-ish pre-tokenization pattern (GPT-2-style word/number/punct split,
#: simplified to the RE2-compatible subset so the DuckDB oracle matches):
#: letter runs | digit runs | single non-alnum-non-space | space runs
BPE_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def bpe_ish_tokens(col: Column | str) -> Column:
    """Regex pre-tokenizer approximating BPE token boundaries (array<string>).
    Real BPE merges would run as a vocabulary-broadcast mapInPandas stage;
    the boundary split is the part that matters for token *counting*."""
    return F.regexp_extract_all(_c(col), F.lit(BPE_PATTERN), 0)


def bpe_ish_token_count(col: Column | str) -> Column:
    return F.size(bpe_ish_tokens(col))


def doc_fingerprint(col: Column | str) -> Column:
    """Content fingerprint: sha256 of the normalized text — whitespace/case/
    punctuation-insensitive exact-dup key."""
    return F.sha2(normalized(col), 256)


#: PII patterns, ordered — redaction applies them in this order, so a
#: string matched by an earlier pattern is gone before later ones run
#: (an email's domain can't then match as a hostname-ish token). Patterns
#: stay in the RE2-compatible subset (no backrefs/lookaround) and are
#: alternation-free, so Java-regex (Spark) and RE2 (DuckDB/Go oracles)
#: produce identical matches.
PII_PATTERNS: list[tuple[str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"),
    ("phone", r"\+\d{7,15}"),  # E.164-ish international form
]


def pii_redact(col: Column | str) -> Column:
    """Replace each PII match with its ``[TYPE]`` placeholder — chained
    builtin ``regexp_replace``, whole-stage codegen, zero Python. The
    masking-transform idea (MaskStrings, T12) applied corpus-side: a
    training-data pipeline redacts before the text ever reaches a model."""
    out = _c(col)
    for name, pat in PII_PATTERNS:
        out = F.regexp_replace(out, pat, f"[{name.upper()}]")
    return out


def pii_counts(col: Column | str) -> list[Column]:
    """Per-type match counts (``<name>_n`` columns), for corpus PII audits."""
    return [
        F.regexp_count(_c(col), F.lit(pat)).alias(f"{name}_n")
        for name, pat in PII_PATTERNS
    ]


# -- script detection ---------------------------------------------------------

#: Unicode script classes for corpus script-mix detection. Values are
#: (java_regex_class, re2_class): Spark's JVM regexes spell a script
#: \p{IsHan}, DuckDB's RE2 spells it \p{Han} — the pair keeps the engine
#: and its SQL oracle on the same character sets. Order is the
#: deterministic dominance tie-break.
SCRIPT_CLASSES: list[tuple[str, str, str]] = [
    ("latin", r"\p{IsLatin}", r"\p{Latin}"),
    ("cjk", r"\p{IsHan}\p{IsHiragana}\p{IsKatakana}\p{IsHangul}",
     r"\p{Han}\p{Hiragana}\p{Katakana}\p{Hangul}"),
    ("cyrillic", r"\p{IsCyrillic}", r"\p{Cyrillic}"),
    ("arabic", r"\p{IsArabic}", r"\p{Arabic}"),
    ("digit", "0-9", "0-9"),
    # spelled explicitly, NOT \s: Java's \s includes vertical tab U+000B,
    # RE2's does not — the explicit class keeps both engines identical
    ("space", r" \t\n\x0B\f\r", r" \t\n\x0B\f\r"),
]


def _script_count(col: Column, java_class: str) -> Column:
    # chars IN the class = total minus chars left after deleting them;
    # long from the start — an int count * 1e6 overflows int32 at ~2.1k
    # chars, a perfectly ordinary document length
    return (
        F.length(col) - F.length(F.regexp_replace(col, f"[{java_class}]", ""))
    ).cast("long")


def script_ratios(col: Column | str) -> list[Column]:
    """Per-script character fractions as exact ppm longs (aliased
    ``<script>_ppm`` + ``other_ppm``) — the script-mix signal multilingual
    corpus cleaning filters on (wrong-script spam, mixed-script
    homoglyph attacks, mojibake). Pure codegen: one regexp_replace and
    two lengths per script, zero shuffles; integer fixed-point so the
    DuckDB oracle hashes identically."""
    c = _c(col)
    n = F.length(c)
    out, covered = [], None
    for name, jcls, _ in SCRIPT_CLASSES:
        cnt = _script_count(c, jcls)
        covered = cnt if covered is None else covered + cnt
        out.append(
            F.when(n > 0, F.floor(cnt * F.lit(1_000_000) / n))
            .otherwise(F.lit(0)).cast("long").alias(f"{name}_ppm")
        )
    out.append(
        F.when(n > 0, F.floor((n - covered) * F.lit(1_000_000) / n))
        .otherwise(F.lit(0)).cast("long").alias("other_ppm")
    )
    return out


def dominant_script(col: Column | str) -> Column:
    """Name of the script with the most characters ('other'/'none' when
    unscripted/empty); ties break by SCRIPT_CLASSES order."""
    c = _c(col)
    counts = [(name, _script_count(c, jcls))
              for name, jcls, _ in SCRIPT_CLASSES]
    other = F.length(c) - sum(cnt for _, cnt in counts)
    counts.append(("other", other))
    m = F.greatest(*[cnt for _, cnt in counts])
    expr = F.lit("none")
    for name, cnt in reversed(counts):
        expr = F.when((m > 0) & (cnt == m), F.lit(name)).otherwise(expr)
    return expr
