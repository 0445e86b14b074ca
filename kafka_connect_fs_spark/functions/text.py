"""Text analysis for training-data pipelines — all JVM-side built-ins.

Every function here composes ``pyspark.sql.functions`` (whole-stage
codegen, no Python in the hot path) and has an exact ANSI-SQL twin used by
the DuckDB oracle (see __spark_entry__.oracle_sql), so results are
hash-checked, not eyeballed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# deterministic stopword sets shared with the SQL oracles
STOPWORDS = {
    "en": ("the", "a", "of", "to", "and"),
    "es": ("el", "la", "de", "que", "y"),
    "de": ("der", "die", "das", "und", "ist"),
    "fr": ("le", "les", "des", "et", "est"),
}


def words(text: Column) -> Column:
    return F.split(text, " ")


def token_count(text: Column) -> Column:
    """Whitespace token count (documents are single-spaced)."""
    return F.size(words(text))


def idiv(a: Column, b: Column) -> Column:
    """Exact integer division for non-negative longs (< 2^53): floor of a
    correctly-rounded double quotient of exact integers equals a // b."""
    return F.floor(a / b).cast("long")


def distinct_token_ratio_bp(text: Column) -> Column:
    """Distinct-token ratio in basis points (integer 0..10000). Integer
    division keeps the value bit-identical across engines — float rounding
    at exact .00005 boundaries differs between Spark (HALF_UP on decimal
    repr) and DuckDB (binary rounding)."""
    w = words(text)
    return idiv(F.size(F.array_distinct(w)).cast("long") * 10000, F.size(w).cast("long"))


def stopword_count(text: Column, lang: str) -> Column:
    sw = STOPWORDS[lang]
    return F.size(F.filter(words(text), lambda x: x.isin(*sw)))


def language_scores(df: DataFrame, text_col: str = "text") -> DataFrame:
    """n-gram-free heuristic language ID: per-language stopword hit counts
    + deterministic argmax (ties resolved in fixed language order)."""
    out = df
    for lang in STOPWORDS:
        out = out.withColumn(f"score_{lang}", stopword_count(F.col(text_col), lang))
    langs = list(STOPWORDS)
    pred = F.lit("unknown")
    # build reversed so earlier languages win ties
    for lang in reversed(langs):
        others = [f"score_{l}" for l in langs if l != lang]
        cond = None
        for o in others:
            c = F.col(f"score_{lang}") >= F.col(o)
            cond = c if cond is None else (cond & c)
        pred = F.when(cond & (F.col(f"score_{lang}") > 0), F.lit(lang)).otherwise(pred)
    return out.withColumn("predicted_lang", pred)


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / repetition heuristics → integer quality score (basis points)
    + keep flag. All-integer arithmetic: exact on every engine."""
    n = token_count(F.col(text_col)).cast("long")
    ratio_bp = distinct_token_ratio_bp(F.col(text_col))
    mean_len_bp = idiv((F.length(F.col(text_col)).cast("long") - (n - 1)) * 10000, n)
    q_bp = F.least(n, F.lit(100).cast("long")) * 50 + idiv(ratio_bp, F.lit(2).cast("long"))
    return (
        df.withColumn("n_tokens", n)
        .withColumn("distinct_ratio_bp", ratio_bp)
        .withColumn("mean_token_len_bp", mean_len_bp)
        .withColumn("quality_bp", q_bp)
        .withColumn(
            "keep", ((n >= 5) & (n <= 10_000) & (ratio_bp > 2000)).cast("int")
        )
    )


def fingerprint(text: Column) -> Column:
    """Normalized-content fingerprint: md5(lower + whitespace-collapsed).

    EXPLICIT whitespace class, not \\s: Java regex counts \\x0B (vertical
    tab) as \\s while DuckDB's RE2 does not — a document containing one
    would hash differently per engine. The explicit class is identical in
    both. Matching SQL uses the same class."""
    return F.md5(F.regexp_replace(F.lower(text), r"[ \t\n\r\f\x0B]+", " "))


# BPE-ish pre-tokenizer: letter runs, digit runs, single punctuation marks
# (the GPT-2 pre-tokenizer's shape minus lookarounds). Whitespace is never
# a token — via an EXPLICIT class: Java's \\s includes \\x0B, RE2's does
# not, so \\s would make the count engine-dependent on vertical tabs.
BPE_ISH_PATTERN = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 \t\n\r\f\x0B]"


def token_count_bpe(text: Column) -> Column:
    """Subword-style token count via the BPE-ish pre-tokenizer regex —
    the length estimator a training pipeline budgets context windows with
    (whitespace counting under-counts punctuation-heavy text)."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_ISH_PATTERN), F.lit(0)))


def rolling_fingerprint(text: Column, window: int = 16) -> Column:
    """Content-defined rolling fingerprint: hash every ``window``-char
    slice and keep the lexicographic MIN (a 1-fingerprint winnowing sketch
    — Schleimer et al.'s MOSS scheme with one band). Robust to appends and
    small edits outside the minimizing window, unlike whole-document md5;
    the per-doc work is O(len) JVM-side md5s inside one transform, no
    shuffle until the final projection."""
    n = F.length(text)
    idx = F.when(n >= window, F.sequence(F.lit(1), n - (window - 1))).otherwise(
        F.array(F.lit(1))
    )
    hashes = F.transform(idx, lambda i: F.md5(text.substr(i, F.lit(window))))
    return F.array_min(hashes)
