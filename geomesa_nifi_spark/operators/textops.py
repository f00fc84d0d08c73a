"""Text analysis operators for a training-data pipeline, all JVM-side.

Language id, quality scoring, token counting, and fingerprinting over a
``documents``-shaped table — each implemented with built-in column
expressions only (whole-stage codegen, no Python in the hot path), so each
has an exact ANSI-SQL oracle.  These extend the reference's converter
expression language (cast/date/concat/try — SURVEY.md §2.2) with the
web-text operations a 100 TB corpus pipeline needs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TOKEN_PATTERN = "[a-z0-9]+"

# Small per-language stopword alternations — mirrored verbatim in the SQL
# oracles, so keep them regex-dialect-neutral (Java regex ∩ RE2).
LANG_PATTERNS: dict[str, str] = {
    "de": r"\b(der|die|und|den|von|das|mit|ist|nicht|ein)\b",
    "en": r"\b(the|and|of|to|in|is|that|it|for|was)\b",
    "es": r"\b(que|el|en|los|del|se|las|por|un|para)\b",
    "fr": r"\b(le|la|et|les|des|en|un|du|une|que)\b",
}
LANG_MIN_RATIO = 0.05


def token_count(text: Column) -> Column:
    return F.regexp_count(F.lower(text), F.lit(TOKEN_PATTERN))


def lang_scores(text: Column) -> dict[str, Column]:
    low = F.lower(text)
    return {lang: F.regexp_count(low, F.lit(pat)) for lang, pat in LANG_PATTERNS.items()}


def lang_id(text: Column) -> Column:
    """Argmax of stopword hits; ties resolved in alphabetical lang order;
    'und' when the best ratio is below threshold.  The CASE chain checks
    languages alphabetically, which is exactly how the SQL oracle breaks
    ties."""
    scores = lang_scores(text)
    toks = token_count(text)
    best = F.greatest(*scores.values())
    expr = F.lit("und")
    # Build WHEN chain: und if weak, else first (alphabetical) lang == best.
    chain = F.when(
        (toks == 0) | (best < F.lit(LANG_MIN_RATIO) * toks), F.lit("und")
    )
    for lang in sorted(scores):
        chain = chain.when(scores[lang] == best, F.lit(lang))
    return chain.otherwise(expr)


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality heuristic: alphabetic density + stopword
    signal + length band.  Deterministic arithmetic, mirrored in SQL."""
    n = F.length(text)
    alpha = F.length(F.regexp_replace(F.lower(text), "[^a-z]", ""))
    alpha_ratio = F.when(n > 0, alpha / n).otherwise(F.lit(0.0))
    toks = token_count(text)
    stop_hits = F.greatest(*lang_scores(text).values())
    stop_ratio = F.when(toks > 0, stop_hits / toks).otherwise(F.lit(0.0))
    length_band = F.least(n / F.lit(500.0), F.lit(1.0))
    return F.round(
        F.lit(0.4) * alpha_ratio
        + F.lit(0.4) * F.least(stop_ratio * 5, F.lit(1.0))
        + F.lit(0.2) * length_band,
        4,
    )


def normalized_fingerprint(text: Column) -> Column:
    """md5 of whitespace/punct-normalized lowercase text — the exact-dedup
    key (md5 exists in both Spark and DuckDB; xxhash64 does not)."""
    norm = F.trim(F.regexp_replace(F.lower(text), "[^a-z0-9]+", " "))
    return F.md5(norm)


def text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    t = F.col(text_col)
    return df.select(
        "doc_id",
        token_count(t).alias("n_tokens"),
        lang_id(t).alias("lang_pred"),
        quality_score(t).alias("quality"),
        normalized_fingerprint(t).alias("fingerprint"),
    )
