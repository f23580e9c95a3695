"""Text analysis for training-data pipelines: tokens, quality, lang-ID, fingerprint.

All pure JVM expressions (regexp/string functions, whole-stage codegen) —
no Python in the hot path. Every helper has an exactly-equivalent ANSI SQL
form used by the DuckDB oracles in ``__spark_entry__.py``; keep the two in
sync when changing semantics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# small per-language stopword signals for the n-gram/lexicon heuristic
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "in", "a"],
    "es": ["el", "la", "de", "que", "y", "los", "un"],
    "de": ["der", "die", "und", "das", "ist", "ein", "zu"],
    "fr": ["le", "la", "les", "et", "des", "un", "est"],
}

STOPWORDS_EN = LANG_STOPWORDS["en"]


def tokens(col: Column) -> Column:
    """Whitespace/punct word split, lowercased, empties removed."""
    toks = F.split(F.lower(col), "[^a-z0-9]+")
    return F.filter(toks, lambda x: x != "")


def token_count(col: Column) -> Column:
    return F.size(tokens(col)).cast("long")


def bpe_ish_token_count(col: Column) -> Column:
    """Sub-word-ish token estimate: word-boundary pieces + digit runs +
    punctuation marks (a cheap deterministic proxy for a BPE tokenizer)."""
    return (
        F.size(F.filter(F.split(F.lower(col), "[^a-z]+"), lambda x: x != ""))
        + F.size(F.filter(F.split(col, "[^0-9]+"), lambda x: x != ""))
        + F.length(F.regexp_replace(col, "[a-zA-Z0-9\\s]+", ""))
    ).cast("long")


def stopword_count(col: Column, words: list[str] | None = None) -> Column:
    pat = "\\b(" + "|".join(words or STOPWORDS_EN) + ")\\b"
    return F.regexp_count(F.lower(col), F.lit(pat)).cast("long")


def quality_metrics(col: Column) -> dict[str, Column]:
    """Length/alpha/punct/stopword signals + a composite quality score.

    Score: fraction-of-alpha, penalized by very short or punct-heavy text,
    boosted by a healthy stopword rate (the classic Gopher-style cheap
    filters, computed with integer counts so the oracle matches exactly).
    """
    n_chars = F.length(col).cast("long")
    n_alpha = F.length(F.regexp_replace(col, "[^a-zA-Z]", "")).cast("long")
    n_punct = F.length(F.regexp_replace(col, "[^.,;:!?]", "")).cast("long")
    n_tokens = token_count(col)
    n_stop = stopword_count(col)
    denom = F.greatest(n_chars, F.lit(1))
    tok_denom = F.greatest(n_tokens, F.lit(1))
    alpha_ratio = n_alpha / denom
    punct_ratio = n_punct / denom
    stop_ratio = n_stop / tok_denom
    mean_word_len = n_alpha / tok_denom
    score = (
        alpha_ratio
        - punct_ratio * 2
        + F.least(stop_ratio * 2, F.lit(0.4))
        + F.when((n_tokens >= 10) & (n_tokens <= 5000), 0.2).otherwise(0.0)
    )
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "n_alpha": n_alpha,
        "n_punct": n_punct,
        "n_stopwords": n_stop,
        "alpha_ratio": F.round(alpha_ratio, 4),
        "punct_ratio": F.round(punct_ratio, 4),
        "stopword_ratio": F.round(stop_ratio, 4),
        "mean_word_len": F.round(mean_word_len, 4),
        "quality_score": F.round(score, 4),
    }


def lang_scores(col: Column) -> dict[str, Column]:
    """Per-language stopword-hit counts (the n-gram-lexicon heuristic)."""
    out = {}
    for lang, words in LANG_STOPWORDS.items():
        pat = "\\b(" + "|".join(words) + ")\\b"
        out[lang] = F.regexp_count(F.lower(col), F.lit(pat)).cast("long")
    return out


def lang_id(col: Column) -> Column:
    """argmax language by stopword hits; ties broken by fixed order
    en > es > de > fr; CJK characters short-circuit to 'zh'."""
    s = lang_scores(col)
    best = (
        F.when(F.regexp_count(col, F.lit("[\\x{4e00}-\\x{9fff}]")) > 0, "zh")
        .when((s["en"] >= s["es"]) & (s["en"] >= s["de"]) & (s["en"] >= s["fr"]), "en")
        .when((s["es"] >= s["de"]) & (s["es"] >= s["fr"]), "es")
        .when(s["de"] >= s["fr"], "de")
        .otherwise("fr")
    )
    return best


def fingerprint(col: Column) -> Column:
    """Document fingerprint: md5 of case/whitespace-normalized text —
    identical in any engine with md5 (the oracle uses DuckDB's)."""
    norm = F.regexp_replace(F.lower(col), "[^a-z0-9]+", " ")
    return F.md5(F.trim(norm))
