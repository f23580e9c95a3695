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
    """Count of stopword tokens (array filter — no per-char regex; the
    regexp_count form showed pathological slowdowns in long-lived JVMs)."""
    wl = words or STOPWORDS_EN
    return F.size(F.filter(tokens(col), lambda x: x.isin(wl))).cast("long")


def with_quality_metrics(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append quality metric columns in two narrow projections.

    The naive single-select form repeats the token-split/regexp
    subexpressions inside every ratio — Catalyst does not CSE them and
    codegen evaluates each copy (measured ~25× slower at sf0.1). Stage 1
    computes each base count exactly once; stage 2 derives ratios from
    the materialized counts.
    """
    c = F.col(text_col)
    base = df.withColumns(
        {
            "n_chars": F.length(c).cast("long"),
            "n_alpha": F.length(F.regexp_replace(c, "[^a-zA-Z]", "")).cast("long"),
            "n_punct": F.length(F.regexp_replace(c, "[^.,;:!?]", "")).cast("long"),
            "n_tokens": token_count(c),
            "n_stopwords": stopword_count(c),
        }
    )
    denom = F.greatest(F.col("n_chars"), F.lit(1))
    tok_denom = F.greatest(F.col("n_tokens"), F.lit(1))
    alpha_ratio = F.col("n_alpha") / denom
    punct_ratio = F.col("n_punct") / denom
    stop_ratio = F.col("n_stopwords") / tok_denom
    score = (
        alpha_ratio
        - punct_ratio * 2
        + F.least(stop_ratio * 2, F.lit(0.4))
        + F.when((F.col("n_tokens") >= 10) & (F.col("n_tokens") <= 5000), 0.2).otherwise(0.0)
    )
    return base.withColumns(
        {
            "alpha_ratio": F.round(alpha_ratio, 4),
            "punct_ratio": F.round(punct_ratio, 4),
            "stopword_ratio": F.round(stop_ratio, 4),
            "mean_word_len": F.round(F.col("n_alpha") / tok_denom, 4),
            "quality_score": F.round(score, 4),
        }
    )


def lang_scores(col: Column) -> dict[str, Column]:
    """Per-language stopword-hit counts (the n-gram-lexicon heuristic)."""
    return {lang: stopword_count(col, words) for lang, words in LANG_STOPWORDS.items()}


def lang_id(col: Column) -> Column:
    """argmax language by stopword hits; ties broken by fixed order
    en > es > de > fr; CJK characters short-circuit to 'zh'."""
    s = lang_scores(col)
    best = (
        F.when(col.rlike("[\\x{4e00}-\\x{9fff}]"), "zh")
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


def winnowing_fingerprints(
    docs: DataFrame,
    k: int = 8,
    window: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken).

    Rolling char k-gram hashes; from every window of ``window``
    consecutive hashes keep the minimum — the classic local fingerprint
    for plagiarism/near-dup detection, guaranteed to share fingerprints
    with any document containing a common substring ≥ k+window-1 chars.

    Hash = md5-hex of the k-gram (portable to the DuckDB oracle; md5-hex
    min is order-equivalent to a rolling hash min). One explode + one
    window-min + distinct — no Python.
    """
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9]+", " "))
    n_grams = F.greatest(F.length("_norm") - (k - 1), F.lit(0))
    gram = F.transform(
        F.sequence(F.lit(1), n_grams), lambda i: F.md5(F.col("_norm").substr(i, F.lit(k)))
    )
    grams = (
        docs.select(F.col(id_col).alias("doc_id"), norm.alias("_norm"))
        .select("doc_id", F.posexplode(gram).alias("pos", "h"))
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("doc_id").orderBy("pos").rowsBetween(0, window - 1)
    bounded = grams.withColumn("fp", F.min("h").over(w)).withColumn(
        "_max_pos", F.max("pos").over(W.partitionBy("doc_id"))
    )
    return (
        bounded.filter(F.col("pos") <= F.col("_max_pos") - (window - 1))
        .select("doc_id", "fp")
        .distinct()
    )
