"""Character n-gram language-model perplexity scoring for corpus quality.

The standard training-data pipeline stage this repo's quality suite was
still missing: score every document by how "language-like" it is under a
small LM trained on a reference corpus, then gate on perplexity (the
CCNet / Wenzek et al. 2020 recipe, public; they use a word-level KenLM —
with no model libraries in this sandbox the same pipeline shape is built
on an add-k-smoothed character n-gram model, which needs only counting).

Spark-first shape, all JVM expressions:

- **Train** = one explode + two partial-aggregated ``groupBy`` counts
  over the reference corpus. The model is the (gram, count) relation —
  at most ``V^n`` rows (V = 37 after normalization: a-z, 0-9, space), so
  a few-MB broadcast even for n=4.
- **Score** = explode each document's grams, two broadcast joins against
  the model relations, one ``groupBy doc_id`` average. O(corpus chars)
  with no shuffle wider than the per-doc aggregation; zero Python.

Perplexity of doc d: ``exp(-mean_i ln p(g_i))`` with the add-k estimate
``p(gram) = (c(gram) + k) / (c(ctx) + k·V)`` where ``ctx`` is the gram's
(n-1)-char prefix. Unseen grams/contexts degrade smoothly through the
smoothing (count 0), so scoring a corpus disjoint from the training set
is well-defined.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: normalized alphabet size: a-z, 0-9, space
ALPHABET_SIZE = 37


def _norm(col: Column) -> Column:
    """lowercase, map every non-[a-z0-9 ] run to one space, collapse
    space runs, trim — the shared train/score normalization (identical
    regex semantics in any POSIX engine, so oracles can mirror it)."""
    squashed = F.regexp_replace(F.lower(col), "[^a-z0-9 ]+", " ")
    return F.trim(F.regexp_replace(squashed, " +", " "))


def _gram_rows(docs: DataFrame, n: int, text_col: str, id_col: str) -> DataFrame:
    """(doc_id, gram, ctx) — one row per character n-gram occurrence.

    The normalized text is materialized as a column in its own projection
    BEFORE the position lambda; inlining it would re-run the regexp chain
    once per gram (the measured CSE trap — see word_shingles,
    operators/dedup.py:40). Documents shorter than n grams simply emit
    nothing (callers LEFT JOIN back to the corpus)."""
    t = F.col("_t")
    # sequence(1, hi) with hi < 1 DESCENDS ([1, 0]) instead of being empty
    # (same trap as text._pair_counts) — short docs must gate to []
    idx = F.sequence(F.lit(1), F.length(t) - (n - 1))
    grams = F.when(
        F.length(t) >= n, F.transform(idx, lambda i: F.substring(t, i, F.lit(n)))
    ).otherwise(F.array().cast("array<string>"))
    return (
        docs.select(F.col(id_col).alias("doc_id"), _norm(F.col(text_col)).alias("_t"))
        .select("doc_id", F.explode(grams).alias("gram"))
        .withColumn("ctx", F.substring(F.col("gram"), 1, n - 1))
    )


def char_ngram_model(
    docs: DataFrame, n: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> tuple[DataFrame, DataFrame]:
    """Train: returns ``(gram_counts, ctx_counts)`` relations —
    ``(gram, c)`` and ``(ctx, c)``. Context counts are an aggregate OF
    the gram counts (sum over the n-th character), not a second corpus
    pass."""
    gram_counts = (
        _gram_rows(docs, n, text_col, id_col)
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    ctx_counts = (
        gram_counts.groupBy(F.substring(F.col("gram"), 1, n - 1).alias("ctx"))
        .agg(F.sum("c").alias("c"))
    )
    return gram_counts, ctx_counts


def lm_perplexity(
    docs: DataFrame,
    gram_counts: DataFrame,
    ctx_counts: DataFrame,
    n: int = 3,
    k: float = 1.0,
    text_col: str = "text",
    id_col: str = "doc_id",
    alphabet_size: int = ALPHABET_SIZE,
) -> DataFrame:
    """Score: per-document ``(doc_id, n_grams, ppl)`` where ``ppl`` is
    the add-k character n-gram perplexity (rounded to 3 decimals — the
    cross-engine float contract). Documents whose normalized text has no
    n-gram keep their row with ``n_grams = 0`` and NULL ``ppl`` (the
    quality gate decides their fate explicitly, they are not silently
    dropped). Model relations are broadcast — they are bounded by
    ``alphabet_size**n`` regardless of corpus size."""
    g = _gram_rows(docs, n, text_col, id_col)
    joined = g.join(
        F.broadcast(gram_counts.withColumnRenamed("c", "_cg")), "gram", "left"
    ).join(F.broadcast(ctx_counts.withColumnRenamed("c", "_cc")), "ctx", "left")
    logp = F.ln(
        (F.coalesce(F.col("_cg"), F.lit(0)) + F.lit(k))
        / (F.coalesce(F.col("_cc"), F.lit(0)) + F.lit(k * alphabet_size))
    )
    scored = joined.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_grams"), F.sum(logp).alias("_ll")
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_grams"), F.lit(0)).alias("n_grams"),
            F.round(F.exp(-F.col("_ll") / F.col("n_grams")), 3).alias("ppl"),
        )
    )


def lm_quality_filter(
    scored: DataFrame, max_ppl: float, keep_unscored: bool = False
) -> DataFrame:
    """Gate on the perplexity score: keep documents with
    ``ppl <= max_ppl``. ``keep_unscored`` decides the fate of documents
    too short to score (NULL ``ppl``) — the choice is forced to be
    explicit because a bare ``ppl <= x`` filter silently drops them."""
    cond = F.col("ppl") <= max_ppl
    if keep_unscored:
        cond = cond | F.col("ppl").isNull()
    return scored.filter(cond)
