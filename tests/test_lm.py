"""Char n-gram LM perplexity scoring (operators/lm.py) — hand-computed
goldens, smoothing on unseen text, short-doc row preservation, explicit
unscored handling in the gate, and a JVM-only plan."""

import pytest
from pyspark.sql import functions as F

from kafka_plugins_spark.operators.lm import (
    char_ngram_model,
    lm_perplexity,
    lm_quality_filter,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
    )


def _scores(spark, train_texts, score_texts, **kw):
    gc, cc = char_ngram_model(_docs(spark, train_texts))
    out = lm_perplexity(_docs(spark, score_texts), gc, cc, **kw)
    return {r["doc_id"]: (r["n_grams"], r["ppl"]) for r in out.collect()}


def test_hand_computed_perplexity(spark):
    """Corpus 'abab': trigrams aba, bab each once; contexts ab, ba each
    once. p = (1+1)/(1+37) = 2/38 for both grams of the doc itself, so
    ppl = exp(-mean ln(2/38)) = 19 exactly. The 2-char doc scores no
    gram and keeps its row with NULL ppl."""
    got = _scores(spark, ["abab", "ab"], ["abab", "ab"])
    assert got[0] == (2, 19.0)
    assert got[1] == (0, None)


def test_unseen_text_smooths_to_uniform(spark):
    """Every gram and context unseen → p = k/(k·V) = 1/37 per gram, so
    ppl = 37 regardless of length — smoothing, not NULLs or crashes."""
    got = _scores(spark, ["abc abc abc"], ["xyzq"])
    assert got[0] == (2, 37.0)


def test_normalization_is_shared(spark):
    """Case/punctuation differences must not change the score: 'AB!ab'
    normalizes to 'ab ab' for both training and scoring."""
    a = _scores(spark, ["AB!ab"], ["ab ab"])
    b = _scores(spark, ["ab ab"], ["AB?!  ab"])
    assert a == b and a[0][0] == 3


def test_in_distribution_scores_below_gibberish(spark):
    train = ["the cat sat on the mat", "the dog sat on the rug"]
    got = _scores(spark, train, ["the cat sat on the rug", "zq xv qq jj wklm"])
    assert got[0][1] < got[1][1]


def test_quality_filter_unscored_is_explicit(spark):
    gc, cc = char_ngram_model(_docs(spark, ["abab"]))
    scored = lm_perplexity(_docs(spark, ["abab", "x"]), gc, cc)
    kept = lm_quality_filter(scored, max_ppl=20.0)
    assert [r["doc_id"] for r in kept.collect()] == [0]
    kept_all = lm_quality_filter(scored, max_ppl=20.0, keep_unscored=True)
    assert sorted(r["doc_id"] for r in kept_all.collect()) == [0, 1]


def test_plan_is_jvm_only_with_broadcast_model(spark):
    docs = _docs(spark, ["abab c dd", "qq rr ss"])
    gc, cc = char_ngram_model(docs)
    plan = (
        lm_perplexity(docs, gc, cc)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan, "model relations must broadcast"
