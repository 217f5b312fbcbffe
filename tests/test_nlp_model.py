"""Trained NLP sentiment backend (M14): the model artifact behind the
pluggable scorer contract, and the longest-sentence document reduction
(CoreNLPSentimentAnalyzer.scala:62-75) driven through it."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from spark_sentiment_spark.operators import nlp_model as M
from spark_sentiment_spark.operators.nlp_sentiment import (
    compute_sentiment,
    score_nlp,
)


def test_artifact_loads_and_predicts_deterministically():
    m1, m2 = M.load_model(), M.load_model()
    sents = ["what a wonderful fantastic amazing day",
             "terrible awful horrible broken garbage",
             "the report is on the table"]
    p1, p2 = M.predict(m1, sents), M.predict(m2, sents)
    assert p1 == p2
    assert all(0 <= c <= 4 for c in p1)


def test_model_separates_polarity():
    m = M.load_model()
    pos, neg, neu = M.predict(m, [
        "wonderful fantastic amazing superb excellent",
        "terrible awful horrible disgusting worthless",
        "the report is on the table in the house",
    ])
    assert pos >= 3
    assert neg <= 1
    assert abs(neu - 2) <= 1


def test_holdout_accuracy_floor():
    """Approximation quality pinned as a number: the shipped artifact must
    hit >=0.55 exact / >=0.75 within-one-class on a held-out seed."""
    m = M.load_model()
    sents, labels = M._synth_examples(seed=99, per_class=60)
    pred = np.asarray(M.predict(m, sents))
    y = np.asarray(labels)
    assert (pred == y).mean() >= 0.55
    assert (np.abs(pred - y) <= 1).mean() >= 0.75


def test_longest_sentence_rule_with_model_backend():
    """Document class == the model's class of the LONGEST sentence
    (CoreNLPSentimentAnalyzer.computeSentiment:62-66), not the first or
    the majority."""
    extract = M.model_scorer_factory()
    short_pos = "wonderful amazing superb."
    long_neg = ("this was a truly terrible awful horrible broken "
                "worthless disgusting experience from start to finish")
    text = f"{short_pos} {long_neg}"
    doc_cls = compute_sentiment(text, extract)
    model_cls_of_longest = M.predict(M.load_model(), [long_neg])[0]
    assert doc_cls == model_cls_of_longest
    assert doc_cls <= 1  # and the longest sentence is clearly negative


def test_analyze_our_nlp_end_to_end(spark, tmp_path):
    """analyze(method='our-nlp') routes the trained backend: scored column
    present, classes in 0..4, and clearly-polar docs land on the right
    side."""
    from spark_sentiment_spark.analyze import SCORE_COL, analyze

    rows = [
        (0, "wonderful fantastic amazing superb excellent product"),
        (1, "terrible awful horrible disgusting worthless experience"),
    ] * 5
    path = str(tmp_path / "docs.parquet")
    spark.createDataFrame(rows, ["id", "text"]).write.parquet(path)
    out = analyze(spark, path, method="our-nlp", column="text").collect()
    by_id = {r["id"]: r[SCORE_COL] for r in out}
    assert by_id[0] >= 3 and by_id[1] <= 1


def test_worker_scorer_cache_is_keyed_by_factory():
    """Two different factories in one process must not share a scorer."""
    from spark_sentiment_spark.operators.nlp_sentiment import (
        _lexicon_sentence_scorer,
        _worker_scorer,
    )

    a = _worker_scorer(_lexicon_sentence_scorer)
    b = _worker_scorer(M.model_scorer_factory)
    assert a is not b
    assert _worker_scorer(_lexicon_sentence_scorer) is a  # cached


def test_score_nlp_with_model_factory(spark):
    df = spark.createDataFrame(
        [(1, "wonderful fantastic amazing superb excellent")], ["id", "t"])
    out = score_nlp(df, "t", "cls", M.model_scorer_factory).collect()
    assert out[0]["cls"] >= 3
