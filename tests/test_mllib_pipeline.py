"""MLlib pipeline (M1-M12): determinism, accuracy gate, save/load parity
(SURVEY.md §5.2.3)."""

import pytest
from pyspark.sql import functions as F


POS_WORDS = ["good", "great", "happy", "love", "excellent", "wonderful"]
NEG_WORDS = ["bad", "awful", "sad", "hate", "terrible", "horrible"]
FILL = ["the", "a", "movie", "film", "today", "yesterday", "thing", "story"]


@pytest.fixture(scope="module")
def labeled_corpus(spark):
    """Deterministic synthetic labeled corpus: label 1 rows draw from the
    positive vocabulary, label 0 from the negative one."""
    import random

    rng = random.Random(13)
    rows = []
    for i in range(400):
        label = i % 2
        vocab = POS_WORDS if label else NEG_WORDS
        words = [rng.choice(vocab) for _ in range(4)] + \
                [rng.choice(FILL) for _ in range(4)]
        rng.shuffle(words)
        rows.append((i, label, " ".join(words)))
    return spark.createDataFrame(rows, "id int, label int, text string")


@pytest.fixture(scope="module")
def trained(labeled_corpus):
    from spark_sentiment_spark.operators.mllib_pipeline import train

    # naivebayes: cheapest family; sweep exercises the grid machinery.
    return train(labeled_corpus, "text", classifier="naivebayes",
                 parallelism=2)


def test_accuracy_above_reference_gate(trained):
    # Reference gate: < 0.65 is "Precision SUCKS" (MlLib...scala:78).
    assert trained.precision >= 0.65
    assert trained.classifier == "naivebayes"


def test_prediction_schema(trained, labeled_corpus):
    from spark_sentiment_spark.operators.mllib_pipeline import score_model

    out = score_model(labeled_corpus, trained.model)
    assert "prediction" in out.columns
    # intermediates dropped (P3)
    for col in ("words", "tf", "tfidf", "rawPrediction", "probability"):
        assert col not in out.columns
    # prediction matches the planted signal almost everywhere
    agreement = out.agg(
        F.avg((F.col("prediction") == F.col("label")).cast("double"))
    ).first()[0]
    assert agreement >= 0.9


def test_save_load_roundtrip(trained, labeled_corpus, tmp_path):
    from spark_sentiment_spark.operators.mllib_pipeline import (load_model,
                                                                score_model)

    path = str(tmp_path / "model")
    trained.save(path)
    back = load_model(path)
    a = score_model(labeled_corpus, trained.model).select("id", "prediction")
    b = score_model(labeled_corpus, back).select("id", "prediction")
    assert a.exceptAll(b).count() == 0


def test_train_all_full_sweep_selects_argmax(labeled_corpus):
    """M10/M11 end-to-end at reference semantics: classifier="all" with
    sweep on runs all 33 grid fits + 3 static fits
    (MlLibSentimentAnalyser.scala:36-53 — LR 3x3, NB 6, RF 3x3x2) and
    must keep the family whose best validation accuracy is the maximum.
    The returned family_precisions audit trail lets us recompute the
    argmax independently."""
    from spark_sentiment_spark.operators.mllib_pipeline import train

    t = train(labeled_corpus, "text", classifier="all", parallelism=4)
    assert set(t.family_precisions) == {"logistic", "naivebayes",
                                        "maxentropy"}
    assert t.precision == max(t.family_precisions.values())
    assert t.family_precisions[t.classifier] == t.precision
    # the planted pos/neg vocabulary is separable — every family should
    # clear the reference's lowest accuracy gate, winner included
    assert t.precision >= 0.65


def test_deterministic_split(labeled_corpus):
    # seed-0 split is stable across runs (MlLib...scala:125-127)
    s1 = labeled_corpus.randomSplit([0.7, 0.2, 0.1], seed=0)
    s2 = labeled_corpus.randomSplit([0.7, 0.2, 0.1], seed=0)
    for a, b in zip(s1, s2):
        assert a.exceptAll(b).count() == 0


def test_prepare_labels_value_column(spark):
    from spark_sentiment_spark.operators.mllib_pipeline import prepare_labels

    df = spark.createDataFrame(
        [(i, float(i % 2), f"text body number {i} with several words here")
         for i in range(30)],
        "id int, polarity double, text string")
    out, label = prepare_labels(df)
    assert label == "polarity"
    assert "score" in out.columns


def test_prepare_labels_string_categorical(spark):
    from spark_sentiment_spark.operators.mllib_pipeline import prepare_labels

    df = spark.createDataFrame(
        [(i, "pos" if i % 2 else "neg",
          f"text body number {i} with several words here")
         for i in range(30)],
        "id int, sentiment string, text string")
    out, label = prepare_labels(df)
    assert label == "converted_categorical"
    vals = {r["score"] for r in out.select("score").distinct().collect()}
    assert vals == {0.0, 1.0}
