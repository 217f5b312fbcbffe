"""Word-list extraction (M16) semantics, pinned against Spark's own
CountVectorizer: the reference (SRC/CreateScoreList.scala:41) collects the
*fitted* vocabulary, and CountVectorizer.fit selects on document frequency
alone — minTF only filters transform-time counts. extract_wordlists must
therefore include a term that appears ONCE per document in >= minDF docs."""

import pytest
from pyspark.sql import functions as F

from spark_sentiment_spark.operators.wordlist_extraction import (
    extract_wordlists,
    extract_wordlists_dict,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["text", "label"])


def test_vocabulary_matches_countvectorizer_fit(spark):
    """Differential: per category, our vocabulary == the vocabulary of an
    actual CountVectorizer(minTF=2, minDF=3).fit on the same tokens."""
    from pyspark.ml.feature import CountVectorizer

    rows = [
        # 'solo' appears once per doc in 3 docs -> in CV vocabulary even
        # though its per-doc tf never reaches minTF=2.
        ("solo alpha alpha", "pos"),
        ("solo beta beta", "pos"),
        ("solo gamma", "pos"),
        ("alpha alpha beta", "pos"),
        ("rare", "pos"),
    ]
    df = _docs(spark, rows)
    cv = CountVectorizer(inputCol="toks", outputCol="vec", minTF=2.0,
                         minDF=3.0)
    toks = df.select(F.split("text", " ").alias("toks"))
    expected = set(cv.fit(toks).vocabulary)

    got = {
        r["word"]
        for r in extract_wordlists(df, "text", "label", min_df=3,
                                   overlap_limit=2).collect()
    }
    assert got == expected
    assert "solo" in got  # the case the old tf>=minTF-in-fit filter dropped


def test_min_tf_never_affects_vocabulary(spark):
    rows = [(f"once filler{i}", "pos") for i in range(5)]
    df = _docs(spark, rows)
    out = extract_wordlists(df, "text", "label", min_tf=2, min_df=5)
    words = {r["word"] for r in out.collect()}
    assert words == {"once"}
    row = out.where(F.col("word") == "once").first()
    assert row["doc_freq"] == 5 and row["total_tf"] == 5


def test_overlap_words_removed_everywhere(spark):
    rows = []
    for cat in ("a", "b", "c"):
        rows += [(f"shared own_{cat}", cat)] * 5
    df = _docs(spark, rows)
    out = extract_wordlists_dict(df, "text", "label", min_df=5,
                                 overlap_limit=2)
    # 'shared' is in all 3 category vocabularies (> overlap_limit=2) ->
    # removed from every list; each category keeps its own word.
    assert out == {"a": ["own_a"], "b": ["own_b"], "c": ["own_c"]}


def test_overlap_at_limit_is_kept(spark):
    rows = []
    for cat in ("a", "b"):
        rows += [(f"shared own_{cat}", cat)] * 5
    df = _docs(spark, rows)
    out = extract_wordlists_dict(df, "text", "label", min_df=5,
                                 overlap_limit=2)
    # present in exactly 2 vocabularies == limit -> kept (strict >).
    assert out == {"a": ["own_a", "shared"], "b": ["own_b", "shared"]}
