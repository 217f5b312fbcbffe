"""spark_sentiment_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of witlox/spark_sentiment, re-expressed Spark-first.

The reference (cited throughout as ``SRC/`` = ``/root/reference/src/main/
scala-2.11/ch/uzh/sentiment/``) is a Scala/Spark-2.1 batch sentiment engine.
This package is a ground-up PySpark rebuild: every computation is declared with
the DataFrame API so Catalyst/Tungsten pick the physical plan; Python executes
only where semantics genuinely require it (Porter stemmer, tweet tokenizer),
always as Arrow-batched pandas UDFs.

Layout
------
- ``sources``   — IO: format dispatch, CSV dialect sniffing, readers/writers
- ``functions`` — scalar/text functions: cleaning, stemmer, tokenizer, lexicon
- ``operators`` — engine operators: detection, word-score, the MLlib pipeline
                  (tokenize→TF→IDF→classifier + sweeps), wordlist extraction,
                  as-of/range joins, dedup clustering, multimodal plumbing
- ``streaming`` — Structured Streaming windows/sessionization over event data
- ``plans``     — the query catalog exposed to the correctness/bench harness
"""

from spark_sentiment_spark.session import get_spark


def __getattr__(name):
    # Lazy public API (keeps `import spark_sentiment_spark` light).
    import importlib

    api = {
        "analyze": ("spark_sentiment_spark.analyze", "analyze"),
        "load": ("spark_sentiment_spark.sources.io", "load"),
        "save": ("spark_sentiment_spark.sources.io", "save"),
        "detect_roles": ("spark_sentiment_spark.operators.detection",
                         "detect_roles"),
        "clean_source": ("spark_sentiment_spark.functions.text",
                         "clean_source"),
        "score_documents": ("spark_sentiment_spark.operators.wordscore",
                            "score_documents"),
        "train": ("spark_sentiment_spark.operators.mllib_pipeline", "train"),
        "score_model": ("spark_sentiment_spark.operators.mllib_pipeline",
                        "score_model"),
        "extract_wordlists": (
            "spark_sentiment_spark.operators.wordlist_extraction",
            "extract_wordlists"),
    }
    if name in api:
        mod, attr = api[name]
        return getattr(importlib.import_module(mod), attr)
    raise AttributeError(name)


__all__ = ["get_spark", "analyze", "load", "save", "detect_roles",
           "clean_source", "score_documents", "train", "score_model",
           "extract_wordlists"]
__version__ = "0.1.0"
