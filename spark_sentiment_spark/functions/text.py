"""Text normalization as native Column expressions.

The reference cleans text with a row-at-a-time Scala UDF
(``Helper.cleanString``, SRC/utils/Helper.scala:77-84). Here the same chain is
pure ``regexp_replace`` Column expressions — JVM-side, whole-stage-codegen'd,
and transparent to Catalyst (predicate pushdown/pruning still apply). The rule
list is a single source of truth from which we also generate the equivalent
DuckDB SQL for the correctness oracle.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Ordered (pattern, replacement) pairs applied after lower(); mirrors
# SRC/utils/Helper.scala:78-83 exactly (quotes, control chars, retweet
# markers, @mentions, hash signs, URLs, whitespace squeeze).
CLEANING_STEPS: tuple[tuple[str, str], ...] = (
    ('"', ""),
    ("'", ""),
    ("\\n", ""),
    ("\\r", ""),
    ("\\t", ""),
    ("rt\\s+", ""),
    ("@\\w+", ""),
    ("#", ""),
    ("http\\S+", ""),
    (" +", " "),
    ("\\s+", " "),
)


def clean_text_col(col: Column | str) -> Column:
    """lower + the reference's full regexp cleaning chain, as one Column."""
    c = F.lower(F.col(col) if isinstance(col, str) else col)
    for pat, repl in CLEANING_STEPS:
        c = F.regexp_replace(c, pat, repl)
    return c


def clean_text_sql(expr: str) -> str:
    """Equivalent DuckDB SQL expression (RE2 'g' flag) for the oracle."""
    out = f"lower({expr})"
    for pat, repl in CLEANING_STEPS:
        # DuckDB string literals pass backslashes through verbatim — only
        # quotes need escaping.
        p = pat.replace("'", "''")
        r = repl.replace("'", "''")
        out = f"regexp_replace({out}, '{p}', '{r}', 'g')"
    return out


def emoji_to_word_col(col: Column | str, mapping: dict | None = None) -> Column:
    """Per-token emoji→word substitution (SRC/utils/Helper.scala:91-93,
    intended semantics — the reference emits the literal ``Some(word)``, a bug
    documented in quirks.md).

    Implemented natively: split on single spaces, map each token through a
    literal ``map<string,string>``, reassemble. The map is a bounded literal
    (≤1k entries) evaluated JVM-side — no shuffle, no Python.
    """
    from spark_sentiment_spark.functions.lexicon import emoji_dict

    mapping = mapping if mapping is not None else emoji_dict()
    pairs: list = []
    for k, v in sorted(mapping.items()):
        pairs.append(F.lit(k))
        pairs.append(F.lit(v))
    m = F.create_map(*pairs)
    c = F.col(col) if isinstance(col, str) else col
    return F.array_join(
        F.transform(F.split(c, " ", -1), lambda t: F.coalesce(m[t], t)), " "
    )


def stem_tokens_col(col: Column | str) -> Column:
    """Porter-stem each space-separated token via an Arrow pandas UDF
    (SRC/utils/Helper.scala:99-101). Python is unavoidable here — the stemmer
    has no Column-expression equivalent — so it runs Arrow-batched."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _stem(series: pd.Series) -> pd.Series:
        from spark_sentiment_spark.functions.stemmer import stem_tokens

        return series.map(lambda t: stem_tokens(t) if t is not None else None)

    return _stem(F.col(col) if isinstance(col, str) else col)


def remove_stopwords_col(col: Column | str, stopwords: list[str] | None = None) -> Column:
    """Drop (case-insensitively) the default English stop words from a
    space-tokenized string, natively via array_except on lowered tokens
    (StopWordsRemover with caseSensitive=false, SRC/utils/Helper.scala:58-62).
    """
    from pyspark.ml.feature import StopWordsRemover

    stopwords = stopwords or StopWordsRemover.loadDefaultStopWords("english")
    c = F.col(col) if isinstance(col, str) else col
    toks = F.split(c, " ", -1)
    sw = F.array(*[F.lit(w) for w in stopwords])
    return F.array_join(
        F.filter(toks, lambda t: ~F.array_contains(sw, F.lower(t))), " "
    )


def clean_source(
    df: DataFrame,
    input_col: str,
    output_col: str,
    stem: bool = False,
    tweet_tokenize: bool = True,
) -> DataFrame:
    """Full cleaning pipeline, mirroring ``Helper.cleanSource``
    (SRC/utils/Helper.scala:46-65): null-filter → [stem] → tweet-tokenize →
    emoji→word → clean chain → whitespace tokenize+lower → stopword removal →
    re-join.

    Deviation (documented in quirks.md): the reference stems *before*
    tokenizing (SRC/utils/Helper.scala:34), which stems URLs/@mentions that
    are later deleted; we keep that order for parity when ``stem=True``.
    """
    out = df.where(F.col(input_col).isNotNull())
    c: Column = F.col(input_col)
    if stem:
        c = stem_tokens_col(c)
    if tweet_tokenize:
        from spark_sentiment_spark.functions.tokenizer import tokenize_to_string_col

        c = tokenize_to_string_col(c)
    c = emoji_to_word_col(c)
    c = clean_text_col(c)
    # ml.Tokenizer lowercases + splits on \s+; ours is already single-spaced
    # and lowercased by the clean chain, so stopword removal applies directly.
    c = remove_stopwords_col(c)
    return out.withColumn(output_col, c)
