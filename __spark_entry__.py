"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship word-score sentiment plan at sf0.001;
``queries``/``oracle_sql`` expose the full operator catalog from
``spark_sentiment_spark.plans`` (SURVEY.md §2 + §7.4 extension surface).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from spark_sentiment_spark.plans.registry import all_queries

    return all_queries()["wordscore_sentiment"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 / §7.4."""
    from spark_sentiment_spark.plans.registry import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL twins for every ANSI-SQL-expressible query."""
    from spark_sentiment_spark.plans.registry import all_oracles

    return all_oracles()
