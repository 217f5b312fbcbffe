"""Property-based differential tests (hypothesis): each custom operator
is checked against an independent naive formulation on random inputs —
the SURVEY §5.2 strategy extended from golden corpora to generated ones.
Example counts are small (Spark jobs per example) but each exercises
edge cases goldens miss: empty sides, ties, singletons, long chains.
"""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

PROP = settings(
    deadline=None, max_examples=6, derandomize=True,
    suppress_health_check=list(HealthCheck),
)

events = st.lists(
    st.tuples(st.integers(0, 3),          # key
              st.integers(0, 500),        # time
              st.integers(0, 9)),         # value
    min_size=0, max_size=40)


@PROP
@given(left=events, right=events, strict=st.booleans())
def test_asof_native_and_cogrouped_agree(spark, left, right, strict):
    l_df = spark.createDataFrame(left, "u long, t long, i long")
    r_df = spark.createDataFrame(right, "u long, t long, v long")
    from spark_sentiment_spark.operators.asof import (
        asof_join, asof_join_cogrouped)

    kwargs = dict(on=["u"], left_time="t", right_time="t",
                  value_cols={"v": "last_v"}, strict=strict)
    native = sorted(map(tuple, asof_join(l_df, r_df, **kwargs)
                        .select("u", "t", "i", "last_v").collect()))
    cogrp = sorted(map(tuple, asof_join_cogrouped(l_df, r_df, **kwargs)
                       .select("u", "t", "i", "last_v").collect()))
    assert native == cogrp


intervals = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 500), st.integers(1, 60)),
    min_size=0, max_size=15)


@PROP
@given(points=events, ivals=intervals)
def test_range_join_matches_naive_theta(spark, points, ivals):
    p = spark.createDataFrame(points, "k long, pt long, v long") \
        .withColumn("pt", F.timestamp_seconds("pt"))
    i = spark.createDataFrame(
        [(k, s, s + w) for k, s, w in ivals], "k long, s long, e long"
    ).select("k", F.timestamp_seconds("s").alias("s"),
             F.timestamp_seconds("e").alias("e"))
    from spark_sentiment_spark.operators.rangejoin import (
        point_in_interval_join)

    fast = sorted(map(tuple, point_in_interval_join(
        p, i, ["k"], "pt", "s", "e", bucket_seconds=7).collect()))
    naive = sorted(map(tuple, p.join(i, "k")
                       .where((F.col("pt") >= F.col("s"))
                              & (F.col("pt") < F.col("e"))).collect()))
    assert fast == naive


@PROP
@given(edges=st.lists(
    st.tuples(st.integers(0, 7), st.integers(0, 7)), min_size=1, max_size=15))
def test_components_match_union_find(spark, edges):
    from spark_sentiment_spark.operators.components import (
        connected_components)

    df = spark.createDataFrame(edges, "a long, b long")
    got = {r["node"]: r["comp"]
           for r in connected_components(df, "a", "b").collect()}

    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent[find(a)] = find(b)
    roots = {}
    for n in parent:
        roots.setdefault(find(n), []).append(n)
    want = {n: min(ns) for ns in roots.values() for n in ns}
    assert got == want
