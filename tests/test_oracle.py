"""Replicates the driver's t2 gate locally at sf0.001: every catalog query
with an oracle must match DuckDB on row count, schema names, and values."""

import pytest

from spark_sentiment_spark.plans.registry import (REGISTRY, all_queries,
                                                  release_caches)
from tests.conftest import SF_DIR
from tests.oracle_utils import compare, duck_connection

all_queries()  # populate REGISTRY
ORACLE_NAMES = [n for n, q in REGISTRY.items() if q.sql is not None]
ROWS_ONLY_NAMES = [n for n, q in REGISTRY.items() if q.sql is None]


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF_DIR)
    yield con
    con.close()


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_match(spark, duck, name):
    q = REGISTRY[name]
    ok, msg = compare(q.fn(spark, SF_DIR), duck, q.sql, name)
    release_caches()  # full-catalog run in ONE session must not accumulate
    assert ok, msg


@pytest.mark.parametrize("name", ROWS_ONLY_NAMES)
def test_rows_only_runs(spark, name):
    q = REGISTRY[name]
    df = q.fn(spark, SF_DIR)
    n = df.count()
    release_caches()
    assert n >= 0
    assert len(df.schema.fields) > 0


def test_release_caches_leaves_nothing_cached(spark):
    """After a consuming action + release_caches(), the query's cached
    RDDs are gone — the long-lived-session contract for plans that persist
    intermediates. Tracked by RDD *id set*, not count: the async
    ContextCleaner may concurrently free localCheckpoint RDDs left by
    earlier tests' iterative queries, so absolute counts flake — only the
    ids THIS query added must appear and then disappear."""
    from spark_sentiment_spark.plans.registry import REGISTRY

    release_caches()  # drain anything tracked by earlier tests
    jsc = spark.sparkContext._jsc.sc()

    def cached_ids():
        it = jsc.getPersistentRDDs().keysIterator()
        ids = set()
        while it.hasNext():
            ids.add(it.next())
        return ids

    before = cached_ids()
    REGISTRY["dedup_minhash_lsh"].fn(spark, SF_DIR).count()
    added = cached_ids() - before
    assert added, "query persisted nothing"
    assert release_caches() >= 1
    assert not (added & cached_ids()), "tracked persists survived release"
