"""Engine-grade empty-input contract: every catalog query must run on
EMPTY input tables (directory-layout parquet, matching schemas) without
crashing, returning an empty-or-constant result with a stable schema.
This is the shape a nightly pipeline hits on a quiet source — an engine
that throws on zero rows is not an engine. Also covers the
directory-table layout itself: the testdata ships single-FILE parquet,
so this is the one place every scan (including the streaming staging
shim) reads the standard Spark directory layout."""

import shutil
import tempfile

import pytest

from spark_sentiment_spark.plans.registry import (REGISTRY, all_queries,
                                                  release_caches)
from tests.conftest import SF_DIR

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def empty_sf(spark):
    tmp = tempfile.mkdtemp(prefix="empty_sf_")
    for t in TABLES:
        (spark.read.parquet(f"{SF_DIR}/{t}.parquet").limit(0)
         .write.parquet(f"{tmp}/{t}.parquet"))
    yield tmp
    shutil.rmtree(tmp, ignore_errors=True)


@pytest.mark.slow
def test_every_query_survives_empty_tables(spark, empty_sf):
    all_queries()
    failures = []
    for name, q in REGISTRY.items():
        try:
            df = q.fn(spark, empty_sf)
            df.count()
            assert len(df.schema.fields) > 0
        except Exception as ex:  # collect ALL failures, report once
            failures.append(f"{name}: {type(ex).__name__}: "
                            f"{str(ex).splitlines()[0][:90]}")
        finally:
            release_caches()
    assert not failures, "\n".join(failures)


@pytest.fixture(scope="module")
def single_row_sf(spark):
    """One row per table — the other canonical degenerate: exercises
    n-1 variance denominators, single-class training, and quantizers
    with fewer points than codewords."""
    tmp = tempfile.mkdtemp(prefix="single_sf_")
    for t in TABLES:
        (spark.read.parquet(f"{SF_DIR}/{t}.parquet").limit(1)
         .write.parquet(f"{tmp}/{t}.parquet"))
    yield tmp
    shutil.rmtree(tmp, ignore_errors=True)


@pytest.mark.slow
def test_every_query_survives_single_row_tables(spark, single_row_sf):
    all_queries()
    failures = []
    for name, q in REGISTRY.items():
        try:
            df = q.fn(spark, single_row_sf)
            df.count()
            assert len(df.schema.fields) > 0
        except Exception as ex:
            failures.append(f"{name}: {type(ex).__name__}: "
                            f"{str(ex).splitlines()[0][:90]}")
        finally:
            release_caches()
    assert not failures, "\n".join(failures)
