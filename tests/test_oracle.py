"""Replicates the driver's t2 gate locally at sf0.001: every catalog query
with an oracle must match DuckDB on row count, schema names, and values."""

import pytest

from spark_sentiment_spark.plans.registry import REGISTRY, all_queries
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
    assert ok, msg


@pytest.mark.parametrize("name", ROWS_ONLY_NAMES)
def test_rows_only_runs(spark, name):
    q = REGISTRY[name]
    df = q.fn(spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
