"""Replicates the driver's t2 gate locally at sf0.001: every catalog query
with an oracle must match DuckDB on row count, schema names, and values.

Fast-loop rotation (round-11 VERDICT item 6): the full-catalog sweep is
the fast loop's dominant term and grows with the catalog. Each round a
deterministic half of the DRIVER-CERTIFIED queries (md5(name) % 2 ==
WINDOW_ROUND % 2, and the query has a green CORRECTNESS row in some
round) carries the slow mark — still run by the full suite (`pytest
tests/`, run at least once per round), by the driver's own gate, and
locally in the fast loop again next round as WINDOW_ROUND advances;
never-certified queries (new this round, or rows-only upgrades) always
run in the fast loop."""

import glob as _glob
import hashlib
import json
import os
import sys

import pytest

from spark_sentiment_spark.plans.registry import (REGISTRY, all_queries,
                                                  release_caches)
from tests.conftest import SF_DIR
from tests.oracle_utils import compare, duck_connection

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(_REPO, "scripts"))
from gen_window import WINDOW_ROUND  # noqa: E402

all_queries()  # populate REGISTRY
ORACLE_NAMES = [n for n, q in REGISTRY.items() if q.sql is not None]
ROWS_ONLY_NAMES = [n for n, q in REGISTRY.items() if q.sql is None]

_CERTIFIED = set()
for _path in _glob.glob(os.path.join(_REPO, "CORRECTNESS_r*.json")):
    with open(_path) as _f:
        for _name, _row in json.load(_f).items():
            if (_row.get("rows_match") and _row.get("schema_match")
                    and _row.get("hash_match")):
                _CERTIFIED.add(_name)


def _rotated_out(name: str) -> bool:
    shard = int(hashlib.md5(name.encode()).hexdigest(), 16) % 2
    return shard == WINDOW_ROUND % 2 and name in _CERTIFIED


def _in_shard(name: str) -> bool:
    """scripts/fast_loop.py splits the sweep across concurrent pytest
    processes via SPARK_GRAFT_ORACLE_SHARD="i/n" (md5-deterministic, the
    same scheme as the rotation). Unset → everything (the driver's full
    run and any plain `pytest tests/`)."""
    spec = os.environ.get("SPARK_GRAFT_ORACLE_SHARD")
    if not spec:
        return True
    i, n = (int(x) for x in spec.split("/"))
    return int(hashlib.md5(name.encode()).hexdigest(), 16) // 2 % n == i


_SWEEP = [pytest.param(n, marks=pytest.mark.slow) if _rotated_out(n) else n
          for n in ORACLE_NAMES if _in_shard(n)]


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF_DIR)
    yield con
    con.close()


@pytest.mark.parametrize("name", _SWEEP)
def test_oracle_match(spark, duck, name):
    q = REGISTRY[name]
    ok, msg = compare(q.fn(spark, SF_DIR), duck, q.sql, name)
    release_caches()  # full-catalog run in ONE session must not accumulate
    assert ok, msg


@pytest.mark.parametrize("name", [n for n in ROWS_ONLY_NAMES
                                  if _in_shard(n)])
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
