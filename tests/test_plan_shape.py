"""Plan-shape regression tests: the physical plans the engine is designed
to produce (broadcast joins for dims, pushed filters, pruned scans, no
Python in native paths) must not silently regress."""

import re

import pytest

from tests.conftest import SF_DIR


def _plan(spark, name):
    from spark_sentiment_spark.plans.registry import REGISTRY, all_queries

    all_queries()
    return REGISTRY[name].fn(spark, SF_DIR)._jdf.queryExecution() \
        .executedPlan().toString()


@pytest.mark.parametrize("name", ["q3_shipping_priority", "q5_local_supplier",
                                  "q10_returned_items"])
def test_tpch_joins_broadcast_dims(spark, name):
    plan = _plan(spark, name)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan     # dims are bounded → BHJ only


def test_q6_pushdown_and_pruning(spark):
    plan = _plan(spark, "q6_forecast_revenue")
    # NB: plan strings truncate long lists ("...") — match within the line.
    m = re.search(r"PushedFilters: \[[^\n]*l_shipdate", plan)
    assert m, "shipdate filter not pushed to the parquet scan"
    m = re.search(r"FileScan parquet \[([^\]]*)\]", plan)
    read_cols = m.group(1)
    # projection pruning: q6 needs 4 columns, not the 16-column lineitem
    assert len(read_cols.split(",")) <= 4


def test_wordscore_raw_is_pure_jvm(spark):
    plan = _plan(spark, "wordscore_sentiment")
    assert "BroadcastHashJoin" in plan     # lexicon probe is a broadcast join
    assert "Python" not in plan            # fully native path


def test_native_text_queries_have_no_python(spark):
    for name in ["clean_text", "quality_scores", "langid_stopword",
                 "doc_fingerprints", "dedup_exact", "dedup_minhash_lsh"]:
        plan = _plan(spark, name)
        assert "Python" not in plan, f"{name} plan fell back to Python"


def test_knn_broadcasts_queries_not_corpus(spark):
    plan = _plan(spark, "knn_cosine_topk")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


@pytest.mark.parametrize("name", ["q7_volume_shipping", "q9_product_profit",
                                  "q16_supplier_variety"])
def test_new_tpch_shapes_broadcast_and_push(spark, name):
    plan = _plan(spark, name)
    assert "BroadcastHashJoin" in plan
    assert "Python" not in plan


def test_q4_semi_join_physical(spark):
    plan = _plan(spark, "q4_priority_exists")
    assert "LeftSemi" in plan
    m = re.search(r"PushedFilters: \[[^\n]*o_orderdate", plan)
    assert m, "orderdate filter not pushed to the orders scan"


def test_tfidf_topk_native_with_broadcasts(spark):
    plan = _plan(spark, "text_tfidf_topk")
    assert "Python" not in plan            # explode/agg/window all JVM-side
    assert "BroadcastHashJoin" in plan     # df side broadcasts
    assert "Window" in plan


def test_gap_fill_single_window_shuffle(spark):
    plan = _plan(spark, "events_gap_fill")
    assert "Python" not in plan
    assert plan.count("Window") >= 1
    # forward-fill must be a running frame, not a re-sort per row
    assert "unboundedpreceding" in plan.lower()
