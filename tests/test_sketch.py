"""Semantic invariants for the sketch/layout family (plans/sketch_queries):
oracle parity itself is covered by test_oracle.py — these pin the claims the
oracles can't see: estimator error bounds, CMS one-sidedness, Z-order
locality, and the no-global-window plan shape."""

from pyspark.sql import functions as F

from spark_sentiment_spark.plans.registry import REGISTRY, all_queries
from tests.conftest import SF_DIR

all_queries()


def test_hll_error_within_band(spark):
    """256-bucket HLL has sigma ~= 1.04/sqrt(256) = 6.5%; at sf0.001's
    ~1.5k distinct orderkeys a 25% band is ~4 sigma — a deterministic
    estimate either sits inside it forever or the estimator is wrong."""
    row = REGISTRY["agg_hll_sketch"].fn(spark, SF_DIR).collect()[0]
    assert row["n_exact"] > 0
    assert row["n_est"] > 0
    assert 0 < row["n_buckets"] <= 256
    assert row["rel_err"] < 0.25, row


def test_cms_estimates_are_one_sided(spark):
    """Count-min can only overcount: min-of-bucket-sums >= exact count for
    every probed token, and the sketch itself stays at its fixed size."""
    from spark_sentiment_spark.plans.registry import release_caches

    rows = REGISTRY["token_cms_topk"].fn(spark, SF_DIR).collect()
    release_caches()
    assert len(rows) == 20
    for r in rows:
        assert r["n_est"] >= r["n_exact"], r
        assert r["overcount"] == r["n_est"] - r["n_exact"]
    # top-k ordering is by exact count desc, then token
    counts = [r["n_exact"] for r in rows]
    assert counts == sorted(counts, reverse=True)


def test_zorder_files_are_local_in_both_dims(spark):
    """The point of Z-order: each z-range file covers a small square of
    the (part, supp) grid, so BOTH per-file spans stay far below the full
    range (row-order gives ~1.0 on at least one dim). Mean span <= 0.35
    holds with huge margin for the 32x32-cell blocks 64 files imply."""
    df = REGISTRY["zorder_layout"].fn(spark, SF_DIR)
    rows = df.collect()
    assert rows, "no files produced"
    li_n = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").count()
    assert sum(r["n_rows"] for r in rows) == li_n
    mean_part = sum(r["part_span"] for r in rows) / len(rows)
    mean_supp = sum(r["supp_span"] for r in rows) / len(rows)
    assert mean_part <= 0.35, mean_part
    assert mean_supp <= 0.35, mean_supp


def test_zorder_plan_has_no_global_window(spark):
    """The layout must come from broadcast bounds + arithmetic, never a
    global ntile/sort window (the single-partition scale killer)."""
    df = REGISTRY["zorder_layout"].fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, plan[:2000]


def test_salted_join_spreads_keys(spark):
    """The salted join's pre-shuffle key space is (partkey x 8 salts):
    verify the salt column actually takes all 8 values on this corpus so
    the spread is real, not vestigial."""
    from spark_sentiment_spark.operators.skew import salted_join

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select("l_partkey")
    part = (spark.read.parquet(f"{SF_DIR}/part.parquet")
            .select(F.col("p_partkey").alias("l_partkey"), "p_brand"))
    out = salted_join(li, part, ["l_partkey"], n_salts=8)
    # reconstruct the salt the same way the operator does on the left side
    salted = li.withColumn(
        "_salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()),
                        F.lit(8)))
    n_salts = salted.select("_salt").distinct().count()
    assert n_salts == 8
    assert out.count() == li.join(part, "l_partkey").count()


def test_quantile_histogram_within_one_bin(spark):
    """The rank-target value lives in the hit bin and the interpolated
    estimate also lies inside that bin, so |est - exact| < bin width is a
    theorem, not a tolerance — check it for all three quantiles."""
    df = REGISTRY["quantile_histogram_sketch"].fn(spark, SF_DIR)
    rows = {r["quantile"]: r for r in df.collect()}
    assert set(rows) == {"0.50", "0.95", "0.99"}

    vals = (spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .select("n_chars").toPandas()["n_chars"])
    lo, hi, n = int(vals.min()), int(vals.max()), len(vals)
    width = (hi - lo + 1) / 128.0
    s = vals.sort_values().reset_index(drop=True)
    for lbl, num, den in [("0.50", 1, 2), ("0.95", 19, 20), ("0.99", 99, 100)]:
        target = -(-num * n // den)          # ceil(num*n/den)
        assert rows[lbl]["target"] == target
        exact = float(s.iloc[target - 1])    # target-th smallest
        assert abs(rows[lbl]["est_value"] - exact) < width, (lbl, exact)


def test_skew_profile_invariants(spark):
    """Structural invariants of the skew diagnostic: totals reconcile
    with the raw tables, the frequency order max >= p99 >= 1 holds, and
    skew_ratio >= 1 (equality only for a perfectly uniform key)."""
    rows = {r["key_col"]: r
            for r in REGISTRY["skew_profile"].fn(spark, SF_DIR).collect()}
    assert set(rows) == {"l_partkey", "l_suppkey", "o_custkey"}
    li_n = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").count()
    ord_n = spark.read.parquet(f"{SF_DIR}/orders.parquet").count()
    for col, r in rows.items():
        assert r["n_rows"] == (ord_n if col == "o_custkey" else li_n)
        assert r["max_freq"] >= r["p99_freq"] >= 1
        assert 0 < r["top1_share"] <= 1
        assert r["skew_ratio"] >= 1.0, r
        assert r["n_keys"] <= r["n_rows"]
