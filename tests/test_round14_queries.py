"""Round-14 additions. `ann_ivfpq_persisted_probe` has an exact DuckDB
oracle (driver-routed, and swept by tests/test_oracle.py); these tests
pin what the driver row can't see: the three persisted artifacts and
their shapes (per-cell code partitions, centroids, codebook), and the
composition's consistency with its two certified halves."""

import glob

from tests.conftest import SF_DIR


def test_ivfpq_index_artifacts_are_staged(spark):
    """The build phase must leave all THREE artifacts on disk — the code
    table partitioned by cell (each vector in its IVF_ASSIGN=2 home
    cells, M small-int codes each), the K-row centroid table (probe
    routing replays from the artifact), and the M x K codebook (ADC
    tables replay from the artifact)."""
    from spark_sentiment_spark.plans.registry import (REGISTRY, all_queries,
                                                      release_caches)
    from spark_sentiment_spark.plans.similarity_queries import (IVF_ASSIGN,
                                                                PQ_K, PQ_M)

    all_queries()
    df = REGISTRY["ann_ivfpq_persisted_probe"].fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    base = next(seg for seg in plan.split("file:")[1:]
                if "ivfpq_index_" in seg).split("/codes", 1)[0]

    codes = spark.read.parquet(base + "/codes")
    assert sorted(f.name for f in codes.schema) == ["cell", "codes",
                                                    "vec_id"]
    n = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").count()
    assert codes.count() == IVF_ASSIGN * n   # multi-assignment: 2 cells each
    assert codes.select("vec_id").distinct().count() == n
    lens = codes.selectExpr("min(size(codes)) a", "max(size(codes)) b") \
        .first()
    assert lens["a"] == lens["b"] == PQ_M

    cent = spark.read.parquet(base + "/centroids")
    assert cent.count() == PQ_K
    cb = spark.read.parquet(base + "/codebook")
    assert cb.count() == PQ_M * PQ_K
    assert len(glob.glob(base + "/codes/cell=*")) == PQ_K
    release_caches()
    # track_staging_dir cleanup must reclaim the index (no staging leaks)
    assert not glob.glob(base + "/codes/cell=*")


def test_ivfpq_candidates_are_the_ivf_cells_pq_ranked(spark):
    """Consistency with the two certified halves: every IVFPQ result id
    must lie in the pure-IVF candidate universe (same probed cells — the
    coarse layer is shared arithmetic), and the exact-cosine values must
    agree with the brute-force query wherever the same (qid, vec_id)
    pair appears in both."""
    from spark_sentiment_spark.plans.registry import (REGISTRY, all_queries,
                                                      release_caches)

    all_queries()
    composed = REGISTRY["ann_ivfpq_persisted_probe"].fn(spark, SF_DIR) \
        .collect()
    exact = REGISTRY["knn_cosine_topk"].fn(spark, SF_DIR).collect()
    release_caches()
    assert composed, "fixture produced no top-k rows"
    exact_cos = {(r.qid, r.vec_id): r.cosine for r in exact}
    for r in composed:
        if (r.qid, r.vec_id) in exact_cos:
            assert abs(r.cosine - exact_cos[(r.qid, r.vec_id)]) < 1e-9
