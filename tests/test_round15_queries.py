"""Round-15 additions. `ann_ivfpq_compacted_probe` has an exact DuckDB
oracle (driver-routed, and swept by tests/test_oracle.py); these tests
pin what the driver row can't see: that compaction preserves probe
results row-for-row against the one-shot index, that the measured
file counts obey the writer's fragmentation rule, and (in
test_plan_shape.py) that the compacted layout still directory-prunes."""

import glob

from tests.conftest import SF_DIR


def _probe_rows(df):
    return [(r["qid"], r["vec_id"], r["cosine"], r["rn"])
            for r in df.collect()]


def test_compacted_probe_identical_to_one_shot_index(spark):
    """Probe-identity across the whole lifecycle: the probe over the
    COMPACTED 4-batch-appended code table must equal the probe over the
    one-shot index row-for-row (same quantizer seeds, same rows — only
    the file layout differs). This is the maintenance-pass contract:
    compaction moves bytes, never rows."""
    from spark_sentiment_spark.plans.registry import (REGISTRY, all_queries,
                                                      release_caches)

    all_queries()
    compacted = _probe_rows(
        REGISTRY["ann_ivfpq_compacted_probe"].fn(spark, SF_DIR))
    one_shot = _probe_rows(
        REGISTRY["ann_ivfpq_persisted_probe"].fn(spark, SF_DIR))
    release_caches()
    assert compacted == one_shot and one_shot


def test_compaction_file_counts_follow_the_writer_rule(spark):
    """files_before/files_after must equal the writer's own rule
    measured from the REAL directories: each of the 4 appends
    hash-clusters on cell, so a cell dir gains one file per batch
    containing >=1 row assigned to it (distinct (batch, cell) pairs);
    the compact pass rewrites one file per cell (distinct cells). The
    oracle computes the same rule from its assignment CTE, so this test
    plus the driver row certify writer behavior end-to-end."""
    from pyspark.sql import functions as F

    from spark_sentiment_spark.plans.registry import (REGISTRY, all_queries,
                                                      release_caches)
    from spark_sentiment_spark.plans.similarity_queries import (
        N_COMPACT_BATCHES)

    all_queries()
    df = REGISTRY["ann_ivfpq_compacted_probe"].fn(spark, SF_DIR)
    row = df.limit(1).collect()[0]
    plan = df._jdf.queryExecution().executedPlan().toString()
    base = next(seg for seg in plan.split("file:")[1:]
                if "ivfpq_compact_" in seg).split("/codes", 1)[0]

    frag = glob.glob(base + "/codes/cell=*/*.parquet")
    comp = glob.glob(base + "/codes_compact/cell=*/*.parquet")
    assert row["files_before"] == len(frag)
    assert row["files_after"] == len(comp)
    assert row["files_before"] > row["files_after"]  # compaction happened

    codes = spark.read.parquet(base + "/codes")
    expect_before = (codes
                     .select((F.col("vec_id") % N_COMPACT_BATCHES)
                             .alias("b"), "cell")
                     .distinct().count())
    expect_after = codes.select("cell").distinct().count()

    # compacted table content == fragmented table content (bytes moved,
    # rows untouched)
    comp_rows = sorted(map(tuple, spark.read.parquet(
        base + "/codes_compact").select("vec_id", "cell").collect()))
    frag_rows = sorted(map(tuple, codes.select("vec_id", "cell").collect()))
    release_caches()
    assert row["files_before"] == expect_before
    assert row["files_after"] == expect_after
    assert comp_rows == frag_rows
