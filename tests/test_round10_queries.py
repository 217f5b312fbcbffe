"""Round-10 additions: the distributed-ntile RFM twin, small-file
compaction, and the streaming SCD2 merge consumer. Each query also has
a DuckDB oracle (driver-routed); these tests pin the properties the
oracle can't see — in-Spark differential equality against the
single-partition twin (tie-heavy constructed corpora included), actual
part-file counts, and stream==batch dimension equality."""

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


RFM_COLS = ["user_id", "r_days", "f_events", "m_e4",
            "r_score", "f_score", "m_score"]


def test_rfm_distributed_equals_ntile_twin_on_fixture(spark):
    from spark_sentiment_spark.plans.events_queries import (
        events_rfm_distributed, events_rfm_scores)

    a = _rows(events_rfm_scores(spark, SF_DIR), RFM_COLS)
    b = _rows(events_rfm_distributed(spark, SF_DIR), RFM_COLS)
    assert a == b


def test_rfm_distributed_equals_ntile_twin_on_tie_corpus(spark):
    """Adversarial ties: every axis value collides across many users
    (identical day, identical event counts, identical value mass), so
    quintile membership is decided ENTIRELY by the user_id tiebreak —
    the case where naive percentile-cutpoint scoring diverges and the
    rank-recovery form must still match ntile exactly. 103 users keeps
    n % 5 != 0 so the unequal-bucket-size closed form is exercised."""
    from spark_sentiment_spark.plans.events_queries import (
        events_rfm_distributed, events_rfm_scores)

    tmp = tempfile.mkdtemp(prefix="rfm_ties_")
    try:
        rows = []
        for u in range(103):
            for i in range(3):  # identical f_events and m_e4 for all users
                rows.append((u * 3 + i, u, "click",
                             f"2024-01-01 12:{i:02d}:00", 1.5))
        (spark.createDataFrame(
            rows, "event_id long, user_id long, event_type string,"
                  " ts_s string, value double")
         .select("event_id", "user_id", "event_type",
                 F.to_timestamp("ts_s").alias("ts"), "value")
         .write.mode("overwrite").parquet(f"{tmp}/events.parquet"))
        a = _rows(events_rfm_scores(spark, tmp), RFM_COLS)
        b = _rows(events_rfm_distributed(spark, tmp), RFM_COLS)
        assert a == b
        # ties split across buckets: all five quintiles occupied per axis
        assert {r[4] for r in b} == {1, 2, 3, 4, 5}
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@pytest.mark.parametrize("n_users", [1, 4, 7])
def test_rfm_distributed_small_n(spark, n_users):
    """n < 5 and n % 5 != 0 exercise the q=0 and ragged-bucket branches
    of the closed-form ntile recovery."""
    from spark_sentiment_spark.plans.events_queries import (
        events_rfm_distributed, events_rfm_scores)

    tmp = tempfile.mkdtemp(prefix="rfm_small_")
    try:
        rows = [(u, u, "buy", f"2024-01-{u + 1:02d} 00:00:00", float(u))
                for u in range(n_users)]
        (spark.createDataFrame(
            rows, "event_id long, user_id long, event_type string,"
                  " ts_s string, value double")
         .select("event_id", "user_id", "event_type",
                 F.to_timestamp("ts_s").alias("ts"), "value")
         .write.mode("overwrite").parquet(f"{tmp}/events.parquet"))
        a = _rows(events_rfm_scores(spark, tmp), RFM_COLS)
        b = _rows(events_rfm_distributed(spark, tmp), RFM_COLS)
        assert a == b
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_compact_small_files_counts_and_content(spark):
    from spark_sentiment_spark.plans.sketch_queries import (
        io_compact_small_files)

    out = io_compact_small_files(spark, SF_DIR)
    rows = out.collect()
    assert rows, "compaction returned no groups"
    assert all(r["files_before"] == 64 and r["files_after"] == 4
               for r in rows)
    direct = (spark.read.parquet(f"{SF_DIR}/events.parquet")
              .groupBy("event_type")
              .agg(F.count(F.lit(1)).cast("bigint").alias("n"),
                   F.countDistinct("user_id").cast("bigint")
                   .alias("n_users"),
                   F.sum(F.floor(F.col("value") * 10000).cast("bigint"))
                   .cast("bigint").alias("val_e4")))
    a = sorted((r["event_type"], r["n"], r["n_users"], r["val_e4"])
               for r in rows)
    b = sorted((r["event_type"], r["n"], r["n_users"], r["val_e4"])
               for r in direct.collect())
    assert a == b, "compaction changed table content"


def test_streaming_scd2_merge_equals_batch_history(spark):
    """Stream==batch: the foreachBatch merge's final dimension version
    must equal the batch full rebuild (the same contract the oracle
    checks, pinned here engine-internally without DuckDB)."""
    from spark_sentiment_spark.plans.events_queries import (
        events_scd2_history)
    from spark_sentiment_spark.plans.streaming_queries import (
        streaming_scd2_merge)

    cols = ["user_id", "state", "valid_from", "valid_to", "version",
            "is_current"]
    a = _rows(events_scd2_history(spark, SF_DIR), cols)
    b = _rows(streaming_scd2_merge(spark, SF_DIR), cols)
    assert a == b


def test_streaming_scd2_merge_writes_versioned_dimension(spark):
    """The sink contract AND the version chain: the delta is staged as
    three event-time-ordered files at one file per trigger, so the full
    fixture must produce exactly v0 (the pre-stream dimension) plus
    THREE merged versions — batch N+1 reading batch N's output is
    thereby exercised on real data, not asserted by construction.
    Replay safety comes from each batch owning its version directory."""
    import glob

    from spark_sentiment_spark.plans import registry
    from spark_sentiment_spark.plans.streaming_queries import (
        streaming_scd2_merge)

    before = set(registry._STAGED_DIRS)
    streaming_scd2_merge(spark, SF_DIR).count()
    new_dirs = [d for d in registry._STAGED_DIRS
                if d not in before and "scd2stream_dim_" in d]
    assert new_dirs, "dimension staging dir not tracked"
    versions = sorted(os.path.basename(p)
                      for p in glob.glob(new_dirs[-1] + "/v*"))
    assert versions == ["v0", "v1", "v2", "v3"], versions


def _winnow_reference(tokens, k=3, w=4):
    """Brute-force winnowing per the MOSS paper: hash every k-gram,
    slide windows of w hashes, select each window's min (rightmost on
    ties). Returns (n_kgrams, sorted selected (pos, hash) set)."""
    import hashlib

    if len(tokens) < k:
        return 0, []
    hs = []
    for i in range(len(tokens) - k + 1):
        kgram = " ".join(tokens[i:i + k])
        hx = hashlib.md5(kgram.encode()).hexdigest()[:12]
        hs.append(int(hx, 16))
    sel = set()
    for s in range(len(hs) - w + 1):
        window = hs[s:s + w]
        mn = min(window)
        # rightmost tie
        q = max(j for j in range(s, s + w) if hs[j] == mn)
        sel.add((q + 1, hs[q]))
    return len(hs), sorted(sel)


def test_winnowing_matches_bruteforce(spark):
    """The lag/lead reach formulation must equal the window-by-window
    definition — checked doc by doc on the fixture corpus (fp count,
    min, and sum pin the selected SET, not just its size)."""
    from spark_sentiment_spark.plans.corpus_queries import doc_winnowing

    docs = {r["doc_id"]: r["text"] for r in
            (spark.read.parquet(f"{SF_DIR}/documents.parquet")
             .where(F.col("text").isNotNull())
             .select("doc_id", "text").collect())}
    got = {r["doc_id"]: r for r in doc_winnowing(spark, SF_DIR).collect()}
    checked = 0
    for doc_id, text in docs.items():
        tokens = text.strip().split()
        if len(tokens) < 3:
            assert doc_id not in got
            continue
        n_kg, sel = _winnow_reference(tokens)
        r = got[doc_id]
        assert r["n_kgrams"] == n_kg, doc_id
        assert r["n_fp"] == len(sel), doc_id
        if sel:
            hashes = [h for _, h in sel]
            assert r["fp_min"] == min(hashes), doc_id
            assert r["fp_sum"] == sum(hashes), doc_id
        else:
            assert r["fp_min"] is None and r["fp_sum"] is None, doc_id
        checked += 1
    assert checked >= 100  # the fixture corpus genuinely exercises it


def test_winnowing_guarantee_every_window_covered(spark):
    """The paper's coverage guarantee: every window of W consecutive
    k-grams contains at least one selected fingerprint (density may be
    low, but no gap of W goes unfingerprinted)."""
    from spark_sentiment_spark.plans.corpus_queries import doc_winnowing

    out = doc_winnowing(spark, SF_DIR).collect()
    for r in out:
        if r["n_kgrams"] >= 4:
            assert r["n_fp"] >= 1
            # max gap bound: n_fp >= ceil(n_windows / w) is implied by
            # per-window coverage; check the weak form cheaply here (the
            # bruteforce test pins exact sets)
            assert r["n_fp"] >= (r["n_kgrams"] - 3 + 3) // 4


def test_winnowing_pairs_invariants(spark):
    """Pair-level sanity the oracle's hash can't express as a rule:
    shared fingerprints never exceed either side's fingerprint count,
    overlap_ppm is a valid Jaccard ppm, and every emitted pair really
    shares >= 2 capped fingerprints (threshold respected)."""
    from spark_sentiment_spark.plans.corpus_queries import (
        dedup_winnowing_pairs)

    rows = dedup_winnowing_pairs(spark, SF_DIR).collect()
    assert rows, "fixture corpus should produce candidate pairs"
    for r in rows:
        assert 2 <= r["n_shared"] <= min(r["n_fp_a"], r["n_fp_b"])
        union = r["n_fp_a"] + r["n_fp_b"] - r["n_shared"]
        assert r["overlap_ppm"] == r["n_shared"] * 1_000_000 // union
        assert 0 < r["overlap_ppm"] <= 1_000_000


@pytest.mark.parametrize("seed", [11, 23, 47])
def test_rfm_distributed_seeded_fuzz(spark, seed):
    """Seeded random corpora with heavy duplicate mass on every axis
    (few distinct days/counts/values over many users) — broad-spectrum
    insurance that the rank-recovery closed form equals ntile beyond
    the hand-constructed shapes."""
    import numpy as np

    from spark_sentiment_spark.plans.events_queries import (
        events_rfm_distributed, events_rfm_scores)

    rng = np.random.default_rng(seed)
    n_users = int(rng.integers(20, 200))
    rows = []
    eid = 0
    for u in range(n_users):
        for _ in range(int(rng.integers(1, 4))):
            day = int(rng.integers(1, 6))            # ~5 distinct days
            val = float(rng.integers(1, 4)) / 2.0    # ~3 distinct values
            rows.append((eid, u, "e",
                         f"2024-01-{day:02d} 08:00:00", val))
            eid += 1
    tmp = tempfile.mkdtemp(prefix=f"rfm_fuzz_{seed}_")
    try:
        (spark.createDataFrame(
            rows, "event_id long, user_id long, event_type string,"
                  " ts_s string, value double")
         .select("event_id", "user_id", "event_type",
                 F.to_timestamp("ts_s").alias("ts"), "value")
         .write.mode("overwrite").parquet(f"{tmp}/events.parquet"))
        a = _rows(events_rfm_scores(spark, tmp), RFM_COLS)
        b = _rows(events_rfm_distributed(spark, tmp), RFM_COLS)
        assert a == b
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_streaming_scd2_intermediate_versions_equal_rebuilds(spark):
    """The strongest chaining property: EVERY intermediate dimension
    version vK (K = 1..3) must equal a full `_scd2_dim` rebuild over all
    events before that batch's upper cutoff — merge(merge(v0, Δ1), Δ2)
    can only equal rebuild(<cut2) if batch 2 really consumed batch 1's
    output. Version directories are read back with the writer schema
    (the lake-table contract)."""
    import glob

    from pyspark.sql import functions as F

    from spark_sentiment_spark.plans import registry
    from spark_sentiment_spark.plans.events_queries import _scd2_dim
    from spark_sentiment_spark.plans.registry import load
    from spark_sentiment_spark.plans.streaming_queries import (
        streaming_scd2_merge)

    before = set(registry._STAGED_DIRS)
    streaming_scd2_merge(spark, SF_DIR).count()
    dim_dir = [d for d in registry._STAGED_DIRS
               if d not in before and "scd2stream_dim_" in d][-1]
    assert sorted(os.path.basename(p)
                  for p in glob.glob(dim_dir + "/v*")) \
        == ["v0", "v1", "v2", "v3"]

    ev = load(spark, SF_DIR, "events")
    lo, hi = ev.agg(F.min(F.unix_millis("ts")),
                    F.max(F.unix_millis("ts"))).first()
    cuts = [lo + (hi - lo) * k // 10 for k in (7, 8, 9)] + [hi + 1]
    cols = ["user_id", "state", "valid_from", "valid_to", "version"]
    schema = _scd2_dim(ev.limit(0)).schema
    for k in (1, 2, 3):
        got = _rows(spark.read.schema(schema).parquet(f"{dim_dir}/v{k}"),
                    cols)
        want = _rows(_scd2_dim(ev.where(
            F.unix_millis("ts") < cuts[k])), cols)
        assert got == want, f"v{k} != rebuild at cutoff {k}"
