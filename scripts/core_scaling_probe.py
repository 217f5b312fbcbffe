#!/usr/bin/env python
"""Core-scaling probe at ×8 data (r18 VERDICT item 7).

The driver's c8-vs-c32 comparison at sf0.1 was uninformative: every
bench query is scheduling-bound at that size, so 8 cores tied or beat
32 on all 25 queries and a genuinely-serial operator would be
indistinguishable from a tiny one. This probe replicates the sf0.1
inputs ×8 with distinct keys (scale_probe.py's re-keying, artifact-safe
query set only — no pair-emitters whose output grows ×k² under
identical-text replication) and times the heaviest such queries at
local[32] vs local[8] under exact bench settings (interpreted, noop
sink, min-of-3). A low/high time ratio approaching 4 means the 4×
cores are being consumed; ~1 means the operator is still overhead- or
serial-bound even at ×8.

Usage: python scripts/core_scaling_probe.py   (~15 min; .corescale/ tmp)
Appends the result JSON to stdout; paste the table into PLANS.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

BASE_SF = "/root/testdata/sf0.1"
TMP = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   ".corescale")
K = 8
CPUS = (32, 8)
REPEATS = 3

#: heaviest artifact-safe queries (all members of scale_probe.PROBES,
#: whose re-keying rules these tables reuse), spanning all fact tables.
QUERIES = {
    "token_pagerank": {"documents": ["doc_id"]},
    "curate_corpus_gopher": {"documents": ["doc_id"]},
    "events_stickiness_hll": {"events": ["user_id"]},
    "dedup_semantic": {"embeddings": ["vec_id"]},
    "quality_perplexity": {"documents": ["doc_id"]},
    "q1_pricing_summary": {"lineitem": ["l_orderkey"]},
}


def _replicate_all(spark) -> None:
    tables: dict[str, list | None] = {}
    for spec in QUERIES.values():
        tables.update(spec)
    # fixed dims any query reads implicitly
    for table, keys in tables.items():
        df = spark.read.parquet(f"{BASE_SF}/{table}.parquet")
        if keys is not None:
            reps = spark.range(K).withColumnRenamed("id", "__rep")
            df = df.crossJoin(F.broadcast(reps))
            for key in keys:
                df = df.withColumn(key, F.col(key) * K + F.col("__rep"))
            df = df.drop("__rep")
        df = df.repartition(32)  # avoid the few-huge-files scan artifact
        df.write.mode("overwrite").parquet(f"{TMP}/{table}.parquet")
    # copy any remaining base tables as-is so load() finds them
    for fn in os.listdir(BASE_SF):
        src = os.path.join(BASE_SF, fn)
        dst = os.path.join(TMP, fn)
        if not os.path.exists(dst):
            if os.path.isdir(src):
                shutil.copytree(src, dst)
            else:
                shutil.copy(src, dst)


def main() -> None:
    from spark_sentiment_spark import get_spark
    from spark_sentiment_spark.plans.registry import (all_queries,
                                                      release_caches)

    qs = all_queries()
    os.makedirs(TMP, exist_ok=True)

    stage = get_spark(master="local[32]", shuffle_partitions=32,
                      extra_conf={"spark.ui.enabled": "false",
                                  "spark.driver.memory": "8g"})
    stage.sparkContext.setLogLevel("ERROR")
    _replicate_all(stage)
    stage.stop()

    results: dict[str, dict] = {n: {} for n in QUERIES}
    try:
        for cpus in CPUS:
            spark = get_spark(
                master=f"local[{cpus}]", shuffle_partitions=cpus,
                extra_conf={"spark.ui.enabled": "false",
                            "spark.driver.memory": "8g",
                            "spark.sql.codegen.wholeStage": "false"})
            spark.sparkContext.setLogLevel("ERROR")
            for name in QUERIES:
                spark.sparkContext.setJobDescription(
                    f"corescale:{name}@c{cpus}")
                runs = []
                for _ in range(REPEATS):
                    t0 = time.perf_counter()
                    (qs[name](spark, TMP).write.format("noop")
                     .mode("overwrite").save())
                    runs.append(round(time.perf_counter() - t0, 3))
                    release_caches()
                results[name][f"c{cpus}"] = {"min": min(runs), "runs": runs}
                print(f"c{cpus} {name}: min {min(runs)} {runs}", flush=True)
            spark.stop()
    finally:
        shutil.rmtree(TMP, ignore_errors=True)

    for name, r in results.items():
        r["c8_over_c32"] = round(r["c8"]["min"] / r["c32"]["min"], 2)
    print(json.dumps({"k": K, "base": BASE_SF, "repeats": REPEATS,
                      "results": results}))


if __name__ == "__main__":
    main()
