#!/usr/bin/env python
"""Deep-volume probe (×32) for the two iterative graph queries —
token_pagerank and dedup_clusters — extending the ×1..×8 slopes in
SCALING.md (round-5 VERDICT item 5: confirm the fixed-cost claim holds
when the edge/pair tables stop fitting one comfortable shuffle round).

Replication shapes differ deliberately:

* token_pagerank re-keys doc_ids only (texts identical) — the
  co-occurrence VERTEX set is the vocabulary, which saturates on a web
  corpus long before the token stream does, so ×k data means ×k edge
  WEIGHT on a fixed graph. The realistic shape.
* dedup_clusters runs on BOTH shapes. "disjoint" prefixes every TOKEN
  with the replica id, giving k independent copies of the base dup
  structure — pairs, components and rounds scale the way k× more real
  data would. "identical texts" (re-key only) makes all k copies of a
  doc mutual 1.0-Jaccard near-dups — the exact-boilerplate shape of a
  real web corpus; before the round-6 exact-duplicate collapse inside
  dedup_clusters this grew the pair graph ×k² and OOMed the 8g driver
  at ×32, and now it is the DEMONSTRATION that the collapse absorbs
  exact-dup groups before the pair stage.

Appends (or replaces) the "×32 deep-volume probe" section of SCALING.md.
Usage: python scripts/deep_probe.py   (~6 min; uses .scaletmp32/, removed)
"""

from __future__ import annotations

import json
import os
import re
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

BASE_SF = "/root/testdata/sf0.1"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TMP = os.path.join(REPO, ".scaletmp32")
FACTORS = [1, 8, 32]
# (label, registry query, replication variant). dedup_clusters runs on
# BOTH variants since round 6: the exact-duplicate collapse inside the
# plan makes the identical-text shape — which OOMed an 8g driver before
# the collapse — the demonstration case, and the disjoint shape measures
# the pair/label-table slope the collapse cannot help with.
PROBES = [
    ("token_pagerank", "token_pagerank", "rekey"),
    ("dedup_clusters", "dedup_clusters", "disjoint"),
    ("dedup_clusters (identical texts)", "dedup_clusters", "rekey"),
]

SECTION = "## ×32 deep-volume probe: the iterative graph queries"


def main() -> None:
    from spark_sentiment_spark import get_spark
    from spark_sentiment_spark.plans.registry import (REGISTRY, all_queries,
                                                      release_caches)

    all_queries()
    spark = get_spark(master="local[32]", shuffle_partitions=32,
                      extra_conf={"spark.ui.enabled": "false",
                                  "spark.driver.memory": "8g",
                                  "spark.sql.codegen.wholeStage": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    results: dict[str, dict[int, dict]] = {label: {} for label, _, _ in PROBES}
    try:
        for k in FACTORS:
            variants = {}
            base = spark.read.parquet(f"{BASE_SF}/documents.parquet")
            for tag, disjoint_text in (("rekey", False), ("disjoint", True)):
                df = base
                if k > 1:
                    reps = spark.range(k).withColumnRenamed("id", "__rep")
                    df = (df.crossJoin(F.broadcast(reps))
                          .withColumn("doc_id",
                                      F.col("doc_id") * k + F.col("__rep")))
                    if disjoint_text:
                        # prefix every token with the replica id: replicas
                        # share ZERO shingles, so dup structure scales
                        # linearly instead of merging across copies
                        df = df.withColumn(
                            "text",
                            F.regexp_replace(
                                F.col("text"), r"(\S+)",
                                F.concat(F.lit("r"),
                                         F.col("__rep").cast("string"),
                                         F.lit("_$1"))))
                    df = df.drop("__rep")
                out_dir = f"{TMP}/x{k}_{tag}"
                df.write.mode("overwrite") \
                    .parquet(f"{out_dir}/documents.parquet")
                variants[tag] = (out_dir, df.count())
            for label, name, variant in PROBES:
                out_dir, n_rows = variants[variant]
                fn = REGISTRY[name].fn
                fn(spark, out_dir).write.format("noop").mode("overwrite") \
                    .save()
                release_caches()  # untimed warm run
                best = float("inf")
                for _ in range(2):
                    t0 = time.perf_counter()
                    fn(spark, out_dir).write.format("noop") \
                        .mode("overwrite").save()
                    best = min(best, time.perf_counter() - t0)
                    release_caches()
                results[label][k] = {"sec": round(best, 3), "rows": n_rows,
                                     "krows_s": round(n_rows / best / 1e3, 1)}
                print(f"x{k} {label}: {best:.2f}s "
                      f"({n_rows / best / 1e3:.1f} krows/s)", flush=True)
    finally:
        shutil.rmtree(TMP, ignore_errors=True)
        spark.stop()

    lines = [SECTION, "",
             "Generated by `scripts/deep_probe.py` — the two iterative",
             "catalog queries pushed to ×32 of sf0.1 (160k docs), past the",
             "point where their edge/pair tables fit one comfortable",
             "shuffle round. pagerank replicas are re-keyed only (texts",
             "identical — the saturating-vocabulary web shape); cluster",
             "replicas run both textually-DISJOINT (k independent copies",
             "of the dup structure — the honest data-growth slope) and",
             "IDENTICAL (k-clique exact-dup groups — the web-boilerplate",
             "shape, which grew the pair graph ×k² and OOMed the driver",
             "before dedup_clusters' round-6 exact-duplicate collapse).",
             "All run bounded round counts (10 power iterations; ~log₂",
             "pointer-jumping rounds), so the claim under test is that",
             "per-round cost is the only thing that grows:", "",
             "| query | ×1 | ×8 | ×32 | ×32/×1 time | ×32/×1 data |",
             "|---|---|---|---|---|---|"]
    for label, _, _ in PROBES:
        by_k = results[label]
        cells = [f"{by_k[k]['sec']}s" for k in FACTORS]
        ratio = round(by_k[32]["sec"] / by_k[1]["sec"], 1)
        lines.append(f"| {label} | " + " | ".join(cells)
                     + f" | {ratio}× | 32× |")
    pr, dc = results["token_pagerank"], results["dedup_clusters"]
    di = results["dedup_clusters (identical texts)"]
    lines += [
        "",
        f"Reading: token_pagerank {round(pr[32]['sec'] / pr[1]['sec'], 1)}×"
        " time for 32× data — the co-occurrence graph's VERTEX set is the",
        "(saturating) vocabulary, so replication multiplies edge weights,",
        "not unique edges; per-iteration cost grows with the aggregated",
        "edge table and stays far below data growth. dedup_clusters",
        f"{round(dc[32]['sec'] / dc[1]['sec'], 1)}× on disjoint texts —",
        "pair/label tables grow linearly, rounds stay at the fixture's",
        "component diameter; pointer jumping's log-diameter bound (chain",
        "table above) guards the adversarial case replication can't",
        f"produce. On identical texts {round(di[32]['sec'] / di[1]['sec'], 1)}× —",
        "the collapse reduces ×32 worth of k-cliques to the ×1 rep",
        "corpus plus one content-hash window; without it this row was an",
        "OOM, not a number.",
        "Raw32: `" + json.dumps(results) + "`",
    ]

    path = os.path.join(REPO, "SCALING.md")
    text = open(path).read()
    if SECTION in text:  # replace a previous run's section
        text = text[: text.index(SECTION)].rstrip() + "\n"
    open(path, "w").write(text.rstrip() + "\n\n" + "\n".join(lines) + "\n")
    print("appended ×32 section to SCALING.md")


if __name__ == "__main__":
    main()
