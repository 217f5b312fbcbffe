#!/usr/bin/env python3
"""Targeted degenerate-input sweep: run named catalog queries against
EMPTY and SINGLE-ROW copies of every table.

The catalog-wide invariant tests (tests/test_empty_tables.py) are
@slow, so the fast pre-commit loop never exercises a NEW query on
degenerate input — exactly how the round-9 regressions
(events_scd2_merge_delta, io_partitioned_prune) slipped through. Run
this on every just-added or just-edited query BEFORE committing:

    python scripts/empty_check.py events_scd2_merge_delta io_partitioned_prune
    python scripts/empty_check.py --all          # full catalog (slow)

Exit code 0 = every named query survived both shapes (ran, produced a
stable non-empty schema); non-zero lists the failures.
"""

import argparse
import shutil
import sys
import tempfile

sys.path.insert(0, "/root/repo")

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]
SRC_SF = "/root/testdata/sf0.001"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*", help="query names to sweep")
    ap.add_argument("--all", action="store_true", help="sweep the catalog")
    args = ap.parse_args()

    from spark_sentiment_spark.plans.registry import (REGISTRY, all_queries,
                                                      release_caches)
    from spark_sentiment_spark.session import get_spark

    all_queries()
    names = list(REGISTRY) if args.all else args.names
    unknown = [n for n in names if n not in REGISTRY]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        return 2
    if not names:
        print("nothing to check (pass names or --all)", file=sys.stderr)
        return 2

    spark = get_spark(
        app_name="empty_check", master="local[4]", shuffle_partitions=4,
        extra_conf={"spark.ui.enabled": "false",
                    "spark.driver.memory": "4g",
                    "spark.sql.codegen.wholeStage": "false"})

    failures = []
    for shape, limit in (("empty", 0), ("single-row", 1)):
        tmp = tempfile.mkdtemp(prefix=f"degen_{limit}_")
        try:
            for t in TABLES:
                (spark.read.parquet(f"{SRC_SF}/{t}.parquet").limit(limit)
                 .write.parquet(f"{tmp}/{t}.parquet"))
            for name in names:
                try:
                    df = REGISTRY[name].fn(spark, tmp)
                    df.count()
                    assert len(df.schema.fields) > 0, "empty schema"
                    print(f"  ok   [{shape}] {name}")
                except Exception as ex:
                    failures.append(f"{name} [{shape}]: "
                                    f"{type(ex).__name__}: "
                                    f"{str(ex).splitlines()[0][:120]}")
                    print(f"  FAIL [{shape}] {name}: {type(ex).__name__}")
                finally:
                    release_caches()
        finally:
            shutil.rmtree(tmp, ignore_errors=True)

    if failures:
        print("\nFAILURES:\n" + "\n".join(failures))
        return 1
    print(f"\nall {len(names)} queries survived both degenerate shapes")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
