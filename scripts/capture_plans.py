#!/usr/bin/env python
"""Capture .explain("formatted") for named (default: all bench) queries
into plans/$SPARK_GRAFT_PLANS_ROUND/<query>_<suffix>.txt (default r19) —
the optimization round's plan evidence (guide §1 / §7.2).

Usage:
  python scripts/capture_plans.py before            # all bench queries
  python scripts/capture_plans.py after q1,q5       # named queries only
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from spark_sentiment_spark import get_spark
    from spark_sentiment_spark.plans.registry import (REGISTRY, all_queries,
                                                      release_caches)

    qs = all_queries()
    if len(sys.argv) > 2:
        names = sys.argv[2].split(",")
        unknown = [n for n in names if n not in qs]
        if unknown:
            raise SystemExit(f"unknown queries: {unknown}")
    else:
        names = sorted(n for n in qs if REGISTRY[n].bench)

    spark = get_spark(
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf={"spark.ui.enabled": "false",
                    "spark.driver.memory": "8g",
                    "spark.sql.codegen.wholeStage": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    outdir = os.path.join(REPO, "plans",
                          os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r19"))
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        release_caches()
        print(f"wrote {path} ({plan.count('Exchange')} Exchange refs)")
    spark.stop()


if __name__ == "__main__":
    main()
