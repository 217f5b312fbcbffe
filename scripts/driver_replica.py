#!/usr/bin/env python
"""Replicate the driver's t2 correctness run at its SF (sf0.01) over the
first-50 registration window — the exact set CORRECTNESS_r{N}.json will
cover — plus (optionally) the whole catalog.

Usage:
  python scripts/driver_replica.py            # window (first 50) at sf0.01
  python scripts/driver_replica.py --all      # full catalog at sf0.01
  python scripts/driver_replica.py --only a,b # just the named queries
                                              # (unknown names error out —
                                              # a typo'd flag must not
                                              # silently fall back to the
                                              # window, round-16 lesson)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spark_sentiment_spark import get_spark
from spark_sentiment_spark.plans.registry import (REGISTRY, all_queries,
                                                  release_caches)
from tests.oracle_utils import compare, duck_connection

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    all_queries()
    names = list(REGISTRY)
    if "--only" in sys.argv:
        # round-16 ADVICE: a malformed invocation of the flag that exists to
        # prevent silently running the wrong query set must itself fail
        # loudly — missing value and --only+--all are both usage errors.
        if "--all" in sys.argv:
            sys.exit("usage: --only and --all are mutually exclusive")
        idx = sys.argv.index("--only")
        if idx + 1 >= len(sys.argv):
            sys.exit("usage: --only name1,name2 (missing value)")
        wanted = sys.argv[idx + 1].split(",")
        unknown = [n for n in wanted if n not in REGISTRY]
        if unknown:
            sys.exit(f"--only names not in the registry: {unknown}")
        names = wanted
    elif "--all" not in sys.argv:
        names = names[:50]
    spark = get_spark(master="local[32]", shuffle_partitions=32,
                      extra_conf={"spark.ui.enabled": "false",
                                  "spark.driver.memory": "8g"})
    spark.sparkContext.setLogLevel("ERROR")
    con = duck_connection(SF_DIR)
    results: dict[str, dict] = {}
    bad = 0
    for name in names:
        q = REGISTRY[name]
        t0 = time.perf_counter()
        try:
            if q.sql is None:
                n = q.fn(spark, SF_DIR).count()
                results[name] = {"err": "no_oracle", "spark_rows": n}
                status = f"no_oracle rows={n}"
            else:
                ok, msg = compare(q.fn(spark, SF_DIR), con, q.sql, name)
                results[name] = {"ok": ok, "msg": msg}
                status = "OK" if ok else f"FAIL {msg}"
                if not ok:
                    bad += 1
        except Exception as exc:  # noqa: BLE001
            results[name] = {"err": repr(exc)[:500]}
            status = f"ERROR {exc!r}"
            bad += 1
        release_caches()
        print(f"{name:35s} {time.perf_counter() - t0:6.2f}s  {status[:160]}",
              flush=True)
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "correctness_local.json")
    with open(out, "w") as fh:
        json.dump(results, fh, indent=2)
    print(json.dumps({"checked": len(names), "failures": bad,
                      "detail": out}))
    con.close()
    spark.stop()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
