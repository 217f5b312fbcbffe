#!/usr/bin/env python
"""Standing sf0.1 oracle sweep — the round-close gate the round-14 verdict
asked for (item 2). The driver's correctness gate runs at sf0.01 only; the
one-off full-catalog sf0.1 sweep in round 14 was the only check in fourteen
rounds that ever caught real divergences (4 of them, latent for 7+ rounds:
static oracle literals vs adaptive plan rules, whole-second frame keys,
order-sensitive double-money rounding). This script makes that sweep a
rotating per-round gate instead of a thing someone remembers.

Slice policy (deterministic, documented in PLANS.md each round):
  * bucket(name) = int(md5(name), 16) % 3 — a query's bucket is a pure
    function of its name, so membership is stable as the catalog grows;
  * round N sweeps bucket N % 3 → full catalog coverage every 3 rounds;
  * PLUS every query that is NEW since the window cut (absent from
    scripts/window_source_hashes.json) or EDITED since it (live
    fn-source+oracle hash differs from the snapshot) — the queries most
    likely to carry a fresh SF-dependent divergence are always swept.
  Rows-only queries participate in both rules as of round 16 (the
  snapshot hashes them with sql="") and get the rows-only smoke run —
  round-15 ADVICE: a new rows-only query previously escaped sf0.1
  entirely, contradicting the full-coverage claim above.

Usage:
  python scripts/sweep_sf01.py                # this round's slice at sf0.1
  python scripts/sweep_sf01.py --all          # full catalog (round-14 mode)
  python scripts/sweep_sf01.py --list         # print the slice, don't run

Writes sweep_sf01_r{N}.json at the repo root and prints a PLANS.md-ready
summary line. Exit 1 on any oracle mismatch/error.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.gen_window import HASHES_PATH, WINDOW_ROUND, source_hashes

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def bucket(name: str) -> int:
    return int(hashlib.md5(name.encode()).hexdigest(), 16) % 3


def compute_slice() -> tuple[list[str], dict[str, str]]:
    """Return (sorted slice names, {name: reason}) for WINDOW_ROUND."""
    from spark_sentiment_spark.plans.registry import REGISTRY, all_queries
    all_queries()
    live = source_hashes()  # every registered name -> hash (rows-only incl.)
    snapshot = json.load(open(HASHES_PATH)) if os.path.exists(HASHES_PATH) else {}
    want = WINDOW_ROUND % 3
    reasons: dict[str, str] = {}
    for name in REGISTRY:
        if name in live and bucket(name) == want:
            reasons[name] = f"bucket {want}"
    for name, h in live.items():
        if name not in snapshot:
            reasons[name] = "new since cut"
        elif snapshot[name] != h:
            reasons[name] = "edited since cut"
    return sorted(reasons), reasons


def main() -> None:
    names, reasons = compute_slice()
    from spark_sentiment_spark.plans.registry import REGISTRY
    if "--all" in sys.argv:
        names = list(REGISTRY)
        reasons = {n: reasons.get(n, "full sweep") for n in names}
    if "--list" in sys.argv:
        for n in names:
            print(f"{n:40s} {reasons[n]}")
        print(f"# {len(names)} queries, round {WINDOW_ROUND}, "
              f"bucket {WINDOW_ROUND % 3}")
        return

    from spark_sentiment_spark import get_spark
    from spark_sentiment_spark.plans.registry import release_caches
    from tests.oracle_utils import compare, duck_connection

    spark = get_spark(master="local[32]", shuffle_partitions=32,
                      extra_conf={"spark.ui.enabled": "false",
                                  "spark.driver.memory": "8g"})
    spark.sparkContext.setLogLevel("ERROR")
    con = duck_connection(SF_DIR)
    results: dict[str, dict] = {}
    bad = 0
    t_start = time.perf_counter()
    for name in names:
        q = REGISTRY[name]
        t0 = time.perf_counter()
        try:
            if q.sql is None:
                n = q.fn(spark, SF_DIR).count()
                results[name] = {"err": "no_oracle", "spark_rows": n,
                                 "reason": reasons[name]}
                status = f"no_oracle rows={n}"
            else:
                ok, msg = compare(q.fn(spark, SF_DIR), con, q.sql, name)
                results[name] = {"ok": ok, "msg": msg,
                                 "reason": reasons[name]}
                status = "OK" if ok else f"FAIL {msg}"
                if not ok:
                    bad += 1
        except Exception as exc:  # noqa: BLE001
            results[name] = {"err": repr(exc)[:500], "reason": reasons[name]}
            status = f"ERROR {exc!r}"
            bad += 1
        release_caches()
        print(f"{name:40s} {time.perf_counter() - t0:6.2f}s  {status[:160]}",
              flush=True)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = os.path.join(repo, f"sweep_sf01_r{WINDOW_ROUND}.json")
    with open(out, "w") as fh:
        json.dump({"round": WINDOW_ROUND, "bucket": WINDOW_ROUND % 3,
                   "sf_dir": SF_DIR, "results": results}, fh, indent=2)
    n_new = sum(1 for r in reasons.values() if r != f"bucket {WINDOW_ROUND % 3}")
    print(json.dumps({"round": WINDOW_ROUND, "bucket": WINDOW_ROUND % 3,
                      "checked": len(names), "new_or_edited": n_new,
                      "failures": bad,
                      "wall_s": round(time.perf_counter() - t_start, 1),
                      "detail": out}))
    con.close()
    spark.stop()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
