"""Compute the driver-window rotation from the registry + CORRECTNESS
history, instead of hand-maintaining names (round-5 ADVICE: the hand-written
rotation note undercounted and went stale as the catalog grew).

Policy (round-6 VERDICT item 1):
  1. every oracle-backed query with NO driver CORRECTNESS row in any round
     (includes queries whose oracle was added this round — an upgrade makes
     the old rows-only row obsolete);
  2. every oracle-backed query whose plan/oracle was UPGRADED after its
     latest green row (listed explicitly in UPGRADED_SINCE_ROW);
  3. backfill remaining slots with the oldest green rows (round asc,
     name asc — deterministic).
Rows-only queries never take a slot (their weaker check adds no signal).

Run from the repo root:  python scripts/gen_window.py
Prints the 50-name window as a Python list literal for
plans/registry.py::_WINDOW_PRIORITY; tests/test_registry_window.py asserts
the committed list matches this computation.
"""

from __future__ import annotations

import glob
import json
import os
import sys

WINDOW_SIZE = 50

# Queries whose plan or oracle changed after their latest green row (the
# row no longer certifies the current code), keyed by the ROUND of the
# change so entries expire by themselves: a query drops out of this class
# the moment it earns a driver row in a round >= its change round. Append
# here whenever a green query's semantics are edited mid-round.
UPGRADED_SINCE_ROW = {
    "ann_ivf_topk": 5,       # rows-only -> exact oracle (round 5)
    "ann_pq_topk": 5,        # rows-only -> exact oracle (round 5)
    "bpe_merges": 6,         # exact unrolled-CTE oracle added (round 6)
    "bpe_token_counts": 6,   # exact unrolled-CTE oracle added (round 6)
    "dedup_clusters": 6,     # exact-duplicate collapse in the plan (round 6)
}

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def compute_window() -> tuple[list[str], dict]:
    sys.path.insert(0, REPO)
    from spark_sentiment_spark.plans.registry import REGISTRY, all_queries
    all_queries()
    oracle_names = [n for n, q in REGISTRY.items() if q.sql is not None]

    latest: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(path.rsplit("_r", 1)[1].split(".")[0])
        for name in json.load(open(path)):
            latest[name] = max(latest.get(name, 0), rnd)

    never = sorted(n for n in oracle_names if n not in latest)
    upgraded = [n for n, rnd in UPGRADED_SINCE_ROW.items()
                if n in oracle_names and n in latest and latest[n] < rnd]
    stale = sorted(((latest[n], n) for n in oracle_names
                    if n in latest and n not in upgraded),
                   key=lambda t: (t[0], t[1]))

    window = never + upgraded
    backfill = [n for _, n in stale][: max(0, WINDOW_SIZE - len(window))]
    window += backfill
    info = {
        "never": never,
        "upgraded": upgraded,
        "backfill": backfill,
        "latest": latest,
    }
    return window[:WINDOW_SIZE], info


if __name__ == "__main__":
    window, info = compute_window()
    print(f"# {len(info['never'])} never-checked + {len(info['upgraded'])} "
          f"upgraded-since-row + {len(info['backfill'])} oldest-stale "
          f"backfill = {len(window)}")
    print("_WINDOW_PRIORITY = [")
    for section, names in (("never driver-checked", info["never"]),
                           ("upgraded after latest row", info["upgraded"]),
                           ("oldest-stale backfill", info["backfill"])):
        print(f"    # — {section} —")
        for n in names:
            if n in window:
                suffix = (f"  # r{info['latest'][n]}"
                          if n in info["latest"] else "")
                print(f'    "{n}",{suffix}')
    print("]")
