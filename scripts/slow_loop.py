#!/usr/bin/env python
"""The slow-marked suite, sharded across concurrent pytest PROCESSES —
round-15 VERDICT item 2: the serial `pytest tests/ -m slow` run crossed
its ~600 s threshold (642 s judge / 560 s builder, both on loaded
hosts), so it gets the same process-level sharding treatment as
scripts/fast_loop.py (round-12/13 template; pytest-xdist is not in this
environment).

Composition of the slow set (round 16): ~134 rotated-out oracle sweep
params in tests/test_oracle.py (certified queries rotated out of the
per-commit loop — the dominant cost, and already splittable with the
md5-deterministic SPARK_GRAFT_ORACLE_SHARD partition fast_loop uses) +
8 heavy integration tests across six other files. Four shards (the
first cut ran rest as ONE shard and measured it the 397 s straggler
behind two ~95 s oracle shards; test_empty_tables — a full-catalog
degenerate-corpus sweep per test, ~90% of rest's wall — splits one
test per shard. NB: -k matches the whole node id INCLUDING the
filename, so the selectors below use the test-function substrings, not
"empty_tables", which matches both via the module name):

  1. oracle sweep with SPARK_GRAFT_ORACLE_SHARD=0/2 + the six small
     heavy files (mllib grid sweep, recall floors, property checks,
     BPE oracles, analyze roundtrip)
  2. oracle sweep with SPARK_GRAFT_ORACLE_SHARD=1/2
  3. the empty-corpus catalog sweep (-k survives_empty)
  4. everything ELSE in test_empty_tables.py (-k "not survives_empty" —
     today exactly the single-row-corpus sweep, the slowest single test:
     quantizers/trainers on degenerate input pay fixed overhead per
     catalog entry). Complement-based so a future slow test added to the
     file lands in a shard instead of silently vanishing (round-16
     ADVICE); tests/test_slow_loop_coverage.py pins union == serial.

Each shard gets its own warehouse/Derby home via
SPARK_GRAFT_TEST_SHARD_DIR (embedded Derby allows one metastore per
directory; tests/conftest.py). Coverage is IDENTICAL to the serial
`pytest tests/ -m slow`: the oracle-shard env var only partitions the
parametrize list and is independent of the rotation bit. The driver's
full `pytest tests/` run is untouched (no env vars → no sharding).

Usage: python scripts/slow_loop.py [extra pytest args…]
Exit code: non-zero if ANY shard fails; each shard's tail is printed.
"""

from __future__ import annotations

import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SHARDS = [
    ("slow-oracle-0/2+rest", ["tests", "--ignore=tests/test_empty_tables.py"],
     {"SPARK_GRAFT_ORACLE_SHARD": "0/2"}),
    ("slow-oracle-1/2", ["tests/test_oracle.py"],
     {"SPARK_GRAFT_ORACLE_SHARD": "1/2"}),
    ("slow-empty", ["tests/test_empty_tables.py",
                    "-k", "survives_empty"], {}),
    # COMPLEMENT of the shard above, not a second positive substring —
    # round-16 ADVICE: two positive -k selectors would silently drop a
    # future slow test in this file that matches neither, while shard 1
    # ignores the whole file. With `not survives_empty` the two shards
    # partition the file by construction (today this shard is exactly the
    # single-row sweep); tests/test_slow_loop_coverage.py pins the
    # union-equals-serial invariant across all shards.
    ("slow-single+rest", ["tests/test_empty_tables.py",
                          "-k", "not survives_empty"], {}),
]


def main() -> int:
    extra = sys.argv[1:]
    procs = []
    t0 = time.perf_counter()
    for label, targets, env_add in SHARDS:
        shard_dir = tempfile.mkdtemp(
            prefix=f"slowloop_{label.replace('/', '_')}_")
        env = dict(os.environ,
                   SPARK_GRAFT_TEST_SHARD_DIR=shard_dir, **env_add)
        log = open(os.path.join(shard_dir, "pytest.log"), "w")
        p = subprocess.Popen(
            [sys.executable, "-m", "pytest", *targets,
             "-m", "slow", "-q", *extra],
            cwd=REPO, env=env, stdout=log, stderr=subprocess.STDOUT)
        procs.append((label, p, log, shard_dir))
    rc = 0
    for label, p, log, shard_dir in procs:
        p.wait()
        log.close()
        tail = open(log.name).read().splitlines()[-6:]
        status = "ok" if p.returncode == 0 else f"FAILED rc={p.returncode}"
        print(f"--- shard {label}: {status} ({log.name})")
        for line in tail:
            print(f"    {line}")
        rc = rc or p.returncode
    print(f"slow loop total: {time.perf_counter() - t0:.0f}s "
          f"({'green' if rc == 0 else 'RED'})")
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
