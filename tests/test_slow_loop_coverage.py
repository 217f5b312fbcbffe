"""Pin that scripts/slow_loop.py's shards partition the serial slow suite.

Round-16 ADVICE (medium): the empty-tables shards used two positive -k
substrings, so a future slow test in that file matching neither would be
silently dropped from the sharded gate while the docstring claimed
coverage identical to serial `pytest tests/ -m slow`. The shard layout is
now complement-based (slow-single+rest runs `not survives_empty`), and
this test pins the invariant structurally: the union of every shard's
collected node ids must EQUAL the serial collection, with no node
collected twice. Collection-only (no Spark session), ~3 s per pytest
invocation.
"""

from __future__ import annotations

import importlib.util
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_spec = importlib.util.spec_from_file_location(
    "slow_loop", os.path.join(REPO, "scripts", "slow_loop.py"))
_slow_loop = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_slow_loop)


def _collect(targets: list[str], env_add: dict[str, str]) -> list[str]:
    env = dict(os.environ, **env_add)
    out = subprocess.run(
        [sys.executable, "-m", "pytest", *targets, "-m", "slow",
         "--collect-only", "-q", "--no-header", "-p", "no:cacheprovider"],
        cwd=REPO, env=env, capture_output=True, text=True, check=False)
    # rc 5 = "no tests collected" — a legal (if suspicious) shard state;
    # anything else non-zero is a broken selector and must fail loudly.
    assert out.returncode in (0, 5), (
        f"collection failed for {targets}: {out.stdout[-2000:]}"
        f"{out.stderr[-2000:]}")
    return [ln.strip() for ln in out.stdout.splitlines()
            if "::" in ln and not ln.startswith(("=", "<"))]


def test_shard_union_equals_serial_slow_collection():
    serial = _collect(["tests"], {})
    assert serial, "serial -m slow collection came back empty"
    shard_nodes: list[list[str]] = []
    for label, targets, env_add in _slow_loop.SHARDS:
        nodes = _collect(targets, env_add)
        assert nodes, f"shard {label} collected nothing"
        shard_nodes.append(nodes)
    union: list[str] = [n for nodes in shard_nodes for n in nodes]
    missing = set(serial) - set(union)
    extra = set(union) - set(serial)
    assert not missing, f"slow tests dropped by the shard layout: {sorted(missing)[:10]}"
    assert not extra, f"shards collect nodes serial doesn't: {sorted(extra)[:10]}"
    dupes = len(union) - len(set(union))
    assert dupes == 0, (
        f"{dupes} node(s) collected by more than one shard — shards must "
        f"partition, not overlap")
