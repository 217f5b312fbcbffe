"""The standing sf0.1 sweep gate's slice computation (scripts/sweep_sf01.py)
is what guarantees full-catalog coverage every 3 rounds — pin its two
load-bearing properties so a refactor can't silently shrink coverage:
the bucket function is a stable pure function of the name (literals
pinned), and a query whose fn-source+oracle hash drifted from the cut
snapshot is always swept regardless of bucket."""

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _mod():
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    import sweep_sf01
    return sweep_sf01


def test_bucket_is_stable_and_total():
    """Pinned literals: if the bucket function ever changes (different
    hash, different modulus), these fail and the rotation documentation
    in PLANS.md is stale. Every name lands in exactly one of 3 buckets."""
    m = _mod()
    assert m.bucket("q1_pricing_summary") == 1
    assert m.bucket("dedup_exact") == 0
    assert m.bucket("ann_ivfpq_persisted_probe") == 0
    assert m.bucket("events_sessionize") == 2
    assert all(m.bucket(f"name{i}") in (0, 1, 2) for i in range(50))


def test_slice_covers_bucket_and_edits(tmp_path, monkeypatch):
    """The round's slice = (its bucket) ∪ (new since cut) ∪ (edited since
    cut). Simulate an edit by perturbing a COPY of the snapshot at a tmp
    path and pointing the sweep module at it (round-15 ADVICE: rewriting
    the committed snapshot in place left it perturbed on disk after a
    hard kill mid-test, and raced any parallel pytest reader)."""
    from gen_window import HASHES_PATH, WINDOW_ROUND

    m = _mod()
    names, reasons = m.compute_slice()
    want = WINDOW_ROUND % 3
    snapshot = json.load(open(HASHES_PATH))
    # every in-bucket snapshotted query is in the slice
    for n in snapshot:
        if m.bucket(n) == want:
            assert n in reasons, n
    # pick an out-of-bucket query and perturb its snapshot hash in a copy
    victim = next(n for n in snapshot if m.bucket(n) != want)
    assert victim not in reasons or reasons[victim] != f"bucket {want}"
    perturbed = dict(snapshot)
    perturbed[victim] = "0" * 16
    copy_path = tmp_path / "window_source_hashes.json"
    copy_path.write_text(json.dumps(perturbed))
    # compute_slice resolves HASHES_PATH from sweep_sf01's module globals
    # (bound there by `from scripts.gen_window import HASHES_PATH`), so
    # patching that binding is sufficient; the committed file is untouched.
    monkeypatch.setattr(m, "HASHES_PATH", str(copy_path))
    _, reasons2 = m.compute_slice()
    assert reasons2.get(victim) == "edited since cut"
    # registry names absent from the snapshot (registered post-cut)
    # classify as new
    assert all(r in (f"bucket {want}", "new since cut", "edited since cut")
               for r in reasons.values())


def test_rows_only_queries_participate_in_rotation():
    """Round-15 ADVICE: rows-only queries were excluded from both the
    bucket rotation and new/edited detection, so a new rows-only query
    never got an sf0.1 smoke run. Pin that every registered name —
    oracle-backed or not — is snapshotted (so edits/new registrations
    are caught) and that in-bucket rows-only names join the slice."""
    from gen_window import WINDOW_ROUND, source_hashes

    m = _mod()
    sys.path.insert(0, REPO)
    from spark_sentiment_spark.plans.registry import REGISTRY, all_queries
    all_queries()
    # the LIVE hash set covers every registered name (rows-only hashed
    # with sql=""); names registered after the cut are simply absent
    # from the committed snapshot and classify as "new since cut"
    assert set(source_hashes()) == set(REGISTRY)
    _, reasons = m.compute_slice()
    want = WINDOW_ROUND % 3
    rows_only_in_bucket = [n for n, q in REGISTRY.items()
                           if q.sql is None and m.bucket(n) == want]
    for n in rows_only_in_bucket:
        assert n in reasons, n
