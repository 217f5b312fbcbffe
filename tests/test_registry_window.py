"""The external correctness harness checks only the FIRST 50
registrations; this pins the window membership so adding a query
to the wrong module cannot silently evict an oracle-backed entry
(see plans/registry.py::_WINDOW_PRIORITY for the rotation policy).

The round-6 window is COMPUTED from the registry plus the
CORRECTNESS_r*.json history by scripts/gen_window.py (round-5 ADVICE:
hand-maintained rotation notes undercounted and went stale), and
test_window_matches_computation re-derives it here — the committed
list in registry.py must equal the computation, so the window can
never silently drift from the policy again.
"""

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _computed_window():
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from gen_window import compute_window
    return compute_window()[0]


def test_window_matches_computation():
    from spark_sentiment_spark.plans.registry import (all_queries,
                                                      _WINDOW_PRIORITY)

    all_queries()
    assert _WINDOW_PRIORITY == _computed_window()


def test_driver_window_membership_is_pinned():
    from spark_sentiment_spark.plans.registry import (REGISTRY, all_queries,
                                                      _WINDOW_PRIORITY)

    all_queries()
    assert list(REGISTRY)[:50] == _WINDOW_PRIORITY


def test_rotation_payload_is_fully_inside_window():
    """Every _WINDOW_PRIORITY entry must actually sit inside the
    driver's 50-entry window (the list must never exceed 50)."""
    from spark_sentiment_spark.plans.registry import (REGISTRY, all_queries,
                                                      _WINDOW_PRIORITY)

    all_queries()
    window = set(list(REGISTRY)[:50])
    missing = [n for n in _WINDOW_PRIORITY if n not in window]
    assert not missing, missing


def test_window_is_fully_oracle_backed():
    """Every window slot carries a DuckDB oracle — rows-only entries get
    a weaker check, so they shouldn't crowd the window. The only
    exception is gen_window.FORCE_ROWS_ONLY: an explicit, round-scoped,
    one-time routing so a rows-only query's driver no_oracle row exists
    on record (round-15 VERDICT item 3: mlib_score_documents)."""
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from gen_window import FORCE_ROWS_ONLY, WINDOW_ROUND
    from spark_sentiment_spark.plans.registry import (REGISTRY, all_queries,
                                                      _WINDOW_PRIORITY)

    all_queries()
    rows_only = [n for n in _WINDOW_PRIORITY if REGISTRY[n].sql is None
                 and FORCE_ROWS_ONLY.get(n) != WINDOW_ROUND]
    assert not rows_only, rows_only


def test_changed_queries_are_declared_upgraded():
    """Round-6 ADVICE: UPGRADED_SINCE_ROW was a manually-appended list with
    nothing cross-checking it. gen_window now snapshots every oracle query's
    (fn source + sql) hash at window-cut time; any drift since the cut must
    be covered — either the query sits in the current window (its upcoming
    driver row certifies the new code) or it was explicitly declared
    upgraded at >= WINDOW_ROUND. A silent mid-round semantic edit now fails
    here instead of keeping its stale green row."""
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from gen_window import (HASHES_PATH, UPGRADED_SINCE_ROW, WINDOW_ROUND,
                            source_hashes)
    from spark_sentiment_spark.plans.registry import _WINDOW_PRIORITY

    snapshot = json.load(open(HASHES_PATH))
    current = source_hashes()
    undeclared = [
        n for n, h in current.items()
        if n in snapshot and h != snapshot[n]
        and n not in _WINDOW_PRIORITY
        and UPGRADED_SINCE_ROW.get(n, 0) < WINDOW_ROUND
    ]
    assert not undeclared, (
        f"edited since the window cut but neither in-window nor declared "
        f"in UPGRADED_SINCE_ROW>={WINDOW_ROUND}: {undeclared}")


def test_no_oracle_query_left_unverified_after_this_window():
    """The round-6 goal: after this window earns its rows, the set of
    oracle-backed queries with no driver row ever must be EMPTY —
    every name gen_window classifies as never-checked is in-window."""
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from gen_window import compute_window
    from spark_sentiment_spark.plans.registry import _WINDOW_PRIORITY

    _, info = compute_window()
    out = [n for n in info["never"] if n not in _WINDOW_PRIORITY]
    assert not out, out


def test_doc_counters_match_registry():
    """Round-9 VERDICT (repeat nit): README/COVERAGE carried a stale
    catalog count two rounds running. Pin the literal counters in both
    docs to the live registry so growth without a doc bump fails here."""
    from spark_sentiment_spark.plans.registry import REGISTRY, all_queries

    all_queries()
    total = len(REGISTRY)
    rows_only = sum(1 for q in REGISTRY.values() if q.sql is None)

    readme = open(os.path.join(REPO, "README.md")).read()
    assert f"all {total} registered queries" in readme, (
        f"README.md --list-queries counter != {total}")
    coverage = open(os.path.join(REPO, "COVERAGE.md")).read()
    assert f"FOUR of the {total}" in coverage or (
        rows_only != 4 and f"of the {total}" in coverage), (
        f"COVERAGE.md rows-only counter != {total}")
    # round-12 VERDICT: the SURVEY §7.4 realized-surface note drifted twice;
    # pin its literal counters to the live registry like README/COVERAGE.
    survey = open(os.path.join(REPO, "SURVEY.md")).read()
    assert (f"({total} queries, {total - rows_only} oracle-backed"
            in survey), (
        f"SURVEY.md §7.4 note != {total}/{total - rows_only}")


def test_money_sites_match_audited_snapshot():
    """Round-15 money gate, continuous form: the full boundary-distance
    audit (scripts/money_audit.py, PLANS.md table) runs at round close;
    this pin makes the inventory part run every fast loop. A NEW
    round(sum(...)) oracle site, or an idiom change on an existing one
    (e.g. an exact decimal sum downgraded to a raw double sum), fails
    here until the distance audit is re-run and the snapshot rewritten
    (`python scripts/money_audit.py` — must exit 0 — then `--snapshot`)."""
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from money_audit import SNAPSHOT_PATH, site_inventory

    live = site_inventory()
    snap = json.load(open(SNAPSHOT_PATH))
    assert live == snap, (
        "round(sum(...)) oracle sites drifted from scripts/money_sites.json"
        " — run `python scripts/money_audit.py` (exit 0 required), then"
        " `--snapshot` to re-baseline")
