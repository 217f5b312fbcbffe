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

The window is FROZEN for the round it was cut for (round-7 hardening):
only CORRECTNESS history from rounds < WINDOW_ROUND counts, only queries
present in the cut-time hash snapshot are eligible, and UPGRADED entries
are consulted up to and including the cut round (round-19 refinement —
see the policy note at UPGRADED_SINCE_ROW; the round-19 cut happens at
round close, after the round's edits). Cutting a new window =
bump WINDOW_ROUND, run `python scripts/gen_window.py --cut` (rewrites the
snapshot), paste the printed list into
plans/registry.py::_WINDOW_PRIORITY. A flagless run only PRINTS the
stable window; tests/test_registry_window.py asserts the committed list
matches the computation and that post-cut edits are declared.
"""

from __future__ import annotations

import glob
import hashlib
import inspect
import json
import os
import sys

WINDOW_SIZE = 50

# The round this window is FOR. Only CORRECTNESS files from rounds strictly
# before this are consulted, so the committed list stays stable when the
# driver lands the current round's artifact mid-round (round-6 ADVICE:
# globbing ALL history made the frozen window churn the moment
# CORRECTNESS_r06.json appeared in the working tree). Bump this constant when
# deliberately cutting the next rotation, then re-run this script.
WINDOW_ROUND = 19

# Rows-only queries never take a slot on their own (their weaker
# rows-only check adds no oracle signal), EXCEPT a one-time explicit
# routing so the driver record is complete. Round-15 VERDICT item 3:
# mlib_score_documents is the only rows-only query never driver-routed
# (the other three have no_oracle rows on record) — window it once at
# the r16 cut. Keyed by the round it should be windowed; the entry is
# consumed at exactly that cut (after it earns its row, `latest` has it
# and the guard below keeps it out of later windows).
FORCE_ROWS_ONLY = {"mlib_score_documents": 16}

# Queries whose plan or oracle changed after their latest green row (the
# row no longer certifies the current code), keyed by the ROUND of the
# change so entries expire by themselves: a query drops out of this class
# the moment it earns a driver row in a round >= its change round. Append
# here whenever a green query's semantics are edited mid-round.
# A change made AFTER the round-N window was cut (entry value N, while
# WINDOW_ROUND == N) must not churn the already-cut list, which is why
# entries used to be consulted only with round < WINDOW_ROUND. Round-19
# refinement: this round's window is cut AT ROUND CLOSE, after all of
# the round's edits, so compute_window() now consults round <=
# WINDOW_ROUND — otherwise the r19 restructures (token_pagerank,
# events_stickiness_hll, the batch-5 fusions …) would defer to an r20
# cut that will never happen and their r18 rows would keep certifying
# pre-restructure code. The stability property is preserved by
# procedure rather than by the comparator: no entry dated the cut round
# is added after the cut (the declaration test still enforces that any
# post-cut drift gets an entry, and a recut would then be required —
# exactly the behavior we want on a late edit).
UPGRADED_SINCE_ROW = {
    "ann_ivf_topk": 5,       # rows-only -> exact oracle (round 5)
    "ann_pq_topk": 5,        # rows-only -> exact oracle (round 5)
    # (dedup_clusters' round-6 exact-duplicate-collapse entry is folded
    #  into its round-18 entry below — one key per query)
    # round 7: explicit shared whitespace class replaces the three-way-
    # divergent \s in plan + oracle + UDF (round-6 ADVICE), superseding
    # the expired round-6 exact-oracle entries.
    "bpe_merges": 7,
    "bpe_token_counts": 7,
    # round 8: the oracle's session running sum gains the (ts, event_id)
    # tiebreak the Spark twin already had — the same divergence class as
    # the round-7 ADVICE peak-concurrency/affinity fixes, caught by the
    # round-8 self-audit; latent only (fixtures have no (user_id, ts)
    # collisions), but n_sessions could shift by one when a user's first
    # rows tie.
    "events_sessionize": 8,
    # round 9: staging dirs routed through track_staging_dir (leak fix,
    # round-8 ADVICE) — no semantic change, but the fn source drifted
    # out-of-window, so the r10 cut re-verifies it.
    "streaming_volume_anomaly": 9,
    # round 10: rebased onto the shared _scd2_dim builder (round-9 ADVICE
    # dedup item) — logic byte-equivalent, oracle re-verified locally at
    # two SFs, but the r8 row no longer hashes the live source; the r11
    # cut re-verifies it.
    "events_scd2_history": 10,
    # round 11: oracle SQL refactored into the shared _MP_CANDIDATE_CTE
    # (now also feeding decontaminate_semantic) — concatenation-only
    # whitespace drift, semantics unchanged, oracle re-verified locally
    # at two SFs this round; the r12 cut re-verifies it.
    "dedup_embedding_multiprobe": 11,
    # round 12: curate_corpus was declared here for the _curation_verdicts
    # rebase; that entry is superseded by (folded into) its round-18 entry
    # below — keep ONE key per query (dict literal duplicates silently
    # later-win).
    # round 13: verdict/reason moved behind _composite_gate's inner
    # feature projection so the regexp alpha ratio evaluates once per
    # row instead of once per referencing branch (the stage-attribution
    # probe named the composite gate as curate_corpus's dominant ×8→×32
    # marginal; measured 1.9× on the ×16 probe corpus) — values
    # byte-identical, oracle re-verified locally at two SFs this round;
    # the r14 cut re-verifies it. curate_corpus / curate_corpus_gopher
    # share the edit but sit in the r13 window, which certifies them.
    "quality_gate": 13,
    # round 13 (same fix class, found by a catalog-wide executed-plan
    # sweep for duplicated expensive expressions): langid_stopword's
    # vote chain referenced each language's stop-word filter up to 3×
    # in one projection — now an inner scored projection mirroring the
    # oracle's scored CTE (9 filter nodes → 3). Values byte-identical;
    # all three consumers oracle re-verified locally at two SFs; the
    # r14 cut re-verifies.
    "langid_stopword": 13,
    "langid_confusion": 13,
    # (langid_kappa's round-13 entry is folded into its round-18 entry
    #  below — one key per query)
    # round 14: the full-catalog sf0.1 oracle sweep (driver checks
    # sf0.01) found four latent SF-dependent divergences; three of the
    # fixes touch queries outside the frozen r14 window, so their green
    # rows no longer certify the live code and the r15 cut re-verifies:
    # ann_lsh_topk's static P=6 twin got the adaptive prm CTE (valid
    # only for n <= 1024 before; the plan auto-scales to P=7 at sf0.1's
    # 2000 embeddings), dedup_semantic's static k=8 twin got the same
    # treatment (the plan auto-scales to k=31 at sf0.1), and
    # q1_pricing_summary's money sums moved to exact per-row fixed-point
    # (order-sensitive round(sum(double),2) rounded a cent apart at
    # sf0.1's ~2.8e9 totals). events_rolling_1h's microsecond-exact
    # frame-key fix shares the sweep but sits in the r14 window, which
    # certifies it. All four re-verified at sf0.001/0.01/0.1 on landing.
    # (ann_lsh_topk's and dedup_semantic's round-14 adaptive-twin entries
    #  are folded into their round-19 entries below — one key per query;
    #  both earned fresh rows at the r15 cut, expiring the r14 class.)
    "q1_pricing_summary": 14,
    # round 14, same sweep's CLASS fix: the remaining order-sensitive
    # round(sum(double-money), 2) sites converted to the exact
    # DECIMAL(27,s) per-row idiom tpch_shapes.py already used
    # (boundary-proximity audit in PLANS.md: one q3 order-group sits
    # EXACTLY on a half-cent boundary, q5's closest group within
    # summation noise of one). Values identical on the fixtures; all
    # re-verified at sf0.001/0.01/0.1 on landing; the r15 cut
    # re-verifies. The in-window q11-q16/q19/q20 were already decimal.
    "q3_shipping_priority": 14,
    "q5_local_supplier": 14,
    "q6_forecast_revenue": 14,
    "q10_returned_items": 14,
    "agg_global_stats": 14,
    "scalar_math_funcs": 14,
    "q17_small_qty_revenue": 14,
    # round 18 (optimization round): plan-shape restructures, outputs
    # byte-identical and oracle re-verified at sf0.001/0.01/0.1 on
    # landing (OPTIMIZATION_r18.md has the before/after plans + bench
    # evidence); the next cut re-verifies via fresh driver rows.
    # — shared-branch persists replacing repeated fact scans:
    "contrastive_pairs": 18,     # ranked/sizes persisted: 4 scans -> 1
    "vocab_coverage": 18,        # token counts persisted: 2 explodes -> 1
    "agg_hll_sketch": 18,        # sketch+exact from one distinct-key frame
    "events_daily_uniques_hll": 18,  # same, per-day
    "agg_hll_merge_shards": 18,  # same, 3 scans -> 1
    "events_sliding_users_hll": 18,  # both tiers from distinct minute-user
    # — deep-helper edits (fn hash unchanged; manual entries per the
    #   HASHES_PATH note): _curation_verdicts' inline dedup rank became
    #   one window over the gate frame (kills the pushed-down duplicate
    #   feature evaluation + second corpus scan). events_stickiness_hll
    #   (helper _stickiness_hll_core: DAU now derived from the persisted
    #   partials) sits in the r17 window and is certified by its
    #   upcoming r18 row.
    "curate_corpus": 18,
    "curate_corpus_gopher": 18,
    "curate_corpus_c4": 18,
    "curate_corpus_staged": 18,
    # — more shared-branch persists (same round-18 sweep; in-window
    #   vocab_growth_curve / quantile_histogram_* / events_stickiness_hll
    #   share the sweep but are certified by their r18 window rows):
    "dedup_incremental": 18,       # hashed frame persisted: 2 scans -> 1
    "dedup_incremental_bloom": 18,  # same + incoming persisted
    "q15_top_supplier": 18,        # revenue agg persisted: 2 scans -> 1
    "events_stickiness": 18,       # user-day frame persisted: 3 scans -> 1
    "events_seasonal_anomaly": 18,  # grids from persisted cells: 3 -> 1
    "token_pmi_bigrams": 18,       # count tables persisted: 5 explodes -> 2
    "snapshot_diff": 18,           # (doc_id, h1, h2) persisted: 3 scans -> 1
    "decontaminate_minhash": 18,   # shingle table persisted: 3 explodes -> 1
    # — events family, same sweep (in-window events_rfm_cutpoints shares
    #   the per_user edit but is certified by its r18 window row):
    "events_retention_cohorts": 18,  # first_ts via window: 2 scans -> 1
    "events_cumulative_users": 18,   # both aggs from distinct (user, day)
    "events_rollup_incremental": 18,  # one side-tagged rollup, sliced
    "events_gap_fill": 18,           # hourly rollup persisted: 3 -> 1
    "events_peak_concurrency": 18,   # session bounds persisted: 3 -> 1
    "events_rfm_scores": 18,         # horizon from persisted per_user
    "events_rfm_distributed": 18,    # same
    "events_rfm_cutpoints_bucketed": 18,  # same
    "events_funnel": 18,             # step frames persisted (cascade)
    "events_funnel_windowed": 18,    # same
    # — text/corpus family, same sweep (in-window dedup_tfidf_cosine
    #   shares the tf persist but is certified by its r18 window row):
    "preference_pairs": 18,          # ranked frame persisted: 2 scans -> 1
    "mixture_upsample": 18,          # live frame persisted: 2 scans -> 1
    "source_overlap": 18,            # (h, source, c) persisted: 2 -> 1
    "zorder_probe": 18,              # bounds + zkey map persisted: 3 -> 1
    "q21_waiting_suppliers": 18,     # late frame persisted: 2 joins -> 1
    "streaming_winnowing_probe": 18,  # fp_old persisted: 2 winnow passes -> 1
    # — batch-5 second-tier persists (shared aggregates over already-
    #   cached frames; in-window dedup_winnowing_incremental /
    #   dedup_tfidf_cosine / hybrid_search_rrf share the sweep but are
    #   certified by their r18 window rows):
    "dedup_winnowing_pairs": 18,     # nd persisted: 2 aggs -> 1
    # ("dedup_minhash_lsh"'s round-18 comment-only note entry removed at the
    #  r19 cut-time triage — value-identical drift, slot yielded to
    #  this round's plan-changed queries; see OPTIMIZATION_r19.md)
    "dedup_embedding_cosine": 18,    # unit-vector frame persisted
    # (dedup_incremental_minhash's round-18 note entry is folded into
    #  its round-19 entry below — one key per query)
    # ("dedup_cross_source_pairs"'s round-18 comment-only note entry removed at the
    #  r19 cut-time triage — value-identical drift, slot yielded to
    #  this round's plan-changed queries; see OPTIMIZATION_r19.md)
    # (decontaminate_minhash's batch-5 buckets/sizes persists fold into
    #  its existing batch-2 entry above)
    # — batch-6 shared-subtree adjudications (post-close sweep):
    "langid_kappa": 18,      # cm persisted: 4 classifier scans -> 1
    "dedup_jaccard_pairs": 18,  # helper tok persisted: shingling once
    # (dedup_clusters' round-18 _jaccard_pair_frame persist entry is
    #  folded into its round-19 entry below — one key per query)
    "dedup_char_ngrams": 18,  # grams persisted: 2 char-explodes -> 1
    # (token_pagerank's round-18 note entry is folded into its
    #  round-19 entry below — the r19 loop restructure supersedes it)
    # ("graph_degree_assortativity"'s round-18 comment-only note entry removed at the
    #  r19 cut-time triage — value-identical drift, slot yielded to
    #  this round's plan-changed queries; see OPTIMIZATION_r19.md)
    # — batch-7: operator-level vocab persist in extract_wordlists
    #   (corpus pass x2 -> x1; both consumers re-certified):
    "wordlist_extraction": 18,
    "wordlist_extraction_scaled": 18,
    # ---- round 19 (optimization round 2 of 2) ----
    # Declared as the edits land (mid-round the r17 window stays frozen —
    # compute_window only consults entries < WINDOW_ROUND — and the r19
    # close-time cut re-certifies these with fresh driver rows):
    # (cut-time triage, documented in OPTIMIZATION_r19.md: the round-19
    #  close-time cut rewrites the hash snapshot, which absorbs the
    #  round's VALUE-IDENTICAL drift — comment-only probe notes on
    #  ann_lsh_topk/dedup_semantic and the 16 batch-6 level-annotation
    #  kwargs, all behavior-identical by construction. Their mid-round
    #  declaration entries are removed here so re-certification slots go
    #  to the restructured/plan-changed queries below; 80 candidates
    #  would otherwise contend for 50 slots.)
    # batch 4: operators/components.py loop restructure (edge cache
    # keyed on s, prop checkpointed once per round, changed-count via
    # carried ocomp — no third join). Deep-helper edit, so the three
    # consumers are declared manually (their fn sources are unchanged);
    # all three oracle re-verified at sf0.01 + sf0.1 on landing:
    "token_pagerank": 19,      # batch 1: iteration loop restructure
    "events_stickiness_hll": 19,  # batch 2: agg fusion + MAU repartition
    "dedup_clusters": 19,
    "dedup_cluster_stats": 19,
    "dedup_cluster_canonical": 19,
    # batch 5: the two-slice corpus passes fused — _winnow_selected /
    # _minhash_signatures are doc-local, so ONE corpus pass fills one
    # cache and the batch/index sides are filters over it. All three
    # oracle re-verified at sf0.01 + sf0.1 on landing:
    "dedup_winnowing_incremental": 19,
    "dedup_incremental_minhash": 19,
    "dedup_minhash_bucketed_probe": 19,
    # batch 5b: streaming_minhash_probe's static index persists its
    # narrow signature frame (the bands⋈sigs self-join re-ran the corpus
    # fold on both subtrees, once per micro-batch). Oracle re-verified
    # at sf0.01 + sf0.1 on landing:
    "streaming_minhash_probe": 19,
    # batch 7: the staged-index family persists its unit-normalized
    # vector frame at every entry point (seed fetch, cell assign, Arrow
    # encode, invariant count and probe each re-paid the scan +
    # normalize). All five oracle re-verified at sf0.01 + sf0.1 on
    # landing; family pins (round13/15/16) green:
    "ann_pq_persisted_probe": 19,
    "ann_ivfpq_persisted_probe": 19,
    "ann_ivfpq_tombstone_probe": 19,
    "ann_ivfpq_compacted_probe": 19,
    "ann_ivfpq_refresh_probe": 19,
}

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Snapshot of every registered query's (fn source + oracle sql) hash,
# written at window-cut time. tests/test_registry_window.py compares the
# live hashes against this file: a query whose hash drifted must either sit
# in the current window (its upcoming driver row certifies the new code) or
# carry an UPGRADED_SINCE_ROW entry >= WINDOW_ROUND — closing the round-6
# ADVICE gap where a mid-round semantic edit could silently keep its stale
# green row. As of round 16 the snapshot also covers rows-only queries
# (sql hashed as "") so scripts/sweep_sf01.py's bucket rotation and
# new/edited-since-cut detection include them — round-15 ADVICE: a new
# rows-only query previously never got an sf0.1 smoke run. They remain
# ineligible for window slots (compute_window filters on q.sql). The
# hash covers the registered fn body and the SQL string, not helper
# modules the fn calls; deep-helper edits still need a manual
# UPGRADED_SINCE_ROW entry.
HASHES_PATH = os.path.join(REPO, "scripts", "window_source_hashes.json")


def source_hashes() -> dict[str, str]:
    sys.path.insert(0, REPO)
    from spark_sentiment_spark.plans.registry import REGISTRY, all_queries
    all_queries()
    out = {}
    for name, q in sorted(REGISTRY.items()):
        try:
            src = inspect.getsource(q.fn)
        except (OSError, TypeError):
            src = repr(q.fn)
        out[name] = hashlib.sha256(
            (src + "\x00" + (q.sql or "")).encode()).hexdigest()[:16]
    return out


def compute_window() -> tuple[list[str], dict]:
    sys.path.insert(0, REPO)
    from spark_sentiment_spark.plans.registry import REGISTRY, all_queries
    all_queries()
    oracle_names = [n for n, q in REGISTRY.items() if q.sql is not None]
    # Queries REGISTERED after the window was cut (absent from the cut-time
    # hash snapshot) stay out of the frozen window — they'd otherwise
    # classify as never-checked and churn the committed list mid-round.
    # The next cut rewrites the snapshot and windows them as class (a).
    if os.path.exists(HASHES_PATH):
        cut_names = set(json.load(open(HASHES_PATH)))
        oracle_names = [n for n in oracle_names if n in cut_names]

    latest: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(path.rsplit("_r", 1)[1].split(".")[0])
        if rnd >= WINDOW_ROUND:
            continue  # history strictly before the window's round
        for name in json.load(open(path)):
            latest[name] = max(latest.get(name, 0), rnd)

    never = sorted(n for n in oracle_names if n not in latest)
    upgraded = [n for n, rnd in UPGRADED_SINCE_ROW.items()
                if rnd <= WINDOW_ROUND  # close-time cut: see policy note
                and n in oracle_names and n in latest and latest[n] < rnd]
    # One-time rows-only routing (see FORCE_ROWS_ONLY): only at its
    # designated cut, only while it still has no driver row of any kind.
    forced = sorted(n for n, rnd in FORCE_ROWS_ONLY.items()
                    if rnd == WINDOW_ROUND
                    and n in REGISTRY and REGISTRY[n].sql is None
                    and n not in latest)
    stale = sorted(((latest[n], n) for n in oracle_names
                    if n in latest and n not in upgraded),
                   key=lambda t: (t[0], t[1]))

    window = never + upgraded + forced
    backfill = [n for _, n in stale][: max(0, WINDOW_SIZE - len(window))]
    window += backfill
    info = {
        "never": never,
        "upgraded": upgraded,
        "forced": forced,
        "backfill": backfill,
        "latest": latest,
    }
    return window[:WINDOW_SIZE], info


if __name__ == "__main__":
    # --cut = cutting a NEW window (bump WINDOW_ROUND first): rewrite the
    # hash snapshot so the whole current catalog is eligible. Without the
    # flag the snapshot is left alone — a mid-round run just prints the
    # (stable) committed window, instead of silently re-baselining it.
    if "--cut" in sys.argv or not os.path.exists(HASHES_PATH):
        with open(HASHES_PATH, "w") as f:
            json.dump(source_hashes(), f, indent=1, sort_keys=True)
        print(f"# wrote {HASHES_PATH}")
    window, info = compute_window()
    print(f"# {len(info['never'])} never-checked + {len(info['upgraded'])} "
          f"upgraded-since-row + {len(info['forced'])} forced-rows-only + "
          f"{len(info['backfill'])} oldest-stale backfill = {len(window)}")
    print("_WINDOW_PRIORITY = [")
    for section, names in (("never driver-checked", info["never"]),
                           ("upgraded after latest row", info["upgraded"]),
                           ("forced rows-only (one-time)", info["forced"]),
                           ("oldest-stale backfill", info["backfill"])):
        print(f"    # — {section} —")
        for n in names:
            if n in window:
                suffix = (f"  # r{info['latest'][n]}"
                          if n in info["latest"] else "")
                print(f'    "{n}",{suffix}')
    print("]")
