"""MinHash-LSH candidate quality pinned against the exact Jaccard oracle:
every true near-dup pair (exact 3-shingle Jaccard >= 0.9) must surface as
an LSH candidate (estimated >= 0.5), and the estimates must track truth."""

from spark_sentiment_spark.plans.registry import (REGISTRY, all_queries,
                                                  release_caches)
from tests.conftest import SF_DIR

all_queries()


def test_minhash_lsh_full_recall_of_true_neardups(spark):
    exact = REGISTRY["dedup_jaccard_pairs"].fn(spark, SF_DIR).collect()
    cand = REGISTRY["dedup_minhash_lsh"].fn(spark, SF_DIR).collect()
    release_caches()
    assert exact, "fixture has no true near-dup pairs — test is vacuous"
    exact_pairs = {(r.doc_a, r.doc_b): r.jaccard for r in exact}
    est = {(r.doc_a, r.doc_b): r.est_jaccard for r in cand}
    missed = set(exact_pairs) - set(est)
    assert not missed, f"LSH missed true near-dup pairs: {sorted(missed)[:5]}"
    # 32-hash estimate of a >=0.9 Jaccard pair: binomial(32, j) / 32; a
    # 0.25 tolerance is ~4 sigma
    for pair, j in exact_pairs.items():
        assert abs(est[pair] - j) <= 0.25, (pair, j, est[pair])
