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


def test_semantic_dedup_invariant_and_recall(spark):
    """(a) No two KEPT vectors in the same cluster are within tau of each
    other — the keep-policy's hard guarantee. (b) Cluster scoping still
    catches most true near-dup pairs from the exact all-pairs oracle
    (cross-cluster pairs are the accepted miss)."""
    import itertools
    import math

    rows = REGISTRY["dedup_semantic"].fn(spark, SF_DIR).collect()
    exact = REGISTRY["dedup_embedding_cosine"].fn(spark, SF_DIR).collect()
    emb = {r.vec_id: r.embedding
           for r in spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
           .collect()}
    release_caches()
    assert exact, "fixture has no true cosine near-dup pairs"

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return d / (na * nb)

    by_cluster = {}
    for r in rows:
        if r.kept:
            by_cluster.setdefault(r.cluster, []).append(r.vec_id)
    for cluster, ids in by_cluster.items():
        for i, j in itertools.combinations(ids, 2):
            assert cos(emb[i], emb[j]) < 0.4, (cluster, i, j)

    dropped = {r.vec_id for r in rows if not r.kept}
    true_pairs = [(r.vec_a, r.vec_b) for r in exact]
    caught = sum(1 for a, b in true_pairs if a in dropped or b in dropped)
    recall = caught / len(true_pairs)
    assert recall >= 0.5, f"semantic-dedup pair recall {recall:.3f}"
