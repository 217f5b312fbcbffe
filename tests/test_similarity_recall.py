"""Approximation quality of the ANN family pinned as tested numbers:
LSH pair recall vs brute force, and IVF per-query recall vs exact KNN."""

import numpy as np
import pyarrow.parquet as pq
import pytest

from spark_sentiment_spark.plans.registry import REGISTRY, all_queries, release_caches
from tests.conftest import SF_DIR

all_queries()


def _exact_top_pairs(k: int = 200) -> set:
    t = pq.read_table(f"{SF_DIR}/embeddings.parquet")
    V = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    ids = np.array(t["vec_id"].to_pylist())
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    S = Vn @ Vn.T
    iu = np.triu_indices(len(V), 1)
    order = np.argsort(-S[iu])[:k]
    return {
        (min(ids[iu[0][j]], ids[iu[1][j]]), max(ids[iu[0][j]], ids[iu[1][j]]))
        for j in order
    }


def test_ann_lsh_recall_floor(spark):
    """recall@200 of the multi-table LSH vs brute-force top-200 pairs.
    The corpus' top pairs sit at cosine ~0.4 — LSH's hardest regime (the
    12x6 config catches such a pair w.p. ~0.54; at near-dup similarities
    >=0.8 the same config exceeds 0.99). The floor pins that the banding /
    OR-amplification machinery works; it is not a near-dup recall claim."""
    got = REGISTRY["ann_lsh_topk"].fn(spark, SF_DIR).collect()
    release_caches()
    lsh_pairs = {(min(r.vec_a, r.vec_b), max(r.vec_a, r.vec_b)) for r in got}
    exact = _exact_top_pairs(200)
    recall = len(exact & lsh_pairs) / len(exact)
    assert recall >= 0.45, f"LSH recall@200 degraded to {recall:.3f}"


def test_ann_ivf_recall_floor(spark):
    """Per-query recall@10 of the IVF (probe 2 of 16 cells) path vs the
    exact KNN query, averaged over the 5 query vectors."""
    exact = REGISTRY["knn_cosine_topk"].fn(spark, SF_DIR).collect()
    approx = REGISTRY["ann_ivf_topk"].fn(spark, SF_DIR).collect()
    release_caches()
    exact_by_q: dict = {}
    for r in exact:
        exact_by_q.setdefault(r.qid, set()).add(r.vec_id)
    approx_by_q: dict = {}
    for r in approx:
        approx_by_q.setdefault(r.qid, set()).add(r.vec_id)
    recalls = [
        len(exact_by_q[q] & approx_by_q.get(q, set())) / len(exact_by_q[q])
        for q in exact_by_q
    ]
    mean_recall = sum(recalls) / len(recalls)
    assert mean_recall >= 0.5, f"IVF recall@10 degraded to {mean_recall:.3f}"


def test_quantized_knn_recall_and_error(spark):
    """int8 quantization quality pinned: reconstruction cosine error tiny,
    and brute-force top-10 neighbors computed on dequantized vectors agree
    with float top-10 at recall >= 0.9 (averaged over 5 queries)."""
    rows = REGISTRY["embedding_quantize"].fn(spark, SF_DIR).collect()
    release_caches()
    assert all(r.cos_err < 5e-4 for r in rows)

    t = pq.read_table(f"{SF_DIR}/embeddings.parquet")
    V = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    ids = np.array(t["vec_id"].to_pylist())
    mx = np.abs(V).max(axis=1, keepdims=True)
    D = np.round(V * 127.0 / mx) * mx / 127.0

    def topk(M, k=10):
        Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
        S = Mn @ Mn.T
        np.fill_diagonal(S, -np.inf)
        out = {}
        for qi in np.where(ids < 5)[0]:
            out[ids[qi]] = set(ids[np.argsort(-S[qi])[:k]])
        return out

    exact, quant = topk(V), topk(D)
    recalls = [len(exact[q] & quant[q]) / 10 for q in exact]
    assert sum(recalls) / len(recalls) >= 0.9


def test_pq_recall_floor_vs_brute(spark):
    """PQ ADC + exact re-rank must recall >=0.7 of the brute-force top-10
    (measured 0.84 at sf0.01 with the default rerank depth; floor leaves
    margin for the codebook sample draw)."""
    from collections import defaultdict

    from spark_sentiment_spark.plans.registry import (REGISTRY, all_queries,
                                                      release_caches)

    all_queries()
    brute = REGISTRY["knn_cosine_topk"].fn(spark, SF_DIR).collect()
    pq = REGISTRY["ann_pq_topk"].fn(spark, SF_DIR).collect()
    release_caches()
    b, t = defaultdict(set), defaultdict(set)
    for r in brute:
        b[r["qid"]].add(r["vec_id"])
    for r in pq:
        t[r["qid"]].add(r["vec_id"])
    recalls = [len(t[q] & b[q]) / len(b[q]) for q in b]
    assert sum(recalls) / len(recalls) >= 0.7, recalls
