"""Similarity search over the ``embeddings`` table (array<float>, dim 64).

Brute-force cosine top-k is the exactness baseline (and DuckDB-checkable);
the LSH-bucketed variant is the sublinear scale path. Dot products run as
native ``aggregate``/``zip_with`` Column expressions — JVM-side, no Python.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from spark_sentiment_spark.plans.registry import (load, register,
                                                  track_persist)


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(F.aggregate(
        F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x
    ))


KNN_SQL = """
WITH q AS (
  SELECT vec_id AS qid, embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id < 5
),
c AS (SELECT vec_id, label, embedding::DOUBLE[] AS ce FROM embeddings),
scored AS (
  SELECT q.qid, c.vec_id, c.label,
         list_dot_product(q.qe, c.ce)
           / (sqrt(list_dot_product(q.qe, q.qe)) * sqrt(list_dot_product(c.ce, c.ce)))
           AS cos
  FROM q CROSS JOIN c
  WHERE q.qid <> c.vec_id
),
ranked AS (
  SELECT qid, vec_id, label, cos,
         row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rn
  FROM scored
)
SELECT qid, vec_id, CAST(label AS BIGINT) AS label, round(cos, 6) AS cosine,
       CAST(rn AS BIGINT) AS rn
FROM ranked WHERE rn <= 10
ORDER BY qid, rn
"""


@register("knn_cosine_topk", sql=KNN_SQL, tags=("similarity",))
def knn_cosine_topk(spark, sf_dir):
    """Exact cosine top-10 for 5 query vectors — broadcast the queries,
    stream the corpus once, per-query top-k via window."""
    emb = load(spark, sf_dir, "embeddings")
    q = (emb.where(F.col("vec_id") < 5)
         .select(F.col("vec_id").alias("qid"),
                 _as_double("embedding").alias("qe")))
    c = emb.select("vec_id", "label", _as_double("embedding").alias("ce"))
    cos = _dot(F.col("qe"), F.col("ce")) / (_norm(F.col("qe")) * _norm(F.col("ce")))
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("qid") != F.col("vec_id"))
        .select("qid", "vec_id", F.col("label").cast("long").alias("label"),
                cos.alias("cos"))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("long"))
        .where(F.col("rn") <= 10)
        .select("qid", "vec_id", "label",
                F.round("cos", 6).alias("cosine"), "rn")
        .orderBy("qid", "rn")
    )


CENTROID_SQL = """
WITH c AS (SELECT label, embedding::DOUBLE[] AS e FROM embeddings),
per_dim AS (
  SELECT label, i, avg(e[i]) AS v
  FROM c, generate_series(1, 64) AS t(i)
  GROUP BY label, i
)
SELECT CAST(label AS BIGINT) AS label,
       round(sum(v * v), 6) AS centroid_sqnorm,
       CAST(count(*) AS BIGINT) AS dim
FROM per_dim
GROUP BY label
ORDER BY label
"""


@register("embedding_centroids", sql=CENTROID_SQL, tags=("similarity",))
def embedding_centroids(spark, sf_dir):
    """Per-label centroid squared-norm — element-wise aggregate over array
    columns via posexplode (the building block of IVF coarse quantization)."""
    emb = load(spark, sf_dir, "embeddings")
    per_dim = (
        emb.select("label", F.posexplode(_as_double("embedding"))
                   .alias("i", "x"))
        .groupBy("label", "i")
        .agg(F.avg("x").alias("v"))
    )
    return (
        per_dim.groupBy(F.col("label").cast("long").alias("label"))
        .agg(
            F.round(F.sum(F.col("v") * F.col("v")), 6).alias("centroid_sqnorm"),
            F.count(F.lit(1)).alias("dim"),
        )
        .orderBy("label")
    )


@register("ann_ivf_topk", tags=("similarity",))
def ann_ivf_topk(spark, sf_dir):
    """IVF (inverted-file) ANN: KMeans coarse quantizer (k=16, fixed seed)
    partitions the corpus into cells; each query probes its 2 nearest
    cells and exact-cosine re-ranks only those candidates — the classic
    sublinear trade (probe 2/16 of the corpus) next to the LSH variant
    below. Centroids and query→cell routing are driver-side (k×q is tiny);
    the corpus-side work is one KMeans fit + a cell-filtered join.
    Rows-only check (cluster assignments are implementation-specific).
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    emb = load(spark, sf_dir, "embeddings")
    vecs = emb.select(
        "vec_id", "label", _as_double("embedding").alias("e"),
        array_to_vector(_as_double("embedding")).alias("features"))
    km = KMeans(k=16, seed=42, featuresCol="features",
                predictionCol="cell")
    model = km.fit(vecs)
    assigned = model.transform(vecs).select("vec_id", "label", "e", "cell")

    centroids = [list(map(float, c)) for c in model.clusterCenters()]
    queries = assigned.where(F.col("vec_id") < 5) \
        .select(F.col("vec_id").alias("qid"), F.col("e").alias("qe")).collect()

    import math

    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return dot / (na * nb) if na and nb else 0.0

    # route each query to its 2 nearest cells (driver-side: q×k tiny)
    probe_rows = []
    for q in queries:
        ranked = sorted(range(len(centroids)),
                        key=lambda c: -cos(q["qe"], centroids[c]))
        for cell in ranked[:2]:
            probe_rows.append((q["qid"], q["qe"], cell))
    probes = spark.createDataFrame(
        probe_rows, "qid long, qe array<double>, cell int")

    cand = assigned.join(F.broadcast(probes), "cell") \
        .where(F.col("vec_id") != F.col("qid"))
    c = _dot(F.col("qe"), F.col("e")) / (_norm(F.col("qe")) * _norm(F.col("e")))
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        cand.select("qid", "vec_id",
                    F.col("label").cast("long").alias("label"),
                    c.alias("cos"))
        .withColumn("rn", F.row_number().over(w).cast("long"))
        .where(F.col("rn") <= 10)
        .select("qid", "vec_id", "label", F.round("cos", 6).alias("cosine"),
                "rn")
        .orderBy("qid", "rn")
    )


EMB_DEDUP_SQL = """
WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       round(list_dot_product(a.e, b.e)
             / (sqrt(list_dot_product(a.e, a.e))
                * sqrt(list_dot_product(b.e, b.e))), 6) AS cosine
FROM c a JOIN c b ON a.vec_id < b.vec_id
WHERE list_dot_product(a.e, b.e)
      / (sqrt(list_dot_product(a.e, a.e))
         * sqrt(list_dot_product(b.e, b.e))) >= 0.4
ORDER BY vec_a, vec_b
"""


@register("dedup_embedding_cosine", sql=EMB_DEDUP_SQL,
          tags=("dedup", "similarity"))
def dedup_embedding_cosine(spark, sf_dir):
    """Embedding-cosine near-dup pairs (threshold 0.4 — the tail of this
    corpus's similarity distribution), exact all-pairs formulation as the
    small-SF oracle; the LSH-bucketed query below is the same operator's
    100 TB path. Norms are computed once per side before the join so the
    pair loop is one dot product, not three."""
    emb = load(spark, sf_dir, "embeddings")
    e = _as_double("embedding")
    sides = emb.select("vec_id", (F.transform(
        e, lambda x: x / _norm(e))).alias("u"))
    a, b = sides.alias("a"), sides.alias("b")
    cos = _dot(F.col("a.u"), F.col("b.u"))
    return (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .where(cos >= 0.4)
        .select(F.col("a.vec_id").alias("vec_a"),
                F.col("b.vec_id").alias("vec_b"),
                F.round(cos, 6).alias("cosine"))
        .orderBy("vec_a", "vec_b")
    )


@register("ann_lsh_topk", bench=True, tags=("similarity",))
def ann_lsh_topk(spark, sf_dir):
    """Approximate NN via random-hyperplane LSH, fully native: 8 fixed
    random hyperplanes → 8-bit signature → candidates share the bucket →
    exact cosine re-rank within buckets, global top-200 pairs. Sublinear
    candidate generation — the 100 TB path (brute-force stays as the recall
    oracle). Rows-only check.
    """
    import random

    emb = load(spark, sf_dir, "embeddings")
    dim, n_planes = 64, 8
    rng = random.Random(7)
    planes = [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]

    e = _as_double("embedding")
    # Each hyperplane is an array *literal*; the dot is one zip_with/aggregate
    # pair instead of 64 element_at products — keeps the expression tree (and
    # Janino codegen) small. The sign bits pack into one bucket id.
    sig = sum(
        F.when(_dot(e, F.lit(planes[i])) > 0, F.lit(1 << i)).otherwise(F.lit(0))
        for i in range(n_planes)
    )
    # One row per vector (id, label, embedding, bucket) — computed once and
    # persisted so the bucket self-join reuses it instead of re-scanning.
    signed = track_persist(
        emb.select("vec_id", "label", e.alias("e"),
                   sig.cast("long").alias("bucket")))
    a = signed.alias("a")
    b = signed.alias("b")
    cos = _dot(F.col("a.e"), F.col("b.e")) / (
        _norm(F.col("a.e")) * _norm(F.col("b.e"))
    )
    pairs = (
        a.join(b, (F.col("a.bucket") == F.col("b.bucket"))
               & (F.col("a.vec_id") < F.col("b.vec_id")))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.round(cos, 6).alias("cosine"),
        )
    )
    return pairs.orderBy(F.desc("cosine"), "vec_a", "vec_b").limit(200)
