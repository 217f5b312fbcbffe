"""Stratified sampling: seeded determinism + per-stratum rate tolerance."""

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def test_stratified_sample_deterministic(spark):
    from spark_sentiment_spark.plans.registry import REGISTRY, all_queries

    all_queries()
    fn = REGISTRY["sample_stratified"].fn
    a = fn(spark, SF_DIR).collect()
    b = fn(spark, SF_DIR).collect()
    assert sorted(r.doc_id for r in a) == sorted(r.doc_id for r in b)
    assert len(a) > 0


def test_stratified_sample_rates(spark):
    from spark_sentiment_spark.plans.registry import REGISTRY, all_queries, load

    all_queries()
    got = REGISTRY["sample_stratified"].fn(spark, SF_DIR)
    docs = load(spark, SF_DIR, "documents")
    totals = {r["lang"]: r["n"] for r in
              docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    sampled = {r["lang"]: r["n"] for r in
               got.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    want = {"en": 0.5, "de": 0.25, "fr": 0.25, "es": 0.25, "zh": 0.25}
    for lang, frac in want.items():
        rate = sampled.get(lang, 0) / totals[lang]
        # Bernoulli at n>=70 per stratum: allow a generous band
        assert abs(rate - frac) < 0.2, (lang, rate, frac)
