"""Multimodal-column queries over ``documents`` (binary payload plumbing,
SURVEY §7.4). The text bytes stand in for opaque media content; codec-free
metadata is DuckDB-checkable, the mapInPandas decode path is rows-only."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_sentiment_spark.plans.registry import load, register

FINGERPRINT_SQL = """
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       lower(sha256(text))                        AS sha256,
       'application/octet-stream'                 AS sniffed_mime
FROM documents
ORDER BY doc_id
"""


@register("multimodal_fingerprints", sql=FINGERPRINT_SQL,
          tags=("multimodal",))
def multimodal_fingerprints(spark, sf_dir):
    """Codec-free binary metadata (length, sha256, magic-byte mime sniff) —
    JVM-native over the binary column; text payloads sniff to octet-stream."""
    from spark_sentiment_spark.operators.multimodal import (
        attach_binary_content, binary_fingerprints)

    docs = load(spark, sf_dir, "documents")
    mm = attach_binary_content(docs)
    return binary_fingerprints(mm).orderBy("doc_id")


@register("multimodal_decode_features", tags=("multimodal",))
def multimodal_decode_features(spark, sf_dir):
    """Arrow-batched decode/feature-extract via mapInPandas (deterministic
    fake codec — byte histogram stats; rows-only check)."""
    from spark_sentiment_spark.operators.multimodal import (
        attach_binary_content, decode_features)

    docs = load(spark, sf_dir, "documents")
    mm = attach_binary_content(docs)
    return (decode_features(mm)
            .select("doc_id", "n_bytes", "container",
                    F.round("mean_byte", 4).alias("mean_byte"),
                    F.round("entropy_bits", 4).alias("entropy_bits"),
                    "width", "height")
            .orderBy("doc_id"))
