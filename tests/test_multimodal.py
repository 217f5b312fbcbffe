"""Multimodal binary-column plumbing: schemas, Arrow batch shapes, and the
codec-free (JVM-native) metadata path."""

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def mm(spark):
    from spark_sentiment_spark.operators.multimodal import (
        attach_binary_content)

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    return attach_binary_content(docs)


def test_binary_schema(mm):
    types = dict(mm.dtypes)
    assert types["content"] == "binary"
    assert types["modality"] == "string"
    assert types["meta"].startswith("struct<n_bytes:")
    mods = {r[0] for r in mm.select("modality").distinct().collect()}
    assert mods <= {"image", "audio", "video"}


def test_fingerprints_native(mm, spark):
    from spark_sentiment_spark.operators.multimodal import (
        binary_fingerprints)

    fp = binary_fingerprints(mm)
    row = fp.orderBy("doc_id").first()
    assert len(row["sha256"]) == 64
    assert row["n_bytes"] > 0
    assert row["sniffed_mime"] == "application/octet-stream"
    # no Python in the plan: only project/scan nodes
    plan = fp._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan


def test_magic_byte_sniffing(spark):
    from spark_sentiment_spark.operators.multimodal import (
        binary_fingerprints)

    payloads = [
        (1, b"\x89PNG\r\n\x1a\nrest"),
        (2, b"\xff\xd8\xff\xe0jpeg"),
        (3, b"GIF89a...."),
        (4, b"RIFF....WAVE"),
        (5, b"plain text bytes"),
    ]
    df = spark.createDataFrame(payloads, "doc_id long, content binary")
    got = {r["doc_id"]: r["sniffed_mime"]
           for r in binary_fingerprints(df).collect()}
    assert got == {1: "image/png", 2: "image/jpeg", 3: "image/gif",
                   4: "audio/wav", 5: "application/octet-stream"}


def test_decode_features_shape(mm):
    from spark_sentiment_spark.operators.multimodal import decode_features

    feats = decode_features(mm)
    assert dict(feats.dtypes) == {
        "doc_id": "bigint", "n_bytes": "bigint", "mean_byte": "double",
        "entropy_bits": "double", "width": "int", "height": "int"}
    row = feats.orderBy("doc_id").first()
    assert 0 <= row["mean_byte"] <= 255
    assert 0 <= row["entropy_bits"] <= 8
    assert 1 <= row["width"] <= 640 and 1 <= row["height"] <= 480
    assert feats.count() == mm.count()


def test_resize_stub(mm):
    from spark_sentiment_spark.operators.multimodal import resize_stub

    out = resize_stub(mm, max_dim=16)  # 256-byte cap → everything truncates
    assert dict(out.dtypes)["content"] == "binary"
    over = out.where(F.length("content") > 256).count()
    assert over == 0
    assert out.where(F.col("resized")).count() > 0


def test_frame_sample_stub(mm):
    from spark_sentiment_spark.operators.multimodal import frame_sample_stub

    out = frame_sample_stub(mm, n_frames=4)
    assert out.count() == mm.count() * 4
    idx = {r[0] for r in out.select("frame_idx").distinct().collect()}
    assert idx == {0, 1, 2, 3}
