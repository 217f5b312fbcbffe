"""Multimodal column support (SURVEY.md §7.4): image/audio/video as opaque
``binary`` columns with typed metadata, plus the Spark-side plumbing for
decode / feature-extract / resize / frame-sample.

The container has no image/audio codecs, so the *codec* step is a
deterministic fake behind ``_FAKE_CODEC`` (clearly marked; swap in
PIL/ffmpeg per-batch inside the same ``mapInPandas`` functions in a real
deployment — the schema, partitioning, UDF signature, and Arrow batch
shape are the real, tested part).

Scale posture: binary payloads stay columnar end-to-end (Arrow batches in,
Arrow batches out — no per-row Python calls); metadata extraction that
doesn't need the codec (byte length, content hash, magic-byte sniffing) is
pure JVM Column expressions and never leaves Tungsten.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: magic-byte prefixes → mime label (sniffed natively via F.substring)
MAGIC_BYTES = (
    (b"\x89PNG", "image/png"),
    (b"\xff\xd8\xff", "image/jpeg"),
    (b"GIF8", "image/gif"),
    (b"RIFF", "audio/wav"),
    (b"ID3", "audio/mpeg"),
    (b"\x00\x00\x00", "video/mp4"),
)

_FAKE_CODEC = True  # no PIL/ffmpeg in this container — deterministic stub


def attach_binary_content(df: DataFrame, text_col: str = "text",
                          id_col: str = "doc_id") -> DataFrame:
    """Build a multimodal table from ``documents``: the text bytes stand in
    for an opaque media payload (deterministic), with typed metadata."""
    content = F.encode(F.col(text_col), "UTF-8")
    modality = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col(id_col) % 3 + 1).cast("int"))
    return df.select(
        F.col(id_col),
        modality.alias("modality"),
        content.alias("content"),
        F.struct(
            F.length(content).alias("n_bytes"),
            F.lit("synthetic").alias("source"),
        ).alias("meta"),
    )


def binary_fingerprints(df: DataFrame, content_col: str = "content",
                        id_col: str = "doc_id") -> DataFrame:
    """Codec-free metadata: byte length, sha256, magic-byte mime sniff —
    all JVM-native Column expressions over the binary column."""
    content = F.col(content_col)
    mime = F.lit("application/octet-stream")
    for magic, label in reversed(MAGIC_BYTES):
        hexpat = magic.hex()
        mime = F.when(
            F.lower(F.hex(F.substring(content, 1, len(magic))))
            == F.lit(hexpat), label
        ).otherwise(mime)
    return df.select(
        F.col(id_col),
        F.length(content).cast("long").alias("n_bytes"),
        F.lower(F.sha2(content, 256)).alias("sha256"),
        mime.alias("sniffed_mime"),
    )


def decode_features(df: DataFrame, content_col: str = "content",
                    id_col: str = "doc_id", batch_hint: int = 1000
                    ) -> DataFrame:
    """Decode + feature-extract over ``mapInPandas``: Arrow batches of
    binary payloads → fixed-width feature rows. The decode itself is the
    deterministic fake (byte-histogram stats standing in for decoded
    pixels/samples); a real deployment decodes inside the same loop."""
    import pandas as pd

    schema = (f"{id_col} long, n_bytes long, mean_byte double, "
              "entropy_bits double, width int, height int")

    def extract(batches):
        import math

        for pdf in batches:
            rows = []
            for did, buf in zip(pdf[id_col], pdf[content_col]):
                b = bytes(buf)
                n = len(b)
                if _FAKE_CODEC:
                    # deterministic fake decode: byte stats + fake geometry
                    counts = [0] * 256
                    for byte in b:
                        counts[byte] += 1
                    mean = sum(i * c for i, c in enumerate(counts)) / n if n else 0.0
                    ent = -sum((c / n) * math.log2(c / n)
                               for c in counts if c) if n else 0.0
                    width = 1 + (n % 640)
                    height = 1 + ((n * 7919) % 480)
                else:  # pragma: no cover - real codec path
                    raise NotImplementedError("install PIL/ffmpeg and decode here")
                rows.append((did, n, mean, ent, width, height))
            yield pd.DataFrame(
                rows, columns=[id_col, "n_bytes", "mean_byte",
                               "entropy_bits", "width", "height"])

    return df.select(id_col, content_col).mapInPandas(extract, schema)


def resize_stub(df: DataFrame, content_col: str = "content",
                id_col: str = "doc_id", max_dim: int = 256) -> DataFrame:
    """Resize plumbing: binary in → binary out, same partitioning. The fake
    'resize' truncates payloads to max_dim² bytes (a real codec decodes,
    resizes, re-encodes inside the same Arrow batch loop)."""
    import pandas as pd

    schema = f"{id_col} long, content binary, resized boolean"

    def resize(batches):
        limit = max_dim * max_dim
        for pdf in batches:
            out = pd.DataFrame({
                id_col: pdf[id_col],
                "content": [bytes(b)[:limit] for b in pdf[content_col]],
                "resized": [len(bytes(b)) > limit for b in pdf[content_col]],
            })
            yield out

    return df.select(id_col, content_col).mapInPandas(resize, schema)


def frame_sample_stub(df: DataFrame, content_col: str = "content",
                      id_col: str = "doc_id", n_frames: int = 4) -> DataFrame:
    """Frame-sampling plumbing for video payloads: one row per sampled
    frame (posexplode shape). Fake codec: evenly-spaced byte slices."""
    import pandas as pd

    schema = f"{id_col} long, frame_idx int, frame binary"

    def sample(batches):
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for did, buf in zip(pdf[id_col], pdf[content_col]):
                b = bytes(buf)
                step = max(1, len(b) // n_frames)
                for i in range(n_frames):
                    ids.append(did)
                    idxs.append(i)
                    frames.append(b[i * step:(i + 1) * step])
            yield pd.DataFrame({id_col: ids, "frame_idx": idxs,
                                "frame": frames})

    return df.select(id_col, content_col).mapInPandas(sample, schema)
