"""Multimodal column support (SURVEY §2.11 L6).

Media payloads ride as opaque ``binary`` columns next to a typed metadata
struct (mime, size, dims). All relational operators carry them untouched;
decode / feature-extraction happens in Arrow-batched ``mapInPandas``
operators.

The container has no image/audio codecs, so :func:`decode_media` STUBS the
actual decode behind a deterministic fake (documented below) while keeping
the Spark-side plumbing real: schema contract, batch iteration, partition
behavior — that is what is tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

PAYLOAD_META_SCHEMA = "mime string, size_bytes bigint, width int, height int"


def attach_binary_payload(docs: DataFrame, text_col: str = "text",
                          mime: str = "text/plain") -> DataFrame:
    """Build a multimodal frame from the documents table: the UTF-8 bytes of
    `text_col` become the payload, with a typed metadata struct."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return docs.withColumn("payload", payload).withColumn(
        "media_meta",
        F.struct(
            F.lit(mime).alias("mime"),
            F.octet_length(payload).cast("long").alias("size_bytes"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
        ),
    )


def extract_payload_meta(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Flatten payload metadata for relational consumption."""
    return df.select(
        F.col(id_col),
        F.col("media_meta.mime").alias("mime"),
        F.col("media_meta.size_bytes").alias("size_bytes"),
    )


def decode_media(df: DataFrame, id_col: str = "doc_id",
                 feature_dim: int = 8) -> DataFrame:
    """Decode payloads to fixed-dim feature vectors via mapInPandas.

    STUB DECODER: real image/audio decoding needs codec libraries absent
    from this container. The stand-in is deterministic — feature[i] is a
    byte-histogram moment of the payload — so tests can assert exact values
    while the Arrow plumbing (binary in, array<double> out, batched) is the
    real production shape. Swap ``_fake_decode`` for a PIL/librosa call to
    productionize.
    """
    import numpy as np
    import pandas as pd

    def _fake_decode(payload: bytes) -> list[float]:
        if payload is None:
            return [0.0] * feature_dim
        arr = np.frombuffer(payload, dtype=np.uint8)
        if arr.size == 0:
            return [0.0] * feature_dim
        return [float(arr[i::feature_dim].sum() % 997) for i in range(feature_dim)]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({
                id_col: pdf[id_col].values,
                "features": [_fake_decode(p) for p in pdf["payload"]],
            })

    return (df.select(id_col, "payload")
            .mapInPandas(run, f"{id_col} long, features array<double>"))


def sample_frames(df: DataFrame, frame_bytes: int = 64, stride: int = 4,
                  id_col: str = "doc_id") -> DataFrame:
    """Uniform-stride frame sampling over a raw fixed-size-frame payload —
    the video-pipeline primitive "keep every k-th frame". Returns
    (id, frame_idx, n_frames, frame binary), full frames only.

    Pure JVM expressions (sequence -> explode -> binary substring), no
    Python boundary — the deliberate contrast to decode_media's Arrow
    path: sampling happens BEFORE any decode, so at 100 TB the skipped
    frames are never materialized, shuffled, or shipped to Python. A
    real codec's keyframe-aware sampler would replace the fixed
    `frame_bytes` arithmetic with an index lookup; the Spark plumbing
    (explode shape, binary slicing, downstream schema) is identical.
    """
    n_frames = F.floor(F.octet_length("payload") / F.lit(frame_bytes)) \
        .cast("long")
    return (df.withColumn("n_frames", n_frames)
            .filter(F.col("n_frames") > 0)
            .withColumn("frame_idx",
                        F.explode(F.sequence(
                            F.lit(0).cast("long"),
                            F.col("n_frames") - 1,
                            F.lit(stride).cast("long"))))
            .select(id_col, "frame_idx", "n_frames",
                    F.expr(f"substring(payload, frame_idx * {frame_bytes}"
                           f" + 1, {frame_bytes})").alias("frame")))
