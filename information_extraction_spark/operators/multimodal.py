"""Multimodal column plumbing: opaque ``binary`` payloads + typed
metadata, processed by Arrow-batched pandas UDFs via mapInPandas.

The image/audio codec libraries are not present in this container, so
the decode step is STUBBED: ``decode_image`` raises
NotImplementedError unless ``deterministic_fake=True``, in which case
it derives a fake (width, height, n_frames) deterministically from
the payload bytes. Everything Spark-side — schema, batch iteration,
partitioning, UDF signatures — is real and tested; a real decoder
drops into ``_decode_payload`` without touching the plumbing.

Scale notes: binary payloads ride in Parquet/Iceberg as BINARY
columns; feature extraction is a narrow mapInPandas pass (no shuffle)
whose Arrow batch size bounds executor memory (payload_bytes ×
maxRecordsPerBatch). Frame sampling fans out rows (one per sampled
frame) — an explode, still narrow.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

MEDIA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
    ]
)

FEATURES = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("digest", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
    ]
)


def _decode_payload(payload: bytes, kind: str, deterministic_fake: bool):
    """STUB decode. Real implementation would dispatch to PIL/ffmpeg;
    neither ships in this container (environment constraint)."""
    if not deterministic_fake:
        raise NotImplementedError(
            "media codecs are not available in this environment; "
            "pass deterministic_fake=True or plug in a real decoder"
        )
    h = hashlib.md5(payload or b"").digest()
    width = 16 + h[0] % 240
    height = 16 + h[1] % 240
    n_frames = 1 if kind == "image" else 1 + h[2] % 30
    return width, height, n_frames


def extract_features(
    media: DataFrame, deterministic_fake: bool = True
) -> DataFrame:
    """Narrow mapInPandas feature-extraction pass over binary payloads."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                payload = bytes(r.payload) if r.payload is not None else b""
                w, h, nf = _decode_payload(payload, r.kind, deterministic_fake)
                rows.append(
                    {
                        "media_id": r.media_id,
                        "kind": r.kind,
                        "n_bytes": len(payload),
                        "digest": hashlib.md5(payload).hexdigest(),
                        "width": w,
                        "height": h,
                        "n_frames": nf,
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=[f.name for f in FEATURES.fields],
            )

    return media.mapInPandas(run, schema=FEATURES)


def sample_frames(features: DataFrame, every_k: int = 5) -> DataFrame:
    """Fan out one row per sampled frame index (explode — narrow)."""
    from pyspark.sql import functions as F

    idx = F.sequence(
        F.lit(0), F.greatest(F.col("n_frames") - 1, F.lit(0)), F.lit(every_k)
    )
    return features.select(
        "media_id", "kind", F.explode(idx).alias("frame_idx")
    )


def synthetic_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table for tests/bench (payload bytes
    derived from the id — no external data)."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        payload = hashlib.sha256(str(i).encode()).digest() * (1 + i % 7)
        rows.append(
            (i, kinds[i % 3], bytearray(payload), "application/octet-stream", "synthetic")
        )
    return spark.createDataFrame(rows, schema=MEDIA)
