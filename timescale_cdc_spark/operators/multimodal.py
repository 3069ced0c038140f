"""Multimodal columns (SURVEY.md §2 C5): image/audio/video payloads as
opaque ``binary`` columns with a typed metadata struct, processed by
Arrow-batched Pandas functions via ``mapInPandas``.

The Spark-side plumbing — schema, batch shape, partition-parallel
execution — is real and tested; the actual media decode is STUBBED
(this container has no image/audio libraries): ``decode_stub``
raises ``NotImplementedError`` unless ``fake=True``, in which case a
deterministic fake feature vector derived from the payload bytes is
produced (same shape a real decoder would emit).

Scale: payloads ride along in parquet (PLAIN-encoded binary column);
metadata predicates prune without touching bytes; mapInPandas streams
Arrow batches so one partition never materializes more than
``spark.sql.execution.arrow.maxRecordsPerBatch`` payloads.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("n_bytes", T.LongType()),
                    T.StructField("source", T.StringType()),
                ]
            ),
        ),
    ]
)

FEATURE_DIM = 8


def attach_payload(
    df: DataFrame, id_col: str, text_col: str, source_col: str
) -> DataFrame:
    """Build a multimodal frame from the documents fixture: the text
    bytes stand in for a media payload (binary), with a typed metadata
    struct alongside — the C5 storage layout."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col).alias("media_id"),
        payload.alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.octet_length(payload).cast("long").alias("n_bytes"),
            F.col(source_col).alias("source"),
        ).alias("meta"),
    )


def decode_stub(payload: bytes, fake: bool = False) -> np.ndarray:
    """Media decode — STUB. A real deployment plugs Pillow/ffmpeg here.

    fake=True produces a deterministic FEATURE_DIM-float vector from
    the sha256 of the payload (stable across runs/machines), shaped
    exactly like a real embedding head's output. Values are truncated
    (floored) to 6 decimals, not rounded: k/2^32·10^6 is exact in
    float64 (k·10^6 < 2^53), so floor is bit-identical in every
    engine, while round() can tie-break differently (numpy half-even
    vs SQL half-up) on the dyadic rationals that DO land on .5.
    """
    if not fake:
        raise NotImplementedError(
            "media decoding requires image/audio libraries not present in "
            "this environment; pass fake=True for the deterministic stub"
        )
    digest = hashlib.sha256(payload).digest()
    ints = np.frombuffer(digest[: FEATURE_DIM * 4], dtype="<u4").astype("float64")
    return np.floor(ints / 2**32 * 1e6) / 1e6


def extract_features(df: DataFrame, fake: bool = True) -> DataFrame:
    """C5 feature extraction over binary payloads via mapInPandas:
    Arrow batches in, (media_id, n_bytes, feature array) out. The
    iterator shape keeps memory bounded per batch at any scale."""

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("n_bytes", T.LongType()),
            T.StructField("feature", T.ArrayType(T.DoubleType())),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "feature": pdf["payload"].map(
                        lambda p: decode_stub(bytes(p), fake=fake).tolist()
                    ),
                }
            )

    return df.select("media_id", "payload").mapInPandas(run, out_schema)


def resize_stub(
    payload: bytes, width: int, height: int, fake: bool = False
) -> bytes:
    """Image resize — STUB (a real deployment plugs Pillow here).

    fake=True emits a deterministic surrogate: the first
    ``width*height`` bytes of sha256-keyed stream cipher of the
    payload — same length contract a real RGB-packed thumbnail would
    have (w·h·3 clipped to one channel here for compactness), stable
    across runs/machines."""
    if not fake:
        raise NotImplementedError(
            "image resize requires Pillow/libvips, not present in this "
            "environment; pass fake=True for the deterministic stub"
        )
    n = width * height
    out = bytearray()
    counter = 0
    seed = hashlib.sha256(payload).digest()
    while len(out) < n:
        out.extend(hashlib.sha256(seed + counter.to_bytes(4, "big")).digest())
        counter += 1
    return bytes(out[:n])


def resize_images(
    df: DataFrame, width: int = 16, height: int = 16, fake: bool = True
) -> DataFrame:
    """C5 resize over binary payloads: mapInPandas, one Arrow batch at
    a time; output carries the thumbnail payload + updated metadata
    (new mime, byte count) so downstream stages treat it exactly like
    the original multimodal frame."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
            T.StructField(
                "meta",
                T.StructType(
                    [
                        T.StructField("mime", T.StringType()),
                        T.StructField("n_bytes", T.LongType()),
                        T.StructField("width", T.IntegerType()),
                        T.StructField("height", T.IntegerType()),
                    ]
                ),
            ),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            thumbs = pdf["payload"].map(
                lambda p: resize_stub(bytes(p), width, height, fake=fake)
            )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": thumbs,
                    "meta": [
                        {
                            "mime": "image/x-thumb",
                            "n_bytes": len(t),
                            "width": width,
                            "height": height,
                        }
                        for t in thumbs
                    ],
                }
            )

    return df.select("media_id", "payload").mapInPandas(run, out_schema)


def sample_frames(
    df: DataFrame,
    every_n_bytes: int = 64,
    max_frames: int = 8,
    fake: bool = True,
) -> DataFrame:
    """C5 video frame sampling — STUB decode, real plumbing: each
    payload yields up to ``max_frames`` (frame_no, frame_bytes) rows,
    one output row per sampled frame (the explode-shaped output a real
    ffmpeg key-frame sampler produces). Deterministic fake: frame i is
    the payload slice [i·every_n_bytes, (i+1)·every_n_bytes).

    Scale: the fan-out is bounded by max_frames; payload bytes stream
    through Arrow batches and are never shuffled (downstream feature
    extraction is map-side on the same partition).
    """
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("frame_no", T.IntegerType()),
            T.StructField("frame", T.BinaryType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, frame_nos, frames = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if not fake:
                    raise NotImplementedError(
                        "frame sampling requires ffmpeg, not present in "
                        "this environment; pass fake=True for the stub"
                    )
                data = bytes(payload)
                n = min(max_frames, max(1, len(data) // every_n_bytes))
                for i in range(n):
                    ids.append(mid)
                    frame_nos.append(i)
                    frames.append(data[i * every_n_bytes:(i + 1) * every_n_bytes])
            yield pd.DataFrame(
                {"media_id": ids, "frame_no": frame_nos, "frame": frames}
            )

    return df.select("media_id", "payload").mapInPandas(run, out_schema)
