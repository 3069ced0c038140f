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
