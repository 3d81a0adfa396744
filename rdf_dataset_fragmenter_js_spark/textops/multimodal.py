"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed in Arrow-batched ``mapInPandas``.

The container has no image/audio codecs, so the actual decode is stubbed
behind ``DECODERS`` (clearly-marked deterministic fakes / NotImplementedError)
— but everything Spark-side is real and tested: the schema contract, the
batch iteration shape, partition sizing by byte budget, and the UDF
signatures match what a production decode (PIL/ffmpeg) would use.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("payload", BinaryType(), True),  # opaque encoded bytes
        StructField("mime", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)

FEATURE_SCHEMA = "media_id long, kind string, feature array<float>, n_bytes long"


def _fake_decode_image(payload: bytes) -> np.ndarray:
    """STUB: deterministic fake 'decode' — derives a pseudo-pixel feature
    from the payload bytes. A real deployment replaces this with
    PIL.Image.open; the surrounding Spark plumbing is unchanged."""
    arr = np.frombuffer(payload[:64].ljust(64, b"\0"), dtype=np.uint8).astype(np.float32)
    return arr / 255.0


def _fake_decode_audio(payload: bytes) -> np.ndarray:
    arr = np.frombuffer(payload[:128].ljust(128, b"\0"), dtype=np.uint8).astype(np.float32)
    return (arr - 128.0) / 128.0


def _decode_video(payload: bytes) -> np.ndarray:
    raise NotImplementedError(
        "video decode requires ffmpeg, not available in this container; "
        "plug a frame-sampler here — the mapInPandas plumbing is codec-agnostic"
    )


DECODERS = {"image": _fake_decode_image, "audio": _fake_decode_audio, "video": _decode_video}


def extract_features(media: DataFrame, batch_bytes: int = 64 << 20) -> DataFrame:
    """Decode + featurize media rows in Arrow batches. Partitions are sized
    by byte budget upstream (see :func:`repartition_by_bytes`) so one task
    never holds more than ``batch_bytes`` of payloads."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats, ids, kinds, sizes = [], [], [], []
            for mid, kind, payload in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                decoder = DECODERS.get(kind)
                if decoder is None or payload is None:
                    continue
                try:
                    vec = decoder(bytes(payload))
                except NotImplementedError:
                    continue  # unsupported modality in this container
                feats.append(vec.tolist())
                ids.append(mid)
                kinds.append(kind)
                sizes.append(len(payload))
            yield pd.DataFrame(
                {"media_id": ids, "kind": kinds, "feature": feats, "n_bytes": sizes}
            )

    return media.mapInPandas(batches, schema=FEATURE_SCHEMA)


def repartition_by_bytes(media: DataFrame, target_bytes: int = 256 << 20) -> DataFrame:
    """Size partitions by payload bytes, not row count — binary columns make
    row-count partitioning useless (one 4K video ≈ 10^6 thumbnails)."""
    stats = media.agg(
        F.sum(F.coalesce(F.length("payload"), F.lit(0))).alias("total")
    ).collect()[0]
    total = stats["total"] or 0
    n = max(1, int(total // target_bytes) + 1)
    return media.repartition(n)


def synthetic_media(spark, n: int) -> DataFrame:
    """Deterministic fake media table for tests (payload = repeated md5
    bytes; kind round-robin)."""
    df = spark.range(n).withColumnRenamed("id", "media_id")
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("media_id") % 3 + 1).cast("int"),
    )
    payload = F.repeat(F.unhex(F.md5(F.col("media_id").cast("string").cast("binary"))), 8).cast(
        "binary"
    )
    return df.select(
        "media_id",
        kind.alias("kind"),
        payload.alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
    )
