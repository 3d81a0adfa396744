"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed in Arrow-batched ``mapInPandas``.

Round 2: the image and audio paths are REAL codecs, not stubs — formats
chosen so decode needs nothing beyond numpy/struct (both are genuine
on-disk formats any media tool can produce/consume):

* image — binary PPM (P6): header parse, pixel reshape, grayscale, and an
  8×8 block-mean resize → 64-dim feature (the decode → resize →
  featurize chain of a production image pipeline, minus only the exotic
  codecs);
* audio — RIFF/WAV PCM-16: chunk walk (fmt /data), sample decode to
  [-1, 1] floats, and 128 frame mean-abs energies → 128-dim feature
  (decode → frame-sample → featurize);
* video — still ``NotImplementedError``: container formats genuinely
  require ffmpeg, which this container lacks; the ``mapInPandas`` plumbing
  is codec-agnostic, so a frame-sampler plugs into ``DECODERS`` unchanged.

Everything Spark-side (schema contract, Arrow batch iteration, byte-budget
partition sizing, UDF signatures) is identical to what a PIL/ffmpeg-backed
deployment would use.
"""

from __future__ import annotations

import struct
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


# ---------------------------------------------------------------------------
# Real codecs (pure numpy/struct)
# ---------------------------------------------------------------------------


def encode_ppm(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 → binary PPM (P6)."""
    h, w, c = pixels.shape
    if c != 3:
        raise ValueError("PPM requires 3 channels")
    return b"P6\n%d %d\n255\n" % (w, h) + pixels.astype(np.uint8).tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6) → (h, w, 3) uint8. Handles whitespace/comment
    tokens per the netpbm header grammar."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    # tokenize the header: magic, width, height, maxval (comments start '#')
    tokens: list[bytes] = []
    pos = 2
    while len(tokens) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            nl = payload.find(b"\n", pos)
            pos = len(payload) if nl < 0 else nl + 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        if start == pos:
            raise ValueError("truncated PPM header")
        tokens.append(payload[start:pos])
    pos += 1  # single whitespace after maxval
    w, h, maxval = (int(t) for t in tokens)
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval {maxval}")
    need = w * h * 3
    raster = payload[pos : pos + need]
    if len(raster) != need:
        raise ValueError("truncated PPM raster")
    return np.frombuffer(raster, dtype=np.uint8).reshape(h, w, 3)


def encode_wav_pcm16(samples: np.ndarray, sample_rate: int = 16_000) -> bytes:
    """int16 mono samples → RIFF/WAVE PCM-16 file bytes."""
    data = samples.astype("<i2").tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF",
        36 + len(data),
        b"WAVE",
        b"fmt ",
        16,
        1,  # PCM
        1,  # mono
        sample_rate,
        sample_rate * 2,
        2,
        16,
        b"data",
        len(data),
    )
    return hdr + data


def decode_wav_pcm16(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM-16 → (float32 samples in [-1, 1], sample_rate).
    Generic chunk walk — tolerates extra chunks between fmt and data."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, sample_rate, bits, channels, data = 12, None, None, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            if len(body) < 16:
                raise ValueError("truncated WAV fmt chunk")
            fmt_tag, channels, sample_rate = struct.unpack_from("<HHI", body, 0)
            (bits,) = struct.unpack_from("<H", body, 14)
            if fmt_tag != 1:
                raise ValueError(f"unsupported WAV format tag {fmt_tag}")
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if sample_rate is None or data is None:
        raise ValueError("WAV missing fmt /data chunk")
    if bits != 16 or channels != 1:
        raise ValueError(f"unsupported WAV layout bits={bits} channels={channels}")
    samples = np.frombuffer(data, dtype="<i2").astype(np.float32) / 32768.0
    return samples, sample_rate


def _block_mean_resize(gray: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Area-average resize via index-bucketed block means (any ratio)."""
    h, w = gray.shape
    ys = (np.arange(out_h + 1) * h) // out_h
    xs = (np.arange(out_w + 1) * w) // out_w
    out = np.empty((out_h, out_w), dtype=np.float64)
    for i in range(out_h):
        for j in range(out_w):
            out[i, j] = gray[ys[i] : max(ys[i + 1], ys[i] + 1), xs[j] : max(xs[j + 1], xs[j] + 1)].mean()
    return out


def _decode_image(payload: bytes) -> np.ndarray:
    """PPM decode → grayscale → 8×8 block-mean resize → 64-dim [0,1]."""
    pixels = decode_ppm(payload)
    gray = pixels.astype(np.float64).mean(axis=2)
    return (_block_mean_resize(gray, 8, 8) / 255.0).astype(np.float32).reshape(-1)


def _decode_audio(payload: bytes) -> np.ndarray:
    """WAV decode → 128 frame mean-abs energies (frame-sampled feature)."""
    samples, _rate = decode_wav_pcm16(payload)
    n_frames = 128
    edges = (np.arange(n_frames + 1) * len(samples)) // n_frames
    out = np.empty(n_frames, dtype=np.float32)
    for i in range(n_frames):
        lo, hi = edges[i], max(edges[i + 1], edges[i] + 1)
        out[i] = np.abs(samples[lo:hi]).mean() if lo < len(samples) else 0.0
    return out


def _decode_video(payload: bytes) -> np.ndarray:
    raise NotImplementedError(
        "video decode requires ffmpeg, not available in this container; "
        "plug a frame-sampler here — the mapInPandas plumbing is codec-agnostic"
    )


DECODERS = {"image": _decode_image, "audio": _decode_audio, "video": _decode_video}


def extract_features(media: DataFrame, batch_bytes: int = 64 << 20) -> DataFrame:
    """Decode + featurize media rows in Arrow batches. Partitions are sized
    by byte budget upstream (see :func:`repartition_by_bytes`) so one task
    never holds more than ``batch_bytes`` of payloads.

    Rows whose payload fails to decode (corrupt/unknown bytes — ValueError
    from the codecs) are SKIPPED like unsupported modalities: a web-scale
    media crawl always contains malformed files, and one bad payload must
    not fail the stage. Quarantine by anti-joining the output ids against
    the input when the dropped set matters."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats, ids, kinds, sizes = [], [], [], []
            for mid, kind, payload in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                decoder = DECODERS.get(kind)
                if decoder is None or payload is None:
                    continue
                try:
                    vec = decoder(bytes(payload))
                except (NotImplementedError, ValueError, struct.error):
                    continue  # unsupported modality or undecodable payload
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
    row-count partitioning useless (one 4K video ≈ 10^6 thumbnails).

    The byte total comes from FILE METADATA when the frame is backed by a
    file scan (``inputFiles`` + FileSystem status — a driver-only listing,
    zero Spark jobs), so the media table is not scanned twice just to pick
    a partition count. At 100 TB that metadata path is the only sane one.
    On-disk sizes are compressed, but binary media payloads are
    incompressible enough that the estimate holds; frames not backed by
    files (in-memory fixtures) fall back to one aggregate over payload
    lengths."""
    total = _input_file_bytes(media)
    if total is None:
        stats = media.agg(
            F.sum(F.coalesce(F.length("payload"), F.lit(0))).alias("total")
        ).collect()[0]
        total = stats["total"] or 0
    n = max(1, int(total // target_bytes) + 1)
    return media.repartition(n)


def _input_file_bytes(df: DataFrame) -> int | None:
    """Sum the on-disk size of the files behind ``df`` (None when the frame
    is not a plain file scan). Uses the Hadoop FileSystem API so hdfs/s3a
    paths work the same as file: ones."""
    try:
        files = df.inputFiles()
    except Exception:  # non-file-backed plans
        return None
    if not files:
        return None
    try:
        sc = df.sparkSession.sparkContext
        conf = sc._jsc.hadoopConfiguration()
        jvm_path = sc._jvm.org.apache.hadoop.fs.Path
        total = 0
        for f in files:
            p = jvm_path(f)
            total += p.getFileSystem(conf).getFileStatus(p).getLen()
        return total
    except Exception:
        return None


#: synthetic generator geometry — the independent SQL oracle derives sizes
#: from these (see __spark_entry__.multimodal_features)
IMG_W, IMG_H = 16, 12
AUDIO_BASE_SAMPLES, AUDIO_STEP_SAMPLES = 800, 160
WAV_HEADER_BYTES = 44


def _synthetic_payload(media_id: int, kind: str) -> bytes:
    """Deterministic REAL encodings (valid PPM / WAV files any external
    tool can open)."""
    if kind == "image":
        y, x = np.mgrid[0:IMG_H, 0:IMG_W]
        base = (x * 7 + y * 13 + media_id * 31) % 256
        pixels = np.stack([base, (base + 85) % 256, (base + 170) % 256], axis=2)
        return encode_ppm(pixels.astype(np.uint8))
    if kind == "audio":
        n = AUDIO_BASE_SAMPLES + (media_id % 5) * AUDIO_STEP_SAMPLES
        t = np.arange(n, dtype=np.float64)
        freq = 110.0 * (1 + media_id % 8)
        samples = (np.sin(2 * np.pi * freq * t / 16_000.0) * 12_000).astype(np.int16)
        return encode_wav_pcm16(samples)
    # video: opaque bytes no decoder exists for (exercises the skip path)
    return (b"\x00VID" + media_id.to_bytes(8, "little")) * 16


def synthetic_media(spark, n: int) -> DataFrame:
    """Deterministic media table: REAL PPM images and PCM WAV audio (kind
    round-robin image/audio/video by media_id % 3), built per Arrow batch."""
    kinds = ["image", "audio", "video"]

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = pdf["id"].tolist()
            kind = [kinds[i % 3] for i in ids]
            payload = [_synthetic_payload(i, k) for i, k in zip(ids, kind)]
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "kind": kind,
                    "payload": payload,
                    "mime": [
                        {"image": "image/x-portable-pixmap", "audio": "audio/wav"}.get(
                            k, "application/octet-stream"
                        )
                        for k in kind
                    ],
                    "width": [IMG_W if k == "image" else None for k in kind],
                    "height": [IMG_H if k == "image" else None for k in kind],
                    "duration_ms": [
                        (AUDIO_BASE_SAMPLES + (i % 5) * AUDIO_STEP_SAMPLES) * 1000 // 16_000
                        if k == "audio"
                        else None
                        for i, k in zip(ids, kind)
                    ],
                }
            )

    return spark.range(n).mapInPandas(gen, schema=MEDIA_SCHEMA)
