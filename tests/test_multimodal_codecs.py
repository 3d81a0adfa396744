"""Real-codec round-trips for the multimodal path: P6 PPM and RIFF/WAV
PCM-16 are genuine on-disk formats (any external tool can produce or open
them), so the decode → resize/frame-sample → featurize chain is tested
against real bytes, not stubs."""

from __future__ import annotations

import numpy as np
import pytest

from rdf_dataset_fragmenter_js_spark.textops.multimodal import (
    decode_ppm,
    decode_wav_pcm16,
    encode_ppm,
    encode_wav_pcm16,
    _decode_audio,
    _decode_image,
    _synthetic_payload,
)


def test_ppm_roundtrip_and_comments():
    rng = np.random.default_rng(7)
    pixels = rng.integers(0, 256, size=(12, 16, 3), dtype=np.uint8)
    assert (decode_ppm(encode_ppm(pixels)) == pixels).all()
    # header grammar: comments and arbitrary whitespace are legal
    with_comment = b"P6\n# a comment\n16\t12 # trailing\n255\n" + pixels.tobytes()
    assert (decode_ppm(with_comment) == pixels).all()
    with pytest.raises(ValueError, match="not a P6"):
        decode_ppm(b"P5\n1 1\n255\n\x00")
    with pytest.raises(ValueError, match="truncated PPM raster"):
        decode_ppm(encode_ppm(pixels)[:-10])


def test_wav_roundtrip_and_chunk_walk():
    samples = (np.sin(np.arange(1600) / 10.0) * 20000).astype(np.int16)
    got, rate = decode_wav_pcm16(encode_wav_pcm16(samples, sample_rate=16_000))
    assert rate == 16_000
    assert np.allclose(got, samples.astype(np.float32) / 32768.0)
    # chunk walk tolerates an extra chunk before data
    raw = encode_wav_pcm16(samples)
    extra = raw[:12] + b"LIST\x04\x00\x00\x00abcd" + raw[12:]
    got2, _ = decode_wav_pcm16(extra)
    assert np.allclose(got2, got)
    with pytest.raises(ValueError, match="not a RIFF"):
        decode_wav_pcm16(b"JUNK" + raw[4:])


def test_feature_shapes_and_determinism():
    img = _decode_image(_synthetic_payload(3, "image"))
    assert img.shape == (64,) and img.dtype == np.float32
    assert 0.0 <= float(img.min()) and float(img.max()) <= 1.0
    assert (img == _decode_image(_synthetic_payload(3, "image"))).all()

    aud = _decode_audio(_synthetic_payload(4, "audio"))
    assert aud.shape == (128,) and aud.dtype == np.float32
    # sine energy: mean-abs of a full-scale-ish sine is well above silence
    assert float(aud.mean()) > 0.1
