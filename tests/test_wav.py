"""In-engine WAV/PCM codec + log-mel features (multimodal/wav.py).

Round-trips 8/16-bit integer and 32-bit float PCM through the fixture
encoder, validates the mel filterbank geometry and the spectrogram's
frequency selectivity (a pure tone lands in the right mel band), and
drives the Spark decode/feature stages with quarantine rows.
"""

from __future__ import annotations

import numpy as np
import pytest

from ton_indexer_spark.multimodal.binary import audio_features, decode_audio
from ton_indexer_spark.multimodal.wav import (
    WavError,
    decode_wav,
    encode_wav,
    logmel,
    mel_filterbank,
)


def _tone(freq: float, rate: int, n: int, ch: int = 1) -> np.ndarray:
    t = np.arange(n) / rate
    x = 0.5 * np.sin(2 * np.pi * freq * t)
    return np.stack([x] * ch, axis=1) if ch > 1 else x


@pytest.mark.parametrize("bits,tol", [(16, 1e-4), (8, 1e-2), (32, 1e-7)])
def test_roundtrip_bit_depths(bits, tol):
    x = _tone(440, 8000, 800)
    rate, ch, out = decode_wav(encode_wav(x, 8000, bits=bits))
    assert (rate, ch) == (8000, 1)
    assert out.shape == (800, 1)
    assert np.abs(out[:, 0] - x).max() < tol + 1 / (1 << (bits - 1))


def test_stereo_interleave():
    left = _tone(440, 8000, 100)
    right = _tone(880, 8000, 100)
    x = np.stack([left, right], axis=1)
    rate, ch, out = decode_wav(encode_wav(x, 8000, bits=16))
    assert ch == 2 and out.shape == (100, 2)
    assert np.abs(out - x).max() < 1e-3


def test_unknown_chunks_skipped():
    blob = encode_wav(_tone(440, 8000, 64), 8000)
    # splice a LIST chunk between fmt and data
    i = blob.index(b"data")
    extra = b"LIST" + (4).to_bytes(4, "little") + b"INFO"
    patched = blob[:i] + extra + blob[i:]
    patched = patched[:4] + (len(patched) - 8).to_bytes(
        4, "little"
    ) + patched[8:]
    rate, ch, out = decode_wav(patched)
    assert out.shape == (64, 1)


def test_error_taxonomy():
    with pytest.raises(WavError, match="signature"):
        decode_wav(b"OggS not a wav")
    good = encode_wav(_tone(440, 8000, 64), 8000)
    with pytest.raises(WavError, match="truncated"):
        decode_wav(good[:-10])
    # ADPCM (format 2) must be declared-unsupported, not mis-read
    i = good.index(b"fmt ") + 8
    adpcm = good[:i] + b"\x02\x00" + good[i + 2:]
    with pytest.raises(WavError, match="codec"):
        decode_wav(adpcm)


def test_mel_filterbank_partition():
    fb = mel_filterbank(20, 256, 8000)
    assert fb.shape == (20, 129)
    assert (fb >= 0).all()
    # every filter has support, and supports are ordered by center bin
    centers = fb.argmax(axis=1)
    assert (np.diff(centers) >= 0).all() and fb.sum(axis=1).min() > 0


def test_logmel_frequency_selectivity():
    rate, n_fft, n_mels = 8000, 256, 20
    lo = logmel(_tone(300, rate, 4000), rate, n_fft=n_fft, n_mels=n_mels)
    hi = logmel(_tone(3000, rate, 4000), rate, n_fft=n_fft, n_mels=n_mels)
    assert lo.shape == hi.shape == (1 + (4000 - n_fft) // 128, n_mels)
    # the dominant mel band of the high tone is above the low tone's
    assert hi.mean(axis=0).argmax() > lo.mean(axis=0).argmax()


def test_decode_audio_stage(spark):
    x = _tone(440, 8000, 800, ch=2)
    df = spark.createDataFrame(
        [
            (1, encode_wav(x, 8000, bits=16)),
            (2, encode_wav(_tone(100, 4000, 200), 4000, bits=32)),
            (3, b"RIFF\x00\x00\x00\x00AVI corrupted"),
            (4, b"\x89PNG not audio"),
        ],
        "doc_id long, payload binary",
    )
    out = {r["doc_id"]: r for r in decode_audio(df).collect()}
    assert out[1]["decode_error"] is None
    assert (out[1]["sample_rate"], out[1]["channels"],
            out[1]["n_samples"], out[1]["duration_ms"]) == (8000, 2, 800, 100)
    assert len(bytes(out[1]["pcm16"])) == 800 * 2  # mono 16-bit
    assert out[2]["decode_error"] is None
    assert out[2]["duration_ms"] == 50
    assert out[3]["decode_error"].startswith("WavError")
    assert out[4]["decode_error"].startswith("WavError")


def test_audio_features_stage(spark):
    df = spark.createDataFrame(
        [
            (1, encode_wav(_tone(300, 8000, 4000), 8000)),
            (2, encode_wav(_tone(3000, 8000, 4000), 8000)),
            (3, b"not audio at all"),
        ],
        "doc_id long, payload binary",
    )
    rows = {r["doc_id"]: r for r in audio_features(df, n_mels=20).collect()}
    assert set(rows) == {1, 2}  # undecodable blob skipped
    v1, v2 = (np.array(rows[i]["embedding"]) for i in (1, 2))
    assert len(v1) == 40  # mean+std per band
    # the two tones must be separable in the pooled embedding
    assert np.abs(v1 - v2).max() > 1.0
