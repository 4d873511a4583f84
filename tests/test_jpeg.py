"""In-engine baseline JPEG codec (multimodal/jpeg.py).

Round-trips grayscale/RGB at near-lossless quantization through our
encoder/decoder, exercises 4:2:0 chroma subsampling, restart markers,
byte stuffing, multi-MCU geometry, quantization loss bounds, and the
declared-unsupported taxonomy (progressive, 12-bit, truncation).
"""

from __future__ import annotations

import numpy as np
import pytest

from ton_indexer_spark.multimodal.binary import decode_images
from ton_indexer_spark.multimodal.jpeg import (
    JpegError,
    decode_jpeg,
    encode_jpeg,
)


def _noise(seed: int, h: int, w: int, ch: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, ch)).astype(np.uint8)


def _smooth(h: int, w: int) -> np.ndarray:
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [(xx * 8) % 256, (yy * 8) % 256, ((xx + yy) * 4) % 256], axis=-1
    ).astype(np.uint8)


@pytest.mark.parametrize("w,h,ch", [
    (8, 8, 1),     # single block
    (16, 8, 1),    # two MCUs
    (24, 17, 3),   # non-multiple-of-8 edges, colour
    (7, 5, 3),     # smaller than one block
])
def test_roundtrip_near_lossless(w, h, ch):
    base = _noise(w * h + ch, h, w, ch)
    blob = encode_jpeg(base.tobytes(), w, h, ch, quant=1)
    dw, dh, dch, px = decode_jpeg(blob)
    assert (dw, dh, dch) == (w, h, ch)
    out = np.frombuffer(px, np.uint8).reshape(h, w, ch)
    # quant=1 leaves only DCT float rounding + YCbCr roundtrip error
    assert np.abs(out.astype(int) - base.astype(int)).max() <= 2


def test_subsampling_420():
    h, w = 20, 30
    base = _smooth(h, w)
    blob = encode_jpeg(base.tobytes(), w, h, 3, quant=1, subsample=True)
    dw, dh, dch, px = decode_jpeg(blob)
    assert (dw, dh, dch) == (w, h, 3)
    out = np.frombuffer(px, np.uint8).reshape(h, w, 3)
    # luma is full-res: Y reconstruction stays tight even with 4:2:0
    err = np.abs(out.astype(int) - base.astype(int)).mean()
    assert err < 4.0


def test_restart_interval_identical():
    h, w = 20, 30
    base = _smooth(h, w)
    plain = decode_jpeg(encode_jpeg(base.tobytes(), w, h, 3, quant=1))
    rst = decode_jpeg(
        encode_jpeg(base.tobytes(), w, h, 3, quant=1, restart_interval=3)
    )
    assert plain == rst


def test_quantization_lossy_but_bounded():
    base = _noise(99, 16, 16, 3)
    b1 = encode_jpeg(base.tobytes(), 16, 16, 3, quant=1)
    b8 = encode_jpeg(base.tobytes(), 16, 16, 3, quant=8)
    assert len(b8) < len(b1)
    _, _, _, px = decode_jpeg(b8)
    out = np.frombuffer(px, np.uint8).reshape(16, 16, 3)
    assert np.abs(out.astype(int) - base.astype(int)).max() <= 40


def test_byte_stuffing_roundtrip():
    # all-255 image produces large coefficients / FF-prone streams
    base = np.full((8, 16, 1), 255, dtype=np.uint8)
    _, _, _, px = decode_jpeg(encode_jpeg(base.tobytes(), 16, 8, 1, 1))
    assert np.abs(
        np.frombuffer(px, np.uint8).astype(int) - 255
    ).max() <= 1


def test_error_taxonomy():
    with pytest.raises(JpegError, match="signature"):
        decode_jpeg(b"PNG whatever")
    good = encode_jpeg(_noise(1, 8, 8, 1).tobytes(), 8, 8, 1)
    with pytest.raises(JpegError):
        decode_jpeg(good[:40])  # truncated before/inside scan
    # progressive: patch SOF0 marker (FFC0) to SOF2 (FFC2)
    i = good.index(b"\xff\xc0")
    prog = good[:i] + b"\xff\xc2" + good[i + 2:]
    with pytest.raises(JpegError, match="baseline"):
        decode_jpeg(prog)
    # 12-bit: patch the precision byte right after the SOF0 length
    deep = bytearray(good)
    deep[i + 4] = 12
    with pytest.raises(JpegError, match="12-bit"):
        decode_jpeg(bytes(deep))


def test_decode_images_jpeg_path(spark):
    h, w = 17, 9
    base = _noise(42, h, w, 3)
    df = spark.createDataFrame(
        [
            (1, encode_jpeg(base.tobytes(), w, h, 3, quant=1)),
            (2, b"\xff\xd8\xff" + b"\x00" * 10),  # torn entropy stream
        ],
        "doc_id long, payload binary",
    )
    out = {r["doc_id"]: r for r in decode_images(df).collect()}
    r = out[1]
    assert r["decode_error"] is None
    assert (r["format"], r["width"], r["height"], r["channels"]) == (
        "jpeg", w, h, 3
    )
    got = np.frombuffer(bytes(r["pixels"]), np.uint8).reshape(h, w, 3)
    assert np.abs(got.astype(int) - base.astype(int)).max() <= 2
    assert out[2]["decode_error"].startswith("JpegError")
