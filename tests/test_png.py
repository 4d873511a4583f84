"""In-engine PNG pixel codec (multimodal/png.py) and the decode stage.

Round-trip every scanline filter x channel count through our encoder
and decoder, cross-check the decoder against hand-built palette/tRNS
containers, pin the error taxonomy (CRC, truncation, unsupported
features), and drive the Spark `decode_images` stage end-to-end with
the decode+resize fusion and the per-blob error quarantine.
"""

from __future__ import annotations

import hashlib
import struct
import zlib

import numpy as np
import pytest

from ton_indexer_spark.multimodal.binary import decode_images
from ton_indexer_spark.multimodal.png import (
    PngError,
    decode_png,
    encode_png,
    resample_nearest,
)


def _pix(seed: str, n: int) -> bytes:
    out = bytearray()
    c = 0
    while len(out) < n:
        out += hashlib.md5(f"{seed}:{c}".encode()).digest()
        c += 1
    return bytes(out[:n])


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))


SIG = b"\x89PNG\r\n\x1a\n"


@pytest.mark.parametrize("channels", [1, 2, 3, 4])
@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_roundtrip_filters_channels(channels, ftype):
    w, h = 13, 7  # odd sizes: stride not a multiple of anything
    px = _pix(f"{channels}/{ftype}", w * h * channels)
    blob = encode_png(px, w, h, channels, filter_type=ftype)
    dw, dh, dch, dpx = decode_png(blob)
    assert (dw, dh, dch) == (w, h, channels)
    assert dpx == px


def test_roundtrip_mixed_filters():
    w, h, ch = 9, 10, 3
    px = _pix("mixed", w * h * ch)
    blob = encode_png(px, w, h, ch, filter_type=[0, 1, 2, 3, 4] * 2)
    assert decode_png(blob)[3] == px


def test_palette_expansion():
    # 4-colour palette image, hand-built container
    pal = bytes([255, 0, 0,  0, 255, 0,  0, 0, 255,  10, 20, 30])
    idx = bytes([0, 1, 2, 3, 3, 2, 1, 0])  # 4x2
    raw = b"\x00" + idx[:4] + b"\x00" + idx[4:]
    ihdr = struct.pack(">IIBBBBB", 4, 2, 8, 3, 0, 0, 0)
    blob = (SIG + _chunk(b"IHDR", ihdr) + _chunk(b"PLTE", pal)
            + _chunk(b"IDAT", zlib.compress(raw)) + _chunk(b"IEND", b""))
    w, h, ch, px = decode_png(blob)
    assert (w, h, ch) == (4, 2, 3)
    expect = b"".join(pal[i * 3:(i + 1) * 3] for i in idx)
    assert px == expect


def test_palette_trns_rgba():
    pal = bytes([1, 2, 3,  4, 5, 6])
    trns = bytes([128])  # colour 0 translucent, colour 1 defaults opaque
    idx = bytes([0, 1])
    ihdr = struct.pack(">IIBBBBB", 2, 1, 8, 3, 0, 0, 0)
    blob = (SIG + _chunk(b"IHDR", ihdr) + _chunk(b"PLTE", pal)
            + _chunk(b"tRNS", trns)
            + _chunk(b"IDAT", zlib.compress(b"\x00" + idx))
            + _chunk(b"IEND", b""))
    w, h, ch, px = decode_png(blob)
    assert (w, h, ch) == (2, 1, 4)
    assert px == bytes([1, 2, 3, 128, 4, 5, 6, 255])


def test_error_taxonomy():
    good = encode_png(_pix("e", 12), 4, 3, 1)
    # corrupt one IDAT byte -> CRC failure
    i = good.index(b"IDAT") + 6
    bad_crc = good[:i] + bytes([good[i] ^ 0xFF]) + good[i + 1:]
    with pytest.raises(PngError, match="CRC"):
        decode_png(bad_crc)
    with pytest.raises(PngError, match="signature"):
        decode_png(b"JFIF not a png")
    with pytest.raises(PngError, match="IEND"):
        decode_png(good[:-12])
    # 16-bit depth and Adam7 are declared-unsupported, not mis-decoded
    ihdr16 = struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0)
    with pytest.raises(PngError, match="bit depth"):
        decode_png(SIG + _chunk(b"IHDR", ihdr16))
    adam = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 1)
    with pytest.raises(PngError, match="interlace"):
        decode_png(SIG + _chunk(b"IHDR", adam))


def test_resample_nearest():
    # 2x2 RGB -> 4x4 doubles each pixel; -> 1x1 takes the top-left
    px = bytes(range(12))
    up = resample_nearest(px, 2, 2, 3, 4, 4)
    a = np.frombuffer(up, np.uint8).reshape(4, 4, 3)
    assert a[0, 0].tolist() == [0, 1, 2] and a[0, 3].tolist() == [3, 4, 5]
    assert a[3, 3].tolist() == [9, 10, 11]
    down = resample_nearest(px, 2, 2, 3, 1, 1)
    assert down == bytes([0, 1, 2])


def test_decode_images_stage(spark):
    rows = []
    for img_id, (w, h, ch, ft) in {
        1: (16, 8, 1, 0), 2: (9, 5, 3, 4), 3: (8, 8, 4, 2),
    }.items():
        px = _pix(f"stage{img_id}", w * h * ch)
        rows.append((img_id, encode_png(px, w, h, ch, filter_type=ft), px))
    rows.append((4, b"RIFF" + b"\x00" * 20, None))  # riff: no codec
    bad = bytearray(rows[0][1]); bad[-5] ^= 0xFF       # corrupt IEND CRC
    rows.append((5, bytes(bad), None))
    df = spark.createDataFrame(
        [(i, b) for i, b, _ in rows], "doc_id long, payload binary"
    )
    out = {r["doc_id"]: r for r in decode_images(df).collect()}
    for img_id, blob, px in rows[:3]:
        r = out[img_id]
        assert r["decode_error"] is None and bytes(r["pixels"]) == px
    assert out[4]["decode_error"].startswith("ValueError")
    assert out[4]["format"] == "riff" and out[4]["pixels"] is None
    assert out[5]["decode_error"].startswith("PngError")

    # decode+resize fusion: plane shape is (out_w * out_h * channels)
    res = {r["doc_id"]: r
           for r in decode_images(df, out_w=4, out_h=4).collect()}
    assert len(res[1]["pixels"]) == 4 * 4 * 1
    assert len(res[2]["pixels"]) == 4 * 4 * 3
    assert (res[1]["width"], res[1]["height"]) == (4, 4)
