"""Decompression-bomb hardening for the in-engine image codecs.

The per-blob quarantine contract ("one bad blob can't fail a 100 TB
stage") only holds if a crafted SMALL blob cannot balloon executor
memory before the size checks run.  These tests pin the three guards:

- PNG: pixel budget checked at IHDR, IDAT inflate bounded to the
  declared scanline size via ``zlib.decompressobj`` (a zlib bomb whose
  stream inflates ~1000x raises instead of allocating).
- GIF: pixel budget checked at the logical screen descriptor AND each
  frame descriptor; the LZW loop stops emitting at the frame's declared
  fw*fh (LZW amplifies up to ~2700x on adversarial streams).
- JPEG: pixel budget checked at SOF0 before any float64 plane alloc.

Every guard must raise the codec's TYPED error so ``decode_images``
quarantines the row.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from ton_indexer_spark.multimodal.gif import GifError, decode_gif, encode_gif
from ton_indexer_spark.multimodal.jpeg import JpegError, decode_jpeg, encode_jpeg
from ton_indexer_spark.multimodal.png import PngError, decode_png, encode_png


def _png_chunk(tag: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))


def _png_with(width: int, height: int, idat: bytes) -> bytes:
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", idat) + _png_chunk(b"IEND", b""))


class TestPngBombs:
    def test_huge_declared_dims_raise_before_inflate(self):
        # 65535x65535 grayscale = 4.3 Gpx; IDAT is garbage but the
        # budget check must fire first (no zlib call, no alloc)
        blob = _png_with(65535, 65535, b"\x00" * 32)
        with pytest.raises(PngError, match="pixel budget"):
            decode_png(blob)

    def test_idat_overinflation_bounded(self):
        # declared 4x4 gray (expected raw = 4*(4+1) = 20 bytes) but the
        # stream inflates to 10 MB — must raise, never materialize it
        bomb = zlib.compress(b"\x00" * (10 << 20), 9)  # ~10 KB compressed
        blob = _png_with(4, 4, bomb)
        with pytest.raises(PngError, match="inflates past"):
            decode_png(blob)

    def test_custom_budget(self):
        px = bytes(range(64)) * 4  # 16x16 gray
        blob = encode_png(px, 16, 16, 1)
        assert decode_png(blob)[0] == 16
        with pytest.raises(PngError, match="pixel budget"):
            decode_png(blob, max_pixels=100)

    def test_exact_size_stream_still_decodes(self):
        # regression guard for the bounded-inflate rewrite: a well-formed
        # stream that inflates to exactly the declared size passes
        px = bytes(i % 251 for i in range(9 * 7))
        blob = encode_png(px, 9, 7, 1, filter_type=4)
        w, h, ch, out = decode_png(blob)
        assert (w, h, ch) == (9, 7, 1) and out == px


class TestGifBombs:
    def test_huge_logical_screen_raises(self):
        blob = (b"GIF89a" + (65535).to_bytes(2, "little") * 2
                + bytes([0x80, 0, 0]) + b"\x00" * 12)
        with pytest.raises(GifError, match="pixel budget"):
            decode_gif(blob)

    def test_huge_frame_dims_raise(self):
        # small screen, frame descriptor claims 60000x60000
        pal = bytes(12)
        good = encode_gif(b"\x00" * 4, 2, 2, pal)
        i = good.index(b"\x2c")
        desc = (b"\x2c" + bytes(4)
                + (60000).to_bytes(2, "little") * 2 + b"\x00")
        blob = good[:i] + desc + good[i + 10:]
        with pytest.raises(GifError, match="pixel budget"):
            decode_gif(blob)

    def test_lzw_emit_stops_at_frame_size(self):
        # adversarial stream: grow the dictionary, then repeat the
        # longest entry forever — unbounded LZW would emit megabytes for
        # a 4x4 frame.  Build raw LZW codes by hand (min_code_size=2).
        codes = [4]            # CLEAR
        codes += [0, 1]        # emits 2 bytes, table grows to 7
        codes += [6] * 5000    # each repeat emits a 2-byte entry
        # pack with EXACT decoder width semantics: the first code after
        # CLEAR adds no table entry; the table caps at 4096
        width, table_len, first = 3, 6, True
        bits: list[int] = []
        for c in codes:
            for i in range(width):
                bits.append((c >> i) & 1)
            if c == 4:
                width, table_len, first = 3, 6, True
                continue
            if not first and table_len < 4096:
                table_len += 1
            first = False
            if table_len >= (1 << width) and width < 12:
                width += 1
        out = bytearray()
        for i in range(0, len(bits), 8):
            out.append(sum(b << j for j, b in enumerate(bits[i:i + 8])))
        lzw = bytes(out)
        blob = bytearray(b"GIF89a")
        blob += (4).to_bytes(2, "little") * 2 + bytes([0x81, 0, 0])
        blob += bytes(12)  # 4-entry GCT (depth bit 1 -> 2<<1 entries)
        blob += b"\x2c" + bytes(4) + (4).to_bytes(2, "little") * 2 + b"\x00"
        blob += bytes([2])
        for i in range(0, len(lzw), 255):
            chunk = lzw[i:i + 255]
            blob += bytes([len(chunk)]) + chunk
        blob += b"\x00\x3b"
        g = decode_gif(bytes(blob))
        f = g["frames"][0]
        assert (f["width"], f["height"]) == (4, 4)
        assert len(f["rgba"]) == 4 * 4 * 4  # emitted exactly fw*fh, not MBs

    def test_custom_budget(self):
        pal = bytes(12)
        blob = encode_gif(bytes(16), 4, 4, pal)
        assert decode_gif(blob)["width"] == 4
        with pytest.raises(GifError, match="pixel budget"):
            decode_gif(blob, max_pixels=8)


class TestJpegBombs:
    def test_huge_sof_dims_raise_before_alloc(self):
        px = np.zeros((8, 8, 1), np.uint8).tobytes()
        good = encode_jpeg(px, 8, 8, 1)
        i = good.index(b"\xff\xc0")
        # SOF0 payload: len(2) precision(1) height(2) width(2) ...
        patched = (good[:i + 5] + (65500).to_bytes(2, "big")
                   + (65500).to_bytes(2, "big") + good[i + 9:])
        with pytest.raises(JpegError, match="pixel budget"):
            decode_jpeg(patched)

    def test_custom_budget(self):
        px = bytes(range(64))
        blob = encode_jpeg(px, 8, 8, 1, quant=1)
        assert decode_jpeg(blob)[0] == 8
        with pytest.raises(JpegError, match="pixel budget"):
            decode_jpeg(blob, max_pixels=32)


def test_decode_images_quarantines_bombs(spark):
    """End-to-end: the bombs surface as typed decode_error rows, the
    stage completes."""
    from ton_indexer_spark.multimodal.binary import decode_images

    png_bomb = _png_with(65535, 65535, b"\x00" * 32)
    gif_bomb = (b"GIF89a" + (65535).to_bytes(2, "little") * 2
                + bytes([0x80, 0, 0]) + b"\x00" * 12)
    px = bytes(range(64))
    jpeg_bomb = bytearray(encode_jpeg(px, 8, 8, 1))
    i = jpeg_bomb.index(b"\xff\xc0")
    jpeg_bomb[i + 5:i + 9] = (65500).to_bytes(2, "big") * 2
    df = spark.createDataFrame(
        [(1, png_bomb), (2, gif_bomb), (3, bytes(jpeg_bomb))],
        "doc_id long, payload binary",
    )
    rows = {r.doc_id: r for r in decode_images(df).collect()}
    assert rows[1].decode_error.startswith("PngError")
    assert rows[2].decode_error.startswith("GifError")
    assert rows[3].decode_error.startswith("JpegError")
    assert all(rows[i].pixels is None for i in (1, 2, 3))
