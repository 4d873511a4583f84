"""In-engine GIF decoder (multimodal/gif.py): LZW, interlace,
transparency, animation frames, and the Spark frame-sampling stage.

The round-trip tests use the module's literal-code LZW encoder; the
dictionary-growth branch of the decoder is exercised by a hand-packed
code stream (the encoder deliberately never grows the dictionary).
"""

from __future__ import annotations

import numpy as np
import pytest

from ton_indexer_spark.multimodal.binary import (
    decode_images,
    sample_gif_frames,
)
from ton_indexer_spark.multimodal.gif import (
    GifError,
    _lzw_decode,
    decode_gif,
    encode_gif,
    first_frame,
)

PAL4 = bytes([255, 0, 0,  0, 255, 0,  0, 0, 255,  9, 9, 9])


def _idx(seed: int, n: int) -> bytes:
    rng = np.random.default_rng(seed)
    return rng.integers(0, 4, size=n, dtype=np.uint8).tobytes()


def test_roundtrip_plain():
    w, h = 11, 6
    idx = _idx(1, w * h)
    g = decode_gif(encode_gif(idx, w, h, PAL4))
    assert (g["width"], g["height"]) == (w, h)
    f = g["frames"][0]
    rgba = np.frombuffer(f["rgba"], np.uint8).reshape(h, w, 4)
    ind = np.frombuffer(idx, np.uint8).reshape(h, w)
    pal = np.frombuffer(PAL4, np.uint8).reshape(4, 3)
    assert (rgba[..., :3] == pal[ind]).all()
    assert (rgba[..., 3] == 255).all()


def test_roundtrip_interlaced():
    w, h = 7, 13  # enough rows to hit all four interlace passes
    idx = _idx(2, w * h)
    g = decode_gif(encode_gif(idx, w, h, PAL4, interlace=True))
    rgba = np.frombuffer(g["frames"][0]["rgba"], np.uint8).reshape(h, w, 4)
    pal = np.frombuffer(PAL4, np.uint8).reshape(4, 3)
    ind = np.frombuffer(idx, np.uint8).reshape(h, w)
    assert (rgba[..., :3] == pal[ind]).all()


def test_transparency_alpha():
    w, h = 4, 2
    idx = bytes([0, 1, 2, 3] * 2)
    g = decode_gif(encode_gif(idx, w, h, PAL4, transparent=2))
    rgba = np.frombuffer(g["frames"][0]["rgba"], np.uint8).reshape(h, w, 4)
    assert (rgba[:, 2, 3] == 0).all()      # index 2 transparent
    assert (rgba[:, 0, 3] == 255).all()


def test_animation_frames():
    w, h = 5, 4
    f0, f1, f2 = (_idx(s, w * h) for s in (10, 11, 12))
    g = decode_gif(encode_gif(f0, w, h, PAL4, animate=[f1, f2]))
    assert len(g["frames"]) == 3
    pal = np.frombuffer(PAL4, np.uint8).reshape(4, 3)
    for plane, fr in zip((f0, f1, f2), g["frames"]):
        rgba = np.frombuffer(fr["rgba"], np.uint8).reshape(h, w, 4)
        ind = np.frombuffer(plane, np.uint8).reshape(h, w)
        assert (rgba[..., :3] == pal[ind]).all()


def test_lzw_dictionary_growth():
    """Hand-packed stream exercising dict append + the prev+prev[:1]
    (code == len(table)) branch: with min_code_size=2, CLEAR=4, EOI=5;
    codes [CLEAR, 1, 6, EOI] at width 3 decode to 1, then 6 == len(table)
    -> entry = b'\\x01\\x01'."""
    codes = [4, 1, 6, 5]
    bits = []
    for c in codes:
        for i in range(3):
            bits.append((c >> i) & 1)
    data = bytearray()
    for i in range(0, len(bits), 8):
        data.append(sum(b << j for j, b in enumerate(bits[i:i + 8])))
    assert bytes(_lzw_decode(bytes(data), 2)) == b"\x01\x01\x01"


def test_error_taxonomy():
    with pytest.raises(GifError, match="signature"):
        decode_gif(b"PNG not a gif")
    with pytest.raises(GifError, match="no image data"):
        decode_gif(b"GIF89a" + (4).to_bytes(2, "little")
                   + (4).to_bytes(2, "little") + bytes([0, 0, 0]) + b"\x3b")
    good = encode_gif(_idx(3, 12), 4, 3, PAL4)
    with pytest.raises(GifError):
        decode_gif(good[:20])  # truncated mid-stream


def test_first_frame_offset_composite():
    # hand-build a frame at offset (2,1) inside a 6x4 logical screen
    inner = encode_gif(bytes([1] * 4), 2, 2, PAL4)
    # splice: change image descriptor left/top from (0,0) to (2,1)
    i = inner.index(b"\x2c")
    patched = (inner[:i + 1] + (2).to_bytes(2, "little")
               + (1).to_bytes(2, "little") + inner[i + 5:])
    # widen the logical screen to 6x4
    patched = (patched[:6] + (6).to_bytes(2, "little")
               + (4).to_bytes(2, "little") + patched[10:])
    w, h, ch, px = first_frame(patched)
    assert (w, h, ch) == (6, 4, 4)
    a = np.frombuffer(px, np.uint8).reshape(4, 6, 4)
    assert (a[1:3, 2:4, :3] == [0, 255, 0]).all()   # palette idx 1
    assert (a[1:3, 2:4, 3] == 255).all()
    assert (a[0, :, 3] == 0).all()                   # background transparent


def test_decode_images_gif_path(spark):
    w, h = 6, 3
    idx = _idx(4, w * h)
    df = spark.createDataFrame(
        [(1, encode_gif(idx, w, h, PAL4))], "doc_id long, payload binary"
    )
    r = decode_images(df).collect()[0]
    assert r["decode_error"] is None
    assert (r["format"], r["width"], r["height"], r["channels"]) == (
        "gif", w, h, 4
    )


def test_sample_gif_frames_stage(spark):
    w, h = 4, 4
    frames = [_idx(s, w * h) for s in range(20, 25)]
    blob = encode_gif(frames[0], w, h, PAL4, animate=frames[1:])
    df = spark.createDataFrame(
        [(1, blob), (2, b"GIF89a\x00\x00")], "doc_id long, payload binary"
    )
    rows = sample_gif_frames(df, every_n=2).collect()
    ok = sorted(r["frame_idx"] for r in rows if r["doc_id"] == 1)
    assert ok == [0, 2, 4]
    bad = [r for r in rows if r["doc_id"] == 2]
    assert len(bad) == 1 and bad[0]["decode_error"].startswith("GifError")
