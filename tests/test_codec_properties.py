"""Property-based hardening of the in-engine media codecs.

Hypothesis drives random geometries (down to 1x1), random content and
random filter/feature choices through the PNG/GIF/JPEG/WAV round
trips.  Pure-python paths only — no Spark session — so the suite stays
fast; the Spark stages over these codecs are covered by the unit tests
and the driver gates.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from ton_indexer_spark.multimodal.gif import decode_gif, encode_gif
from ton_indexer_spark.multimodal.jpeg import decode_jpeg, encode_jpeg
from ton_indexer_spark.multimodal.png import decode_png, encode_png
from ton_indexer_spark.multimodal.wav import decode_wav, encode_wav

_SET = dict(max_examples=40, deadline=None)


@settings(**_SET)
@given(
    w=st.integers(1, 24),
    h=st.integers(1, 24),
    ch=st.sampled_from([1, 2, 3, 4]),
    seed=st.integers(0, 2**31),
    data=st.data(),
)
def test_png_roundtrip_any_geometry(w, h, ch, seed, data):
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=w * h * ch, dtype=np.uint8).tobytes()
    filters = data.draw(
        st.lists(st.integers(0, 4), min_size=h, max_size=h)
    )
    dw, dh, dch, out = decode_png(encode_png(px, w, h, ch, filters))
    assert (dw, dh, dch) == (w, h, ch)
    assert out == px


@settings(**_SET)
@given(
    w=st.integers(1, 20),
    h=st.integers(1, 20),
    n_colors=st.integers(2, 16),
    interlace=st.booleans(),
    transparent=st.booleans(),
    seed=st.integers(0, 2**31),
)
def test_gif_roundtrip_any_geometry(w, h, n_colors, interlace,
                                    transparent, seed):
    rng = np.random.default_rng(seed)
    pal = rng.integers(0, 256, size=3 * n_colors, dtype=np.uint8).tobytes()
    idx = rng.integers(0, n_colors, size=w * h, dtype=np.uint8).tobytes()
    blob = encode_gif(
        idx, w, h, pal, interlace=interlace,
        transparent=0 if transparent else None,
    )
    g = decode_gif(blob)
    assert (g["width"], g["height"]) == (w, h)
    f = g["frames"][0]
    rgba = np.frombuffer(f["rgba"], np.uint8).reshape(h, w, 4)
    ind = np.frombuffer(idx, np.uint8).reshape(h, w)
    pal_arr = np.frombuffer(pal, np.uint8).reshape(n_colors, 3)
    assert (rgba[..., :3] == pal_arr[ind]).all()
    if transparent:
        assert (rgba[..., 3] == np.where(ind == 0, 0, 255)).all()
    else:
        assert (rgba[..., 3] == 255).all()


@settings(**_SET)
@given(
    w=st.integers(1, 24),
    h=st.integers(1, 24),
    ch=st.sampled_from([1, 3]),
    restart=st.sampled_from([0, 1, 2, 5]),
    seed=st.integers(0, 2**31),
)
def test_jpeg_roundtrip_any_geometry(w, h, ch, restart, seed):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 256, size=(h, w, ch), dtype=np.uint8)
    blob = encode_jpeg(base.tobytes(), w, h, ch, quant=1,
                       restart_interval=restart)
    dw, dh, dch, px = decode_jpeg(blob)
    assert (dw, dh, dch) == (w, h, ch)
    out = np.frombuffer(px, np.uint8).reshape(h, w, ch)
    assert np.abs(out.astype(int) - base.astype(int)).max() <= 2


@settings(**_SET)
@given(
    n=st.integers(1, 2000),
    rate=st.sampled_from([4000, 8000, 16000, 44100]),
    ch=st.integers(1, 3),
    bits=st.sampled_from([8, 16, 32]),
    seed=st.integers(0, 2**31),
)
def test_wav_roundtrip_any_geometry(n, rate, ch, bits, seed):
    rng = np.random.default_rng(seed)
    x = rng.uniform(-1, 1, size=(n, ch))
    r, c, out = decode_wav(encode_wav(x, rate, bits=bits))
    assert (r, c) == (rate, ch) and out.shape == (n, ch)
    # integer WAV uses the common asymmetric convention (encode scales
    # by 2^(b-1)-1, decode divides by 2^(b-1)): rounding 0.5/(2^(b-1)-1)
    # plus the scale asymmetry |x|/2^(b-1) bound the error
    tol = {32: 1e-6, 16: 4.7e-5, 8: 1 / 64}[bits]
    assert np.abs(out - x).max() <= tol
