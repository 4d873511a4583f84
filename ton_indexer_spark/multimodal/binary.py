"""Binary-column plumbing: metadata extraction and the stubbed decode stage.

``binary_metadata`` is the real production shape: an Arrow-batched
``mapInPandas`` pass computing per-blob metadata (byte length, digest,
magic-byte sniff) — the pattern every decode/feature stage follows.  The
iterator-of-batches signature means constant memory per task regardless of
blob sizes, and the output schema is explicit so Catalyst can prune it.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_MAGIC = {
    b"\xff\xd8\xff": "jpeg",
    b"\x89PNG": "png",
    b"GIF8": "gif",
    b"RIFF": "riff",  # wav/avi containers
    b"OggS": "ogg",
}

META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("digest", T.StringType()),
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


# --------------------------------------------------------------------------
# Image HEADER decode — pure reads of the published container layouts (PNG
# ISO/IEC 15948 §5.3/11.2.2, JPEG ITU-T.81 §B.2.2, GIF89a spec §17-18); no
# codec library involved.  Full PIXEL decode remains the one declared
# external seam (decode_image_stub below).

def decode_image_header(blob: bytes | None) -> tuple[str | None, int | None, int | None]:
    """(format, width, height) from container header bytes alone; Nones
    on anything that is not a recognizable/complete image header."""
    if not blob:
        return None, None, None
    try:
        if blob[:8] == b"\x89PNG\r\n\x1a\n":
            # first chunk must be IHDR: len(4) 'IHDR' width(4BE) height(4BE)
            if len(blob) >= 24 and blob[12:16] == b"IHDR":
                return (
                    "png",
                    int.from_bytes(blob[16:20], "big"),
                    int.from_bytes(blob[20:24], "big"),
                )
            return "png", None, None
        if blob[:6] in (b"GIF87a", b"GIF89a"):
            if len(blob) >= 10:
                return (
                    "gif",
                    int.from_bytes(blob[6:8], "little"),
                    int.from_bytes(blob[8:10], "little"),
                )
            return "gif", None, None
        if blob[:3] == b"\xff\xd8\xff":
            # walk marker segments to the first SOFn frame header
            i = 2
            n = len(blob)
            while i + 3 < n:
                if blob[i] != 0xFF:
                    break
                while i < n and blob[i] == 0xFF:  # fill bytes
                    i += 1
                if i >= n:
                    break
                marker = blob[i]
                i += 1
                if marker in (0x01,) or 0xD0 <= marker <= 0xD9:
                    continue  # standalone markers, no length
                if i + 1 >= n:
                    break
                seg_len = int.from_bytes(blob[i:i + 2], "big")
                if 0xC0 <= marker <= 0xCF and marker not in (
                    0xC4, 0xC8, 0xCC
                ):
                    # SOFn: len(2) precision(1) height(2BE) width(2BE)
                    if i + 7 <= n:
                        return (
                            "jpeg",
                            int.from_bytes(blob[i + 5:i + 7], "big"),
                            int.from_bytes(blob[i + 3:i + 5], "big"),
                        )
                    break
                if marker == 0xDA:  # SOS — entropy data follows, give up
                    break
                i += seg_len
            return "jpeg", None, None
    except Exception:
        pass
    return None, None, None


def with_binary_payload(df: DataFrame, text_col: str = "text",
                        out_col: str = "payload") -> DataFrame:
    """Testing aid: derive a deterministic binary column from text (the
    container has no real media files).  Production replaces this with the
    parquet binary column itself."""
    return df.withColumn(out_col, F.encode(F.col(text_col), "UTF-8"))


def binary_metadata(df: DataFrame, id_col: str = "doc_id",
                    payload_col: str = "payload") -> DataFrame:
    """Per-blob metadata via Arrow-batched mapInPandas."""

    def meta(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = pdf[payload_col]
            headers = blobs.map(decode_image_header)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": blobs.map(lambda b: 0 if b is None else len(b)),
                    "digest": blobs.map(
                        lambda b: hashlib.md5(b or b"").hexdigest()
                    ),
                    "format": blobs.map(_sniff),
                    # real header reads (PNG IHDR / JPEG SOFn / GIF LSD);
                    # nullable Int32 so non-images stay NULL, not NaN-float
                    "width": pd.array(
                        [h[1] for h in headers], dtype="Int32"
                    ),
                    "height": pd.array(
                        [h[2] for h in headers], dtype="Int32"
                    ),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(meta, schema=META_SCHEMA)


def _sniff(blob: bytes | None) -> str:
    if not blob:
        return "empty"
    for magic, fmt in _MAGIC.items():
        if blob[: len(magic)] == magic:
            return fmt
    return "unknown"


def decode_image_stub(blob: bytes) -> None:
    """External-codec hook, now EMPTY of formats: PNG (``png.py``,
    stdlib zlib), GIF (``gif.py``, pure-python LZW) and baseline JPEG
    (``jpeg.py``, Huffman + IDCT) all decode in-engine via
    ``decode_images``.  What still routes external if a deployment
    needs it: progressive/arithmetic JPEG, 12-bit precision, and
    formats outside these three (webp/avif/tiff) — wire PIL here;
    until then such blobs surface as typed ``decode_error`` rows."""
    raise NotImplementedError(
        "no in-engine codec for this format; wire PIL here — PNG/GIF/"
        "baseline-JPEG decode in-engine via multimodal.{png,gif,jpeg}"
    )


DECODE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("pixels", T.BinaryType()),
        T.StructField("decode_error", T.StringType()),
    ]
)


def decode_images(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload",
    out_w: int | None = None, out_h: int | None = None,
) -> DataFrame:
    """REAL image decode stage: PNG, GIF and baseline-JPEG blobs ->
    interleaved u8 pixel planes via the in-engine codecs
    (``multimodal/png.py`` stdlib-zlib, ``multimodal/gif.py``
    pure-python LZW with frame 0 rendered on the logical screen as
    RGBA, ``multimodal/jpeg.py`` Huffman + matrix IDCT).  Anything
    undecodable (progressive JPEG, webp, corrupt bytes) surfaces a
    ``decode_error`` row instead of raising, so one bad blob can't fail
    a 100 TB stage.  Optional ``out_w/out_h`` applies a vectorized
    nearest-neighbor resample AFTER decode — the decode+resize fusion
    keeps full-size planes out of the shuffle."""

    def stage(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ton_indexer_spark.multimodal.gif import first_frame
        from ton_indexer_spark.multimodal.jpeg import decode_jpeg
        from ton_indexer_spark.multimodal.png import (
            decode_png,
            resample_nearest,
        )

        for pdf in batches:
            rows = []
            for doc_id, blob in zip(
                pdf[id_col].astype("int64"), pdf[payload_col]
            ):
                fmt = _sniff(blob)
                try:
                    if fmt == "png":
                        w, h, ch, px = decode_png(blob)
                    elif fmt == "gif":
                        w, h, ch, px = first_frame(blob)
                    elif fmt == "jpeg":
                        w, h, ch, px = decode_jpeg(blob)
                    else:
                        raise ValueError(f"no in-engine codec for {fmt}")
                    if out_w is not None and out_h is not None:
                        px = resample_nearest(px, w, h, ch, out_w, out_h)
                        w, h = out_w, out_h
                    rows.append((doc_id, fmt, w, h, ch, px, None))
                except Exception as exc:  # noqa: BLE001 — per-blob quarantine
                    rows.append(
                        (doc_id, fmt, None, None, None, None,
                         f"{type(exc).__name__}: {exc}"[:200])
                    )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "format", "width", "height",
                         "channels", "pixels", "decode_error"],
            ).astype({"width": "Int32", "height": "Int32",
                      "channels": "Int32"})

    return df.select(id_col, payload_col).mapInPandas(
        stage, schema=DECODE_SCHEMA
    )


# ---------------------------------------------------------------------------
# Resize / frame-sample / feature-extract stages.  The *decode* inside each
# is a DETERMINISTIC FAKE (the container ships no media codecs) — clearly
# marked below; everything Spark-side (schemas, iterator batching, explode
# semantics, output shapes) is the production plumbing and is what the
# tests pin.  Swapping the fake for PIL/ffmpeg changes only the marked
# lines.

RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("pixels", T.BinaryType()),
    ]
)


def _fake_decode_resize(blob: bytes, width: int, height: int) -> bytes:
    """FAKE decode+resample: a real impl decodes the codec stream and
    bilinear-resamples; this derives width*height deterministic bytes by
    re-keying the blob digest per pixel block — stable shape + content."""
    seed = hashlib.md5(blob or b"").digest()
    need = width * height
    out = bytearray()
    counter = 0
    while len(out) < need:
        out += hashlib.md5(seed + counter.to_bytes(4, "big")).digest()
        counter += 1
    return bytes(out[:need])


def resize_images(
    df: DataFrame, width: int, height: int,
    id_col: str = "doc_id", payload_col: str = "payload",
) -> DataFrame:
    """Decode → resize stage: one fixed-shape grayscale byte plane per
    blob.  Output rows are constant-size (width·height bytes), so
    downstream batch geometry is predictable — the property training
    pipelines need for packing."""

    def stage(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "width": width,
                    "height": height,
                    "pixels": pdf[payload_col].map(
                        lambda b: _fake_decode_resize(b, width, height)
                    ),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(
        stage, schema=RESIZE_SCHEMA
    )


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def sample_frames(
    df: DataFrame, every_n: int = 2, frame_bytes: int = 64,
    id_col: str = "doc_id", payload_col: str = "payload",
) -> DataFrame:
    """Frame-sampling stage: explode each blob into every-Nth fixed-size
    frame.  FAKE decode: frames are byte slices of the container (a real
    impl demuxes with ffmpeg); the 1→many row explosion inside
    mapInPandas — with batches flushed per input chunk, never the whole
    video in memory — is the production shape."""

    def stage(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list[int] = []
            idxs: list[int] = []
            frames: list[bytes] = []
            for doc_id, blob in zip(
                pdf[id_col].astype("int64"), pdf[payload_col]
            ):
                if blob is None:
                    continue  # NULL payload = no media, no frames
                n_frames = max(1, len(blob) // frame_bytes)
                for i in range(0, n_frames, every_n):
                    ids.append(doc_id)
                    idxs.append(i)
                    frames.append(blob[i * frame_bytes:(i + 1) * frame_bytes])
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame": frames}
            )

    return df.select(id_col, payload_col).mapInPandas(
        stage, schema=FRAME_SCHEMA
    )


GIF_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("delay_cs", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("rgba", T.BinaryType()),
        T.StructField("decode_error", T.StringType()),
    ]
)


def sample_gif_frames(
    df: DataFrame, every_n: int = 1,
    id_col: str = "doc_id", payload_col: str = "payload",
) -> DataFrame:
    """REAL frame sampling for animated GIF: every-Nth frame LZW-decoded
    in-engine (``multimodal/gif.py``) and exploded 1->many inside the
    Arrow batch — ``sample_frames``'s production shape with the fake
    byte-slice decode replaced by the actual codec.  Undecodable blobs
    yield one quarantine row (frame_idx NULL + decode_error)."""

    def stage(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ton_indexer_spark.multimodal.gif import decode_gif

        for pdf in batches:
            rows = []
            for doc_id, blob in zip(
                pdf[id_col].astype("int64"), pdf[payload_col]
            ):
                try:
                    g = decode_gif(blob)
                    for i in range(0, len(g["frames"]), every_n):
                        f = g["frames"][i]
                        rows.append((doc_id, i, f["delay_cs"],
                                     f["width"], f["height"], f["rgba"],
                                     None))
                except Exception as exc:  # noqa: BLE001 — quarantine
                    rows.append((doc_id, None, None, None, None, None,
                                 f"{type(exc).__name__}: {exc}"[:200]))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "frame_idx", "delay_cs", "width",
                         "height", "rgba", "decode_error"],
            ).astype({"frame_idx": "Int32", "delay_cs": "Int32",
                      "width": "Int32", "height": "Int32"})

    return df.select(id_col, payload_col).mapInPandas(
        stage, schema=GIF_FRAME_SCHEMA
    )


AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("n_samples", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
        T.StructField("pcm16", T.BinaryType()),
        T.StructField("decode_error", T.StringType()),
    ]
)


def decode_audio(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload",
) -> DataFrame:
    """REAL audio decode stage: WAV/PCM blobs -> canonical 16-bit mono
    PCM (``multimodal/wav.py``, pure numpy — 8/16/32-bit int and
    float32 sources all normalize through [-1,1]).  Compressed codecs
    and corrupt containers quarantine as typed ``decode_error`` rows."""

    def stage(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from ton_indexer_spark.multimodal.wav import decode_wav

        for pdf in batches:
            rows = []
            for doc_id, blob in zip(
                pdf[id_col].astype("int64"), pdf[payload_col]
            ):
                try:
                    rate, ch, x = decode_wav(blob)
                    mono = x.mean(axis=1)
                    pcm16 = np.clip(
                        np.rint(mono * 32767), -32768, 32767
                    ).astype("<i2").tobytes()
                    rows.append((
                        doc_id, rate, ch, len(mono),
                        int(len(mono) * 1000 / rate), pcm16, None,
                    ))
                except Exception as exc:  # noqa: BLE001 — quarantine
                    rows.append((doc_id, None, None, None, None, None,
                                 f"{type(exc).__name__}: {exc}"[:200]))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "sample_rate", "channels",
                         "n_samples", "duration_ms", "pcm16",
                         "decode_error"],
            ).astype({"sample_rate": "Int32", "channels": "Int32",
                      "n_samples": "Int32", "duration_ms": "Int32"})

    return df.select(id_col, payload_col).mapInPandas(
        stage, schema=AUDIO_SCHEMA
    )


def audio_features(
    df: DataFrame, n_mels: int = 20,
    id_col: str = "doc_id", payload_col: str = "payload",
) -> DataFrame:
    """WAV blob -> pooled log-mel embedding (mean + std per mel band,
    2*n_mels dims): the real spectral front-end (Hann rFFT + HTK mel
    filterbank) computed in-engine, pooled so the output feeds the
    similarity operators exactly like the `embeddings` table."""

    def stage(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from ton_indexer_spark.multimodal.wav import decode_wav, logmel

        for pdf in batches:
            ids, vecs = [], []
            for doc_id, blob in zip(
                pdf[id_col].astype("int64"), pdf[payload_col]
            ):
                try:
                    rate, _ch, x = decode_wav(blob)
                except Exception:  # noqa: BLE001 — skip undecodable
                    continue
                m = logmel(x, rate, n_mels=n_mels)
                vec = np.concatenate([m.mean(axis=0), m.std(axis=0)])
                ids.append(doc_id)
                vecs.append(vec.astype(np.float32).tolist())
            # explicit dtypes: an all-quarantined batch otherwise infers
            # float64 columns that Arrow can't cast to list<float>
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "embedding": pd.Series(vecs, dtype="object"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(
        stage, schema=FEATURE_SCHEMA
    )


FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
    ]
)


def extract_features(
    df: DataFrame, dim: int = 64,
    id_col: str = "doc_id", payload_col: str = "payload",
) -> DataFrame:
    """Feature-extraction stage: blob → fixed-dim float vector.  FAKE
    encoder (digest-derived floats in [-1, 1]; a real impl runs a vision
    tower here).  Output column name/type match the `embeddings` table, so
    the vectors feed the similarity operators (IVF/LSH ANN, near-dup)
    directly — the decode→embed→dedup composition a data pipeline runs."""

    def stage(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            vecs = []
            for blob in pdf[payload_col]:
                seed = hashlib.md5(blob or b"").digest()
                raw = b"".join(
                    hashlib.md5(seed + i.to_bytes(4, "big")).digest()
                    for i in range((dim * 4 + 15) // 16)
                )
                ints = np.frombuffer(raw[: dim * 4], dtype="<u4")
                vecs.append(
                    ((ints / 2**31).astype("float32") - 1.0)
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "embedding": [v.tolist() for v in vecs],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(
        stage, schema=FEATURE_SCHEMA
    )
