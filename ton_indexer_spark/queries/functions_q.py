"""Scalar-function gate queries (SURVEY.md §2.9 F1/F4/F6/F8) plus the
multimodal metadata pass and keyset pagination."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ton_indexer_spark.catalog import Catalog
from ton_indexer_spark.multimodal import binary_metadata, with_binary_payload
from ton_indexer_spark.operators import paginate
from ton_indexer_spark.queries import register


@register(
    "json_extract",
    """
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_str,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_num
    FROM events
    ORDER BY event_id
    """,
    survey_ops=("F6",),
    description="JSON field extraction from a string column (jsonb extra "
    "currencies analog, migrate.cpp:176)",
)
def json_extract_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).events
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        F.get_json_object("props", "$.k").cast("bigint").alias("k_num"),
    ).orderBy("event_id")


@register(
    "base64_roundtrip",
    """
    SELECT doc_id,
           to_base64(encode(substr(text, 1, 48))) AS b64,
           CAST(from_base64(to_base64(encode(substr(text, 1, 48)))) AS VARCHAR)
               AS roundtrip
    FROM documents
    ORDER BY doc_id
    """,
    survey_ops=("F1",),
    description="base64 encode/decode of payload bytes (hash/BOC rendering "
    "convention, balances.go:273)",
)
def base64_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    payload = F.encode(F.substring("text", 1, 48), "UTF-8")
    return d.select(
        "doc_id",
        F.base64(payload).alias("b64"),
        F.decode(F.unbase64(F.base64(payload)), "UTF-8").alias("roundtrip"),
    ).orderBy("doc_id")


@register(
    "opcode_conversion",
    """
    SELECT event_id,
           CAST(((user_id - 128 + 2147483648) % 4294967296
                 + 4294967296) % 4294967296 - 2147483648
                AS BIGINT) AS op_signed,
           ((user_id - 128) & 4294967295) AS op_unsigned
    FROM events
    ORDER BY event_id
    """,
    survey_ops=("F8",),
    description="signed int32 ↔ unsigned opcode view (opcode & 0xFFFFFFFF, "
    "tree_utils.py:46-49); the int32 view WRAPS two's-complement style "
    "like the reference's Postgres column, never errors — a plain "
    "CAST(... AS INT) threw under ANSI mode on the sf1 store's wide ids",
)
def opcode_conversion_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).events
    x = F.col("user_id") - 128
    # explicit int32 wraparound in long arithmetic (engine-independent):
    # ((x + 2^31) pmod 2^32) - 2^31
    signed = F.pmod(x + F.lit(2**31), F.lit(2**32)) - F.lit(2**31)
    return ev.select(
        "event_id",
        signed.alias("op_signed"),
        x.bitwiseAND(F.lit(0xFFFFFFFF)).alias("op_unsigned"),
    ).orderBy("event_id")


@register(
    "multimodal_metadata",
    """
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           md5(text) AS digest,
           'unknown' AS format,
           CAST(NULL AS INTEGER) AS width,
           CAST(NULL AS INTEGER) AS height
    FROM documents
    ORDER BY doc_id
    """,
    survey_ops=("beyond:multimodal",),
    description="binary-column metadata pass via Arrow mapInPandas (byte "
    "length + digest + magic sniff + image-header width/height, NULL for "
    "non-images); payload derived from text since the container ships no "
    "media files — the plumbing is the product",
)
def multimodal_metadata_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    return binary_metadata(with_binary_payload(d)).orderBy("doc_id")


def _image_blobs():
    """Crafted REAL container headers, built field-by-field from the
    published specs (PNG ISO 15948 §11.2.2, JPEG ITU-T.81 §B.2.2, GIF89a
    §18) — no codec library involved in making or reading them."""
    png = (b"\x89PNG\r\n\x1a\n"
           + (13).to_bytes(4, "big") + b"IHDR"
           + (640).to_bytes(4, "big") + (480).to_bytes(4, "big")
           + b"\x08\x02\x00\x00\x00" + b"\x00\x00\x00\x00")
    jpeg = (b"\xff\xd8\xff"
            + b"\xe0" + (16).to_bytes(2, "big") + b"JFIF\x00" + b"\x00" * 9
            # a DQT segment before the frame header, as real files have
            + b"\xff\xdb" + (67).to_bytes(2, "big") + b"\x00" + b"\x01" * 64
            + b"\xff\xc0" + (17).to_bytes(2, "big") + b"\x08"
            + (1080).to_bytes(2, "big") + (1920).to_bytes(2, "big")
            + b"\x03" + b"\x01\x22\x00\x02\x11\x01\x03\x11\x01")
    gif = (b"GIF89a"
           + (320).to_bytes(2, "little") + (200).to_bytes(2, "little")
           + b"\xf7\x00\x00")
    trunc_png = b"\x89PNG\r\n\x1a\n" + (13).to_bytes(4, "big")  # no IHDR
    return [
        (1, png), (2, jpeg), (3, gif),
        (4, trunc_png), (5, b"not an image"), (6, None),
    ]


@register(
    "image_header_meta",
    """
    SELECT * FROM (VALUES
      (CAST(1 AS BIGINT), 'png',  CAST(640 AS INTEGER),
       CAST(480 AS INTEGER), CAST(33 AS BIGINT)),
      (CAST(2 AS BIGINT), 'jpeg', CAST(1920 AS INTEGER),
       CAST(1080 AS INTEGER), CAST(108 AS BIGINT)),
      (CAST(3 AS BIGINT), 'gif',  CAST(320 AS INTEGER),
       CAST(200 AS INTEGER), CAST(13 AS BIGINT)),
      (CAST(4 AS BIGINT), 'png',  CAST(NULL AS INTEGER),
       CAST(NULL AS INTEGER), CAST(12 AS BIGINT)),
      (CAST(5 AS BIGINT), 'unknown', CAST(NULL AS INTEGER),
       CAST(NULL AS INTEGER), CAST(12 AS BIGINT)),
      (CAST(6 AS BIGINT), 'empty', CAST(NULL AS INTEGER),
       CAST(NULL AS INTEGER), CAST(0 AS BIGINT))
    ) AS t(doc_id, format, width, height, n_bytes)
    ORDER BY doc_id
    """,
    survey_ops=("beyond:multimodal",),
    description="REAL image-header decode inside the Arrow batch path: "
    "PNG IHDR / JPEG SOFn / GIF descriptor parsed from crafted spec-"
    "conformant bytes; truncated and non-image blobs yield NULL dims",
)
def image_header_meta_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = spark.createDataFrame(
        _image_blobs(), "doc_id long, payload binary"
    )
    return binary_metadata(df).select(
        "doc_id", "format", "width", "height", "n_bytes"
    ).orderBy("doc_id")


def _png_gate_blobs():
    """Deterministic spec-conformant PNGs covering every scanline filter
    and channel count, one per-row-mixed-filter image, one blob with no
    in-engine codec (GIF) and one corrupt-CRC PNG — built with the
    in-engine encoder (tests/test_png.py round-trips it against the
    decoder and hand-built containers)."""
    import hashlib

    from ton_indexer_spark.multimodal.png import encode_png

    def pix(seed: str, n: int) -> bytes:
        out = bytearray()
        c = 0
        while len(out) < n:
            out += hashlib.md5(f"{seed}:{c}".encode()).digest()
            c += 1
        return bytes(out[:n])

    cases = [
        (1, 16, 8, 1, 0),           # gray, None
        (2, 9, 5, 3, 1),            # RGB, Sub
        (3, 8, 8, 4, 2),            # RGBA, Up
        (4, 7, 6, 2, 3),            # gray+alpha, Average
        (5, 12, 4, 3, 4),           # RGB, Paeth
        (6, 6, 6, 1, [0, 1, 2, 3, 4, 2]),  # per-row mixed filters
    ]
    rows = []
    for img_id, w, h, ch, ft in cases:
        rows.append((img_id, encode_png(
            pix(f"png_gate:{img_id}", w * h * ch), w, h, ch,
            filter_type=ft,
        )))
    rows.append((7, b"GIF89a" + b"\x00" * 20))
    bad = bytearray(rows[0][1])
    bad[-5] ^= 0xFF  # flip a bit inside the IEND CRC
    rows.append((8, bytes(bad)))
    # externally-generated rows: ImageIO-encoded PNGs (adaptive per-row
    # filters) with digests pinned from ImageIO's own pixel dumps
    rows.append((9, _golden("java_rgb.png")))
    rows.append((10, _golden("java_rgba.png")))
    return rows


@register(
    "png_decode",
    """
    SELECT * FROM (VALUES
      (CAST(1 AS BIGINT), 'png', CAST(16 AS INTEGER), CAST(8 AS INTEGER),
       CAST(1 AS INTEGER), '879751890f1d1f265322430acaea9ba2',
       CAST(NULL AS VARCHAR)),
      (CAST(2 AS BIGINT), 'png', CAST(9 AS INTEGER), CAST(5 AS INTEGER),
       CAST(3 AS INTEGER), 'e77d9fd4d17a453df6debc9560ae7494',
       CAST(NULL AS VARCHAR)),
      (CAST(3 AS BIGINT), 'png', CAST(8 AS INTEGER), CAST(8 AS INTEGER),
       CAST(4 AS INTEGER), 'c4fc06e764fa44b92e9075abbc3b4457',
       CAST(NULL AS VARCHAR)),
      (CAST(4 AS BIGINT), 'png', CAST(7 AS INTEGER), CAST(6 AS INTEGER),
       CAST(2 AS INTEGER), '0b4cf58b5ccfff634b19eebf4d993c21',
       CAST(NULL AS VARCHAR)),
      (CAST(5 AS BIGINT), 'png', CAST(12 AS INTEGER), CAST(4 AS INTEGER),
       CAST(3 AS INTEGER), '2448d1792f5556cc7971e957fa276101',
       CAST(NULL AS VARCHAR)),
      (CAST(6 AS BIGINT), 'png', CAST(6 AS INTEGER), CAST(6 AS INTEGER),
       CAST(1 AS INTEGER), 'a3bdc6f6ba4bfd4532e1ecfda915c748',
       CAST(NULL AS VARCHAR)),
      (CAST(7 AS BIGINT), 'gif', CAST(NULL AS INTEGER),
       CAST(NULL AS INTEGER), CAST(NULL AS INTEGER),
       CAST(NULL AS VARCHAR), 'GifError'),
      (CAST(8 AS BIGINT), 'png', CAST(NULL AS INTEGER),
       CAST(NULL AS INTEGER), CAST(NULL AS INTEGER),
       CAST(NULL AS VARCHAR), 'PngError'),
      (CAST(9 AS BIGINT), 'png', CAST(31 AS INTEGER), CAST(19 AS INTEGER),
       CAST(3 AS INTEGER), 'c3025a08ea1d181574b7757bfc5ef386',
       CAST(NULL AS VARCHAR)),
      (CAST(10 AS BIGINT), 'png', CAST(21 AS INTEGER), CAST(13 AS INTEGER),
       CAST(4 AS INTEGER), '0bce7dcd3fd3aca1f6ca8a678a46263d',
       CAST(NULL AS VARCHAR))
    ) AS t(img_id, format, width, height, channels, pixel_md5, err_kind)
    ORDER BY img_id
    """,
    survey_ops=("beyond:multimodal",),
    description="REAL in-engine PNG pixel decode (stdlib zlib, "
    "multimodal/png.py): all five scanline filters, gray/RGB/alpha "
    "channel layouts and per-row mixed filters decoded inside the Arrow "
    "mapInPandas stage; non-PNG and corrupt-CRC blobs quarantine as "
    "typed decode_error rows instead of failing the stage; rows 9-10 "
    "are EXTERNALLY-GENERATED ImageIO PNGs (adaptive per-row filters) "
    "with digests pinned from ImageIO's own pixel dumps",
)
def png_decode_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ton_indexer_spark.multimodal.binary import decode_images

    df = spark.createDataFrame(
        _png_gate_blobs(), "img_id long, payload binary"
    )
    out = decode_images(df, id_col="img_id")
    return out.select(
        F.col("doc_id").alias("img_id"),
        "format", "width", "height", "channels",
        F.when(
            F.col("pixels").isNotNull(), F.md5(F.col("pixels"))
        ).alias("pixel_md5"),
        F.substring_index("decode_error", ":", 1).alias("err_kind"),
    ).orderBy("img_id")


def _golden(name: str) -> bytes:
    """Committed golden fixture bytes — produced by OpenJDK ImageIO, an
    independent standard codec implementation (provenance + exact
    generation commands: multimodal/golden/README.md)."""
    from pathlib import Path

    return (Path(__file__).resolve().parents[1] / "multimodal" / "golden"
            / name).read_bytes()


def _gif_gate_blobs():
    """GIF fixtures: three ImageIO-ENCODED files (real LZW streams with
    dictionary growth — 4/16/256-color palettes, the 256-color one
    reaching wide codes) whose expected RGBA digests were pinned from
    ImageIO's own pixel dumps; one interlaced file from OUR encoder
    whose digest is pinned from ImageIO's DECODE of it (both directions
    externally attested); a transparent-index and a 3-frame-animation
    case from the in-engine encoder (feature coverage the single-frame
    ImageIO writer doesn't exercise); a truncated blob and a torn
    non-GIF blob for the quarantine rows."""
    import numpy as np

    from ton_indexer_spark.multimodal.gif import encode_gif

    pal = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 9, 9, 9])

    def idx(seed: int, n: int) -> bytes:
        rng = np.random.default_rng(seed)
        return rng.integers(0, 4, size=n, dtype=np.uint8).tobytes()

    return [
        (1, _golden("java_pal16.gif")),
        (2, _golden("java_pal4.gif")),
        (3, _golden("java_pal256.gif")),
        (4, _golden("ours_interlaced.gif")),
        (5, encode_gif(idx(103, 4 * 4), 4, 4, pal, transparent=1)),
        (6, encode_gif(idx(104, 5 * 5), 5, 5, pal,
                       animate=[idx(105, 5 * 5), idx(106, 5 * 5)])),
        (7, b"GIF89a\x00\x00"),          # truncated
        (8, b"\xff\xd8\xffJPEG bytes"),  # no in-engine codec
    ]


@register(
    "gif_decode",
    """
    SELECT * FROM (VALUES
      (CAST(1 AS BIGINT), 'gif', CAST(64 AS INTEGER), CAST(48 AS INTEGER),
       CAST(4 AS INTEGER), 'cb28cffd2fe939ff921c444cff8e2d99',
       CAST(NULL AS VARCHAR)),
      (CAST(2 AS BIGINT), 'gif', CAST(23 AS INTEGER), CAST(17 AS INTEGER),
       CAST(4 AS INTEGER), '38455cc35525add88b0a6d41d1d45f0a',
       CAST(NULL AS VARCHAR)),
      (CAST(3 AS BIGINT), 'gif', CAST(128 AS INTEGER), CAST(96 AS INTEGER),
       CAST(4 AS INTEGER), '3bdcb63189cd4fb9aa8e464d4fb34a8e',
       CAST(NULL AS VARCHAR)),
      (CAST(4 AS BIGINT), 'gif', CAST(26 AS INTEGER), CAST(18 AS INTEGER),
       CAST(4 AS INTEGER), '11cb19e539afddd9043bd992ac1f74fc',
       CAST(NULL AS VARCHAR)),
      (CAST(5 AS BIGINT), 'gif', CAST(4 AS INTEGER), CAST(4 AS INTEGER),
       CAST(4 AS INTEGER), 'e43790c28377375e42dc808ff793babb',
       CAST(NULL AS VARCHAR)),
      (CAST(6 AS BIGINT), 'gif', CAST(5 AS INTEGER), CAST(5 AS INTEGER),
       CAST(4 AS INTEGER), '0c69cebd1c1124ca1adda7ca3e9134e7',
       CAST(NULL AS VARCHAR)),
      (CAST(7 AS BIGINT), 'gif', CAST(NULL AS INTEGER),
       CAST(NULL AS INTEGER), CAST(NULL AS INTEGER),
       CAST(NULL AS VARCHAR), 'GifError'),
      (CAST(8 AS BIGINT), 'jpeg', CAST(NULL AS INTEGER),
       CAST(NULL AS INTEGER), CAST(NULL AS INTEGER),
       CAST(NULL AS VARCHAR), 'JpegError')
    ) AS t(img_id, format, width, height, channels, pixel_md5, err_kind)
    ORDER BY img_id
    """,
    survey_ops=("beyond:multimodal",),
    description="REAL in-engine GIF pixel decode (pure-python LZW, "
    "multimodal/gif.py) against EXTERNALLY-GENERATED golden fixtures: "
    "rows 1-3 are OpenJDK-ImageIO-encoded real-LZW streams (4/16/256 "
    "colors, dictionary growth to wide codes) with digests pinned from "
    "ImageIO's own pixel dumps; row 4 is our interlaced stream pinned "
    "from ImageIO's decode of it; transparent/animated rows cover "
    "features the ImageIO writer doesn't; truncated and codec-less "
    "blobs quarantine as typed decode_error rows",
)
def gif_decode_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ton_indexer_spark.multimodal.binary import decode_images

    df = spark.createDataFrame(
        _gif_gate_blobs(), "img_id long, payload binary"
    )
    return decode_images(df, id_col="img_id").select(
        F.col("doc_id").alias("img_id"),
        "format", "width", "height", "channels",
        F.when(
            F.col("pixels").isNotNull(), F.md5(F.col("pixels"))
        ).alias("pixel_md5"),
        F.substring_index("decode_error", ":", 1).alias("err_kind"),
    ).orderBy("img_id")


def _jpeg_gate_fixtures():
    """Golden baseline JPEGs: rows 1-4 are ImageIO-ENCODED (grayscale
    4:4:4 and 4:2:0 colour incl. odd partial-MCU dims) with the
    reference pixels being ImageIO's OWN decode of each file; row 5 is
    our restart-interval stream with ImageIO's decode of it as the
    reference (cross-attests the RSTn path).  Tolerances cover
    integer-vs-float IDCT plus triangle-vs-nearest chroma upsample
    (measured max diff 1/7 — see multimodal/golden/README.md).
    Rows 6-7: a torn entropy stream and a progressive-marker patch for
    the quarantine rows."""
    specs = [
        (1, "java_gray_grad.jpg", "java_gray_grad.gray", 2),
        (2, "java_gray_noise.jpg", "java_gray_noise.gray", 2),
        (3, "java_rgb_grad.jpg", "java_rgb_grad.rgb", 10),
        (4, "java_rgb_odd.jpg", "java_rgb_odd.rgb", 10),
        (5, "ours_rst.jpg", "ours_rst.rgb", 4),
    ]
    blobs = [(i, _golden(f)) for i, f, _, _ in specs]
    refs = [(i, _golden(p), tol) for i, _, p, tol in specs]
    blobs.append((6, b"\xff\xd8\xff" + b"\x00" * 10))  # torn stream
    good = blobs[0][1]
    i = good.index(b"\xff\xc0")
    blobs.append((7, good[:i] + b"\xff\xc2" + good[i + 2:]))  # progressive
    return blobs, refs


@register(
    "jpeg_decode",
    """
    SELECT * FROM (VALUES
      (CAST(1 AS BIGINT), 'jpeg', CAST(16 AS INTEGER), CAST(8 AS INTEGER),
       CAST(1 AS INTEGER), TRUE, CAST(NULL AS VARCHAR)),
      (CAST(2 AS BIGINT), 'jpeg', CAST(24 AS INTEGER), CAST(16 AS INTEGER),
       CAST(1 AS INTEGER), TRUE, CAST(NULL AS VARCHAR)),
      (CAST(3 AS BIGINT), 'jpeg', CAST(32 AS INTEGER), CAST(24 AS INTEGER),
       CAST(3 AS INTEGER), TRUE, CAST(NULL AS VARCHAR)),
      (CAST(4 AS BIGINT), 'jpeg', CAST(17 AS INTEGER), CAST(11 AS INTEGER),
       CAST(3 AS INTEGER), TRUE, CAST(NULL AS VARCHAR)),
      (CAST(5 AS BIGINT), 'jpeg', CAST(12 AS INTEGER), CAST(12 AS INTEGER),
       CAST(3 AS INTEGER), TRUE, CAST(NULL AS VARCHAR)),
      (CAST(6 AS BIGINT), 'jpeg', CAST(NULL AS INTEGER),
       CAST(NULL AS INTEGER), CAST(NULL AS INTEGER),
       CAST(NULL AS BOOLEAN), 'JpegError'),
      (CAST(7 AS BIGINT), 'jpeg', CAST(NULL AS INTEGER),
       CAST(NULL AS INTEGER), CAST(NULL AS INTEGER),
       CAST(NULL AS BOOLEAN), 'JpegError')
    ) AS t(img_id, format, width, height, channels, within_tol, err_kind)
    ORDER BY img_id
    """,
    survey_ops=("beyond:multimodal",),
    description="REAL in-engine baseline JPEG decode (Huffman + matrix "
    "IDCT + BT.601, multimodal/jpeg.py) against EXTERNALLY-GENERATED "
    "golden fixtures: ImageIO-encoded grayscale/4:2:0-colour/odd-dim "
    "streams compared to ImageIO's own decoded pixels within a pinned "
    "tolerance (no float-derived digest — the r9 ADVICE item), plus "
    "our restart-interval stream vs ImageIO's decode of it; torn and "
    "progressive streams quarantine as typed decode_error rows",
)
def jpeg_decode_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Single fused mapInPandas pass: decode + golden comparison in one
    # stage over one 7-row DataFrame.  The r10 shape (decode stage →
    # broadcast join with the refs → second pandas_udf for the diff)
    # cost three Arrow/codegen stage setups for fixture-sized input and
    # was the entire 1.85× r10 bench regression — the decode itself is
    # ~5 ms (profiled; the advisor's chroma-upsample guess was wrong:
    # the upsample was already a vectorized np.repeat).
    from collections.abc import Iterator as _Iter

    blobs, refs = _jpeg_gate_fixtures()
    ref_map = {i: (r, t) for i, r, t in refs}
    rows = [(i, b, *(ref_map.get(i) or (None, None)))
            for i, b in blobs]
    df = spark.createDataFrame(
        rows, "img_id long, payload binary, ref binary, tol int")

    def stage(batches: _Iter[pd.DataFrame]) -> _Iter[pd.DataFrame]:
        import numpy as np

        from ton_indexer_spark.multimodal.jpeg import decode_jpeg

        for pdf in batches:
            out = {k: [] for k in ("img_id", "format", "width",
                                   "height", "channels", "within_tol",
                                   "err_kind")}
            for rec in pdf.to_dict("records"):
                out["img_id"].append(int(rec["img_id"]))
                out["format"].append("jpeg")
                try:
                    w, h, ch, px = decode_jpeg(bytes(rec["payload"]))
                except Exception as e:
                    out["width"].append(None)
                    out["height"].append(None)
                    out["channels"].append(None)
                    out["within_tol"].append(None)
                    out["err_kind"].append(type(e).__name__)
                    continue
                out["width"].append(w)
                out["height"].append(h)
                out["channels"].append(ch)
                ref, tol = rec.get("ref"), rec.get("tol")
                if ref is None:
                    out["within_tol"].append(None)
                elif len(px) != len(ref):
                    out["within_tol"].append(False)
                else:
                    diff = int(np.abs(
                        np.frombuffer(px, np.uint8).astype(np.int16)
                        - np.frombuffer(bytes(ref), np.uint8)
                        .astype(np.int16)).max()) if len(px) else 0
                    out["within_tol"].append(diff <= int(tol))
                out["err_kind"].append(None)
            yield pd.DataFrame(out)

    # NB: no coalesce(1) — a coalesced single task over the 32-slot
    # local relation costs ~3.4 s of per-parent-partition python-runner
    # overhead (measured); the plain 32-partition map is ~0.4 s.
    return df.mapInPandas(
        stage,
        schema="img_id long, format string, width int, height int, "
               "channels int, within_tol boolean, err_kind string",
    ).orderBy("img_id")


def _wav_gate_blobs():
    """Deterministic WAV fixtures from the in-engine encoder: 16-bit
    mono, 16-bit stereo, float32, 8-bit (odd length), plus an ADPCM-
    tagged container and a truncated blob for the quarantine rows.

    The waveform is a LIBM-FREE sawtooth (integer phase accumulator +
    correctly-rounded IEEE division/multiply only — the r9 ADVICE
    flagged np.sin + np.rint digests as platform-fragile; every
    operation here is bit-identical across platforms and numpy
    builds)."""
    import numpy as np

    from ton_indexer_spark.multimodal.wav import encode_wav

    def saw(step: int, rate: int, n: int, ch: int = 1) -> np.ndarray:
        phase = (np.arange(n, dtype=np.int64) * step) % rate
        x = 0.9 * (phase / rate) - 0.45
        return np.stack([x] * ch, axis=1) if ch > 1 else x

    rows = [
        (1, encode_wav(saw(440, 8000, 800), 8000, bits=16)),
        (2, encode_wav(saw(880, 16000, 1600, ch=2), 16000, bits=16)),
        (3, encode_wav(saw(100, 4000, 200), 4000, bits=32)),
        (4, encode_wav(saw(220, 8000, 123), 8000, bits=8)),
    ]
    good = rows[0][1]
    i = good.index(b"fmt ") + 8
    rows.append((5, good[:i] + b"\x02\x00" + good[i + 2:]))  # ADPCM tag
    rows.append((6, good[:30]))                              # truncated
    return rows


@register(
    "wav_decode",
    """
    SELECT * FROM (VALUES
      (CAST(1 AS BIGINT), CAST(8000 AS INTEGER), CAST(1 AS INTEGER),
       CAST(800 AS INTEGER), CAST(100 AS INTEGER),
       '817626cae7bccc8e6e37c79e0300f5a8', CAST(NULL AS VARCHAR)),
      (CAST(2 AS BIGINT), CAST(16000 AS INTEGER), CAST(2 AS INTEGER),
       CAST(1600 AS INTEGER), CAST(100 AS INTEGER),
       'cfcc9e25a008ceb5c6005d229673d87d', CAST(NULL AS VARCHAR)),
      (CAST(3 AS BIGINT), CAST(4000 AS INTEGER), CAST(1 AS INTEGER),
       CAST(200 AS INTEGER), CAST(50 AS INTEGER),
       'f88359aee5d084e806d90e89816119ba', CAST(NULL AS VARCHAR)),
      (CAST(4 AS BIGINT), CAST(8000 AS INTEGER), CAST(1 AS INTEGER),
       CAST(123 AS INTEGER), CAST(15 AS INTEGER),
       '2c8699a7800057641475cf51ab5a7507', CAST(NULL AS VARCHAR)),
      (CAST(5 AS BIGINT), CAST(NULL AS INTEGER), CAST(NULL AS INTEGER),
       CAST(NULL AS INTEGER), CAST(NULL AS INTEGER),
       CAST(NULL AS VARCHAR), 'WavError'),
      (CAST(6 AS BIGINT), CAST(NULL AS INTEGER), CAST(NULL AS INTEGER),
       CAST(NULL AS INTEGER), CAST(NULL AS INTEGER),
       CAST(NULL AS VARCHAR), 'WavError')
    ) AS t(doc_id, sample_rate, channels, n_samples, duration_ms,
           pcm_md5, err_kind)
    ORDER BY doc_id
    """,
    survey_ops=("beyond:multimodal",),
    description="REAL in-engine WAV/PCM audio decode (pure numpy, "
    "multimodal/wav.py): 8/16-bit int and float32 sources normalized "
    "to canonical 16-bit mono PCM inside the Arrow stage; compressed-"
    "codec and truncated containers quarantine as typed decode_error "
    "rows",
)
def wav_decode_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ton_indexer_spark.multimodal.binary import decode_audio

    df = spark.createDataFrame(
        _wav_gate_blobs(), "doc_id long, payload binary"
    )
    return decode_audio(df).select(
        "doc_id", "sample_rate", "channels", "n_samples", "duration_ms",
        F.when(
            F.col("pcm16").isNotNull(), F.md5(F.col("pcm16"))
        ).alias("pcm_md5"),
        F.substring_index("decode_error", ":", 1).alias("err_kind"),
    ).orderBy("doc_id")


@register(
    "multimodal_frames",
    """
    WITH d AS (
        SELECT doc_id, encode(text) AS payload FROM documents
    ),
    s AS (
        -- even frame indices 0,2,4,…; seeded off the table itself since
        -- generate_series takes only constants (covers any payload up to
        -- 128·n_docs bytes, far past the corpus max)
        SELECT (ROW_NUMBER() OVER (ORDER BY doc_id) - 1) * 2 AS i
        FROM documents
    )
    SELECT doc_id, CAST(i AS INTEGER) AS frame_idx,
           -- DuckDB has no BLOB substring: compare byte slices as hex
           substring(hex(payload), CAST(i * 128 + 1 AS BIGINT), 128)
               AS frame_hex
    FROM d JOIN s ON i <= greatest(octet_length(payload) // 64, 1) - 1
    ORDER BY doc_id, frame_idx
    """,
    survey_ops=("beyond:multimodal-frames",),
    description="frame-sampling stage: every-2nd fixed-size frame exploded "
    "out of each binary payload inside Arrow mapInPandas (1->many with "
    "per-chunk flushing, constant memory); demux is a byte-slice fake — "
    "the explode plumbing is the product",
)
def multimodal_frames_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ton_indexer_spark.multimodal import sample_frames

    d = Catalog(spark, sf_dir).documents
    frames = sample_frames(with_binary_payload(d), every_n=2, frame_bytes=64)
    return frames.select(
        "doc_id", "frame_idx", F.hex(F.col("frame")).alias("frame_hex")
    ).orderBy("doc_id", "frame_idx")


@register(
    "keyset_pagination",
    """
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    WHERE o_orderkey > 1000
    ORDER BY o_orderkey ASC
    LIMIT 50
    """,
    survey_ops=("O2",),
    description="keyset-cursor page (the lt-cursor pattern that replaces "
    "deep OFFSET at scale — start_lt filters, crud_transactions.go:56-69)",
)
def keyset_pagination_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).orders
    return paginate(
        o.select("o_orderkey", "o_custkey", "o_totalprice"),
        sort=[("o_orderkey", "asc")],
        limit=50,
        keyset={"o_orderkey": 1000},
    )
