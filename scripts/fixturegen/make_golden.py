"""Build the golden codec fixtures (run ONCE; outputs are committed).

Two cross-attestation directions, both against OpenJDK ImageIO — an
independent standard implementation of JPEG/GIF/PNG that shares no code
or conventions with the in-engine python codecs:

1. java-encoded: ImageIO writes deterministic images; for JPEG it also
   DECODES them back and dumps the pixel arrays (libjpeg-style integer
   IDCT — the external reference our float decoder must match within
   tolerance).  GIF/PNG are lossless, so the dumped original pixels ARE
   the expectation, bit-exact.
2. ours-encoded: the in-engine encoders write files; ImageIO decodes
   them and dumps the pixel arrays.  If our encoder had a mirrored
   convention bug (transposed IDCT, swapped zigzag, off-by-one LZW
   width) these dumps would diverge from the encoder inputs.

Usage (from the repo root):
    python scripts/fixturegen/make_golden.py

Writes into ton_indexer_spark/multimodal/golden/ and prints the
measured JPEG error envelopes (used to pin test tolerances).
"""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO))

from ton_indexer_spark.multimodal.gif import decode_gif, encode_gif  # noqa: E402
from ton_indexer_spark.multimodal.jpeg import decode_jpeg, encode_jpeg  # noqa: E402
from ton_indexer_spark.multimodal.png import decode_png, encode_png  # noqa: E402

GOLDEN = REPO / "ton_indexer_spark" / "multimodal" / "golden"
FIXGEN = REPO / "scripts" / "fixturegen"


def _lcg_bytes(seed: int, n: int) -> bytes:
    """Deterministic pixel bytes (same LCG family as the Java side but
    independent streams — content just needs to be stable)."""
    state = seed
    out = bytearray(n)
    for i in range(n):
        state = (state * 6364136223846793005 + 1442695040888963407) \
            & 0xFFFFFFFFFFFFFFFF
        out[i] = (state >> 33) & 0xFF
    return bytes(out)


def _smooth_rgb(h: int, w: int) -> bytes:
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [(xx * 8) % 256, (yy * 8) % 256, ((xx + yy) * 4) % 256], axis=-1
    ).astype(np.uint8).tobytes()


def _smooth_gray(h: int, w: int) -> bytes:
    yy, xx = np.mgrid[0:h, 0:w]
    return ((xx * 13 + yy * 7) % 256).astype(np.uint8).tobytes()


def write_ours() -> list[dict]:
    """Encode with OUR codecs; Java will decode these."""
    specs = []

    def add(name, fmt, blob, w, h, ch, src, java_dump, tol):
        (GOLDEN / name).write_bytes(blob)
        (GOLDEN / f"{Path(name).stem}.src").write_bytes(src)
        specs.append({
            "file": name, "format": fmt, "width": w, "height": h,
            "channels": ch, "src": f"{Path(name).stem}.src",
            "java_decoded": java_dump, "tol": tol,
        })

    g = _smooth_gray(16, 16)
    add("ours_gray.jpg", "jpeg", encode_jpeg(g, 16, 16, 1, quant=1),
        16, 16, 1, g, "ours_gray.gray", 3)
    c = _smooth_rgb(16, 24)
    add("ours_rgb.jpg", "jpeg", encode_jpeg(c, 24, 16, 3, quant=1),
        24, 16, 3, c, "ours_rgb.rgb", 4)
    c420 = _smooth_rgb(12, 20)
    add("ours_rgb420.jpg", "jpeg",
        encode_jpeg(c420, 20, 12, 3, quant=1, subsample=True),
        20, 12, 3, c420, "ours_rgb420.rgb", 16)  # fancy-vs-box chroma
    crst = _smooth_rgb(12, 12)
    add("ours_rst.jpg", "jpeg",
        encode_jpeg(crst, 12, 12, 3, quant=1, restart_interval=2),
        12, 12, 3, crst, "ours_rst.rgb", 4)

    pal = bytes(
        v for i in range(16)
        for v in ((i * 37) % 256, (i * 73 + 11) % 256, (i * 151 + 5) % 256)
    )
    idx = bytes(
        (x + 2 * y) % 16 if (x // 7 + y // 5) % 2 == 0 else (x * y) % 16
        for y in range(18) for x in range(26)
    )
    gif_blob = encode_gif(idx, 26, 18, pal)
    rgba = np.zeros((18, 26, 4), np.uint8)
    p = np.frombuffer(pal, np.uint8).reshape(16, 3)
    ia = np.frombuffer(idx, np.uint8).reshape(18, 26)
    rgba[..., :3] = p[ia]
    rgba[..., 3] = 255
    add("ours_pal.gif", "gif", gif_blob, 26, 18, 4, rgba.tobytes(),
        "ours_pal.rgba", 0)

    il = encode_gif(idx, 26, 18, pal, interlace=True)
    add("ours_interlaced.gif", "gif", il, 26, 18, 4, rgba.tobytes(),
        "ours_interlaced.rgba", 0)

    png_px = _lcg_bytes(7, 15 * 11 * 3)
    png_blob = encode_png(png_px, 15, 11, 3,
                          filter_type=[0, 1, 2, 3, 4, 2, 1, 3, 4, 0, 2])
    add("ours_mixed.png", "png", png_blob, 15, 11, 3, png_px,
        "ours_mixed.rgb", 0)
    return specs


def main() -> None:
    GOLDEN.mkdir(exist_ok=True)
    subprocess.run(
        ["javac", "-d", str(FIXGEN), str(FIXGEN / "GoldenCodecs.java")],
        check=True,
    )
    subprocess.run(
        ["java", "-cp", str(FIXGEN), "GoldenCodecs", "generate",
         str(GOLDEN)],
        check=True,
    )
    ours = write_ours()
    subprocess.run(
        ["java", "-cp", str(FIXGEN), "GoldenCodecs", "decode", str(GOLDEN)]
        + [str(GOLDEN / s["file"]) for s in ours],
        check=True,
    )

    java_encoded = [
        {"file": "java_gray_grad.jpg", "format": "jpeg", "width": 16,
         "height": 8, "channels": 1, "pixels": "java_gray_grad.gray"},
        {"file": "java_gray_noise.jpg", "format": "jpeg", "width": 24,
         "height": 16, "channels": 1, "pixels": "java_gray_noise.gray"},
        {"file": "java_rgb_grad.jpg", "format": "jpeg", "width": 32,
         "height": 24, "channels": 3, "pixels": "java_rgb_grad.rgb"},
        {"file": "java_rgb_odd.jpg", "format": "jpeg", "width": 17,
         "height": 11, "channels": 3, "pixels": "java_rgb_odd.rgb"},
        {"file": "java_pal16.gif", "format": "gif", "width": 64,
         "height": 48, "channels": 4, "pixels": "java_pal16.rgba"},
        {"file": "java_pal4.gif", "format": "gif", "width": 23,
         "height": 17, "channels": 4, "pixels": "java_pal4.rgba"},
        {"file": "java_pal256.gif", "format": "gif", "width": 128,
         "height": 96, "channels": 4, "pixels": "java_pal256.rgba"},
        {"file": "java_rgb.png", "format": "png", "width": 31,
         "height": 19, "channels": 3, "pixels": "java_rgb.rgb"},
        {"file": "java_gray.png", "format": "png", "width": 16,
         "height": 16, "channels": 1, "pixels": "java_gray.gray"},
        {"file": "java_rgba.png", "format": "png", "width": 21,
         "height": 13, "channels": 4, "pixels": "java_rgba.rgba"},
    ]
    manifest = {"java_encoded": java_encoded, "ours_encoded": ours}
    (GOLDEN / "manifest.json").write_text(
        json.dumps(manifest, indent=1) + "\n"
    )

    # ---- measurement pass: our decoder vs the Java-decoded reference
    print("=== java-encoded -> OUR decoder (max abs diff vs ImageIO) ===")
    for spec in java_encoded:
        blob = (GOLDEN / spec["file"]).read_bytes()
        ref = np.frombuffer((GOLDEN / spec["pixels"]).read_bytes(),
                            np.uint8)
        fmt = spec["format"]
        if fmt == "jpeg":
            w, h, ch, px = decode_jpeg(blob)
        elif fmt == "gif":
            from ton_indexer_spark.multimodal.gif import first_frame
            w, h, ch, px = first_frame(blob)
        else:
            w, h, ch, px = decode_png(blob)
        got = np.frombuffer(px, np.uint8)
        assert (w, h, ch) == (spec["width"], spec["height"],
                              spec["channels"]), (spec["file"], w, h, ch)
        assert got.shape == ref.shape, (spec["file"], got.shape, ref.shape)
        d = np.abs(got.astype(int) - ref.astype(int))
        print(f"  {spec['file']}: max={d.max()} mean={d.mean():.3f}")

    print("=== OURS-encoded -> Java decoder (max abs diff vs source) ===")
    for spec in ours:
        src = np.frombuffer((GOLDEN / spec["src"]).read_bytes(), np.uint8)
        jd = np.frombuffer(
            (GOLDEN / spec["java_decoded"]).read_bytes(), np.uint8
        )
        assert src.shape == jd.shape, (spec["file"], src.shape, jd.shape)
        d = np.abs(src.astype(int) - jd.astype(int))
        print(f"  {spec['file']}: max={d.max()} mean={d.mean():.3f}"
              f"  (tol {spec['tol']})")


if __name__ == "__main__":
    main()
