"""Pure-python GIF decoder (GIF87a/GIF89a) — real in-engine LZW.

Companion to ``png.py`` in shrinking the image-decode seam: GIF's only
compression is the variable-code-width LZW scheme of the published spec
(GIF89a §22 + Appendix F), decodable in ~60 lines of python with no
codec library.  Covers:

- logical screen descriptor + global/local color tables
- every data block type: image descriptors, graphic-control /
  comment / application / plain-text extensions (sub-block walks)
- LZW with clear/EOI codes, 12-bit dictionary cap, deferred clear
- Adam-style 4-pass interlace row reordering
- per-frame transparency index -> RGBA alpha, frame delays

Frames decode to their OWN rect (left, top, w, h) as RGBA; compositing
disposal methods across frames is presentation policy, so
``first_frame`` renders frame 0 onto the logical screen (background =
transparent) and leaves multi-frame compositing to callers.

Baseline JPEG decodes in-engine too as of the same change set
(``jpeg.py``, Huffman + matrix IDCT) — ``decode_images`` routes all
three formats without an external codec.

Decompression-bomb hardening: screen/frame dimensions are validated
against a pixel budget (``max_pixels``) BEFORE any allocation, and the
LZW loop stops emitting once the frame's declared fw*fh bytes are out —
a crafted small blob (LZW amplifies up to ~2700x) raises ``GifError``
or truncates harmlessly instead of OOM-killing the executor.
"""

from __future__ import annotations

import numpy as np


class GifError(ValueError):
    pass


# Per-blob pixel budget (default 2^26 px; the RGBA canvas is 4 bytes/px
# so worst-case live memory is ~256 MB/frame).  Checked before any
# frame/canvas allocation so a tiny crafted blob can't OOM an executor.
MAX_PIXELS = 1 << 26


def _color_table(data: bytes, pos: int, n: int) -> tuple[np.ndarray, int]:
    end = pos + 3 * n
    if end > len(data):
        raise GifError("truncated color table")
    return (
        np.frombuffer(data[pos:end], dtype=np.uint8).reshape(n, 3),
        end,
    )


def _subblocks(data: bytes, pos: int) -> tuple[bytes, int]:
    out = bytearray()
    while True:
        if pos >= len(data):
            raise GifError("truncated sub-block chain")
        n = data[pos]
        pos += 1
        if n == 0:
            return bytes(out), pos
        out += data[pos:pos + n]
        if len(out) and pos + n > len(data):
            raise GifError("truncated sub-block")
        pos += n


def _lzw_decode(
    data: bytes, min_code_size: int, max_out: int | None = None,
) -> bytearray:
    """GIF-flavor LZW (spec Appendix F): variable width starting at
    min+1 bits, CLEAR resets the dictionary, EOI terminates.

    ``max_out`` bounds the emitted byte count (callers pass the frame's
    declared fw*fh): LZW amplifies up to ~2700x, so without the bound a
    small crafted stream could balloon memory long before the caller's
    size check runs.  Emission stops once the bound is met — exactly the
    bytes the caller would keep."""
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    dict_base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(dict_base)
    out = bytearray()
    bitpos = 0
    nbits = len(data) * 8
    prev: bytes | None = None
    while bitpos + width <= nbits:
        byte_i = bitpos >> 3
        # codes are little-endian bit-packed across byte boundaries
        chunk = int.from_bytes(data[byte_i:byte_i + 3], "little")
        code = (chunk >> (bitpos & 7)) & ((1 << width) - 1)
        bitpos += width
        if code == clear:
            table = list(dict_base)
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            return out
        if prev is None:
            if code >= len(table):
                raise GifError(f"bad first code {code}")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            if len(table) < 4096:
                table.append(prev + entry[:1])
        elif code == len(table) and len(table) < 4096:
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise GifError(f"code {code} beyond dictionary")
        out += entry
        prev = entry
        if max_out is not None and len(out) >= max_out:
            return out  # frame filled: ignore any trailing codes
        if len(table) >= (1 << width) and width < 12:
            width += 1
    return out  # missing EOI: tolerate, like most renderers


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(idx: np.ndarray) -> np.ndarray:
    h = idx.shape[0]
    order = [y for start, step in _INTERLACE_PASSES
             for y in range(start, h, step)]
    out = np.empty_like(idx)
    out[order] = idx
    return out


def decode_gif(blob: bytes, max_pixels: int = MAX_PIXELS) -> dict:
    """Full decode -> {width, height, frames: [{left, top, width,
    height, delay_cs, rgba}]}; ``rgba`` is the frame rect's interleaved
    u8 RGBA (transparent index -> alpha 0)."""
    if blob[:6] not in (b"GIF87a", b"GIF89a"):
        raise GifError("not a GIF signature")
    if len(blob) < 13:
        raise GifError("truncated logical screen descriptor")
    sw = int.from_bytes(blob[6:8], "little")
    sh = int.from_bytes(blob[8:10], "little")
    if sw * sh > max_pixels:
        raise GifError(
            f"logical screen {sw}x{sh} exceeds pixel budget {max_pixels}"
        )
    flags = blob[10]
    pos = 13
    gct = None
    if flags & 0x80:
        gct, pos = _color_table(blob, pos, 2 << (flags & 7))
    frames = []
    transparent = None
    delay_cs = 0
    while pos < len(blob):
        b = blob[pos]
        pos += 1
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension
            if pos >= len(blob):
                raise GifError("truncated extension")
            label = blob[pos]
            pos += 1
            data, pos = _subblocks(blob, pos)
            if label == 0xF9 and len(data) >= 4:  # graphic control
                delay_cs = int.from_bytes(data[1:3], "little")
                transparent = data[3] if data[0] & 1 else None
            continue
        if b != 0x2C:
            raise GifError(f"unknown block 0x{b:02x}")
        if pos + 9 > len(blob):
            raise GifError("truncated image descriptor")
        left = int.from_bytes(blob[pos:pos + 2], "little")
        top = int.from_bytes(blob[pos + 2:pos + 4], "little")
        fw = int.from_bytes(blob[pos + 4:pos + 6], "little")
        fh = int.from_bytes(blob[pos + 6:pos + 8], "little")
        iflags = blob[pos + 8]
        pos += 9
        if fw * fh > max_pixels:
            raise GifError(
                f"frame {fw}x{fh} exceeds pixel budget {max_pixels}"
            )
        table = gct
        if iflags & 0x80:
            table, pos = _color_table(blob, pos, 2 << (iflags & 7))
        if table is None:
            raise GifError("frame with no color table")
        if pos >= len(blob):
            raise GifError("missing LZW code size")
        min_code = blob[pos]
        pos += 1
        lzw, pos = _subblocks(blob, pos)
        idx_flat = _lzw_decode(lzw, min_code, max_out=fw * fh)
        if len(idx_flat) < fw * fh:
            raise GifError(
                f"LZW stream short: {len(idx_flat)} < {fw * fh}"
            )
        idx = np.frombuffer(
            bytes(idx_flat[: fw * fh]), dtype=np.uint8
        ).reshape(fh, fw)
        if iflags & 0x40:
            idx = _deinterlace(idx)
        if idx.max(initial=0) >= len(table):
            raise GifError("pixel index beyond color table")
        rgba = np.empty((fh, fw, 4), dtype=np.uint8)
        rgba[..., :3] = table[idx]
        rgba[..., 3] = 255
        if transparent is not None and transparent < len(table):
            rgba[..., 3] = np.where(idx == transparent, 0, 255)
        frames.append({
            "left": left, "top": top, "width": fw, "height": fh,
            "delay_cs": delay_cs, "rgba": rgba.tobytes(),
        })
        transparent = None
        delay_cs = 0
    if not frames:
        raise GifError("no image data")
    return {"width": sw, "height": sh, "frames": frames}


def first_frame(blob: bytes) -> tuple[int, int, int, bytes]:
    """Frame 0 rendered onto the logical screen (transparent
    background) -> (width, height, 4, rgba) — the ``decode_images``
    contract shape."""
    g = decode_gif(blob)
    canvas = np.zeros((g["height"], g["width"], 4), dtype=np.uint8)
    f = g["frames"][0]
    fr = np.frombuffer(f["rgba"], dtype=np.uint8).reshape(
        f["height"], f["width"], 4
    )
    y0, x0 = f["top"], f["left"]
    y1 = min(y0 + f["height"], g["height"])
    x1 = min(x0 + f["width"], g["width"])
    canvas[y0:y1, x0:x1] = fr[: y1 - y0, : x1 - x0]
    return g["width"], g["height"], 4, canvas.tobytes()


# --------------------------------------------------------------------------
# Minimal encoder — fixtures/round-trip tests only (uncompressed-style
# LZW: emit literal codes with interleaved CLEARs so the dictionary
# never grows past the initial width — valid per spec, simple to reason
# about; the decoder exercises dictionary growth via crafted streams in
# tests).

def _lzw_encode_literal(indices: bytes, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    bits = []

    def emit(code: int) -> None:
        for i in range(width):
            bits.append((code >> i) & 1)

    emit(clear)
    for n, i in enumerate(indices):
        emit(i)
        # re-CLEAR before the dictionary would force a width bump
        if (n + 1) % (clear - 2 or 1) == 0:
            emit(clear)
    emit(eoi)
    out = bytearray()
    for i in range(0, len(bits), 8):
        out.append(
            sum(b << j for j, b in enumerate(bits[i:i + 8]))
        )
    return bytes(out)


def encode_gif(
    indices: bytes, width: int, height: int, palette: bytes,
    transparent: int | None = None, interlace: bool = False,
    animate: list[bytes] | None = None,
) -> bytes:
    """Single- or multi-frame GIF89a from index planes + RGB palette
    (length padded to a power of two, min 4 entries)."""
    n = max(4, 1 << (len(palette) // 3 - 1).bit_length())
    pal = palette + b"\x00" * (3 * n - len(palette))
    depth = n.bit_length() - 1
    out = bytearray(b"GIF89a")
    out += width.to_bytes(2, "little") + height.to_bytes(2, "little")
    out += bytes([0x80 | (depth - 1), 0, 0]) + pal
    planes = [indices] + list(animate or [])
    for plane in planes:
        if transparent is not None:
            out += bytes([0x21, 0xF9, 4, 1, 2, 0, transparent, 0])
        out += b"\x2c" + (0).to_bytes(2, "little") * 2
        out += width.to_bytes(2, "little") + height.to_bytes(2, "little")
        out += bytes([0x40 if interlace else 0])
        if interlace:
            order = [y for start, step in _INTERLACE_PASSES
                     for y in range(start, height, step)]
            arr = np.frombuffer(plane, np.uint8).reshape(height, width)
            plane = arr[order].tobytes()
        min_code = max(2, depth)
        lzw = _lzw_encode_literal(plane, min_code)
        out.append(min_code)
        for i in range(0, len(lzw), 255):
            chunk = lzw[i:i + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)
