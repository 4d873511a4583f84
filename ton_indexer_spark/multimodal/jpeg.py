"""Pure-python baseline JPEG codec (ITU-T.81) — real in-engine decode.

Closes the last image-decode seam: baseline sequential DCT JPEG decodes
with numpy + the published spec, no codec library.  Covers:

- marker walk: SOI / APPn / COM / DQT / DHT / DRI / SOF0 / SOS / EOI
- Huffman entropy decode (any DHT the stream carries, canonical
  reconstruction per Annex C), byte-stuffing (FF 00), restart markers
  (RSTn with DC-predictor reset + bit realignment)
- DC difference coding + AC run-length (EOB / ZRL), dequantization,
  zigzag, exact matrix IDCT (DCT-II basis, float64)
- grayscale and YCbCr with sampling factors 1-2 (4:4:4, 4:2:2, 4:2:0),
  nearest-neighbor chroma upsample, ITU-R BT.601 YCbCr -> RGB

Progressive (SOF2), arithmetic coding, and 12-bit precision raise
``JpegError`` — declared unsupported rather than mis-decoded.

The encoder exists for fixtures/round-trip tests: 8x8 block DCT with
caller-chosen quantization (all-ones = near-lossless), optional 2x2
chroma subsampling and restart intervals.  It emits its OWN canonical
Huffman tables (every used symbol at a fixed code length, first-n codes
of that length — legal per Annex C and rebuilt by any decoder), so no
Annex-K table constants are baked in.

Per-image cost is python-loop Huffman + numpy blocks — the distributed
``decode_images`` stage spreads images across executors; within-image
speed is secondary to correctness here.
"""

from __future__ import annotations

import numpy as np


class JpegError(ValueError):
    pass


# Per-blob pixel budget (default 2^24 px = 16 Mpx; the component planes
# are float64, so worst-case live memory for a 3-component scan is
# ~3*8 bytes/px ≈ 400 MB).  Checked at SOF0 — before any plane
# allocation — so a crafted 20-byte header claiming 65535x65535 raises
# a typed JpegError (quarantined by decode_images) instead of OOMing.
MAX_PIXELS = 1 << 24


# zigzag order: index i of the scan -> (row, col) in the 8x8 block
_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# DCT-II orthonormal basis: IDCT2(B) = M.T @ B @ M
_M = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _M[_k, _n] = np.cos(np.pi * _k * (2 * _n + 1) / 16) * (
            np.sqrt(1 / 8) if _k == 0 else np.sqrt(2 / 8)
        )


def _idct2(block: np.ndarray) -> np.ndarray:
    return _M.T @ block @ _M


def _dct2(block: np.ndarray) -> np.ndarray:
    return _M @ block @ _M.T


class _HuffTable:
    """Canonical Huffman per Annex C: (length, code) -> symbol."""

    def __init__(self, counts: list[int], symbols: bytes):
        self.lookup: dict[tuple[int, int], int] = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(counts[length - 1]):
                self.lookup[(length, code)] = symbols[k]
                code += 1
                k += 1
            code <<= 1


class _BitReader:
    """MSB-first entropy reader with FF00 byte-unstuffing; stops at any
    real marker (leaves position ON the FF)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bitbuf = 0
        self.nbits = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise JpegError("entropy stream truncated")
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1] if self.pos + 1 < len(self.data) else None
            if nxt == 0x00:
                self.pos += 2
            else:
                raise JpegError("marker inside entropy segment")
        else:
            self.pos += 1
        self.bitbuf = (self.bitbuf << 8) | b
        self.nbits += 8

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.bitbuf >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def byte_align(self) -> None:
        self.nbits = 0
        self.bitbuf = 0

    def decode_symbol(self, table: _HuffTable) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.bit()
            sym = table.lookup.get((length, code))
            if sym is not None:
                return sym
        raise JpegError("invalid Huffman code")


def _extend(v: int, size: int) -> int:
    """Annex F.2.2.1 sign extension of a SIZE-bit magnitude."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def decode_jpeg(
    blob: bytes, max_pixels: int = MAX_PIXELS
) -> tuple[int, int, int, bytes]:
    """Decode baseline JPEG -> (width, height, channels, pixels)
    interleaved u8 (1ch grayscale or 3ch RGB)."""
    if blob[:2] != b"\xff\xd8":
        raise JpegError("not a JPEG signature")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _HuffTable] = {}
    huff_ac: dict[int, _HuffTable] = {}
    restart_interval = 0
    frame = None
    n = len(blob)
    while pos + 4 <= n:
        if blob[pos] != 0xFF:
            raise JpegError(f"expected marker at {pos}")
        marker = blob[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue
        seg_len = int.from_bytes(blob[pos:pos + 2], "big")
        seg = blob[pos + 2:pos + seg_len]
        if len(seg) != seg_len - 2:
            raise JpegError("truncated segment")
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 15
                i += 1
                if pq != 0:
                    raise JpegError("16-bit quant tables not supported")
                qt[tq] = np.frombuffer(
                    seg[i:i + 64], dtype=np.uint8
                ).astype(np.float64)
                i += 64
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 15
                counts = list(seg[i + 1:i + 17])
                total = sum(counts)
                symbols = seg[i + 17:i + 17 + total]
                (huff_dc if tc == 0 else huff_ac)[th] = _HuffTable(
                    counts, symbols
                )
                i += 17 + total
        elif marker == 0xDD:  # DRI
            restart_interval = int.from_bytes(seg[:2], "big")
        elif marker == 0xC0:  # SOF0 baseline
            precision = seg[0]
            if precision != 8:
                raise JpegError("12-bit precision not supported")
            height = int.from_bytes(seg[1:3], "big")
            width = int.from_bytes(seg[3:5], "big")
            if width * height > max_pixels:
                raise JpegError(
                    f"{width}x{height} exceeds pixel budget {max_pixels}"
                )
            ncomp = seg[5]
            comps = []
            for c in range(ncomp):
                cid, hv, tq = seg[6 + 3 * c:9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15,
                              "tq": tq})
            frame = {"w": width, "h": height, "comps": comps}
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise JpegError(
                f"SOF{marker - 0xC0}: only baseline sequential (SOF0) "
                "is supported"
            )
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise JpegError("SOS before SOF0")
            ns = seg[0]
            scan = []
            for c in range(ns):
                cs, tdta = seg[1 + 2 * c], seg[2 + 2 * c]
                comp = next(
                    (x for x in frame["comps"] if x["id"] == cs), None
                )
                if comp is None:
                    raise JpegError(f"scan references unknown comp {cs}")
                scan.append({**comp, "td": tdta >> 4, "ta": tdta & 15})
            return _decode_scan(
                blob, pos + seg_len, frame, scan, qt, huff_dc, huff_ac,
                restart_interval,
            )
        pos += seg_len
    raise JpegError("no SOS marker found")


def _decode_scan(blob, pos, frame, scan, qt, huff_dc, huff_ac,
                 restart_interval):
    w, h = frame["w"], frame["h"]
    hmax = max(c["h"] for c in scan)
    vmax = max(c["v"] for c in scan)
    if hmax not in (1, 2) or vmax not in (1, 2):
        raise JpegError("sampling factors beyond 2 not supported")
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = -(-w // mcu_w)
    mcus_y = -(-h // mcu_h)
    planes = [
        np.zeros((mcus_y * c["v"] * 8, mcus_x * c["h"] * 8))
        for c in scan
    ]
    reader = _BitReader(blob, pos)
    pred = [0] * len(scan)
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                reader.byte_align()
                if not (reader.pos + 1 < len(blob)
                        and blob[reader.pos] == 0xFF
                        and 0xD0 <= blob[reader.pos + 1] <= 0xD7):
                    raise JpegError("expected RSTn marker")
                reader.pos += 2
                pred = [0] * len(scan)
            for ci, comp in enumerate(scan):
                for by in range(comp["v"]):
                    for bx in range(comp["h"]):
                        block = _decode_block(
                            reader, huff_dc[comp["td"]],
                            huff_ac[comp["ta"]], qt[comp["tq"]],
                            pred, ci,
                        )
                        y0 = (my * comp["v"] + by) * 8
                        x0 = (mx * comp["h"] + bx) * 8
                        planes[ci][y0:y0 + 8, x0:x0 + 8] = block
            mcu_count += 1
    # upsample to full MCU grid, crop, color-convert
    out_planes = []
    for ci, comp in enumerate(scan):
        p = planes[ci]
        ry, rx = vmax // comp["v"], hmax // comp["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        out_planes.append(p[:h, :w])
    if len(scan) == 1:
        gray = np.clip(np.rint(out_planes[0] + 128), 0, 255)
        return w, h, 1, gray.astype(np.uint8).tobytes()
    if len(scan) != 3:
        raise JpegError(f"{len(scan)}-component scan not supported")
    y, cb, cr = (p + 128 for p in out_planes)
    r = y + 1.402 * (cr - 128)
    g = y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)
    b = y + 1.772 * (cb - 128)
    rgb = np.stack(
        [np.clip(np.rint(c), 0, 255) for c in (r, g, b)], axis=-1
    )
    return w, h, 3, rgb.astype(np.uint8).tobytes()


def _decode_block(reader, dc_table, ac_table, quant, pred, ci):
    coeffs = np.zeros(64)
    size = reader.decode_symbol(dc_table)
    diff = _extend(reader.bits(size), size)
    pred[ci] += diff
    coeffs[0] = pred[ci] * quant[0]
    k = 1
    while k < 64:
        rs = reader.decode_symbol(ac_table)
        run, size = rs >> 4, rs & 15
        if size == 0:
            if run == 15:  # ZRL
                k += 16
                continue
            break  # EOB
        k += run
        if k > 63:
            raise JpegError("AC run past block end")
        coeffs[k] = _extend(reader.bits(size), size) * quant[k]
        k += 1
    block = np.zeros(64)
    block[_ZIGZAG] = coeffs
    return _idct2(block.reshape(8, 8))


# --------------------------------------------------------------------------
# Encoder (fixtures / round-trip tests)

class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def bits(self, value: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.nbits = 0

    def flush(self) -> None:
        if self.nbits:
            self.bits((1 << (8 - self.nbits)) - 1, 8 - self.nbits)


def _category(v: int) -> int:
    return int(abs(v)).bit_length()


def _fixed_length_table(symbols: list[int]) -> tuple[list[int], bytes]:
    """Canonical table with every symbol at one fixed length L chosen so
    2^L > len(symbols) (the all-ones code stays unused, per Annex C)."""
    syms = sorted(set(symbols))
    length = max(2, (len(syms)).bit_length() + 1)
    counts = [0] * 16
    counts[length - 1] = len(syms)
    return counts, bytes(syms)


def encode_jpeg(
    pixels: bytes, width: int, height: int, channels: int = 3,
    quant: int = 1, subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """Baseline JPEG from interleaved u8 (1ch gray / 3ch RGB).
    ``quant=1`` = near-lossless (round-trip error <= ~2/channel from
    DCT float rounding); ``subsample`` = 4:2:0 chroma."""
    if channels not in (1, 3):
        raise JpegError("encoder takes 1 or 3 channels")
    arr = np.frombuffer(pixels, np.uint8).reshape(
        height, width, channels
    ).astype(np.float64)
    if channels == 3:
        r, g, b = arr[..., 0], arr[..., 1], arr[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128
        comps = [y, cb, cr]
        sampling = [(2, 2), (1, 1), (1, 1)] if subsample else \
            [(1, 1), (1, 1), (1, 1)]
    else:
        comps = [arr[..., 0]]
        sampling = [(1, 1)]
    hmax = max(s[0] for s in sampling)
    vmax = max(s[1] for s in sampling)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = -(-width // mcu_w)
    mcus_y = -(-height // mcu_h)
    qtable = np.full(64, quant, dtype=np.float64)

    # per-component padded planes (subsampled by box mean)
    planes = []
    for comp, (sh, sv) in zip(comps, sampling):
        ph, pw = mcus_y * sv * 8, mcus_x * sh * 8
        if (sh, sv) != (hmax, vmax):
            ry, rx = vmax // sv, hmax // sh
            ch2 = comp[: height - height % ry or None,
                       : width - width % rx or None]
            ch2 = ch2.reshape(
                ch2.shape[0] // ry, ry, ch2.shape[1] // rx, rx
            ).mean(axis=(1, 3))
            comp = ch2
        p = np.empty((ph, pw))
        ch, cw = comp.shape
        p[:ch, :cw] = comp
        p[ch:, :cw] = comp[ch - 1:ch, :]
        p[:, cw:] = p[:, cw - 1:cw]
        planes.append(p - 128)

    # pass 1: quantized coefficients per MCU (so the Huffman tables can
    # be derived from the actual symbol set)
    mcu_blocks: list[list[tuple[int, np.ndarray]]] = []
    pred = [0] * len(comps)
    dc_syms: list[int] = []
    ac_syms: list[int] = []
    coded: list[list[tuple]] = []
    mcu_i = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_i and \
                    mcu_i % restart_interval == 0:
                pred = [0] * len(comps)
            units = []
            for ci, (sh, sv) in enumerate(sampling):
                for by in range(sv):
                    for bx in range(sh):
                        y0 = (my * sv + by) * 8
                        x0 = (mx * sh + bx) * 8
                        blk = planes[ci][y0:y0 + 8, x0:x0 + 8]
                        # zz[i] = raster coeff at zigzag scan position i
                        zz = np.rint(
                            _dct2(blk).reshape(64)[_ZIGZAG] / qtable
                        ).astype(np.int64)
                        diff = int(zz[0]) - pred[ci]
                        pred[ci] = int(zz[0])
                        dsize = _category(diff)
                        dc_syms.append(dsize)
                        acs = []
                        run = 0
                        for k in range(1, 64):
                            v = int(zz[k])
                            if v == 0:
                                run += 1
                                continue
                            while run > 15:
                                acs.append((0xF0, 0, 0))
                                ac_syms.append(0xF0)
                                run -= 16
                            size = _category(v)
                            acs.append(((run << 4) | size, v, size))
                            ac_syms.append((run << 4) | size)
                            run = 0
                        if run:
                            acs.append((0x00, 0, 0))
                            ac_syms.append(0x00)
                        units.append((ci, diff, dsize, acs))
            coded.append(units)
            mcu_i += 1

    dc_counts, dc_symbols = _fixed_length_table(dc_syms or [0])
    ac_counts, ac_symbols = _fixed_length_table(ac_syms or [0])
    dc_tab = _HuffTable(dc_counts, dc_symbols)
    ac_tab = _HuffTable(ac_counts, ac_symbols)
    dc_codes = {s: (length, c) for (length, c), s in dc_tab.lookup.items()}
    ac_codes = {s: (length, c) for (length, c), s in ac_tab.lookup.items()}

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(
            2, "big"
        ) + payload

    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, bytes([0]) + bytes(
        qtable.astype(np.uint8)[_zigzag_identity()]
    ))
    sof = bytes([8]) + height.to_bytes(2, "big") + width.to_bytes(2, "big")
    sof += bytes([len(comps)])
    for ci, (sh, sv) in enumerate(sampling):
        sof += bytes([ci + 1, (sh << 4) | sv, 0])
    out += seg(0xC0, sof)
    out += seg(0xC4, bytes([0x00]) + bytes(dc_counts) + dc_symbols)
    out += seg(0xC4, bytes([0x10]) + bytes(ac_counts) + ac_symbols)
    if restart_interval:
        out += seg(0xDD, restart_interval.to_bytes(2, "big"))
    sos = bytes([len(comps)])
    for ci in range(len(comps)):
        sos += bytes([ci + 1, 0x00])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)

    writer = _BitWriter()
    rst = 0
    for mi, units in enumerate(coded):
        if restart_interval and mi and mi % restart_interval == 0:
            writer.flush()
            out += writer.out
            writer = _BitWriter()
            out += bytes([0xFF, 0xD0 + (rst & 7)])
            rst += 1
        for ci, diff, dsize, acs in units:
            length, code = dc_codes[dsize]
            writer.bits(code, length)
            if dsize:
                writer.bits(
                    diff if diff > 0 else diff + (1 << dsize) - 1, dsize
                )
            for sym, v, size in acs:
                length, code = ac_codes[sym]
                writer.bits(code, length)
                if size:
                    writer.bits(
                        v if v > 0 else v + (1 << size) - 1, size
                    )
    writer.flush()
    out += writer.out
    out += b"\xff\xd9"
    return bytes(out)


def _zigzag_identity() -> np.ndarray:
    """DQT stores the table in zigzag order; our flat table is constant
    so any permutation of it is itself — kept explicit for clarity."""
    return np.arange(64)
