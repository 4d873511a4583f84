"""Pure-Python LZ4-frame and MessagePack decoders (read-only).

The reference ships its golden trace fixtures as LZ4-frame-compressed
MessagePack blobs (indexer/tests/utils/trace_deserializer.py:254-264 reads
them with the ``lz4``/``msgpack`` pip packages).  Neither package is
available here, and both wire formats are small public specifications, so
this module implements just enough of each — decode only — to load those
fixtures for golden-parity tests:

* LZ4 frame format v1.6.x (https://github.com/lz4/lz4/blob/dev/doc/
  lz4_Frame_format.md) over the LZ4 block format (lz4_Block_format.md).
  Checksums (xxHash32) are skipped, not verified — fixtures are read-only
  test inputs, torn files surface as decode errors anyway.
* MessagePack spec (https://github.com/msgpack/msgpack/blob/master/
  spec.md), decode side only.  ext types are returned as
  ``(code, bytes)`` tuples; the fixtures don't use them.

Both are clean-room implementations from the published format documents.
"""

from __future__ import annotations

import struct

_LZ4_MAGIC = 0x184D2204


class FixtureCodecError(ValueError):
    pass


def lz4_block_decompress(
    src: bytes, max_out: int, out: bytearray | None = None
) -> bytes:
    """Decode one raw LZ4 block (sequences of literals + matches).

    When ``out`` is given, decoded bytes are appended to it and matches may
    reference bytes decoded by *previous* blocks — the frame format's
    linked-blocks mode (FLG block-independence bit unset).
    """
    if out is None:
        out = bytearray()
    base = len(out)
    i, n = 0, len(src)
    while i < n:
        token = src[i]
        i += 1
        # literals
        lit_len = token >> 4
        if lit_len == 15:
            while True:
                b = src[i]
                i += 1
                lit_len += b
                if b != 255:
                    break
        out += src[i : i + lit_len]
        i += lit_len
        if i >= n:
            break  # last sequence has no match part
        # match
        offset = src[i] | (src[i + 1] << 8)
        i += 2
        if offset == 0:
            raise FixtureCodecError("lz4: zero match offset")
        match_len = (token & 0x0F) + 4
        if (token & 0x0F) == 15:
            while True:
                b = src[i]
                i += 1
                match_len += b
                if b != 255:
                    break
        start = len(out) - offset
        if start < 0:
            raise FixtureCodecError("lz4: match offset before output start")
        # overlapping copy must proceed byte-ranges forward
        if offset >= match_len:
            out += out[start : start + match_len]
        else:
            for k in range(match_len):
                out.append(out[start + k])
        if len(out) - base > max_out:
            raise FixtureCodecError("lz4: output exceeds declared size")
    return bytes(out[base:])


def lz4_frame_decompress(data: bytes) -> bytes:
    """Decode an LZ4 frame (magic, descriptor, block stream, end mark)."""
    if len(data) < 7 or struct.unpack_from("<I", data)[0] != _LZ4_MAGIC:
        raise FixtureCodecError("lz4: bad magic")
    i = 4
    flg = data[i]
    bd = data[i + 1]
    i += 2
    if (flg >> 6) != 0b01:
        raise FixtureCodecError("lz4: unsupported frame version")
    block_checksum = bool(flg & 0x10)
    content_size: int | None = None
    if flg & 0x08:
        content_size = struct.unpack_from("<Q", data, i)[0]
        i += 8
    if flg & 0x01:  # dict id
        i += 4
    i += 1  # header checksum byte (not verified)
    bs_code = (bd >> 4) & 0x07
    if bs_code < 4:
        raise FixtureCodecError("lz4: reserved block max size")
    max_block = 1 << (8 + 2 * bs_code)  # 4:64KB 5:256KB 6:1MB 7:4MB
    out = bytearray()
    while True:
        size = struct.unpack_from("<I", data, i)[0]
        i += 4
        if size == 0:  # EndMark
            break
        uncompressed = bool(size & 0x80000000)
        size &= 0x7FFFFFFF
        block = data[i : i + size]
        i += size
        if block_checksum:
            i += 4
        if uncompressed:
            out += block
        else:
            lz4_block_decompress(block, max_block, out)
    if flg & 0x04:  # content checksum present (skipped, not verified)
        i += 4
    if content_size is not None and len(out) != content_size:
        raise FixtureCodecError(
            f"lz4: content size mismatch ({len(out)} != {content_size})"
        )
    return bytes(out)


def _unpack(data: bytes, i: int, str_errors: str = "strict"):
    """Decode one msgpack object at offset i → (value, next_offset)."""
    b = data[i]
    i += 1
    if b <= 0x7F:  # positive fixint
        return b, i
    if b >= 0xE0:  # negative fixint
        return b - 0x100, i
    if 0x80 <= b <= 0x8F:  # fixmap
        return _unpack_map(data, i, b & 0x0F, str_errors)
    if 0x90 <= b <= 0x9F:  # fixarray
        return _unpack_array(data, i, b & 0x0F, str_errors)
    if 0xA0 <= b <= 0xBF:  # fixstr
        n = b & 0x1F
        return data[i : i + n].decode("utf-8", str_errors), i + n
    if b == 0xC0:
        return None, i
    if b == 0xC2:
        return False, i
    if b == 0xC3:
        return True, i
    if b in (0xC4, 0xC5, 0xC6):  # bin 8/16/32
        w = 1 << (b - 0xC4)
        n = int.from_bytes(data[i : i + w], "big")
        i += w
        return data[i : i + n], i + n
    if b in (0xC7, 0xC8, 0xC9):  # ext 8/16/32
        w = 1 << (b - 0xC7)
        n = int.from_bytes(data[i : i + w], "big")
        i += w
        code = struct.unpack_from("b", data, i)[0]
        i += 1
        return (code, data[i : i + n]), i + n
    if b == 0xCA:
        return struct.unpack_from(">f", data, i)[0], i + 4
    if b == 0xCB:
        return struct.unpack_from(">d", data, i)[0], i + 8
    if b in (0xCC, 0xCD, 0xCE, 0xCF):  # uint 8/16/32/64
        w = 1 << (b - 0xCC)
        return int.from_bytes(data[i : i + w], "big"), i + w
    if b in (0xD0, 0xD1, 0xD2, 0xD3):  # int 8/16/32/64
        w = 1 << (b - 0xD0)
        return int.from_bytes(data[i : i + w], "big", signed=True), i + w
    if 0xD4 <= b <= 0xD8:  # fixext 1/2/4/8/16
        n = 1 << (b - 0xD4)
        code = struct.unpack_from("b", data, i)[0]
        i += 1
        return (code, data[i : i + n]), i + n
    if b in (0xD9, 0xDA, 0xDB):  # str 8/16/32
        w = 1 << (b - 0xD9)
        n = int.from_bytes(data[i : i + w], "big")
        i += w
        return data[i : i + n].decode("utf-8", str_errors), i + n
    if b in (0xDC, 0xDD):  # array 16/32
        w = 2 << (b - 0xDC)
        n = int.from_bytes(data[i : i + w], "big")
        return _unpack_array(data, i + w, n, str_errors)
    if b in (0xDE, 0xDF):  # map 16/32
        w = 2 << (b - 0xDE)
        n = int.from_bytes(data[i : i + w], "big")
        return _unpack_map(data, i + w, n, str_errors)
    raise FixtureCodecError(f"msgpack: unknown type byte 0x{b:02x}")


def _unpack_array(data, i, n, str_errors):
    out = []
    for _ in range(n):
        v, i = _unpack(data, i, str_errors)
        out.append(v)
    return out, i


def _unpack_map(data, i, n, str_errors):
    out = {}
    for _ in range(n):
        k, i = _unpack(data, i, str_errors)
        v, i = _unpack(data, i, str_errors)
        out[k] = v
    return out, i


def msgpack_loads(data: bytes, str_errors: str = "strict"):
    v, i = _unpack(data, 0, str_errors)
    if i != len(data):
        raise FixtureCodecError(f"msgpack: {len(data) - i} trailing bytes")
    return v


def load_lz4_msgpack(path) -> object:
    with open(path, "rb") as f:
        raw = f.read()
    return msgpack_loads(lz4_frame_decompress(raw))
