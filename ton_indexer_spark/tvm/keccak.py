"""Original-padding Keccak (pre-SHA3) for the TVM HASHEXT hash ids 3/4.

The TVM's KECCAK256/KECCAK512 use Keccak with the ORIGINAL 0x01 domain
padding (the Ethereum convention), which the Python stdlib does not
ship (hashlib's sha3_* applies the final 0x06 domain byte).  This is a
clean-room implementation of the published Keccak-f[1600] permutation
(keccak.team reference spec): the round constants and rotation offsets
are GENERATED from the spec's LFSR / pi-rho schedules rather than
transcribed tables, so there is nothing to mis-copy.

Pinned against the universally published vector
keccak256(b"") = c5d2460186f7233c...45d85a456 in tests/test_tvm.py.
"""

from __future__ import annotations

_MASK = (1 << 64) - 1


def _rc_constants() -> list[int]:
    """The 24 round constants via the spec's rc(t) LFSR over GF(2)."""
    out = []
    r = 1
    for _ in range(24):
        rc = 0
        for j in range(7):
            r = ((r << 1) ^ ((r >> 7) * 0x71)) & 0xFF
            if r & 2:
                rc ^= 1 << ((1 << j) - 1)
        out.append(rc)
    return out


def _rho_offsets() -> list[list[int]]:
    """Rotation offsets from the spec's (x,y) -> (y, 2x+3y) walk."""
    r = [[0] * 5 for _ in range(5)]
    x, y = 1, 0
    for t in range(24):
        r[x][y] = ((t + 1) * (t + 2) // 2) % 64
        x, y = y, (2 * x + 3 * y) % 5
    return r


_RC = _rc_constants()
_R = _rho_offsets()


def _rotl(v: int, n: int) -> int:
    n %= 64
    return ((v << n) | (v >> (64 - n))) & _MASK


def _keccak_f(a: list[list[int]]) -> None:
    for rnd in range(24):
        # theta
        c = [a[x][0] ^ a[x][1] ^ a[x][2] ^ a[x][3] ^ a[x][4]
             for x in range(5)]
        d = [c[(x - 1) % 5] ^ _rotl(c[(x + 1) % 5], 1) for x in range(5)]
        for x in range(5):
            for y in range(5):
                a[x][y] ^= d[x]
        # rho + pi
        b = [[0] * 5 for _ in range(5)]
        for x in range(5):
            for y in range(5):
                b[y][(2 * x + 3 * y) % 5] = _rotl(a[x][y], _R[x][y])
        # chi
        for x in range(5):
            for y in range(5):
                a[x][y] = b[x][y] ^ ((~b[(x + 1) % 5][y]) & _MASK
                                     & b[(x + 2) % 5][y])
        # iota
        a[0][0] ^= _RC[rnd]


def keccak(data: bytes, out_bits: int) -> bytes:
    """Keccak-256/512 with original 0x01 padding."""
    rate = 200 - 2 * (out_bits // 8)
    # multi-rate padding: 0x01 then zeros then 0x80 (may coincide)
    padded = bytearray(data)
    pad_len = rate - (len(padded) % rate)
    padded += b"\x01" + b"\x00" * (pad_len - 2) + b"\x80" if pad_len >= 2 \
        else b"\x81"
    a = [[0] * 5 for _ in range(5)]
    for off in range(0, len(padded), rate):
        block = padded[off:off + rate]
        for i in range(rate // 8):
            lane = int.from_bytes(block[8 * i:8 * i + 8], "little")
            a[i % 5][i // 5] ^= lane
        _keccak_f(a)
    # one squeeze suffices: out_bits (256/512) < rate bits (1088/576)
    out = bytearray()
    for i in range(rate // 8):
        out += a[i % 5][i // 5].to_bytes(8, "little")
        if len(out) >= out_bits // 8:
            break
    return bytes(out[: out_bits // 8])


def keccak256(data: bytes) -> bytes:
    return keccak(data, 256)


def keccak512(data: bytes) -> bytes:
    return keccak(data, 512)
