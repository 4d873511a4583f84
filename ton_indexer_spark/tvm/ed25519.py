"""Clean-room Ed25519 signature VERIFICATION (RFC 8032 §5.1).

Implements exactly the subset the TVM's CHKSIGNU / CHKSIGNS opcodes
need — `verify(message, signature, public_key) -> bool` — from the
published RFC 8032 specification, using only stdlib big integers (the
same pure-python-primitive pattern as :mod:`ton_indexer_spark.tvm.
keccak`).  No key generation, no signing.

The group equation checked is the RFC's cofactorless form

    [S]B == R + [k]A,   k = SHA-512(R || A || M) mod L

which is what the widely-deployed verifiers (and therefore the chain's
accepted signatures) satisfy.  All inputs that fail to decode — a
non-canonical S (>= L), an off-curve or non-canonical A or R — return
False rather than raising: the TVM surface is a boolean.

Arithmetic: points are kept in extended homogeneous coordinates
(X, Y, Z, T) with the RFC 8032 §5.1.4 complete addition formulas, so
doubling and addition share one code path and there are no exceptional
cases.  Scalar multiplication is plain MSB-first double-and-add — this
is a verifier for replaying already-public signatures, not a signer, so
side-channel hardening is irrelevant and clarity wins.

Reference behavior matched: the reference's emulator delegates to the
C++ TVM, which verifies external-message signatures with standard
Ed25519 (ton-emulate-go/main.go feeds the message into the real
emulator; wallet recv_external code executes CHKSIGNU).
"""

from __future__ import annotations

import hashlib

__all__ = ["verify"]

# ----------------------------------------------------- field / curve params

_P = 2**255 - 19
_L = 2**252 + 27742317777372353535851937790883648493
# d = -121665/121666 mod p
_D = (-121665 * pow(121666, _P - 2, _P)) % _P

# base point B: y = 4/5, x recovered with the even-x convention → the
# RFC fixes B by its published coordinates; recover below at import.
_SQRT_M1 = pow(2, (_P - 1) // 4, _P)  # sqrt(-1) mod p


def _recover_x(y: int, sign: int) -> int | None:
    """Solve x^2 = (y^2 - 1) / (d y^2 + 1) mod p; pick the root with the
    requested low bit.  None if y is not on the curve."""
    if y >= _P:
        return None
    u = (y * y - 1) % _P
    v = (_D * y * y + 1) % _P
    # candidate root: x = u * v^3 * (u * v^7)^((p-5)/8)   (RFC 8032 §5.1.3)
    x = (u * pow(v, 3, _P)
         * pow(u * pow(v, 7, _P) % _P, (_P - 5) // 8, _P)) % _P
    vxx = v * x * x % _P
    if vxx == u % _P:
        pass
    elif vxx == (-u) % _P:
        x = x * _SQRT_M1 % _P
    else:
        return None
    if x == 0 and sign == 1:
        return None  # the RFC rejects x=0 with the odd sign bit
    if x & 1 != sign:
        x = _P - x
    return x


_BY = 4 * pow(5, _P - 2, _P) % _P
_BX = _recover_x(_BY, 0)
assert _BX is not None

# extended homogeneous coordinates (X, Y, Z, T) with x=X/Z, y=Y/Z, T=XY/Z
_B = (_BX, _BY, 1, _BX * _BY % _P)
_IDENT = (0, 1, 1, 0)


def _add(p, q):
    """Complete twisted-Edwards addition (RFC 8032 §5.1.4)."""
    x1, y1, z1, t1 = p
    x2, y2, z2, t2 = q
    a = (y1 - x1) * (y2 - x2) % _P
    b = (y1 + x1) * (y2 + x2) % _P
    c = 2 * t1 * t2 * _D % _P
    d = 2 * z1 * z2 % _P
    e, f, g, h = b - a, d - c, d + c, b + a
    return (e * f % _P, g * h % _P, f * g % _P, e * h % _P)


def _mul(s: int, p):
    """MSB-first double-and-add scalar multiplication."""
    acc = _IDENT
    for i in range(s.bit_length() - 1, -1, -1):
        acc = _add(acc, acc)
        if (s >> i) & 1:
            acc = _add(acc, p)
    return acc


def _decompress(b: bytes):
    """32-byte little-endian compressed point -> extended coords or None."""
    y = int.from_bytes(b, "little")
    sign = (y >> 255) & 1
    y &= (1 << 255) - 1
    x = _recover_x(y, sign)
    if x is None:
        return None
    return (x, y, 1, x * y % _P)


def _equal(p, q) -> bool:
    """Projective equality: X1 Z2 == X2 Z1 and Y1 Z2 == Y2 Z1."""
    x1, y1, z1, _ = p
    x2, y2, z2, _ = q
    return ((x1 * z2 - x2 * z1) % _P == 0
            and (y1 * z2 - y2 * z1) % _P == 0)


def verify(message: bytes, signature: bytes, public_key: bytes) -> bool:
    """RFC 8032 §5.1.7 verification: [S]B == R + [k]A."""
    if len(signature) != 64 or len(public_key) != 32:
        return False
    a = _decompress(public_key)
    if a is None:
        return False
    r = _decompress(signature[:32])
    if r is None:
        return False
    s = int.from_bytes(signature[32:], "little")
    if s >= _L:
        return False
    k = int.from_bytes(
        hashlib.sha512(signature[:32] + public_key + message).digest(),
        "little") % _L
    return _equal(_mul(s, _B), _add(r, _mul(k, a)))
