"""HashmapE point lookup for the TVM dictionary primitives.

The TVM's dictionary instructions (DICTGET / DICTIGETJMPZ / ...) operate
on the standard ``HashmapE n X`` TL-B type (hashmap.tlb in the published
block schema): an optional root cell whose nodes carry *labels* in one of
three encodings —

    hml_short$0  {m:#} len:(Unary ~n) s:(n * Bit)
    hml_long$10  {m:#} n:(#<= m)      s:(n * Bit)
    hml_same$11  {m:#} v:Bit n:(#<= m)

— and fork into two refs (left = next bit 0, right = 1) until the key is
exhausted, at which point the remainder of the node is the value slice.

This module implements the read side only (point lookup + min/max/next
walks are not needed by the get-method subset).  The engine's FunC-style
method dispatch (``DICTPUSHCONST 19`` + ``DICTIGETJMPZ``) resolves method
ids through :func:`dict_get`.

Reference behavior being matched: the reference runs real TVM dictionary
lookups inside get-method execution (ton-index-worker/tondb-scanner/src/
smc-interfaces/Tokens.cpp, execute-smc.cpp); the cell walk itself follows
the public TL-B spec, not any reference code.
"""

from __future__ import annotations

from ton_indexer_spark.functions.boc import Cell, Slice


class DictError(ValueError):
    """Malformed dictionary cell (TVM exception 10)."""


def _load_label(s: Slice, m: int) -> tuple[int, list[int]]:
    """Read an hml label; return (n_bits, bits list). m = max label len."""
    mlen = m.bit_length()  # bits needed to store a value in 0..m
    if s.load_bit() == 0:  # hml_short: unary length then bits
        n = 0
        while s.load_bit():
            n += 1
        if n > m:
            raise DictError("short label longer than remaining key")
        return n, [s.load_bit() for _ in range(n)]
    if s.load_bit() == 0:  # hml_long
        n = s.load_uint(mlen) if mlen else 0
        if n > m:
            raise DictError("long label longer than remaining key")
        return n, [s.load_bit() for _ in range(n)]
    # hml_same
    v = s.load_bit()
    n = s.load_uint(mlen) if mlen else 0
    if n > m:
        raise DictError("same label longer than remaining key")
    return n, [v] * n


def dict_get(root: Cell | None, key_bits: list[int]) -> Slice | None:
    """Look up an exact key (list of 0/1, len = dict key width).

    Returns the value slice (positioned after the label) or None.
    """
    if root is None:
        return None
    node = root
    remaining = list(key_bits)
    while True:
        s = node.begin_parse()
        n, label = _load_label(s, len(remaining))
        if label != remaining[: n]:
            return None
        remaining = remaining[n:]
        if not remaining:
            return s
        if s.remaining_refs < 2:
            raise DictError("fork node missing children")
        left, right = s.load_ref(), s.load_ref()
        node = left if remaining[0] == 0 else right
        remaining = remaining[1:]


def int_key_bits(key: int, n: int, signed: bool) -> list[int] | None:
    """Encode an integer dict key as its n-bit big-endian bit list.

    Returns None when the key does not fit (TVM treats that as a miss
    for the *get* primitives rather than an exception).
    """
    if signed:
        if not (-(1 << (n - 1)) <= key < (1 << (n - 1)) if n else key == 0):
            return None
        key &= (1 << n) - 1
    else:
        if key < 0 or key >= (1 << n):
            return None
    return [(key >> (n - 1 - i)) & 1 for i in range(n)]


def slice_key_bits(s: Slice, n: int) -> list[int] | None:
    """First n bits of a slice as the key (DICTGET's slice-key form)."""
    if s.remaining_bits < n:
        return None
    pos = s._pos
    bits = []
    for i in range(n):
        byte = s._data[(pos + i) // 8]
        bits.append((byte >> (7 - (pos + i) % 8)) & 1)
    return bits


def dict_keys(root: Cell | None, n: int) -> list[list[int]]:
    """All keys of a HashmapE as bit lists, in ascending bit order."""
    out: list[list[int]] = []
    if root is None:
        return out

    def walk(node: Cell, prefix: list[int], rem: int) -> None:
        s = node.begin_parse()
        ln, label = _load_label(s, rem)
        prefix = prefix + label
        rem -= ln
        if rem == 0:
            out.append(prefix)
            return
        if s.remaining_refs < 2:
            raise DictError("fork node missing children")
        left, right = s.load_ref(), s.load_ref()
        walk(left, prefix + [0], rem - 1)
        walk(right, prefix + [1], rem - 1)

    walk(root, [], n)
    return out


def dict_get_next(
    root: Cell | None,
    n: int,
    pivot: int,
    *,
    signed: bool,
    backward: bool = False,
    allow_eq: bool = False,
) -> tuple[int, Slice] | None:
    """DICT[IU]GETNEXT/PREV[EQ]: nearest key after (before) the pivot.

    The pivot may lie outside the n-bit range (the published semantics —
    e.g. pivot -1 on an unsigned dict yields the minimum).  Enumerates
    keys via :func:`dict_keys`; contract-held dictionaries on the
    get-method path are small (method tables, asset lists), so the walk
    is bounded — callers needing huge-dict iteration should lift to a
    relational plan instead.
    """
    if root is None:
        return None
    best: int | None = None
    for bits in dict_keys(root, n):
        v = int("".join(map(str, bits)) or "0", 2)
        if signed and n and bits[0] == 1:
            v -= 1 << n
        if backward:
            ok = v <= pivot if allow_eq else v < pivot
            better = best is None or v > best
        else:
            ok = v >= pivot if allow_eq else v > pivot
            better = best is None or v < best
        if ok and better:
            best = v
    if best is None:
        return None
    kb = int_key_bits(best, n, signed)
    val = dict_get(root, kb)
    assert val is not None
    return best, val
