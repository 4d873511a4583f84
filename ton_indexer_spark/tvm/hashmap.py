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


def _store_label(b, label: list[int], m: int) -> None:
    """Write the canonical (min-cost, short-wins-ties) hml encoding.

    Tie-breaking verified EMPIRICALLY against 9 real compiler-built
    method dicts from the golden traces (103 labels): on every cost tie
    between hml_short and hml_long (23 observed cases) the real
    serializer emitted hml_short, and it never emitted hml_same when a
    cheaper-or-equal alternative existed (9 observed short-beats-same
    cases).  Preferring short on ties makes DICTSET-rebuilt dicts
    hash-identical to chain-built ones (see
    tests/test_tvm.py::test_dict_rebuild_matches_chain_hash).
    """
    mlen = m.bit_length()
    n = len(label)
    same = n > 1 and all(x == label[0] for x in label)
    cost_short = 1 + (n + 1) + n
    cost_long = 2 + mlen + n
    cost_same = 3 + mlen if same else 1 << 30
    best = min(cost_short, cost_long, cost_same)
    if cost_short == best:  # short wins all ties (empirical canon)
        b.store_bit(0)
        for _ in range(n):
            b.store_bit(1)
        b.store_bit(0)
        for bit in label:
            b.store_bit(bit)
    elif cost_same == best:
        b.store_uint(3, 2).store_bit(label[0])
        b.store_uint(n, mlen)
    else:
        b.store_uint(2, 2)
        b.store_uint(n, mlen)
        for bit in label:
            b.store_bit(bit)


def _slice_remainder_into(b, s: Slice) -> None:
    sc = Slice(Cell(s._data, s._bits, list(s._refs)))
    sc._pos, sc._ref_pos = s._pos, s._ref_pos
    while sc.remaining_bits:
        b.store_bit(sc.load_bit())
    while sc.remaining_refs:
        b.store_ref(sc.load_ref())


def dict_set(root: Cell | None, key_bits: list[int], value: Slice) -> Cell:
    """Insert/replace one key in a HashmapE; returns the new root.

    Pure-functional (builds new nodes along the path; shares untouched
    subtrees), matching the TVM DICTSET primitives' semantics."""
    from ton_indexer_spark.functions.boc import Builder

    def leaf(remaining: list[int], m: int) -> Cell:
        b = Builder()
        _store_label(b, remaining, m)
        _slice_remainder_into(b, value)
        return b.end_cell()

    def insert(node: Cell | None, key: list[int], m: int) -> Cell:
        if node is None:
            return leaf(key, m)
        s = node.begin_parse()
        n, label = _load_label(s, m)
        common = 0
        while common < n and common < len(key) and \
                label[common] == key[common]:
            common += 1
        if common == n:
            if n == len(key):  # exact node: replace value
                return leaf(key, m)
            # descend into the fork
            if s.remaining_refs < 2:
                raise DictError("fork node missing children")
            left, right = s.load_ref(), s.load_ref()
            branch = key[n]
            child_m = m - n - 1
            new_child = insert(right if branch else left,
                               key[n + 1:], child_m)
            b = Builder()
            _store_label(b, label, m)
            if branch == 0:
                b.store_ref(new_child).store_ref(right)
            else:
                b.store_ref(left).store_ref(new_child)
            return b.end_cell()
        # split: common prefix, then a new fork
        child_m = m - common - 1
        old_branch = label[common]
        # old node re-labeled below the fork
        b_old = Builder()
        _store_label(b_old, label[common + 1:], child_m)
        _slice_remainder_into(b_old, s)
        old_cell = b_old.end_cell()
        new_cell = leaf(key[common + 1:], child_m)
        b = Builder()
        _store_label(b, label[:common], m)
        if old_branch == 0:
            b.store_ref(old_cell).store_ref(new_cell)
        else:
            b.store_ref(new_cell).store_ref(old_cell)
        return b.end_cell()

    return insert(root, list(key_bits), len(key_bits))


def dict_min_max(root: Cell | None, n: int, *, maximize: bool,
                 signed: bool = False) -> tuple[list[int], Slice] | None:
    """Smallest/largest key (bit order; sign-aware when signed) + value."""
    if root is None:
        return None
    best_bits = None
    best_v = None
    for bits in dict_keys(root, n):
        v = int("".join(map(str, bits)) or "0", 2)
        if signed and n and bits[0] == 1:
            v -= 1 << n
        if best_v is None or (v > best_v if maximize else v < best_v):
            best_v, best_bits = v, bits
    val = dict_get(root, best_bits)
    assert val is not None
    return best_bits, val


def dict_delete(root: Cell | None, key_bits: list[int]) -> \
        tuple[Cell | None, bool]:
    """Remove one key; returns (new_root, found).  When a fork loses a
    child, the sibling merges upward (label = fork label + branch bit +
    sibling label), keeping the hashmap invariant."""
    from ton_indexer_spark.functions.boc import Builder

    def relabel(node: Cell, prefix: list[int], m: int) -> Cell:
        s = node.begin_parse()
        ln, label = _load_label(s, m - len(prefix))
        b = Builder()
        _store_label(b, prefix + label, m)
        _slice_remainder_into(b, s)
        return b.end_cell()

    def remove(node: Cell, key: list[int], m: int) -> \
            tuple[Cell | None, bool]:
        s = node.begin_parse()
        n_lab, label = _load_label(s, m)
        if label != key[: n_lab]:
            return node, False
        rest = key[n_lab:]
        if not rest:
            return None, True  # this leaf goes away entirely
        if s.remaining_refs < 2:
            raise DictError("fork node missing children")
        left, right = s.load_ref(), s.load_ref()
        branch = rest[0]
        child = right if branch else left
        child_m = m - n_lab - 1
        new_child, found = remove(child, rest[1:], child_m)
        if not found:
            return node, False
        if new_child is None:
            # fork collapses: sibling absorbs label + inverted branch bit
            sibling = left if branch else right
            return relabel(sibling, label + [1 - branch], m), True
        b = Builder()
        _store_label(b, label, m)
        if branch == 0:
            b.store_ref(new_child).store_ref(right)
        else:
            b.store_ref(left).store_ref(new_child)
        return b.end_cell(), True

    if root is None:
        return None, False
    return remove(root, list(key_bits), len(key_bits))
