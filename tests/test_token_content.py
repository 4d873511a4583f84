"""TEP-64 token-content parsing (functions/boc.py::parse_token_data) —
clean-room parity with the reference worker's parse_token_data.cpp,
exercised over hand-built FullContent cells (offchain snake URI, onchain
sha256-keyed dicts, chunked data, inline non-standard values)."""

from __future__ import annotations

import base64
import hashlib

import pytest

from ton_indexer_spark.functions.boc import (
    BocError,
    Builder,
    Cell,
    parse_token_data,
    serialize_boc,
)


def _attr_key(name: str) -> int:
    return int.from_bytes(hashlib.sha256(name.encode()).digest(), "big")


def _hm_edge(n: int, items: list[tuple[int, Cell]]) -> Cell:
    """Minimal Hashmap serializer (hml_long labels only) — leaf value is
    stored as the standard single ref."""
    assert items
    if len(items) == 1:
        l = n
    else:
        l = 0
        while l < n and len(
            {(k >> (n - 1 - l)) & 1 for k, _ in items}
        ) == 1:
            l += 1
    prefix = (items[0][0] >> (n - l)) if l else 0
    m = n - l
    rem = [(k & ((1 << m) - 1) if m else 0, v) for k, v in items]
    b = Builder().store_uint(2, 2)  # hml_long$10
    b.store_uint(l, n.bit_length())
    if l:
        b.store_uint(prefix, l)
    if m == 0:
        b.store_ref(rem[0][1])
        return b.end_cell()
    sub = (1 << (m - 1)) - 1
    left = [(k & sub, v) for k, v in rem if ((k >> (m - 1)) & 1) == 0]
    right = [(k & sub, v) for k, v in rem if ((k >> (m - 1)) & 1) == 1]
    b.store_ref(_hm_edge(m - 1, left))
    b.store_ref(_hm_edge(m - 1, right))
    return b.end_cell()


def _onchain(entries: dict[str, Cell]) -> bytes:
    root = _hm_edge(
        256, sorted((_attr_key(a), c) for a, c in entries.items())
    )
    cell = Builder().store_uint(0, 8).store_bit(1).store_ref(root).end_cell()
    return serialize_boc(cell)


def _snake_content(text_or_bytes) -> Cell:
    b = Builder().store_uint(0, 8)
    if isinstance(text_or_bytes, bytes):
        b.store_bytes(text_or_bytes)
        return b.end_cell()
    return b.store_snake_string(text_or_bytes).end_cell()


def test_offchain_uri():
    uri = "https://example.org/jetton-metadata.json"
    boc = serialize_boc(
        Builder().store_uint(1, 8).store_snake_string(uri).end_cell()
    )
    assert parse_token_data(boc) == {"uri": uri}


def test_offchain_long_uri_crosses_cells():
    uri = "ipfs://" + "Q" * 400  # forces the snake ref chain
    boc = serialize_boc(
        Builder().store_uint(1, 8).store_snake_string(uri).end_cell()
    )
    assert parse_token_data(boc) == {"uri": uri}


def test_onchain_standard_attributes():
    boc = _onchain(
        {
            "name": _snake_content("Toncoin"),
            "symbol": _snake_content("TON"),
            "decimals": _snake_content("9"),
            "description": _snake_content("The canonical jetton " * 20),
        }
    )
    got = parse_token_data(boc)
    assert got == {
        "name": "Toncoin",
        "symbol": "TON",
        "decimals": "9",
        "description": "The canonical jetton " * 20,
    }


def test_onchain_image_data_base64_and_unknown_keys_ignored():
    png = bytes(range(64))
    entries = [
        (_attr_key("image_data"), _snake_content(png)),
        (12345, _snake_content("not-a-standard-attr")),  # ignored
    ]
    root = _hm_edge(256, sorted(entries))
    boc = serialize_boc(
        Builder().store_uint(0, 8).store_bit(1).store_ref(root).end_cell()
    )
    got = parse_token_data(boc)
    assert got == {"image_data": base64.b64encode(png).decode()}


def test_onchain_chunked_value():
    part0, part1 = b"A" * 32, b"B" * 16
    chunks_root = _hm_edge(
        32,
        [
            (0, Builder().store_bytes(part0).end_cell()),
            (1, Builder().store_bytes(part1).end_cell()),
        ],
    )
    chunked = (
        Builder().store_uint(1, 8).store_bit(1).store_ref(chunks_root)
        .end_cell()
    )
    boc = _onchain({"name": chunked})
    assert parse_token_data(boc) == {"name": (part0 + part1).decode()}


def test_onchain_inline_value_nonstandard():
    """Some contracts store ContentData inline instead of behind a ref
    (parse_token_data.cpp:120-126) — both must parse."""
    # leaf with the ContentData bits placed directly after the label
    key = _attr_key("symbol")
    leaf = (
        Builder().store_uint(2, 2).store_uint(256, 9)
        .store_uint(key, 256).store_uint(0, 8)  # snake tag inline
    )
    for ch in "USD":
        leaf.store_uint(ord(ch), 8)
    root = leaf.end_cell()
    boc = serialize_boc(
        Builder().store_uint(0, 8).store_bit(1).store_ref(root).end_cell()
    )
    assert parse_token_data(boc) == {"symbol": "USD"}


def test_empty_onchain_dict():
    boc = serialize_boc(
        Builder().store_uint(0, 8).store_bit(0).end_cell()
    )
    assert parse_token_data(boc) == {}


def test_invalid_utf8_attribute_skipped_image_data_kept():
    bad = b"\xff\xfe\xfd\xfc"
    boc = _onchain(
        {"name": _snake_content(bad), "image_data": _snake_content(bad)}
    )
    got = parse_token_data(boc)
    assert got == {"image_data": base64.b64encode(bad).decode()}


def test_unknown_fullcontent_tag_raises():
    boc = serialize_boc(Builder().store_uint(7, 8).end_cell())
    with pytest.raises(BocError):
        parse_token_data(boc)


def test_decode_token_content_spark_stage(spark):
    """The Arrow-batch decode stage: onchain rows hydrate attributes,
    offchain rows surface content_uri for the fetch queue, junk rows
    mark valid=False."""
    from ton_indexer_spark.sources.metadata import decode_token_content

    onchain = base64.b64encode(
        _onchain({"name": _snake_content("Tok"),
                  "symbol": _snake_content("TK")})
    ).decode()
    offchain = base64.b64encode(
        serialize_boc(
            Builder().store_uint(1, 8)
            .store_snake_string("https://x.test/m.json").end_cell()
        )
    ).decode()
    df = spark.createDataFrame(
        [
            ("0:aa", "jetton_masters", onchain),
            ("0:bb", "nft_collections", offchain),
            ("0:cc", "jetton_masters", "not-a-boc"),
        ],
        "address string, type string, content_boc string",
    )
    got = {r["address"]: r.asDict() for r in
           decode_token_content(df).collect()}
    assert got["0:aa"]["valid"] and got["0:aa"]["name"] == "Tok"
    assert got["0:aa"]["symbol"] == "TK" and got["0:aa"]["content_uri"] is None
    assert got["0:bb"]["valid"]
    assert got["0:bb"]["content_uri"] == "https://x.test/m.json"
    assert got["0:cc"]["valid"] is False


def test_decoded_uri_feeds_fetch_queue(spark):
    """decode → metadata_fetch_tasks composes: only offchain rows with a
    uri enter the queue."""
    from ton_indexer_spark.sources.metadata import (
        decode_token_content,
        metadata_fetch_tasks,
    )

    offchain = base64.b64encode(
        serialize_boc(
            Builder().store_uint(1, 8)
            .store_snake_string("ipfs://hash").end_cell()
        )
    ).decode()
    onchain = base64.b64encode(
        _onchain({"name": _snake_content("X")})
    ).decode()
    df = spark.createDataFrame(
        [("0:aa", "jetton_masters", offchain),
         ("0:bb", "jetton_masters", onchain)],
        "address string, type string, content_boc string",
    )
    tasks = metadata_fetch_tasks(decode_token_content(df)).collect()
    assert [(r["address"], r["content_uri"]) for r in tasks] == [
        ("0:aa", "ipfs://hash")
    ]


def test_onchain_chunked_refless_key_skipped_not_terminator():
    """A PRESENT key whose value slice lacks the standard chunk ref is
    SKIPPED and the walk continues to the next consecutive key — the
    reference loops while uint_key_exists(c) and appends only when
    lookup_ref(c) is non-null (parse_token_data.cpp:42-54), so keys
    {0: data, 1: <no ref>, 2: data} decode to chunk0+chunk2, not
    chunk0 alone."""
    def edge(n, items):
        # _hm_edge variant where a None value stores an EMPTY leaf
        # (key exists, no value ref — the non-conforming shape)
        assert items
        if len(items) == 1:
            l = n
        else:
            l = 0
            while l < n and len(
                {(k >> (n - 1 - l)) & 1 for k, _ in items}
            ) == 1:
                l += 1
        prefix = (items[0][0] >> (n - l)) if l else 0
        m = n - l
        rem = [(k & ((1 << m) - 1) if m else 0, v) for k, v in items]
        b = Builder().store_uint(2, 2)
        b.store_uint(l, n.bit_length())
        if l:
            b.store_uint(prefix, l)
        if m == 0:
            if rem[0][1] is not None:
                b.store_ref(rem[0][1])
            return b.end_cell()
        sub = (1 << (m - 1)) - 1
        left = [(k & sub, v) for k, v in rem if ((k >> (m - 1)) & 1) == 0]
        right = [(k & sub, v) for k, v in rem if ((k >> (m - 1)) & 1) == 1]
        b.store_ref(edge(m - 1, left))
        b.store_ref(edge(m - 1, right))
        return b.end_cell()

    part0, part2 = b"A" * 8, b"C" * 8
    chunks_root = edge(32, [
        (0, Builder().store_bytes(part0).end_cell()),
        (1, None),  # present key, no ref
        (2, Builder().store_bytes(part2).end_cell()),
    ])
    chunked = (
        Builder().store_uint(1, 8).store_bit(1).store_ref(chunks_root)
        .end_cell()
    )
    boc = _onchain({"name": chunked})
    assert parse_token_data(boc) == {"name": (part0 + part2).decode()}
