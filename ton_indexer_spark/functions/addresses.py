"""TON address format conversion (SURVEY.md §2.9 F3).

Raw form: ``<workchain>:<64-hex>``.  User-friendly form: base64url of
36 bytes = tag(0x11 bounceable / 0x51 non-bounceable) ‖ workchain ‖
account_id(32) ‖ crc16-xmodem(2) — the public TEP-2 address format
(mirrors ton-index-go/index/models/convert.go semantics; implemented from
the spec, not the Go code).

Exposed both as plain Python (for the classifier/UDF layer and tests) and
as pandas UDFs (Arrow-vectorized — the F3 'deterministic scalar UDF' path).
"""

from __future__ import annotations

import base64

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

BOUNCEABLE = 0x11
NON_BOUNCEABLE = 0x51
TESTNET_FLAG = 0x80


def crc16_xmodem(data: bytes) -> int:
    """CRC-16/XMODEM (poly 0x1021, init 0)."""
    crc = 0
    for byte in data:
        crc ^= byte << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x1021) if crc & 0x8000 else (crc << 1)
            crc &= 0xFFFF
    return crc


def raw_to_friendly(raw: str | None, bounceable: bool = True,
                    testnet: bool = False) -> str | None:
    if raw is None:
        return None
    try:
        wc_str, hex_part = raw.split(":")
        wc = int(wc_str)
        account = bytes.fromhex(hex_part)
        if len(account) != 32:
            return None
    except ValueError:
        return None
    tag = BOUNCEABLE if bounceable else NON_BOUNCEABLE
    if testnet:
        tag |= TESTNET_FLAG
    payload = bytes([tag, wc & 0xFF]) + account
    crc = crc16_xmodem(payload)
    return base64.urlsafe_b64encode(payload + crc.to_bytes(2, "big")).decode()


def friendly_to_raw(friendly: str | None) -> str | None:
    if friendly is None:
        return None
    try:
        data = base64.urlsafe_b64decode(friendly)
    except Exception:
        return None
    if len(data) != 36:
        return None
    payload, crc = data[:34], int.from_bytes(data[34:], "big")
    if crc16_xmodem(payload) != crc:
        return None
    wc = int.from_bytes(payload[1:2], "big", signed=True)
    return f"{wc}:{payload[2:].hex()}"


@F.pandas_udf(T.StringType())
def to_friendly(raw: pd.Series) -> pd.Series:
    return raw.map(lambda r: raw_to_friendly(r))


@F.pandas_udf(T.StringType())
def to_raw(friendly: pd.Series) -> pd.Series:
    return friendly.map(friendly_to_raw)
