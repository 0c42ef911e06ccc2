"""Byte-encoding scalar functions with no Spark builtin (SURVEY F2/F4).

The reference depends on the `bs58` crate for Tron/BTC address text
encoding (/root/reference/Cargo.toml:25; address derivation
src/ch_btc/init.rs:261-263). Spark has hex()/unhex()/base64() but no
base58 — this is the legitimate pandas-UDF slot (vectorized, Arrow
batches; never per-row Python registered into the hot path).

Pure-python base58 on driver-side test vectors is fine; the UDF runs it
per Arrow batch with a local alphabet table — deterministic, no deps.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

_B58_ALPHABET = "123456789ABCDEFGHJKLMNPQRSTUVWXYZabcdefghijkmnopqrstuvwxyz"


def b58encode_bytes(raw: bytes | None) -> str | None:
    """Base58 (bitcoin alphabet) of raw bytes — reference single-value
    implementation and the UDF's kernel."""
    if raw is None:
        return None
    n = int.from_bytes(raw, "big")
    out = []
    while n > 0:
        n, r = divmod(n, 58)
        out.append(_B58_ALPHABET[r])
    # leading zero bytes encode as '1's
    pad = 0
    for b in raw:
        if b == 0:
            pad += 1
        else:
            break
    return "1" * pad + "".join(reversed(out))


def b58check_bytes(raw: bytes | None, version: int = 0x00) -> str | None:
    """Base58Check: version byte + payload + 4-byte double-sha256 checksum
    (the BTC P2PKH / Tron address text format)."""
    if raw is None:
        return None
    body = bytes([version]) + raw
    chk = hashlib.sha256(hashlib.sha256(body).digest()).digest()[:4]
    return b58encode_bytes(body + chk)


@F.pandas_udf(T.StringType())
def b58encode_udf(raw: pd.Series) -> pd.Series:
    return raw.map(b58encode_bytes)


def b58check_udf(version: int = 0x00):
    """Factory: a pandas UDF with the version byte bound (UDFs cannot
    take non-column parameters)."""

    @F.pandas_udf(T.StringType())
    def _udf(raw: pd.Series) -> pd.Series:
        return raw.map(lambda b: b58check_bytes(b, version))

    return _udf


def hex_to_long(col) -> F.Column:
    """SURVEY F2: parse an 0x-prefixed (or bare) hex string to a long —
    JVM-side via conv(), no UDF (reference: U64::from_str_radix,
    src/ch_arb_one/schema.rs:77,88)."""
    c = F.col(col) if isinstance(col, str) else col
    stripped = F.when(c.startswith("0x"), F.substring(c, 3, 10_000)).otherwise(c)
    return F.conv(stripped, 16, 10).cast("long")
