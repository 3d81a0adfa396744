"""Bit-exact hash functions required for parity with the reference.

The reference uses two JS hash libraries whose outputs are observable in its
results (fragment IRIs, deterministic sampling, Bloom bitfields):

* ``imurmurhash`` — MurmurHash3 x86 32-bit over JS string code units
  (``lib/quadmatcher/QuadMatcherTermValue.ts:26``,
  ``lib/summary/DatasetSummaryVoID.ts:180-182``,
  ``lib/summary/DatasetSummaryBloom.ts:159-165``).
* ``bloem``'s FNV-1a based double hashing for Bloom filters
  (``lib/summary/DatasetSummaryBloom.ts:149-152``).

Spark's builtin ``hash()`` is Murmur3 with a different seed/finalization and
``xxhash64`` is different entirely, so these are implemented here exactly and
exposed as vectorized pandas UDFs. For pure-ASCII input (all reference
fixtures) ``imurmurhash`` coincides with standard MurmurHash3 x86-32 seed 0;
the implementation below follows the JS char-code algorithm so non-ASCII
behaves identically to the reference too.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, LongType

_MASK32 = 0xFFFFFFFF

#: JS ``Number.MAX_SAFE_INTEGER >>> 0`` — the constant the reference divides
#: by for probability sampling (QuadMatcherTermValue.ts:6). Note: this is 1,
#: NOT 2^32-1: (2^53-1) >>> 0 keeps the low 32 bits = 0xFFFFFFFF... actually
#: (2**53-1) & 0xFFFFFFFF == 0xFFFFFFFF. So it IS 4294967295.
MURMURHASH3_MAX_VALUE = (2**53 - 1) & _MASK32  # 4294967295


def _mul32(a: int, b: int) -> int:
    """32-bit overflow multiply (matches the JS split-multiply trick)."""
    return (a * b) & _MASK32


def _rotl32(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _MASK32


def imurmurhash(text: str) -> int:
    """MurmurHash3 x86 32-bit over JS UTF-16 code units, seed 0.

    Faithful to the ``imurmurhash`` npm package's byte-packing, which XORs
    code units into little-endian 4-byte blocks (for ASCII this equals
    standard MurmurHash3 over the ASCII bytes).
    """
    codes = [ord(c) for c in text]
    n = len(codes)
    h1 = 0
    nblocks = n >> 2
    for i in range(nblocks):
        j = i * 4
        k1 = (
            (codes[j] & 0xFFFF)
            ^ ((codes[j + 1] & 0xFFFF) << 8)
            ^ ((codes[j + 2] & 0xFFFF) << 16)
            ^ ((codes[j + 3] & 0xFF) << 24)
            ^ ((codes[j + 3] & 0xFF00) >> 8)
        ) & _MASK32
        k1 = _mul32(k1, 0xCC9E2D51)
        k1 = _rotl32(k1, 15)
        k1 = _mul32(k1, 0x1B873593)
        h1 ^= k1
        h1 = _rotl32(h1, 13)
        h1 = (_mul32(h1, 5) + 0xE6546B64) & _MASK32

    # tail
    k1 = 0
    rem = n & 3
    base = nblocks * 4
    if rem == 3:
        k1 ^= (codes[base + 2] & 0xFFFF) << 16
    if rem >= 2:
        k1 ^= (codes[base + 1] & 0xFFFF) << 8
    if rem >= 1:
        k1 ^= codes[base] & 0xFFFF
    k1 &= _MASK32
    if k1 > 0:
        k1 = _mul32(k1, 0xCC9E2D51)
        k1 = _rotl32(k1, 15)
        k1 = _mul32(k1, 0x1B873593)
        h1 ^= k1

    h1 ^= n
    h1 ^= h1 >> 16
    h1 = _mul32(h1, 0x85EBCA6B)
    h1 ^= h1 >> 13
    h1 = _mul32(h1, 0xC2B2AE35)
    h1 ^= h1 >> 16
    return h1 & _MASK32


def imurmurhash_hex(text: str) -> str:
    """Base-16 string of the hash — the reference's fragment-IRI encoding
    (``DatasetSummaryVoID.ts:180-182`` ``.result().toString(16)``)."""
    return format(imurmurhash(text), "x")


# ---------------------------------------------------------------------------
# bloem-compatible FNV double hashing (npm `bloem` → `fnv-plus`)
# ---------------------------------------------------------------------------

_FNV_OFFSET_32 = 0x811C9DC5
_FNV_PRIME_32 = 0x01000193


def _fnv1a32(data: bytes, seed: int = _FNV_OFFSET_32) -> int:
    h = seed
    for b in data:
        h ^= b
        h = (h * _FNV_PRIME_32) & _MASK32
    return h


def bloem_bit_indexes(value: bytes, size_bits: int, slices: int) -> list[int]:
    """Bit positions `bloem` sets for *value* in an m-bit, k-slice filter.

    Reconstruction of the public npm ``bloem`` package: two seeded 32-bit
    FNV-1a hashes — ``h1 = fnv1a(b'S' + data)``, ``h2 = fnv1a(b'W' + data)``
    (the package streams the seed buffer then the key through the ``fnv``
    module, whose shift-based multiply equals FNV-1a mod 2^32) — combined
    Kirsch-Mitzenmacher style: ``g_i = (h1 + i*h2) mod m``. Bit layout is
    LSB-first within each byte (``bitbuffer``: ``buf[i>>3] |= 1 << (i&7)``).

    The reference's own unit tests only assert round-trip membership
    (``test/unit/summary/DatasetSummaryBloom-test.ts:29-47``), which our
    filters satisfy by construction; byte-level parity follows this
    reconstruction of bloem's hashing.
    """
    h1 = _fnv1a32(b"S" + value)
    h2 = _fnv1a32(b"W" + value)
    return [(h1 + i * h2) % size_bits for i in range(slices)]


def bloem_bitfield(values: list[bytes], size_bits: int, slices: int) -> bytes:
    """Build the bloem-layout bitfield for a set of member values."""
    buf = bytearray(size_bits // 8)
    for v in values:
        for idx in bloem_bit_indexes(v, size_bits, slices):
            buf[idx >> 3] |= 1 << (idx & 7)
    return bytes(buf)


def bloem_has(bitfield: bytes, value: bytes, size_bits: int, slices: int) -> bool:
    return all(
        bitfield[i >> 3] & (1 << (i & 7)) for i in bloem_bit_indexes(value, size_bits, slices)
    )


# ---------------------------------------------------------------------------
# Vectorized pandas UDFs (Arrow-batched; no per-row JVM<->Python crossings)
# ---------------------------------------------------------------------------


def _imurmur_series(s: pd.Series) -> pd.Series:
    return s.map(lambda v: imurmurhash(v) if v is not None else None).astype("Int64")


def murmur_udf() -> Column:
    """Factory for the pandas UDF column function (lazily created so importing
    this module does not require an active SparkSession)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(LongType())
    def _udf(s: pd.Series) -> pd.Series:
        return _imurmur_series(s)

    return _udf


def murmur_col(col: Column) -> Column:
    return murmur_udf()(col)


def murmur_prob_col(col: Column) -> Column:
    """hash(value) / MURMURHASH3_MAX_VALUE — the reference's deterministic
    sampling score (QuadMatcherTermValue.ts:26-28)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(DoubleType())
    def _udf(s: pd.Series) -> pd.Series:
        out = s.map(
            lambda v: imurmurhash(v) / MURMURHASH3_MAX_VALUE if v is not None else None
        )
        return out.astype(np.float64)

    return _udf(col)


def murmur_hex_col(col: Column) -> Column:
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import StringType

    @pandas_udf(StringType())
    def _udf(s: pd.Series) -> pd.Series:
        return s.map(lambda v: imurmurhash_hex(v) if v is not None else None)

    return _udf(col)


# ---------------------------------------------------------------------------
# Engine-portable hashing (Spark & DuckDB compute identical values): md5-based
# ---------------------------------------------------------------------------


def md5_bucket(col: Column, buckets: int) -> Column:
    """Deterministic bucket id in [0, buckets) derived from md5 — identical in
    Spark and DuckDB (used by oracle-checked dedup/sampling operators; conv()
    of the first 8 hex chars is exact in 64-bit integer range)."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long") % buckets
