"""Cross-engine deterministic hashing.

MinHash/SimHash/fingerprint operators need hash values that are identical in
Spark and in the DuckDB oracle. Neither engine's native hash matches the
other (Spark: Murmur3/xxhash64; DuckDB: its own), but both expose md5 over
UTF-8 strings. We take a 15-hex-digit (60-bit, sign-safe) or 8-hex (32-bit)
prefix as an integer:

- Spark:  conv(substring(md5(x), 1, 15), 16, 10) cast to long
- DuckDB: ('0x' || substr(md5(x), 1, 15))::BIGINT

Both equal int(hashlib.md5(x).hexdigest()[:15], 16).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_int(col: Column, hex_digits: int = 15) -> Column:
    """First `hex_digits` of md5 as a non-negative long (Spark side)."""
    return F.conv(F.substring(F.md5(col), 1, hex_digits), 16, 10).cast("long")


def md5_int_sql(expr: str, hex_digits: int = 15) -> str:
    """Same value, DuckDB SQL."""
    return f"(('0x' || substr(md5({expr}), 1, {hex_digits}))::BIGINT)"
