"""Deterministic cross-engine hashing.

The correctness oracle runs the same logic in DuckDB, so every hash used by
dedup/similarity operators must be bit-identical across engines. Foundation:

    H(s) = int64 value of the first 15 hex chars (60 bits) of md5(s)

- Spark:  CAST(conv(substr(md5(s), 1, 15), 16, 10) AS BIGINT)
- DuckDB: CAST('0x' || substr(md5(s), 1, 15) AS BIGINT)

60 bits keeps the value positive in a signed int64 in both engines. Seeded
variants prefix the seed: H_k(s) = H(k || ':' || s) — k independent hash
functions for MinHash from one md5 core.

Note on speed: md5 is slower than xxhash64, but xxhash64's exact output isn't
reproducible in DuckDB. Engine-internal paths that need no oracle parity
(e.g. storage bucketing) use xxhash64; operator semantics use H.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

HEX_LEN = 15  # 60 bits < 63 → always positive in signed int64


def h64(col: Column | str) -> Column:
    """Deterministic 60-bit hash of a string column (Spark side)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, HEX_LEN), 16, 10).cast("long")


def h64_seeded(col: Column | str, seed: int) -> Column:
    """Seeded variant: H(seed || ':' || s)."""
    c = F.col(col) if isinstance(col, str) else col
    return h64(F.concat(F.lit(f"{seed}:"), c))


def h64_sql(expr: str) -> str:
    """DuckDB SQL text equivalent of h64() for oracle queries."""
    return f"CAST('0x' || substr(md5({expr}), 1, {HEX_LEN}) AS BIGINT)"


def h64_seeded_sql(expr: str, seed: int) -> str:
    return h64_sql(f"concat('{seed}:', {expr})")
