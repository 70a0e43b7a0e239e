"""Cross-engine deterministic hashing.

The driver's correctness gate runs each Spark query AND a DuckDB oracle SQL
side-by-side and value-hashes the results, so any hash that appears in
query *output* must be computable identically in both engines. xxhash64 is
Spark-only; md5 is everywhere. ``md5_long`` maps a string to a 60-bit
signed integer identically in Spark and DuckDB:

  Spark : conv(substring(md5(s), 1, 15), 16, 10)::long
  DuckDB: cast(concat('0x', substring(md5(s), 1, 15)) as bigint)

15 hex digits = 60 bits < 63, so the value always fits a signed BIGINT.
Internal-only hashes (seen-set keys, salting) stay on native xxhash64.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_long(col: Column | str) -> Column:
    """Deterministic 60-bit integer hash of a string column (Spark side)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def md5_long_sql(expr: str) -> str:
    """The DuckDB-side expression equal to ``md5_long`` for the same input."""
    return f"cast(concat('0x', substring(md5({expr}), 1, 15)) as bigint)"


def seeded(col: Column | str, seed: int | str) -> Column:
    """Seeded variant: hash of 'seed:value' (Spark side)."""
    c = F.col(col) if isinstance(col, str) else col
    return md5_long(F.concat(F.lit(f"{seed}:"), c))


def seeded_sql(expr: str, seed: int | str) -> str:
    return md5_long_sql(f"concat('{seed}:', {expr})")
