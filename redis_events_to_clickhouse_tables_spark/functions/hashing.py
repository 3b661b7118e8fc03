"""Cross-engine deterministic hashing.

Spark's builtin ``hash``/``xxhash64`` and DuckDB's ``hash`` are
different algorithms, so oracle-checked hash-based operators (minhash,
simhash, fingerprinting, LSH buckets) derive integers from ``md5``,
which both engines implement identically: take the first 15 hex chars
(60 bits — fits a signed 64-bit int) and parse as base-16.

Spark side:   conv(substring(md5(x), 1, 15), 16, 10)::long
DuckDB side:  CAST(('0x' || substr(md5(x), 1, 15)) AS BIGINT)

md5 here is a *deterministic mixer*, not cryptography. It is JVM-side
(whole-stage codegen), so the hot path stays off Python.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_long(col: Column | str, salt: str | None = None) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    if salt is not None:
        c = F.concat(F.lit(f"{salt}:"), c)
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def DUCKDB_MD5_LONG(expr: str, salt: str | None = None) -> str:
    """The DuckDB SQL rendering of :func:`md5_long` (same bits)."""
    inner = expr if salt is None else f"'{salt}:' || {expr}"
    return f"CAST(('0x' || substr(md5({inner}), 1, 15)) AS BIGINT)"
