"""Local replica of the driver's correctness gate.

Runs a registered Spark query and its DuckDB oracle on the same
parquet tables, then compares: row count, schema (column names), and
order-insensitive values. Stricter than needed on floats: we demand
bit-exact equality (the engine is designed so decimal-exact sums and
identical IEEE expression evaluation make that achievable), but the
report includes the max float deviation to triage near-misses.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import pandas as pd


@dataclass
class CompareResult:
    name: str
    ok: bool
    spark_rows: int
    oracle_rows: int
    problems: list[str] = field(default_factory=list)

    def __str__(self) -> str:
        status = "OK " if self.ok else "FAIL"
        msg = f"[{status}] {self.name}: spark={self.spark_rows} oracle={self.oracle_rows}"
        for p in self.problems:
            msg += f"\n       - {p}"
        return msg


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        col = df[c]
        # unify datetimes to naive UTC microseconds
        if pd.api.types.is_datetime64_any_dtype(col):
            if getattr(col.dtype, "tz", None) is not None:
                col = col.dt.tz_convert("UTC").dt.tz_localize(None)
            df[c] = col.astype("datetime64[us]")
        elif col.dtype == object:
            df[c] = col.map(lambda v: None if v is None else v)
    # total order over rows for positional comparison
    if len(df) > 0:
        df = df.sort_values(by=list(df.columns), kind="mergesort", na_position="last")
    return df.reset_index(drop=True)


def _values_equal(a, b) -> tuple[bool, float]:
    """(equal, float_abs_diff if numeric else 0)"""
    a_null = a is None or (isinstance(a, float) and math.isnan(a)) or a is pd.NaT
    b_null = b is None or (isinstance(b, float) and math.isnan(b)) or b is pd.NaT
    if a_null or b_null:
        return (a_null and b_null, 0.0)
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return (False, 0.0)
        return (fa == fb, abs(fa - fb))
    return (a == b, 0.0)


def compare_frames(name: str, spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> CompareResult:
    res = CompareResult(name, True, len(spark_pdf), len(oracle_pdf))
    s_cols, o_cols = sorted(spark_pdf.columns), sorted(oracle_pdf.columns)
    if s_cols != o_cols:
        res.ok = False
        res.problems.append(f"column mismatch: spark={s_cols} oracle={o_cols}")
        return res
    if len(spark_pdf) != len(oracle_pdf):
        res.ok = False
        res.problems.append("row count mismatch")
        return res
    s = _normalize(spark_pdf)
    o = _normalize(oracle_pdf)
    max_float_diff = 0.0
    n_bad = 0
    first_bad = None
    for c in s.columns:
        sv, ov = s[c].tolist(), o[c].tolist()
        for i, (x, y) in enumerate(zip(sv, ov)):
            eq, fdiff = _values_equal(x, y)
            max_float_diff = max(max_float_diff, fdiff)
            if not eq:
                n_bad += 1
                if first_bad is None:
                    first_bad = f"col {c} row {i}: spark={x!r} oracle={y!r}"
    if n_bad:
        res.ok = False
        res.problems.append(
            f"{n_bad} value mismatches; first: {first_bad}; max_float_diff={max_float_diff:.3e}"
        )
    return res


def run_compare(spark, ddb, spec, sf_dir: str) -> CompareResult:
    spark_pdf = spec.build(spark, sf_dir).toPandas()
    oracle_pdf = ddb.sql(spec.oracle).df()
    return compare_frames(spec.name, spark_pdf, oracle_pdf)
