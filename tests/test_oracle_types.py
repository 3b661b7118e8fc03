"""Registry-wide oracle output-type gate.

The driver's correctness harness hashes canonicalized values from both
engines; DuckDB types an uncast ``SUM(BIGINT)`` as HUGEINT (int128),
which canonicalizes differently from Spark's int64 even when every
value is bit-identical (round-6 reds ``text_bpe_top_merges`` /
``stats_overdispersion_index``). This gate binds every registered
oracle against the test views and asserts no result column is typed
HUGEINT/UHUGEINT — binding only (no execution), so it's cheap.
"""

from __future__ import annotations

from redis_events_to_clickhouse_tables_spark.registry import load_all

_FORBIDDEN = {"HUGEINT", "UHUGEINT"}
# DECIMAL(p,s) result columns share the hazard class: the driver
# canonicalizes fixed-point values differently from Spark's double,
# so ban them as result types too (prefix match — DuckDB renders the
# parameterized name).
_FORBIDDEN_PREFIXES = ("DECIMAL",)


def test_no_oracle_emits_hugeint(ddb):
    offenders = []
    for name, spec in load_all().items():
        if spec.oracle is None:
            continue
        rel = ddb.sql(spec.oracle)
        for col, typ in zip(rel.columns, rel.types):
            t = str(typ).upper()
            if t in _FORBIDDEN or t.startswith(_FORBIDDEN_PREFIXES):
                offenders.append(f"{name}.{col}: {typ}")
    assert not offenders, (
        "oracle columns typed HUGEINT/UHUGEINT (driver hash-canonicalizes "
        "int128 differently from Spark int64) — wrap in CAST(... AS BIGINT): "
        + "; ".join(offenders)
    )
