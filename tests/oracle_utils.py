"""Local mimic of the driver's correctness gate: run a registry query on
Spark at sf0.01 and its oracle SQL on DuckDB, then compare row count, sorted
column names, and order-insensitive values (exact for non-floats; exact-by
-default for floats so cross-engine determinism problems surface here, not
in the driver's hash)."""

from __future__ import annotations

import math
from typing import Any

SF_ORACLE = "/root/testdata/sf0.01"


def _normalize(v: Any) -> Any:
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    # Decimal → float would lose exactness; keep as str
    import datetime
    import decimal

    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    return v


def _rows_to_sorted(rows: list[tuple], colnames: list[str]) -> list[tuple]:
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    proj = [tuple(_normalize(r[i]) for i in order) for r in rows]
    return sorted(proj, key=lambda t: tuple(str(x) for x in t))


def compare_query(spark, duck, name: str, spec) -> list[str]:
    """Returns a list of mismatch descriptions (empty = pass)."""
    problems: list[str] = []
    sdf = spec.fn(spark, SF_ORACLE)
    spark_cols = [c.lower() for c in sdf.columns]
    spark_rows = [tuple(r) for r in sdf.collect()]

    # Fetch via Arrow, not fetchall(): DuckDB's integer SUM returns HUGEINT,
    # which Arrow surfaces as decimal128 (→ Decimal, not int). The driver's
    # hasher sees that representation, so the local gate must too — an
    # un-CAST integer SUM in an oracle then fails HERE, not in the driver.
    tbl = duck.execute(spec.oracle).arrow()
    duck_cols = [c.lower() for c in tbl.column_names]
    duck_rows = [tuple(d.values()) for d in tbl.to_pylist()]

    if sorted(spark_cols) != sorted(duck_cols):
        problems.append(f"columns differ: spark={sorted(spark_cols)} duck={sorted(duck_cols)}")
        return problems
    if len(spark_rows) != len(duck_rows):
        problems.append(f"row count differs: spark={len(spark_rows)} duck={len(duck_rows)}")

    s_sorted = _rows_to_sorted(spark_rows, spark_cols)
    d_sorted = _rows_to_sorted(duck_rows, duck_cols)
    n_bad = 0
    for i, (a, b) in enumerate(zip(s_sorted, d_sorted)):
        if a != b:
            # float tolerance probe: report if beyond 1e-12 relative
            exact_mismatch = False
            for x, y in zip(a, b):
                if isinstance(x, float) and isinstance(y, float):
                    if x != y:
                        exact_mismatch = True
                elif x != y:
                    exact_mismatch = True
            if exact_mismatch:
                n_bad += 1
                if n_bad <= 3:
                    problems.append(f"row {i}: spark={a} duck={b}")
    if n_bad > 3:
        problems.append(f"... {n_bad} mismatching rows total")
    return problems
