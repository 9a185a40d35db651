"""Determinism-hardened aggregates.

Problem: ``SUM(double)`` is order-dependent — Spark's partial aggregation
order varies run-to-run and differs from any single-threaded oracle, so a
value-hash comparison against DuckDB fails in the last ULP.

Fix: route every floating SUM/AVG/STDDEV through exact ``DECIMAL(38,10)``
arithmetic (associative and commutative, so partition order is irrelevant),
then cast the final result back to double. A decimal boundary at scale 10
(…5e-11) is not representable in binary floating point, so double→decimal
rounding is also engine-independent. The SQL mirror of each helper (used in
oracle_sql) is documented per function.

This costs a few % over native double sums and is scale-safe: decimal sums
are still one-pass, map-side-combinable aggregates — the shuffle shape is
identical at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(38,10)"


OUT_SCALE = 4  # final round scale: keeps unscaled decimal < 2^53 so the
# decimal→double conversion is exact (single-rounding) in BOTH engines —
# DuckDB converts via hugeint→double→÷10^scale, which double-rounds when the
# unscaled value exceeds 2^53.


def dec2dbl(c: Column) -> Column:
    """decimal → double with engine-independent rounding (see OUT_SCALE)."""
    return F.round(c, OUT_SCALE).cast("double")


def dsum(col: Column | str, alias: str | None = None) -> Column:
    """Exact sum of a double column, returned as double.

    SQL mirror: ``CAST(ROUND(SUM(CAST(x AS DECIMAL(38,10))), 4) AS DOUBLE)``.
    """
    c = F.col(col) if isinstance(col, str) else col
    out = dec2dbl(F.sum(c.cast(DEC)))
    return out.alias(alias) if alias else out


def davg(col: Column | str, alias: str | None = None) -> Column:
    """Order-independent mean: exact decimal sum / count, divided as double.

    SQL mirror:
    ``CAST(SUM(CAST(x AS DECIMAL(38,10))) AS DOUBLE) / COUNT(x)``.
    """
    c = F.col(col) if isinstance(col, str) else col
    out = dec2dbl(F.sum(c.cast(DEC))) / F.count(c)
    return out.alias(alias) if alias else out


def dvar_samp(col: Column | str, alias: str | None = None) -> Column:
    """Order-independent sample variance from exact moments.

    var = (Σx² − (Σx)²/n) / (n−1), with Σ in decimal, the rest IEEE double
    (deterministic in any engine).

    SQL mirror::

        (CAST(SUM(CAST(x*x AS DECIMAL(38,10))) AS DOUBLE)
         - CAST(SUM(CAST(x AS DECIMAL(38,10))) AS DOUBLE)
           * CAST(SUM(CAST(x AS DECIMAL(38,10))) AS DOUBLE) / COUNT(x))
        / (COUNT(x) - 1)
    """
    c = F.col(col) if isinstance(col, str) else col
    s1 = dec2dbl(F.sum(c.cast(DEC)))
    s2 = dec2dbl(F.sum((c * c).cast(DEC)))
    n = F.count(c)
    out = (s2 - s1 * s1 / n) / (n - F.lit(1))
    return out.alias(alias) if alias else out


def dstd_samp(col: Column | str, alias: str | None = None) -> Column:
    """Order-independent sample stddev (sqrt is IEEE-correctly-rounded).

    SQL mirror: ``SQRT(<dvar_samp mirror>)``.
    """
    out = F.sqrt(dvar_samp(col))
    return out.alias(alias) if alias else out


def dzscore_parts(col: Column | str) -> tuple[Column, Column]:
    """(mean, std) pair for window-based z-scores, both order-independent."""
    return davg(col), dstd_samp(col)


# --- SQL-text builders for oracle mirrors -------------------------------

def sql_dsum(x: str) -> str:
    return f"CAST(ROUND(SUM(CAST(({x}) AS DECIMAL(38,10))), 4) AS DOUBLE)"


def sql_davg(x: str) -> str:
    return f"({sql_dsum(x)} / COUNT({x}))"


def sql_dvar_samp(x: str) -> str:
    s1 = sql_dsum(x)
    s2 = sql_dsum(f"({x})*({x})")
    return f"(({s2} - {s1} * {s1} / COUNT({x})) / (COUNT({x}) - 1))"


def sql_dstd_samp(x: str) -> str:
    return f"SQRT({sql_dvar_samp(x)})"
