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


OUT_SCALE = 4  # final round scale before the double conversion.
# CONVERSION IS SPLIT, NOT DIRECT: a direct CAST(decimal(.., 4) AS DOUBLE)
# is engine-DEPENDENT once the unscaled value exceeds 2^53 — DuckDB
# converts hugeint→double→÷10^scale (two roundings) while Spark's
# BigDecimal.doubleValue single-rounds. Measured: 901/4000 adversarial
# sums in the >2^53 regime convert to different doubles (and this is what
# made corr_quantity_price diverge in the last ULP at sf1, r06). The fix
# converts the integer part and the fraction part separately:
#   i = FLOOR(r)   — decimal scale 0; scale-0→double is a SINGLE correctly
#                    rounded conversion in both engines (0/4000 mismatches
#                    measured up to 10^28)
#   f = r − i      — exact decimal in [0, 1), unscaled ≤ 9999 < 2^53, so
#                    its conversion is exact, and f/10^4 is one correctly
#                    rounded division in both engines
#   double(r) := double(i) + double(f)   — IEEE add, identical everywhere.
# The result can differ from the true single-rounded value of r by 1 ULP,
# but it differs IDENTICALLY in both engines — which is the actual
# contract the value-hash gate needs.


def dec2dbl_s(c: Column, scale: int) -> Column:
    """decimal → double at an explicit round scale, engine-independent at
    ANY magnitude (split integer/fraction conversion — see OUT_SCALE
    note). SQL mirror: ``sql_split_dbl(f"ROUND({expr}, {scale})")``."""
    r = F.round(c, scale)
    i = F.floor(r)
    return i.cast("double") + (r - i).cast("double")


def dec2dbl(c: Column) -> Column:
    """decimal → double, engine-independent at ANY magnitude (split
    integer/fraction conversion — see OUT_SCALE note)."""
    return dec2dbl_s(c, OUT_SCALE)


def dsum(col: Column | str, alias: str | None = None) -> Column:
    """Exact sum of a double column, returned as double.

    SQL mirror: ``sql_dsum(x)`` — the SPLIT conversion of
    ``ROUND(SUM(CAST(x AS DECIMAL(38,10))), 4)``; never hand-roll a
    direct ``CAST(... AS DOUBLE)``, it is engine-dependent above 2^53
    unscaled (see OUT_SCALE note).
    """
    c = F.col(col) if isinstance(col, str) else col
    out = dec2dbl(F.sum(c.cast(DEC)))
    return out.alias(alias) if alias else out


def davg(col: Column | str, alias: str | None = None) -> Column:
    """Order-independent mean: exact decimal sum / count, divided as double.

    SQL mirror: ``sql_davg(x)`` = ``sql_dsum(x) / COUNT(x)`` (split
    conversion — see dsum).
    """
    c = F.col(col) if isinstance(col, str) else col
    out = dec2dbl(F.sum(c.cast(DEC))) / F.count(c)
    return out.alias(alias) if alias else out


def dvar_samp(col: Column | str, alias: str | None = None) -> Column:
    """Order-independent sample variance from exact moments.

    var = (Σx² − (Σx)²/n) / (n−1), with Σ in decimal, the rest IEEE double
    (deterministic in any engine).

    SQL mirror: ``sql_dvar_samp(x)`` — built from ``sql_dsum`` (split
    conversion — see dsum), shape
    ``(dsum(x·x) − dsum(x)·dsum(x)/COUNT(x)) / (COUNT(x) − 1)``.
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

def sql_split_dbl(expr: str) -> str:
    """SQL mirror of dec2dbl's split conversion for a decimal expression
    already rounded to OUT_SCALE."""
    return (f"(CAST(FLOOR({expr}) AS DOUBLE)"
            f" + CAST({expr} - FLOOR({expr}) AS DOUBLE))")


def sql_dsum(x: str) -> str:
    return sql_split_dbl(f"ROUND(SUM(CAST(({x}) AS DECIMAL(38,10))), 4)")


def sql_davg(x: str) -> str:
    return f"({sql_dsum(x)} / COUNT({x}))"


def sql_dvar_samp(x: str) -> str:
    s1 = sql_dsum(x)
    s2 = sql_dsum(f"({x})*({x})")
    return f"(({s2} - {s1} * {s1} / COUNT({x})) / (COUNT({x}) - 1))"


def sql_dstd_samp(x: str) -> str:
    return f"SQRT({sql_dvar_samp(x)})"
