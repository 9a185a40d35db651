"""Declarative data-quality checks (SURVEY.md §5.1–5.2): the dbt test
surface — unique / not_null / accepted_values / relationships /
positive_values (reference scripts/utilities/generate_fact_dimension_models.py:405-455,
defaults governance/data_catalog.yml:670-683) — as a runtime check runner.

Each check compiles to one aggregate over the target (anti-join for
relationships); the suite unions the verdict rows. At 100 TB every check is
a single scan-shaped job; checks on the same table could share one pass
(combine into one agg) — kept one-per-row here for per-check status
reporting, mirroring dbt's behavior of storing each test result separately.
"""

from __future__ import annotations

from collections.abc import Sequence
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..queries import query
from ..sources.tables import load_table


@dataclass(frozen=True)
class Check:
    kind: str  # unique | not_null | accepted_values | relationships | positive_values
    table: str
    column: str
    values: Sequence[str] | None = None  # accepted_values
    ref_table: str | None = None  # relationships
    ref_column: str | None = None


def run_check(tables: dict[str, DataFrame], c: Check) -> DataFrame:
    df = tables[c.table]
    col = F.col(c.column)
    if c.kind == "unique":
        violations = (
            df.groupBy(c.column).count().where(F.col("count") > 1).agg(F.count("*"))
        )
    elif c.kind == "not_null":
        violations = df.where(col.isNull()).agg(F.count("*"))
    elif c.kind == "accepted_values":
        violations = df.where(~col.isin(list(c.values)) | col.isNull()).agg(F.count("*"))
    elif c.kind == "relationships":
        parent = tables[c.ref_table].select(F.col(c.ref_column).alias(c.column))
        violations = df.select(c.column).join(parent, c.column, "left_anti").agg(F.count("*"))
    elif c.kind == "positive_values":
        violations = df.where(col <= 0).agg(F.count("*"))
    else:
        raise ValueError(f"unknown check kind: {c.kind}")
    n = violations.toDF("n_violations")
    return n.select(
        F.lit(c.kind).alias("check_name"),
        F.lit(c.table).alias("table_name"),
        F.lit(c.column).alias("column_name"),
        F.col("n_violations"),
        F.when(F.col("n_violations") == 0, "PASS").otherwise("FAIL").alias("status"),
    )


def run_suite(tables: dict[str, DataFrame], checks: Sequence[Check]) -> DataFrame:
    out = run_check(tables, checks[0])
    for c in checks[1:]:
        out = out.unionByName(run_check(tables, c))
    return out


SEGMENTS = ("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")

SUITE = [
    Check("unique", "customer", "c_custkey"),
    Check("not_null", "customer", "c_custkey"),
    Check("accepted_values", "customer", "c_mktsegment", values=SEGMENTS),
    Check("relationships", "orders", "o_custkey", ref_table="customer", ref_column="c_custkey"),
    Check("relationships", "lineitem", "l_orderkey", ref_table="orders", ref_column="o_orderkey"),
    Check("positive_values", "lineitem", "l_quantity"),
    Check("positive_values", "orders", "o_totalprice"),
]

_SEG_LIST = ", ".join(f"'{s}'" for s in SEGMENTS)

SUITE_ORACLE = f"""
WITH results AS (
  SELECT 'unique' AS check_name, 'customer' AS table_name, 'c_custkey' AS column_name,
    (SELECT COUNT(*) FROM (SELECT c_custkey FROM customer GROUP BY c_custkey HAVING COUNT(*) > 1)) AS n_violations
  UNION ALL
  SELECT 'not_null', 'customer', 'c_custkey',
    (SELECT COUNT(*) FROM customer WHERE c_custkey IS NULL)
  UNION ALL
  SELECT 'accepted_values', 'customer', 'c_mktsegment',
    (SELECT COUNT(*) FROM customer WHERE c_mktsegment NOT IN ({_SEG_LIST}) OR c_mktsegment IS NULL)
  UNION ALL
  SELECT 'relationships', 'orders', 'o_custkey',
    (SELECT COUNT(*) FROM orders o WHERE NOT EXISTS
      (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
  UNION ALL
  SELECT 'relationships', 'lineitem', 'l_orderkey',
    (SELECT COUNT(*) FROM lineitem l WHERE NOT EXISTS
      (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
  UNION ALL
  SELECT 'positive_values', 'lineitem', 'l_quantity',
    (SELECT COUNT(*) FROM lineitem WHERE l_quantity <= 0)
  UNION ALL
  SELECT 'positive_values', 'orders', 'o_totalprice',
    (SELECT COUNT(*) FROM orders WHERE o_totalprice <= 0)
)
SELECT check_name, table_name, column_name, n_violations,
  CASE WHEN n_violations = 0 THEN 'PASS' ELSE 'FAIL' END AS status
FROM results
"""


@query("quality_check_suite", oracle=SUITE_ORACLE)
def quality_check_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The generated dbt test suite for the star schema, one verdict row per
    check."""
    tables = {
        t: load_table(spark, sf_dir, t) for t in ("customer", "orders", "lineitem")
    }
    return run_suite(tables, SUITE)
