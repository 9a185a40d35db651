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


# anchored; matches in Spark rlike and DuckDB regexp_matches identically
EMAIL_RE = r"^[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}$"


@dataclass(frozen=True)
class Check:
    kind: str  # unique | not_null | accepted_values | relationships | positive_values | email_format
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
    elif c.kind == "email_format":
        violations = df.where(~col.rlike(EMAIL_RE) | col.isNull()).agg(F.count("*"))
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


# --- catalog-driven test codegen ---------------------------------------------
# The reference auto-generates per-column schema tests from the catalog YAML
# (scripts/utilities/generate_fact_dimension_models.py:405-489; defaults
# governance/data_catalog.yml:670-683). Here the SAME YAML drives both the
# Spark check suite and the DuckDB oracle string: compile_checks walks the
# specs, compile_suite_oracle emits the equivalent SQL — so the two can not
# drift apart, and the driver value-verifies the generated suite.


def compile_checks(cat) -> list[Check]:
    """Walk the catalog into Check objects:
    - each dimension's natural key gets the configured default tests
      (quality.natural_key_tests, default unique + not_null)
    - attribute `tests:` lists compile per-kind (accepted_values reads the
      sibling `values:` list)
    - fact dimension_keys with a `ref:` compile to a relationships check on
      the raw table named by ref.from
    - fact measures with `tests:` compile against measure `from:` tables
    """
    key_tests = (cat.raw.get("quality") or {}).get(
        "natural_key_tests", ["unique", "not_null"]
    )
    checks: list[Check] = []
    for d in cat.dimensions:
        t = d.get("source")
        if not t:
            continue
        for kind in key_tests:
            checks.append(Check(kind, t, d["natural_key"]))
        for a in d.get("attributes", []):
            for kind in a.get("tests", []):
                vals = tuple(a["values"]) if kind == "accepted_values" else None
                checks.append(Check(kind, t, a["name"], values=vals))
    for f in cat.facts:
        for k in f.get("dimension_keys", []):
            ref = k.get("ref")
            if ref:
                checks.append(
                    Check(
                        "relationships",
                        ref.get("from", f["source"]),
                        k["source_column"],
                        ref_table=ref["table"],
                        ref_column=ref["column"],
                    )
                )
        for m in f.get("measures", []):
            for kind in m.get("tests", []):
                checks.append(Check(kind, m.get("from", f["source"]), m["column"]))
    # two specs may declare the same FK/test (e.g. two facts sharing a
    # dimension ref) — one test run per distinct check, order-preserving
    return list(dict.fromkeys(checks))


def _check_sql(c: Check) -> str:
    t, col = c.table, c.column
    if c.kind == "unique":
        sub = f"(SELECT COUNT(*) FROM (SELECT {col} FROM {t} GROUP BY {col} HAVING COUNT(*) > 1))"
    elif c.kind == "not_null":
        sub = f"(SELECT COUNT(*) FROM {t} WHERE {col} IS NULL)"
    elif c.kind == "accepted_values":
        vals = ", ".join(f"'{v}'" for v in c.values)
        sub = f"(SELECT COUNT(*) FROM {t} WHERE {col} NOT IN ({vals}) OR {col} IS NULL)"
    elif c.kind == "relationships":
        sub = (
            f"(SELECT COUNT(*) FROM {t} c WHERE NOT EXISTS "
            f"(SELECT 1 FROM {c.ref_table} p WHERE p.{c.ref_column} = c.{col}))"
        )
    elif c.kind == "positive_values":
        sub = f"(SELECT COUNT(*) FROM {t} WHERE {col} <= 0)"
    elif c.kind == "email_format":
        sub = (
            f"(SELECT COUNT(*) FROM {t} WHERE NOT regexp_matches({col}, '{EMAIL_RE}') "
            f"OR {col} IS NULL)"
        )
    else:
        raise ValueError(f"unknown check kind: {c.kind}")
    return (
        f"SELECT '{c.kind}' AS check_name, '{t}' AS table_name, "
        f"'{col}' AS column_name, {sub} AS n_violations"
    )


def compile_suite_oracle(checks: Sequence[Check]) -> str:
    # staged models some checks target, stated once as CTEs (unused CTEs are
    # legal); raw tables resolve to the driver's pre-registered views
    from .facts import (
        STAGED_PRODUCTS_SQL,
        STAGING_DATE_SPINE_SQL,
        STAGING_EMPLOYEES_SQL,
        STAGING_GEOGRAPHY_SQL,
    )

    body = "\n  UNION ALL\n  ".join(_check_sql(c) for c in checks)
    return f"""
WITH staging_employees AS ({STAGING_EMPLOYEES_SQL}),
staged_products AS ({STAGED_PRODUCTS_SQL}),
staging_geography AS ({STAGING_GEOGRAPHY_SQL}),
staging_date_spine AS ({STAGING_DATE_SPINE_SQL}),
results AS (
  {body}
)
SELECT check_name, table_name, column_name, n_violations,
  CASE WHEN n_violations = 0 THEN 'PASS' ELSE 'FAIL' END AS status
FROM results
"""


def _catalog():
    import os

    from ..plans.catalog import Catalog

    path = os.path.join(
        os.path.dirname(__file__), "..", "..", "catalog", "warehouse.yml"
    )
    return Catalog.load(path)


_CATALOG_CHECKS = compile_checks(_catalog())
CATALOG_SUITE_ORACLE = compile_suite_oracle(_CATALOG_CHECKS)


@query("catalog_quality_suite", oracle=CATALOG_SUITE_ORACLE)
def catalog_quality_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The catalog-compiled test suite: every check row here was generated
    from catalog/warehouse.yml `tests:`/`ref:` declarations plus the
    natural-key defaults — nothing hand-declared (compare quality_check_suite
    above, the hand-written r01 suite kept for continuity)."""
    from .facts import _registry

    reg = _registry(spark, sf_dir)
    needed = {c.table for c in _CATALOG_CHECKS} | {
        c.ref_table for c in _CATALOG_CHECKS if c.ref_table
    }
    tables = {t: reg.ref(t) for t in needed}
    return run_suite(tables, _CATALOG_CHECKS)


# --- column masking policies (row-level governance views) ---------------------

# policy kinds: hash (pseudonymize, joinable), null (redact), partial (keep a
# prefix, mask the rest) — the standard dynamic-data-masking trio. A policy
# map compiles to plain projections, so masked views cost nothing at read
# time and Catalyst prunes/pushes through them like any select.
MASK_POLICIES = {
    "c_name": ("hash", None),
    "c_acctbal": ("null", "double"),
    "c_mktsegment": ("partial", 4),
}


def apply_column_masks(df: DataFrame, policies: dict) -> DataFrame:
    """Compile a masking-policy map into a projection: every column not in
    ``policies`` passes through; masked columns keep their name and type
    shape so downstream queries and joins are unaffected (pseudonymizing
    `hash` masks stay equi-joinable across tables because md5 is
    deterministic)."""
    cols = []
    for name in df.columns:
        kind = policies.get(name)
        if kind is None:
            cols.append(F.col(name))
        elif kind[0] == "hash":
            cols.append(F.md5(F.col(name).cast("string")).alias(name))
        elif kind[0] == "null":
            cols.append(F.lit(None).cast(kind[1]).alias(name))
        elif kind[0] == "partial":
            n = kind[1]
            cols.append(
                F.concat(
                    F.substring(F.col(name), 1, n),
                    F.lit("****"),
                ).alias(name)
            )
        else:  # pragma: no cover - config error
            raise ValueError(f"unknown mask kind {kind!r} for {name}")
    return df.select(*cols)


MASKED_VIEW_ORACLE = """
SELECT c_custkey,
  MD5(c_name) AS c_name,
  c_nationkey,
  CAST(NULL AS DOUBLE) AS c_acctbal,
  SUBSTR(c_mktsegment, 1, 4) || '****' AS c_mktsegment
FROM customer
"""


@query("masked_customer_view", oracle=MASKED_VIEW_ORACLE)
def masked_customer_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic data masking as a governed view: the customer dim with the
    declared MASK_POLICIES applied — name pseudonymized (md5, still
    joinable), balance redacted to NULL, segment partially masked. The
    masked projection composes with everything else (same column names and
    order), which is the point: governance that doesn't fork the schema.
    Ref parity: governance/data_catalog.yml PII defaults; the reference
    enforces masking in Snowflake views, here it is a compiled projection."""
    return apply_column_masks(
        load_table(spark, sf_dir, "customer"), MASK_POLICIES
    )


# --- ANALYZE-style column statistics ------------------------------------------

_PROFILE_COLS = ("o_orderkey", "o_custkey", "o_orderstatus",
                 "o_orderpriority", "o_orderdate")

COLUMN_PROFILE_ORACLE = " UNION ALL ".join(
    f"""SELECT '{c}' AS column_name, COUNT(*) AS n_rows,
  COUNT(*) - COUNT({c}) AS n_nulls,
  COUNT(DISTINCT {c}) AS ndv FROM orders"""
    for c in _PROFILE_COLS
)


@query("orders_column_profile", oracle=COLUMN_PROFILE_ORACLE)
def orders_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE TABLE-style per-column statistics (row count, null count,
    exact NDV) — the numbers a cost-based optimizer and any profiling UI
    (dbt docs, Great Expectations suites) want per column. Exact NDV here
    because the profile is itself the correctness oracle; the engine's
    cardinality-at-scale twin is HLL (`approx_distinct_users`).

    ONE scan: all five columns' aggregates run in a single groupBy-less
    agg (Spark plans the multi-distinct via Expand — one pass over the
    table, |cols| internal row replications, same shape as ROLLUP), then
    the 1×N stat row melts into N rows map-side. The UNION ALL oracle
    states the same stats column-at-a-time."""
    o = load_table(spark, sf_dir, "orders")
    aggs = []
    for c in _PROFILE_COLS:
        aggs += [
            F.count("*").alias(f"{c}__rows"),
            F.sum(F.col(c).isNull().cast("bigint")).cast("bigint").alias(f"{c}__nulls"),
            F.countDistinct(c).alias(f"{c}__ndv"),
        ]
    wide = o.agg(*aggs)
    stats = F.array(
        *[
            F.struct(
                F.lit(c).alias("column_name"),
                F.col(f"{c}__rows").alias("n_rows"),
                F.col(f"{c}__nulls").alias("n_nulls"),
                F.col(f"{c}__ndv").alias("ndv"),
            )
            for c in _PROFILE_COLS
        ]
    )
    return wide.select(F.explode(stats).alias("s")).select("s.*")


# --- row-level contract gate with quarantine sink ------------------------------


def violation_flags(
    df: DataFrame, checks: Sequence[Check], tables: dict[str, DataFrame] | None = None
) -> DataFrame:
    """Per-ROW violation labels for a check suite (the write-path complement
    of run_suite's per-CHECK counts): adds ``_violations array<string>``,
    empty = clean.

    Row-expressible kinds (not_null / accepted_values / positive_values /
    email_format) compile to predicates in one projection; ``unique`` is a
    count window over the key (one exchange); ``relationships`` is a
    left join against the parent's distinct keys (broadcastable dim-sized
    side). Every flag is attached WITHOUT dropping rows — routing is the
    caller's policy (write_with_quarantine)."""
    flags: list = []
    markers: list[str] = []
    for i, c in enumerate(checks):
        name = f"{c.kind}:{c.column}"
        col = F.col(c.column)
        if c.kind == "not_null":
            cond = col.isNull()
        elif c.kind == "accepted_values":
            cond = ~col.isin(list(c.values)) | col.isNull()
        elif c.kind == "positive_values":
            cond = col <= 0
        elif c.kind == "email_format":
            cond = ~col.rlike(EMAIL_RE) | col.isNull()
        elif c.kind == "unique":
            from pyspark.sql import Window

            cond = F.count("*").over(Window.partitionBy(c.column)) > 1
        elif c.kind == "relationships":
            # Marker column is unique per check — a second relationships
            # check would otherwise duplicate `_parent_hit` and fail
            # analysis with AMBIGUOUS_REFERENCE.
            marker = f"_parent_hit_{i}"
            parent = (
                tables[c.ref_table]
                .select(F.col(c.ref_column).alias(c.column))
                .distinct()
                .withColumn(marker, F.lit(1))
            )
            df = df.join(F.broadcast(parent), c.column, "left")
            markers.append(marker)
            cond = F.col(marker).isNull()
        else:
            raise ValueError(f"row-level gate cannot express: {c.kind}")
        flags.append(F.when(cond, name))
    out = df.withColumn(
        "_violations",
        F.filter(F.array(*flags), lambda x: x.isNotNull()),
    )
    return out.drop(*markers)


def write_with_quarantine(
    df: DataFrame,
    checks: Sequence[Check],
    target: str,
    quarantine: str,
    tables: dict[str, DataFrame] | None = None,
) -> dict[str, int]:
    """Data-contract gate at the sink: rows passing every check land in
    ``target`` (contract columns only — no flag residue), violating rows
    land in ``quarantine`` WITH their ``_violations`` labels for triage —
    the standard expectations-suite write pattern (rows are never silently
    dropped, and the clean table never carries dirty rows).

    Returns {"n_clean": ..., "n_quarantined": ...}. Two filtered writes of
    one flagged frame; at scale the flag projection is map-side (plus one
    key window / parent join where the suite demands it)."""
    flagged = violation_flags(df, checks, tables)
    clean = flagged.where(F.size("_violations") == 0).drop("_violations")
    dirty = flagged.where(F.size("_violations") > 0)
    clean.write.mode("overwrite").parquet(target)
    dirty.write.mode("overwrite").parquet(quarantine)
    spark = df.sparkSession
    return {
        "n_clean": spark.read.parquet(target).count(),
        "n_quarantined": spark.read.parquet(quarantine).count(),
    }
