"""The local correctness gate: every registered query with an oracle must
match DuckDB exactly at sf0.01 — same check the driver runs."""

from __future__ import annotations

import pytest

from enterprise_data_warehouse_spark.queries import load_registry

from .oracle_utils import compare_query

REGISTRY = load_registry()
ORACLE_QUERIES = sorted(n for n, s in REGISTRY.items() if s.oracle is not None)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity(spark, duck, name):
    spec = REGISTRY[name]
    problems = compare_query(spark, duck, name, spec)
    assert not problems, f"{name}: " + "; ".join(problems)


def test_all_queries_return_rows(spark):
    """Rows-only smoke for queries without an oracle."""
    for name, spec in REGISTRY.items():
        if spec.oracle is None:
            df = spec.fn(spark, "/root/testdata/sf0.001")
            assert df.count() >= 0, name


def test_approx_distinct_bounded_error(spark):
    """approx_distinct_users (rows-only): HLL++ estimate within 2% of exact
    countDistinct per event_type at rsd=0.5%."""
    from pyspark.sql import functions as F

    from enterprise_data_warehouse_spark.sources.tables import load_table

    sf_dir = "/root/testdata/sf0.01"
    approx = {
        r["event_type"]: r["approx_users"]
        for r in REGISTRY["approx_distinct_users"].fn(spark, sf_dir).collect()
    }
    exact = {
        r["event_type"]: r["exact_users"]
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("exact_users"))
        .collect()
    }
    assert set(approx) == set(exact)
    for etype, est in approx.items():
        rel_err = abs(est - exact[etype]) / max(exact[etype], 1)
        assert rel_err < 0.02, f"{etype}: approx={est} exact={exact[etype]}"


def test_ts_features_null_values_skip_not_crash(spark, tmp_path):
    """Events with NULL values: the pandas path must drop them exactly like
    the oracle's null-skipping aggregates (a NaN reaching the decimal-exact
    summer raises InvalidOperation and fails the job; counting it diverges
    from SQL COUNT(value))."""
    import duckdb
    from pyspark.sql import functions as F

    from enterprise_data_warehouse_spark.sources.tables import load_table

    e = load_table(spark, "/root/testdata/sf0.001", "events")
    nulled = e.withColumn(
        "value",
        F.when(F.col("event_id") % 7 == 0, F.lit(None)).otherwise(F.col("value")),
    )
    nulled.write.parquet(str(tmp_path / "events.parquet"))
    spec = REGISTRY["ts_features_pandas"]
    srows = sorted(
        tuple(str(v) for v in r)
        for r in spec.fn(spark, str(tmp_path)).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{tmp_path}/events.parquet/*.parquet')"
    )
    drows = sorted(
        tuple(str(v) for v in r) for r in con.execute(spec.oracle).fetchall()
    )
    assert srows == drows and len(srows) > 0


def test_dec2dbl_split_conversion_is_engine_identical(spark):
    """The r06 found-and-fixed contract: decimal→double must convert to
    THE SAME double in Spark and DuckDB at any magnitude. The direct
    CAST(decimal(38,4) AS DOUBLE) provably is not (DuckDB double-rounds
    via hugeint→double→÷10^scale once the unscaled value exceeds 2^53 —
    901/4000 adversarial mismatches measured); the split conversion
    (floor→scale-0 + exact fraction) must be. This pins dec2dbl/sql_dsum
    against regression to the direct cast."""
    import random

    import duckdb
    from pyspark.sql import functions as F

    from enterprise_data_warehouse_spark.functions.deterministic import (
        dec2dbl_s,
        sql_split_dbl,
    )

    rng = random.Random(20260815)
    vals = []
    for _ in range(400):
        mag = rng.choice([10**12, 10**14, 10**16, 10**19, 10**24])
        vals.append(f"{rng.randint(0, mag)}.{rng.randint(0, 9999):04d}")

    sp = (
        spark.createDataFrame([(v,) for v in vals], "s string")
        .select(dec2dbl_s(F.col("s").cast("decimal(38,4)"), 4).alias("x"))
        .collect()
    )
    con = duckdb.connect()
    mism = 0
    for v, row in zip(vals, sp):
        expr = sql_split_dbl(f"ROUND(CAST('{v}' AS DECIMAL(38,4)), 4)")
        dd = con.execute(f"SELECT {expr}").fetchone()[0]
        if dd != row["x"]:
            mism += 1
    assert mism == 0, f"{mism}/{len(vals)} cross-engine conversion mismatches"
