"""Partition-pruning proofs over our partitioned-write sink.

The reference declares monthly partition strategies and clustering keys
(reference governance/data_catalog.yml:697-698, models/marts/facts/
fact_sales_daily.sql:5) and relies on Snowflake to prune. On Spark the
equivalents are directory partitioning + Catalyst's static partition
pruning and runtime Dynamic Partition Pruning (DPP) — both asserted here
over a fact written with ``write_table(partition_by=...)``:

- static: a literal filter on the partition column must land in
  ``PartitionFilters`` (directories skipped before any I/O);
- dynamic: a join against a filtered dimension on the partition column
  must inject a ``dynamicpruning`` subquery into the fact scan, so only
  the matching partitions are read even though the filter is only known
  at runtime. At 100 TB DPP is the difference between scanning one month
  and scanning a decade.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from enterprise_data_warehouse_spark.sources.sink import write_table
from enterprise_data_warehouse_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _partitioned_orders(spark, tmp_path) -> str:
    path = str(tmp_path / "orders_by_year")
    orders = load_table(spark, SF, "orders").withColumn(
        "order_year", F.year("o_orderdate")
    )
    write_table(orders, path, partition_by=["order_year"])
    return path


def test_static_partition_pruning(spark, tmp_path):
    path = _partitioned_orders(spark, tmp_path)
    df = spark.read.parquet(path).where(F.col("order_year") == 1997)
    plan = _plan(df)
    pf = next(ln for ln in plan.splitlines() if "PartitionFilters" in ln)
    assert "order_year" in pf and "1997" in pf, pf


def test_dynamic_partition_pruning_from_dim_filter(spark, tmp_path):
    path = _partitioned_orders(spark, tmp_path)
    fact = spark.read.parquet(path)
    dim = spark.createDataFrame(
        [(y, "open" if y % 2 else "closed") for y in range(1995, 2002)],
        "dim_year int, status string",
    )
    joined = (
        fact.join(F.broadcast(dim), fact.order_year == dim.dim_year)
        .where(F.col("status") == "open")
        .groupBy("order_year")
        .agg(F.count("*").alias("n"))
    )
    plan = _plan(joined)
    assert "dynamicpruning" in plan, plan
    # and the pruning actually filters: only odd years survive
    years = {r["order_year"] for r in joined.collect()}
    assert years and all(y % 2 == 1 for y in years), years
