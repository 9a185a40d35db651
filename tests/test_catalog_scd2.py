"""Catalog-driven SCD2: a `scd_type: 2` spec from warehouse.yml compiles
through the same pipeline as the hand-built dimension and preserves the
SCD invariants (exactly one current row per key, no overlaps/gaps)."""

from __future__ import annotations

from pyspark.sql import functions as F

from enterprise_data_warehouse_spark.operators.scd2 import (
    _customer_updates,
    scd2_integrity_violations,
)
from enterprise_data_warehouse_spark.plans.catalog import Catalog, build_dimension
from enterprise_data_warehouse_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_catalog_scd2_dimension_invariants(spark):
    spec = Catalog.load("catalog/warehouse.yml").dimension("dim_customer")
    assert int(spec["scd_type"]) == 2
    customer = load_table(spark, SF, "customer")
    dim = build_dimension(spec, customer, updates=_customer_updates(spark, SF))

    key = spec["natural_key"]
    assert scd2_integrity_violations(dim, key).count() == 0

    # every natural key has exactly one current row
    per_key = dim.where("is_current").groupBy(key).count()
    assert per_key.where("count != 1").count() == 0
    # changed keys carry expired predecessors with aligned validity ranges
    expired = dim.where(~F.col("is_current"))
    assert expired.count() > 0
    bad_ranges = expired.where(F.col("effective_to") <= F.col("effective_from"))
    assert bad_ranges.count() == 0


def test_catalog_scd1_dimension_shape(spark):
    spec = Catalog.load("catalog/warehouse.yml").dimension("dim_part")
    part = load_table(spark, SF, "part")
    dim = build_dimension(spec, part)
    assert dim.count() == part.select("p_partkey").distinct().count()
    assert "price_tier" in dim.columns and "size_band" in dim.columns
