"""Backfill orchestrator: restartable per-partition builds, resume
semantics, failure isolation, and partition-pruned reads of the result."""

from __future__ import annotations

from pyspark.sql import functions as F

from enterprise_data_warehouse_spark.sources.backfill import backfill_partitions
from enterprise_data_warehouse_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _day_build(spark):
    o = load_table(spark, SF, "orders").withColumn(
        "d", F.date_format("o_orderdate", "yyyy-MM-dd")
    )

    def build(date: str):
        return (
            o.where(F.col("d") == date)
            .groupBy("d", "o_orderpriority")
            .agg(F.count("*").alias("n"))
        )

    return o, build


def _some_dates(o, k=3):
    return sorted(r["d"] for r in o.select("d").distinct().limit(k).collect())


def test_backfill_builds_then_resumes(spark, tmp_path):
    o, build = _day_build(spark)
    dates = _some_dates(o)
    target = str(tmp_path / "fact_daily")
    r1 = backfill_partitions(spark, target, "d", build, dates, threads=2)
    assert all(v == "built" for v in r1.values()), r1
    r2 = backfill_partitions(spark, target, "d", build, dates, threads=2)
    assert all(v == "skipped" for v in r2.values()), r2
    # the result is a normal partitioned table: pruned reads + right counts
    back = spark.read.option("basePath", target).parquet(target)
    d0 = dates[0]
    expect = build(d0).agg(F.sum("n")).collect()[0][0]
    assert (
        back.where(F.col("d") == d0).agg(F.sum("n")).collect()[0][0] == expect
    )


def test_backfill_isolates_failures(spark, tmp_path):
    o, build = _day_build(spark)
    dates = _some_dates(o)

    def flaky(date: str):
        if date == dates[1]:
            raise ValueError("simulated upstream outage")
        return build(date)

    target = str(tmp_path / "fact_daily")
    r = backfill_partitions(spark, target, "d", flaky, dates, threads=2)
    assert r[dates[0]] == "built" and r[dates[2]] == "built"
    assert r[dates[1]].startswith("failed: ValueError")
    # no staged debris, no partial partition dir for the failed date
    import os

    names = os.listdir(target)
    assert f"d={dates[1]}" not in names
    assert all(not n.startswith("_staged-") for n in names), names
    # the retry completes just the hole
    r2 = backfill_partitions(spark, target, "d", build, dates, threads=2)
    assert r2[dates[1]] == "built"
    assert r2[dates[0]] == "skipped"
