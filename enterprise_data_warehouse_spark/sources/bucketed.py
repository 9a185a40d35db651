"""Bucketed (co-located) tables — the shuffle-elimination strategy for
repeated big-big joins (SURVEY.md §4: "bucketing for co-located joins").

A fact table joined on the same key by every downstream query (lineitem ⋈
orders on orderkey, here) should pay the partitioning shuffle ONCE at write
time: ``bucketBy(n, key)`` + ``sortBy(key)`` persists hash-bucket layout in
the table metadata, and Spark then plans the join with NO Exchange on either
side — at 100 TB that's the whole shuffle of the two biggest tables gone
from every consuming query. Trade-offs: bucket count is fixed at write time
(size it for the target cluster's parallelism) and both sides must agree on
(count, key).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    buckets: int,
    key: str | Sequence[str],
    sort: bool = True,
) -> None:
    """Materialize a DataFrame as a bucketed managed table (parquet)."""
    keys = [key] if isinstance(key, str) else list(key)
    writer = df.write.mode("overwrite").format("parquet").bucketBy(buckets, *keys)
    if sort:
        writer = writer.sortBy(*keys)
    writer.saveAsTable(table)


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str, on: str | Sequence[str]
) -> DataFrame:
    """Join two same-bucketed tables — planner emits zero Exchanges when
    bucket specs match (verify with .explain; tests/test_bucketed.py asserts
    it)."""
    return spark.table(left_table).join(spark.table(right_table), on)
