"""Query registry — the driver-facing contract.

Every implemented operator from SURVEY.md §2 registers here as a named query
(a ``(spark, sf_dir) -> DataFrame`` builder) plus, where SQL-expressible, an
ANSI oracle string DuckDB runs on the same parquet tables. Column names are
aliased identically on both sides (driver hashes values under sorted column
names).
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None = None
    bench: bool = False  # include in bench.py headline set


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None, bench: bool = False):
    """Decorator: register a query builder with its DuckDB oracle SQL."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = QuerySpec(fn, oracle, bench)
        return fn

    return deco


_OPERATOR_MODULES = [
    "enterprise_data_warehouse_spark.operators.star",
    "enterprise_data_warehouse_spark.operators.relational",
    "enterprise_data_warehouse_spark.operators.windows",
    "enterprise_data_warehouse_spark.operators.scd2",
    "enterprise_data_warehouse_spark.operators.drift",
    "enterprise_data_warehouse_spark.operators.text",
    "enterprise_data_warehouse_spark.operators.dedup",
    "enterprise_data_warehouse_spark.operators.similarity",
    "enterprise_data_warehouse_spark.operators.extended",
    "enterprise_data_warehouse_spark.operators.chunking",
    "enterprise_data_warehouse_spark.operators.facts",
    "enterprise_data_warehouse_spark.operators.mlboundary",
    "enterprise_data_warehouse_spark.operators.multimodal",
    "enterprise_data_warehouse_spark.operators.quality",
    "enterprise_data_warehouse_spark.streaming.queries",
    "enterprise_data_warehouse_spark.streaming.stateful",
]


def load_registry() -> dict[str, QuerySpec]:
    """Import every operator module (each registers its queries) and return
    the populated registry."""
    for mod in _OPERATOR_MODULES:
        try:
            importlib.import_module(mod)
        except ModuleNotFoundError:
            pass  # module not built yet (incremental rounds)
    return REGISTRY
