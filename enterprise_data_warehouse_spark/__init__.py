"""Enterprise Data Warehouse — PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of the reference warehouse (dbt + Snowflake + pandas ML platform,
surveyed in /root/repo/SURVEY.md). Everything is declared through the
DataFrame / Spark SQL API so Catalyst + Tungsten own the physical plan:
predicate pushdown, column pruning, broadcast joins, AQE re-planning and
whole-stage codegen are free; custom logic exists only where the reference
has real business semantics (SCD2, incremental MERGE, drift statistics,
catalog-driven model building, LLM-data-pipeline operators).

Layout:
    session        SparkSession factory tuned for local[32] test / cluster prod
    sources        table loaders, CSV seeds, sinks (overwrite / append / merge)
    functions      scalar expression library + determinism-hardened aggregates
    operators      relational operator layer (staging, star, scd2, windows,
                   drift, dedup, similarity, text, multimodal)
    plans          YAML-catalog-driven model compiler and registry
    streaming      Structured Streaming incremental / windowed / sessionized
"""

__version__ = "0.1.0"
