"""JSONL ingest source (S4's sibling: the crawl/export feed format).

Reference ingests CSV seeds and warehouse tables; real corpus feeds arrive
as JSON-lines. This reader makes the failure mode explicit instead of
silent: schema is REQUIRED (schema inference scans the data twice and
locks in whatever the first sample implied), malformed lines are
quarantined into a `_corrupt_record` column (PERMISSIVE mode) rather than
dropped, and the caller gets (good, bad) frames — the standard
quality-gate split an ingest pipeline audits.

Scale note: JSON parsing is the most expensive scan format Spark has
(row-wise text parse, no column pruning into the parse) — the docstring
contract is "land JSONL once, convert to parquet immediately"
(write_table), after which every downstream query gets columnar scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CORRUPT_COL = "_corrupt_record"


def read_jsonl(
    spark: SparkSession, path: str, schema: str
) -> tuple[DataFrame, DataFrame]:
    """Read a JSON-lines file/directory against an explicit schema.

    Returns ``(good, bad)``: ``good`` has exactly the declared columns and
    only fully-parsed rows; ``bad`` carries the raw text of every
    malformed or schema-violating line for quarantine/audit. Spark caveat
    handled here: rows where ONLY the corrupt column is selected can't be
    filtered reliably, so the split materializes from one cached parse of
    the full row."""
    full_schema = schema.rstrip() + f", {CORRUPT_COL} string"
    raw = (
        spark.read.schema(full_schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
        # Spark disallows referencing ONLY the corrupt column of a raw JSON
        # scan (QUERY_ONLY_CORRUPT_RECORD_COLUMN); caching the parsed rows
        # is the documented workaround and also makes the two-way split a
        # single parse instead of two.
        .cache()
    )
    good = raw.where(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = raw.where(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw_line")
    )
    return good, bad
