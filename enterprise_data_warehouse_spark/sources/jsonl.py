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
    malformed or schema-violating line for quarantine/audit.

    Mechanics: a text scan + ``from_json``, NOT ``spark.read.json`` — the
    native JSON scan refuses plans that reference only its corrupt column
    (QUERY_ONLY_CORRUPT_RECORD_COLUMN), and the documented cache()
    workaround would pin every ingested feed in executor storage for the
    session lifetime. from_json has neither problem, both split frames
    stay fully lazy, and each is one text scan + parse when materialized."""
    full_schema = schema.rstrip() + f", {CORRUPT_COL} string"
    lines = spark.read.text(path).where(F.length(F.trim("value")) > 0)
    parsed = lines.select(
        "value",
        F.from_json(
            "value",
            full_schema,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL},
        ).alias("r"),
    )
    good = (
        parsed.where(F.col(f"r.{CORRUPT_COL}").isNull())
        .select("r.*")
        .drop(CORRUPT_COL)
    )
    bad = parsed.where(F.col(f"r.{CORRUPT_COL}").isNotNull()).select(
        F.col("value").alias("raw_line")
    )
    return good, bad
