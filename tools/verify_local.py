"""Local replica of the driver's correctness harness.

Runs each named query under a PLAIN SparkSession (no engine confs — the
driver builds its own session) and its DuckDB oracle at the given sf_dir,
sorts columns by name / rows by value, and diffs values exactly. Usage:

    python tools/verify_local.py [sf_dir] [query ...]

With no query names, runs everything that has an oracle.
"""

from __future__ import annotations

import math
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

from enterprise_data_warehouse_spark.queries import load_registry  # noqa: E402
from enterprise_data_warehouse_spark.sources.tables import TABLE_NAMES  # noqa: E402


def norm_cell(v):
    import datetime

    import numpy as np
    import pandas as pd

    if isinstance(v, np.ndarray):
        v = list(v)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    if isinstance(v, np.generic):
        v = v.item()
    if v is None or v is pd.NaT:
        # Spark null (None) and pandas NaT must normalize identically
        return "None"
    if isinstance(v, pd.Timestamp):
        v = v.to_pydatetime()
    if isinstance(v, datetime.datetime):
        # date-at-midnight and date compare equal (duckdb returns DATE as
        # datetime64; Spark returns datetime.date)
        if v.time() == datetime.time(0, 0):
            return v.date().isoformat()
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return repr(v)


def to_rows(pdf):
    cols = sorted(pdf.columns)
    rows = [tuple(norm_cell(v) for v in row) for row in pdf[cols].itertuples(index=False)]
    return cols, sorted(rows)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:]
    registry = load_registry()
    if names == ["--bench"]:
        # the 28 oracle-paired bench queries — the set SCALING.md's sf1
        # correctness sweep runs: `verify_local.py /root/repo/testdata_sf1 --bench`
        names = [n for n, s in registry.items() if s.bench and s.oracle]
    elif not names:
        names = [n for n, s in registry.items() if s.oracle is not None]

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("verify-local")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    con = duckdb.connect()
    import os

    for t in TABLE_NAMES:
        src = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(src):  # Spark-written table dir (e.g. testdata_sf1)
            src = f"{src}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")

    n_pass = n_fail = 0
    for name in names:
        spec = registry[name]
        try:
            spdf = spec.fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if spec.oracle is None:
            print(f"SKIP {name}: rows-only ({len(spdf)} rows)")
            continue
        try:
            odf = con.execute(spec.oracle).fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: oracle error {type(e).__name__}: {e}")
            n_fail += 1
            continue
        scols, srows = to_rows(spdf)
        ocols, orows = to_rows(odf)
        if scols != ocols:
            print(f"FAIL {name}: columns spark={scols} oracle={ocols}")
            n_fail += 1
            continue
        if len(srows) != len(orows):
            print(f"FAIL {name}: rows spark={len(srows)} oracle={len(orows)}")
            n_fail += 1
            continue
        diffs = [(i, a, b) for i, (a, b) in enumerate(zip(srows, orows)) if a != b]
        if diffs:
            print(f"FAIL {name}: {len(diffs)}/{len(srows)} row diffs; cols={scols}")
            for i, a, b in diffs[:5]:
                for c, (x, y) in enumerate(zip(a, b)):
                    if x != y:
                        print(f"    row {i} col {scols[c]}: spark={x} oracle={y}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(srows)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
