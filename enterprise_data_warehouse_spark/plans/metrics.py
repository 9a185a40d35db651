"""Measured execution metrics (the quantitative half of tests/test_plans.py).

Plan-string gates prove the intended operators are present; this module
proves the intended DATA VOLUMES flow through them, from Spark's own
SQLAppStatusStore after a real run: how many records/bytes crossed each
shuffle, how many rows the scans produced. With it the 100 TB claims stop
being prose — "aggregation combines map-side" becomes `shuffle records ≪
scan rows`, asserted in CI (tests/test_measured_metrics.py).

Works on any SparkSession (the status store is part of the shared state;
no listeners to install, no UI requirement).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

_SIZE = {"B": 1, "KiB": 1024, "MiB": 1024**2, "GiB": 1024**3, "TiB": 1024**4}


def _parse_value(text: str) -> float | None:
    """Parse a formatted SQL-metric value: '6,000', '1118.0 B', '1.2 MiB',
    '10 ms', or 'total (min, med, max)' forms (first number wins)."""
    head = text.split(" (")[0].strip()
    m = re.match(r"^([\d.,-]+)\s*([A-Za-z]*)$", head)
    if not m:
        return None
    num = float(m.group(1).replace(",", ""))
    unit = m.group(2)
    if unit in _SIZE:
        return num * _SIZE[unit]
    if unit in ("ms", "s", "min", "h"):
        return None  # timings are host noise, never asserted
    return num


def run_with_metrics(spark: SparkSession, df: DataFrame) -> dict[str, float]:
    """Force ``df`` through a noop sink and return aggregated metrics of
    THAT execution: summed over operators for the shuffle counters, maxed
    for per-operator row counts.

    Keys: shuffle_records_written, shuffle_bytes_written, records_read,
    max_output_rows."""
    import uuid

    # Tag THIS save with a unique job description: on a shared session with
    # concurrent queries (parallel warehouse builds, parallel tests) "highest
    # executionId after the save" can be someone else's query — match the
    # execution by tag instead.
    tag = f"run_with_metrics-{uuid.uuid4().hex}"
    sc = spark.sparkContext
    prev = sc._jsc.sc().getLocalProperty("spark.job.description")
    sc.setJobDescription(tag)
    try:
        df.write.format("noop").mode("overwrite").save()
    finally:
        sc.setJobDescription(prev)
    # the status store is fed by the ASYNC listener bus — drain it before
    # reading, or executionsList() may not yet contain the save above (and
    # we'd silently aggregate the previous query's counters)
    sc._jsc.sc().listenerBus().waitUntilEmpty()
    store = spark._jsparkSession.sharedState().statusStore()
    execs = store.executionsList()
    tagged = [
        e
        for e in (execs.apply(i) for i in range(execs.size()))
        if str(e.description()) == tag
    ]
    assert tagged, f"status store lost the tagged execution {tag}"
    last = max(tagged, key=lambda e: e.executionId())
    values = store.executionMetrics(last.executionId())
    out = {
        "shuffle_records_written": 0.0,
        "shuffle_bytes_written": 0.0,
        "records_read": 0.0,
        "max_output_rows": 0.0,
    }
    seen: set[int] = set()
    it = last.metrics().iterator()
    while it.hasNext():
        m = it.next()
        mid = m.accumulatorId()
        if mid in seen or not values.contains(mid):
            continue
        seen.add(mid)
        v = _parse_value(str(values.apply(mid)))
        if v is None:
            continue
        name = str(m.name())
        if name == "shuffle records written":
            out["shuffle_records_written"] += v
        elif name == "shuffle bytes written":
            out["shuffle_bytes_written"] += v
        elif name == "records read":
            out["records_read"] += v
        elif name == "number of output rows":
            out["max_output_rows"] = max(out["max_output_rows"], v)
    return out
