"""Streaming observability: turn ``StreamingQuery.recentProgress`` into the
numbers the "bounded state" claims are made of.

Every watermarked operator here asserts its state is bounded — this module
makes that MEASURED rather than argued (the streaming counterpart of
plans/metrics.py): state rows, state memory, rows dropped by the
watermark, and the watermark's advance, aggregated across a run's
micro-batch progress events. tests/test_streaming_observe.py pins the
claims: the dedup store holds ≤ distinct keys, watermarks advance, and
late rows are counted as DROPPED by the engine itself.
"""

from __future__ import annotations

from pyspark.sql.streaming import StreamingQuery


def progress_summary(query: StreamingQuery) -> dict:
    """Aggregate a (finished or running) query's recentProgress into:

    - ``n_batches``: progress events seen
    - ``rows_in``: total input rows
    - ``state_rows_max``: peak total state rows across operators
    - ``state_bytes_max``: peak state memory
    - ``late_rows_dropped``: Σ numRowsDroppedByWatermark
    - ``last_watermark``: the final event-time watermark string ("" until
      the first advance)
    """
    out = {
        "n_batches": 0,
        "rows_in": 0,
        "state_rows_max": 0,
        "state_bytes_max": 0,
        "late_rows_dropped": 0,
        "last_watermark": "",
    }
    for p in query.recentProgress:
        out["n_batches"] += 1
        out["rows_in"] += int(p.get("numInputRows", 0) or 0)
        ops = p.get("stateOperators") or []
        out["state_rows_max"] = max(
            out["state_rows_max"],
            sum(int(op.get("numRowsTotal", 0) or 0) for op in ops),
        )
        out["state_bytes_max"] = max(
            out["state_bytes_max"],
            sum(int(op.get("memoryUsedBytes", 0) or 0) for op in ops),
        )
        out["late_rows_dropped"] += sum(
            int(op.get("numRowsDroppedByWatermark", 0) or 0) for op in ops
        )
        wm = (p.get("eventTime") or {}).get("watermark")
        if wm:
            out["last_watermark"] = wm
    return out
