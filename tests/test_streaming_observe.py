"""Measured streaming-state gates (streaming/observe.py): the "bounded
state" and "late rows dropped" claims read from the engine's own progress
events, not argued from watermark math."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from enterprise_data_warehouse_spark.streaming.incremental import read_file_stream
from enterprise_data_warehouse_spark.streaming.observe import progress_summary
from enterprise_data_warehouse_spark.streaming.queries import event_stream

SF = "/root/testdata/sf0.001"


def test_dedup_state_bounded_by_distinct_keys(spark, tmp_path):
    doubled = event_stream(spark, SF).union(event_stream(spark, SF))
    deduped = (
        doubled.withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["event_id"])
        .select("event_id")
    )
    q = (
        deduped.writeStream.format("noop")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    s = progress_summary(q)
    n_events = 1000  # sf0.001 events rows
    assert s["rows_in"] == 2 * n_events
    # the dedup store holds at most one entry per distinct key (plus none
    # for the duplicate arrivals) — if state tracked arrivals instead of
    # keys this would be 2n
    assert 0 < s["state_rows_max"] <= n_events, s
    assert s["state_bytes_max"] > 0
    assert s["last_watermark"] != "", s


def test_late_rows_counted_dropped_by_engine(spark, tmp_path):
    src = str(tmp_path / "src")
    schema = "user_id bigint, ts timestamp"

    def arrive(rows):
        spark.createDataFrame(rows, schema).write.mode("append").parquet(src)

    def drain():
        q = (
            read_file_stream(spark, src, schema)
            .withWatermark("ts", "1 hour")
            .groupBy(F.window("ts", "1 hour").alias("w"))
            .agg(F.count("*").alias("n"))
            .writeStream.format("noop")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return progress_summary(q)

    t = lambda h, m: (1, dt.datetime(2024, 1, 1, h, m))  # noqa: E731
    arrive([t(10, 5), t(10, 20), t(12, 30)])  # watermark → 11:30
    s1 = drain()
    assert s1["late_rows_dropped"] == 0
    arrive([t(10, 15), t(14, 0)])  # 10:15 is behind the 11:30 watermark
    s2 = drain()
    assert s2["late_rows_dropped"] == 1, s2
