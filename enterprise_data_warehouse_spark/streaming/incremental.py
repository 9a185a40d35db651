"""Structured Streaming re-expression of the reference's "real-time" surface
(SURVEY.md §2.9 R1–R6).

The reference has no true stream processing — its real-time layer is
incremental micro-batch MERGE (dbt) plus periodic monitoring loops. Here:

- R1/R6: file-source stream + watermark + foreachBatch MERGE.
  Trigger.AvailableNow reproduces batch-incremental exactly: each run
  drains new files, merges on the unique key (idempotent last-write-wins —
  the reference's late-data story), then stops.
- R4: tumbling/sliding window aggregations over event time.
- R5: session_window sessionization (the reference consumes pre-computed
  sessions; we derive them from raw events).

At scale: the file source tracks processed files in the checkpoint; MERGE
inside foreachBatch is the Delta pattern verbatim (merge_upsert is the
parquet fallback). State stores are keyed by (window/session, entity) —
watermarks bound their size.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..functions.deterministic import dec2dbl_s
from ..sources.sink import merge_upsert


def read_file_stream(
    spark: SparkSession, path: str, schema: str, fmt: str = "parquet"
) -> DataFrame:
    """File-source stream: schema-pinned (required), one-file-at-a-time
    ordering is not assumed anywhere downstream."""
    return spark.readStream.schema(schema).format(fmt).load(path)


def stream_incremental_merge(
    stream: DataFrame,
    target_path: str,
    keys: Sequence[str],
    checkpoint: str,
    retain_versions: int | None = 2,
) -> StreamingQuery:
    """R1+R6: watermarked micro-batch MERGE into the target — the dbt
    incremental materialization as a stream. Late rows re-merge on the key
    (last-write-wins), matching the reference's idempotent-upsert semantics.

    ``retain_versions`` defaults to 2: every micro-batch commits a full
    immutable version, so an unbounded stream would otherwise accumulate
    one table copy PER BATCH (storage ∝ batches × table size) and pay
    O(versions) marker reads per merge. Keeping 2 preserves the previous
    version for in-flight readers (plus the vacuum supersede-grace window);
    pass None to keep full history, or higher N for longer time travel.
    """
    def _merge(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        merge_upsert(
            batch.sparkSession,
            target_path,
            batch,
            keys,
            retain_versions=retain_versions,
        )

    return (
        stream.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def tumbling_counts(
    events: DataFrame,
    window_len: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """R4: tumbling event-time aggregation with late-data watermark."""
    src = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window(ts_col, window_len), F.col("event_type"))
        .agg(
            F.count("*").alias("n_events"),
            dec2dbl_s(F.sum(F.col("value").cast("decimal(38,10)")), 4).alias("total_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sliding_counts(
    events: DataFrame,
    window_len: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """R4: sliding window variant — each event lands in len/slide windows."""
    src = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window(ts_col, window_len, slide), F.col("event_type"))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n_events",
        )
    )


def session_metrics(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """R5: session_window sessionization — session ends after `gap` of
    inactivity; emits per-session metrics (duration, events, value, bounce).
    Works identically on batch and streaming inputs (state-store-backed when
    streaming)."""
    src = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    return (
        src.groupBy(F.session_window(F.col(ts_col), gap), F.col("user_id"))
        .agg(
            F.count("*").alias("n_events"),
            dec2dbl_s(F.sum(F.col("value").cast("decimal(38,10)")), 4).alias("session_value"),
            F.min(ts_col).alias("first_event"),
            F.max(ts_col).alias("last_event"),
        )
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            (
                F.unix_timestamp("last_event") - F.unix_timestamp("first_event")
            ).alias("active_seconds"),
            "n_events",
            "session_value",
            (F.col("n_events") == 1).alias("is_bounce"),
        )
    )


def run_stream_to_memory(
    spark: SparkSession, df: DataFrame, name: str, output_mode: str = "complete"
) -> DataFrame:
    """Drain a (bounded) stream into an in-memory table and return it —
    availableNow trigger, so this terminates once current data is consumed."""
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def stream_mv_merge(
    stream: DataFrame,
    target_path: str,
    group_keys: Sequence[str],
    measure_col: str,
    checkpoint: str,
) -> StreamingQuery:
    """Streaming materialized-view maintenance: each micro-batch is reduced
    to PARTIAL AGGREGATE STATES (count + exact decimal sum per group) and
    merged into the stored MV — the streaming rail of
    operators/facts.mv_incremental_maintenance, and the foreachBatch shape
    every Delta/Iceberg streaming-MV pipeline uses.

    Because the states are associative/commutative, merge-per-batch equals
    a full recompute over everything ever streamed (pinned in tests across
    multi-batch arrivals + restarts from the checkpoint). Cost per batch:
    |batch| + |touched groups| — the base stream is never replayed.

    The MV stores (keys, n, sum_dec DECIMAL(38,10)) plus two constant
    columns — ``_last_batch_id`` and ``_ckpt`` (hash of the checkpoint
    location) — which readers drop; finalize (e.g. dec2dbl) at query time,
    exactly like mv_rollup_routing. Read it back with ``read_table``.

    Failure semantics: each batch's merged MV lands as a NEW VERSION of a
    commit-manifest table (sources/versioned.py) — marker-last, so a crash
    at ANY point leaves the previous MV fully readable and the replayed
    batch re-derives against it. (The pre-r05 staged-swap had a
    delete-then-rename window: a crash inside it left NO readable MV, and
    the replay then mistook that for the first batch and silently replaced
    history with one batch's partials.) "First batch" is decided by the
    manifest's exists() — a transient read error PROPAGATES and fails the
    micro-batch (the checkpoint retries it) instead of being mistaken for
    an empty MV. ``_last_batch_id`` makes the merge idempotent per
    batch_id: a crash between the version commit and the checkpoint commit
    replays the batch, sees its id already folded in, and skips — no
    double-merge. The guard is scoped to ONE checkpoint lineage via
    ``_ckpt``: batch ids restart from 0 under a fresh checkpoint, so
    comparing them across checkpoints would silently discard genuinely new
    data — a different checkpoint's batches always merge. History is
    vacuumed to 2 versions per batch (the merge_upsert retention
    rationale: unbounded streams must not accumulate one MV copy per
    batch)."""
    import hashlib

    from ..sources.sink import _adopt_plain
    from ..sources.versioned import VersionedTable

    ckpt_id = hashlib.md5(checkpoint.encode()).hexdigest()[:16]

    def _merge(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        spark = batch.sparkSession
        partial = batch.groupBy(*group_keys).agg(
            F.count("*").alias("n"),
            F.sum(F.col(measure_col).cast("decimal(38,10)")).alias("sum_dec"),
        )
        _adopt_plain(spark, target_path)  # migrate a legacy plain-parquet MV
        t = VersionedTable(spark, target_path)
        cur = t.current_version()
        if cur is not None:
            existing = t.read(version=cur)
            if "_last_batch_id" in existing.columns:
                # Constant columns → one row answers the replay probe.
                row = existing.select("_last_batch_id", "_ckpt").first()
                if (
                    row is not None
                    and row[0] is not None
                    and row[1] == ckpt_id
                    and batch_id <= row[0]
                ):
                    return  # replayed batch of THIS stream: already folded in
                existing = existing.drop("_last_batch_id", "_ckpt")
            merged = (
                existing.unionByName(partial)
                .groupBy(*group_keys)
                .agg(F.sum("n").alias("n"), F.sum("sum_dec").alias("sum_dec"))
            )
        else:
            merged = partial
        merged = merged.withColumn("_last_batch_id", F.lit(batch_id)).withColumn(
            "_ckpt", F.lit(ckpt_id)
        )
        # pinned to read_version+1: a rival (zombie driver after failover, a
        # manual backfill merge) committing between our read and our commit
        # collides on the marker and fails THIS micro-batch for a clean
        # checkpoint retry — an unpinned commit would land one version
        # higher with state derived from the stale read and silently revert
        # the rival's batches (versioned.commit's RMW contract)
        t.commit(merged, op="mv_merge", at_version=(cur or 0) + 1)
        t.vacuum(keep=2)

    return (
        stream.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
