"""Custom stateful streaming operator (SURVEY.md §2.9 R3/R7 restated):
per-entity running EWMA + anomaly counter via ``applyInPandasWithState``.

The reference's monitoring loops recompute rolling statistics from scratch
every tick (reference ml_monitoring_system.py:1086-1158, 5-min/1-h asyncio
loops over SQL re-reads). A stateful streaming operator holds the running
statistic in the state store instead: each micro-batch updates per-user
state in O(batch) and emits the current estimate — no re-read, no
re-aggregation, state size bounded by entity cardinality (and by state TTL
at production scale; the reference's Redis TTL plays the same role,
ml_pipeline_framework.py:675-679).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..queries import query
from ..sources.tables import load_table

EWMA_ALPHA = 0.1
ANOMALY_Z = 3.0

STATE_SCHEMA = "ewma double, ewmvar double, n bigint, anomalies bigint"
OUTPUT_SCHEMA = (
    "user_id bigint, n_obs bigint, ewma double, ewm_std double, n_anomalies bigint"
)


def _update_ewma(key, pdfs: Iterator, state: GroupState):
    """Per-user update: fold this batch's values (ts-ordered) into the
    running EWMA/EW-variance; count |z| > 3 anomalies against the estimate
    as it stood when the value arrived."""
    import pandas as pd

    ewma, ewmvar, n, anomalies = (
        state.get if state.exists else (0.0, 0.0, 0, 0)
    )
    # Concatenate BEFORE sorting: the iterator hands the group's batch rows
    # in arbitrary chunks, and a chunk-local sort folds a multi-chunk group
    # out of ts-order — the EWMA (and the order-sensitive anomaly counter)
    # must see one globally ts-sorted pass per batch, matching the
    # ewma_fold_sql batch twin's ORDER BY.
    chunks = list(pdfs)
    batch = (
        pd.concat(chunks).sort_values("ts") if chunks else pd.DataFrame()
    )
    if len(batch):
        for v in batch["value"]:
            v = float(v)
            if n == 0:
                ewma, ewmvar = v, 0.0
            else:
                if ewmvar > 0 and abs(v - ewma) > ANOMALY_Z * (ewmvar**0.5):
                    anomalies += 1
                delta = v - ewma
                ewma += EWMA_ALPHA * delta
                ewmvar = (1 - EWMA_ALPHA) * (ewmvar + EWMA_ALPHA * delta * delta)
            n += 1
    state.update((ewma, ewmvar, n, anomalies))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_obs": [n],
            "ewma": [ewma],
            "ewm_std": [ewmvar**0.5],
            "n_anomalies": [anomalies],
        }
    )


def stateful_ewma(events: DataFrame) -> DataFrame:
    """Apply the stateful EWMA over a STREAMING events frame. Update mode:
    each micro-batch emits the refreshed rows for users seen in the batch."""
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _update_ewma,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


@query("stateful_user_ewma")
def stateful_user_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R3/R7 end-to-end: REAL readStream over events → applyInPandasWithState
    EWMA → memory sink, drained with availableNow. Rows-only driver check;
    tests assert parity with a batch recomputation."""
    import uuid

    from .incremental import run_stream_to_memory
    from .queries import event_stream

    name = "ewma_" + uuid.uuid4().hex[:8]
    table = run_stream_to_memory(
        spark, stateful_ewma(event_stream(spark, sf_dir)), name, output_mode="update"
    )
    return _latest_update_per_user(table)


# --- transformWithState TTL'd per-user feature cache -------------------------

TTL_MS = 60 * 60 * 1000  # state TTL: the reference's 3600 s feature-cache
#   TTL (ml_pipeline_framework.py:675-679 / feature_store_manager.py:71),
#   expressed natively as state-store TTL instead of a Redis EXPIRE. One
#   availableNow drain finishes far inside the window, so TTL never fires
#   in tests — its semantics (idle keys evicted, re-computed on next touch)
#   are the production behavior, not the test path.

CACHE_OUTPUT_SCHEMA = (
    "user_id bigint, n_obs bigint, mean_value double, last_value double, "
    "n_event_types bigint"
)


def _cents_half_up(values) -> int:
    """Σ round(v·100) with HALF-UP (away-from-zero) ties, matching Spark's
    F.round — pandas/numpy ``round`` is banker's (half-to-even), which
    diverges on exact .5 cent products (e.g. 1.125·100 = 112.5 → numpy
    112, Spark 113) and would break the exact batch-parity contract.

    Spark's F.round goes through BigDecimal of the double's shortest
    decimal form, so the Python mirror must too: a floor(x+0.5) trick
    re-rounds in binary (x = nextafter(0.5, 0) has x+0.5 == 1.0) and can
    disagree within 1 ulp of a tie."""
    from decimal import ROUND_HALF_UP, Decimal

    return sum(
        int(
            # the batch side is F.round(value * 100): the ×100 happens in
            # DOUBLE, then BigDecimal sees the product's shortest repr —
            # mirror both steps exactly
            Decimal(repr(float(v) * 100.0)).quantize(
                Decimal("1"), rounding=ROUND_HALF_UP
            )
        )
        for v in values
    )


class UserFeatureCache:
    """StatefulProcessor (Spark 4.x `transformWithStateInPandas`): per-user
    running feature row — count, exact mean (integer-cent sum, so the value
    is bit-identical to a batch aggregate), value at max event-time, and
    distinct event-type count held in a MapState.

    vs applyInPandasWithState (stateful_ewma above): typed named state
    variables instead of one packed tuple, per-state TTL, and MapState for
    the per-event-type sub-key — the modern surface for the reference's R7
    Redis feature cache."""

    def init(self, handle) -> None:
        self._agg = handle.getValueState(
            "agg",
            "cnt bigint, cents bigint, max_ts_us bigint, last_value double",
            ttlDurationMs=TTL_MS,
        )
        self._etypes = handle.getMapState(
            "etype_counts", "event_type string", "cnt bigint", ttlDurationMs=TTL_MS
        )

    def handleInputRows(self, key, rows, timerValues):
        import pandas as pd

        cnt, cents, max_ts_us, last_value = (
            self._agg.get() if self._agg.exists() else (0, 0, -1, 0.0)
        )
        for pdf in rows:
            cnt += len(pdf)
            cents += _cents_half_up(pdf["value"])
            batch_max = int(pdf["ts_us"].max())
            if batch_max > max_ts_us:
                max_ts_us = batch_max
                at_max = pdf[pdf["ts_us"] == batch_max]
                last_value = float(at_max["value"].iloc[0])
            for etype, n in pdf["event_type"].value_counts().items():
                prev = self._etypes.getValue((etype,))
                self._etypes.updateValue(
                    (etype,), (int(n) + (prev[0] if prev else 0),)
                )
        self._agg.update((cnt, cents, max_ts_us, last_value))
        n_types = sum(1 for _ in self._etypes.keys())
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_obs": [cnt],
                "mean_value": [cents / (100.0 * cnt)],
                "last_value": [last_value],
                "n_event_types": [n_types],
            }
        )

    def close(self) -> None:
        pass


def tws_available() -> bool:
    """transformWithState's Python workers speak protobuf to the JVM state
    server; this container ships pyspark without the protobuf package, so
    the modern path is import-gated exactly like the PIL-less image decode
    (operators/multimodal.py) — plumbing real, engine picks the path."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def user_feature_cache(events: DataFrame) -> DataFrame:
    """Apply the TTL'd feature cache over a STREAMING events frame (requires
    the RocksDB state store — transformWithState's backing engine)."""
    pre = events.select(
        "user_id",
        "event_type",
        "value",
        F.unix_micros(F.col("ts")).alias("ts_us"),
    )
    return pre.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=UserFeatureCache(),
        outputStructType=CACHE_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="ProcessingTime",
    )


FALLBACK_STATE_SCHEMA = (
    "cnt bigint, cents bigint, max_ts_us bigint, last_value double, "
    "etypes array<string>"
)


def _update_cache_fallback(key, pdfs, state: GroupState):
    """applyInPandasWithState twin of UserFeatureCache — one packed state
    tuple instead of named state variables, same arithmetic, same output."""
    import pandas as pd

    cnt, cents, max_ts_us, last_value, etypes = (
        state.get if state.exists else (0, 0, -1, 0.0, [])
    )
    etypes = set(etypes or [])
    for pdf in pdfs:
        cnt += len(pdf)
        cents += _cents_half_up(pdf["value"])
        batch_max = int(pdf["ts_us"].max())
        if batch_max > max_ts_us:
            max_ts_us = batch_max
            last_value = float(pdf[pdf["ts_us"] == batch_max]["value"].iloc[0])
        etypes.update(pdf["event_type"].tolist())
    state.update((cnt, cents, max_ts_us, last_value, sorted(etypes)))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_obs": [cnt],
            "mean_value": [cents / (100.0 * cnt)],
            "last_value": [last_value],
            "n_event_types": [len(etypes)],
        }
    )


def user_feature_cache_fallback(events: DataFrame) -> DataFrame:
    pre = events.select(
        "user_id", "event_type", "value", F.unix_micros(F.col("ts")).alias("ts_us")
    )
    return pre.groupBy("user_id").applyInPandasWithState(
        _update_cache_fallback,
        outputStructType=CACHE_OUTPUT_SCHEMA,
        stateStructType=FALLBACK_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def _latest_update_per_user(table: DataFrame) -> DataFrame:
    """update-mode memory sinks append every batch's emissions; keep the
    last row per user (the final state after the drain)."""
    w = Window.partitionBy("user_id").orderBy(F.desc("n_obs"))
    return (
        table.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn")
    )


@query("ttl_feature_cache")
def ttl_feature_cache(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R7/S11 restated as a stateful streaming feature cache: REAL
    readStream over events → per-user running feature row (count, exact
    integer-cent mean, value at max event-time, distinct event types) →
    memory sink, availableNow drain. Rows-only driver check; tests assert
    exact parity with the batch aggregate.

    Two engines: transformWithStateInPandas (ValueState + MapState, native
    1 h state TTL, RocksDB store) when protobuf is importable; otherwise
    the applyInPandasWithState twin (this container — see tws_available).
    Identical in any drain that finishes inside the TTL window (tests/CI).
    Under production TTL they age differently BY DESIGN: TWS expires each
    idle event-type map entry individually (per-sub-key cache aging — the
    behavior a feature cache wants), while the fallback's single packed
    tuple refreshes whole-row on any activity; choose accordingly."""
    import uuid

    from .incremental import run_stream_to_memory
    from .queries import event_stream

    stream = event_stream(spark, sf_dir)
    name = "ttlcache_" + uuid.uuid4().hex[:8]
    if tws_available():
        prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        )
        try:
            table = run_stream_to_memory(
                spark, user_feature_cache(stream), name, output_mode="update"
            )
        finally:
            if prev is None:
                spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
            else:
                spark.conf.set(
                    "spark.sql.streaming.stateStore.providerClass", prev
                )
    else:
        table = run_stream_to_memory(
            spark, user_feature_cache_fallback(stream), name, output_mode="update"
        )
    return _latest_update_per_user(table)
