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

from pyspark.sql import DataFrame, SparkSession
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
    for pdf in pdfs:
        pdf = pdf.sort_values("ts")
        for v in pdf["value"]:
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

    from .queries import event_stream

    out = stateful_ewma(event_stream(spark, sf_dir))
    name = "ewma_" + uuid.uuid4().hex[:8]
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # update-mode memory sink appends each batch's emissions; keep the last
    # row per user (final state after the drain)
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.desc("n_obs"))
    return (
        spark.table(name)
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn")
    )
