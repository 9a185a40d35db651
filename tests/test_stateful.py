"""Stateful streaming EWMA: the streamed result must equal a batch
recomputation of the same fold (single availableNow drain ⇒ each user's
events arrive ts-ordered within one state update)."""

from __future__ import annotations

from enterprise_data_warehouse_spark.queries import load_registry
from enterprise_data_warehouse_spark.sources.tables import load_table
from enterprise_data_warehouse_spark.streaming.stateful import ANOMALY_Z, EWMA_ALPHA

SF = "/root/testdata/sf0.001"


def _batch_ewma(rows):
    ewma = ewmvar = 0.0
    n = anomalies = 0
    for v in rows:
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
    return n, ewma, ewmvar**0.5, anomalies


def test_stateful_ewma_matches_batch_fold(spark):
    reg = load_registry()
    got = {
        r["user_id"]: (r["n_obs"], r["ewma"], r["ewm_std"], r["n_anomalies"])
        for r in reg["stateful_user_ewma"].fn(spark, SF).collect()
    }
    events = (
        load_table(spark, SF, "events")
        .select("user_id", "ts", "value")
        .orderBy("user_id", "ts")
        .collect()
    )
    per_user: dict[int, list[float]] = {}
    for r in events:
        per_user.setdefault(r["user_id"], []).append(r["value"])
    assert set(got) == set(per_user)
    for uid, vals in per_user.items():
        n, ewma, std, anom = _batch_ewma(vals)
        gn, gewma, gstd, ganom = got[uid]
        assert gn == n, uid
        assert abs(gewma - ewma) < 1e-9, uid
        assert abs(gstd - std) < 1e-9, uid
        assert ganom == anom, uid


def test_ttl_feature_cache_matches_batch_aggregate(spark):
    """The streamed per-user feature row must equal the batch aggregate
    EXACTLY: mean from an integer-cent sum (no float-order drift), last
    value at max event-time, distinct event-type count. Whichever state
    engine ran (transformWithState or the applyInPandasWithState twin —
    see tws_available), the contract is the same."""
    from pyspark.sql import functions as F

    reg = load_registry()
    got = {
        r["user_id"]: (
            r["n_obs"],
            r["mean_value"],
            r["last_value"],
            r["n_event_types"],
        )
        for r in reg["ttl_feature_cache"].fn(spark, SF).collect()
    }
    ev = load_table(spark, SF, "events")
    cents = F.sum(F.round(F.col("value") * 100).cast("bigint"))
    want = {
        r["user_id"]: (
            r["n_obs"],
            r["cents"] / (100.0 * r["n_obs"]),
            r["last_value"],
            r["n_event_types"],
        )
        for r in ev.groupBy("user_id")
        .agg(
            F.count("*").alias("n_obs"),
            cents.alias("cents"),
            F.max_by("value", "ts").alias("last_value"),
            F.countDistinct("event_type").alias("n_event_types"),
        )
        .collect()
    }
    assert got == want


def test_ewma_fold_sql_bit_matches_streamed_state(spark):
    """The JVM fold (oracle-verified) and the streamed state (python fold)
    execute the identical IEEE sequence over the identical ts-order, so
    their EWMAs must be BIT-identical — any future divergence bisects to
    state plumbing vs arithmetic."""
    reg = load_registry()
    fold = {
        r["user_id"]: (r["n_obs"], r["ewma"])
        for r in reg["ewma_fold_sql"].fn(spark, SF).collect()
    }
    streamed = {
        r["user_id"]: (r["n_obs"], r["ewma"])
        for r in reg["stateful_user_ewma"].fn(spark, SF).collect()
    }
    assert fold == streamed
