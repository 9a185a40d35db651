"""Registry queries for the streaming layer (SURVEY.md §2.9).

tumbling/session aggregations run on the batch path here (same code path as
streaming — `F.window`/`F.session_window` are engine-level operators), so
they are DuckDB-oracle-checkable. `streaming_hourly_counts` runs the REAL
readStream → availableNow → memory-sink loop; the driver records it
rows-only, and tests assert it equals the batch result.
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.deterministic import dec2dbl_s
from ..queries import query
from ..sources.tables import load_table
from .incremental import (
    run_stream_to_memory,
    session_metrics,
    sliding_counts,
    tumbling_counts,
)


def event_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events table, schema-pinned (required by
    readStream) and generation-adaptive: the driver's testdata has stored
    ``ts`` both as TIMESTAMP(NANOS) (surfacing as long ns under the legacy
    flag) and as naive TIMESTAMP(MICROS) (surfacing as LTZ under
    ``inferTimestampNTZ=false``). We peek at the BATCH schema — a footer
    read via load_table, which also provisions the session confs — and pin
    the matching stream schema, so every streaming query shares one source
    definition instead of five drifting copies."""
    ts_type = dict(load_table(spark, sf_dir, "events").dtypes)["ts"]
    if ts_type == "bigint":
        schema = (
            "event_id bigint, ts bigint, user_id bigint, event_type string, "
            "value double, props string"
        )
        conv = lambda df: df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))  # noqa: E731
    else:
        schema = (
            "event_id bigint, ts timestamp, user_id bigint, event_type string, "
            "value double, props string"
        )
        conv = lambda df: df  # noqa: E731
    return conv(
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )

TUMBLING_ORACLE = """
SELECT
  DATE_TRUNC('hour', ts) AS window_start,
  DATE_TRUNC('hour', ts) + INTERVAL 1 HOUR AS window_end,
  event_type,
  COUNT(*) AS n_events,
  (CAST(FLOOR(ROUND(SUM(CAST(value AS DECIMAL(38,10))), 4)) AS DOUBLE) + CAST(ROUND(SUM(CAST(value AS DECIMAL(38,10))), 4) - FLOOR(ROUND(SUM(CAST(value AS DECIMAL(38,10))), 4)) AS DOUBLE)) AS total_value
FROM events
GROUP BY 1, 2, 3
"""


@query("tumbling_hourly_counts", oracle=TUMBLING_ORACLE)
def tumbling_hourly_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R4 batch path: F.window tumbling aggregation (same operator the
    stream runs)."""
    e = load_table(spark, sf_dir, "events")
    out = tumbling_counts(e)
    return out.withColumn(
        "total_value", dec2dbl_s(F.col("total_value").cast("decimal(38,10)"), 4)
    )


SESSION_ORACLE = """
WITH seq AS (
  SELECT user_id, ts, value,
    LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
  FROM events
), flagged AS (
  SELECT user_id, ts, value,
    CASE WHEN prev_ts IS NULL
           OR DATEDIFF('second', prev_ts, ts) > 1800 THEN 1 ELSE 0 END AS new_session
  FROM seq
), numbered AS (
  SELECT user_id, ts, value,
    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
  FROM flagged
)
SELECT user_id,
  MIN(ts) AS session_start,
  MAX(ts) + INTERVAL 30 MINUTE AS session_end,
  DATEDIFF('second', MIN(ts), MAX(ts)) AS active_seconds,
  COUNT(*) AS n_events,
  (CAST(FLOOR(ROUND(SUM(CAST(value AS DECIMAL(38,10))), 4)) AS DOUBLE) + CAST(ROUND(SUM(CAST(value AS DECIMAL(38,10))), 4) - FLOOR(ROUND(SUM(CAST(value AS DECIMAL(38,10))), 4)) AS DOUBLE)) AS session_value,
  (COUNT(*) = 1) AS is_bounce
FROM numbered
GROUP BY user_id, session_seq
"""


@query("session_metrics_batch", oracle=SESSION_ORACLE, bench=True)
def session_metrics_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R5: session_window sessionization (30-min inactivity gap). The oracle
    re-derives sessions with the lag/cumsum idiom — same semantics, which is
    exactly the point: one engine-native operator replaces the whole CTE
    stack. Session end = last event + gap (session_window contract).

    Caveat encoded here: Spark merges sessions whose windows OVERLAP
    (gap boundary inclusive), the lag idiom splits at strictly-greater —
    DATEDIFF > 1800 in the oracle matches session_window's merge rule.
    """
    e = load_table(spark, sf_dir, "events")
    out = session_metrics(e)
    return out.withColumn(
        "session_value", dec2dbl_s(F.col("session_value").cast("decimal(38,10)"), 4)
    )


@query("streaming_hourly_counts")
def streaming_hourly_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R1/R4 end-to-end: a REAL readStream over the events parquet with
    watermark + tumbling agg, drained via Trigger.AvailableNow into a memory
    sink. Rows-only driver check; tests assert equality with the batch path.
    """
    # file source needs a directory: stream the sf dir, globbed to events
    agg = tumbling_counts(event_stream(spark, sf_dir))
    name = "stream_hourly_" + uuid.uuid4().hex[:8]
    return run_stream_to_memory(spark, agg, name)


SLIDING_ORACLE = """
WITH slots AS (
  SELECT event_type, value,
    time_bucket(INTERVAL '15 minutes', ts)
      - unnest(range(0, 4)) * INTERVAL '15 minutes' AS window_start
  FROM events
)
SELECT window_start,
       window_start + INTERVAL 1 HOUR AS window_end,
       event_type,
       COUNT(*) AS n_events
FROM slots
GROUP BY 1, 2, 3
"""


@query("sliding_hourly_counts", oracle=SLIDING_ORACLE)
def sliding_hourly_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R4 sliding variant: 1-hour windows sliding every 15 min — each event
    lands in 4 windows. The oracle re-derives window membership from slot
    arithmetic (truncate to the slide grid, back off 0..3 slides); Spark's
    `window(ts, '1 hour', '15 minutes')` is the same expansion done by the
    engine. Expansion is narrow (explode in the map stage); the shuffle keys
    are (window, event_type)."""
    e = load_table(spark, sf_dir, "events")
    out = sliding_counts(e)
    return out


@query("streaming_dedup_events")
def streaming_dedup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup: dropDuplicatesWithinWatermark on event_id over
    a REAL readStream (duplicates injected by unioning the same glob twice).
    The watermark bounds the dedup state store — keys older than 1 hour of
    event time are evicted, so state is O(keys-per-hour), not O(stream
    history): the property that makes streaming dedup viable at 100 TB/day.
    Batch-path equality is asserted in tests; rows-only driver check
    (append-mode memory-sink drain)."""
    doubled = event_stream(spark, sf_dir).union(
        event_stream(spark, sf_dir)
    )  # every event arrives twice
    deduped = (
        doubled.withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["event_id"])
        .select("event_id", "ts", "user_id", "event_type", "value")
    )
    name = "stream_dedup_" + uuid.uuid4().hex[:8]
    return run_stream_to_memory(spark, deduped, name, output_mode="append")


@query("streaming_session_metrics")
def streaming_session_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R5 end-to-end on a REAL stream: readStream → session_window (30-min
    gap, 2 h watermark bounding merge state) → availableNow drain. Same
    `session_metrics` builder as the batch/oracle query — the operator is
    identical on both rails; only the source and the state store differ.
    Complete-mode drain of the bounded stream emits every session, so tests
    assert exact equality with `session_metrics_batch`. Rows-only driver
    check (real stream)."""
    out = session_metrics(event_stream(spark, sf_dir)).withColumn(
        "session_value",
        dec2dbl_s(F.col("session_value").cast("decimal(38,10)"), 4),
    )
    name = "stream_sessions_" + uuid.uuid4().hex[:8]
    return run_stream_to_memory(spark, out, name)


ENRICHED_ORACLE = """
SELECT
  DATE_TRUNC('hour', e.ts) AS window_start,
  c.c_mktsegment AS segment,
  COUNT(*) AS n_events,
  COUNT(DISTINCT e.user_id) AS n_users
FROM events e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY 1, 2
"""


def _segment_hourly(events: DataFrame, customer: DataFrame) -> DataFrame:
    """Shared stream/batch builder: enrich events with the customer dim,
    aggregate hourly counts per market segment."""
    enriched = events.join(
        F.broadcast(customer.select("c_custkey", "c_mktsegment")),
        events.user_id == F.col("c_custkey"),
    )
    return (
        enriched.groupBy(
            F.window("ts", "1 hour"), F.col("c_mktsegment").alias("segment")
        )
        .agg(
            F.count("*").alias("n_events"),
            F.approx_count_distinct("user_id").alias("n_users_approx"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "segment",
            "n_events",
            "n_users_approx",
        )
    )


@query("segment_hourly_counts", oracle=ENRICHED_ORACLE)
def segment_hourly_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch path of the stream-static enrichment: events ⋈ broadcast
    customer dim → hourly counts per market segment. The oracle checks the
    join+window semantics with exact COUNT(DISTINCT); the streaming twin
    (below) runs the same builder where distinct-count must be the HLL++
    sketch (exact distinct isn't incrementally mergeable across
    micro-batches without keeping every key in state)."""
    e = load_table(spark, sf_dir, "events")
    c = load_table(spark, sf_dir, "customer")
    # oracle-exact variant: batch can afford exact distinct
    enriched = e.join(
        F.broadcast(c.select("c_custkey", "c_mktsegment")),
        e.user_id == F.col("c_custkey"),
    )
    return (
        enriched.groupBy(F.window("ts", "1 hour"), F.col("c_mktsegment").alias("segment"))
        .agg(F.count("*").alias("n_events"), F.countDistinct("user_id").alias("n_users"))
        .select(
            F.col("window.start").alias("window_start"),
            "segment",
            "n_events",
            "n_users",
        )
    )


@query("streaming_segment_counts")
def streaming_segment_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join end-to-end: a REAL readStream over events joined
    per-micro-batch to the static customer dimension (broadcast — the join
    is stateless map-side work; only the windowed agg keeps state), drained
    via availableNow. The canonical streaming-enrichment topology: facts
    stream, dims are slowly-changing tables re-read per batch. Rows-only
    driver check; tests assert equality with the batch builder."""
    c = load_table(spark, sf_dir, "customer")
    out = _segment_hourly(event_stream(spark, sf_dir), c)
    name = "stream_segments_" + uuid.uuid4().hex[:8]
    return run_stream_to_memory(spark, out, name)


# --- stream-stream join -------------------------------------------------------



def _view_click_join(views: DataFrame, clicks: DataFrame) -> DataFrame:
    """Inner join: click within 30 minutes AFTER a view by the same user.
    Shared by the batch twin and the stream-stream query so the semantics
    are one piece of code."""
    v = views.select(
        F.col("user_id").alias("v_user"),
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("view_ts"),
    )
    c = clicks.select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    cond = (
        (F.col("v_user") == F.col("c_user"))
        & (F.col("click_ts") > F.col("view_ts"))
        & (F.col("click_ts") <= F.col("view_ts") + F.expr("INTERVAL 30 MINUTES"))
    )
    return v.join(c, cond).select(
        F.col("v_user").alias("user_id"), "view_id", "click_id", "view_ts", "click_ts"
    )


VIEW_CLICK_JOIN_ORACLE = """
SELECT v.user_id, v.event_id AS view_id, c.event_id AS click_id,
       v.ts AS view_ts, c.ts AS click_ts
FROM (SELECT * FROM events WHERE event_type = 'view') v
JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON v.user_id = c.user_id
 AND c.ts > v.ts AND c.ts <= v.ts + INTERVAL 30 MINUTE
"""


@query("view_click_within_30m", oracle=VIEW_CLICK_JOIN_ORACLE)
def view_click_within_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the stream-stream join: every (view, click) pair by the
    same user with the click ≤30 min after the view. Equi-join on user_id
    with the time bound as a join-level range predicate — Catalyst keeps the
    shuffle keyed on user_id only."""
    e = load_table(spark, sf_dir, "events")
    return _view_click_join(
        e.where(F.col("event_type") == "view"),
        e.where(F.col("event_type") == "click"),
    )


@query("streaming_view_click_join")
def streaming_view_click_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL stream-stream inner join: views stream ⋈ clicks stream with
    1-hour watermarks on both sides and the 30-minute event-time bound in
    the join condition — exactly the state-cleanup contract Structured
    Streaming needs (each side's join state is dropped once the other
    side's watermark passes the bound, so state is O(watermark window), not
    O(stream history)). Drained via availableNow into a memory sink; tests
    assert row-set equality with the batch twin. Rows-only driver check
    (the drain is not a SQL-expressible shape)."""
    e = event_stream(spark, sf_dir)
    views = e.where(F.col("event_type") == "view").withWatermark("ts", "1 hour")
    clicks = e.where(F.col("event_type") == "click").withWatermark("ts", "1 hour")
    out = _view_click_join(views, clicks)
    name = "stream_vc_join_" + uuid.uuid4().hex[:8]
    return run_stream_to_memory(spark, out, name, output_mode="append")


# --- corpus ingest: the documents-side streaming rail ------------------------


def document_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the documents table (schema-pinned; required
    by readStream). The LLM-pipeline analogue of event_stream: a crawler /
    ingestion bus delivering raw documents."""
    load_table(spark, sf_dir, "documents")  # provision session confs
    return (
        spark.readStream.schema(
            "doc_id bigint, text string, lang string, source string, n_chars bigint"
        )
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )


def _ingest_stats(docs: DataFrame) -> DataFrame:
    """Per-source ingest acceptance rollup over the Gopher quality gate —
    a pure stateless projection + one grouped integer aggregate, so the
    SAME builder runs on the batch frame and the readStream."""
    from ..operators.text import gopher_features

    feat = gopher_features(docs, carry=("source",))
    keep = F.col("keep").cast("int")
    return feat.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(keep).alias("n_kept"),
        F.sum(1 - keep).alias("n_rejected"),
        F.sum(F.when(F.col("keep"), F.col("n_words")).otherwise(0)).alias(
            "kept_words"
        ),
    )


# built FROM the text.py constants (like GOPHER_ORACLE itself) so tuning a
# threshold can never leave this oracle silently stale
def _gopher_keep_sql() -> str:
    from ..operators.text import (
        GOPHER_MAX_MWL,
        GOPHER_MAX_WORDS,
        GOPHER_MIN_ALPHA_FRAC,
        GOPHER_MIN_DISTINCT_RATIO,
        GOPHER_MIN_MWL,
        GOPHER_MIN_STOPWORDS,
        GOPHER_MIN_WORDS,
        STOPWORDS,
    )

    sw = ",".join(f"'{w}'" for w in STOPWORDS)
    return f"""
  (LEN(w) BETWEEN {GOPHER_MIN_WORDS} AND {GOPHER_MAX_WORDS})
  AND (CAST(list_sum(list_transform(w, x -> LEN(x))) AS DOUBLE) / LEN(w)
       BETWEEN {GOPHER_MIN_MWL} AND {GOPHER_MAX_MWL})
  AND (CAST(LEN(list_filter(w, x -> regexp_matches(x, '[a-z]'))) AS DOUBLE)
       / LEN(w) >= {GOPHER_MIN_ALPHA_FRAC})
  AND (LEN(list_filter(w, x -> x IN ({sw}))) >= {GOPHER_MIN_STOPWORDS})
  AND (CAST(LEN(list_distinct(w)) AS DOUBLE) / LEN(w)
       >= {GOPHER_MIN_DISTINCT_RATIO})
"""


_GOPHER_KEEP_SQL = _gopher_keep_sql()

INGEST_ORACLE = f"""
WITH toks AS (
  SELECT source, string_split(text, ' ') AS w FROM documents
), feat AS (
  SELECT source, LEN(w) AS n_words, ({_GOPHER_KEEP_SQL}) AS keep FROM toks
)
SELECT source,
  COUNT(*) AS n_docs,
  CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
  CAST(SUM(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT) AS n_rejected,
  CAST(SUM(CASE WHEN keep THEN n_words ELSE 0 END) AS BIGINT) AS kept_words
FROM feat GROUP BY source
"""


@query("corpus_ingest_stats", oracle=INGEST_ORACLE)
def corpus_ingest_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch path of the ingest-time quality gate: per-source document
    counts, Gopher-rule accept/reject split, and kept-token volume — the
    acceptance dashboard a crawl operator watches. Constants mirror
    operators/text.py's GOPHER_* (oracle inlines them). All aggregates are
    integers; the rule ratios are per-row IEEE divisions — engine-exact."""
    return _ingest_stats(load_table(spark, sf_dir, "documents"))


@query("streaming_corpus_ingest")
def streaming_corpus_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REAL streaming rail of corpus_ingest_stats: readStream over the
    documents parquet → the identical stateless Gopher projection → grouped
    integer aggregate in complete mode (no event-time column exists on a
    crawl feed, and none is needed — the rollup keys are low-cardinality
    sources, so state is O(|sources|), bounded without a watermark) →
    availableNow drain. Rows-only driver check; tests assert exact equality
    with the batch twin."""
    out = _ingest_stats(document_stream(spark, sf_dir))
    name = "stream_ingest_" + uuid.uuid4().hex[:8]
    return run_stream_to_memory(spark, out, name)
