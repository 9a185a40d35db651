"""Time-travel reads and schema-evolution MERGE as oracle-paired queries.

The commit-manifest protocol (sources/versioned.py) has supported pinned
version reads and ``merge(evolve_schema=True)`` since round 4, with pytest
coverage but no registered query exercising either against the DuckDB
oracle (VERDICT r04 #8). Both capabilities are reference-relevant: the
reference's Snowflake backend gives time travel (AT/BEFORE) and
``on_schema_change: append_new_columns`` (dbt_project.yml incremental
config) for free; here they ride the VersionedTable layout.

Each query materializes a small versioned table in a throwaway tmp dir
(the protocol is the thing under test — the data is derived
deterministically from the sf tables, so the oracle can restate the final
result over the raw parquet)."""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..queries import query
from ..sources.tables import load_table
from ..sources.versioned import VersionedTable


def _work_dir(kind: str, sf_dir: str) -> str:
    """Reusable scratch root per (query, sf, PROCESS): this run's previous
    tree is removed before rebuilding, so repeated driver/bench/test
    executions hold at most one tree per query per process instead of
    leaking a fresh mkdtemp each call. The PID suffix keeps concurrent
    harness processes (e.g. bench and verify_local on the same sf) from
    rmtree'ing each other's live tables mid-query; stale trees from dead
    peer processes are reaped by age. (The returned DataFrame reads these
    files lazily — the caller must collect before re-invoking the same
    query in the same process, which every driver/test harness does.)"""
    import time

    base = os.path.join(tempfile.gettempdir(), "edw_query_work")
    stem = f"{kind}_{os.path.basename(sf_dir.rstrip('/'))}"
    root = os.path.join(base, f"{stem}_pid{os.getpid()}")
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root, exist_ok=True)
    # Reap peers' trees only when provably stale (>1h untouched): a live
    # concurrent harness keeps its tree younger than that for any sane
    # run. Staleness is the NEWEST mtime anywhere in the tree — the root
    # dir's own mtime freezes at query start (subdir creation), so keying
    # on it would reap a peer whose long-running query is still writing
    # versions deep inside.
    cutoff = time.time() - 3600

    def newest_mtime(tree: str) -> float:
        newest = 0.0
        for dirpath, _, files in os.walk(tree):
            try:
                newest = max(newest, os.path.getmtime(dirpath))
                for f in files:
                    newest = max(
                        newest, os.path.getmtime(os.path.join(dirpath, f))
                    )
            except OSError:
                return float("inf")  # fail closed: unknown age reads young
        return newest

    try:
        for name in os.listdir(base):
            peer = os.path.join(base, name)
            if peer == root or not name.startswith(f"{stem}_pid"):
                continue
            if newest_mtime(peer) < cutoff:
                shutil.rmtree(peer, ignore_errors=True)
    except OSError:
        pass
    return root


def _segment_rollup(customer: DataFrame) -> DataFrame:
    return customer.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        F.sum(F.floor(F.col("c_acctbal") * 100).cast("bigint"))
        .cast("bigint")
        .alias("acctbal_cents"),
    )


TIME_TRAVEL_ORACLE = """
WITH v1 AS (
  SELECT c_mktsegment,
         CAST(COUNT(*) AS BIGINT) AS n_customers,
         CAST(SUM(CAST(FLOOR(c_acctbal * 100) AS BIGINT)) AS BIGINT)
           AS acctbal_cents
  FROM customer WHERE c_custkey % 2 = 0 GROUP BY c_mktsegment
), v2 AS (
  SELECT c_mktsegment,
         CAST(COUNT(*) AS BIGINT) AS n_customers,
         CAST(SUM(CAST(FLOOR(c_acctbal * 100) AS BIGINT)) AS BIGINT)
           AS acctbal_cents
  FROM customer GROUP BY c_mktsegment
)
SELECT 'v1' AS snapshot, v1.* FROM v1
UNION ALL
SELECT 'v2' AS snapshot, v2.* FROM v2
"""


@query("time_travel_read", oracle=TIME_TRAVEL_ORACLE)
def time_travel_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pinned version reads: commit a half-corpus rollup as v1, overwrite
    with the full-corpus rollup as v2, then read BOTH versions back —
    ``read(version=1)`` must still return the superseded snapshot (every
    committed version is immutable until vacuumed; Snowflake ``AT``
    semantics on the commit-manifest layout)."""
    c = load_table(spark, sf_dir, "customer")
    root = _work_dir("timetravel", sf_dir)
    t = VersionedTable(spark, f"{root}/t")
    t.commit(_segment_rollup(c.where(F.col("c_custkey") % 2 == 0)))
    t.commit(_segment_rollup(c))
    return (
        t.read(version=1).select(F.lit("v1").alias("snapshot"), "*")
        .unionByName(t.read(version=2).select(F.lit("v2").alias("snapshot"), "*"))
    )


SCHEMA_EVOLUTION_ORACLE = """
WITH target AS (
  SELECT o_orderkey,
         CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS total_cents
  FROM orders WHERE o_orderdate < TIMESTAMP '1999-01-01'
), delta AS (
  SELECT o_orderkey,
         CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS total_cents,
         o_orderpriority
  FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01'
)
SELECT o_orderkey, total_cents, o_orderpriority FROM delta
UNION ALL
SELECT t.o_orderkey, t.total_cents, CAST(NULL AS VARCHAR) AS o_orderpriority
FROM target t
WHERE NOT EXISTS (SELECT 1 FROM delta d WHERE d.o_orderkey = t.o_orderkey)
"""


@query("schema_evolution_merge", oracle=SCHEMA_EVOLUTION_ORACLE)
def schema_evolution_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Add-column MERGE (dbt ``on_schema_change: append_new_columns``): the
    target lands narrow, the delta arrives with a NEW column, and
    ``merge(evolve_schema=True)`` widens the table — delta rows win on key
    collision, surviving old rows null-fill the new column. The overlap
    year (1998) is deliberately restated by the wide delta (testdata
    orders span 1995-01-01..2001-08-01, so both the surviving-narrow and
    restated-wide populations are non-empty at every sf)."""
    o = load_table(spark, sf_dir, "orders")
    target = o.where(
        F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp")
    ).select(
        "o_orderkey",
        F.floor(F.col("o_totalprice") * 100).cast("bigint").alias("total_cents"),
    )
    delta = o.where(
        F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp")
    ).select(
        "o_orderkey",
        F.floor(F.col("o_totalprice") * 100).cast("bigint").alias("total_cents"),
        "o_orderpriority",
    )
    root = _work_dir("schevo", sf_dir)
    t = VersionedTable(spark, f"{root}/t")
    t.commit(target)
    t.merge(delta, keys=["o_orderkey"], evolve_schema=True)
    return t.read().select("o_orderkey", "total_cents", "o_orderpriority")


ZERO_COPY_CLONE_ORACLE = """
WITH half AS (
  SELECT c_mktsegment,
         CAST(COUNT(*) AS BIGINT) AS n_customers,
         CAST(SUM(CAST(FLOOR(c_acctbal * 100) AS BIGINT)) AS BIGINT)
           AS acctbal_cents
  FROM customer WHERE c_custkey % 2 = 0 GROUP BY c_mktsegment
), main AS (
  SELECT c_mktsegment,
         CAST(COUNT(*) AS BIGINT) AS n_customers,
         CAST(SUM(CAST(FLOOR(c_acctbal * 100) AS BIGINT)) AS BIGINT)
           AS acctbal_cents
  FROM customer GROUP BY c_mktsegment
), dev_delta AS (
  SELECT c_mktsegment,
         CAST(COUNT(*) AS BIGINT) AS n_customers,
         CAST(SUM(CAST(FLOOR(c_acctbal * 100) AS BIGINT)) AS BIGINT)
           AS acctbal_cents
  FROM customer
  WHERE c_acctbal > 0 AND c_mktsegment IN ('BUILDING', 'MACHINERY')
  GROUP BY c_mktsegment
)
SELECT 'main' AS branch, main.* FROM main
UNION ALL
SELECT 'dev' AS branch, dev_delta.* FROM dev_delta
UNION ALL
SELECT 'dev' AS branch, half.* FROM half
WHERE c_mktsegment NOT IN ('BUILDING', 'MACHINERY')
"""


@query("zero_copy_clone", oracle=ZERO_COPY_CLONE_ORACLE)
def zero_copy_clone(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snowflake-style zero-copy CLONE (VERDICT r05 #8): branch the table
    at v1, let MAIN overwrite to the full-corpus rollup while the DEV
    branch merges its own delta — the dev branch's untouched segments are
    still read zero-copy from the PARENT's immutable v1 dir (hard-ref
    pinned against parent vacuum), while its touched segments come from
    the clone's copy-on-write commit. Returns both branches' current
    states. Reference parity: Snowflake CREATE TABLE ... CLONE, the
    mechanism the reference's dbt project gets dev environments from."""
    c = load_table(spark, sf_dir, "customer")
    root = _work_dir("clone", sf_dir)
    main = VersionedTable(spark, f"{root}/main")
    main.commit(_segment_rollup(c.where(F.col("c_custkey") % 2 == 0)))
    dev = main.clone(f"{root}/dev")
    # main evolves past the branch point; a vacuum here must spare the
    # cloned v1 dir (the hard ref is what keeps the dev branch readable)
    main.commit(_segment_rollup(c))
    main.vacuum(keep=1, orphan_grace_ms=0, supersede_grace_ms=0)
    dev.merge(
        _segment_rollup(
            c.where(
                (F.col("c_acctbal") > 0)
                & F.col("c_mktsegment").isin("BUILDING", "MACHINERY")
            )
        ),
        keys=["c_mktsegment"],
    )
    return (
        main.read().select(F.lit("main").alias("branch"), "*")
        .unionByName(dev.read().select(F.lit("dev").alias("branch"), "*"))
    )


STATS_PRUNED_ORACLE = """
SELECT o_orderkey,
       CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS total_cents,
       o_orderpriority
FROM orders
WHERE o_orderkey BETWEEN 1000 AND 2000
"""


@query("stats_pruned_lookup", oracle=STATS_PRUNED_ORACLE)
def stats_pruned_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manifest data skipping (VERDICT r06 #8 — the commit-marker analog
    of Delta add-file stats / Snowflake micro-partition pruning, the
    mechanism the reference's Snowflake backend point-lookups ride):
    ``commit(stats_cols=[...])`` records each staged file's min/max from
    its parquet footer in the marker, and ``read(prune={col: band})``
    drops files whose range provably misses the band BEFORE Spark lists
    the directory. The data is range-clustered on the key first
    (repartitionByRange) so file ranges are disjoint and the point lookup
    touches ~1 file regardless of table width; pruning is fail-open (a
    superset), so the real band filter applies on top — the final answer
    is value-identical to the plain SQL band scan."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.floor(F.col("o_totalprice") * 100).cast("bigint").alias("total_cents"),
        "o_orderpriority",
    )
    root = _work_dir("statsprune", sf_dir)
    t = VersionedTable(spark, f"{root}/t")
    t.commit(o.repartitionByRange(8, "o_orderkey"), stats_cols=["o_orderkey"])
    return t.read(prune={"o_orderkey": (1000, 2000)}).where(
        F.col("o_orderkey").between(1000, 2000)
    )


BLOOM_PRUNED_ORACLE = """
SELECT o_orderkey, o_custkey, o_orderstatus, o_orderpriority
FROM orders
WHERE o_custkey = (SELECT MIN(o_custkey) FROM orders)
"""


@query("bloom_pruned_lookup", oracle=BLOOM_PRUNED_ORACLE)
def bloom_pruned_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter file skipping for point lookups on an UNCLUSTERED
    column (VERDICT r07 #4 — the Delta bloom-index / Snowflake
    search-optimization analog; min/max stats are useless here because
    the layout is range-clustered on o_orderkey, so every file's
    o_custkey range spans the domain). ``commit(bloom_cols=[...])``
    builds one per-file bitmap (JVM xxhash64, executor-side packbits) in
    a ``_bloom.json`` sidecar; ``read(prune={col: point})`` then skips
    files whose bitmap proves the probe value absent — blooms have no
    false negatives, so the pruned read is a fail-open SUPERSET and the
    real equality filter on top is value-identical to the plain scan.
    The probe (min custkey, a one-scalar driver read in the watermark
    cost class) lands in few files, so files-touched stays ~band-width
    while the table scales."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"
    )
    root = _work_dir("bloomprune", sf_dir)
    t = VersionedTable(spark, f"{root}/t")
    # 32 files: a point key's ~dozen orders can live in at most that many
    # files, so the bloom skips the majority — the skip ratio IMPROVES as
    # the file count outgrows the per-key row count (the 100 TB shape)
    t.commit(
        o.repartitionByRange(32, "o_orderkey"),
        stats_cols=["o_orderkey"],
        bloom_cols=["o_custkey"],
    )
    probe = o.agg(F.min("o_custkey")).first()[0]
    return t.read(prune={"o_custkey": probe}).where(F.col("o_custkey") == probe)


INCR_PART_ORACLE = """
WITH f AS (
  SELECT o_orderkey, o_custkey,
         CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS cents,
         CAST(year(o_orderdate) AS INTEGER) AS o_year,
         o_orderdate
  FROM orders
)
SELECT o_orderkey, o_custkey,
  CASE WHEN o_orderkey % 89 = 0 AND o_orderdate >= TIMESTAMP '1998-01-01'
            AND o_orderdate < TIMESTAMP '1999-01-01' THEN cents + 500
       WHEN o_orderkey % 97 = 0 AND o_orderdate < TIMESTAMP '1999-01-01'
            THEN cents + 1000
       ELSE cents END AS price_cents,
  o_year,
  CASE WHEN o_orderkey % 89 = 0 AND o_orderdate >= TIMESTAMP '1998-01-01'
            AND o_orderdate < TIMESTAMP '1999-01-01'
            THEN TIMESTAMP '2000-06-15'
       WHEN o_orderkey % 97 = 0 AND o_orderdate < TIMESTAMP '1999-01-01'
            THEN TIMESTAMP '1999-06-15'
       ELSE o_orderdate END AS updated_at,
  CASE WHEN o_orderkey % 89 = 0 AND o_orderdate >= TIMESTAMP '1998-01-01'
            AND o_orderdate < TIMESTAMP '1999-01-01' THEN 'b2'
       WHEN o_orderkey % 97 = 0 AND o_orderdate < TIMESTAMP '1999-01-01'
            THEN 'b1'
       WHEN o_orderdate < TIMESTAMP '1999-01-01' THEN 'base'
       WHEN o_orderdate < TIMESTAMP '2000-01-01' THEN 'b1'
       ELSE 'b2' END AS batch_id
FROM f
"""


def _incr_fact(o: DataFrame, where, batch: str) -> DataFrame:
    return o.where(where).select(
        "o_orderkey",
        "o_custkey",
        F.floor(F.col("o_totalprice") * 100).cast("bigint")
        .alias("price_cents"),
        F.year("o_orderdate").cast("int").alias("o_year"),
        F.col("o_orderdate").alias("updated_at"),
        F.lit(batch).alias("batch_id"),
    )


def _incr_corrections(o: DataFrame, where, add_cents: int, ts: str,
                      batch: str) -> DataFrame:
    """Restatements of EXISTING keys: original business values with an
    integer-cents price adjustment and a fresh updated_at (integer
    arithmetic only — no float path for the oracle hash to diverge on).
    o_year stays derived from o_orderdate: the merge key is
    partition-stable by construction, the merge_partitioned contract."""
    return o.where(where).select(
        "o_orderkey",
        "o_custkey",
        (F.floor(F.col("o_totalprice") * 100).cast("bigint")
         + F.lit(add_cents)).alias("price_cents"),
        F.year("o_orderdate").cast("int").alias("o_year"),
        F.lit(ts).cast("timestamp").alias("updated_at"),
        F.lit(batch).alias("batch_id"),
    )


@query("incremental_fact_merge_partitioned", oracle=INCR_PART_ORACLE)
def incremental_fact_merge_partitioned(spark: SparkSession,
                                       sf_dir: str) -> DataFrame:
    """The full 100 TB incremental shape, driver-pinned end to end
    (VERDICT r08 #1 — the final registry slot): a year-partitioned fact
    maintained by ``VersionedTable.incremental_partitioned`` — O(1)
    marker-memoized watermark + partition-SCOPED merge — through a base
    load and TWO incremental batches, the second deliberately REPLAYING
    the whole first batch under a different batch tag. The watermark must
    drop every replayed row (their batch_id would flip to 'b2' otherwise
    — a value-level corruption the oracle hash catches, not just a row
    count), key restatements must land in their original partitions, and
    untouched partitions ride along from their existing immutable dirs.
    Oracle = a closed-form full recompute of the merged state (reference
    parity: models/marts/facts/fact_sales_daily.sql:2-6 incremental merge
    on a composite unique_key + dbt_project.yml:79-82).

    Batch anatomy (orders span 1995..2001):
      base  = facts dated < 1999          (updated_at = o_orderdate)
      b1    = 1999's facts + a +$10 restatement of keys %97 dated < 1999
              (updated_at 1999-06-15)
      b2    = 2000+'s facts + a +$5 restatement of keys %89 dated in 1998
              (updated_at 2000-06-15) + a full REPLAY of b1 tagged 'b2'
    Steady-state cost shape (pinned in tests/test_partitioned_merge.py):
    one marker read, one delta scan, one touched-partition rewrite —
    b2 touches {1998, 2000, 2001} of seven year partitions."""
    o = load_table(spark, sf_dir, "orders")
    d = lambda s: F.lit(s).cast("timestamp")
    root = _work_dir("incrpart", sf_dir)
    t = VersionedTable(spark, f"{root}/fact")

    base = _incr_fact(o, F.col("o_orderdate") < d("1999-01-01"), "base")
    t.merge_partitioned(base, ["o_orderkey"], "o_year")

    b1 = _incr_fact(
        o, (F.col("o_orderdate") >= d("1999-01-01"))
        & (F.col("o_orderdate") < d("2000-01-01")), "b1",
    ).unionByName(_incr_corrections(
        o, (F.col("o_orderkey") % 97 == 0)
        & (F.col("o_orderdate") < d("1999-01-01")),
        1000, "1999-06-15 00:00:00", "b1",
    ))
    t.incremental_partitioned(b1, "updated_at", ["o_orderkey"], "o_year")

    replay = b1.withColumn("batch_id", F.lit("b2"))
    b2 = _incr_fact(
        o, F.col("o_orderdate") >= d("2000-01-01"), "b2",
    ).unionByName(_incr_corrections(
        o, (F.col("o_orderkey") % 89 == 0)
        & (F.col("o_orderdate") >= d("1998-01-01"))
        & (F.col("o_orderdate") < d("1999-01-01")),
        500, "2000-06-15 00:00:00", "b2",
    )).unionByName(replay)
    t.incremental_partitioned(b2, "updated_at", ["o_orderkey"], "o_year")

    return t.read().select(
        "o_orderkey", "o_custkey", "price_cents", "o_year",
        "updated_at", "batch_id",
    )
