"""Mergeable frequency/cardinality sketches, portably hashed.

Spark ships engine-specific sketches (`approx_count_distinct` HLL++,
registered as the rows-only scale path in relational.py); these are the
PORTABLE twins — md5-keyed Count-Min and HyperLogLog whose register state
is bit-identical in any engine, so the ENTIRE sketch pipeline (hash →
register update → merge → estimate) is DuckDB-oracle-verified, not just
smoke-checked. That is the point: a sketch you can't cross-check is a
sketch you can't debug at 100 TB.

Scale design (both):
- register updates are map-side-combinable aggregates (MAX/COUNT per
  register) — the shuffle carries |registers| rows per partition, not
  |input| rows, which is the whole reason sketches exist;
- sketch state merges associatively (max of maxes, sum of counts), so the
  same code path serves batch, incremental maintenance (union partials —
  see facts.mv_incremental_maintenance for the same trick on exact
  aggregates), and per-partition parallelism;
- estimates are computed from INTEGER register sums (Σ 2^(RANK_BITS−M_j)
  as BIGINT) so no float summation order exists anywhere; the single final
  transcendental is rounded to 4 decimals, far above any cross-engine ULP.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..queries import query
from ..sources.tables import cpu_parallelism, load_table
from .dedup import portable_hash64

# --- Count-Min sketch ---------------------------------------------------------

CM_DEPTH = 4  # independent hash rows
CM_WIDTH = 64  # buckets per row
CM_TOPK = 20

# one md5 draw per (value, row): u60 % width, salted per row
_CM_BUCKET = (
    "CAST(('0x' || SUBSTR(MD5(CAST(user_id AS VARCHAR) || '#cm' "
    "|| CAST({i} AS VARCHAR)), 1, 15)) AS BIGINT) % " + str(CM_WIDTH)
)

_CM_ROWS_SQL = " UNION ALL ".join(
    f"SELECT user_id, {i} AS row_i, {_CM_BUCKET.format(i=i)} AS bucket "
    "FROM events"
    for i in range(CM_DEPTH)
)

COUNTMIN_ORACLE = f"""
WITH hashed AS ({_CM_ROWS_SQL}),
cms AS (
  SELECT row_i, bucket, COUNT(*) AS cnt FROM hashed GROUP BY row_i, bucket
), exact AS (
  SELECT user_id, COUNT(*) AS exact_cnt FROM events GROUP BY user_id
), probes AS (
  SELECT DISTINCT user_id, row_i, bucket FROM hashed
), est AS (
  SELECT p.user_id, CAST(MIN(c.cnt) AS BIGINT) AS cms_est
  FROM probes p JOIN cms c ON p.row_i = c.row_i AND p.bucket = c.bucket
  GROUP BY p.user_id
)
SELECT e.user_id, e.exact_cnt, est.cms_est
FROM exact e JOIN est ON e.user_id = est.user_id
ORDER BY e.exact_cnt DESC, e.user_id
LIMIT {CM_TOPK}
"""


def _cm_bucket(i: int) -> F.Column:
    u = portable_hash64(F.col("user_id").cast("string"), f"cm{i}")
    return (u % CM_WIDTH).alias("bucket")


@query("countmin_heavy_hitters", oracle=COUNTMIN_ORACLE)
def countmin_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch (4×64) over event user_ids, read back for the
    top-20 exact heavy hitters: cms_est = min over rows of the hashed
    bucket count, always ≥ the exact count (one-sided error — asserted by
    a property test). The sketch table is CM_DEPTH×CM_WIDTH rows no matter
    the input size; at 100 TB the groupBy(row, bucket) partials ARE the
    sketch merge."""
    e = load_table(spark, sf_dir, "events", min_partitions=cpu_parallelism(spark))
    # ONE scan: all CM_DEPTH buckets computed as an array in one projection
    # and exploded — the union-of-scans formulation reads events per row
    # per consumer (CM_DEPTH× the I/O, and this module exists to SHRINK
    # big-input I/O)
    hashed = e.select(
        "user_id",
        F.posexplode(F.array(*[_cm_bucket(i) for i in range(CM_DEPTH)])).alias(
            "row_i", "bucket"
        ),
    )
    cms = hashed.groupBy("row_i", "bucket").agg(F.count("*").alias("cnt"))
    exact = e.groupBy("user_id").agg(F.count("*").alias("exact_cnt"))
    probes = hashed.distinct()
    est = (
        probes.join(F.broadcast(cms), ["row_i", "bucket"])
        .groupBy("user_id")
        .agg(F.min("cnt").alias("cms_est"))
    )
    return (
        exact.join(est, "user_id")
        .orderBy(F.desc("exact_cnt"), "user_id")
        .limit(CM_TOPK)
    )


# --- portable HyperLogLog -----------------------------------------------------

HLL_P = 6  # 2^6 = 64 registers
HLL_M = 1 << HLL_P
HLL_ALPHA = 0.709  # standard bias constant for m = 64
RANK_BITS = 60 - HLL_P  # 54 hash bits feed the leading-zero rank

# integer-exact rank: position of the highest set bit, as a CASE ladder —
# a float log2 round-trip can misrank exact powers of two. Shared verbatim
# by Spark (F.expr) and DuckDB, so both engines run the same decision tree.
_RANK_SQL = (
    "CASE "
    + " ".join(
        f"WHEN w >= {1 << (RANK_BITS - r)} THEN {r}"
        for r in range(1, RANK_BITS + 1)
    )
    + f" ELSE {RANK_BITS + 1} END"
)

_HLL_PRE = f"""
  SELECT event_type,
    CAST(('0x' || SUBSTR(MD5(CAST(user_id AS VARCHAR) || '#hll'), 1, 15))
      AS BIGINT) AS u
  FROM events
"""

HLL_ORACLE = f"""
WITH hashed AS ({_HLL_PRE}),
ranked AS (
  SELECT event_type, u // {1 << RANK_BITS} AS register,
         u % {1 << RANK_BITS} AS w
  FROM hashed
), regs AS (
  SELECT event_type, register, MAX({_RANK_SQL}) AS max_rank
  FROM ranked GROUP BY event_type, register
), folded AS (
  SELECT event_type,
    COUNT(*) AS n_filled,
    CAST(SUM(CAST(POWER(2, {RANK_BITS + 1} - max_rank) AS BIGINT)) AS BIGINT)
      AS int_sum
  FROM regs GROUP BY event_type
), est AS (
  SELECT event_type, n_filled, int_sum,
    ({HLL_M} - n_filled) * CAST(POWER(2, {RANK_BITS + 1}) AS BIGINT)
      + int_sum AS denom
  FROM folded
)
SELECT event_type, n_filled, denom,
  ROUND(CASE
    WHEN CAST({HLL_ALPHA * HLL_M * HLL_M * float(1 << (RANK_BITS + 1))!r}
         AS DOUBLE) / denom <= {2.5 * HLL_M!r}
         AND n_filled < {HLL_M}
    THEN {HLL_M} * LN(CAST({HLL_M} AS DOUBLE) / ({HLL_M} - n_filled))
    ELSE CAST({HLL_ALPHA * HLL_M * HLL_M * float(1 << (RANK_BITS + 1))!r}
         AS DOUBLE) / denom
  END, 4) AS hll_estimate
FROM est
ORDER BY event_type
"""


@query("hll_distinct_users", oracle=HLL_ORACLE)
def hll_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Portable HyperLogLog (64 registers) per event_type: register = top
    6 hash bits, rank = leading-zero position of the remaining 54 bits via
    an integer CASE ladder, registers folded as MAX (associative — the
    sketch merge), and the harmonic denominator assembled as an exact
    BIGINT (empty registers contribute 2^55 each) so the only float op is
    the final division. Small-range linear counting applies below 2.5·m —
    same branch, same formula, both engines; estimate rounded to 4
    decimals, far above transcendental-ULP territory."""
    e = load_table(spark, sf_dir, "events", min_partitions=cpu_parallelism(spark))
    u = portable_hash64(F.col("user_id").cast("string"), "hll")
    # integer div/mod only — u has 60 bits, a double round-trip drops 7
    ranked = e.select("event_type", u.alias("u")).select(
        "event_type",
        F.expr(f"u div {1 << RANK_BITS}").alias("register"),
        (F.col("u") % (1 << RANK_BITS)).alias("w"),
    )
    regs = ranked.groupBy("event_type", "register").agg(
        F.max(F.expr(_RANK_SQL)).alias("max_rank")
    )
    folded = regs.groupBy("event_type").agg(
        F.count("*").alias("n_filled"),
        F.sum(
            F.expr(f"CAST(POWER(2, {RANK_BITS + 1} - max_rank) AS BIGINT)")
        ).alias("int_sum"),
    )
    est = folded.select(
        "event_type",
        "n_filled",
        (
            (HLL_M - F.col("n_filled")) * F.lit(1 << (RANK_BITS + 1))
            + F.col("int_sum")
        ).alias("denom"),
    )
    raw = (
        F.lit(HLL_ALPHA * HLL_M * HLL_M * float(1 << (RANK_BITS + 1)))
        / F.col("denom")
    )
    linear = F.lit(float(HLL_M)) * F.log(
        F.lit(float(HLL_M)) / (HLL_M - F.col("n_filled"))
    )
    return est.select(
        "event_type",
        "n_filled",
        "denom",
        F.round(
            F.when((raw <= 2.5 * HLL_M) & (F.col("n_filled") < HLL_M), linear)
            .otherwise(raw),
            4,
        ).alias("hll_estimate"),
    ).orderBy("event_type")


# --- sliding-window HLL via register merge ------------------------------------

HLL_WINDOW_HOURS = 3

_EST_CONST = repr(HLL_ALPHA * HLL_M * HLL_M * float(1 << (RANK_BITS + 1)))

HLL_SLIDING_ORACLE = f"""
WITH hashed AS (
  SELECT DATE_TRUNC('hour', ts) AS hr,
    CAST(('0x' || SUBSTR(MD5(CAST(user_id AS VARCHAR) || '#hll'), 1, 15))
      AS BIGINT) AS u
  FROM events
), ranked AS (
  SELECT hr, u // {1 << RANK_BITS} AS register, u % {1 << RANK_BITS} AS w
  FROM hashed
), hour_regs AS (
  SELECT hr, register, MAX({_RANK_SQL}) AS max_rank
  FROM ranked GROUP BY hr, register
), contrib AS (
  SELECT hr + o * INTERVAL 1 HOUR AS window_end, register, max_rank
  FROM hour_regs, UNNEST(generate_series(0, {HLL_WINDOW_HOURS - 1})) AS t(o)
), merged AS (
  SELECT c.window_end, c.register, MAX(c.max_rank) AS max_rank
  FROM contrib c
  JOIN (SELECT DISTINCT hr FROM hour_regs) h ON c.window_end = h.hr
  GROUP BY c.window_end, c.register
), folded AS (
  SELECT window_end,
    COUNT(*) AS n_filled,
    CAST(SUM(CAST(POWER(2, {RANK_BITS + 1} - max_rank) AS BIGINT)) AS BIGINT)
      AS int_sum
  FROM merged GROUP BY window_end
), est AS (
  SELECT window_end, n_filled,
    ({HLL_M} - n_filled) * CAST(POWER(2, {RANK_BITS + 1}) AS BIGINT)
      + int_sum AS denom
  FROM folded
)
SELECT window_end, n_filled, denom,
  ROUND(CASE
    WHEN CAST({_EST_CONST} AS DOUBLE) / denom <= {2.5 * HLL_M!r}
         AND n_filled < {HLL_M}
    THEN {HLL_M} * LN(CAST({HLL_M} AS DOUBLE) / ({HLL_M} - n_filled))
    ELSE CAST({_EST_CONST} AS DOUBLE) / denom
  END, 4) AS hll_estimate
FROM est
ORDER BY window_end
"""


@query("hll_sliding_distinct", oracle=HLL_SLIDING_ORACLE)
def hll_sliding_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users over a trailing 3-hour window, computed by MERGING
    the stored per-hour HLL register tables (same salt as
    hll_distinct_users — the hourly sketch is the reusable artifact)
    instead of re-scanning three hours of raw events per window. This is
    the operational reason sketches exist in a warehouse: the raw table is
    touched ONCE to build |hours|×64 register rows; every window estimate
    thereafter is a max-merge over 3×64 rows, and the same merge serves
    daily/weekly rollups or streaming state. Estimates are bit-identical
    to the DuckDB oracle (integer denominators, one rounded transcendental)."""
    e = load_table(spark, sf_dir, "events", min_partitions=cpu_parallelism(spark))
    u = portable_hash64(F.col("user_id").cast("string"), "hll")
    ranked = e.select(F.date_trunc("hour", "ts").alias("hr"), u.alias("u")).select(
        "hr",
        F.expr(f"u div {1 << RANK_BITS}").alias("register"),
        (F.col("u") % (1 << RANK_BITS)).alias("w"),
    )
    hour_regs = ranked.groupBy("hr", "register").agg(
        F.max(F.expr(_RANK_SQL)).alias("max_rank")
    )
    contrib = hour_regs.withColumn(
        "o", F.explode(F.sequence(F.lit(0), F.lit(HLL_WINDOW_HOURS - 1)))
    ).select(
        F.expr("timestampadd(HOUR, o, hr)").alias("window_end"),
        "register",
        "max_rank",
    )
    hours = hour_regs.select(F.col("hr").alias("window_end")).distinct()
    merged = (
        contrib.join(hours, "window_end")
        .groupBy("window_end", "register")
        .agg(F.max("max_rank").alias("max_rank"))
    )
    folded = merged.groupBy("window_end").agg(
        F.count("*").alias("n_filled"),
        F.sum(
            F.expr(f"CAST(POWER(2, {RANK_BITS + 1} - max_rank) AS BIGINT)")
        ).alias("int_sum"),
    )
    est = folded.select(
        "window_end",
        "n_filled",
        (
            (HLL_M - F.col("n_filled")) * F.lit(1 << (RANK_BITS + 1))
            + F.col("int_sum")
        ).alias("denom"),
    )
    raw = F.lit(float(_EST_CONST)) / F.col("denom")
    linear = F.lit(float(HLL_M)) * F.log(
        F.lit(float(HLL_M)) / (HLL_M - F.col("n_filled"))
    )
    return est.select(
        "window_end",
        "n_filled",
        "denom",
        F.round(
            F.when((raw <= 2.5 * HLL_M) & (F.col("n_filled") < HLL_M), linear)
            .otherwise(raw),
            4,
        ).alias("hll_estimate"),
    ).orderBy("window_end")
