"""Training-batch shaping operators (driver-mandated LLM-pipeline
extension): exact token-budget source mixing and length-bucketed padding
statistics — the two decisions a pretraining data loader makes after
dedup/quality filtering: WHICH documents fill the token budget, and WHAT
shapes the batches take.

Ref parity: the reference sizes training inputs by row sampling + LIMIT
(ml_platform/training/automated_training_pipeline.py:142-160) and balances
sources declaratively; a token-denominated budget is the LLM-era restatement
of the same knob. Both ops are pure DataFrame/SQL — no UDFs, no collect.

Scale design:
- token_budget_mix: per-source totals are map-side-combined aggregates
  (shuffle = |sources| rows); the two water-fill rounds are |sources|-sized
  frames joined via broadcast; the per-source prefix cut reuses
  sequence_packing's DISTRIBUTED prefix sum (intra-bucket window + tiny
  bucket-offset rollup) so no task ever sorts a whole source — the naive
  `PARTITION BY source ORDER BY u` window would funnel an 80 %-of-corpus
  source through ONE partition at web scale.
- length_bucket_stats: one map-side projection onto a fixed shape set, then
  a groupBy on ≤ |shapes| keys — shuffle is bytes-per-shape, not per-doc.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..queries import query
from ..sources.tables import cpu_parallelism, load_table

# --- exact token-budget source mixing ----------------------------------------

BUDGET_DEN = 2  # token budget = total corpus tokens // 2
MIX_BUCKET_SHIFT = 56  # u >> 56 → 16 ordered prefix-sum buckets per source

TOKEN_BUDGET_ORACLE = f"""
WITH counted AS (
  SELECT doc_id, source,
    CAST(LEN(string_split(text, ' ')) AS BIGINT) AS n_tokens,
    CAST(('0x' || SUBSTR(MD5(CAST(doc_id AS VARCHAR) || '#budget'), 1, 15))
      AS BIGINT) AS u
  FROM documents
), src AS (
  SELECT source, SUM(n_tokens) AS src_tokens FROM counted GROUP BY source
), tot AS (
  SELECT CAST(SUM(src_tokens) AS BIGINT) // {BUDGET_DEN} AS budget,
         COUNT(*) AS n_sources
  FROM src
), round1 AS (
  SELECT source, src_tokens, budget,
         LEAST(src_tokens, budget // n_sources) AS a1
  FROM src, tot
), round2 AS (
  SELECT MAX(budget) AS budget2, CAST(SUM(a1) AS BIGINT) AS allocated,
         COUNT(CASE WHEN src_tokens > a1 THEN 1 END) AS k2
  FROM round1
), alloc AS (
  SELECT source,
    a1 + CASE WHEN src_tokens > a1 THEN
      LEAST(src_tokens - a1,
            CASE WHEN k2 > 0 THEN (budget2 - allocated) // k2 ELSE 0 END)
      ELSE 0 END AS alloc_tokens
  FROM round1, round2
), ordered AS (
  SELECT doc_id, source, n_tokens,
    CAST(SUM(n_tokens) OVER (PARTITION BY source ORDER BY u, doc_id)
      AS BIGINT) AS cum_tokens
  FROM counted
)
SELECT o.doc_id, o.source, o.n_tokens, o.cum_tokens
FROM ordered o JOIN alloc a ON o.source = a.source
WHERE o.cum_tokens <= a.alloc_tokens
"""


@query("token_budget_mix", oracle=TOKEN_BUDGET_ORACLE)
def token_budget_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fill an exact global token budget (half the corpus) across sources:
    integer water-filling (equal share, capped by source size; one
    redistribution round for the leftover), then a deterministic
    hash-ordered prefix cut inside each source — every run selects the same
    documents, and re-runs after corpus growth only ever EXTEND a source's
    prefix (stable training mixtures across snapshots).

    All allocation arithmetic is 64-bit integer (`div`), so the cut is
    bit-identical in any engine; the only shuffles over document rows are
    one hash exchange on (source, bucket) for the distributed prefix sum.
    """
    from .dedup import portable_hash64

    d = load_table(spark, sf_dir, "documents", min_partitions=cpu_parallelism(spark))
    u = portable_hash64(F.col("doc_id").cast("string"), "budget").alias("u")
    counted = d.select(
        "doc_id",
        "source",
        F.size(F.split("text", " ")).cast("bigint").alias("n_tokens"),
        u,
    ).withColumn("bucket", F.expr(f"u div {1 << MIX_BUCKET_SHIFT}"))

    src = counted.groupBy("source").agg(F.sum("n_tokens").alias("src_tokens"))
    glob = src.agg(
        F.expr(f"sum(src_tokens) div {BUDGET_DEN}").alias("budget"),
        F.count("*").alias("n_sources"),
    )
    round1 = src.crossJoin(F.broadcast(glob)).select(
        "source",
        "src_tokens",
        "budget",
        F.least(F.col("src_tokens"), F.expr("budget div n_sources")).alias("a1"),
    )
    round2 = round1.agg(
        F.max("budget").alias("budget2"),
        F.sum("a1").alias("allocated"),
        F.count(F.when(F.col("src_tokens") > F.col("a1"), 1)).alias("k2"),
    )
    alloc = round1.crossJoin(F.broadcast(round2)).select(
        "source",
        (
            F.col("a1")
            + F.when(
                F.col("src_tokens") > F.col("a1"),
                F.least(
                    F.col("src_tokens") - F.col("a1"),
                    F.expr(
                        "CASE WHEN k2 > 0 THEN (budget2 - allocated) div k2 "
                        "ELSE CAST(0 AS BIGINT) END"
                    ),
                ),
            ).otherwise(F.lit(0).cast("bigint"))
        ).alias("alloc_tokens"),
    )

    # distributed per-source prefix sum: intra-bucket inclusive cumsum +
    # per-source bucket offsets (|sources|×16 rows, broadcast back)
    intra_w = Window.partitionBy("source", "bucket").orderBy("u", "doc_id")
    intra = counted.withColumn("cum_intra", F.sum("n_tokens").over(intra_w))
    boff_w = (
        Window.partitionBy("source")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    boff = (
        counted.groupBy("source", "bucket")
        .agg(F.sum("n_tokens").alias("btot"))
        .select(
            "source",
            "bucket",
            F.coalesce(F.sum("btot").over(boff_w), F.lit(0)).alias("bucket_off"),
        )
    )
    cum = (F.col("bucket_off") + F.col("cum_intra")).alias("cum_tokens")
    return (
        intra.join(F.broadcast(boff), ["source", "bucket"])
        .join(F.broadcast(alloc), "source")
        .where(F.col("bucket_off") + F.col("cum_intra") <= F.col("alloc_tokens"))
        .select("doc_id", "source", "n_tokens", cum)
    )


# --- length-bucketed batch shapes --------------------------------------------

# Fixed shape ladder (tokens per sequence slot). Real loaders pad each doc up
# to the next declared shape; a CASE ladder keeps the bucketing exact in every
# engine (a float log2/ceil round-trip can mis-bucket exact powers of two).
SHAPES = [16, 32, 64, 128, 256, 512, 1024, 2048]

_SHAPE_SQL = (
    "CASE "
    + " ".join(f"WHEN n_tokens <= {s} THEN {s}" for s in SHAPES)
    + f" ELSE {SHAPES[-1]} END"
)

LENGTH_BUCKET_ORACLE = f"""
WITH counted AS (
  SELECT doc_id,
    CAST(LEN(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
), shaped AS (
  SELECT doc_id, LEAST(n_tokens, {SHAPES[-1]}) AS n_tokens,
         CAST({_SHAPE_SQL} AS BIGINT) AS shape
  FROM counted
)
SELECT shape,
  COUNT(*) AS n_docs,
  CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
  shape * COUNT(*) AS capacity,
  shape * COUNT(*) - CAST(SUM(n_tokens) AS BIGINT) AS pad_tokens,
  CAST(shape * COUNT(*) - CAST(SUM(n_tokens) AS BIGINT) AS DOUBLE)
    / (shape * COUNT(*)) AS pad_frac
FROM shaped
GROUP BY shape
"""


@query("length_bucket_stats", oracle=LENGTH_BUCKET_ORACLE)
def length_bucket_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed batch shaping: assign each document to the smallest
    declared sequence shape that fits (over-long docs truncate to the top
    shape) and report per-shape padding waste — the statistic that decides
    whether a shape ladder or sequence packing (see
    chunking.sequence_packing) feeds the trainer. pad_frac is an exact
    integer ratio evaluated in IEEE double, identical cross-engine."""
    d = load_table(spark, sf_dir, "documents", min_partitions=cpu_parallelism(spark))
    counted = d.select(
        F.size(F.split("text", " ")).cast("bigint").alias("n_tokens")
    )
    shaped = counted.select(
        F.least(F.col("n_tokens"), F.lit(SHAPES[-1])).alias("n_tokens"),
        F.expr(_SHAPE_SQL).cast("bigint").alias("shape"),
    )
    cap = F.col("shape") * F.count("*")
    return shaped.groupBy("shape").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("sum_tokens"),
        cap.alias("capacity"),
        (cap - F.sum("n_tokens")).alias("pad_tokens"),
        ((cap - F.sum("n_tokens")).cast("double") / cap).alias("pad_frac"),
    )
