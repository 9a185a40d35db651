"""Data-selection operators for LLM training pipelines (driver-mandated
extension family: corpus curation beyond dedup — importance resampling,
perplexity filtering, deterministic training-order sharding).

These are the selection stages that sit between raw-corpus dedup
(operators/dedup.py) and batch shaping (operators/batching.py) in a
100 TB pipeline:

- **DSIR importance weights** (Xie et al. 2023, "Data Selection for
  Language Models via Importance Resampling"): score every raw document by
  how target-like its hashed n-gram distribution is. The bucket statistics
  table is O(B) rows regardless of corpus size, so the scoring join is a
  broadcast — the whole operator is two corpus scans' worth of narrow work
  plus one tiny aggregate.
- **Perplexity buckets** (Wenzek et al. 2020, CCNet): unigram-LM negative
  log-likelihood per document, bucketed head/middle/tail at the corpus
  tertiles — the classic quality gate before mixing.
- **Training-order shards**: the deterministic shuffle-and-shard that turns
  a selected corpus into a reproducible epoch ordering.

Float-parity design (this repo's standard): every ``ln`` is computed ONCE
per small-cardinality row (bucket / vocab term), immediately rounded to
6 dp and fixed-pointed to integer micro-nats; per-document totals are then
BIGINT sums — order-independent and bit-identical across engines. The only
unrounded doubles in the outputs are single division chains (IEEE-exact).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..queries import query
from ..sources.tables import cpu_parallelism, load_table
from .dedup import portable_hash64

# DSIR hashed-feature space: unigrams + bigrams folded into B buckets.
DSIR_BUCKETS = 256
# The "target" corpus (DSIR's Wikipedia/books analogue): one curated source.
DSIR_TARGET_SOURCE = "src0"

PPL_SHARDS = 8  # training-order shard count (∝ corpus size in production)


def _unigram_bigram_grams(toks):
    """unigrams ++ space-joined bigrams, all JVM array ops.

    Bigrams via zip_with over two offset slices: ``slice(w,1,n-1)`` zipped
    with ``slice(w,2,n-1)`` — length-0 slices make single-token docs yield
    no bigrams without a conditional.
    """
    n = F.size(toks)
    bigrams = F.zip_with(
        F.slice(toks, 1, n - 1),
        F.slice(toks, 2, n - 1),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    return F.concat(toks, bigrams)


DSIR_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, source, string_split(text, ' ') AS w FROM documents
), grams AS (
  SELECT doc_id, source, unnest(w) AS gram FROM toks
  UNION ALL
  SELECT doc_id, source,
         unnest(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1]))
    AS gram
  FROM toks
), bucketed AS (
  SELECT doc_id, source,
    CAST(('0x' || SUBSTR(MD5(gram || '#dsir'), 1, 15)) AS BIGINT)
      % {DSIR_BUCKETS} AS bucket
  FROM grams
), bucket_counts AS (
  SELECT bucket,
    SUM(CASE WHEN source = '{DSIR_TARGET_SOURCE}' THEN 1 ELSE 0 END) AS n_t,
    COUNT(*) AS n_r
  FROM bucketed GROUP BY bucket
), bucket_weights AS (
  SELECT bucket,
    CAST(ROUND(ROUND(LN(
      (CAST(2*n_t + 1 AS DOUBLE) * CAST(2*SUM(n_r) OVER () + {DSIR_BUCKETS} AS DOUBLE))
      / (CAST(2*SUM(n_t) OVER () + {DSIR_BUCKETS} AS DOUBLE) * CAST(2*n_r + 1 AS DOUBLE))
    ), 6) * 1000000.0) AS BIGINT) AS lr_micro
  FROM bucket_counts
)
SELECT b.doc_id,
  COUNT(*) AS n_grams,
  CAST(SUM(w.lr_micro) AS BIGINT) AS weight_micro,
  CAST(SUM(w.lr_micro) AS DOUBLE) / 1000000.0 / COUNT(*) AS avg_log_ratio,
  SUM(w.lr_micro) > 0 AS selected
FROM bucketed b JOIN bucket_weights w USING (bucket)
GROUP BY b.doc_id
"""


@query("dsir_importance_weights", oracle=DSIR_ORACLE, bench=True)
def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights: per-document log-likelihood ratio of a
    target vs raw hashed-ngram distribution (Xie et al. 2023 §3;
    reference has no equivalent — the driver mandates training-data
    selection ops as first-class).

    Features are unigrams+bigrams hashed into {B} buckets (portable md5
    fold shared with dedup). Target = documents from one curated source;
    raw = the whole corpus. Per bucket b:

        lr(b) = ln( (2·n_t(b)+1)·(2·R+B) / ((2·T+B)·(2·n_r(b)+1)) )

    — add-half smoothing with halves cleared to integers so every product
    is exact in a double. A document's weight is Σ lr(bucket(g)) over its
    gram occurrences; ``selected`` marks docs more target-like than raw
    (weight > 0) — a pure map-side predicate, no global ordering.

    Scale shape: one exploded scan → {B}-row conditional aggregate (map-side
    combine; totals via a window over the {B}-row frame) → the per-gram
    scoring join is BROADCAST (the weight table is {B} rows at ANY corpus
    size) → one doc_id exchange for the final sum of BIGINT micro-nats.
    The ln is computed {B} times total, rounded to 6 dp (libm ulp guard)
    and fixed-pointed, so doc sums are order-independent integers.
    """
    d = load_table(spark, sf_dir, "documents", min_partitions=cpu_parallelism(spark))
    toks = F.split(F.col("text"), " ")
    # explode_OUTER + isNotNull — avoids the inferred-filter re-evaluation
    # of the gram chain (see dedup._ngram_pair_partials)
    grams = d.select(
        "doc_id",
        "source",
        F.explode_outer(_unigram_bigram_grams(toks)).alias("gram"),
    ).where(F.col("gram").isNotNull()).select(
        "doc_id",
        "source",
        F.pmod(portable_hash64(F.col("gram"), "dsir"), F.lit(DSIR_BUCKETS)).alias(
            "bucket"
        ),
    )
    counts = grams.groupBy("bucket").agg(
        F.sum(
            F.when(F.col("source") == DSIR_TARGET_SOURCE, 1).otherwise(0)
        ).alias("n_t"),
        F.count("*").alias("n_r"),
    )
    w = Window.partitionBy()  # 256-row frame: totals without a second scan
    lr = F.log(
        ((F.col("n_t") * 2 + 1).cast("double")
         * (F.sum("n_r").over(w) * 2 + DSIR_BUCKETS).cast("double"))
        / ((F.sum("n_t").over(w) * 2 + DSIR_BUCKETS).cast("double")
           * (F.col("n_r") * 2 + 1).cast("double"))
    )
    weights = counts.select(
        "bucket",
        F.round(F.round(lr, 6) * 1000000.0).cast("long").alias("lr_micro"),
    )
    scored = (
        grams.join(F.broadcast(weights), "bucket")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            F.sum("lr_micro").alias("weight_micro"),
        )
    )
    return scored.select(
        "doc_id",
        "n_grams",
        "weight_micro",
        (F.col("weight_micro").cast("double") / 1000000.0 / F.col("n_grams")).alias(
            "avg_log_ratio"
        ),
        (F.col("weight_micro") > 0).alias("selected"),
    )


dsir_importance_weights.__doc__ = dsir_importance_weights.__doc__.replace(
    "{B}", str(DSIR_BUCKETS)
)


PPL_ORACLE = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
), total AS (
  SELECT COUNT(*) AS n_total FROM toks
), vocab AS (
  SELECT token,
    CAST(ROUND(ROUND(-LN(CAST(COUNT(*) AS DOUBLE) / CAST(ANY_VALUE(n_total) AS DOUBLE)), 6)
         * 1000000.0) AS BIGINT) AS nll_micro
  FROM toks CROSS JOIN total GROUP BY token
), docs AS (
  SELECT t.doc_id,
    COUNT(*) AS n_tokens,
    CAST(SUM(v.nll_micro) AS BIGINT) AS nll_micro_total,
    CAST(SUM(v.nll_micro) AS DOUBLE) / COUNT(*) AS avg_nll_micro
  FROM toks t JOIN vocab v USING (token)
  GROUP BY t.doc_id
), cuts AS (
  SELECT quantile_cont(avg_nll_micro, 0.3333333333333333) AS c1,
         quantile_cont(avg_nll_micro, 0.6666666666666666) AS c2
  FROM docs
)
SELECT doc_id, n_tokens, nll_micro_total, avg_nll_micro,
  CASE WHEN avg_nll_micro <= c1 THEN 'head'
       WHEN avg_nll_micro <= c2 THEN 'middle'
       ELSE 'tail' END AS ppl_bucket
FROM docs CROSS JOIN cuts
"""


@query("perplexity_buckets", oracle=PPL_ORACLE)
def perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020 §4.3): score
    each document by its unigram-LM negative log-likelihood and cut the
    corpus into head/middle/tail at the per-token-NLL tertiles.

    The LM here is the corpus's own unigram distribution (the container has
    no KenLM; the operator shape — score against a broadcastable/joinable
    vocab table, then bucket at corpus quantiles — is exactly the CCNet
    pipeline and a real external LM table drops in unchanged).

    Float parity: −ln p(w) is computed once per VOCAB TERM, rounded 6 dp,
    fixed-pointed to integer micro-nats; document totals are exact BIGINT
    sums. The tertile cut uses the exact interpolated percentile (both
    engines share the sort+lerp definition — see order_price_percentiles);
    its input is one double per document derived by a single division.

    Scale shape: token explode → vocab aggregate (map-side combine) →
    score join ON TOKEN (shuffle join — at 100 TB the trimmed vocab
    broadcasts, but the general plan co-partitions both sides on token) →
    one doc_id exchange. The tertile cut runs on the per-DOCUMENT frame
    (1 row/doc, ~5 orders smaller than the token stream); the at-scale
    twin is approx_percentile over the same frame, same downstream CASE.
    """
    d = load_table(spark, sf_dir, "documents", min_partitions=cpu_parallelism(spark))
    # explode_OUTER + isNotNull — see dedup._ngram_pair_partials
    toks = d.select(
        "doc_id", F.explode_outer(F.split("text", " ")).alias("token")
    ).where(F.col("token").isNotNull())
    total = toks.agg(F.count("*").alias("n_total"))
    vocab = (
        toks.groupBy("token")
        .agg(F.count("*").alias("cnt"))
        .crossJoin(F.broadcast(total))
        .select(
            "token",
            F.round(
                F.round(
                    -F.log(F.col("cnt").cast("double") / F.col("n_total").cast("double")),
                    6,
                )
                * 1000000.0
            )
            .cast("long")
            .alias("nll_micro"),
        )
    )
    docs = (
        toks.join(vocab, "token")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum("nll_micro").alias("nll_micro_total"),
        )
        .withColumn(
            "avg_nll_micro",
            F.col("nll_micro_total").cast("double") / F.col("n_tokens"),
        )
    )
    cuts = docs.agg(
        F.percentile("avg_nll_micro", 0.3333333333333333).alias("c1"),
        F.percentile("avg_nll_micro", 0.6666666666666666).alias("c2"),
    )
    return docs.crossJoin(F.broadcast(cuts)).select(
        "doc_id",
        "n_tokens",
        "nll_micro_total",
        "avg_nll_micro",
        F.when(F.col("avg_nll_micro") <= F.col("c1"), "head")
        .when(F.col("avg_nll_micro") <= F.col("c2"), "middle")
        .otherwise("tail")
        .alias("ppl_bucket"),
    )


SHARD_ORACLE = f"""
WITH hashed AS (
  SELECT doc_id,
    CAST(('0x' || SUBSTR(MD5(CAST(doc_id AS VARCHAR) || '#epoch0'), 1, 15)) AS BIGINT)
      % {PPL_SHARDS} AS shard,
    CAST(('0x' || SUBSTR(MD5(CAST(doc_id AS VARCHAR) || '#order0'), 1, 15)) AS BIGINT)
      AS ord
  FROM documents
)
SELECT doc_id, shard,
  ROW_NUMBER() OVER (PARTITION BY shard ORDER BY ord, doc_id) AS pos
FROM hashed
"""


@query("training_order_shards", oracle=SHARD_ORACLE)
def training_order_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic epoch shuffle-and-shard: every document gets a
    reproducible (shard, position) for training order — re-running the
    pipeline on the same corpus yields the identical ordering, and
    changing the epoch seed ('epoch0'/'order0') reshuffles globally
    without any RNG state.

    Scale shape: both the shard assignment and the sort key are map-side
    portable hashes; the only exchange is the per-shard ROW_NUMBER window.
    Shard count scales with the corpus (8 here; thousands at 100 TB) so
    each shard's sort stays executor-sized — there is never a global
    ORDER BY over the corpus.
    """
    d = load_table(spark, sf_dir, "documents")
    key = F.col("doc_id").cast("string")
    hashed = d.select(
        "doc_id",
        F.pmod(portable_hash64(key, "epoch0"), F.lit(PPL_SHARDS)).alias("shard"),
        portable_hash64(key, "order0").alias("ord"),
    )
    w = Window.partitionBy("shard").orderBy("ord", "doc_id")
    return hashed.select(
        "doc_id", "shard", F.row_number().over(w).alias("pos")
    )
