"""ML-boundary operators (SURVEY.md §2.10 D3–D6, §2.1 S5/S11, §2.2 P7/P8,
§2.3 J3, §2.8 F17/F20).

The reference's ML platform pulls data into pandas and loops in Python; here
the *data* side (feature assembly, training-set construction, drift
p-values) stays in the engine, and only genuinely-Python steps (model
scoring, free-form per-entity feature extraction) cross the Arrow boundary
as pandas UDFs — batched, vectorized, broadcast-model.
"""

from __future__ import annotations

import math

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.deterministic import sql_dsum
from ..queries import query
from ..sources.tables import load_table

FEATURE_COLUMNS = [
    "total_orders",
    "total_spend",
    "avg_order_value",
    "urgent_ratio",
    "open_ratio",
]


def customer_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The wide per-entity feature table (reference
    ml_pipeline_framework.py:158-217): one grouped pass over orders."""
    o = load_table(spark, sf_dir, "orders")
    from ..functions.deterministic import dsum

    n = F.count("*")
    return o.groupBy(F.col("o_custkey").alias("customer_id")).agg(
        n.alias("total_orders"),
        dsum("o_totalprice", "total_spend"),
        (dsum("o_totalprice") / n).alias("avg_order_value"),
        (F.sum(F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0)).cast("double") / n).alias("urgent_ratio"),
        (F.sum(F.when(F.col("o_orderstatus") == "O", 1).otherwise(0)).cast("double") / n).alias("open_ratio"),
    )


FEATURE_FETCH_ORACLE = f"""
WITH feats AS (
  SELECT o_custkey AS customer_id,
    COUNT(*) AS total_orders,
    {sql_dsum("o_totalprice")} AS total_spend,
    {sql_dsum("o_totalprice")} / COUNT(*) AS avg_order_value,
    CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS urgent_ratio,
    CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS open_ratio
  FROM orders GROUP BY o_custkey
)
SELECT customer_id, total_orders, total_spend, avg_order_value, urgent_ratio, open_ratio,
  MD5('avg_order_value,open_ratio,total_orders,total_spend,urgent_ratio') AS feature_set_key
FROM feats
WHERE customer_id IN (1, 2, 3, 5, 8, 13, 21, 34, 55, 89, 144, 233, 377, 610, 987)
"""


@query("feature_fetch_inlist", oracle=FEATURE_FETCH_ORACLE)
def feature_fetch_inlist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5 (IN-list pushdown fetch) + S11 (cache key = md5 of the sorted
    feature-name list — reference feature_store_manager.py:582-585). The
    isin filter pushes through the aggregation onto the scan."""
    ids = [1, 2, 3, 5, 8, 13, 21, 34, 55, 89, 144, 233, 377, 610, 987]
    cache_key = F.md5(F.lit(",".join(sorted(FEATURE_COLUMNS))))
    return (
        customer_features(spark, sf_dir)
        .where(F.col("customer_id").isin(ids))
        .withColumn("feature_set_key", cache_key)
    )


CONFORM_ORACLE = """
WITH feats AS (
  SELECT o_custkey AS customer_id,
    COUNT(*) AS total_orders,
    CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS urgent_ratio
  FROM orders GROUP BY o_custkey
)
SELECT c.c_custkey AS customer_id,
  COALESCE(CAST(total_orders AS DOUBLE), 0.0) AS total_orders,
  COALESCE(urgent_ratio, 0.0) AS urgent_ratio,
  COALESCE(CAST(NULL AS DOUBLE), 0.0) AS missing_feature
FROM customer c LEFT JOIN feats ON feats.customer_id = c.c_custkey
"""


@query("feature_vector_conform", oracle=CONFORM_ORACLE)
def feature_vector_conform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8: reindex(columns=..., fill_value=0) before scoring (reference
    realtime_inference_service.py:230-231) — declared column order, missing
    features coalesced to 0, customers without history included."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    n = F.count("*")
    feats = o.groupBy(F.col("o_custkey").alias("customer_id")).agg(
        n.alias("total_orders"),
        (F.sum(F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0)).cast("double") / n).alias("urgent_ratio"),
    )
    return (
        c.join(feats, c["c_custkey"] == feats["customer_id"], "left")
        .select(
            F.col("c_custkey").alias("customer_id"),
            F.coalesce(F.col("total_orders").cast("double"), F.lit(0.0)).alias("total_orders"),
            F.coalesce(F.col("urgent_ratio"), F.lit(0.0)).alias("urgent_ratio"),
            F.coalesce(F.lit(None).cast("double"), F.lit(0.0)).alias("missing_feature"),
        )
    )


TRAINING_ORACLE = f"""
WITH feats AS (
  SELECT o_custkey AS customer_id,
    COUNT(*) AS total_orders,
    {sql_dsum("o_totalprice")} AS total_spend
  FROM orders GROUP BY o_custkey
)
SELECT f.customer_id, f.total_orders, f.total_spend,
  c.c_acctbal,
  ROUND(LN(1.0 + f.total_spend), 6) AS log_spend,
  ROUND(SQRT(CAST(f.total_orders AS DOUBLE)), 6) AS sqrt_orders,
  c.c_acctbal * f.total_orders AS acct_order_interaction,
  CASE WHEN f.total_spend / f.total_orders > 150000 THEN 1 ELSE 0 END AS high_value_label
FROM feats f
JOIN customer c ON c.c_custkey = f.customer_id
WHERE SUBSTR(MD5(CAST(f.customer_id AS VARCHAR)), 1, 1) IN ('0','1','2','3')
"""


@query("training_dataset", oracle=TRAINING_ORACLE, bench=True)
def training_dataset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 (multi-way training join) + S7 (reproducible hash sample) + F17
    (log/sqrt transforms) + F20 (interaction features) + the CASE-derived
    label (reference automated_training_pipeline.py:142-244). Transcendental
    outputs rounded to 6dp — per-row libm differences are ~1e-16 relative,
    far inside the rounding guard."""
    from ..functions.deterministic import dsum

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    feats = o.groupBy(F.col("o_custkey").alias("customer_id")).agg(
        F.count("*").alias("total_orders"), dsum("o_totalprice", "total_spend")
    )
    sampled = feats.where(
        F.substring(F.md5(F.col("customer_id").cast("string")), 1, 1).isin("0", "1", "2", "3")
    )
    return (
        sampled.join(c, F.col("c_custkey") == F.col("customer_id"))
        .select(
            "customer_id",
            "total_orders",
            "total_spend",
            "c_acctbal",
            F.round(F.log(F.lit(1.0) + F.col("total_spend")), 6).alias("log_spend"),
            F.round(F.sqrt(F.col("total_orders").cast("double")), 6).alias("sqrt_orders"),
            (F.col("c_acctbal") * F.col("total_orders")).alias("acct_order_interaction"),
            F.when(F.col("total_spend") / F.col("total_orders") > 150000, 1)
            .otherwise(0)
            .alias("high_value_label"),
        )
    )


# --- D6: KS p-value via the Kolmogorov asymptotic series ---------------------

KS_SERIES_TERMS = 100

KS_PVALUE_ORACLE = f"""
WITH tagged AS (
  SELECT value,
    CASE WHEN ts < TIMESTAMP '2024-01-15 00:00:00' THEN 1 ELSE 0 END AS is_ref,
    CASE WHEN ts < TIMESTAMP '2024-01-15 00:00:00' THEN 0 ELSE 1 END AS is_cur
  FROM events
), cdf AS (
  SELECT
    SUM(is_ref) OVER (ORDER BY value) AS ref_le,
    SUM(is_cur) OVER (ORDER BY value) AS cur_le,
    SUM(is_ref) OVER () AS n_ref,
    SUM(is_cur) OVER () AS n_cur
  FROM tagged
), stat AS (
  SELECT
    MAX(ABS(CAST(ref_le AS DOUBLE)/n_ref - CAST(cur_le AS DOUBLE)/n_cur)) AS d,
    MAX(CAST(n_ref AS DOUBLE)) AS n1, MAX(CAST(n_cur AS DOUBLE)) AS n2
  FROM cdf
), lam AS (
  SELECT d, (SQRT(n1*n2/(n1+n2)) + 0.12 + 0.11/SQRT(n1*n2/(n1+n2))) * d AS lambda
  FROM stat
)
SELECT d AS ks_stat,
  ROUND(LEAST(1.0, GREATEST(0.0,
    2.0 * list_reduce(list_transform(range(1, {KS_SERIES_TERMS + 1}),
        k -> (CASE WHEN k % 2 = 1 THEN 1.0 ELSE -1.0 END) * EXP(-2.0*k*k*lambda*lambda)),
      (x, y) -> x + y))), 6) AS p_value
FROM lam
"""


@query("ks_drift_pvalue", oracle=KS_PVALUE_ORACLE)
def ks_drift_pvalue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D6: scipy.ks_2samp's p-value (reference
    ml_monitoring_system.py:229-251) WITHOUT scipy: the Kolmogorov
    asymptotic series 2·Σ(-1)^(k-1)·exp(-2k²λ²) evaluated as a sequential
    array fold in both engines (identical order → identical doubles;
    rounded 6dp to absorb libm exp() last-ulp noise)."""
    from ..operators.drift import ks_value_drift

    stat = ks_value_drift(spark, sf_dir)
    e = load_table(spark, sf_dir, "events")
    cutoff = F.lit("2024-01-15 00:00:00").cast("timestamp")
    counts = e.agg(
        F.sum(F.when(F.col("ts") < cutoff, 1).otherwise(0)).cast("double").alias("n1"),
        F.sum(F.when(F.col("ts") >= cutoff, 1).otherwise(0)).cast("double").alias("n2"),
    )
    en = F.sqrt(F.col("n1") * F.col("n2") / (F.col("n1") + F.col("n2")))
    lam = (en + 0.12 + 0.11 / en) * F.col("ks_stat")
    series = F.aggregate(
        F.transform(
            F.sequence(F.lit(1), F.lit(KS_SERIES_TERMS)),
            lambda k: F.when(k % 2 == 1, F.lit(1.0)).otherwise(F.lit(-1.0))
            * F.exp(-2.0 * k.cast("double") * k.cast("double") * F.col("lambda") * F.col("lambda")),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return (
        stat.crossJoin(counts)
        .withColumn("lambda", lam)
        .select(
            F.col("ks_stat").alias("ks_stat"),
            F.round(F.least(F.lit(1.0), F.greatest(F.lit(0.0), 2.0 * series)), 6).alias("p_value"),
        )
    )


# --- D4/D5: pandas-UDF surface (no oracle — Python-side math) ----------------


def _pdsum(vals) -> float:
    """Python mirror of functions.deterministic.sql_dsum: quantize each
    double to DECIMAL(38,10) (half-up, like both engines' double→decimal
    cast), sum exactly, round to scale 4, convert back to double. Decimal
    boundaries aren't binary-representable, so the result is bit-identical
    to the SQL mirror regardless of engine or order."""
    import decimal

    q10 = decimal.Decimal("1E-10")
    q4 = decimal.Decimal("1E-4")
    with decimal.localcontext() as ctx:
        ctx.prec = 50
        s = decimal.Decimal(0)
        for v in vals:
            s += decimal.Decimal(float(v)).quantize(
                q10, rounding=decimal.ROUND_HALF_UP
            )
        r = s.quantize(q4, rounding=decimal.ROUND_HALF_UP)
        # SPLIT conversion, mirroring sql_split_dbl/dec2dbl: above 2^53
        # unscaled a direct float(r) (single-rounded) can differ from the
        # split form both engine mirrors now use
        i = r.to_integral_value(rounding=decimal.ROUND_FLOOR)
        return float(i) + float(r - i)


TS_FEATURES_ORACLE = f"""
WITH s AS (
  SELECT user_id, value,
    LEAD(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
  FROM events WHERE value IS NOT NULL AND NOT isnan(value)
), agg AS (
  SELECT user_id,
    COUNT(value) AS n,
    {sql_dsum('value')} AS s1,
    {sql_dsum('(value)*(value)')} AS s2,
    MIN(value) AS vmin, MAX(value) AS vmax
  FROM s GROUP BY user_id
), pairs AS (
  SELECT user_id,
    COUNT(*) AS np,
    {sql_dsum('value')} AS sx,
    {sql_dsum('nxt')} AS sy,
    {sql_dsum('(value)*(nxt)')} AS sxy,
    {sql_dsum('(value)*(value)')} AS sxx,
    {sql_dsum('(nxt)*(nxt)')} AS syy
  FROM s WHERE nxt IS NOT NULL GROUP BY user_id
)
SELECT a.user_id, CAST(a.n AS BIGINT) AS n_obs,
  a.s1 / a.n AS value_mean,
  CASE WHEN a.n > 1
    THEN SQRT(GREATEST((a.s2 - a.s1 * a.s1 / a.n) / (a.n - 1), 0.0))
    ELSE 0.0 END AS value_std,
  a.vmin AS value_min, a.vmax AS value_max,
  CASE WHEN p.np >= 2
        AND (p.np * p.sxx - p.sx * p.sx) * (p.np * p.syy - p.sy * p.sy) > 0
    THEN (p.np * p.sxy - p.sx * p.sy)
         / SQRT((p.np * p.sxx - p.sx * p.sx) * (p.np * p.syy - p.sy * p.sy))
    ELSE 0.0 END AS lag1_autocorr,
  a.s2 AS energy
FROM agg a LEFT JOIN pairs p USING (user_id)
"""


@query("ts_features_pandas", oracle=TS_FEATURES_ORACLE)
def ts_features_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D4: tsfresh-style per-entity feature extraction (reference
    feature_store_manager.py:355-408) as applyInPandas — each user's ordered
    series becomes one feature row (mean/std/min/max/lag-1 autocorr/energy).
    Arrow-batched; the groupBy key partitions work evenly at any scale.

    Oracle-paired (de-weakened from rows-only): all sums route through the
    Python mirror of the decimal-exact dsum discipline (_pdsum above), the
    ordering tiebreak is pinned to (ts, event_id), and every remaining IEEE
    expression (mean division, std, the Pearson lag-1 autocorr over
    consecutive pairs) is association-mirrored in the SQL — so a value-hash
    compare holds bit-for-bit despite the Arrow boundary."""
    import math

    import pandas as pd

    e = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id", "value")

    def extract(pdf: pd.DataFrame) -> pd.DataFrame:
        # NULL *and NaN* values are dropped on BOTH sides (oracle: WHERE
        # value IS NOT NULL AND NOT isnan(value) — pandas notna() drops
        # both, and Arrow folds SQL NULL into NaN anyway): a NaN reaching
        # _pdsum would raise decimal.InvalidOperation at quantize and fail
        # the job, and pair/count semantics would diverge from SQL's
        # null-skipping aggregates
        pdf = pdf.sort_values(["ts", "event_id"])
        pdf = pdf[pdf["value"].notna()]
        if len(pdf) == 0:
            return pd.DataFrame(
                {
                    "user_id": pd.Series(dtype="int64"),
                    "n_obs": pd.Series(dtype="int64"),
                    "value_mean": pd.Series(dtype="float64"),
                    "value_std": pd.Series(dtype="float64"),
                    "value_min": pd.Series(dtype="float64"),
                    "value_max": pd.Series(dtype="float64"),
                    "lag1_autocorr": pd.Series(dtype="float64"),
                    "energy": pd.Series(dtype="float64"),
                }
            )
        v = [float(x) for x in pdf["value"]]
        n = len(v)
        s1 = _pdsum(v)
        s2 = _pdsum(x * x for x in v)
        mean = s1 / n
        if n > 1:
            var = max((s2 - s1 * s1 / n) / (n - 1), 0.0)
            std = math.sqrt(var)
        else:
            std = 0.0
        x, y = v[:-1], v[1:]
        npairs = len(x)
        if npairs >= 2:
            sx, sy = _pdsum(x), _pdsum(y)
            sxy = _pdsum(a * b for a, b in zip(x, y))
            sxx = _pdsum(a * a for a in x)
            syy = _pdsum(b * b for b in y)
            denom2 = (npairs * sxx - sx * sx) * (npairs * syy - sy * sy)
            autocorr = (
                (npairs * sxy - sx * sy) / math.sqrt(denom2) if denom2 > 0 else 0.0
            )
        else:
            autocorr = 0.0
        return pd.DataFrame(
            {
                "user_id": [int(pdf["user_id"].iloc[0])],
                "n_obs": [n],
                "value_mean": [mean],
                "value_std": [std],
                "value_min": [min(v)],
                "value_max": [max(v)],
                "lag1_autocorr": [autocorr],
                "energy": [s2],
            }
        )

    schema = (
        "user_id bigint, n_obs bigint, value_mean double, value_std double, "
        "value_min double, value_max double, lag1_autocorr double, energy double"
    )
    return e.groupBy("user_id").applyInPandas(extract, schema)


def make_scorer(weights: dict[str, float], bias: float):
    """D5: broadcast-model scoring as mapInPandas (reference
    realtime_inference_service.py:226-280): logistic over named features,
    0.5 threshold — the ensemble-mean shape with a deterministic stub model.

    Determinism notes (what makes the output oracle-comparable): z
    accumulates in weights-dict insertion order with plain IEEE adds (the
    SQL mirror uses the same association); the probability is rounded to 6
    decimals because libm exp() may differ between engines in the last ULP
    — via an EXPLICIT floor(p*1e6 + 0.5)/1e6 written identically in both
    engines (np.round is half-to-even while SQL ROUND is half-away, so the
    builtin rounders themselves can disagree at boundaries); the class
    label comes from ``z >= 0`` (exactly equivalent to prob >= 0.5, but
    decided on the pre-exp value both engines agree on bit-for-bit)."""
    import pandas as pd  # noqa: F401 — signature documentation

    def score(batches):
        import numpy as np

        for pdf in batches:
            z = np.full(len(pdf), bias)
            for feat, w in weights.items():
                z = z + w * pdf[feat].to_numpy()
            p = 1.0 / (1.0 + np.exp(-z))
            prob = np.floor(p * 1000000.0 + 0.5) / 1000000.0
            out = pdf[["customer_id"]].copy()
            out["churn_probability"] = prob
            out["churn_prediction"] = (z >= 0).astype("int32")
            yield out

    return score


SCORE_ORACLE = """
WITH feats AS (
  SELECT o_custkey AS customer_id,
    COUNT(*) AS total_orders,
    CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END)
         AS DOUBLE) / COUNT(*) AS urgent_ratio,
    CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END)
         AS DOUBLE) / COUNT(*) AS open_ratio
  FROM orders GROUP BY o_custkey
), scored AS (
  SELECT customer_id,
    (((-0.5 + (-0.05 * total_orders)) + (2.0 * urgent_ratio))
      + (1.0 * open_ratio)) AS z
  FROM feats
)
SELECT customer_id,
  FLOOR((1.0 / (1.0 + EXP(-z))) * 1000000.0 + 0.5) / 1000000.0
    AS churn_probability,
  CAST(CASE WHEN z >= 0 THEN 1 ELSE 0 END AS INT) AS churn_prediction
FROM scored
"""


@query("score_customers_pandas", oracle=SCORE_ORACLE)
def score_customers_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D5 end-to-end: feature build → conform → mapInPandas scoring.
    Oracle-paired (de-weakened from rows-only): the linear score z is
    IEEE-deterministic (counts and exact ratios through one mirrored
    expression), the logistic output is rounded to 6 dp on both sides, and
    the label is decided on z's sign — see make_scorer notes."""
    feats = customer_features(spark, sf_dir)
    weights = {"total_orders": -0.05, "urgent_ratio": 2.0, "open_ratio": 1.0}
    scorer = make_scorer(weights, bias=-0.5)
    schema = "customer_id bigint, churn_probability double, churn_prediction int"
    return feats.mapInPandas(scorer, schema)


# --- UDAF surface: pandas grouped-agg ------------------------------------------

MEDIAN_UDAF_ORACLE = """
SELECT o_orderstatus,
       MEDIAN(o_totalprice) AS median_price,
       COUNT(*) AS n_orders
FROM orders GROUP BY o_orderstatus
"""


@query("median_price_udaf", oracle=MEDIAN_UDAF_ORACLE)
def median_price_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The UDAF surface SURVEY §2.10 notes as absent from the reference:
    a pandas grouped-agg UDF (Spark's Python UDAF form) computing the EXACT
    per-group median, used directly inside ``.agg()`` beside a native count.

    Arrow ships each group's column as one pandas Series; the result is a
    scalar per group. Exact median needs the whole group in one place by
    definition — that is the cost of exactness, and the reason the profiling
    layer (A8) uses percentile_approx for the 100 TB path. Median of doubles
    is order-independent (middle element / midpoint of two), so values
    hash-match the oracle, unlike a float sum."""

    @F.pandas_udf("double")
    def exact_median(v: pd.Series) -> float:
        return float(v.median())

    # Spark disallows mixing grouped-agg pandas UDFs with JVM aggregates in
    # one .agg() (INVALID_PANDAS_UDF_PLACEMENT), so the count rides the same
    # Arrow batch as a second UDAF.
    @F.pandas_udf("long")
    def group_size(v: pd.Series) -> int:
        return len(v)

    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        exact_median("o_totalprice").alias("median_price"),
        group_size("o_totalprice").alias("n_orders"),
    )


# --- deterministic train/val/test split --------------------------------------

SPLIT_ORACLE = """
WITH hashed AS (
  SELECT doc_id, lang,
         CAST(LEN(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         CAST(('0x' || SUBSTR(MD5(CAST(doc_id AS VARCHAR) || '#split'), 1, 15))
              AS BIGINT) % 100 AS bucket
  FROM documents
)
SELECT CASE WHEN bucket < 80 THEN 'train'
            WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split,
       lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
FROM hashed
GROUP BY 1, 2
"""


@query("train_test_split", oracle=SPLIT_ORACLE)
def train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test split via a PORTABLE content
    hash of the stable key (md5 → 60-bit int → mod 100), NOT randomSplit:
    the assignment is reproducible across runs, engines, cluster sizes, and
    re-partitioning — the property a training pipeline needs so no document
    ever migrates between splits when data is re-processed (leakage).
    Rolled up by (split, lang) to audit per-language balance. Map-side only
    until the tiny final aggregation; no extra shuffle at any scale.

    Reference parity: the reference samples with SQL BERNOULLI + LIMIT
    (ml_platform/training/automated_training_pipeline.py:142-160), which is
    neither deterministic nor leak-proof across reruns; this is the
    warehouse-native hardening of that step.
    """
    d = load_table(spark, sf_dir, "documents")
    bucket = F.pmod(
        F.conv(
            F.substring(
                F.md5(F.concat_ws("#", F.col("doc_id").cast("string"), F.lit("split"))),
                1,
                15,
            ),
            16,
            10,
        ).cast("bigint"),
        F.lit(100),
    )
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    )
    return (
        d.select(
            split.alias("split"),
            "lang",
            F.size(F.split("text", " ")).cast("bigint").alias("n_tokens"),
        )
        .groupBy("split", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
        )
    )


# --- point-in-time-correct feature snapshots ----------------------------------

PIT_STALENESS_HOURS = 24  # features older than this at label time are void

PIT_ORACLE = f"""
WITH ordered AS (
  SELECT user_id, ts, event_id, event_type, value,
    COUNT(*) OVER w AS n_prior,
    COUNT(CASE WHEN event_type = 'click' THEN 1 END) OVER w AS n_prior_clicks,
    MAX(ts) OVER w AS last_feature_ts
  FROM events
  WINDOW w AS (
    PARTITION BY user_id ORDER BY ts, event_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
  )
)
SELECT user_id, event_id AS label_event_id, ts AS label_ts,
  n_prior, n_prior_clicks,
  last_feature_ts IS NOT NULL
    AND ts - last_feature_ts <= INTERVAL {PIT_STALENESS_HOURS} HOUR
    AS features_fresh
FROM ordered
WHERE event_type = 'purchase'
"""


@query("pit_feature_snapshot", oracle=PIT_ORACLE)
def pit_feature_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time-correct feature snapshot — the feature-store join that
    prevents label leakage: for every label event (purchase) the features
    are computed from STRICTLY-PRIOR events only (frame ends at -1
    PRECEDING), with a staleness bound voiding features older than
    PIT_STALENESS_HOURS at label time (the training-serving skew guard —
    online serving would likewise miss an expired cache, reference
    feature-cache TTL ml_pipeline_framework.py:675-679).

    Spark-first shape: no per-label as-of join against a feature table —
    label and feature rows share the entity timeline, so ONE user_id
    exchange and ONE ordered frame produce every label's snapshot; tie
    order (ts, event_id) is total, so the cut is deterministic. At 100 TB
    the frame state is O(1) per row (count/max accumulators), and the
    per-user ordering matches the feature-table clustering a real store
    maintains. Ref parity: training query at
    automated_training_pipeline.py:142-160 joins features with NO time
    guard — this operator is that join done right."""
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    snap = e.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.count("*").over(w).alias("n_prior"),
        F.count(F.when(F.col("event_type") == "click", 1)).over(w).alias(
            "n_prior_clicks"
        ),
        F.max("ts").over(w).alias("last_feature_ts"),
    )
    # µs-exact staleness test (a cast-to-seconds diff truncates and can
    # flip the verdict within 1 s of the boundary vs the oracle's interval)
    fresh = F.col("last_feature_ts").isNotNull() & (
        F.unix_micros("ts") - F.unix_micros("last_feature_ts")
        <= PIT_STALENESS_HOURS * 3600 * 1_000_000
    )
    return snap.where(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("label_event_id"),
        F.col("ts").alias("label_ts"),
        "n_prior",
        "n_prior_clicks",
        fresh.alias("features_fresh"),
    )


# --- target encoding (smoothed + leave-one-out) ------------------------------

TE_SMOOTHING = 10.0  # pseudo-observations pulled toward the global mean

TARGET_ENC_ORACLE = f"""
WITH base AS (
  SELECT o.o_orderkey, c.c_mktsegment AS segment, o.o_totalprice AS target
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
), seg AS (
  SELECT segment,
    SUM(CAST(target AS DECIMAL(38,10))) AS seg_sum_dec,
    COUNT(*) AS n_seg
  FROM base GROUP BY segment
), seg2 AS (
  SELECT segment, seg_sum_dec, n_seg,
    (CAST(FLOOR(ROUND(SUM(seg_sum_dec) OVER (), 4)) AS DOUBLE) + CAST(ROUND(SUM(seg_sum_dec) OVER (), 4) - FLOOR(ROUND(SUM(seg_sum_dec) OVER (), 4)) AS DOUBLE))
      / SUM(n_seg) OVER () AS global_mean
  FROM seg
)
SELECT b.o_orderkey, b.segment, b.target,
  ((CAST(FLOOR(ROUND(s.seg_sum_dec, 4)) AS DOUBLE) + CAST(ROUND(s.seg_sum_dec, 4) - FLOOR(ROUND(s.seg_sum_dec, 4)) AS DOUBLE)) + {TE_SMOOTHING} * s.global_mean)
    / (s.n_seg + {TE_SMOOTHING}) AS smooth_enc,
  (CAST(FLOOR(ROUND(s.seg_sum_dec - CAST(b.target AS DECIMAL(38,10)), 4)) AS DOUBLE) + CAST(ROUND(s.seg_sum_dec - CAST(b.target AS DECIMAL(38,10)), 4) - FLOOR(ROUND(s.seg_sum_dec - CAST(b.target AS DECIMAL(38,10)), 4)) AS DOUBLE))
    / (s.n_seg - 1) AS loo_enc
FROM base b JOIN seg2 s USING (segment)
"""


@query("target_encoding", oracle=TARGET_ENC_ORACLE)
def target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Target (mean) encoding of a categorical against a continuous target,
    in the two forms that matter for training data:

    - ``smooth_enc``: additive smoothing toward the global mean
      ((Σ_cat + m·ḡ)/(n_cat + m), m=TE_SMOOTHING=10) — rare categories
      shrink to the prior instead of memorizing noise;
    - ``loo_enc``: leave-one-out ((Σ_cat − own)/(n_cat − 1)) — the
      LEAK-PROOF per-row form (a row never sees its own label; plain mean
      encoding leaks the target into its own feature).

    Float discipline: category sums are exact DECIMAL(38,10) (associative
    → partition-order-free), the LOO subtraction happens in decimal, and
    each output is one fixed chain of IEEE double ops — bit-identical to
    the oracle. Scale shape: one fact-side join exchange; the category
    stats table is tiny and BROADCASTS; the global mean comes from a
    window over that tiny frame, so no 1-row crossJoin and no second fact
    scan."""
    from ..functions.deterministic import DEC, dec2dbl

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    base = o.join(c, o.o_custkey == c.c_custkey).select(
        "o_orderkey",
        F.col("c_mktsegment").alias("segment"),
        F.col("o_totalprice").alias("target"),
    )
    seg = base.groupBy("segment").agg(
        F.sum(F.col("target").cast(DEC)).alias("seg_sum_dec"),
        F.count("*").alias("n_seg"),
    )
    w = Window.partitionBy()  # |segments| rows: global stats without rescan
    seg2 = seg.withColumn(
        "global_mean",
        dec2dbl(F.sum("seg_sum_dec").over(w)) / F.sum("n_seg").over(w),
    )
    joined = base.join(F.broadcast(seg2), "segment")
    return joined.select(
        "o_orderkey",
        "segment",
        "target",
        (
            (dec2dbl(F.col("seg_sum_dec")) + TE_SMOOTHING * F.col("global_mean"))
            / (F.col("n_seg") + TE_SMOOTHING)
        ).alias("smooth_enc"),
        (
            dec2dbl(F.col("seg_sum_dec") - F.col("target").cast(DEC))
            / (F.col("n_seg") - 1)
        ).alias("loo_enc"),
    )


# --- feature hashing (the hashing trick) -------------------------------------

FH_BUCKETS = 32

FEATURE_HASH_ORACLE = f"""
WITH feats AS (
  SELECT c_custkey, 'mkt=' || c_mktsegment AS feat FROM customer
  UNION ALL
  SELECT c_custkey, 'nation=' || CAST(c_nationkey AS VARCHAR) AS feat
  FROM customer
), hashed AS (
  SELECT c_custkey,
    CAST(('0x' || SUBSTR(MD5(feat || '#fh'), 1, 15)) AS BIGINT)
      % {FH_BUCKETS} AS bucket,
    CASE WHEN CAST(('0x' || SUBSTR(MD5(feat || '#fhsign'), 1, 15)) AS BIGINT)
      % 2 = 0 THEN 1 ELSE -1 END AS sign
  FROM feats
)
SELECT c_custkey, bucket, CAST(SUM(sign) AS BIGINT) AS feat_weight
FROM hashed GROUP BY c_custkey, bucket
"""


@query("feature_hashing", oracle=FEATURE_HASH_ORACLE)
def feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hashing trick (Weinberger et al. 2009): categorical features
    fold into a FIXED FH_BUCKETS(=32)-dim space via the portable hash, with a
    second hash bit supplying the ±1 sign that keeps collisions unbiased
    in expectation. No vocabulary table, no fit step, new category values
    at inference hash to a stable bucket — the property that makes this
    the default encoder for unbounded-cardinality features at 100 TB.

    Map-side only until the final (entity, bucket) integer rollup; output
    is the sparse long form (entity, bucket, weight) that feeds
    feature_vector_conform."""
    from ..operators.dedup import portable_hash64

    c = load_table(spark, sf_dir, "customer")
    feats = c.select(
        "c_custkey", F.concat(F.lit("mkt="), F.col("c_mktsegment")).alias("feat")
    ).unionByName(
        c.select(
            "c_custkey",
            F.concat(F.lit("nation="), F.col("c_nationkey").cast("string")).alias(
                "feat"
            ),
        )
    )
    hashed = feats.select(
        "c_custkey",
        F.pmod(portable_hash64(F.col("feat"), "fh"), F.lit(FH_BUCKETS)).alias(
            "bucket"
        ),
        F.when(
            F.pmod(portable_hash64(F.col("feat"), "fhsign"), F.lit(2)) == 0, 1
        )
        .otherwise(-1)
        .alias("sign"),
    )
    return hashed.groupBy("c_custkey", "bucket").agg(
        F.sum("sign").alias("feat_weight")
    )
