"""Text-analysis operators for training-data pipelines (driver-mandated
extension; BASELINE.json north star — language-ID, quality scoring, token
counting, fingerprinting over the `documents` table).

All hot-path expressions are JVM-side array/lambda functions
(split/filter/aggregate) — no Python UDFs, so they whole-stage-codegen and
scale linearly with document bytes. Per-row ratios are IEEE double ops
(engine-exact); anything summed is integer counts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..queries import query
from ..sources.tables import cpu_parallelism, load_table

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is")

# tiny marker dictionaries for the n-gram/marker language heuristic; the
# synthetic corpus is word soup, so the *operator* (scored argmax) is the
# deliverable, not linguistic accuracy.
LANG_MARKERS = {
    "en": ("the", "a", "and", "of"),
    "es": ("el", "la", "de", "que"),
    "de": ("der", "die", "und", "das"),
    "fr": ("le", "la", "et", "les"),
    "zh": ("的", "了", "是", "在"),
}


def tokens(col: str = "text") -> Column:
    """Whitespace tokenization, JVM-side."""
    return F.split(F.col(col), " ")


def token_in_set(arr: Column, words: tuple[str, ...]) -> Column:
    lit_arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(arr, lambda x: F.array_contains(lit_arr, x)))


QUALITY_ORACLE = """
SELECT doc_id, lang,
  LEN(string_split(text, ' ')) AS n_tokens,
  LEN(list_filter(string_split(text, ' '),
      x -> x IN ('the','a','of','and','to','in','is'))) AS n_stopwords,
  CAST(LEN(list_filter(string_split(text, ' '),
      x -> x IN ('the','a','of','and','to','in','is'))) AS DOUBLE)
    / LEN(string_split(text, ' ')) AS stopword_ratio,
  CAST(LEN(text) AS DOUBLE) / LEN(string_split(text, ' ')) AS avg_token_len,
  LEN(regexp_extract_all(lower(text), '[a-z0-9]+')) AS n_word_tokens,
  CASE WHEN LEN(string_split(text, ' ')) < 10 THEN 'TOO_SHORT'
       WHEN CAST(LEN(list_filter(string_split(text, ' '),
            x -> x IN ('the','a','of','and','to','in','is'))) AS DOUBLE)
            / LEN(string_split(text, ' ')) > 0.5 THEN 'BOILERPLATE'
       ELSE 'OK' END AS quality_flag
FROM documents
"""


@query("text_quality_scores", oracle=QUALITY_ORACLE, bench=True)
def text_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: token counts, stopword ratio, avg token length,
    regexp token count (the BPE-ish pre-tokenizer), CASE quality flag."""
    # tokenize ONCE into a bound column: five downstream expressions share
    # the array instead of re-splitting text per expression.
    d = load_table(spark, sf_dir, "documents").withColumn("_toks", tokens())
    toks = F.col("_toks")
    n_tokens = F.size(toks)
    n_stop = token_in_set(toks, STOPWORDS)
    stop_ratio = n_stop.cast("double") / n_tokens
    return d.select(
        "doc_id",
        "lang",
        n_tokens.alias("n_tokens"),
        n_stop.alias("n_stopwords"),
        stop_ratio.alias("stopword_ratio"),
        (F.length("text").cast("double") / n_tokens).alias("avg_token_len"),
        F.size(F.regexp_extract_all(F.lower("text"), F.lit("[a-z0-9]+"), 0)).alias(
            "n_word_tokens"
        ),
        F.when(n_tokens < 10, "TOO_SHORT")
        .when(stop_ratio > 0.5, "BOILERPLATE")
        .otherwise("OK")
        .alias("quality_flag"),
    )


def _lang_score_sql(lang: str) -> str:
    words = ",".join(f"'{w}'" for w in LANG_MARKERS[lang])
    return f"LEN(list_filter(string_split(text, ' '), x -> x IN ({words})))"


LANGID_ORACLE = f"""
WITH scored AS (
  SELECT doc_id, lang,
    {_lang_score_sql('en')} AS s_en,
    {_lang_score_sql('es')} AS s_es,
    {_lang_score_sql('de')} AS s_de,
    {_lang_score_sql('fr')} AS s_fr,
    {_lang_score_sql('zh')} AS s_zh
  FROM documents
)
SELECT doc_id, lang,
  CASE GREATEST(s_en, s_es, s_de, s_fr, s_zh)
    WHEN 0 THEN 'unknown'
    WHEN s_en THEN 'en' WHEN s_es THEN 'es' WHEN s_de THEN 'de'
    WHEN s_fr THEN 'fr' ELSE 'zh' END AS predicted_lang,
  GREATEST(s_en, s_es, s_de, s_fr, s_zh) AS marker_hits
FROM scored
"""


@query("language_id", oracle=LANGID_ORACLE)
def language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-word language heuristic: per-language hit counts → argmax with
    a fixed precedence order (en>es>de>fr>zh on ties — identical CASE
    cascade in both engines)."""
    d = load_table(spark, sf_dir, "documents")
    toks = tokens()
    scores = {lang: token_in_set(toks, LANG_MARKERS[lang]) for lang in LANG_MARKERS}
    scored = d.select("doc_id", "lang", *[scores[L].alias(f"s_{L}") for L in scores])
    best = F.greatest(*[F.col(f"s_{L}") for L in LANG_MARKERS])
    pred = (
        F.when(best == 0, "unknown")
        .when(best == F.col("s_en"), "en")
        .when(best == F.col("s_es"), "es")
        .when(best == F.col("s_de"), "de")
        .when(best == F.col("s_fr"), "fr")
        .otherwise("zh")
    )
    return scored.select(
        "doc_id", "lang", pred.alias("predicted_lang"), best.alias("marker_hits")
    )


FINGERPRINT_ORACLE = """
SELECT doc_id,
  MD5(LOWER(TRIM(regexp_replace(text, '\\s+', ' ', 'g')))) AS fingerprint,
  n_chars,
  SUBSTR(MD5(LOWER(TRIM(regexp_replace(text, '\\s+', ' ', 'g')))), 1, 4) AS shard_key
FROM documents
"""


@query("doc_fingerprint", oracle=FINGERPRINT_ORACLE)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: md5 over whitespace-normalized lowered text;
    a 4-hex shard key for fingerprint-partitioned dedup at scale (2^16
    shards — each shard's dup-group fits one task at 100 TB)."""
    d = load_table(spark, sf_dir, "documents")
    normalized = F.lower(F.trim(F.regexp_replace("text", r"\s+", " ")))
    fp = F.md5(normalized)
    return d.select(
        "doc_id",
        fp.alias("fingerprint"),
        "n_chars",
        F.substring(fp, 1, 4).alias("shard_key"),
    )


# --- end-to-end corpus pipeline -------------------------------------------------

CORPUS_PIPELINE_ORACLE = """
WITH corpus AS (
  SELECT doc_id, text, lang FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, text, lang
  FROM documents WHERE doc_id % 5 = 0
), deduped AS (
  SELECT MIN(doc_id) AS doc_id, MIN(text) AS text, MIN(lang) AS lang
  FROM corpus GROUP BY MD5(text)
), scored AS (
  SELECT doc_id, lang,
    LEN(string_split(text, ' ')) AS n_tokens,
    CAST(LEN(list_filter(string_split(text, ' '),
        x -> x IN ('the','a','of','and','to','in','is'))) AS DOUBLE)
      / LEN(string_split(text, ' ')) AS stopword_ratio
  FROM deduped
), kept AS (
  SELECT * FROM scored WHERE n_tokens >= 10 AND stopword_ratio <= 0.5
)
SELECT lang,
  COUNT(*) AS n_docs,
  CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
  CAST(SUM(n_tokens) AS DOUBLE) / COUNT(*) AS avg_tokens_per_doc
FROM kept GROUP BY lang
"""


@query("corpus_pipeline", oracle=CORPUS_PIPELINE_ORACLE)
def corpus_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The training-data pipeline end-to-end in ONE lazy plan: exact dedup
    (hash-groupBy, deterministic survivor) → quality gate (length + stopword
    ratio) → per-language corpus stats. Composing the stages as DataFrames
    lets Catalyst collapse the projections: the scan reads (doc_id, text,
    lang) once, and the only shuffles are the dedup groupBy and the final
    per-language rollup — a stage-per-operator pipeline (the reference's
    dbt-model-per-step shape) would rescan between each."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    dupes = d.where(F.col("doc_id") % 5 == 0).withColumn(
        "doc_id", F.col("doc_id") + 1000000
    )
    corpus = d.unionByName(dupes)
    deduped = (
        corpus.groupBy(F.md5("text").alias("_h"))
        .agg(
            F.min("doc_id").alias("doc_id"),
            F.min("text").alias("text"),
            F.min("lang").alias("lang"),
        )
        .drop("_h")
    )
    toks = F.split(F.col("text"), " ")
    scored = deduped.select(
        "doc_id",
        "lang",
        F.size(toks).alias("n_tokens"),
        (token_in_set(toks, STOPWORDS).cast("double") / F.size(toks)).alias(
            "stopword_ratio"
        ),
    )
    kept = scored.where((F.col("n_tokens") >= 10) & (F.col("stopword_ratio") <= 0.5))
    return kept.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        (F.sum("n_tokens").cast("double") / F.count("*")).alias("avg_tokens_per_doc"),
    )


# --- TF-IDF top terms -----------------------------------------------------------

TFIDF_ORACLE = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
), filtered AS (
  SELECT doc_id, token FROM toks WHERE LEN(token) >= 3
), tf AS (
  SELECT doc_id, token, COUNT(*) AS tf FROM filtered GROUP BY doc_id, token
), df AS (
  SELECT token, COUNT(DISTINCT doc_id) AS df FROM filtered GROUP BY token
), n AS (
  SELECT COUNT(*) AS n_docs FROM documents
), scored AS (
  SELECT tf.doc_id, tf.token, tf.tf, df.df,
         tf.tf * LN(CAST(n.n_docs AS DOUBLE) / df.df) AS tfidf
  FROM tf JOIN df USING (token) CROSS JOIN n
)
SELECT doc_id, token, tf, df, ROUND(tfidf, 4) AS tfidf_r4
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                   ORDER BY tfidf DESC, token) AS rn
      FROM scored)
WHERE rn <= 5
"""


@query("tfidf_top_terms", oracle=TFIDF_ORACLE)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF top-5 terms per document — the corpus-statistics pipeline in
    one plan: explode → per-(doc,token) TF → per-token DF → scalar corpus
    size (broadcast by Catalyst as a 1-row cross join) → score → windowed
    top-k with a lexicographic tie-break (deterministic across engines;
    tf·ln(N/df) is one IEEE multiply of exact integers' ratio-log).

    Scale shape: two aggregations share the exploded token stream; DF
    (vocabulary-sized) broadcasts back onto TF at 100 TB, and the final
    window partitions by doc_id — the same key TF already shuffled on, so
    AQE can reuse the partitioning."""
    d = load_table(spark, sf_dir, "documents")
    # explode_OUTER: the non-outer form makes the optimizer infer
    # size(split(..))>0/isnotnull and re-evaluate the split twice below the
    # exchange (see dedup._ngram_pair_partials); the length filter already
    # drops the NULL row the outer form emits for an empty array.
    toks = d.select(
        "doc_id", F.explode_outer(F.split("text", " ")).alias("token")
    ).where(F.length("token") >= 3)
    tf = toks.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    df = toks.groupBy("token").agg(F.countDistinct("doc_id").alias("df"))
    n_docs = d.count()  # driver-side scalar: one tiny agg, pinned into the plan
    scored = tf.join(df, "token").select(
        "doc_id",
        "token",
        "tf",
        "df",
        (F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df"))).alias("tfidf"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), "token")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 5)
        .select(
            "doc_id",
            "token",
            "tf",
            "df",
            # ln() differs from DuckDB's libm in the last ULP; the emitted
            # score is rounded to 4dp (ordering stays on the raw double —
            # score ties across engines only occur at identical (tf, df),
            # which the token tie-break resolves identically).
            F.round("tfidf", 4).alias("tfidf_r4"),
        )
    )


# --- corpus mixing: per-source differential-rate sampling --------------------

# Mix tiers (training-data mixing: upsample high-quality sources, downsample
# the crawl). Rates are powers of two so the acceptance threshold is an EXACT
# integer against the 60-bit md5-derived uniform — no float comparison can
# diverge between engines. 2^60 = 1152921504606846976.
_MIX_TIERS = [  # (max source idx exclusive, rate, threshold = rate * 2^60)
    (5, 1.0, 1152921504606846976),
    (10, 0.5, 576460752303423488),
    (15, 0.25, 288230376151711744),
]
_MIX_DEFAULT = (0.125, 144115188075855872)

MIX_ORACLE = f"""
WITH rated AS (
  SELECT doc_id, source,
    CAST(SUBSTR(source, 4) AS INT) AS src_idx,
    CAST(('0x' || SUBSTR(MD5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS u
  FROM documents
)
SELECT doc_id, source,
  CAST(CASE WHEN src_idx < 5 THEN 1.0 WHEN src_idx < 10 THEN 0.5
       WHEN src_idx < 15 THEN 0.25 ELSE 0.125 END AS DOUBLE) AS sample_rate
FROM rated
WHERE u < CASE WHEN src_idx < {_MIX_TIERS[0][0]} THEN {_MIX_TIERS[0][2]}
               WHEN src_idx < {_MIX_TIERS[1][0]} THEN {_MIX_TIERS[1][2]}
               WHEN src_idx < {_MIX_TIERS[2][0]} THEN {_MIX_TIERS[2][2]}
               ELSE {_MIX_DEFAULT[1]} END
"""


@query("corpus_source_mix", oracle=MIX_ORACLE)
def corpus_source_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-data mixing: per-source differential-rate sampling. Each doc
    draws a reproducible uniform from the top 60 bits of md5(doc_id) and is
    kept iff u < rate·2^60 for its source's tier — the deterministic
    Bernoulli that makes a 100 TB data mix re-runnable byte-for-byte (and
    resumable: membership is a pure function of doc_id, no RNG state).
    Entirely map-side — filter and projection push to the parquet scan;
    shuffle count: zero."""
    d = load_table(spark, sf_dir, "documents")
    src_idx = F.substring("source", 4, 10).cast("int")
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10)
        .cast("bigint")
    )
    rate = thresh = None
    for bound, r, t in reversed(_MIX_TIERS):
        rate = F.when(src_idx < bound, r).otherwise(
            rate if rate is not None else F.lit(_MIX_DEFAULT[0])
        )
        thresh = F.when(src_idx < bound, t).otherwise(
            thresh if thresh is not None else F.lit(_MIX_DEFAULT[1])
        )
    return d.where(u < thresh).select("doc_id", "source", rate.alias("sample_rate"))


# --- PII scrub ---------------------------------------------------------------

_EMAIL_RE = "[a-z0-9]+@[a-z]+\\.[a-z]+"
_PHONE_RE = "555-[0-9]{4}"

PII_ORACLE = f"""
WITH corpus AS (
  SELECT doc_id,
    CASE WHEN doc_id % 7 = 0 THEN
      text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com or 555-'
           || LPAD(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
    ELSE text END AS text
  FROM documents
)
SELECT doc_id,
  LEN(regexp_extract_all(text, '{_EMAIL_RE}')) AS n_emails,
  LEN(regexp_extract_all(text, '{_PHONE_RE}')) AS n_phones,
  MD5(regexp_replace(regexp_replace(text, '{_EMAIL_RE}', '<EMAIL>', 'g'),
      '{_PHONE_RE}', '<PHONE>', 'g')) AS scrubbed_md5
FROM corpus
"""


@query("pii_scrub", oracle=PII_ORACLE)
def pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction: regexp count + replace of emails/phones, verified by
    md5 of the scrubbed text (hash travels, not the text). Test fixture
    plants a deterministic email+phone in every 7th doc (the synthetic
    corpus contains none). Pure per-row JVM regex — map-side, zero shuffle,
    pushdown-friendly; the shape that runs at 100 TB as a plain projection.
    """
    d = load_table(spark, sf_dir, "documents")
    planted = F.when(
        F.col("doc_id") % 7 == 0,
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or 555-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        ),
    ).otherwise(F.col("text"))
    t = F.col("t")
    return d.select("doc_id", planted.alias("t")).select(
        "doc_id",
        F.size(F.regexp_extract_all(t, F.lit(_EMAIL_RE), 0)).alias("n_emails"),
        F.size(F.regexp_extract_all(t, F.lit(_PHONE_RE), 0)).alias("n_phones"),
        F.md5(
            F.regexp_replace(
                F.regexp_replace(t, _EMAIL_RE, "<EMAIL>"), _PHONE_RE, "<PHONE>"
            )
        ).alias("scrubbed_md5"),
    )


# --- BPE-ish token counting ------------------------------------------------

# GPT-2-style pre-tokenizer shape, ASCII-scoped so Java regex (Spark) and
# RE2 (DuckDB) agree match-for-match: contraction suffixes, then
# space-prefixed letter runs, digit runs, symbol runs, then bare whitespace.
# Verified identical counts across engines on the full sf0.01 corpus.
BPE_PAT = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+"

TOKEN_COUNT_ORACLE = f"""
SELECT doc_id, lang,
  LEN(string_split(text, ' ')) AS ws_tokens,
  LEN(regexp_extract_all(text, '{BPE_PAT.replace("'", "''")}')) AS bpe_tokens,
  CAST(LEN(regexp_extract_all(text, '{BPE_PAT.replace("'", "''")}')) AS DOUBLE)
    / LEN(string_split(text, ' ')) AS tokens_per_word
FROM documents
"""


@query("token_count_profile", oracle=TOKEN_COUNT_ORACLE)
def token_count_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting, both ways the brief asks for: whitespace tokens and a
    BPE-ish regex tokenizer (GPT-2 pre-tokenizer shape — the standard proxy
    for LLM token budgets when the real BPE merges table isn't in the
    engine). Pure per-row regex/array ops: no shuffle, whole-stage codegen,
    linear in document bytes at any scale. tokens_per_word is the
    cost-planning ratio (≈1.3 for English prose under GPT-2)."""
    d = load_table(spark, sf_dir, "documents")
    ws = F.size(tokens())
    bpe = F.size(F.regexp_extract_all("text", F.lit(BPE_PAT), 0))
    return d.select(
        "doc_id",
        "lang",
        ws.alias("ws_tokens"),
        bpe.alias("bpe_tokens"),
        (bpe.cast("double") / ws).alias("tokens_per_word"),
    )


# --- repetition / degenerate-text quality signals ---------------------------

REPETITION_ORACLE = """
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
), base AS (
  SELECT doc_id, len(w) AS n_words, len(list_distinct(w)) AS n_distinct, w
  FROM w WHERE len(w) >= 3
), bi AS (
  SELECT doc_id, unnest(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])) AS g
  FROM base
), bic AS (
  SELECT doc_id, g, COUNT(*) AS c FROM bi GROUP BY doc_id, g
), bia AS (
  SELECT doc_id, CAST(MAX(c) AS DOUBLE) / CAST(SUM(c) AS DOUBLE) AS top_bigram_frac
  FROM bic GROUP BY doc_id
), tri AS (
  SELECT doc_id, unnest(list_transform(range(1, len(w) - 1),
                        i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS g
  FROM base
), tric AS (
  SELECT doc_id, g, COUNT(*) AS c FROM tri GROUP BY doc_id, g
), tria AS (
  SELECT doc_id, CAST(MAX(c) AS DOUBLE) / CAST(SUM(c) AS DOUBLE) AS top_trigram_frac
  FROM tric GROUP BY doc_id
)
SELECT b.doc_id,
  b.n_words,
  CAST(b.n_distinct AS DOUBLE) / b.n_words AS distinct_word_ratio,
  bia.top_bigram_frac,
  tria.top_trigram_frac
FROM base b
JOIN bia ON b.doc_id = bia.doc_id
JOIN tria ON b.doc_id = tria.doc_id
"""


def _top_gram_frac(d: DataFrame, n: int, out: str) -> DataFrame:
    """(doc_id, <out>) where <out> = count of the most frequent word n-gram
    over total n-grams — the Gopher-style repeated-phrase signal. Overlapping
    n-grams are built map-side from the bound token array; the two
    aggregations are map-side-combinable groupBys (no window, no sort)."""
    w = F.col("_w")
    grams = F.transform(
        F.sequence(F.lit(0), F.size(w) - n),
        lambda i: F.concat_ws(" ", *[F.element_at(w, i + j + 1) for j in range(n)]),
    )
    per_gram = (
        # explode_OUTER + isNotNull — avoids the inferred-filter re-evaluation
        # of the interpreted gram chain (see dedup._ngram_pair_partials)
        d.select("doc_id", F.explode_outer(grams).alias("g"))
        .where(F.col("g").isNotNull())
        .groupBy("doc_id", "g")
        .agg(F.count("*").alias("c"))
    )
    return per_gram.groupBy("doc_id").agg(
        (F.max("c").cast("double") / F.sum("c").cast("double")).alias(out)
    )


@query("repetition_scores", oracle=REPETITION_ORACLE)
def repetition_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degenerate-text detection for training corpora (the Gopher repetition
    rules): distinct-word ratio plus top-bigram / top-trigram mass fraction.
    Looping or boilerplate text scores high on the gram fractions and low on
    distinct ratio; downstream filters threshold these columns.

    Scale shape: token arrays bind once map-side; each n-gram signal is
    explode → two combinable groupBys keyed by doc_id (partial aggregation
    collapses per-doc grams before the shuffle); final assembly is two
    equi-joins on doc_id. No windows, no global sorts. Ratios are
    int/int double divisions — engine-exact, no rounding discipline needed.
    """
    d = (
        load_table(spark, sf_dir, "documents", min_partitions=cpu_parallelism(spark))
        .select("doc_id", F.split(F.col("text"), " ").alias("_w"))
        .where(F.size("_w") >= 3)
    )
    base = d.select(
        "doc_id",
        F.size("_w").alias("n_words"),
        (F.size(F.array_distinct("_w")).cast("double") / F.size("_w")).alias(
            "distinct_word_ratio"
        ),
    )
    bi = _top_gram_frac(d, 2, "top_bigram_frac")
    tri = _top_gram_frac(d, 3, "top_trigram_frac")
    return base.join(bi, "doc_id").join(tri, "doc_id").select(
        "doc_id",
        "n_words",
        "distinct_word_ratio",
        "top_bigram_frac",
        "top_trigram_frac",
    )


# --- inverted index: BM25-ready posting lists --------------------------------

INVINDEX_K = 3  # postings kept per token (top-k by tf)

INVINDEX_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
), filtered AS (
  SELECT * FROM toks WHERE LEN(token) >= 3
), tf AS (
  SELECT doc_id, token, COUNT(*) AS tf FROM filtered GROUP BY doc_id, token
), stats AS (
  SELECT token, COUNT(*) AS df, CAST(SUM(tf) AS BIGINT) AS total_tf
  FROM tf GROUP BY token
), n AS (SELECT COUNT(*) AS n_docs FROM documents)
SELECT token, df, total_tf,
       ROUND(LN((CAST(n_docs AS DOUBLE) - df + 0.5) / (df + 0.5) + 1.0), 4)
         AS idf_bm25_r4,
       doc_id, tf, rn AS posting_rank
FROM (SELECT t.token, s.df, s.total_tf, t.doc_id, t.tf, n.n_docs,
             ROW_NUMBER() OVER (PARTITION BY t.token
                                ORDER BY t.tf DESC, t.doc_id) AS rn
      FROM tf t JOIN stats s USING (token) CROSS JOIN n)
WHERE rn <= {INVINDEX_K}
"""


@query("inverted_index_topk", oracle=INVINDEX_ORACLE)
def inverted_index_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse-retrieval index build: per-token document-frequency, corpus
    term-frequency, BM25 idf, and the top-k postings by tf — the lexical
    complement to the dense ANN index (similarity.py); together they are
    the hybrid-retrieval pair every RAG/training-data pipeline ships.

    Posting lists are emitted as RANKED ROWS (token, doc_id, tf,
    posting_rank), not collect_list arrays: at 100 TB a stopword-like
    token's full posting list cannot materialize in one row (same fan-out
    bound as MAX_BAND_BUCKET in dedup), and rows stay mergeable by any
    downstream sink. Scale shape: explode → two-level agg (per-(doc,token)
    tf is map-side combinable), vocabulary-sized stats join back on the
    token key tf already shuffled on, window partitions by that same key —
    one logical shuffle chain, reusable by AQE. idf uses the BM25+ form
    ln((N - df + ½)/(df + ½) + 1), one IEEE op over exact integers, rounded
    to 4dp for cross-engine hashing (rank ties resolve on (tf, doc_id),
    never on the float)."""
    d = load_table(spark, sf_dir, "documents", min_partitions=cpu_parallelism(spark))
    # explode_OUTER: the non-outer form makes the optimizer infer
    # size(split(..))>0/isnotnull and re-evaluate the split twice below the
    # exchange (see dedup._ngram_pair_partials); the length filter already
    # drops the NULL row the outer form emits for an empty array.
    toks = d.select(
        "doc_id", F.explode_outer(F.split("text", " ")).alias("token")
    ).where(F.length("token") >= 3)
    tf = toks.groupBy("token", "doc_id").agg(F.count("*").alias("tf"))
    stats = tf.groupBy("token").agg(
        F.count("*").alias("df"), F.sum("tf").alias("total_tf")
    )
    n_docs = d.count()  # driver-side scalar, pinned into the idf expression
    w = Window.partitionBy("token").orderBy(F.desc("tf"), "doc_id")
    idf = F.log(
        (F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    return (
        tf.join(stats, "token")
        .withColumn("posting_rank", F.row_number().over(w))
        .where(F.col("posting_rank") <= INVINDEX_K)
        .select(
            "token",
            "df",
            "total_tf",
            F.round(idf, 4).alias("idf_bm25_r4"),
            "doc_id",
            "tf",
            "posting_rank",
        )
    )


# --- weighted corpus sampling (Efraimidis–Spirakis exponential race) ----------

WSAMPLE_K = 100
_U60 = 1152921504606846976  # 2^60

WSAMPLE_ORACLE = f"""
WITH keyed AS (
  SELECT doc_id, source, n_chars,
    -LN((CAST(('0x' || SUBSTR(MD5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
         + 0.5) / {_U60}.0) / n_chars AS k
  FROM documents
)
SELECT doc_id, source, n_chars
FROM keyed ORDER BY k, doc_id LIMIT {WSAMPLE_K}
"""


@query("weighted_doc_sample", oracle=WSAMPLE_ORACLE)
def weighted_doc_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-size weighted sampling WITHOUT replacement (Efraimidis–
    Spirakis): each doc draws an exponential arrival −ln(u)/w with weight
    w = n_chars; the k earliest arrivals ARE a weighted sample — the
    quality-/length-weighted cousin of corpus_source_mix's Bernoulli rates
    when the output must be exactly k rows.

    u is the portable md5-60-bit uniform (deterministic, re-runnable —
    same sample every run, like every sampling op here). One map-side
    projection then ORDER BY LIMIT k, which Spark plans as
    TakeOrderedAndProject: per-partition k-heaps merged on the driver —
    no global sort, no single-partition window, scales to any corpus.
    Output carries no floats (the key stays internal), so cross-engine
    hashing is exact; a rank flip would need two arrival keys within one
    ULP, vanishing at any k."""
    d = load_table(spark, sf_dir, "documents", min_partitions=cpu_parallelism(spark))
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10)
        .cast("bigint")
        .cast("double")
        + 0.5
    ) / float(_U60)
    keyed = d.select(
        "doc_id", "source", "n_chars", (-F.log(u) / F.col("n_chars")).alias("k")
    )
    return (
        keyed.orderBy("k", "doc_id").limit(WSAMPLE_K).select("doc_id", "source", "n_chars")
    )


# --- temperature-flattened source mixing (stats-driven rates) -----------------

TEMP_T = 20.0  # count threshold: sources with n_docs <= T keep everything
#               (rate ∝ sqrt(T / n_docs) — the alpha=0.5 temperature flatten)

TEMPERATURE_MIX_ORACLE = f"""
WITH counts AS (
  SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source
), rated AS (
  SELECT source, n_docs,
    LEAST(1.0, SQRT({TEMP_T} / CAST(n_docs AS DOUBLE))) AS sample_rate
  FROM counts
)
SELECT r.source, r.n_docs, r.sample_rate,
  COUNT(CASE WHEN CAST(('0x' || SUBSTR(MD5(CAST(d.doc_id AS VARCHAR)
      || '#temp'), 1, 15)) AS BIGINT) + 0.5
      < r.sample_rate * {_U60}.0 THEN 1 END) AS n_kept
FROM rated r JOIN documents d ON d.source = r.source
GROUP BY r.source, r.n_docs, r.sample_rate
"""


@query("corpus_temperature_mix", oracle=TEMPERATURE_MIX_ORACLE)
def corpus_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-flattened source mixing: sampling rates COMPUTED from
    corpus statistics rather than declared per tier (the multilingual-LM
    `p_s ∝ n_s^alpha` rebalance, in its cross-source-sum-free count-threshold
    form `rate_s = min(1, sqrt(T / n_s))`, alpha = 0.5). Over-represented
    sources are downsampled toward sqrt-scale; sources at or under the
    threshold keep everything. Unlike `corpus_source_mix` (fixed tier
    rates), this is the two-pass stats→rates→filter pipeline a real mix
    rebalance runs.

    Scale shape: pass 1 is a map-side-combined count per source (shuffle =
    |sources| rows); the per-source rate table is broadcast back, so the
    keep decision is map-side over the corpus — zero wide shuffle of
    document rows; the output rollup re-uses the same tiny key space.
    Cross-engine exactness: rate_s is a pure per-source IEEE expression of
    an exact integer count (no cross-source float sum, which would be
    summation-order-dependent); the keep test compares the exact md5-60-bit
    uniform (salted '#temp' — independent of every other sampling op's
    draws) against rate·2^60 with identical double rounding in both
    engines. Ref parity: governance-tier sampling in
    scripts/utilities/generate_fact_dimension_models.py's source-volume
    balancing (declared); here stats-driven."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    counts = d.groupBy("source").agg(F.count("*").alias("n_docs"))
    rated = counts.select(
        "source",
        "n_docs",
        F.least(
            F.lit(1.0), F.sqrt(F.lit(TEMP_T) / F.col("n_docs").cast("double"))
        ).alias("sample_rate"),
    )
    u = (
        F.conv(
            F.substring(F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("#temp"))), 1, 15),
            16,
            10,
        )
        .cast("bigint")
        .cast("double")
        + 0.5
    )
    kept = u < F.col("sample_rate") * float(_U60)
    return (
        d.join(F.broadcast(rated), "source")
        .groupBy("source", "n_docs", "sample_rate")
        .agg(F.count(F.when(kept, 1)).alias("n_kept"))
    )


# --- Gopher-style quality-rule verdicts ---------------------------------------

GOPHER_MIN_WORDS = 20
GOPHER_MAX_WORDS = 100000
GOPHER_MIN_MWL = 3.0  # mean word length bounds
GOPHER_MAX_MWL = 10.0
GOPHER_MIN_ALPHA_FRAC = 0.8  # fraction of words containing a letter
GOPHER_MIN_STOPWORDS = 2
GOPHER_MIN_DISTINCT_RATIO = 0.3  # distinct-word mass (repetition guard)

_SW = ",".join(f"'{w}'" for w in STOPWORDS)

GOPHER_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
), feat AS (
  SELECT doc_id,
    LEN(w) AS n_words,
    CAST(list_sum(list_transform(w, x -> LEN(x))) AS DOUBLE) / LEN(w)
      AS mean_word_len,
    CAST(LEN(list_filter(w, x -> regexp_matches(x, '[a-z]'))) AS DOUBLE)
      / LEN(w) AS alpha_frac,
    LEN(list_filter(w, x -> x IN ({_SW}))) AS n_stopwords,
    CAST(LEN(list_distinct(w)) AS DOUBLE) / LEN(w) AS distinct_ratio
  FROM toks
)
SELECT doc_id, n_words, mean_word_len, alpha_frac, n_stopwords, distinct_ratio,
  n_words BETWEEN {GOPHER_MIN_WORDS} AND {GOPHER_MAX_WORDS} AS ok_word_count,
  mean_word_len BETWEEN {GOPHER_MIN_MWL} AND {GOPHER_MAX_MWL} AS ok_mean_word_len,
  alpha_frac >= {GOPHER_MIN_ALPHA_FRAC} AS ok_alpha,
  n_stopwords >= {GOPHER_MIN_STOPWORDS} AS ok_stopwords,
  distinct_ratio >= {GOPHER_MIN_DISTINCT_RATIO} AS ok_distinct,
  (n_words BETWEEN {GOPHER_MIN_WORDS} AND {GOPHER_MAX_WORDS})
    AND (mean_word_len BETWEEN {GOPHER_MIN_MWL} AND {GOPHER_MAX_MWL})
    AND alpha_frac >= {GOPHER_MIN_ALPHA_FRAC}
    AND n_stopwords >= {GOPHER_MIN_STOPWORDS}
    AND distinct_ratio >= {GOPHER_MIN_DISTINCT_RATIO} AS keep
FROM feat
"""


@query("gopher_quality_filters", oracle=GOPHER_ORACLE)
def gopher_quality_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-rule quality filtering (Rae et al. 2021 §A1.1 shape): per-doc
    rule features + one boolean PER RULE + the conjunctive keep verdict —
    the auditable form (a pipeline owner needs to see WHICH rule dropped a
    doc, not just that it vanished). Rules: word-count bounds, mean-word-
    length bounds, alphabetic-word fraction, minimum stopword evidence
    (English-ness), distinct-word ratio (degenerate-repetition guard).

    All features are array lambdas over a tokenize-once bound column —
    whole-stage codegen, zero shuffle, linear in corpus bytes. Ratios are
    per-row IEEE divisions of exact integers (engine-identical); no
    cross-row float aggregation anywhere."""
    return gopher_features(load_table(spark, sf_dir, "documents"))


def gopher_features(d: DataFrame, carry: tuple[str, ...] = ()) -> DataFrame:
    """Gopher rule features/verdict as a pure STATELESS projection — works
    identically on a batch frame and a readStream (the streaming corpus
    ingest gate applies this exact expression tree); ``carry`` lists extra
    input columns to keep alongside the feature columns."""
    d = d.withColumn("_toks", tokens())
    toks = F.col("_toks")
    n_words = F.size(toks)
    mwl = (
        F.aggregate(toks, F.lit(0), lambda acc, x: acc + F.length(x)).cast("double")
        / n_words
    )
    alpha_frac = (
        F.size(F.filter(toks, lambda x: x.rlike("[a-z]"))).cast("double") / n_words
    )
    n_stop = token_in_set(toks, STOPWORDS)
    distinct_ratio = F.size(F.array_distinct(toks)).cast("double") / n_words
    ok_wc = n_words.between(GOPHER_MIN_WORDS, GOPHER_MAX_WORDS)
    ok_mwl = mwl.between(GOPHER_MIN_MWL, GOPHER_MAX_MWL)
    ok_alpha = alpha_frac >= GOPHER_MIN_ALPHA_FRAC
    ok_stop = n_stop >= GOPHER_MIN_STOPWORDS
    ok_distinct = distinct_ratio >= GOPHER_MIN_DISTINCT_RATIO
    return d.select(
        *carry,
        "doc_id",
        n_words.alias("n_words"),
        mwl.alias("mean_word_len"),
        alpha_frac.alias("alpha_frac"),
        n_stop.alias("n_stopwords"),
        distinct_ratio.alias("distinct_ratio"),
        ok_wc.alias("ok_word_count"),
        ok_mwl.alias("ok_mean_word_len"),
        ok_alpha.alias("ok_alpha"),
        ok_stop.alias("ok_stopwords"),
        ok_distinct.alias("ok_distinct"),
        (ok_wc & ok_mwl & ok_alpha & ok_stop & ok_distinct).alias("keep"),
    )


# --- corpus novelty / vocabulary growth ---------------------------------------

NOVELTY_N = 3  # novelty n-gram width

NOVELTY_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
), grams AS (
  SELECT doc_id,
    unnest(list_distinct(list_transform(range(1, len(w) - {NOVELTY_N - 2}),
      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS g
  FROM toks
), firsts AS (
  SELECT g, MIN(doc_id) AS first_doc FROM grams GROUP BY g
)
SELECT gr.doc_id,
  COUNT(*) AS n_distinct_grams,
  COUNT(CASE WHEN f.first_doc = gr.doc_id THEN 1 END) AS n_novel_grams,
  CAST(COUNT(CASE WHEN f.first_doc = gr.doc_id THEN 1 END) AS DOUBLE)
    / COUNT(*) AS novelty_frac
FROM grams gr JOIN firsts f ON f.g = gr.g
GROUP BY gr.doc_id
"""


@query("ngram_novelty_scores", oracle=NOVELTY_ORACLE)
def ngram_novelty_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-order novelty: per doc, the fraction of its distinct 3-grams
    that NO earlier doc (smaller doc_id = earlier in corpus order)
    contains — the n-gram-level "how much new text does this doc add"
    signal (the aggregate view of what benchmark_decontamination checks
    pairwise; near-zero novelty ⇒ the doc is assembled from seen text).

    Shape: explode distinct grams once, min(doc_id) per gram (map-side
    combinable), join back on the gram key the grams are already shuffled
    on, per-doc rollup. Cost linear in corpus grams; no pairwise
    comparison anywhere."""
    d = load_table(spark, sf_dir, "documents", min_partitions=cpu_parallelism(spark))
    # explode_OUTER + isNotNull — avoids the inferred-filter re-evaluation
    # of the interpreted gram chain (see dedup._ngram_pair_partials)
    grams = d.select(
        "doc_id",
        F.explode_outer(
            F.array_distinct(
                F.expr(
                    f"transform(sequence(1, size(split(text, ' ')) - {NOVELTY_N - 1}),"
                    " i -> concat_ws(' ', slice(split(text, ' '), i, 3)))"
                )
            )
        ).alias("g"),
    ).where(F.col("g").isNotNull())
    firsts = grams.groupBy("g").agg(F.min("doc_id").alias("first_doc"))
    novel = F.count(F.when(F.col("first_doc") == F.col("doc_id"), 1))
    return (
        grams.join(firsts, "g")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_distinct_grams"),
            novel.alias("n_novel_grams"),
            (novel.cast("double") / F.count("*")).alias("novelty_frac"),
        )
    )


VOCAB_BUCKET = 50  # docs per growth-curve bucket

VOCAB_GROWTH_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
), grams AS (
  SELECT doc_id,
    unnest(list_distinct(list_transform(range(1, len(w) - {NOVELTY_N - 2}),
      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS tok
  FROM toks
), firsts AS (
  SELECT tok, MIN(doc_id) // {VOCAB_BUCKET} AS first_bucket
  FROM grams GROUP BY tok
), per_bucket AS (
  SELECT first_bucket AS bucket_id, COUNT(*) AS new_tokens
  FROM firsts GROUP BY first_bucket
)
SELECT bucket_id, new_tokens,
  CAST(SUM(new_tokens) OVER (ORDER BY bucket_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_vocab
FROM per_bucket
"""


@query("vocab_growth_buckets", oracle=VOCAB_GROWTH_ORACLE)
def vocab_growth_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary growth curve (Heaps'-law diagnostic): cumulative distinct
    3-gram count as the corpus is consumed in doc_id order, at a
    VOCAB_BUCKET-doc grain (3-grams, not unigrams — a word-level vocabulary
    saturates almost immediately on any real corpus; phrase-level growth is
    the signal). Rising new-phrase mass late in a crawl usually means a
    domain/language shift or junk influx — the curve is the monitoring view.

    Scale note: gram first-occurrence is a distributed min per gram; the
    cumulative window runs over the BUCKET rollup (|docs|/bucket rows, ~1e6
    rows for a billion-doc corpus at this grain), never over docs or
    grams — the same "shrink before you order globally" discipline as
    sequence_packing's distributed prefix sum."""
    d = load_table(spark, sf_dir, "documents", min_partitions=cpu_parallelism(spark))
    # explode_OUTER + isNotNull — see dedup._ngram_pair_partials
    toks = d.select(
        "doc_id",
        F.explode_outer(
            F.array_distinct(
                F.expr(
                    f"transform(sequence(1, size(split(text, ' ')) - {NOVELTY_N - 1}),"
                    " i -> concat_ws(' ', slice(split(text, ' '), i, 3)))"
                )
            )
        ).alias("tok"),
    ).where(F.col("tok").isNotNull())
    firsts = toks.groupBy("tok").agg(
        (F.min("doc_id") / VOCAB_BUCKET).cast("bigint").alias("bucket_id")
    )
    per_bucket = firsts.groupBy("bucket_id").agg(
        F.count("*").alias("new_tokens")
    )
    w = (
        Window.orderBy("bucket_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return per_bucket.select(
        "bucket_id",
        "new_tokens",
        F.sum("new_tokens").over(w).cast("bigint").alias("cum_vocab"),
    )


# --- n-gram LM count table (the warehouse side of a KenLM build) ---------------

LM_MIN_COUNT = 2  # prune singleton trigrams (standard LM count cutoff)

TRIGRAM_LM_ORACLE = f"""
WITH toks AS (
  SELECT string_split(text, ' ') AS w FROM documents
), tri AS (
  SELECT w[i] AS w1, w[i+1] AS w2, w[i+2] AS w3
  FROM toks, unnest(range(1, len(w) - 1)) AS t(i)
), tri_counts AS (
  SELECT w1, w2, w3, COUNT(*) AS c3 FROM tri GROUP BY w1, w2, w3
  HAVING COUNT(*) >= {LM_MIN_COUNT}
), bi_counts AS (
  SELECT w1, w2, COUNT(*) AS c2 FROM tri GROUP BY w1, w2
)
SELECT t.w1, t.w2, t.w3, t.c3, b.c2,
  CAST(t.c3 + 1 AS DOUBLE) / (b.c2 + 100) AS p_addk
FROM tri_counts t JOIN bi_counts b USING (w1, w2)
"""


@query("trigram_lm_counts", oracle=TRIGRAM_LM_ORACLE)
def trigram_lm_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trigram language-model count table with add-k smoothed conditional
    probabilities — the warehouse half of a KenLM-style build (count
    collection IS the distributed part; the ARPA assembly is a driver-side
    finishing step over the pruned table). Feeds perplexity_buckets with a
    real conditional LM instead of unigrams.

    Shape: one scan → trigram explode (narrow) → two count aggregates that
    share the (w1, w2) exchange — the trigram groupBy's partial combine
    happens map-side, and the bigram context counts are derived FROM the
    same exploded stream. Count cutoff (≥ {LM_MIN_COUNT}) prunes the
    singleton tail that dominates raw trigram tables (Zipf), exactly like
    KenLM's default pruning. p_addk = (c3+1)/(c2+100): integers in, one
    IEEE division out — engine-exact."""
    d = load_table(spark, sf_dir, "documents", min_partitions=cpu_parallelism(spark))
    w = F.split(F.col("text"), " ")
    # Clamp at 0: a document with <3 tokens must contribute zero trigrams,
    # not a negative slice length (INVALID_PARAMETER_VALUE.LENGTH at run).
    tri_len = F.greatest(F.size(w) - 2, F.lit(0))
    tri_arr = F.zip_with(
        F.slice(w, 1, tri_len),
        F.zip_with(
            F.slice(w, 2, tri_len),
            F.slice(w, 3, tri_len),
            lambda b, c: F.struct(b.alias("w2"), c.alias("w3")),
        ),
        lambda a, bc: F.struct(a.alias("w1"), bc["w2"].alias("w2"), bc["w3"].alias("w3")),
    )
    # explode_OUTER + isNotNull — see dedup._ngram_pair_partials
    tri = (
        d.select(F.explode_outer(tri_arr).alias("t"))
        .where(F.col("t").isNotNull())
        .select("t.*")
    )
    tri_counts = (
        tri.groupBy("w1", "w2", "w3")
        .agg(F.count("*").alias("c3"))
        .where(F.col("c3") >= LM_MIN_COUNT)
    )
    bi_counts = tri.groupBy("w1", "w2").agg(F.count("*").alias("c2"))
    return tri_counts.join(bi_counts, ["w1", "w2"]).select(
        "w1",
        "w2",
        "w3",
        "c3",
        "c2",
        ((F.col("c3") + 1).cast("double") / (F.col("c2") + 100)).alias("p_addk"),
    )
