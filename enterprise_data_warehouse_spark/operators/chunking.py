"""Document chunking for training-data pipelines — the UDTF surface.

SURVEY.md §2.10 notes the reference registers no UDTF ("absent — Spark
UDAF/UDTF available if extended"). This module completes that surface with
the canonical LLM-pipeline table function: fixed-size token chunking with
overlap (50-token windows, stride 40), in two equivalent formulations:

- ``doc_chunks_udtf`` — a Python UDTF (Spark 3.5+ ``@udtf``) applied via
  LATERAL join in SQL. This is the extension point a user reaches for when
  chunking logic outgrows expressions (tokenizer-aware boundaries, etc.).
- ``doc_chunks_native`` — the same semantics as pure JVM array expressions
  (sequence → transform → slice): the 100 TB hot path, whole-stage
  codegen'd, zero Python in the loop.

Both hash-match the same DuckDB oracle, which is the point: the UDTF is a
correctness-checked escape hatch, the native form is the scale path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import udtf

from ..queries import query
from ..sources.tables import load_table
from .text import BPE_PAT

CHUNK = 50  # tokens per chunk
STRIDE = 40  # tokens between chunk starts (CHUNK-STRIDE = 10-token overlap)

CHUNKS_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS toks, LEN(string_split(text, ' ')) AS n
  FROM documents
), idx AS (
  SELECT doc_id, toks, n,
         unnest(generate_series(0, CAST(FLOOR((n - 1) / {STRIDE}.0) AS BIGINT))) AS chunk_idx
  FROM toks
)
SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx,
       array_to_string(
         toks[chunk_idx*{STRIDE}+1 : LEAST(chunk_idx*{STRIDE}+{CHUNK}, n)], ' ')
         AS chunk
FROM idx
"""


@udtf(returnType="chunk_idx int, chunk string")
class ChunkDocument:
    """Overlapping token windows over one document; yields one row per
    chunk. Kept stateless so Spark can fan it across partitions freely."""

    def eval(self, doc_id: int, text: str):  # noqa: ARG002 - doc_id unused
        toks = text.split(" ")
        n = len(toks)
        i = 0
        while i * STRIDE < n:
            yield i, " ".join(toks[i * STRIDE : i * STRIDE + CHUNK])
            i += 1


@query("doc_chunks_udtf", oracle=CHUNKS_ORACLE)
def doc_chunks_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF + LATERAL join: each document row expands to its chunk
    rows. Row-at-a-time Python — correct but not the scale path (see
    doc_chunks_native); registered to show the full UDTF lifecycle
    (register → LATERAL → project)."""
    spark.udtf.register("chunk_document", ChunkDocument)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("v_docs_chunk")
    return spark.sql(
        """
        SELECT d.doc_id, c.chunk_idx, c.chunk
        FROM v_docs_chunk d, LATERAL chunk_document(d.doc_id, d.text) c
        """
    )


@query("doc_chunks_native", oracle=CHUNKS_ORACLE, bench=True)
def doc_chunks_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The UDTF's JVM twin: sequence(0, floor((n-1)/stride)) → posexplode →
    slice + array_join, all codegen'd expressions. At 100 TB this is the
    form to run — chunk expansion happens inside the scan stage with no
    Python boundary, and the output is immediately repartitionable for
    downstream tokenization."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    n = F.size(toks)
    withtoks = d.select("doc_id", toks.alias("toks"), n.alias("n"))
    idx = withtoks.select(
        "doc_id",
        "toks",
        "n",
        # explode_OUTER: the inferred size>0/isnotnull filter of a plain
        # explode re-builds the sequence array twice per doc (see
        # dedup._ngram_pair_partials); the isNotNull backstop downstream
        # restores inner-explode row semantics at ~0 cost even if a
        # NULL-text row ever appeared (n >= 1 on every generated corpus).
        F.explode_outer(
            F.sequence(F.lit(0), F.floor((F.col("n") - 1) / STRIDE).cast("int"))
        ).alias("chunk_idx"),
    )
    start = F.col("chunk_idx") * STRIDE + 1
    length = F.least(F.lit(CHUNK), F.col("n") - F.col("chunk_idx") * STRIDE)
    return idx.where(F.col("chunk_idx").isNotNull()).select(
        "doc_id",
        "chunk_idx",
        F.array_join(F.slice("toks", start, length), " ").alias("chunk"),
    )


# --- cross-document chunk containment ---------------------------------------

SHARED_CHUNKS_ORACLE = f"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 5 = 0
), toks AS (
  SELECT doc_id, string_split(text, ' ') AS toks,
         LEN(string_split(text, ' ')) AS n
  FROM corpus
), idx AS (
  SELECT doc_id, toks, n,
         unnest(generate_series(0, CAST(FLOOR((n - 1) / {STRIDE}.0) AS BIGINT))) AS chunk_idx
  FROM toks
), chunks AS (
  SELECT doc_id,
    MD5(array_to_string(
      toks[chunk_idx*{STRIDE}+1 : LEAST(chunk_idx*{STRIDE}+{CHUNK}, n)], ' ')) AS chunk_fp
  FROM idx
)
SELECT chunk_fp,
       COUNT(DISTINCT doc_id) AS n_docs,
       COUNT(*) AS n_occurrences,
       MIN(doc_id) AS first_doc_id
FROM chunks
GROUP BY chunk_fp
HAVING COUNT(DISTINCT doc_id) > 1
"""


@query("shared_chunk_fingerprints", oracle=SHARED_CHUNKS_ORACLE)
def shared_chunk_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Containment dedup: fingerprint every overlapping token chunk and
    surface fingerprints occurring in more than one document — the operator
    that catches boilerplate paragraphs and partially-copied documents that
    whole-doc hashing misses. Test fixture re-injects every 5th doc so
    cross-doc repeats exist in the synthetic corpus.

    Scale: the chunk expansion is the codegen'd doc_chunks_native shape
    (explode inside the scan stage), the md5 collapses each ~50-token chunk
    to 32 bytes BEFORE the shuffle, and the single groupBy(chunk_fp) is
    map-side combinable — shuffle bytes ∝ chunk count, not corpus bytes."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = d.unionByName(
        d.where(F.col("doc_id") % 5 == 0).withColumn(
            "doc_id", F.col("doc_id") + 1000000
        )
    )
    toks = F.split("text", " ")
    withtoks = corpus.select("doc_id", toks.alias("toks"), F.size(toks).alias("n"))
    idx = withtoks.select(
        "doc_id",
        "toks",
        "n",
        # explode_OUTER: the inferred size>0/isnotnull filter of a plain
        # explode re-builds the sequence array twice per doc (see
        # dedup._ngram_pair_partials); the isNotNull backstop downstream
        # restores inner-explode row semantics at ~0 cost even if a
        # NULL-text row ever appeared (n >= 1 on every generated corpus).
        F.explode_outer(
            F.sequence(F.lit(0), F.floor((F.col("n") - 1) / STRIDE).cast("int"))
        ).alias("chunk_idx"),
    )
    start = F.col("chunk_idx") * STRIDE + 1
    length = F.least(F.lit(CHUNK), F.col("n") - F.col("chunk_idx") * STRIDE)
    chunks = idx.where(F.col("chunk_idx").isNotNull()).select(
        "doc_id",
        F.md5(F.array_join(F.slice("toks", start, length), " ")).alias("chunk_fp"),
    )
    return (
        chunks.groupBy("chunk_fp")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count("*").alias("n_occurrences"),
            F.min("doc_id").alias("first_doc_id"),
        )
        .where(F.col("n_docs") > 1)
    )


# --- sequence packing (concat-and-cut, distributed prefix sum) ---------------

SEQ_LEN = 2048  # pack budget in BPE-ish tokens
PACK_BUCKET = 500  # docs per prefix-sum bucket (see sequence_packing)

PACKING_ORACLE = f"""
WITH counted AS (
  SELECT doc_id,
         CAST(LEN(regexp_extract_all(text,
           '{BPE_PAT.replace("'", "''")}'))
           AS BIGINT) AS n_tokens
  FROM documents
), offsets AS (
  SELECT doc_id, n_tokens,
         CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS off
  FROM counted
)
SELECT doc_id, n_tokens,
       CAST(FLOOR(off / {SEQ_LEN}.0) AS BIGINT) AS pack_id,
       CAST(off % {SEQ_LEN} AS BIGINT) AS pack_pos,
       (off % {SEQ_LEN}) + n_tokens > {SEQ_LEN} AS spans_boundary
FROM offsets
"""


@query("sequence_packing", oracle=PACKING_ORACLE, bench=True)
def sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LLM-training sequence packing, concat-and-cut style: documents are
    concatenated in deterministic doc_id order into a virtual token stream
    and cut into SEQ_LEN-token packs; each doc gets its pack id, offset
    within the pack, and a flag when it straddles a pack boundary.

    The global running offset is a prefix sum. The naive window
    (``ORDER BY doc_id`` with no partition) funnels the whole corpus
    through ONE partition — the classic scale killer — so this computes a
    DISTRIBUTED prefix sum instead: an intra-bucket cumulative sum
    (window partitioned by doc_id bucket) plus per-bucket totals rolled
    into bucket prefix offsets (tiny aggregate, broadcast back). Shuffle
    cost: one exchange on bucket + one broadcast of |buckets| rows; no
    stage sees more than one bucket's rows in order. The DuckDB oracle is
    the naive single-window formulation — value-identical by construction.
    """
    from pyspark.sql.window import Window

    d = load_table(spark, sf_dir, "documents")
    counted = d.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit(BPE_PAT), 0))
        .cast("bigint")
        .alias("n_tokens"),
        F.floor(F.col("doc_id") / PACK_BUCKET).alias("bucket"),
    )
    intra_w = (
        Window.partitionBy("bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    intra = counted.withColumn(
        "intra_off", F.coalesce(F.sum("n_tokens").over(intra_w), F.lit(0))
    )
    bucket_w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    bucket_offsets = (
        counted.groupBy("bucket")
        .agg(F.sum("n_tokens").alias("bucket_total"))
        .select(
            "bucket",
            F.coalesce(F.sum("bucket_total").over(bucket_w), F.lit(0)).alias(
                "bucket_off"
            ),
        )
    )
    off = F.col("bucket_off") + F.col("intra_off")
    return (
        intra.join(F.broadcast(bucket_offsets), "bucket")
        .select(
            "doc_id",
            "n_tokens",
            F.floor(off / SEQ_LEN).alias("pack_id"),
            (off % SEQ_LEN).alias("pack_pos"),
            ((off % SEQ_LEN) + F.col("n_tokens") > SEQ_LEN).alias("spans_boundary"),
        )
    )
