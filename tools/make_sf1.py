"""Generate an sf1-scale testdata set (~6M lineitem rows) under
/root/repo/testdata_sf1 by replicating the driver's sf0.1 tables 10× with
key-domain offsets — the extra decade SCALING.md needs to show two decades
of sub-linear growth.

Replication rules (join integrity preserved — every key domain gets the
SAME per-copy offset on both sides of its joins):

- region/nation: shared dimensions, copied as-is.
- customer/supplier/part/orders/lineitem/events: all *key columns shift by
  copy_index × 10_000_000 (sf0.1 keys stay far below that).
- documents: doc_id shifts; for copies > 0 every whitespace token gets a
  per-copy suffix so the copies are SHINGLE-DISJOINT — replicating text
  verbatim would plant 10-way exact-duplicate groups and turn the dedup
  probes into a measure of the dup-cap code paths instead of corpus-size
  scaling. n_chars is recomputed.
- embeddings: vec_id shifts; the first vector component moves by
  copy_index × 0.01 so copies are not bitwise-identical points.

Timestamps and categorical values repeat across copies (10 users share
each behavior trace) — fine for throughput probing, which is this set's
only purpose. NOT driver data: correctness runs stay on /root/testdata.

Usage: python tools/make_sf1.py  [out_dir] [copies]
       (defaults /root/repo/testdata_sf1, 10 copies of sf0.1; pass 100
       for an sf10-scale set — 60M lineitem rows, ~2.1 GB — the THIRD
       measured decade for tools/scaling_probe.py; pass 1000 for sf100 —
       600M lineitem rows, ~21 GB measured on disk — the FOURTH; leave
       ≥25 GB free before generating it)

Replication is a single explode of a replica-index column (not a
copies-way unionByName chain — at 1000 branches Catalyst analysis alone
is the bottleneck), written in <=100-copy chunks so each append's shuffle
stays sf10-sized regardless of the target scale.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from enterprise_data_warehouse_spark.session import get_spark  # noqa: E402
from enterprise_data_warehouse_spark.sources.tables import load_table  # noqa: E402

SRC = "/root/testdata/sf0.1"
COPIES = 10
OFF = 10_000_000

KEY_COLS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}

FILES = {"lineitem": 16, "orders": 8, "events": 8}


CHUNK = 100  # replica indices per append — caps each write's shuffle at
# sf10 volume (~6M lineitem rows) no matter how large the target set is


def replicate(df, name: str, lo: int, hi: int):
    """Replica indices [lo, hi) in ONE plan: explode a replica-index
    column and derive every per-copy mutation from it. Produces exactly
    the same multiset as the historical per-index unionByName chain
    (pinned by tests/test_make_replicas.py) — same key offsets, same
    per-copy token suffixes, same first-component embedding bump, and
    index 0 bit-untouched."""
    ri = F.col("_ri")
    out = df.withColumn(
        "_ri", F.explode(F.sequence(F.lit(lo), F.lit(hi - 1)))
    )
    for k in KEY_COLS.get(name, []):
        # long arithmetic: index × OFF passes 2^31 at replica 215 (sf100)
        out = out.withColumn(
            k, F.col(k) + ri.cast("long") * F.lit(OFF).cast("long")
        )
    if name == "documents":
        suffixed = F.regexp_replace(
            F.col("text"), F.lit(r"(\S+)"),
            F.concat(F.lit("$1x"), ri.cast("string")),
        )
        out = out.withColumn(
            "text", F.when(ri == 0, F.col("text")).otherwise(suffixed)
        ).withColumn(
            "n_chars",
            F.when(ri == 0, F.col("n_chars"))
            .otherwise(F.length("text").cast("long")),
        )
    if name == "embeddings":
        bumped = F.concat(
            F.array(
                F.element_at("embedding", 1)
                + ri.cast("double") * F.lit(0.01)
            ),
            F.slice("embedding", 2, F.size("embedding") - 1),
        ).cast("array<float>")
        out = out.withColumn(
            "embedding",
            F.when(ri == 0, F.col("embedding")).otherwise(bumped),
        )
    return out.drop("_ri")


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/testdata_sf1"
    copies = int(sys.argv[2]) if len(sys.argv) > 2 else COPIES
    scale = copies // 10  # file counts sized to keep partitions ~even
    spark = get_spark("make-sf1")
    chunks = [
        (lo, min(lo + CHUNK, copies)) for lo in range(0, copies, CHUNK)
    ]
    for name in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        base = load_table(spark, SRC, name)
        n_files = FILES.get(name, 4) * max(1, scale)
        dest = f"{out_dir}/{name}.parquet"
        if name in ("region", "nation"):
            base.repartition(n_files).write.mode("overwrite").parquet(dest)
        else:
            files_per_chunk = max(1, n_files // len(chunks))
            for ci, (lo, hi) in enumerate(chunks):
                replicate(base, name, lo, hi).repartition(
                    files_per_chunk
                ).write.mode("overwrite" if ci == 0 else "append").parquet(
                    dest
                )
        print(f"{name}: {spark.read.parquet(dest).count()} rows")
    spark.stop()


if __name__ == "__main__":
    main()
