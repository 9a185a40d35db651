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
       for an sf10-scale set — 60M lineitem rows, ~1.7 GB — the THIRD
       measured decade for tools/scaling_probe.py)
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


def replicate(df, name: str, i: int):
    out = df
    for k in KEY_COLS.get(name, []):
        out = out.withColumn(k, F.col(k) + F.lit(i * OFF))
    if name == "documents" and i > 0:
        out = out.withColumn(
            "text", F.regexp_replace("text", r"(\S+)", f"$1x{i}")
        ).withColumn("n_chars", F.length("text").cast("long"))
    if name == "embeddings" and i > 0:
        out = out.withColumn(
            "embedding",
            F.concat(
                F.array(F.element_at("embedding", 1) + F.lit(i * 0.01)),
                F.slice("embedding", 2, F.size("embedding") - 1),
            ).cast("array<float>"),
        )
    return out


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/testdata_sf1"
    copies = int(sys.argv[2]) if len(sys.argv) > 2 else COPIES
    scale = copies // 10  # file counts sized to keep partitions ~even
    spark = get_spark("make-sf1")
    for name in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        base = load_table(spark, SRC, name)
        if name in ("region", "nation"):
            scaled = base
        else:
            scaled = replicate(base, name, 0)
            for i in range(1, copies):
                scaled = scaled.unionByName(replicate(base, name, i))
        n_files = FILES.get(name, 4) * max(1, scale)
        scaled.repartition(n_files).write.mode("overwrite").parquet(
            f"{out_dir}/{name}.parquet"
        )
        print(f"{name}: {spark.read.parquet(f'{out_dir}/{name}.parquet').count()} rows")
    spark.stop()


if __name__ == "__main__":
    main()
