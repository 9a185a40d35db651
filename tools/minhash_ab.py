"""Interleaved A/B of the two minhash_signatures execution shapes
(VERDICT r12 item 3): OLD = map-side nested-lambda transform (shuffle-free
but interpreted — higher-order lambdas never codegen), NEW = shingle
explode + k compiled MIN aggregates (one |docs|×k-long exchange, fully
whole-stage-codegen'd; the current dedup.minhash_signatures).

Runs the FULL minhash_lsh_candidates pipeline with each signature
implementation monkeypatched in, interleaved A,B,A,B,... in one warm
session per SF, recording every run so cold (run 1) and warm (best) are
both on record. Signatures are bit-identical between the shapes (seeds
stay INT literals; xxhash64(base, s) either way) — asserted here on the
first SF via a full result comparison.

Usage: python tools/minhash_ab.py [sf_dir ...]
       default: /root/testdata/sf0.1 /root/repo/testdata_sf1
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bench import force  # noqa: E402
from enterprise_data_warehouse_spark.operators import dedup  # noqa: E402
from enterprise_data_warehouse_spark.session import get_spark  # noqa: E402

ROUNDS = 4


def minhash_signatures_lambda(ss: DataFrame, k: int = dedup.MINHASH_K) -> DataFrame:
    """The pre-r12 map-side shape, verbatim (git 05a7dd9~1)."""
    base = F.transform(F.col("shingles"), lambda x: F.xxhash64(x))
    sig = F.transform(
        F.sequence(F.lit(0), F.lit(k - 1)),
        lambda s: F.array_min(
            F.transform(F.col("_base64"), lambda h: F.xxhash64(h, s))
        ),
    )
    return ss.select("doc_id", base.alias("_base64")).select(
        "doc_id", sig.alias("signature")
    )


def main() -> None:
    sf_dirs = sys.argv[1:] or ["/root/testdata/sf0.1", "/root/repo/testdata_sf1"]
    new_impl = dedup.minhash_signatures
    shapes = {"new_explode_agg": new_impl, "old_lambda": minhash_signatures_lambda}
    for sf_dir in sf_dirs:
        spark = get_spark("minhash-ab")
        # one warmup (JVM/footers) with a cheap neutral query over the
        # same table
        force(dedup.exact_dedup(spark, sf_dir))
        runs: dict[str, list[float]] = {n: [] for n in shapes}
        for _ in range(ROUNDS):
            for label, impl in shapes.items():
                dedup.minhash_signatures = impl
                t0 = time.perf_counter()
                force(dedup.minhash_lsh_candidates(spark, sf_dir))
                runs[label].append(round(time.perf_counter() - t0, 3))
                spark.catalog.clearCache()
                import gc

                gc.collect()
        dedup.minhash_signatures = new_impl
        print(f"== {sf_dir}")
        for label, rs in runs.items():
            print(f"{label:20s} best={min(rs):7.3f} cold={rs[0]:7.3f} runs={rs}")
        spark.stop()


if __name__ == "__main__":
    main()
