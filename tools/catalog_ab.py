"""Same-day A/B leg for catalog_fact_sales_daily (VERDICT r12 #1).

Arm "new": the r13 tree as-is — shuffled-hash star join (session default
`spark.sql.join.preferSortMergeJoin=false`) + the catalog's
`near_unique_grain` raw-row repartition before the rollup aggregation.
Arm "old": the r12 shape — sort-merge join (EDW_PREFER_SMJ=true must be
exported BEFORE launching this script so the session picks it up) and the
default partial->exchange->final aggregation (the near_unique_grain flag
is stripped via a monkeypatch of facts.build_fact).

One fresh JVM per invocation, pricing_summary warmup, single timed run —
identical methodology to tools/probe_one.py so legs are comparable with
the recorded sf100 rows. Pair with a 10-second `df` sampler for the disk
high-water, and alternate arms within one session of work so host drift
cancels (SCALING.md documents 2x day effects on cold-scan work).

Usage:
    EDW_DRIVER_MEMORY=80g python tools/catalog_ab.py new 100
    EDW_DRIVER_MEMORY=80g EDW_PREFER_SMJ=true python tools/catalog_ab.py old 100
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from enterprise_data_warehouse_spark.queries import load_registry  # noqa: E402
from enterprise_data_warehouse_spark.session import get_spark  # noqa: E402
from scaling_probe import SF_DIRS, force  # noqa: E402


def main() -> None:
    arm, sf = sys.argv[1], sys.argv[2]
    assert arm in ("new", "old"), arm
    if arm == "old":
        assert os.environ.get("EDW_PREFER_SMJ") == "true", (
            "arm old needs EDW_PREFER_SMJ=true exported before launch"
        )
        import enterprise_data_warehouse_spark.operators.facts as facts

        orig = facts.build_fact
        facts.build_fact = lambda src, spec, decimal_sums=True: orig(
            src, {**spec, "near_unique_grain": False}, decimal_sums
        )
    reg = load_registry()
    spark = get_spark(f"catalog-ab-{arm}-sf{sf}")
    if float(sf) > 1:
        spark.conf.set("spark.sql.shuffle.partitions", str(int(32 * float(sf))))
    sf_dir = SF_DIRS[sf]
    force(reg["pricing_summary"].fn(spark, sf_dir))  # warm JVM
    t0 = time.perf_counter()
    force(reg["catalog_fact_sales_daily"].fn(spark, sf_dir))
    print(f"# sf{sf} catalog_fact_sales_daily[{arm}]: {time.perf_counter() - t0:.2f}s", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
