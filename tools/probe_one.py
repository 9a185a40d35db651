"""Single-query scaling-probe leg: one fresh session, one SF, one query —
used to finish/repair a probe sweep without re-running every scale (e.g.
after a transient host issue: the sf100 leg's shuffle/checkpoint spill
from multiple heavy queries can exceed local disk if run back-to-back in
one JVM; per-query sessions reclaim temp between queries).

Usage: python tools/probe_one.py <sf> <query> [runs]
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from enterprise_data_warehouse_spark.queries import load_registry  # noqa: E402
from enterprise_data_warehouse_spark.session import get_spark  # noqa: E402
from scaling_probe import SF_DIRS, force  # noqa: E402


def main() -> None:
    sf, name = sys.argv[1], sys.argv[2]
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    reg = load_registry()
    extra = {}
    codec = os.environ.get("EDW_SHUFFLE_CODEC")
    if codec:
        # e.g. zstd: ~35% smaller shuffle/spill files than the lz4
        # default — the knob any real cluster turns when a shuffle-heavy
        # stage is disk-capacity-bound. Static conf: must be set at
        # session build. Any timing taken with it is labeled as such
        # wherever it is reported.
        extra["spark.io.compression.codec"] = codec
    spark = get_spark(f"probe-one-sf{sf}", extra_conf=extra)
    if float(sf) > 1:
        spark.conf.set(
            "spark.sql.shuffle.partitions", str(int(32 * float(sf)))
        )
    sf_dir = SF_DIRS[sf]
    force(reg["pricing_summary"].fn(spark, sf_dir))  # warm JVM
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        force(reg[name].fn(spark, sf_dir))
        best = min(best, time.perf_counter() - t0)
    print(f"# sf{sf} {name}: {best:.2f}s", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
