"""Interleaved A/B for the r03→r04 bench counter-movers (VERDICT r04 #4).

`catalog_fact_sales_daily` (2.95→3.28 s) and `session_metrics_batch`
(0.56→0.68 s) moved UP against a round that got 1.52× faster overall, with
query bodies unchanged (git-verified). This probe settles host-noise vs
real regression: four rounds of [control, A, B] interleaved in ONE warm
session at sf0.1, where the control (`pricing_summary`, also unchanged) has
a known r04 best of 1.93 s. If the counter-movers land back at/below their
r03 numbers while the control matches its record, the r04 readings were
host steal; if they stay high while the control is on-record, something
real regressed.

Usage: python tools/interleave_ab.py   (paste output into SCALING.md)
"""

from __future__ import annotations

import gc
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import force  # noqa: E402  (same materialization as the bench)
from enterprise_data_warehouse_spark.queries import load_registry  # noqa: E402
from enterprise_data_warehouse_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"
CONTROL = "pricing_summary"
MOVERS = ["catalog_fact_sales_daily", "session_metrics_batch"]
ROUNDS = 4
# recorded bests for context
RECORD = {
    "pricing_summary": {"r03": 3.37, "r04": 1.93},
    "catalog_fact_sales_daily": {"r03": 2.95, "r04": 3.28},
    "session_metrics_batch": {"r03": 0.56, "r04": 0.68},
}


def main() -> None:
    spark = get_spark("interleave-ab")
    reg = load_registry()
    names = [CONTROL] + MOVERS
    force(reg[CONTROL].fn(spark, SF_DIR))  # JVM/footer warmup
    runs: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(ROUNDS):
        for n in names:
            t0 = time.perf_counter()
            force(reg[n].fn(spark, SF_DIR))
            runs[n].append(round(time.perf_counter() - t0, 3))
            spark.catalog.clearCache()
            gc.collect()
    print(f"{'query':<28}{'best':>7}{'runs':>34}{'r03':>7}{'r04':>7}")
    for n in names:
        rec = RECORD[n]
        print(
            f"{n:<28}{min(runs[n]):>7.2f}{str(runs[n]):>34}"
            f"{rec['r03']:>7.2f}{rec['r04']:>7.2f}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
