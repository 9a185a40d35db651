"""Interleaved A/B attribution for bench counter-movers.

Whenever a bench query moves UP above the noise band in a round where its
body is git-unchanged, this probe settles host-noise vs real regression:
ROUNDS passes of [control, movers...] interleaved in ONE warm session at
sf0.1, where the control (`pricing_summary`, also unchanged) has a known
recorded best. If the movers land back at/below their prior numbers while
the control matches its record, the reading was host steal; if they stay
high while the control is on-record, something real regressed.

r04 case (VERDICT r04 #4): catalog_fact_sales_daily 2.95→3.28 s and
session_metrics_batch 0.56→0.68 s — attributed to steal (SCALING.md
"Round-5 counter-mover attribution").
r06 case (VERDICT r05 #3): scd2_customer_dim 0.72→0.97 s best-of-3 with
an untouched body (operators/scd2.py unchanged in r05; the query performs
no VersionedTable commits, so the r05 commit-hardening cannot be on its
path — git log + code read).
r07 case (VERDICT r06 #2): training_dataset 0.43→1.05 s (2.44×),
exact_dedup 0.22→0.40 s (1.84×), ngram_jaccard_pairs 1.34→2.18 s (1.62×)
— all bodies untouched in the r06 diff; the r06 control read 2.19 s
(1.14× above its 1.93 record in the same session).

Usage: python tools/interleave_ab.py [mover ...]
       (default movers = the current watch case; paste output into SCALING.md)
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
DEFAULT_MOVERS = ["training_dataset", "exact_dedup", "ngram_jaccard_pairs"]
ROUNDS = 4
# recorded bests for context (from BENCH_r{N}.json)
RECORD = {
    "pricing_summary": {"prior": 1.93, "latest": 2.19},
    "catalog_fact_sales_daily": {"prior": 2.95, "latest": 3.11},
    "session_metrics_batch": {"prior": 0.56, "latest": 0.56},
    "scd2_customer_dim": {"prior": 0.72, "latest": 0.87},
    "training_dataset": {"prior": 0.43, "latest": 1.05},
    "exact_dedup": {"prior": 0.22, "latest": 0.40},
    "ngram_jaccard_pairs": {"prior": 1.34, "latest": 2.18},
}


def main() -> None:
    movers = sys.argv[1:] or DEFAULT_MOVERS
    spark = get_spark("interleave-ab")
    reg = load_registry()
    names = [CONTROL] + movers
    force(reg[CONTROL].fn(spark, SF_DIR))  # JVM/footer warmup
    runs: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(ROUNDS):
        for n in names:
            t0 = time.perf_counter()
            force(reg[n].fn(spark, SF_DIR))
            runs[n].append(round(time.perf_counter() - t0, 3))
            spark.catalog.clearCache()
            gc.collect()
    print(f"{'query':<28}{'best':>7}{'runs':>34}{'prior':>7}{'latest':>7}")
    for n in names:
        rec = RECORD.get(n, {"prior": float("nan"), "latest": float("nan")})
        print(
            f"{n:<28}{min(runs[n]):>7.2f}{str(runs[n]):>34}"
            f"{rec['prior']:>7.2f}{rec['latest']:>7.2f}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
