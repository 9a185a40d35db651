"""Scaling probe: measure headline-query wall time across sf0.001/0.01/0.1
and report per-query throughput (input rows/sec) at each scale — the
evidence that plans are linear in input size (flat-or-rising throughput as
fixed JVM/planning overhead amortizes) rather than quadratic (collapsing
throughput).

Usage: python tools/scaling_probe.py   (prints a table; paste into SCALING.md)

Driver-table row counts scale 10× per step for the relational tables
(lineitem/orders/events); the corpus tables step 500→500→5000 docs and
500→500→2000 vectors, so corpus queries report only the sf0.01→sf0.1 step.
Timing is best-of-3 in one warm session per SF (min damps host steal).
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from enterprise_data_warehouse_spark.queries import load_registry  # noqa: E402
from enterprise_data_warehouse_spark.session import get_spark  # noqa: E402

SFS = ["0.001", "0.01", "0.1"]

# query -> (driving table, rows at sf0.001/0.01/0.1)
PROBES = {
    "pricing_summary": ("lineitem", [6000, 60000, 600000]),
    "star_revenue_rollup": ("lineitem", [6000, 60000, 600000]),
    "large_orders": ("lineitem", [6000, 60000, 600000]),
    "session_metrics_batch": ("events", [1000, 10000, 100000]),
    "sequence_packing": ("documents", [500, 500, 5000]),
    "minhash_lsh_candidates": ("documents", [500, 500, 5000]),
    "ngram_jaccard_pairs": ("documents", [500, 500, 5000]),
    "text_quality_scores": ("documents", [500, 500, 5000]),
    "cosine_topk": ("embeddings", [500, 500, 2000]),
}

RUNS = 3


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    reg = load_registry()
    times: dict[str, list[float]] = {n: [] for n in PROBES}
    for sf in SFS:
        spark = get_spark(f"scaling-sf{sf}")
        sf_dir = f"/root/testdata/sf{sf}"
        # warm JVM/classloading once per session
        force(reg["pricing_summary"].fn(spark, sf_dir))
        for name in PROBES:
            best = min(
                _timed(force, reg[name].fn, spark, sf_dir) for _ in range(RUNS)
            )
            times[name].append(best)
        spark.stop()

    hdr = f"{'query':28s} " + "".join(f"{'sf' + sf:>10s}" for sf in SFS)
    print(hdr + f"{'rows/s@0.01':>14s}{'rows/s@0.1':>14s}{'ratio':>8s}")
    for name, (table, rows) in PROBES.items():
        ts = times[name]
        tp = [r / t for r, t in zip(rows, ts)]
        ratio = tp[2] / tp[1]
        print(
            f"{name:28s} "
            + "".join(f"{t:9.2f}s" for t in ts)
            + f"{tp[1]:14.0f}{tp[2]:14.0f}{ratio:8.2f}"
        )


def _timed(force_fn, builder, spark, sf_dir) -> float:
    t0 = time.perf_counter()
    force_fn(builder(spark, sf_dir))
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()
