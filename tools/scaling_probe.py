"""Scaling probe: measure headline-query wall time across every data set
present, sf0.001 → sf100 (up to 100,000× total span, four decades of 10×
steps at the top once sf1/sf10/sf100 are generated) and report
per-query throughput (input rows/sec) at each scale — the evidence that
plans are linear in input size (flat-or-rising throughput as fixed
JVM/planning overhead amortizes) rather than quadratic (collapsing
throughput).

Usage: python tools/scaling_probe.py   (prints a table; paste into SCALING.md)

sf0.001/0.01/0.1 are the driver's sets under /root/testdata; sf1 is the
locally generated replica set (tools/make_sf1.py → /root/repo/testdata_sf1,
6M lineitem rows, shingle-disjoint document copies). Driver-table rows
scale 10× per step for the relational tables; the corpus tables step
500→500→5000→50000 docs and 500→500→2000→20000 vectors, so corpus queries
report their ratios from the sf0.01→0.1→1 steps. Timing is best-of-N in
one warm session per SF (min damps host steal).
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from enterprise_data_warehouse_spark.queries import load_registry  # noqa: E402
from enterprise_data_warehouse_spark.session import get_spark  # noqa: E402

SF_DIRS = {
    "0.001": "/root/testdata/sf0.001",
    "0.01": "/root/testdata/sf0.01",
    "0.1": "/root/testdata/sf0.1",
    "1": "/root/repo/testdata_sf1",
    # optional THIRD decade: python tools/make_sf1.py /root/repo/testdata_sf10 100
    "10": "/root/repo/testdata_sf10",
    # optional FOURTH decade (600M lineitem rows, ~21 GB on disk):
    #   python tools/make_sf1.py /root/repo/testdata_sf100 1000
    "100": "/root/repo/testdata_sf100",
}
ALL_SFS = list(SF_DIRS)
SFS = [sf for sf in ALL_SFS if os.path.isdir(SF_DIRS[sf])]
# PROBES row lists are positional over ALL_SFS; select the indices of the
# scales actually present so rows stay aligned with timings when a data
# dir is missing (e.g. sf1 not yet generated on this host)
SF_IDX = [ALL_SFS.index(sf) for sf in SFS]

# query -> (driving table, rows at each sf, runs)
PROBES = {
    "pricing_summary": ("lineitem", [6e3, 6e4, 6e5, 6e6, 6e7, 6e8], 3),
    "star_revenue_rollup": ("lineitem", [6e3, 6e4, 6e5, 6e6, 6e7, 6e8], 3),
    "large_orders": ("lineitem", [6e3, 6e4, 6e5, 6e6, 6e7, 6e8], 3),
    "session_metrics_batch": ("events", [1e3, 1e4, 1e5, 1e6, 1e7, 1e8], 3),
    "sequence_packing": ("documents", [500, 500, 5000, 50000, 500000, 5000000], 3),
    "minhash_lsh_candidates": ("documents", [500, 500, 5000, 50000, 500000, 5000000], 3),
    "ngram_jaccard_pairs": ("documents", [500, 500, 5000, 50000, 500000, 5000000], 3),
    "text_quality_scores": ("documents", [500, 500, 5000, 50000, 500000, 5000000], 3),
    "cosine_topk": ("embeddings", [500, 500, 2000, 20000, 200000, 2000000], 3),
    # heavy ops (VERDICT r03 #6): best-of-2 — each single run is already
    # seconds-long, so steal averages out within the run
    "prefix_filter_jaccard_pairs": ("documents", [500, 500, 5000, 50000, 500000, 5000000], 2),
    "bipartite_pagerank": ("events", [1e3, 1e4, 1e5, 1e6, 1e7, 1e8], 2),
    "near_dup_clusters": ("documents", [500, 500, 5000, 50000, 500000, 5000000], 2),
    # r11 additions — three plan shapes the decade table didn't yet cover:
    # banded-signature grouping (simhash), broadcast-table map-side scoring
    # (dsir), and a second iterative family beyond pagerank (kmeans)
    "simhash_hamming_pairs": ("documents", [500, 500, 5000, 50000, 500000, 5000000], 2),
    "dsir_importance_weights": ("documents", [500, 500, 5000, 50000, 500000, 5000000], 3),
    "kmeans_embeddings": ("embeddings", [500, 500, 2000, 20000, 200000, 2000000], 2),
    # r12 additions (VERDICT r11 #2) — the last two registered plan
    # families without a fourth-decade row: the SCD2/merge shape (wide
    # window + hash-diff change detect + anti-join + union, the
    # reference's signature macro) and the catalog star build
    # (broadcast-dim star join + daily rollup)
    "scd2_customer_dim": ("customer", [150, 1500, 15000, 150000, 1.5e6, 1.5e7], 3),
    "catalog_fact_sales_daily": ("lineitem", [6e3, 6e4, 6e5, 6e6, 6e7, 6e8], 3),
}


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _timed(builder, spark, sf_dir) -> float:
    t0 = time.perf_counter()
    force(builder(spark, sf_dir))
    return time.perf_counter() - t0


def main() -> None:
    reg = load_registry()
    times: dict[str, list[float]] = {n: [] for n in PROBES}
    for sf in SFS:
        spark = get_spark(f"scaling-sf{sf}")
        sf_dir = SF_DIRS[sf]
        # size the shuffle to the data (constant rows/partition — the rule
        # any real cluster applies): the local default of 32 is sized for
        # the <= sf1 sets; at sf10 fixed-32 partitions spill and read as a
        # bogus super-linear term (measured: prefix_filter 72s at 32
        # partitions vs 48-51s at 128-320 = exactly linear from sf1)
        if float(sf) > 1:
            spark.conf.set(
                "spark.sql.shuffle.partitions", str(int(32 * float(sf)))
            )
        # warm JVM/classloading once per session
        force(reg["pricing_summary"].fn(spark, sf_dir))
        for name, (_, _, runs) in PROBES.items():
            if float(sf) >= 100:
                # single runs at sf100: every run is minutes-long, so host
                # steal averages out WITHIN the run (same rationale as the
                # heavy-op best-of-2 above) and best-of-3 would triple an
                # already ~40-minute decade
                runs = 1
            best = min(_timed(reg[name].fn, spark, sf_dir) for _ in range(runs))
            times[name].append(best)
            print(f"# sf{sf} {name}: {best:.2f}s", flush=True)
        spark.stop()

    hdr = f"{'query':28s} " + "".join(f"{'sf' + sf:>9s}" for sf in SFS)
    top, prev = SFS[-1], SFS[-2] if len(SFS) > 1 else SFS[-1]
    print(
        hdr
        + f"{'r/s@' + prev:>11s}{'r/s@' + top:>11s}"
        + f"{'ratio@' + prev:>10s}{'ratio@' + top:>9s}"
    )
    for name, (table, rows, _) in PROBES.items():
        ts = times[name]
        rows_sel = [rows[i] for i in SF_IDX]
        tp = [r / t for r, t in zip(rows_sel, ts)]
        r_prev = tp[-2] / tp[-3] if len(tp) > 2 else float("nan")
        r_top = tp[-1] / tp[-2] if len(tp) > 1 else float("nan")
        print(
            f"{name:28s} "
            + "".join(f"{t:8.2f}s" for t in ts)
            + f"{tp[-2] if len(tp) > 1 else float('nan'):11.0f}{tp[-1]:11.0f}"
            + f"{r_prev:10.2f}{r_top:9.2f}"
        )


if __name__ == "__main__":
    main()
