"""Headline benchmark — runs the bench-flagged queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) and prints ONE JSON line:
    {"metric": "...", "value": total_sec, "unit": "sec",
     "queries": {name: sec, ...}, "sf": ...}

Each query is forced through a full materialization (noop sink) so the
timing covers scan → shuffle → aggregate, not just plan construction.
Each query runs N times (2 by default, 3 for REGRESSION_WATCH, 4 for
COUNTER_MOVER_WATCH) and reports the BEST run: the host is a shared VM
with double-digit steal time at busy moments (observed 15%+ in `top`),
and min-of-N is the standard way to measure the engine rather than the
neighbors. JIT warmup rides in run 1, so later runs usually win.

Contract fixes (r13, VERDICT r12 item 2 — measurement bugs, not timing
changes):
  * Queries execute in SORTED-NAME order, decoupled from the registry's
    PRIORITY_ORDER: the r12 rotation silently reordered bench execution
    and manufactured fake per-query cross-round deltas (cold-JVM
    positions moved). Sorted order is constant forever.
  * The stdout JSON line carries only {metric, value, unit, queries,
    methodology, sf} (+errors if any). The raw best-of-N ``runs`` arrays
    outgrew the driver's 2 kB tail capture and cost BENCH_r11 its parsed
    record; they now land in plans/bench_runs.json instead.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from enterprise_data_warehouse_spark.queries import load_registry
from enterprise_data_warehouse_spark.session import get_spark


def force(df) -> None:
    """Fully evaluate a DataFrame without collecting to the driver."""
    df.write.format("noop").mode("overwrite").save()


# Queries whose r02→r03 timings drifted upward with UNCHANGED query bodies
# (VERDICT r03 attributes it to host steal: raw runs swing up to 5×). These
# get best-of-3 so BENCH_r04 either clears the regression or confirms it on
# a third sample.
REGRESSION_WATCH = {
    "star_revenue_rollup",
    "pricing_summary",
    "shipping_priority_topk",
    "ks_binned_drift",
    "scd2_customer_dim",
}

# r03→r04 counter-movers (moved up against a 1.52× faster round, bodies
# unchanged — VERDICT r04 #4): best-of-4 plus an interleaved A/B record in
# SCALING.md so the attribution (host noise vs real regression) is settled
# by data rather than assertion. scd2_customer_dim joined in r06 (the one
# above-noise r05 mover, 0.72→0.97 s — VERDICT r05 #3); training_dataset,
# exact_dedup, and ngram_jaccard_pairs joined in r07 (the r06 movers beyond
# the measured steal band, 2.44×/1.84×/1.62× — VERDICT r06 #2);
# volume_shipping and media_manifest joined in r08 (the two non-watch r07
# movers, both A/B-cleared as steal — VERDICT r07 #6, SCALING.md
# "Round-8 counter-mover attribution"); dsir_importance_weights and
# token_frequencies joined in r10 (r09's best-of-2 false movers, 1.28×/
# 1.33× driver readings — the judge's interleaved best-of-4 cleared both
# at 1.20 s and 0.42 s with the control 14% BELOW record — VERDICT r09 #4);
# prefix_filter_jaccard_pairs joined in r11: its bench-context FIRST run
# reads ~7 s against a ~3.9 s warm best (judge A/B runs [6.98, 3.89, 4.13,
# 3.89] with the control 25% below record — the heap-residue pattern r07
# documented for ngram), so best-of-2 overread it 1.30× in r10 — VERDICT
# r10 #2, SCALING.md "Round-11 counter-mover attribution";
# simhash_hamming_pairs joined in r12: best-of-2 read 5.41 s in BENCH_r10
# vs the 4.23 s best-of-2 in BENCH_r11 (driver first-run gap ~1.28×) — the
# checkpoint-heavy class's heap-residue pattern again, so best-of-4 from
# BENCH_r12 on — VERDICT r11 #5.
COUNTER_MOVER_WATCH = {
    "catalog_fact_sales_daily",
    "session_metrics_batch",
    "scd2_customer_dim",
    "training_dataset",
    "exact_dedup",
    "ngram_jaccard_pairs",
    "volume_shipping",
    "media_manifest",
    "dsir_importance_weights",
    "token_frequencies",
    "prefix_filter_jaccard_pairs",
    "simhash_hamming_pairs",
}


def _release_session_residue(spark) -> None:
    """Drop everything a query leaves on the session between timings so
    each number measures that query alone (VERDICT r12 item 6: the
    checkpoint-heavy class's localCheckpoint blocks survived
    clearCache+gc into the NEXT query's first run, inflating it 1.3-1.8×).
    clearCache handles the SQL cache; localCheckpoints are persistent
    RDDs, dropped here explicitly; the JVM System.gc lets ContextCleaner
    unregister the now-unreachable shuffle dependencies (no public
    unregister API exists for shuffle files)."""
    import gc

    spark.catalog.clearCache()
    try:
        for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            rdd.unpersist()
    except Exception:  # noqa: BLE001 — best-effort; never fail the bench
        pass
    gc.collect()
    try:
        spark.sparkContext._jvm.System.gc()
    except Exception:  # noqa: BLE001
        pass


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("edw-bench")
    registry = load_registry()
    # SORTED execution order — constant across rounds regardless of the
    # registry's PRIORITY_ORDER rotation, so per-query cross-round deltas
    # compare like positions (same JVM warmth), not rotation artifacts.
    bench_queries = {
        n: registry[n] for n in sorted(n for n, s in registry.items() if s.bench)
    }

    timings: dict[str, float] = {}
    runs: dict[str, list[float]] = {}
    errors: dict[str, str] = {}

    # Warm the JVM + parquet footers once so per-query numbers measure the
    # engine, not first-touch classloading. Resilient like the loop below:
    # a broken first query must not vaporize the whole round's record.
    try:
        force(bench_queries[next(iter(bench_queries))].fn(spark, sf_dir))
    except Exception as e:  # noqa: BLE001
        errors["_warmup"] = f"{type(e).__name__}: {e}"[:200]
    _release_session_residue(spark)

    for name, spec in bench_queries.items():
        rs = []
        n_runs = (
            4 if name in COUNTER_MOVER_WATCH
            else 3 if name in REGRESSION_WATCH
            else 2
        )
        try:
            for _ in range(n_runs):
                t0 = time.perf_counter()
                force(spec.fn(spark, sf_dir))
                rs.append(round(time.perf_counter() - t0, 3))
            runs[name] = rs
            timings[name] = min(rs)
        except Exception as e:  # noqa: BLE001 — one bad query must not
            # vaporize the whole round's bench record; surface it loudly
            # in the JSON instead and keep timing the rest. Runs that DID
            # complete before the failure are kept (a flaky run k>1 must
            # not erase the query's record).
            errors[name] = f"{type(e).__name__}: {e}"[:200]
            if rs:
                runs[name] = rs
                timings[name] = min(rs)
        finally:
            # Isolate queries from each other's session residue — see
            # _release_session_residue. ESPECIALLY after a failed query,
            # whose residue would otherwise distort every later timing.
            _release_session_residue(spark)

    total = round(sum(timings.values()), 3)
    # Raw best-of-N run arrays go to a SIDE file: they outgrew the driver's
    # 2 kB stdout tail capture in r11/r12 and cost BENCH_r11 its parsed
    # record. The stdout line stays small forever.
    runs_path = Path(__file__).resolve().parent / "plans" / "bench_runs.json"
    try:
        runs_path.parent.mkdir(parents=True, exist_ok=True)
        runs_path.write_text(json.dumps({"runs": runs, "sf": sf}, indent=1))
    except OSError:
        pass  # recording the side artifact must never fail the bench
    print(
        json.dumps(
            {
                "metric": "headline_query_wall_time",
                "value": total,
                "unit": "sec",
                "queries": timings,
                # methodology v2 since r02: per-query best-of-2 with a warm
                # JVM (v1/r01 was single-run); v3 since r04: best-of-3 for
                # the REGRESSION_WATCH set; v4 since r05: best-of-4 for the
                # COUNTER_MOVER_WATCH pair; v5 since r13: sorted execution
                # order + deterministic checkpoint-block release between
                # queries + runs arrays in plans/bench_runs.json (VERDICT
                # r12 items 2 and 6 — same timing methodology otherwise).
                "methodology": "best_of_n_noop_sink_v5_sorted",
                **({"errors": errors} if errors else {}),
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
