"""Standing round gate: full-registry sf1 correctness sweep (VERDICT r06 #4).

The sf1 sweep is the only check that has ever caught a live correctness
bug (two in r06: engine-dependent decimal→double conversion, libm-pow vs
IEEE sqrt) — scale surfaces cross-engine ULP divergence the driver's
sf0.01 gate can never see. This script turns the hand-run into a scripted
gate:

1. regenerates /root/repo/testdata_sf1 (tools/make_sf1.py) if absent,
2. runs EVERY oracle-paired registry query at sf1 against its DuckDB
   oracle (same normalize/compare as tools/verify_local.py),
3. writes SWEEP_SF1.json at the repo root ({date, pass, fail, skipped,
   per-query status}) for SCALING.md to cite.

Allowlisted (skipped, documented in SCALING.md): the two LABELED
deliberately-quadratic exactness baselines whose scale-path twins ARE
swept — `embedding_near_dup` (scale path: semantic_dedup) and
`ann_lsh_verified` (scale paths: ann_multiprobe_topk, ivf_topk).

Usage: python tools/sweep_sf1.py [--resume] [--names q1 q2 ...]
       (default: all oracle-paired queries; --resume skips queries whose
       existing SWEEP_SF1.json record already passed, so an interrupted
       multi-hour sweep continues instead of restarting)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF1_DIR = str(REPO / "testdata_sf1")

# labeled all-pairs exactness baselines — quadratic BY DESIGN on both the
# Spark and oracle side; their bucketed scale paths are swept instead
ALLOWLIST = {
    "embedding_near_dup": "all-pairs cosine baseline; scale path semantic_dedup is swept",
    "ann_lsh_verified": "all-pairs verify baseline; scale paths ann_multiprobe_topk/ivf_topk are swept",
}


def ensure_sf1() -> None:
    marker = Path(SF1_DIR) / "lineitem.parquet"
    if marker.exists():
        return
    print(f"regenerating {SF1_DIR} via tools/make_sf1.py ...", flush=True)
    subprocess.run(
        [sys.executable, str(REPO / "tools" / "make_sf1.py"), SF1_DIR],
        check=True,
    )


def main() -> int:
    import duckdb
    from pyspark.sql import SparkSession

    from enterprise_data_warehouse_spark.queries import load_registry
    from enterprise_data_warehouse_spark.sources.tables import TABLE_NAMES
    from tools.verify_local import to_rows

    ensure_sf1()
    registry = load_registry()
    argv = sys.argv[1:]
    resume = "--resume" in argv
    if resume:
        argv.remove("--resume")
    subset = bool(argv) and argv[0] == "--names"
    if subset:
        names = argv[1:]
    else:
        names = [n for n, s in registry.items() if s.oracle is not None]

    # prior records serve two purposes: --resume skips already-passed
    # queries, and a --names subset run MERGES into the existing summary
    # instead of clobbering the full-registry record
    prior: dict[str, dict] = {}
    out = REPO / "SWEEP_SF1.json"
    if (resume or subset) and out.exists():
        try:
            prior = json.loads(out.read_text()).get("queries", {})
        except (OSError, ValueError):
            prior = {}

    spark = (
        SparkSession.builder.master(f"local[{os.cpu_count() or 8}]")
        .appName("sweep-sf1")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .getOrCreate()
    )
    con = duckdb.connect()
    con.execute("PRAGMA memory_limit='48GB'")
    con.execute("PRAGMA temp_directory='/tmp/sweep_sf1_duck'")
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF1_DIR}/{t}.parquet/*.parquet')"
        )

    results: dict[str, dict] = {}
    n_pass = n_fail = 0
    for name in names:
        if resume and prior.get(name, {}).get("status") == "pass":
            results[name] = prior[name]
            n_pass += 1
            continue
        if name in ALLOWLIST:
            results[name] = {"status": "allowlisted", "why": ALLOWLIST[name]}
            print(f"SKIP {name}: {ALLOWLIST[name]}", flush=True)
            continue
        spec = registry[name]
        if spec.oracle is None:
            # rows-only-by-design queries (their value-verified twins ARE
            # swept) must not be force-fed to DuckDB via --names: running
            # None as SQL records a bogus failure in the summary
            print(f"SKIP {name}: no oracle (rows-only by design)", flush=True)
            continue
        t0 = time.time()
        try:
            spdf = spec.fn(spark, SF1_DIR).toPandas()
            scols, srows = to_rows(spdf)
            odf = con.execute(spec.oracle).fetchdf()
            ocols, orows = to_rows(odf)
        except Exception as e:  # noqa: BLE001
            results[name] = {"status": "error", "error": f"{type(e).__name__}: {e}"}
            print(f"FAIL {name}: {type(e).__name__}: {e}", flush=True)
            n_fail += 1
            continue
        dt = round(time.time() - t0, 2)
        if scols != ocols:
            results[name] = {"status": "col_mismatch", "spark": scols, "oracle": ocols}
            n_fail += 1
            print(f"FAIL {name}: columns differ", flush=True)
        elif len(srows) != len(orows):
            results[name] = {
                "status": "rowcount_mismatch",
                "spark": len(srows), "oracle": len(orows),
            }
            n_fail += 1
            print(f"FAIL {name}: rows spark={len(srows)} oracle={len(orows)}", flush=True)
        elif srows != orows:
            diffs = [
                (i, a, b) for i, (a, b) in enumerate(zip(srows, orows)) if a != b
            ]
            results[name] = {
                "status": "value_mismatch",
                "n_diffs": len(diffs),
                "first": [diffs[0][0], list(diffs[0][1]), list(diffs[0][2])],
            }
            n_fail += 1
            print(f"FAIL {name}: {len(diffs)}/{len(srows)} row diffs", flush=True)
        else:
            results[name] = {"status": "pass", "rows": len(srows), "sec": dt}
            n_pass += 1
            print(f"PASS {name} ({len(srows)} rows, {dt}s)", flush=True)

    merged = {**prior, **results} if subset else results
    summary = {
        "date": time.strftime("%Y-%m-%d"),
        "sf_dir": SF1_DIR,
        "n_queries": len(merged),
        "n_pass": sum(1 for r in merged.values() if r["status"] == "pass"),
        "n_fail": sum(
            1 for r in merged.values()
            if r["status"] not in ("pass", "allowlisted")
        ),
        "n_allowlisted": sum(
            1 for r in merged.values() if r["status"] == "allowlisted"
        ),
        "queries": merged,
    }
    out.write_text(json.dumps(summary, indent=1) + "\n")
    print(
        f"== sf1 sweep: ran {n_pass} pass / {n_fail} fail this invocation; "
        f"summary now {summary['n_pass']} pass / {summary['n_fail']} fail / "
        f"{summary['n_allowlisted']} allowlisted over "
        f"{summary['n_queries']} -> {out} =="
    )
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
