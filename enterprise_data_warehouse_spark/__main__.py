"""CLI surface: `python -m enterprise_data_warehouse_spark <cmd>`.

Commands:
  list                      — registered query names (* = has DuckDB oracle)
  run <query> [--sf DIR]    — run a registry query, print rows (capped)
  explain <query> [--sf DIR]— formatted physical plan
  oracle <query>            — the query's DuckDB oracle SQL
  sql "<statement>" [--sf DIR] — ad-hoc ANSI SQL over the warehouse tables
  docs                      — markdown data dictionary from the catalog
  table-history <path>      — commit history of a versioned table
  table-vacuum <path> [--keep N]
                            — reclaim old versions/orphans (writer+reader
                              graces stay at their safe defaults)
  table-clone <path> <dest> [--version N]
                            — zero-copy branch at a pinned version (hard-ref
                              pinned against parent vacuum)
  table-compact <path>      — rewrite the current version's small files as
                              a new pinned commit (object-store safe)
  table-release-ref <path>  — drop a clone's pin on its parent (refuses
                              while any retained version still reads
                              parent storage)
  table-skipping <path> [--version N]
                            — the version's data-skipping metadata: stats
                              columns + per-file min/max ranges, bloom
                              geometry + sidecar size (what read(prune=)
                              will use)
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="enterprise_data_warehouse_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)
    sub.add_parser("list")
    for c in ("run", "explain", "oracle"):
        p = sub.add_parser(c)
        p.add_argument("query")
        p.add_argument("--sf", default=None)
    p = sub.add_parser("sql")
    p.add_argument("statement")
    p.add_argument("--sf", default=None)
    sub.add_parser("docs")
    p = sub.add_parser("table-history")
    p.add_argument("path")
    p = sub.add_parser("table-vacuum")
    p.add_argument("path")
    p.add_argument("--keep", type=int, default=2)
    p = sub.add_parser("table-clone")
    p.add_argument("path")
    p.add_argument("dest")
    p.add_argument("--version", type=int, default=None)
    p = sub.add_parser("table-compact")
    p.add_argument("path")
    p = sub.add_parser("table-skipping")
    p.add_argument("path")
    p.add_argument("--version", type=int, default=None)
    p = sub.add_parser("table-release-ref")
    p.add_argument("path")
    args = ap.parse_args(argv)

    table_cmds = (
        "table-history", "table-vacuum", "table-clone", "table-compact",
        "table-release-ref", "table-skipping",
    )
    if args.cmd in table_cmds:
        import json

        from .session import get_spark
        from .sources.versioned import VersionedTable

        spark = get_spark("edw-table-ops")
        t = VersionedTable(spark, args.path)
        if args.cmd == "table-history":
            for row in t.history():
                print(json.dumps(row, sort_keys=True))
        elif args.cmd == "table-vacuum":
            print(json.dumps(t.vacuum(keep=args.keep), sort_keys=True))
        elif args.cmd == "table-clone":
            c = t.clone(args.dest, version=args.version)
            print(json.dumps(
                {"dest": c.root, "version": c.current_version()}, sort_keys=True
            ))
        elif args.cmd == "table-compact":
            print(json.dumps(t.compact(), sort_keys=True))
        elif args.cmd == "table-skipping":
            v = args.version if args.version is not None else t.current_version()
            # a table with no committed version reports cleanly (v: null)
            meta = (t._read_marker(v) or {}) if v is not None else {}
            out = {"version": v, "stats": meta.get("stats"),
                   "bloom": meta.get("bloom"),
                   "pcol": meta.get("pcol"),
                   "n_mapped": (len(meta["parts"])
                                if meta.get("parts") else None)}
            print(json.dumps(out, sort_keys=True))
        else:
            print(json.dumps({"released": t.release_parent_ref()}))
        spark.stop()
        return 0

    if args.cmd == "docs":
        import os

        from .plans.docgen import catalog_markdown

        path = os.path.join(os.path.dirname(__file__), "..", "catalog", "warehouse.yml")
        print(catalog_markdown(path))
        return 0

    from .queries import load_registry

    if args.cmd == "list":
        for name, spec in load_registry().items():
            print(("*" if spec.oracle else " ") + " " + name)
        return 0

    if args.cmd == "oracle":
        spec = load_registry()[args.query]
        print(spec.oracle or f"-- {args.query}: no oracle (rows-only surface)")
        return 0

    from .api import Warehouse
    from .sources.tables import DEFAULT_SF_DIR

    wh = Warehouse(sf_dir=args.sf or DEFAULT_SF_DIR)
    if args.cmd == "explain":
        print(wh.explain(args.query))
    elif args.cmd == "sql":
        wh.sql(args.statement).show(50, truncate=False)
    else:
        wh.query(args.query).show(50, truncate=False)
    wh.spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
