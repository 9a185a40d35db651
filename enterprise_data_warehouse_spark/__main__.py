"""CLI surface: `python -m enterprise_data_warehouse_spark <cmd>`.

Commands:
  list                      — registered query names (* = has DuckDB oracle)
  run <query> [--sf DIR]    — run a registry query, print rows (capped)
  explain <query> [--sf DIR]— formatted physical plan
  oracle <query>            — the query's DuckDB oracle SQL
  sql "<statement>" [--sf DIR] — ad-hoc ANSI SQL over the warehouse tables
  docs                      — markdown data dictionary from the catalog
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
    args = ap.parse_args(argv)

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
