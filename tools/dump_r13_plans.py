"""Dump .explain('formatted') for every bench-flagged query to
plans/r13/<query>_<tag>.txt (tag = before/after). Usage:

    python tools/dump_r13_plans.py before [query ...]
"""

from __future__ import annotations

import io
import sys
from contextlib import redirect_stdout
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from enterprise_data_warehouse_spark.queries import load_registry  # noqa: E402
from enterprise_data_warehouse_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"
OUT = REPO / "plans" / "r13"


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:]
    OUT.mkdir(parents=True, exist_ok=True)
    spark = get_spark("plan-dump-r13")
    registry = load_registry()
    targets = names or [n for n, s in registry.items() if s.bench]
    for name in targets:
        df = registry[name].fn(spark, SF_DIR)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        (OUT / f"{name}_{tag}.txt").write_text(buf.getvalue())
        print(f"wrote {name}_{tag}.txt ({len(buf.getvalue())} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
