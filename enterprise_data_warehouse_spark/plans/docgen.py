"""Catalog documentation generator — the dbt-docs analogue: one markdown
data dictionary straight from catalog/warehouse.yml, so the docs can never
drift from what plans/catalog.py actually compiles (same YAML, same parse).
"""

from __future__ import annotations

from .catalog import Catalog


def _measure_line(m: dict) -> str:
    tests = f" — tests: {', '.join(m['tests'])}" if m.get("tests") else ""
    return f"| {m['name']} | {m.get('aggregation', '')} | `{m.get('column', '')}`{tests} |"


def catalog_markdown(catalog_path: str) -> str:
    """Render the catalog as a markdown data dictionary: every fact (grain,
    source, dimension keys with their declared relationships, measures with
    their tests, derived measures with the exact expression) and every
    dimension (scd type, keys, attributes)."""
    cat = Catalog.load(catalog_path)
    out: list[str] = ["# Data dictionary (generated from catalog/warehouse.yml)", ""]
    out.append("## Fact tables\n")
    for f in cat.facts:
        out.append(f"### {f['name']}\n")
        out.append(
            f"- grain: **{f.get('grain', 'daily')}** · source: `{f['source']}` · "
            f"date column: `{f['date_column']}`"
        )
        keys = f.get("dimension_keys", [])
        if keys:
            out.append("- dimension keys:")
            for k in keys:
                ref = k.get("ref")
                ref_txt = (
                    f" → relationships test vs `{ref['table']}.{ref['column']}`"
                    if ref
                    else ""
                )
                out.append(f"  - `{k['name']}` from `{k['source_column']}`{ref_txt}")
        ms = f.get("measures", [])
        if ms:
            out.append("\n| measure | aggregation | source column |")
            out.append("|---|---|---|")
            out.extend(_measure_line(m) for m in ms)
        dm = f.get("derived_measures", [])
        if dm:
            out.append("\n- derived measures:")
            for d in dm:
                out.append(f"  - `{d['name']}` = `{d['calculation']}`")
        out.append("")
    out.append("## Dimensions\n")
    for d in cat.dimensions:
        out.append(f"### {d['name']}\n")
        out.append(
            f"- scd type: **{d.get('scd_type', 1)}** · source: `{d.get('source', '')}`"
            f" · key: `{d.get('natural_key', d.get('key', ''))}`"
        )
        attrs = d.get("attributes", [])
        if attrs:
            names = ", ".join(
                f"`{a['name'] if isinstance(a, dict) else a}`" for a in attrs
            )
            out.append(f"- attributes: {names}")
        out.append("")
    return "\n".join(out)
