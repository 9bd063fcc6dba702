#!/usr/bin/env python
"""Regenerate QUERIES.md: the full query catalog (name, check mode, and
docstring) straight from the registry. Usage: python tools/dump_query_catalog.py"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_pipeline_for_retail_sales_data_spark.queries_registry import (  # noqa: E402
    ORACLES,
    QUERIES,
)


def main() -> None:
    lines = [
        "# QUERIES — the full catalog",
        "",
        f"{len(QUERIES)} queries, {len(ORACLES)} with DuckDB oracles. Auto-generated",
        "by `tools/dump_query_catalog.py` from `queries_registry.py`. Check mode:",
        '"oracle" = DuckDB-differential hash check; "rows" = rows-only driver check',
        "(property/recall tests in `tests/`).",
        "",
        "| Query | Check | What it does |",
        "|---|---|---|",
    ]
    for name in sorted(QUERIES):
        fn = QUERIES[name]
        doc = " ".join((fn.__doc__ or "").split()) or "(see registry)"
        check = "oracle" if name in ORACLES else "rows"
        doc = doc.replace("|", "\\|")
        lines.append(f"| `{name}` | {check} | {doc} |")
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "QUERIES.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"QUERIES.md written ({len(QUERIES)} queries)")


if __name__ == "__main__":
    main()
