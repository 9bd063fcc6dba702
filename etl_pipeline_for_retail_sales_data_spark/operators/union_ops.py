"""Set operations (SURVEY.md §2.4)."""

from __future__ import annotations

from pyspark.sql import DataFrame


def union_sources(*dfs: DataFrame) -> DataFrame:
    """U1: bag-semantics UNION ALL aligned by column NAME (the reference's
    pd.concat, scripts/transformation.py:166). unionByName, not positional
    union. Narrow transformation — no shuffle."""
    if not dfs:
        raise ValueError("union_sources needs at least one DataFrame")
    out = dfs[0]
    for df in dfs[1:]:
        out = out.unionByName(df)
    return out
