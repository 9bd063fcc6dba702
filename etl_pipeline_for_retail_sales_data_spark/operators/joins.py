"""Join strategies (SURVEY.md §2.5 — the reference has ZERO joins; this is
the extension tier, built entirely on Catalyst's join machinery).

Scale doctrine for 100 TB:
- Dimension tables (region/nation/part/supplier/customer at typical star
  ratios) are broadcast — no shuffle of the fact side at all.
- Fact-to-fact (orders ⋈ lineitem) is sort-merge on the key; with AQE on,
  skewed keys are split at runtime (skewJoin), so no manual salting in the
  default path.
- Helpers take/return DataFrames and stay lazy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def broadcast_dim_join(fact: DataFrame, dim: DataFrame, on, how: str = "inner") -> DataFrame:
    """Broadcast-hash join for a small dimension side. At 100 TB the fact
    side never moves; each executor streams its parquet splits past an
    in-memory hash table of the dim."""
    return fact.join(F.broadcast(dim), on=on, how=how)


def fact_join(left: DataFrame, right: DataFrame, on, how: str = "inner") -> DataFrame:
    """Fact-to-fact join: leave strategy choice to Catalyst/AQE (sort-merge
    with runtime skew splitting). Co-location via bucketing is the manual
    escape hatch when the same key is joined repeatedly."""
    return left.join(right, on=on, how=how)
