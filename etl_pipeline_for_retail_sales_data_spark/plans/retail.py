"""The composed retail pipeline — the reference's observable end-to-end
behavior (extract → transform → load, reference dags/etl_pipeline.py:88) as
ONE lazy DataFrame lineage.

The reference's three process-separated tasks with JSON/XCom
materialization between them (SURVEY.md §3.1) collapse into a single
logical plan: scan → cast → union → dropna → positive-filter →
partial+final hash agg (one exchange on product_id) → sort → sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.aggregate import aggregate_sales, summary_ordered
from ..operators.cleaning import clean_sales, to_typed, validate
from ..operators.union_ops import union_sources
from ..schemas import SALES_REQUIRED_COLUMNS, SUMMARY_REQUIRED_COLUMNS
from ..sources.readers import sales_from_lineitem


def transform_sales(*sources: DataFrame) -> DataFrame:
    """Union N typed sales sources, clean, aggregate, order — the
    reference's transform_data (scripts/transformation.py:123-182) minus
    the JSON transport."""
    unioned = union_sources(*sources)
    return summary_ordered(aggregate_sales(clean_sales(unioned)))


def transform_sales_from_strings(*raw_sources: DataFrame) -> DataFrame:
    """Hostile-typing mode (FIXTURES.md F5): inputs arrive all-string as in
    the reference's actual transport; cast layer (P2/P4) runs first."""
    return transform_sales(*[to_typed(df) for df in raw_sources])


def retail_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship query on driver testdata: total quantity + revenue per
    product across both (simulated) channels. The rows are tagged
    online/in_store by the reader; since every row belongs to exactly one
    channel, the two-source union of the reference equals ONE scan of the
    tagged table — splitting and re-unioning would scan the 100 TB fact
    table twice for the same result (U1 semantics are exercised on real
    two-frame inputs in union_channels / transform_sales tests)."""
    sales = sales_from_lineitem(spark, sf_dir)
    missing = [c for c in SALES_REQUIRED_COLUMNS if c not in sales.columns]
    if missing:  # schema-only check, no action (F3; reference message text)
        raise ValueError(f"Missing required columns: {missing}")
    return transform_sales(sales)


def validated_summary(df: DataFrame) -> DataFrame:
    """Load-side validation (F3) before the sinks, matching
    reference scripts/loading.py:39-75."""
    return validate(df, SUMMARY_REQUIRED_COLUMNS, non_negative=["total_quantity", "total_sale_amount"])
