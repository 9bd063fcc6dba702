"""Driver contract: entry / queries / oracle_sql.

Every operator from SURVEY.md §2 (plus the training-data-pipeline
extensions) is exposed as a ``queries()`` entry; each SQL-expressible one
has a DuckDB oracle in ``oracle_sql()`` with IDENTICAL output column names
(the driver sorts columns by name before hashing). Float aggregates are
explicitly rounded on BOTH sides so order-of-accumulation noise cannot flip
the value hash.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from etl_pipeline_for_retail_sales_data_spark import queries_registry as QR

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: retail sales summary over sf0.001 (SURVEY.md §7.2)."""
    return QR.QUERIES["sales_summary"](spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QR.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(QR.ORACLES)
