"""SQL surface: register the driver tables as temp views and run ANSI SQL
through Catalyst. The reference has no query language at all (SURVEY.md §3
— its "queries" are three Python callables); this module is the Spark-native
extension that lets a user express every engine capability as SQL.

`spark.sql` plans through exactly the same Catalyst/Tungsten pipeline as
the DataFrame API, so everything the operator library guarantees (pushdown,
pruning, broadcast choice, AQE) holds for SQL verbatim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .schemas import TESTDATA_TABLES
from .sources.readers import load_events, load_table


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every driver table as a temp view (events with its
    nanos→micros timestamp normalization applied, matching the DataFrame
    reader)."""
    for name in TESTDATA_TABLES:
        df = load_events(spark, sf_dir) if name == "events" else load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)


def sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    """Run ANSI SQL against the registered driver tables."""
    register_views(spark, sf_dir)
    return spark.sql(query)
