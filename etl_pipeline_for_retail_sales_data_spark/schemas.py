"""Declared schemas — the engine never relies on inference in the contract.

Mirrors the reference's fixed, validated schema discipline
(REQUIRED_COLUMNS, reference scripts/extraction.py:23; validate_dataframe,
scripts/extraction.py:70-96) but typed end-to-end instead of stringly-typed.
"""

from __future__ import annotations

from pyspark.sql import types as T

# Canonical retail-sales input schema (SURVEY.md §1.4). The `source` column
# replaces the reference's dict-of-two-frames transport
# (scripts/extraction.py:291-294).
SALES_SCHEMA = T.StructType(
    [
        T.StructField("sale_id", T.LongType()),
        T.StructField("product_id", T.LongType()),
        T.StructField("quantity", T.LongType()),
        T.StructField("sale_amount", T.DoubleType()),
        T.StructField("sale_date", T.DateType()),
        T.StructField("source", T.StringType()),
    ]
)

# Required-column sets, faithful to the reference's two validation points.
SALES_REQUIRED_COLUMNS = ["sale_id", "product_id", "quantity", "sale_amount", "sale_date"]
SUMMARY_REQUIRED_COLUMNS = ["product_id", "total_quantity", "total_sale_amount"]

# Output schema of the aggregate (reference scripts/loading.py:16-22).
SUMMARY_SCHEMA = T.StructType(
    [
        T.StructField("product_id", T.LongType()),
        T.StructField("total_quantity", T.LongType()),
        T.StructField("total_sale_amount", T.DoubleType()),
    ]
)

# The hostile-typing variant: everything arrives as string (the reference's
# actual transport encoding, ::text casts scripts/extraction.py:60-68).
SALES_STRING_SCHEMA = T.StructType(
    [T.StructField(f.name, T.StringType()) for f in SALES_SCHEMA.fields]
)

# Driver testdata table names (TESTDATA.md).
TESTDATA_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]
