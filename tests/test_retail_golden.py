"""Replay of the reference's one true end-to-end oracle (FIXTURES.md F2):
the committed in-store CSV + the seeded online rows must aggregate to
exactly the committed sales_summary golden output — including the dirty-row
cleaning (zero/negative/null quantities and amounts) and the hostile
all-string transport mode.

Seed data per reference scripts/extraction.py:38-57 (values, not code);
golden expectations per data/output/sales_summary.csv:2-7.
"""

import datetime

import pytest
from pyspark.sql import functions as F

from etl_pipeline_for_retail_sales_data_spark.plans.retail import (
    transform_sales,
    transform_sales_from_strings,
    validated_summary,
)
from etl_pipeline_for_retail_sales_data_spark.schemas import SALES_SCHEMA, SALES_STRING_SCHEMA

D1 = datetime.date(2025, 4, 2)
D2 = datetime.date(2025, 4, 3)

# (sale_id, product_id, quantity, sale_amount, sale_date, source)
ONLINE_ROWS = [
    (1, 101, 3, 60.00, D1, "online"),
    (2, 102, 2, 45.00, D1, "online"),
    (3, 103, 1, 30.00, D1, "online"),
    (4, 104, 2, 40.00, D1, "online"),
    (5, 105, 1, 22.50, D1, "online"),
    (6, 101, 4, 120.00, D2, "online"),
    (7, 102, 2, 55.00, D2, "online"),
    (8, 103, 3, 75.00, D2, "online"),
    (9, 105, 1, 20.00, D2, "online"),
    (10, 106, 2, 55.00, D2, "online"),
    (11, 101, 0, 10.00, D2, "online"),
    (12, 102, -1, 20.00, D2, "online"),
    (13, 103, 2, -5.00, D2, "online"),
    (14, 104, None, 30.00, D2, "online"),
    (15, 105, 2, None, D2, "online"),
]

IN_STORE_ROWS = [
    (1, 101, 2, 40.00, D1, "in_store"),
    (2, 102, 1, 25.00, D1, "in_store"),
    (3, 103, 3, 75.00, D1, "in_store"),
    (4, 101, 1, 20.00, D1, "in_store"),
    (5, 102, 2, 50.00, D1, "in_store"),
    (6, 104, 5, 125.00, D2, "in_store"),
    (7, 105, 1, 35.50, D2, "in_store"),
    (8, 101, 3, 60.00, D2, "in_store"),
    (9, 102, 2, 50.00, D2, "in_store"),
    (10, 106, 4, 80.00, D2, "in_store"),
    (11, 103, 0, 30.00, D2, "in_store"),
    (12, 104, -1, 25.00, D2, "in_store"),
    (13, 105, None, 45.00, D2, "in_store"),
    (14, 106, 2, -15.00, D2, "in_store"),
    (15, 101, 3, None, D2, "in_store"),
]

GOLDEN = [
    (101, 13, 300.0),
    (102, 9, 225.0),
    (103, 7, 180.0),
    (104, 7, 165.0),
    (105, 3, 78.0),
    (106, 6, 135.0),
]


@pytest.fixture(scope="module")
def frames(spark):
    online = spark.createDataFrame(ONLINE_ROWS, SALES_SCHEMA)
    in_store = spark.createDataFrame(IN_STORE_ROWS, SALES_SCHEMA)
    return online, in_store


def test_golden_summary(spark, frames):
    out = transform_sales(*frames)
    rows = [(r.product_id, r.total_quantity, float(r.total_sale_amount)) for r in out.collect()]
    assert rows == GOLDEN


def test_golden_summary_hostile_strings(spark, frames):
    """F5: every column stringified (incl. None→'nan' artifacts for the CSV
    path per reference astype(str)); cast layer must reproduce the result."""

    def stringify(rows):
        out = []
        for r in rows:
            out.append(tuple("nan" if v is None else str(v) for v in r))
        return out

    online = spark.createDataFrame(stringify(ONLINE_ROWS), SALES_STRING_SCHEMA)
    in_store = spark.createDataFrame(stringify(IN_STORE_ROWS), SALES_STRING_SCHEMA)
    out = transform_sales_from_strings(online, in_store)
    rows = [(r.product_id, r.total_quantity, float(r.total_sale_amount)) for r in out.collect()]
    assert rows == GOLDEN


def test_validated_summary_passes_golden(spark, frames):
    out = validated_summary(transform_sales(*frames))
    assert out.count() == 6


def test_validation_rejects_negative(spark):
    from etl_pipeline_for_retail_sales_data_spark.operators.cleaning import validate

    bad = spark.createDataFrame(
        [(101, -5, 10.0)], "product_id long, total_quantity long, total_sale_amount double"
    )
    with pytest.raises(ValueError, match="Found negative quantities"):
        validate(
            bad,
            ["product_id", "total_quantity", "total_sale_amount"],
            non_negative=["total_quantity", "total_sale_amount"],
        )


@pytest.mark.parametrize(
    ("rows", "schema", "required", "non_negative", "expected_msg"),
    [
        # reference scripts/extraction.py:86-88 / loading.py:58-60
        ([], "product_id long, total_quantity long, total_sale_amount double",
         ["product_id"], [], "DataFrame is empty"),
        # reference scripts/extraction.py:90-93 / loading.py:62-65 —
        # message includes the Python list repr of the missing columns
        ([(1, 2, 3.0)], "product_id long, total_quantity long, total_sale_amount double",
         ["product_id", "sale_date"], [], "Missing required columns: ['sale_date']"),
        # reference scripts/loading.py:67-69
        ([(1, -2, 3.0)], "product_id long, total_quantity long, total_sale_amount double",
         ["product_id"], ["total_quantity", "total_sale_amount"],
         "Found negative quantities"),
        # reference scripts/loading.py:71-73
        ([(1, 2, -3.0)], "product_id long, total_quantity long, total_sale_amount double",
         ["product_id"], ["total_quantity", "total_sale_amount"],
         "Found negative sale amounts"),
    ],
)
def test_validation_message_parity_with_reference(
    spark, rows, schema, required, non_negative, expected_msg
):
    """The ValueError TEXTS (not just classes) match the reference
    verbatim — each expected_msg above is quoted from
    /root/reference/scripts/extraction.py:86-93 and loading.py:58-73,
    and the check ORDER matches too (empty before missing columns:
    both violated here for the empty case → reference raises empty)."""
    from etl_pipeline_for_retail_sales_data_spark.operators.cleaning import validate

    df = spark.createDataFrame(rows, schema)
    with pytest.raises(ValueError) as exc:
        validate(df, required, non_negative=non_negative)
    assert str(exc.value) == expected_msg


def test_validation_empty_precedes_missing_columns(spark):
    """Reference order: df.empty is checked before missing columns, so an
    empty frame that is ALSO missing columns reports 'DataFrame is empty'
    (scripts/loading.py:58-65)."""
    from etl_pipeline_for_retail_sales_data_spark.operators.cleaning import validate

    empty = spark.createDataFrame([], "product_id long")
    with pytest.raises(ValueError, match="^DataFrame is empty$"):
        validate(empty, ["product_id", "total_quantity"])


def test_validation_rejects_empty(spark):
    from etl_pipeline_for_retail_sales_data_spark.operators.cleaning import validate

    empty = spark.createDataFrame([], SALES_SCHEMA)
    with pytest.raises(ValueError, match="empty"):
        validate(empty, ["sale_id"])


def test_cast_failure_accounting(spark):
    """P2 raise-on-garbage contract (pd.to_numeric errors='raise')."""
    from etl_pipeline_for_retail_sales_data_spark.operators.cleaning import (
        assert_casts_ok,
        to_typed,
    )

    raw = spark.createDataFrame(
        [("1", "101", "2", "garbage", "2025-04-02", "online")], SALES_STRING_SCHEMA
    )
    typed = to_typed(raw)
    with pytest.raises(ValueError, match="failed numeric conversion"):
        assert_casts_ok(raw, typed, ["sale_id", "product_id", "quantity", "sale_amount"])


def test_golden_csv_bytes(spark, frames, tmp_path):
    """End-to-end sink parity: the summary written through the CSV sink
    must reproduce the reference's golden file content exactly —
    ascending product_id, double-formatted amounts (300.0, not 300.00)."""
    from etl_pipeline_for_retail_sales_data_spark.sinks import write_csv_single_file

    out = str(tmp_path / "sales_summary.csv")
    write_csv_single_file(transform_sales(*frames), out)
    lines = open(out).read().strip().splitlines()
    assert lines[0] == "product_id,total_quantity,total_sale_amount"
    assert lines[1:] == [
        "101,13,300.0",
        "102,9,225.0",
        "103,7,180.0",
        "104,7,165.0",
        "105,3,78.0",
        "106,6,135.0",
    ]
