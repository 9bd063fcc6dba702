"""Sink semantics (SURVEY.md §2.8): replace-not-accumulate (L3), single-file
CSV (L1), partitioned parquet as the scale path."""

import csv
import os

from etl_pipeline_for_retail_sales_data_spark import sinks
from etl_pipeline_for_retail_sales_data_spark.queries_registry import QUERIES


def test_csv_single_file_overwrite(spark, sf_smoke, tmp_path):
    out = str(tmp_path / "summary.csv")
    df = QUERIES["sales_summary"](spark, sf_smoke)
    sinks.write_csv_single_file(df, out)
    assert os.path.isfile(out)
    with open(out) as f:
        rows = list(csv.reader(f))
    assert rows[0] == ["product_id", "total_quantity", "total_sale_amount"]
    n_first = len(rows)

    # idempotent re-run: replace, not accumulate (L3)
    sinks.write_csv_single_file(df, out)
    with open(out) as f:
        assert len(list(csv.reader(f))) == n_first


def test_parquet_partitioned_roundtrip(spark, sf_smoke, tmp_path):
    out = str(tmp_path / "events_by_type")
    ev = QUERIES["events_hourly"](spark, sf_smoke)
    sinks.write_parquet(ev, out, partition_by=["event_type"])
    # partition directories exist → readers get partition pruning
    parts = [d for d in os.listdir(out) if d.startswith("event_type=")]
    assert len(parts) >= 2
    back = spark.read.parquet(out)
    assert back.count() == ev.count()

    # overwrite semantics
    sinks.write_parquet(ev.limit(10), out)
    assert spark.read.parquet(out).count() == 10
