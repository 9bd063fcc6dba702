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


def _merge_crash_fixture(spark, tmp_path):
    """Set up a table + an updates frame and return (path, expect_after)."""
    path = str(tmp_path / "merged")
    base = spark.createDataFrame(
        [(1, "old-a"), (2, "old-b"), (3, "old-c")], "k long, v string"
    )
    sinks.write_parquet(base, path)
    updates = spark.createDataFrame([(2, "new-b"), (4, "new-d")], "k long, v string")
    return path, updates


def test_merge_parquet_upsert_and_crash_recovery(spark, tmp_path):
    """merge_parquet upserts; then simulate a crash inside the swap window
    (after `path` was renamed to ._merge_old, before ._merge_tmp was
    promoted — the only non-atomic window) and assert recover_merge rolls
    FORWARD to the fully-committed merge output."""
    import shutil

    path, updates = _merge_crash_fixture(spark, tmp_path)
    sinks.merge_parquet(spark, updates, path, ["k"])
    got = {r.k: r.v for r in spark.read.parquet(path).collect()}
    assert got == {1: "old-a", 2: "new-b", 3: "old-c", 4: "new-d"}

    # Reconstruct the mid-swap crash state: a complete tmp (with _SUCCESS),
    # the previous table moved aside to ._merge_old, `path` missing.
    tmp, old = path + "._merge_tmp", path + "._merge_old"
    shutil.copytree(path, tmp)  # stands in for the freshly-written merge output
    os.rename(path, old)
    assert not os.path.isdir(path)

    assert sinks.recover_merge(path) == "rolled_forward"
    assert os.path.isdir(path) and not os.path.isdir(tmp) and not os.path.isdir(old)
    got = {r.k: r.v for r in spark.read.parquet(path).collect()}
    assert got == {1: "old-a", 2: "new-b", 3: "old-c", 4: "new-d"}


def test_merge_parquet_crash_before_commit_rolls_back(spark, tmp_path):
    """If the crash hit while the merge output was still being written
    (tmp has no _SUCCESS), recovery restores the PREVIOUS table from
    ._merge_old and discards the torn tmp."""
    import shutil

    path, updates = _merge_crash_fixture(spark, tmp_path)
    tmp, old = path + "._merge_tmp", path + "._merge_old"
    # torn tmp: copy then delete the _SUCCESS marker
    shutil.copytree(path, tmp)
    os.remove(os.path.join(tmp, "_SUCCESS"))
    os.rename(path, old)

    assert sinks.recover_merge(path) == "rolled_back"
    assert os.path.isdir(path) and not os.path.isdir(tmp) and not os.path.isdir(old)
    got = {r.k: r.v for r in spark.read.parquet(path).collect()}
    assert got == {1: "old-a", 2: "old-b", 3: "old-c"}


def test_recover_merge_noop_clears_leftovers(spark, tmp_path):
    """A completed swap with stale side directories is cleaned to 'ok'."""
    import shutil

    path, _ = _merge_crash_fixture(spark, tmp_path)
    shutil.copytree(path, path + "._merge_old")
    assert sinks.recover_merge(path) == "ok"
    assert not os.path.isdir(path + "._merge_old")


def test_recover_merge_nothing_to_recover_raises(tmp_path):
    """Fourth disk state: no table, no tmp, no old — unrecoverable, and
    recovery must say so rather than fabricate an empty table."""
    import pytest

    with pytest.raises(FileNotFoundError, match="recover_merge"):
        sinks.recover_merge(str(tmp_path / "never_merged"))


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
