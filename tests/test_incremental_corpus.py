"""Incremental corpus ingestion (plans/incremental_corpus.py): the
append-only daily loop — within-batch dedup, dedup against historical
fingerprints, idempotent re-runs. The pure-query twin of the funnel
semantics is oracle-checked as `incremental_ingest_funnel`."""

import pytest

pytestmark = pytest.mark.slow  # heavy sweep: excluded from the fast lane (pytest -m "not slow")


from etl_pipeline_for_retail_sales_data_spark.plans.incremental_corpus import (
    ingest_batch,
)

SCHEMA = "doc_id long, text string"


@pytest.fixture
def state_dir(tmp_path):
    return str(tmp_path / "corpus_state")


def _docs(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_two_batch_funnel_and_state(spark, state_dir):
    day1 = _docs(
        spark,
        [
            (1, "alpha text"),
            (2, "beta text"),
            (3, "alpha text"),  # within-batch dup of 1
        ],
    )
    s1 = ingest_batch(spark, day1, state_dir)
    assert s1 == {"n_batch": 3, "n_within_dup": 1, "n_hist_dup": 0, "n_accepted": 2}

    day2 = _docs(
        spark,
        [
            (10, "alpha text"),  # historical dup (ingested day 1)
            (11, "gamma text"),  # novel
            (12, "gamma text"),  # within-batch dup of 11
        ],
    )
    s2 = ingest_batch(spark, day2, state_dir)
    assert s2 == {"n_batch": 3, "n_within_dup": 1, "n_hist_dup": 1, "n_accepted": 1}

    corpus = spark.read.parquet(state_dir + "/corpus")
    assert {r.doc_id for r in corpus.collect()} == {1, 2, 11}
    fps = spark.read.parquet(state_dir + "/fingerprints")
    assert fps.count() == 3
    assert fps.select("digest").distinct().count() == 3


def test_reingest_is_idempotent(spark, state_dir):
    batch = _docs(spark, [(1, "a"), (2, "b")])
    first = ingest_batch(spark, batch, state_dir)
    assert first["n_accepted"] == 2
    again = ingest_batch(spark, batch, state_dir)
    assert again == {"n_batch": 2, "n_within_dup": 0, "n_hist_dup": 2, "n_accepted": 0}
    assert spark.read.parquet(state_dir + "/corpus").count() == 2
    assert spark.read.parquet(state_dir + "/fingerprints").count() == 2


def test_all_duplicate_batch_appends_nothing(spark, state_dir):
    ingest_batch(spark, _docs(spark, [(1, "x")]), state_dir)
    stats = ingest_batch(spark, _docs(spark, [(5, "x"), (6, "x")]), state_dir)
    assert stats == {"n_batch": 2, "n_within_dup": 1, "n_hist_dup": 1, "n_accepted": 0}
    # no empty parquet append happened — state still one file set, 1 row
    assert spark.read.parquet(state_dir + "/corpus").count() == 1
