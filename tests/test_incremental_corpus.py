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


def test_neardup_ingest_matches_static_funnel(spark, state_dir, sf_smoke):
    """Replaying the documents table as day batches (day = doc_id % 3,
    ingested in day order) through the STATEFUL near-dup loop must
    reproduce exactly the static funnel the oracle checks
    (incremental_neardup_funnel) — same per-day hist/within/accepted
    counts."""
    from etl_pipeline_for_retail_sales_data_spark.plans.incremental_corpus import (
        ingest_batch_neardup,
    )
    from etl_pipeline_for_retail_sales_data_spark.queries_registry import QUERIES

    expected = {
        int(r["day"]): (r["n_docs"], r["n_hist_neardup"], r["n_within_neardup"], r["n_accepted"])
        for r in QUERIES["incremental_neardup_funnel"](spark, sf_smoke).collect()
    }
    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet")
    for day in (0, 1, 2):
        batch = docs.filter(docs.doc_id % 3 == day)
        got = ingest_batch_neardup(spark, batch, state_dir)
        assert (
            got["n_batch"],
            got["n_hist_neardup"],
            got["n_within_neardup"],
            got["n_accepted"],
        ) == expected[day], (day, got, expected[day])


def test_neardup_ingest_replay_is_all_historical(spark, state_dir):
    """Re-ingesting an already-seen batch classifies EVERY signed doc as
    a historical near-dup (its band keys are all in the state) and
    accepts nothing new except signature-less docs, which can never
    collide."""
    from etl_pipeline_for_retail_sales_data_spark.plans.incremental_corpus import (
        ingest_batch_neardup,
    )

    batch = _docs(
        spark,
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy cat"),
            (3, "completely different words entirely here now"),
            (4, "xy"),  # < 3 tokens: no signature, never a near-dup
        ],
    )
    s1 = ingest_batch_neardup(spark, batch, state_dir)
    assert s1["n_batch"] == 4
    assert s1["n_hist_neardup"] == 0
    # docs 1/2 share 8 of 9 shingles -> share a band with high odds; the
    # structural guarantees under test are the state transitions, so only
    # pin the invariants that cannot flake:
    assert s1["n_accepted"] + s1["n_within_neardup"] == 4

    s2 = ingest_batch_neardup(spark, batch, state_dir)
    # every signed doc's keys are now in the state; doc 4 has no keys
    assert s2 == {
        "n_batch": 4,
        "n_hist_neardup": 3,
        "n_within_neardup": 0,
        "n_accepted": 1,
    }


def test_neardup_state_compaction(spark, state_dir):
    """Replaying a batch duplicates its band rows in the append-only
    state; compaction collapses them without changing classification."""
    from etl_pipeline_for_retail_sales_data_spark.plans.incremental_corpus import (
        compact_neardup_state,
        ingest_batch_neardup,
    )

    batch = _docs(
        spark,
        [(1, "one two three four five six"), (2, "seven eight nine ten eleven")],
    )
    ingest_batch_neardup(spark, batch, state_dir)
    ingest_batch_neardup(spark, batch, state_dir)  # replay doubles the rows
    import os

    bands_path = os.path.join(state_dir, "neardup_bands")
    assert spark.read.parquet(bands_path).count() == 16  # 2 docs x 4 bands x 2
    n = compact_neardup_state(spark, state_dir)
    assert n == 8
    assert spark.read.parquet(bands_path).count() == 8
    # classification unchanged after compaction: replay still 100% hist
    s = ingest_batch_neardup(spark, batch, state_dir)
    assert s["n_hist_neardup"] == 2 and s["n_accepted"] == 0
    # compacting an empty state is a no-op
    assert compact_neardup_state(spark, str(state_dir) + "_missing") == 0
