"""End-to-end training-corpus pipeline invariants (plans/corpus.py)."""

import pytest

pytestmark = pytest.mark.slow  # heavy sweep: excluded from the fast lane (pytest -m "not slow")


from pyspark.sql import functions as F

from etl_pipeline_for_retail_sales_data_spark.plans.corpus import (
    build_training_corpus,
    write_training_corpus,
)
from etl_pipeline_for_retail_sales_data_spark.sources.readers import load_table


@pytest.fixture(scope="module")
def corpus(spark, sf_smoke):
    return build_training_corpus(spark, sf_smoke).persist()


def test_funnel_only_shrinks_docs(spark, sf_smoke, corpus):
    n_raw = load_table(spark, sf_smoke, "documents").count()
    n_kept_docs = corpus.select("doc_id").distinct().count()
    assert 0 < n_kept_docs <= n_raw


def test_no_doc_straddles_splits(corpus):
    straddlers = (
        corpus.groupBy("doc_id").agg(F.countDistinct("split").alias("k")).filter(F.col("k") > 1)
    )
    assert straddlers.isEmpty()


def test_split_proportions_roughly_80_10_10(corpus):
    by_split = {r["split"]: r["n"] for r in corpus.groupBy("split").agg(F.count("*").alias("n")).collect()}
    total = sum(by_split.values())
    assert set(by_split) <= {"train", "val", "test"}
    assert by_split.get("train", 0) / total > 0.6


def test_chunks_respect_token_budget(corpus):
    assert corpus.filter(F.col("n_tokens") > 64).isEmpty()
    assert corpus.filter(F.col("n_tokens") <= 0).isEmpty()


def test_deterministic_rerun(spark, sf_smoke, corpus):
    again = build_training_corpus(spark, sf_smoke)
    a = corpus.select("doc_id", "chunk_id", "split").exceptAll(
        again.select("doc_id", "chunk_id", "split")
    )
    assert a.isEmpty()


def test_write_is_idempotent_and_partitioned(spark, sf_smoke, corpus, tmp_path):
    out = str(tmp_path / "corpus")
    write_training_corpus(corpus, out)
    first = spark.read.parquet(out).count()
    write_training_corpus(corpus, out)  # re-run must replace, not accumulate
    again = spark.read.parquet(out)
    assert again.count() == first
    import os
    assert any(d.startswith("split=") for d in os.listdir(out))


# ---------------------------------------------------------------------------
# release_corpus: versioned, audited, datacard-carrying releases
# ---------------------------------------------------------------------------


def test_release_corpus_publishes_with_datacard_and_audit(spark, tmp_path):
    from etl_pipeline_for_retail_sales_data_spark import versioned as V
    from etl_pipeline_for_retail_sales_data_spark.plans.corpus import release_corpus

    table = str(tmp_path / "corpus_release")
    v1 = release_corpus(spark, "/root/testdata/sf0.001", table)
    m = V._read_manifest(table, v1)
    card = m["datacard"]
    rows = V.read_table(spark, table)
    assert card["n_chunks"] == rows.count() > 0
    assert card["n_docs"] == rows.select("doc_id").distinct().count()
    assert card["n_train_chunks"] + card["n_val_chunks"] + card["n_test_chunks"] == card["n_chunks"]
    assert all(a["passed"] for a in m["audit"])

    # a second release replaces the snapshot; the first stays time-travelable
    v2 = release_corpus(spark, "/root/testdata/sf0.001", table)
    assert v2 == v1 + 1
    assert V.read_table(spark, table, version=v1).count() == card["n_chunks"]
    assert V.read_table(spark, table).count() == card["n_chunks"]  # deterministic rebuild


def test_release_corpus_failing_audit_leaves_previous_release(spark, tmp_path):
    from etl_pipeline_for_retail_sales_data_spark import versioned as V
    from etl_pipeline_for_retail_sales_data_spark.operators import quality as Q
    from etl_pipeline_for_retail_sales_data_spark.plans.corpus import release_corpus

    table = str(tmp_path / "corpus_release")
    v1 = release_corpus(spark, "/root/testdata/sf0.001", table)
    n1 = V.read_table(spark, table).count()
    with pytest.raises(V.AuditFailed):
        release_corpus(
            spark,
            "/root/testdata/sf0.001",
            table,
            extra_checks=[Q.satisfies("impossible", F.col("n_tokens") > 10_000)],
        )
    assert V.current_version(table) == v1
    assert V.read_table(spark, table).count() == n1
