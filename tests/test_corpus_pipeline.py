"""End-to-end training-corpus pipeline invariants (plans/corpus.py)."""

import pytest

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
