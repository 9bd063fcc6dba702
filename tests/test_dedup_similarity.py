"""Property tests for the non-SQL-expressible ops (simhash, ANN-LSH) and
sanity checks on the dedup family."""

import pytest
from pyspark.sql import functions as F

from etl_pipeline_for_retail_sales_data_spark.operators import dedup as D
from etl_pipeline_for_retail_sales_data_spark.operators import similarity as SIM


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup_finds_copies(spark):
    docs = _docs(
        spark,
        [(1, "alpha beta gamma"), (2, "alpha beta gamma"), (3, "delta epsilon zeta")],
    )
    out = {r.canonical_doc_id: r.n_copies for r in D.doc_dedup_exact(docs).collect()}
    assert out == {1: 2, 3: 1}


def test_jaccard_identical_docs_is_one(spark):
    docs = _docs(
        spark,
        [(1, "a b c d e f g h"), (2, "a b c d e f g h"), (3, "x y z w v u t s")],
    )
    pairs = D.ngram_jaccard_pairs(docs, threshold=0.5).collect()
    assert len(pairs) == 1
    assert pairs[0].doc_a == 1 and pairs[0].doc_b == 2
    assert pairs[0].jaccard == 1.0


def test_minhash_identical_docs_full_match(spark):
    docs = _docs(
        spark,
        [(1, "a b c d e f g h"), (2, "a b c d e f g h"), (3, "x y z w v u t s")],
    )
    cands = D.minhash_candidates(docs).collect()
    exact = [c for c in cands if c.doc_a == 1 and c.doc_b == 2]
    assert len(exact) == 1 and exact[0].n_equal == 16 and exact[0].est_jaccard == 1.0


def test_simhash_similar_docs_close(spark):
    base = "the quick brown fox jumps over the lazy dog " * 5
    docs = _docs(
        spark,
        [
            (1, base),
            (2, base + "extra token"),  # near-dup
            (3, "completely different content about spark engines and parquet files"),
        ],
    )
    sigs = {r.doc_id: r.simhash for r in D.simhash_64(docs).collect()}

    def hamming(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    assert hamming(sigs[1], sigs[2]) < hamming(sigs[1], sigs[3])
    assert hamming(sigs[1], sigs[2]) <= 8


def test_ann_lsh_recall_vs_bruteforce(spark, sf_smoke):
    """LSH with 8 planes must recover a reasonable fraction of the true
    top-5 (recall depends on bucket collisions; assert a floor)."""
    from etl_pipeline_for_retail_sales_data_spark.queries_registry import QUERIES

    exact = QUERIES["knn_bruteforce"](spark, sf_smoke).collect()
    approx = QUERIES["ann_lsh"](spark, sf_smoke).collect()
    truth = {(r.q_id, r.neighbor_id) for r in exact}
    found = {(r.q_id, r.neighbor_id) for r in approx}
    recall = len(truth & found) / len(truth)
    assert recall >= 0.2, f"LSH recall {recall} collapsed"
    # every LSH result scores correctly (subset check against cosine order)
    assert all(r.rnk >= 1 for r in approx)


def test_multimodal_stub_raises(spark):
    from etl_pipeline_for_retail_sales_data_spark.operators import multimodal as MM

    docs = _docs(spark, [(1, "hello world")])
    media = MM.attach_binary(docs)
    with pytest.raises(Exception, match="NotImplementedError|media decode"):
        MM.decode_media(media).collect()
