"""Semantic tests for operators/selection.py (LM-perplexity gate + DSIR).

The registry oracles prove cross-engine agreement; these pin the
SEMANTICS on hand-built corpora where the right answer is known
(NOTES.md: an oracle match can't catch a formula that's wrong the same
way on both engines).
"""

import pytest
from pyspark.sql import functions as F

from etl_pipeline_for_retail_sales_data_spark.operators.selection import (
    bigram_lm_perplexity,
    dsir_importance,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


@pytest.fixture(scope="module")
def corpus(spark):
    # 8 docs of a repetitive "common" phrase, one doc of unique gibberish
    rows = [(i, "the cat sat on the mat " * 4, "en") for i in range(8)]
    rows.append((8, "zq xv qj vz jx qx zj vq xq jv", "xx"))
    rows.append((9, "a", "en"))  # single token: no bigrams
    return _docs(spark, rows)


def test_perplexity_tail_is_the_unusual_doc(corpus):
    out = bigram_lm_perplexity(corpus, tail_quantile=0.8).collect()
    by_id = {r["doc_id"]: r for r in out}
    # gibberish doc has strictly the highest NLL and is flagged
    assert by_id[8]["nll"] == max(r["nll"] for r in out if r["n_bigrams"] > 0)
    assert by_id[8]["flagged"]
    # the repeated-phrase docs are the low-perplexity head
    assert not any(by_id[i]["flagged"] for i in range(8))
    # no-bigram doc degrades to zeros, unflagged
    assert by_id[9]["n_bigrams"] == 0 and by_id[9]["nll"] == 0.0
    assert not by_id[9]["flagged"]


def test_perplexity_common_phrase_scores_below_rare(spark):
    # doc 0..3 share a phrase; doc 4 shares no bigram with anyone else,
    # so every one of its bigrams has count 1 -> max smoothing penalty
    rows = [(i, "alpha beta gamma delta", "en") for i in range(4)]
    rows.append((4, "omega psi chi phi", "en"))
    out = {r["doc_id"]: r["nll"] for r in bigram_lm_perplexity(_docs(spark, rows)).collect()}
    assert out[4] > out[0]
    assert len({out[i] for i in range(4)}) == 1  # identical docs, identical score


def test_dsir_prefers_target_like_docs(spark):
    # target = lang 'tg'; its vocabulary is disjoint from the rest
    rows = [(i, "tea leaf brew steep pot", "tg") for i in range(5)]
    rows += [(10 + i, "iron coal forge anvil smelt", "xx") for i in range(5)]
    # a raw-pool doc written in target vocabulary must outrank raw-vocab docs
    rows.append((99, "tea leaf brew steep pot", "xx"))
    out = dsir_importance(
        _docs(spark, rows), F.col("lang") == "tg", keep_quantile=0.5
    ).collect()
    w = {r["doc_id"]: r["log_weight"] for r in out}
    keep = {r["doc_id"]: r["keep"] for r in out}
    assert w[99] > w[10]
    assert w[99] == w[0]  # same text => same weight regardless of label
    assert keep[99] and not keep[10]


def test_dsir_empty_target_degrades(spark):
    rows = [(i, "one two three", "en") for i in range(3)]
    out = dsir_importance(_docs(spark, rows), F.col("lang") == "zz").collect()
    # no target docs: weights all equal (pure smoothing) => every doc
    # ties at the cut and boundary-inclusive keep retains all; no crash
    assert len(out) == 3
    assert len({r["log_weight"] for r in out}) == 1
    assert all(r["keep"] for r in out)


def test_selection_handles_null_text(spark):
    rows = [(0, "solid text here", "en"), (1, None, "en")]
    ppl = {r["doc_id"]: r for r in bigram_lm_perplexity(_docs(spark, rows)).collect()}
    dsr = {r["doc_id"]: r for r in dsir_importance(_docs(spark, rows), F.lit(True)).collect()}
    assert ppl[1]["n_bigrams"] == 0 and not ppl[1]["flagged"]
    assert dsr[1]["n_tokens"] == 0


def test_hashed_classifier_semantics(spark):
    from etl_pipeline_for_retail_sales_data_spark.operators.selection import (
        hashed_linear_classifier,
    )

    docs = _docs(
        spark,
        [
            (0, "spark merge join", "en"),
            (1, "spark merge join", "en"),  # identical text -> identical score
            (2, "SPARK MERGE JOIN", "en"),  # case-folded -> identical score
            (3, "", "en"),  # empty: neutral
        ],
    )
    out = {r["doc_id"]: r for r in hashed_linear_classifier(docs).collect()}
    assert out[0]["margin"] == out[1]["margin"] == out[2]["margin"]
    assert out[0]["prob"] == out[1]["prob"] == out[2]["prob"]
    assert out[3]["n_tokens"] == 0 and out[3]["margin"] == 0.0
    assert out[3]["prob"] == 0.5 and not out[3]["keep"]
    # keep is the exact-integer margin sign, consistent with the float
    for r in out.values():
        assert r["keep"] == (r["margin"] > 0) or r["margin"] == 0.0
    # fast-sigmoid is monotone in margin and bounded
    rs = sorted(out.values(), key=lambda r: r["margin"])
    probs = [r["prob"] for r in rs]
    assert probs == sorted(probs)
    assert all(0.0 <= p <= 1.0 for p in probs)


def test_hashed_classifier_is_map_only(spark):
    from etl_pipeline_for_retail_sales_data_spark.operators.selection import (
        hashed_linear_classifier,
    )

    docs = _docs(spark, [(0, "a b c", "en")])
    plan = hashed_linear_classifier(docs)._jdf.queryExecution().executedPlan().toString()
    # one narrow projection: no shuffle, no join, no Python stage
    assert "Exchange" not in plan
    assert "Join" not in plan
    assert "Python" not in plan


def test_quantile_normalize_endpoints_and_monotone(spark):
    from etl_pipeline_for_retail_sales_data_spark.operators.selection import (
        quantile_normalize,
    )

    # quality is monotone in token count here (no stopwords/punct), so
    # ranks are fully controlled: source A = short docs, B = long docs
    rows = [(i, "tok " * (i + 1), "en", "A") for i in range(5)]
    rows += [(10 + i, "tok " * (20 + 5 * i), "en", "B") for i in range(5)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")
    out = quantile_normalize(docs).collect()
    assert len(out) == 10
    quals = sorted(r["quality"] for r in out)
    by_src = {}
    for r in out:
        by_src.setdefault(r["source"], []).append(r)
    for src, rs in by_src.items():
        rs.sort(key=lambda r: r["src_rank"])
        # endpoints: lowest rank -> global min, highest rank -> global max
        assert rs[0]["norm_quality"] == quals[0]
        assert rs[-1]["norm_quality"] == quals[-1]
        # monotone remap, values drawn from the global score multiset
        nq = [r["norm_quality"] for r in rs]
        assert nq == sorted(nq)
        assert all(q in quals for q in nq)
    # the two sources now share a scale: same normalized value sets
    assert [r["norm_quality"] for r in by_src["A"]] == [
        r["norm_quality"] for r in by_src["B"]
    ]


def test_quantile_normalize_single_doc_source_maps_to_median(spark):
    from etl_pipeline_for_retail_sales_data_spark.operators.selection import (
        quantile_normalize,
    )

    rows = [(i, "tok " * (i + 1), "en", "A") for i in range(8)]
    rows.append((99, "tok tok tok", "en", "B"))  # n_src=1
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")
    out = {r["doc_id"]: r for r in quantile_normalize(docs).collect()}
    quals = sorted(r["quality"] for r in out.values())
    # a single-doc source lands on the global median score: idx0=(N-1)//2
    assert out[99]["n_src"] == 1
    assert out[99]["norm_quality"] == quals[(len(quals) - 1) // 2]


def test_hashed_classifier_null_text_degrades_neutral(spark):
    from etl_pipeline_for_retail_sales_data_spark.operators.selection import (
        hashed_linear_classifier,
    )

    docs = _docs(spark, [(0, None, "en"), (1, "spark join", "en")])
    out = {r["doc_id"]: r for r in hashed_linear_classifier(docs).collect()}
    assert out[0]["n_tokens"] == 0 and out[0]["margin"] == 0.0
    assert out[0]["prob"] == 0.5 and not out[0]["keep"]


def test_temperature_mixture_flattens_distribution(spark):
    from etl_pipeline_for_retail_sales_data_spark.queries_registry import QUERIES

    import os
    import tempfile

    # 90/10 two-language corpus: temperature 0.5 must pull shares toward
    # the middle — the big language shrinks, the small one grows, order kept
    rows = [(i, "tok tok tok", "big", "s") for i in range(90)]
    rows += [(100 + i, "tok tok tok", "small", "s") for i in range(10)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")
    with tempfile.TemporaryDirectory() as d:
        docs.write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
        out = {r["lang"]: r for r in QUERIES["temperature_mixture_weights"](spark, d).collect()}
    assert out["big"]["raw_share"] == 0.9 and out["small"]["raw_share"] == 0.1
    assert 0.5 < out["big"]["temp_share"] < 0.9
    assert 0.1 < out["small"]["temp_share"] < 0.5
    assert abs(out["big"]["temp_share"] + out["small"]["temp_share"] - 1.0) < 1e-5
    # integer targets never exceed the corpus and preserve the order
    assert out["big"]["target_docs"] + out["small"]["target_docs"] <= 100
    assert out["big"]["target_docs"] > out["small"]["target_docs"]
