"""Unit tests for the round-3 repetition filters and cross-doc n-gram scrub
(operators/text.repetition_stats, crossdoc_ngram_scrub) on crafted corpora
where the expected output is hand-computable."""

from pyspark.sql import Row

from etl_pipeline_for_retail_sales_data_spark.operators.text import (
    crossdoc_ngram_scrub,
    repetition_stats,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_repetition_stats_hand_computed(spark):
    # "a b a b a b": 6 tokens, bigrams: ab ba ab ba ab -> top "a b" x3
    # 3-grams: aba bab aba bab -> all 4 occurrences duplicated
    df = _docs(spark, ["a b a b a b"])
    row = repetition_stats(df).collect()[0]
    assert row.n_tokens == 6
    assert row.top_bigram_count == 3
    assert abs(row.top_bigram_frac - 1.0) < 1e-9  # 2*3/6
    assert abs(row.dup_3gram_frac - 1.0) < 1e-9


def test_repetition_stats_no_repeats_and_tiny_doc(spark):
    df = _docs(spark, ["w x y z", "solo"])
    rows = {r.doc_id: r for r in repetition_stats(df).collect()}
    # unique bigrams: max count 1 -> frac 2/4
    assert rows[0].top_bigram_count == 1
    assert abs(rows[0].top_bigram_frac - 0.5) < 1e-9
    assert rows[0].dup_3gram_frac == 0.0
    # 1 token: no bigrams/3-grams at all
    assert rows[1].top_bigram_count == 0
    assert rows[1].top_bigram_frac == 0.0
    assert rows[1].dup_3gram_frac == 0.0


def test_crossdoc_scrub_removes_shared_run_keeps_unique(spark):
    shared = "one two three four five six seven eight"  # exactly 8 tokens
    docs = [
        f"alpha beta {shared} gamma",
        f"delta {shared} epsilon zeta",
        "totally unrelated text with no duplicate run at all",
    ]
    out = {r.doc_id: r for r in crossdoc_ngram_scrub(_docs(spark, docs), n=8).collect()}
    assert out[0].n_scrubbed == 8
    assert out[0].scrubbed_text == "alpha beta gamma"
    assert out[1].n_scrubbed == 8
    assert out[1].scrubbed_text == "delta epsilon zeta"
    assert out[2].n_scrubbed == 0
    assert out[2].scrubbed_text == docs[2].lower()


def test_crossdoc_scrub_fully_covered_doc_stays_with_empty_text(spark):
    run = "t1 t2 t3 t4 t5 t6 t7 t8"
    out = {r.doc_id: r for r in crossdoc_ngram_scrub(_docs(spark, [run, run]), n=8).collect()}
    for i in (0, 1):
        assert out[i].n_tokens == 8
        assert out[i].n_scrubbed == 8
        assert out[i].scrubbed_text == ""


def test_crossdoc_scrub_overlapping_shared_grams_union_coverage(spark):
    # 9-token shared run -> two overlapping shared 8-grams; coverage is the
    # UNION (9 positions), not 16.
    run = "u1 u2 u3 u4 u5 u6 u7 u8 u9"
    docs = [f"{run} tailx", f"heady {run}"]
    out = {r.doc_id: r for r in crossdoc_ngram_scrub(_docs(spark, docs), n=8).collect()}
    assert out[0].n_scrubbed == 9
    assert out[0].scrubbed_text == "tailx"
    assert out[1].n_scrubbed == 9
    assert out[1].scrubbed_text == "heady"


def test_repetition_and_scrub_null_text_dropped(spark):
    df = spark.createDataFrame(
        [Row(doc_id=0, text="a b c"), Row(doc_id=1, text=None)],
        "doc_id long, text string",
    )
    assert [r.doc_id for r in repetition_stats(df).collect()] == [0]
    assert [r.doc_id for r in crossdoc_ngram_scrub(df).collect()] == [0]


def test_domain_mixture_sample_exact_ratios(spark):
    from etl_pipeline_for_retail_sales_data_spark.operators.text import domain_mixture_sample

    rows = [Row(doc_id=i, lang="a") for i in range(10)] + [
        Row(doc_id=100 + i, lang="b") for i in range(3)
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = {r.lang: r for r in domain_mixture_sample(df, {"a": 2, "b": 1}, domain_col="lang").collect()}
    # S = min(10/2, 3/1) = 3 -> a keeps floor(3*2)=6, b keeps 3 (2:1 mixture)
    assert out["a"].n_total == 10 and out["a"].n_kept == 6
    assert out["b"].n_total == 3 and out["b"].n_kept == 3
    assert out["b"].kept_digest != "" and out["a"].kept_digest != ""


def test_domain_mixture_sample_deterministic_and_ignores_unknown_domains(spark):
    from etl_pipeline_for_retail_sales_data_spark.operators.text import domain_mixture_sample

    rows = [Row(doc_id=i, lang=["a", "b", "zz"][i % 3]) for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    t = {"a": 1, "b": 1}
    r1 = sorted(domain_mixture_sample(df, t).collect())
    r2 = sorted(domain_mixture_sample(df.repartition(7), t).collect())
    assert r1 == r2  # partitioning-independent selection
    assert {r.lang for r in r1} == {"a", "b"}  # zz not in targets -> excluded
