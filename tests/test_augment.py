"""Span-corruption spec (T5 denoising) semantics: block-grid
non-overlap, in-range lengths, determinism, and the expected corruption
rate at the 20/5 defaults."""

from pyspark.sql import functions as F

from etl_pipeline_for_retail_sales_data_spark.operators.augment import (
    span_corruption_report,
    span_corruption_spec,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_spans_fit_blocks_and_never_overlap(spark):
    text = " ".join(f"w{i}" for i in range(100))  # 5 full blocks
    docs = _docs(spark, [(1, text), (2, "short doc under one block")])
    spec = span_corruption_spec(docs).collect()
    by_doc = {}
    for r in spec:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert 2 not in by_doc  # < 20 tokens: no blocks, no spans
    spans = sorted(by_doc[1], key=lambda r: r.span_start)
    assert len(spans) == 5  # one per block
    for r in spans:
        blk = r.sentinel_id
        assert blk * 20 <= r.span_start <= blk * 20 + 15
        assert 1 <= r.span_len <= 5
        assert r.span_start + r.span_len <= (blk + 1) * 20  # stays in block
    for a, b in zip(spans, spans[1:]):
        assert a.span_start + a.span_len <= b.span_start  # non-overlap


def test_spec_is_deterministic_and_rate_near_target(spark):
    docs = _docs(
        spark, [(i, " ".join(f"t{i}x{j}" for j in range(200))) for i in range(30)]
    )
    a = sorted(map(tuple, span_corruption_spec(docs).collect()))
    b = sorted(map(tuple, span_corruption_spec(docs).collect()))
    assert a == b  # hash-derived: no RNG state anywhere
    rep = span_corruption_report(docs).collect()
    total = sum(r.n_tokens for r in rep)
    masked = sum(r.masked_tokens for r in rep)
    # expected rate = (1 + 4/2)/20 = 15%; 6000 tokens -> tight-ish CI
    assert 0.10 <= masked / total <= 0.20
    for r in rep:
        assert r.n_sentinels == 10  # 200 tokens = 10 blocks


def test_fim_spec_partition_invariants(spark):
    from etl_pipeline_for_retail_sales_data_spark.operators.augment import fim_spec

    docs = spark.createDataFrame(
        [(i, "tok " * (5 + i)) for i in range(40)] + [(99, ""), (100, None)],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in fim_spec(docs).collect()}
    assert len(rows) == 42
    for r in rows.values():
        # the three segments always reassemble the document exactly
        assert r["prefix_len"] + r["middle_len"] + r["suffix_len"] == r["n_tokens"]
        assert min(r["prefix_len"], r["middle_len"], r["suffix_len"]) >= 0
        if r["fim"]:
            assert r["mode"] in ("psm", "spm")
            assert r["out_tokens"] == r["n_tokens"] + 3  # three sentinels
        else:
            assert r["mode"] == "ar"
            assert (r["prefix_len"], r["middle_len"], r["suffix_len"]) == (
                r["n_tokens"], 0, 0,
            )
            assert r["out_tokens"] == r["n_tokens"]
    # the gate holds roughly half the corpus (hash parity), both modes occur
    fims = [r for r in rows.values() if r["fim"]]
    assert 10 <= len(fims) <= 32
    assert {r["mode"] for r in fims} == {"psm", "spm"}
    # empty/null docs degrade to zero-length segments
    assert rows[99]["n_tokens"] == 0 and rows[100]["n_tokens"] == 0
    # determinism: a second run is identical
    again = {r["doc_id"]: r for r in fim_spec(docs).collect()}
    assert again == rows
