"""Round-3 continuation operators: containment dedup, lexical diversity,
Zipf fit, deterministic shard assignment, PSI drift. Semantic tests on
hand-built frames (the registry oracle tests cover cross-engine parity)."""

import math

from pyspark.sql import functions as F

from etl_pipeline_for_retail_sales_data_spark.operators.dedup import containment_pairs
from etl_pipeline_for_retail_sales_data_spark.operators.drift import psi_drift
from etl_pipeline_for_retail_sales_data_spark.operators.layout import shard_assignment
from etl_pipeline_for_retail_sales_data_spark.operators.text import (
    token_diversity,
    zipf_fit,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ---------------------------------------------------------------------------
# containment_pairs
# ---------------------------------------------------------------------------


def test_containment_flags_subsumed_doc_jaccard_misses(spark):
    """A short quote embedded verbatim in a long article: containment from
    the quote's side is 1.0 (every quote shingle appears in the article)
    while Jaccard is far below any dedup threshold — the case this
    operator exists for."""
    quote = "alpha beta gamma delta epsilon"
    article = (
        "intro words before the quote alpha beta gamma delta epsilon "
        "then a long unrelated tail one two three four five six seven "
        "eight nine ten eleven twelve thirteen fourteen fifteen"
    )
    out = containment_pairs(
        _docs(spark, [(1, quote), (2, article)]), threshold=0.9
    ).collect()
    pairs = {(r.doc_a, r.doc_b): r for r in out}
    assert (1, 2) in pairs
    assert pairs[(1, 2)].containment == 1.0
    # the article is NOT contained in the quote
    assert (2, 1) not in pairs


def test_containment_is_directed_and_thresholded(spark):
    a = "one two three four five six seven eight nine ten"
    b = "one two three four five six seven eight nine ten extra tail words here"
    out = containment_pairs(_docs(spark, [(1, a), (2, b)]), threshold=0.5).collect()
    d = {(r.doc_a, r.doc_b): r.containment for r in out}
    assert d[(1, 2)] == 1.0  # all 8 shingles of a appear in b
    assert 0.5 <= d[(2, 1)] < 1.0  # b has extra shingles


# ---------------------------------------------------------------------------
# token_diversity
# ---------------------------------------------------------------------------


def test_token_diversity_degenerate_and_uniform(spark):
    out = {
        r.doc_id: r
        for r in token_diversity(
            _docs(spark, [(1, "a a a a"), (2, "a b c d"), (3, None)])
        ).collect()
    }
    r1 = out[1]
    assert (r1.n_tokens, r1.n_distinct) == (4, 1)
    assert r1.simpson == 1.0 and r1.entropy == 0.0 and r1.low_diversity
    r2 = out[2]
    assert (r2.n_tokens, r2.n_distinct) == (4, 4)
    assert r2.simpson == 0.25 and not r2.low_diversity
    assert abs(r2.entropy - math.log(4)) < 1e-3
    assert 3 not in out  # null text dropped at the boundary


def test_token_diversity_flag_is_exact_integer_decision(spark):
    # 3 of one token + 2 distinct: ss = 9+1+1 = 11, n^2 = 25 -> 2*11 < 25
    # 4 of one token + 1 distinct: ss = 16+1 = 17, n^2 = 25 -> 2*17 > 25
    out = {
        r.doc_id: r.low_diversity
        for r in token_diversity(
            _docs(spark, [(1, "x x x y z"), (2, "x x x x y")])
        ).collect()
    }
    assert out == {1: False, 2: True}


# ---------------------------------------------------------------------------
# zipf_fit
# ---------------------------------------------------------------------------


def test_zipf_fit_matches_closed_form_ols(spark):
    """Pin the Spark result against a plain-Python OLS on the identical
    floored ln terms (semantic reference, not just cross-engine echo)."""
    # vocabulary with frequencies 8,4,2,1 -> ranks 1..4
    text_rows = [(1, " ".join(["w1"] * 8 + ["w2"] * 4 + ["w3"] * 2 + ["w4"]))]
    row = zipf_fit(_docs(spark, text_rows)).collect()[0]
    f6 = lambda v: math.floor(v * 1e6 + 0.5) / 1e6
    xs = [f6(math.log(r)) for r in (1, 2, 3, 4)]
    ys = [f6(math.log(c)) for c in (8, 4, 2, 1)]
    k = 4
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    slope = (k * sxy - sx * sy) / (k * sxx - sx * sx)
    assert row.n_terms == 4 and row.n_tokens == 15
    assert row.zipf_slope == math.floor(slope * 1e4 + 0.5) / 1e4
    assert row.zipf_slope < -0.9  # geometric frequencies are steeper than Zipf


def test_zipf_fit_single_term_vocab_yields_null_slope(spark):
    row = zipf_fit(_docs(spark, [(1, "solo solo solo")])).collect()[0]
    assert row.n_terms == 1 and row.n_tokens == 3
    assert row.zipf_slope is None and row.zipf_intercept is None


# ---------------------------------------------------------------------------
# shard_assignment
# ---------------------------------------------------------------------------


def test_shard_assignment_is_a_balanced_contiguous_permutation(spark):
    n, k = 103, 8
    df = spark.range(n).withColumnRenamed("id", "doc_id")
    out = shard_assignment(df, n_shards=k).collect()
    assert sorted(r.global_pos for r in out) == list(range(n))
    by_shard = {}
    for r in out:
        by_shard.setdefault(r.shard_id, []).append(r.global_pos)
    assert set(by_shard) == set(range(k))
    # contiguous: every shard owns an unbroken global_pos range
    ranges = sorted((min(v), max(v), len(v)) for v in by_shard.values())
    for lo, hi, cnt in ranges:
        assert hi - lo + 1 == cnt
    # balanced: floor(pos*k/n) sizes differ by at most 1
    sizes = sorted(len(v) for v in by_shard.values())
    assert sizes[-1] - sizes[0] <= 1


def test_shard_assignment_deterministic_and_insertion_stable_order(spark):
    df = spark.range(50).withColumnRenamed("id", "doc_id")
    a = {r.doc_id: (r.global_pos, r.shard_id) for r in shard_assignment(df).collect()}
    b = {
        r.doc_id: (r.global_pos, r.shard_id)
        for r in shard_assignment(df.repartition(7)).collect()
    }
    assert a == b  # partitioning-independent
    # md5 order: relative order of surviving ids is stable under subsets
    sub = shard_assignment(df.filter(F.col("doc_id") < 25)).collect()
    full_order = [i for i, _ in sorted(a.items(), key=lambda kv: kv[1][0]) if i < 25]
    sub_order = [r.doc_id for r in sorted(sub, key=lambda r: r.global_pos)]
    assert full_order == sub_order


# ---------------------------------------------------------------------------
# psi_drift
# ---------------------------------------------------------------------------


def _periods(spark, rows):
    return spark.createDataFrame(rows, "p int, cat string")


def test_psi_zero_on_identical_mix_and_flags_large_shift(spark):
    stable = [(1, c) for c in ["a"] * 50 + ["b"] * 50] + [
        (2, c) for c in ["a"] * 50 + ["b"] * 50
    ]
    out = psi_drift(_periods(spark, stable), F.col("p"), F.col("cat")).collect()
    assert len(out) == 1
    assert out[0].psi == 0.0 and not out[0].drift

    shifted = [(1, c) for c in ["a"] * 90 + ["b"] * 10] + [
        (2, c) for c in ["a"] * 10 + ["b"] * 90
    ]
    row = psi_drift(_periods(spark, shifted), F.col("p"), F.col("cat")).collect()[0]
    # textbook PSI for 0.9/0.1 -> 0.1/0.9: 2 * 0.8 * ln(9) ~ 3.515
    assert abs(row.psi - 2 * 0.8 * math.log(9)) < 1e-3
    assert row.drift and row.n_categories == 2


def test_psi_moderate_shift_below_threshold(spark):
    mild = [(1, c) for c in ["a"] * 52 + ["b"] * 48] + [
        (2, c) for c in ["a"] * 48 + ["b"] * 52
    ]
    row = psi_drift(_periods(spark, mild), F.col("p"), F.col("cat")).collect()[0]
    assert 0.0 < row.psi < 0.2 and not row.drift


# ---------------------------------------------------------------------------
# embedding_drift
# ---------------------------------------------------------------------------


def _vecs(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>, grp boolean")


def test_embedding_mmd_zero_on_identical_cohorts(spark):
    from etl_pipeline_for_retail_sales_data_spark.operators.drift import embedding_drift

    rows = [(i, [0.5, -0.25, 1.0], i % 2 == 0) for i in range(20)]
    out = embedding_drift(_vecs(spark, rows), F.col("grp")).collect()[0]
    assert (out.n_a, out.n_b, out.n_dims) == (10, 10, 3)
    assert out.mmd2_q == 0.0 and not out.drift


def test_embedding_mmd_flags_planted_shift_and_names_the_dim(spark):
    from etl_pipeline_for_retail_sales_data_spark.operators.drift import embedding_drift

    # cohort B shifted by +2.0 in dimension 2 only: per-dim quantized mean
    # diff = 2000, term = 4e6 in quantized units
    rows = [(i, [0.1, 0.1, 0.1], True) for i in range(10)] + [
        (100 + i, [0.1, 2.1, 0.1], False) for i in range(10)
    ]
    out = embedding_drift(_vecs(spark, rows), F.col("grp")).collect()[0]
    assert out.drift and out.top_dim == 2
    assert abs(out.top_term - 4_000_000.0) < 1.0
    assert abs(out.mmd2_q - 4_000_000.0) < 1.0


# ---------------------------------------------------------------------------
# contrastive_triplets
# ---------------------------------------------------------------------------


def test_contrastive_triplets_invariants(spark):
    from etl_pipeline_for_retail_sales_data_spark.operators.dedup import (
        contrastive_triplets,
    )

    docs = _docs(
        spark,
        [(i, f"unique tokens number {i} alpha beta gamma {i}") for i in range(30)],
    )
    pairs = spark.createDataFrame([(1, 2), (3, 4)], "doc_a long, doc_b long")
    out = contrastive_triplets(docs, pairs, k=3).collect()
    dup = {(1, 2), (2, 1), (3, 4), (4, 3)}
    for r in out:
        assert r.negative != r.anchor and r.negative != r.positive
        assert (r.anchor, r.negative) not in dup
        assert 0 <= r.slot < 3
    # near-full slots: 2 anchors x 3 slots, collisions are the only loss
    assert len(out) >= 4
    # deterministic across reruns and partitionings
    again = contrastive_triplets(docs.repartition(5), pairs, k=3).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


# ---------------------------------------------------------------------------
# distributed_rank
# ---------------------------------------------------------------------------


def test_distributed_rank_equals_global_order(spark):
    from etl_pipeline_for_retail_sales_data_spark.operators.windows import (
        distributed_rank,
    )

    df = spark.createDataFrame(
        [(i, (i * 37) % 100) for i in range(500)], "id long, v long"
    )
    out = distributed_rank(
        df, [F.col("v"), F.col("id")], rank_col="r", num_partitions=8
    ).collect()
    expected = {
        row_id: r
        for r, (row_id, _) in enumerate(
            sorted(((x.id, x.v) for x in out), key=lambda t: (t[1], t[0]))
        )
    }
    got = {x.id: x.r for x in out}
    assert got == expected
    assert sorted(x.r for x in out) == list(range(500))


def test_distributed_rank_descending_and_few_rows(spark):
    from etl_pipeline_for_retail_sales_data_spark.operators.windows import (
        distributed_rank,
    )

    df = spark.createDataFrame([(1, 5.0), (2, 9.0), (3, 5.0)], "id long, q double")
    out = {
        x.id: x.r
        for x in distributed_rank(
            df, [F.col("q").desc(), F.col("id")], rank_col="r", num_partitions=16
        ).collect()
    }
    assert out == {2: 0, 1: 1, 3: 2}


# ---------------------------------------------------------------------------
# pretokenize plan (packed sequences)
# ---------------------------------------------------------------------------


def test_packed_sequences_conserve_tokens_and_fill_exactly(spark):
    from etl_pipeline_for_retail_sales_data_spark.plans.pretokenize import (
        packed_sequences,
    )

    docs = _docs(
        spark,
        [(i, " ".join(f"w{(i * 7 + j) % 13}" for j in range(5 + i % 9))) for i in range(40)],
    )
    L, K = 32, 4
    out = packed_sequences(docs, seq_len=L, n_shards=K).collect()
    total_tokens = sum(5 + i % 9 for i in range(40))
    # conservation: every token lands in exactly one sequence
    assert sum(r.n_tokens for r in out) == total_tokens
    # exact fill: all sequences full except the last
    seqs = sorted(out, key=lambda r: r.seq_id)
    assert [r.seq_id for r in seqs] == list(range(len(seqs)))
    for r in seqs[:-1]:
        assert r.n_tokens == L, r
    assert 0 < seqs[-1].n_tokens <= L
    # round-robin shards
    for r in seqs:
        assert r.shard_id == r.seq_id % K


def test_packed_sequences_bpe_mode_runs_and_conserves(spark):
    from etl_pipeline_for_retail_sales_data_spark.operators.bpe import (
        bpe_encode,
        bpe_train,
    )
    from etl_pipeline_for_retail_sales_data_spark.plans.pretokenize import (
        packed_sequences,
    )

    docs = _docs(
        spark,
        [(i, "lower flower flow low " * (1 + i % 3)) for i in range(12)],
    )
    merges = bpe_train(docs, n_merges=10)
    assert merges  # the repeated corpus yields real merges
    n_bpe = bpe_encode(docs, merges).count()
    out = packed_sequences(docs, seq_len=16, n_shards=2, merges=merges).collect()
    assert sum(r.n_tokens for r in out) == n_bpe
    for r in sorted(out, key=lambda x: x.seq_id)[:-1]:
        assert r.n_tokens == 16


# --- round 9: corpus statistics (PMI, source divergence, Heaps) -----------


def test_pmi_pairs_hand_computed(spark):
    """Known-answer anchor for the differential oracle: corpus of one
    doc 'x y x y' with window 3. Pairs (unordered, offsets 1-3):
    d=1: (x,y),(x,y),(x,y); d=2: (x,x),(y,y); d=3: (x,y). So
    n(x,y)=4, n(x,x)=1, n(y,y)=1, |D|=6; marg(x)=4+2*1=6, marg(y)=6.
    PMI(x,y)=ln(4*6/36)=ln(2/3); self-pairs ln(6/36)=ln(1/6)."""
    import math

    from etl_pipeline_for_retail_sales_data_spark.operators.text import pmi_pairs

    docs = spark.createDataFrame([(1, "x y x y")], "doc_id long, text string")
    got = {
        (r.tok_a, r.tok_b): (r.n_pair, r.pmi)
        for r in pmi_pairs(docs, min_count=1, top=10).collect()
    }
    assert got[("x", "y")][0] == 4
    assert abs(got[("x", "y")][1] - math.log(2 / 3)) < 2e-4
    assert got[("x", "x")][0] == 1
    assert abs(got[("x", "x")][1] - math.log(1 / 6)) < 2e-4
    # ranking: the positive-association pair outranks the self-pairs
    top = pmi_pairs(docs, min_count=1, top=1).collect()[0]
    assert (top.tok_a, top.tok_b) == ("x", "y")


def test_source_token_divergence_identical_and_disjoint(spark):
    """TVD/JSD extremes: identical token mixes -> 0/0; disjoint
    vocabularies -> TVD 1.0 and JSD ln 2 (the JS upper bound)."""
    import math

    from etl_pipeline_for_retail_sales_data_spark.operators.text import (
        source_token_divergence,
    )

    same = spark.createDataFrame(
        [(1, "a b c", "s1"), (2, "a b c", "s2")],
        "doc_id long, text string, source string",
    )
    r = source_token_divergence(same).collect()[0]
    assert r.tvd == 0.0 and r.jsd == 0.0
    assert r.vocab_union == 3 and r.n_tokens_a == 3

    disj = spark.createDataFrame(
        [(1, "a a b", "s1"), (2, "c d d", "s2")],
        "doc_id long, text string, source string",
    )
    d = source_token_divergence(disj).collect()[0]
    assert d.tvd == 1.0
    assert abs(d.jsd - math.log(2)) < 2e-4
    # fewer than two sources: empty result, stable schema
    one = spark.createDataFrame([(1, "a", "s1")], "doc_id long, text string, source string")
    assert source_token_divergence(one).count() == 0


def test_heaps_fit_monotone_vocab_and_exact_counts(spark):
    """Heaps fit on a stream whose vocabulary growth is known exactly:
    doc i contributes tokens {t0..t_i} (one new type per doc). n_vocab
    equals the true type count and beta lands in (0, 1)."""
    from etl_pipeline_for_retail_sales_data_spark.operators.text import heaps_fit

    rows = [(i, " ".join(f"t{j}" for j in range(i + 1))) for i in range(24)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    r = heaps_fit(docs).collect()[0]
    assert r.n_tokens == sum(range(1, 25)) == 300
    assert r.n_vocab == 24
    assert r.n_checkpoints == 9  # 2,4,...,256 plus N=300
    assert 0.0 < r.heaps_beta < 1.0

    empty = spark.createDataFrame([], "doc_id long, text string")
    e = heaps_fit(empty).collect()[0]
    assert e.n_tokens == 0 and e.n_vocab == 0 and e.heaps_beta is None


def test_regexp_count_equals_extract_all_size(spark, sf_smoke):
    """r12: heaps_fit's probe 2 counts tokens via regexp_count instead of
    size(regexp_extract_all(...)) — the two must agree on every document
    (same regex engine, same non-overlapping match semantics), including
    empty and punctuation-only texts."""
    from pyspark.sql import functions as F

    from etl_pipeline_for_retail_sales_data_spark.operators.text import TOKEN_RE
    from etl_pipeline_for_retail_sales_data_spark.sources.readers import load_table

    docs = load_table(spark, sf_smoke, "documents").unionByName(
        spark.createDataFrame(
            [(9001, ""), (9002, "   "), (9003, "!.,;"), (9004, "one  two\tthree")],
            "doc_id long, text string",
        ),
        allowMissingColumns=True,
    )
    bad = (
        docs.na.drop(subset=["text"])
        .select(
            F.size(
                F.regexp_extract_all(F.lower(F.col("text")), F.lit(TOKEN_RE), 0)
            ).alias("a"),
            F.regexp_count(F.lower(F.col("text")), F.lit(TOKEN_RE)).alias("b"),
        )
        .filter("a != b")
        .count()
    )
    assert bad == 0
