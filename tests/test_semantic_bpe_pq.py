"""Round-3 operators: triangle counting (operators/graph.py), SemDeDup
(operators/clustering.semantic_dedup), product quantization
(operators/pq.py), BPE tokenizer (operators/bpe.py)."""

import pytest

pytestmark = pytest.mark.slow  # heavy sweep: excluded from the fast lane (pytest -m "not slow")

import itertools

from pyspark.sql import functions as F

from etl_pipeline_for_retail_sales_data_spark.operators import graph as G
from etl_pipeline_for_retail_sales_data_spark.operators.bpe import (
    END,
    bpe_encode,
    bpe_token_stats,
    bpe_train,
    word_freq,
)
from etl_pipeline_for_retail_sales_data_spark.operators.clustering import (
    semantic_dedup,
)
from etl_pipeline_for_retail_sales_data_spark.operators.pq import (
    pq_encode,
    pq_search,
    pq_search_rerank,
    pq_train,
)
from etl_pipeline_for_retail_sales_data_spark.operators.similarity import (
    knn_bruteforce_expr,
)


# ---------------------------------------------------------------------------
# Triangles
# ---------------------------------------------------------------------------


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_triangles_known_graph(spark):
    # K4 on {1,2,3,4} (4 triangles) plus a pendant 4-5 and an isolated 6-7
    k4 = list(itertools.combinations([1, 2, 3, 4], 2))
    e = _edges(spark, k4 + [(4, 5), (6, 7)])
    tri = sorted(tuple(r) for r in G.triangles(e).collect())
    assert tri == [(1, 2, 3), (1, 2, 4), (1, 3, 4), (2, 3, 4)]


def test_triangles_direction_and_duplicate_invariant(spark):
    # same triangle expressed with reversed/duplicated/self-loop edges
    e = _edges(spark, [(1, 2), (2, 1), (3, 2), (1, 3), (1, 3), (2, 2)])
    tri = [tuple(r) for r in G.triangles(e).collect()]
    assert tri == [(1, 2, 3)]


def test_triangle_counts_per_node(spark):
    k4 = list(itertools.combinations([1, 2, 3, 4], 2))
    e = _edges(spark, k4 + [(4, 5)])
    counts = {r["id"]: r["n_triangles"] for r in G.triangle_counts(e).collect()}
    # each K4 vertex sits in C(3,2)=3 triangles; the pendant in none
    assert counts == {1: 3, 2: 3, 3: 3, 4: 3}


def test_triangles_empty_and_triangle_free(spark):
    none = _edges(spark, [(1, 2), (2, 3), (3, 4)])  # path: no triangles
    assert G.triangles(none).count() == 0
    empty = spark.createDataFrame([], "src long, dst long")
    assert G.triangles(empty).count() == 0
    assert G.triangle_counts(empty).count() == 0


def test_oriented_edges_bound_hub_fanout(spark):
    # star with hub 0 and leaves 1..20, plus one leaf-leaf edge: under
    # degree orientation the hub receives edges (out-degree 0 or 1), so
    # wedge generation at the hub is O(1), not O(d^2)
    star = [(0, i) for i in range(1, 21)] + [(1, 2)]
    oe = G.oriented_edges(_edges(spark, star))
    out_deg = oe.groupBy("lo").count().collect()
    hub = [r["count"] for r in out_deg if r["lo"] == 0]
    assert hub == []  # the hub is highest-rank: never an edge source
    assert G.triangles(_edges(spark, star)).count() == 1


# ---------------------------------------------------------------------------
# SemDeDup
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def sem_result(spark, sf_smoke):
    emb = spark.read.parquet(f"{sf_smoke}/embeddings.parquet")
    out = semantic_dedup(emb, k=4, iters=2, threshold=0.9).persist()
    out.count()
    return emb, out


def test_semantic_dedup_partitions_input(sem_result):
    emb, out = sem_result
    n = emb.filter(F.col("embedding").isNotNull()).count()
    assert out.count() == n
    assert out.select("vec_id").distinct().count() == n


def test_semantic_dedup_one_keeper_per_component(sem_result):
    _, out = sem_result
    bad = (
        out.groupBy("component_id")
        .agg(F.sum(F.col("keep").cast("long")).alias("nk"), F.min("vec_id").alias("mn"))
        .join(out.filter("keep").select("component_id", F.col("vec_id").alias("kid")),
              "component_id")
        .filter((F.col("nk") != 1) | (F.col("kid") != F.col("mn")))
        .count()
    )
    assert bad == 0


def test_semantic_dedup_dropped_share_component_with_keeper(sem_result):
    _, out = sem_result
    dropped = out.filter(~F.col("keep")).select("component_id").distinct()
    kept = out.filter(F.col("keep")).select("component_id").distinct()
    assert dropped.join(kept, "component_id", "left_anti").count() == 0


def test_semantic_dedup_deterministic(spark, sf_smoke, sem_result):
    emb, out = sem_result
    again = semantic_dedup(emb, k=4, iters=2, threshold=0.9)
    sym_diff = out.exceptAll(again).count() + again.exceptAll(out).count()
    assert sym_diff == 0


def test_semantic_dedup_threshold_one_keeps_everything_distinct(spark):
    # orthogonal unit vectors: no pair reaches cosine 0.99 → all kept
    rows = [(i, [1.0 if j == i else 0.0 for j in range(4)]) for i in range(4)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = semantic_dedup(emb, k=2, iters=1, threshold=0.99)
    assert out.filter("keep").count() == 4


def test_semantic_dedup_near_identical_pair_collapses(spark):
    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.999, 0.001, 0.0, 0.0]),  # near-dup of 1
        (3, [0.0, 1.0, 0.0, 0.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = semantic_dedup(emb, k=1, iters=1, threshold=0.95)
    kept = sorted(r["vec_id"] for r in out.filter("keep").collect())
    assert kept == [1, 3]  # 2 deduped into 1's component, min-id keeper


# ---------------------------------------------------------------------------
# Product quantization
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def pq_parts(spark, sf_smoke):
    emb = spark.read.parquet(f"{sf_smoke}/embeddings.parquet")
    cb = pq_train(emb, m=8, ksub=16, iters=2).persist()
    cb.count()
    codes = pq_encode(emb, cb, m=8).persist()
    codes.count()
    return emb, cb, codes


def test_pq_codebook_shape(pq_parts):
    _, cb, _ = pq_parts
    rows = cb.collect()
    assert {r["sub"] for r in rows} == set(range(8))
    for r in rows:
        assert 0 <= r["code"] < 16
        assert len(r["centroid"]) == 8  # 64 dims / m=8


def test_pq_codes_cover_corpus_with_valid_codes(pq_parts):
    emb, _, codes = pq_parts
    assert codes.count() == emb.filter(F.col("embedding").isNotNull()).count()
    bad = codes.filter(
        (F.size("codes") != 8)
        | F.exists("codes", lambda c: (c < 0) | (c >= 16))
    ).count()
    assert bad == 0


def test_pq_vector_dim_must_divide(spark):
    emb = spark.createDataFrame(
        [(1, [1.0, 2.0, 3.0])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="not divisible"):
        pq_train(emb, m=2, ksub=2, iters=1)


def test_pq_search_deterministic(spark, sf_smoke, pq_parts):
    emb, cb, codes = pq_parts
    qf = F.col("vec_id") < 5
    a = pq_search(emb, qf, k=5, codebooks=cb, codes=codes).collect()
    b = pq_search(emb, qf, k=5, codebooks=cb, codes=codes).collect()
    assert a == b


def test_pq_rerank_recall_beats_floor(spark, sf_smoke):
    emb = spark.read.parquet(f"{sf_smoke}/embeddings.parquet")
    qf = F.col("vec_id") < 10
    exact = knn_bruteforce_expr(emb, qf, k=5).select(
        "q_id", F.col("neighbor_id").alias("tn")
    )
    approx = pq_search_rerank(emb, qf, m=8, ksub=16, iters=2, k=5, n_candidates=50)
    hits = approx.join(
        exact, (approx["q_id"] == exact["q_id"]) & (approx["neighbor_id"] == exact["tn"])
    ).count()
    total = exact.count()
    assert hits / total >= 0.5


def test_pq_rerank_sims_match_exact_for_true_hits(spark, sf_smoke):
    # overlapping (q, neighbor) pairs must carry the identical exact
    # cosine the brute-force path computes (same fold, same rounding)
    emb = spark.read.parquet(f"{sf_smoke}/embeddings.parquet")
    qf = F.col("vec_id") < 5
    exact = knn_bruteforce_expr(emb, qf, k=5).select(
        "q_id", F.col("neighbor_id").alias("nid"), F.col("sim").alias("esim")
    )
    approx = pq_search_rerank(emb, qf, k=5, n_candidates=50).select(
        "q_id", F.col("neighbor_id").alias("nid"), "sim"
    )
    joined = approx.join(exact, ["q_id", "nid"])
    assert joined.filter(F.col("sim") != F.col("esim")).count() == 0


def test_pq_empty_query_set(spark, sf_smoke):
    emb = spark.read.parquet(f"{sf_smoke}/embeddings.parquet")
    out = pq_search(emb, F.col("vec_id") < -1, m=8, ksub=4, iters=1, k=3)
    assert out.count() == 0


# ---------------------------------------------------------------------------
# BPE
# ---------------------------------------------------------------------------


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_bpe_known_corpus_first_merges(spark):
    # "aaab" x3: pairs (a,a) count 6, (a,b</w>) count 3 → first merge
    # (a, a); then (aa, ab</w>)... verify the greedy argmax with ties
    # broken lexicographically on a hand-checkable corpus
    docs = _docs(spark, ["aaab aaab", "aaab"])
    merges = bpe_train(docs, n_merges=3, min_freq=1)
    assert merges[0] == ("a", "a")
    # after merging: ['aa','a','b</w>'] per word → pairs (aa,a)=3, (a,b</w>)=3
    # tie → lexicographic: ('a','b</w>') < ('aa','a')
    assert merges[1] == ("a", "b" + END)


def test_bpe_encode_roundtrips_words(spark):
    docs = _docs(spark, ["hello world hello", "worldly hell"])
    merges = bpe_train(docs, n_merges=10, min_freq=1)
    toks = bpe_encode(docs, merges)
    # per doc: concatenating tokens (stripping the terminal markers)
    # reproduces the document's non-whitespace characters in order
    per_doc = (
        toks.groupBy("doc_id")
        .agg(F.concat_ws("", F.collect_list("token")).alias("glued"))
        .collect()
    )
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    for r in per_doc:
        expect = "".join(texts[r["doc_id"]].lower().split())
        assert r["glued"].replace(END, "") == expect


def test_bpe_zero_merges_degenerates_to_characters(spark):
    docs = _docs(spark, ["abc de"])
    toks = bpe_encode(docs, [])
    got = sorted(r["token"] for r in toks.collect())
    assert got == sorted(["a", "b", "c" + END, "d", "e" + END])


def test_bpe_train_deterministic(spark, sf_smoke):
    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet").limit(50)
    m1 = bpe_train(docs, n_merges=15)
    m2 = bpe_train(docs, n_merges=15)
    assert m1 == m2
    assert len(m1) == 15


def test_bpe_local_and_distributed_paths_identical(spark, sf_smoke):
    # the bounded-collect local trainer (driver_vocab_cap) must produce
    # byte-for-byte the distributed loop's merge sequence — counts
    # included — on a real corpus slice AND on a tie-heavy toy corpus
    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet").limit(40)
    local = bpe_train(docs, n_merges=12, return_counts=True)
    dist = bpe_train(docs, n_merges=12, return_counts=True, driver_vocab_cap=0)
    assert local == dist
    toy = _docs(spark, ["aaab aaab ccd", "aaab ccd ccd"])
    assert bpe_train(toy, n_merges=6, min_freq=1, return_counts=True) == bpe_train(
        toy, n_merges=6, min_freq=1, return_counts=True, driver_vocab_cap=0
    )


def test_bpe_over_cap_falls_back_to_distributed(spark):
    # cap smaller than the vocabulary: the collected head is discarded
    # and the distributed loop answers — same sequence as uncapped
    docs = _docs(spark, ["hello world hello", "worldly hell world"])
    capped = bpe_train(docs, n_merges=5, min_freq=1, driver_vocab_cap=2)
    assert capped == bpe_train(docs, n_merges=5, min_freq=1)


def test_bpe_merges_reduce_token_count(spark, sf_smoke):
    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet").limit(50)
    merges = bpe_train(docs, n_merges=15)
    n_chars = bpe_encode(docs, []).count()
    n_bpe = bpe_encode(docs, merges).count()
    n_words = word_freq(docs).agg(F.sum("freq")).collect()[0][0]
    assert n_words <= n_bpe < n_chars


def test_bpe_token_stats_consistent(spark):
    docs = _docs(spark, ["x y x", "x z"])
    stats = {r["token"]: (r["n_occurrences"], r["n_docs"])
             for r in bpe_token_stats(docs, []).collect()}
    assert stats["x" + END] == (3, 2)
    assert stats["y" + END] == (1, 1)
    assert stats["z" + END] == (1, 1)


def test_bpe_empty_and_null_corpus(spark):
    docs = spark.createDataFrame([(1, None), (2, "")], "doc_id long, text string")
    assert bpe_train(docs, n_merges=5) == []
    assert bpe_encode(docs, [("a", "b")]).count() == 0


def test_corpus_has_no_marker_collision(spark, sf_correct):
    # the </w> stripping convention in bpe_roundtrip_check assumes the
    # corpus never contains angle brackets — pin that assumption
    docs = spark.read.parquet(f"{sf_correct}/documents.parquet")
    assert docs.filter(F.col("text").contains("<") | F.col("text").contains(">")).count() == 0


def test_bpe_jvm_fold_equals_python_scan(spark):
    """_apply_merge's JVM fold must reproduce the classic left-to-right
    non-overlapping scan (_merge_word) on every overlap shape: runs of
    the same symbol, repeated pairs, embedded pairs, untouched words."""
    from etl_pipeline_for_retail_sales_data_spark.operators.bpe import (
        _apply_merge,
        _merge_word,
    )

    cases = [
        (["a", "a", "a"], "a", "a"),
        (["a", "a", "a", "a"], "a", "a"),
        (["a", "b", "a", "b"], "a", "b"),
        (["x", "a", "b", "b", "a", "b"], "a", "b"),
        (["b", "a"], "a", "b"),
        (["c"], "a", "b"),
    ]
    for syms, a, b in cases:
        df = spark.createDataFrame(
            [("w", 1, syms)], "word string, freq long, syms array<string>"
        )
        got = list(_apply_merge(df, a, b).collect()[0]["syms"])
        assert got == _merge_word(list(syms), a, b), (syms, a, b, got)


# ---------------------------------------------------------------------------
# IVF-PQ (coarse lists + PQ codes + exact refine)
# ---------------------------------------------------------------------------


def test_ivfpq_recall_and_structure(spark, sf_smoke):
    from etl_pipeline_for_retail_sales_data_spark.operators.pq import ivfpq_search

    emb = spark.read.parquet(f"{sf_smoke}/embeddings.parquet")
    qf = F.col("vec_id") < 10
    exact = knn_bruteforce_expr(emb, qf, k=5).select(
        "q_id", F.col("neighbor_id").alias("tn")
    )
    approx = ivfpq_search(emb, qf, k=5, nprobe=3, m=8, ksub=16, iters=2,
                          n_candidates=50)
    rows = approx.collect()
    per_q = {}
    for r in rows:
        per_q.setdefault(r["q_id"], []).append(r)
    for q_id, rs in per_q.items():
        assert sorted(r["rnk"] for r in rs) == list(range(1, len(rs) + 1))
        assert q_id not in {r["neighbor_id"] for r in rs}
    hits = approx.join(
        exact, (approx["q_id"] == exact["q_id"]) & (approx["neighbor_id"] == exact["tn"])
    ).count()
    # nprobe=3 of 10 lists: the shortlist misses true neighbors living in
    # unprobed lists — a soft floor, not pq_rerank's
    assert hits / exact.count() >= 0.3


def test_ivfpq_all_lists_matches_pq_rerank(spark, sf_smoke):
    # probing EVERY list removes the IVF restriction: candidates (and
    # therefore the exact-reranked output) must equal plain PQ+refine
    from etl_pipeline_for_retail_sales_data_spark.operators.pq import ivfpq_search

    emb = spark.read.parquet(f"{sf_smoke}/embeddings.parquet")
    qf = F.col("vec_id") < 6
    full = ivfpq_search(emb, qf, k=5, nprobe=100, m=8, ksub=16, iters=2,
                        n_candidates=50).collect()
    plain = pq_search_rerank(emb, qf, m=8, ksub=16, iters=2, k=5,
                             n_candidates=50).collect()
    assert sorted(map(tuple, full)) == sorted(map(tuple, plain))


def test_ivfpq_deterministic(spark, sf_smoke):
    from etl_pipeline_for_retail_sales_data_spark.operators.pq import ivfpq_search

    emb = spark.read.parquet(f"{sf_smoke}/embeddings.parquet")
    qf = F.col("vec_id") < 5
    a = ivfpq_search(emb, qf, k=3, nprobe=3, iters=2).collect()
    b = ivfpq_search(emb, qf, k=3, nprobe=3, iters=2).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


# ---------------------------------------------------------------------------
# MaxMatch (WordPiece-style greedy longest-match) segmentation
# ---------------------------------------------------------------------------


def test_maxmatch_known_toy(spark):
    from etl_pipeline_for_retail_sales_data_spark.operators.bpe import maxmatch_segment

    docs = spark.createDataFrame(
        [(0, "spark spark merge"), (1, "go park"), (2, None)],
        "doc_id long, text string",
    )
    # vocab_size=4 -> {ar, ark, pa, par} (freq ties broken lexicographically):
    # spark = s|par|k (3), merge = 5 singles, go = g|o (2), park = par|k (2)
    out = {r["doc_id"]: r for r in maxmatch_segment(docs, vocab_size=4).collect()}
    assert (out[0]["n_tokens"], out[0]["n_word_chars"], out[0]["n_pieces"]) == (3, 15, 11)
    assert (out[1]["n_tokens"], out[1]["n_word_chars"], out[1]["n_pieces"]) == (2, 6, 4)
    assert (out[2]["n_tokens"], out[2]["n_pieces"]) == (0, 0)
    assert out[2]["chars_per_piece"] == 0.0


def test_maxmatch_segmentation_is_total_and_bounded(spark):
    from etl_pipeline_for_retail_sales_data_spark.operators.bpe import maxmatch_segment

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma{i} a bb ccc dddd eeeee") for i in range(6)],
        "doc_id long, text string",
    )
    for r in maxmatch_segment(docs, vocab_size=16).collect():
        # every word fully segmented: ceil(chars/4) <= pieces <= chars
        assert r["n_pieces"] <= r["n_word_chars"]
        assert 4 * r["n_pieces"] >= r["n_word_chars"]
        assert r["n_tokens"] <= r["n_pieces"]  # a word is at least one piece


def test_maxmatch_plan_has_no_python_and_broadcasts_vocab(spark):
    from etl_pipeline_for_retail_sales_data_spark.operators.bpe import maxmatch_segment

    docs = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
    plan = maxmatch_segment(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_semantic_dedup_max_cluster_size_caps_pair_volume(spark):
    """r7 verdict #7: a pathological corpus whose every point lands in
    ONE k-means cluster must not plan an n² pair join — clusters above
    max_cluster_size are recursively split, so the candidate volume
    Σ|cluster|² stays bounded by (n / cap) · cap² instead of n²."""
    import random

    rng = random.Random(11)
    # 200 points in a tight ball around one center, k=1 -> one hot cluster
    rows = [
        (i, [1.0 + rng.uniform(-0.01, 0.01) for _ in range(8)]) for i in range(200)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    out = semantic_dedup(
        emb, k=1, iters=1, threshold=0.999999, max_cluster_size=25
    ).persist()
    try:
        assert out.count() == 200  # still a partition of the input
        sizes = out.groupBy("cluster").agg(F.count("*").alias("n"))
        max_sz, pair_vol = sizes.agg(
            F.max("n"), F.sum(F.col("n") * F.col("n"))
        ).collect()[0]
        assert max_sz <= 25, max_sz
        assert pair_vol <= (200 // 25 + 1) * 25 * 25  # « 200² = 40000
        # invariants survive the split: one keeper per component, every
        # dropped row shares a component with a keeper
        bad = (
            out.groupBy("component_id")
            .agg(F.sum(F.col("keep").cast("long")).alias("nk"))
            .filter(F.col("nk") != 1)
            .count()
        )
        assert bad == 0
    finally:
        out.unpersist()


def test_semantic_dedup_cap_handles_identical_vectors(spark):
    """Bit-identical vectors make every seed distance tie, so the
    seed-based split cannot make progress — the splitter must detect the
    stall and fall back to deterministic hash splitting instead of
    looping forever. Grouping recall degrades (keepers per sub-cluster,
    the documented trade); termination and partition invariants hold."""
    rows = [(i, [1.0, 0.0, 0.0, 0.0]) for i in range(64)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = semantic_dedup(emb, k=1, iters=1, threshold=0.9, max_cluster_size=8)
    got = out.collect()
    assert len(got) == 64
    sizes = {}
    for r in got:
        sizes[r["cluster"]] = sizes.get(r["cluster"], 0) + 1
    assert max(sizes.values()) <= 8
    # identical vectors within a final sub-cluster always collapse
    kept = sum(1 for r in got if r["keep"])
    assert kept == len(sizes)


def test_semantic_dedup_uncapped_default_unchanged(spark):
    """The r9 default cap is 'auto' (4x the average cluster size) but
    only ENGAGES when a cluster actually exceeds it — on a sanely spread
    corpus the output is byte-identical to the uncapped path: integer
    cluster labels, same rows. Explicit None behaves the same here."""
    rows = [(i, [float(i % 4 == j) for j in range(4)]) for i in range(12)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = semantic_dedup(emb, k=2, iters=1, threshold=0.99)
    assert dict(out.dtypes)["cluster"] in ("int", "bigint")
    assert out.count() == 12
    explicit = semantic_dedup(emb, k=2, iters=1, threshold=0.99, max_cluster_size=None)
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, explicit.collect()))


def test_semantic_dedup_default_cap_engages_on_hot_cluster(spark):
    """r8 verdict #5: the DEFAULT now protects end-to-end compositions —
    a planted hot cluster (64 identical vectors all landing in one
    k-means cluster with k=8, so auto cap = 4 * ceil(64/8) = 32) is
    split without being asked, bounding the within-cluster pair join."""
    rows = [(i, [1.0, 0.0, 0.0, 0.0]) for i in range(64)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = semantic_dedup(emb, k=8, iters=1, threshold=0.9)  # default cap
    got = out.collect()
    assert len(got) == 64
    sizes = {}
    for r in got:
        sizes[r["cluster"]] = sizes.get(r["cluster"], 0) + 1
    assert max(sizes.values()) <= 32, sizes
    # identical vectors within a final sub-cluster still collapse
    assert sum(1 for r in got if r["keep"]) == len(sizes)
