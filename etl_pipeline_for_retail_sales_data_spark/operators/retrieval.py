"""Hybrid retrieval: fuse a lexical (BM25) ranking and a vector (cosine)
ranking with Reciprocal Rank Fusion (Cormack, Clarke & Buettcher, SIGIR
2009): score(d) = sum over rankers of 1/(rrf_k + rank_r(d)).

RRF is the workhorse fusion rule for LLM retrieval stacks (sparse+dense
hybrid search) because it needs no score calibration — only ranks — and
ranks are integers, so the fused score is a sum of exact integer-divisor
terms in a FIXED literal order: bit-reproducible across engines, unlike
any score-interpolation scheme over floating BM25/cosine magnitudes.

Scale shape: each leg is already top-``pool`` (the BM25 leg ends in a
TakeOrderedAndProject, the vector leg in a per-query window over one
corpus pass), so the fusion join touches at most 2*pool rows — driver-
scale frames regardless of corpus size; the corpus is scanned once per
leg and never joined against itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .similarity import as_double, dot, round6
from .text import bm25_rank


def rrf_hybrid_search(
    docs: DataFrame,
    emb: DataFrame,
    query_terms: list[str],
    query_vec_id: int,
    k: int = 20,
    pool: int = 50,
    rrf_k: int = 60,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-``k`` documents by RRF over (BM25 top-``pool``, cosine
    top-``pool``). The vector query is the embedding of ``query_vec_id``
    (self excluded from its own leg, like knn_bruteforce). A document
    missing from one leg contributes 0.0 from it — COALESCE keeps the
    addition a two-term literal-order sum. Ranking is on the UNROUNDED
    fused score (identical in both engines because every term is
    1.0/(rrf_k + integer)), with doc_id tiebreak; the emitted score is
    round6'd for display."""
    lex = bm25_rank(docs, query_terms, top_k=pool).select(
        "doc_id", F.col("rnk").alias("lex_rnk")
    )
    e = (
        emb.filter(F.col(vec_col).isNotNull())
        .select(F.col(id_col), as_double(F.col(vec_col)).alias("__v"))
        .withColumn("__n", F.sqrt(dot(F.col("__v"), F.col("__v"))))
    )
    q = e.filter(F.col(id_col) == query_vec_id).select(
        F.col(id_col).alias("__qid"), F.col("__v").alias("qe"), F.col("__n").alias("qn")
    )
    scored = (
        e.crossJoin(F.broadcast(q))
        .filter(F.col(id_col) != F.col("__qid"))
        .select(
            F.col(id_col).alias("doc_id"),
            (dot(F.col("qe"), F.col("__v")) / (F.col("qn") * F.col("__n"))).alias("__cos"),
        )
    )
    # global top-pool as sort+limit (TakeOrderedAndProject: per-partition
    # heap + driver merge of pool rows); the rank window then sees pool rows
    w = Window.orderBy(F.col("__cos").desc(), F.col("doc_id"))
    vec = (
        scored.orderBy(F.col("__cos").desc(), F.col("doc_id"))
        .limit(pool)
        .select("doc_id", F.row_number().over(w).cast("long").alias("vec_rnk"))
    )
    fused = lex.join(vec, "doc_id", "full_outer").select(
        "doc_id",
        "lex_rnk",
        "vec_rnk",
        (
            F.coalesce(F.lit(1.0) / (F.lit(rrf_k) + F.col("lex_rnk")), F.lit(0.0))
            + F.coalesce(F.lit(1.0) / (F.lit(rrf_k) + F.col("vec_rnk")), F.lit(0.0))
        ).alias("__rrf"),
    )
    wf = Window.orderBy(F.col("__rrf").desc(), F.col("doc_id"))
    return (
        fused.orderBy(F.col("__rrf").desc(), F.col("doc_id"))
        .limit(k)
        .select(
            "doc_id",
            "lex_rnk",
            "vec_rnk",
            round6(F.col("__rrf")).alias("rrf_score"),
            F.row_number().over(wf).cast("long").alias("rnk"),
        )
    )
