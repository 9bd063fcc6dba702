"""Spark ML (pyspark.ml) interop: the MLlib implementations of the same
dedup primitives the hand-built operators provide (operators/dedup.py),
wired through ML Pipelines. Exists to prove the engine composes with the
ML library — the hand-built md5-based MinHash stays the oracle-checkable
default (MLlib's hash family is engine-specific, so these are rows-only
with agreement tests against the exact Jaccard baseline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import spread
from .text import TOKEN_RE


def ml_minhash_pairs(
    docs: DataFrame,
    threshold: float = 0.7,
    num_hash_tables: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Near-dup pairs via pyspark.ml MinHashLSH over binary token vectors:
    tokenize → CountVectorizer(binary) → MinHashLSH.approxSimilarityJoin.
    The returned `jaccard_dist` is the EXACT token-set Jaccard distance of
    each candidate pair (MLlib verifies candidates exactly), so agreement
    with the hand-built 1-gram Jaccard operator is testable; which pairs
    are FOUND depends on MLlib's seeded hash family → rows-only driver
    check plus recall tests."""
    from pyspark.ml.feature import CountVectorizer, MinHashLSH

    toks = spread(docs).select(
        F.col(id_col),
        F.array_distinct(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_RE), 0)
        ).alias("tokens"),
    ).filter(F.size("tokens") > 0)
    cv = CountVectorizer(inputCol="tokens", outputCol="features", binary=True)
    model = cv.fit(toks)
    feats = model.transform(toks).select(id_col, "features")
    lsh = MinHashLSH(
        inputCol="features", outputCol="hashes", numHashTables=num_hash_tables, seed=42
    )
    lsh_model = lsh.fit(feats)
    pairs = lsh_model.approxSimilarityJoin(feats, feats, threshold, distCol="jaccard_dist")
    return (
        pairs.filter(F.col(f"datasetA.{id_col}") < F.col(f"datasetB.{id_col}"))
        .select(
            F.col(f"datasetA.{id_col}").alias("doc_a"),
            F.col(f"datasetB.{id_col}").alias("doc_b"),
            (F.floor(F.col("jaccard_dist") * 1e6 + F.lit(0.5)) / 1e6).alias("jaccard_dist"),
        )
    )
