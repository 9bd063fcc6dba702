"""Blocked record linkage (entity resolution) primitives.

Extension tier (the reference — /root/reference/scripts/transformation.py
— deduplicates only on exact equality): the classic two-stage entity-
resolution shape used at warehouse scale:

1. BLOCKING — a cheap deterministic key (here: an expression over the
   name, e.g. its head noun or a prefix) buckets candidate records; only
   same-block pairs are compared. This turns the O(n²) all-pairs problem
   into a self EQUI-join on the block key — the same
   inverted-index/banding discipline as MinHash-LSH and SimHash
   (operators/dedup.py), applied to structured-name matching.
2. MATCHING — exact pairwise edit distance (levenshtein: integer,
   deterministic, identical across engines — pinned by the
   levenshtein_nation_pairs oracle) under a threshold.

Scale shape: the join operates on the DISTINCT-name frame (vocabulary-
sized, typically orders smaller than the record table) with per-name
record counts carried along, so the fan-out is |block|² over distinct
names, not records. Hot blocks are the skew risk exactly as hot shingles
are for Jaccard — the ``max_block`` cap bounds any block's contribution
(the ngram max_df lever, same rationale).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def blocked_name_pairs(
    df: DataFrame,
    name_col: str,
    block: Column,
    max_dist: int = 4,
    max_block: int | None = None,
) -> DataFrame:
    """Candidate near-duplicate NAME pairs: distinct names bucketed by
    ``block``, same-block pairs scored with levenshtein, kept when
    ``1 <= dist <= max_dist`` (0 is exact-dup territory — the exact
    dedup operator's job). Returns
    (block, name_a, name_b, dist, n_a, n_b) with name_a < name_b and
    per-name record counts so downstream canonicalization (connected
    components + keeper, operators/dedup.py) can weight by support.

    ``max_block`` drops blocks holding more distinct names than the cap
    before the self-join (skew guard; None = exact).
    """
    names = (
        df.select(F.col(name_col).alias("name"))
        .groupBy("name")
        .agg(F.count("*").alias("n"))
        .withColumn("blk", block)
        .filter(F.col("blk").isNotNull())
    )
    if max_block is not None:
        sizes = names.groupBy("blk").agg(F.count("*").alias("bn"))
        names = names.join(
            F.broadcast(sizes.filter(F.col("bn") <= max_block).select("blk")), "blk"
        )
    a = names.select(
        "blk", F.col("name").alias("name_a"), F.col("n").alias("n_a")
    )
    b = names.select(
        "blk", F.col("name").alias("name_b"), F.col("n").alias("n_b")
    )
    dist = F.levenshtein(F.col("name_a"), F.col("name_b"))
    return (
        a.join(b, "blk")
        .filter(F.col("name_a") < F.col("name_b"))
        .withColumn("dist", dist.cast("long"))
        .filter(F.col("dist") <= max_dist)
        .select("blk", "name_a", "name_b", "dist", "n_a", "n_b")
    )
