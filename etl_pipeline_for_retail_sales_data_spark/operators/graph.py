"""Iterative graph algorithms over edge DataFrames (PageRank).

Companion to the label-propagation connected components in
``operators.dedup`` — both exist because near-duplicate detection at
corpus scale produces an edge list whose global structure (clusters,
centrality) drives keep/drop decisions: PageRank-style centrality picks
the canonical document inside a near-dup cluster.

Execution model: classic synchronous PageRank as a driver loop of
DataFrame joins — contributions = ranks ⋈ out-degree edges, new ranks =
groupBy(dst).sum with teleport + dangling-mass redistribution. Each
iteration is one shuffle on the node key; the loop materializes each
iteration (persist + count) to keep the lineage flat instead of
exponentially nested. At cluster scale the same loop runs unchanged —
iterations dominate, so pre-partitioning edges and ranks by node id
(bucketing) removes the per-iteration edge shuffle; the rank frame is
the only thing that moves.

Not oracle-SQL-expressible (iterative fixpoint with float state); covered
by property tests instead: rank mass conservation (sum == n), positivity,
and run-to-run determinism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src: str = "src",
    dst: str = "dst",
    iterations: int = 8,
    damping: float = 0.85,
) -> DataFrame:
    """PageRank with uniform teleport and dangling-node mass
    redistribution. ``nodes``: one row per vertex (distinct ``id_col``);
    ``edges``: directed (src, dst) pairs, duplicates allowed (parallel
    edges weight the contribution). Returns (id, rank) with
    sum(rank) == n_nodes (total-mass convention, as in the original
    formulation scaled by n)."""
    n = nodes.select(F.col(id_col).alias("id")).distinct().persist()
    n_nodes = n.count()
    if n_nodes == 0:
        # keep the contract schema (id_col, rank) on the empty path too
        return n.select(F.col("id").alias(id_col), F.lit(0.0).alias("rank"))

    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .join(n.withColumnRenamed("id", "src"), "src")
        .join(n.withColumnRenamed("id", "dst"), "dst")
    )
    out_deg = e.groupBy("src").agg(F.count("*").alias("deg")).persist()
    # weighted edges: contribution share of each (src,dst) = multiplicity/deg
    ew = e.join(out_deg, "src").persist()
    ew.count()

    # dangling node set (no out-edges) is static across iterations
    dangling_ids = n.join(out_deg.withColumnRenamed("src", "id"), "id", "left_anti").persist()

    ranks = n.withColumn("rank", F.lit(1.0))
    for _ in range(iterations):
        contribs = (
            ew.join(ranks.withColumnRenamed("id", "src"), "src")
            .groupBy("dst")
            .agg(F.sum(F.col("rank") / F.col("deg")).alias("contrib"))
            .withColumnRenamed("dst", "id")
        )
        # mass sitting on dangling nodes this iteration, as a broadcast
        # 1-row frame — keeps the whole iteration ONE job (no driver
        # collect round-trip per iteration)
        dang = ranks.join(dangling_ids, "id", "left_semi").agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("__dang")
        )
        base = (
            F.lit(1.0 - damping) + F.lit(damping) * F.col("__dang") / F.lit(float(n_nodes))
        )
        # localCheckpoint truncates the logical plan each iteration —
        # without it Catalyst re-analyzes a lineage nesting every prior
        # iteration and planning time, not data, dominates. On a cluster
        # swap for reliable checkpoint(dir) to also survive executor loss.
        new_ranks = (
            n.join(contribs, "id", "left")
            .crossJoin(F.broadcast(dang))
            .select(
                "id",
                (base + F.lit(damping) * F.coalesce(F.col("contrib"), F.lit(0.0))).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
        ranks.unpersist()
        ranks = new_ranks

    ew.unpersist()
    out_deg.unpersist()
    dangling_ids.unpersist()
    n.unpersist()
    return ranks.select(F.col("id").alias(id_col), "rank")
