"""Incremental corpus ingestion — the daily production loop of a
training-data pipeline: each new batch of documents is deduplicated
against EVERYTHING ingested before it without rescanning history, novel
documents are appended to the corpus, and their fingerprints extend the
dedup state. (The reference's daily schedule, dags/etl_pipeline.py:38,
maps to per-day replace for aggregates — plans/daily.py; for an
append-only corpus the analogous loop is append + dedup-against-state.)

Scale design:
- The dedup state is a FINGERPRINT table (digest, doc_id), ~50 bytes per
  historical document — 100 TB of raw text collapses to a few hundred GB
  of digests. The per-batch check is one equi-join (left_anti) on the
  digest, never a scan of the corpus itself.
- At production scale the fingerprint table is written bucketed by
  digest (operators/joins.bucketed_join_tables is the layout lever), so
  daily ingests shuffle only the new batch, never the state.
- Idempotency: re-ingesting the same batch is a no-op — every digest is
  already in the state, so zero rows are appended. A crashed run can be
  retried blindly.
- Within-batch duplicates collapse to min(doc_id) BEFORE the history
  join (cheapest first, same funnel ordering as plans/corpus.py).

The pure-query twin of this loop (day-partitioned funnel counts over a
static table, fully DuckDB-oracled) is `incremental_ingest_funnel` in
the registry; this module owns the real stateful writes, covered by
tests/test_incremental_corpus.py.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..cachectl import scoped_cache


def _state_paths(state_dir: str) -> tuple[str, str]:
    return os.path.join(state_dir, "corpus"), os.path.join(state_dir, "fingerprints")


def ingest_batch(
    spark: SparkSession,
    batch: DataFrame,
    state_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> dict[str, int]:
    """Ingest one batch of documents against the state at ``state_dir``.

    Returns the ingestion funnel as exact counts:
    ``{"n_batch", "n_within_dup", "n_hist_dup", "n_accepted"}``.
    Appends accepted docs to ``state_dir/corpus`` and their digests to
    ``state_dir/fingerprints``; both appends are per-batch parquet files,
    so a re-run of an already-ingested batch appends nothing."""
    corpus_path, fp_path = _state_paths(state_dir)
    digest = F.md5(F.col(text_col)).alias("digest")

    n_batch = batch.count()

    # 1. within-batch exact dedup: keep min(doc_id) per digest
    keyed = batch.select(digest, *batch.columns)
    keeper = keyed.groupBy("digest").agg(F.min(id_col).alias(id_col))
    # every consumer (the unique count, the accepted count, both state
    # appends) runs INSIDE this scope, so the caches release with zero
    # recompute — getPersistentRDDs() is empty when the funnel returns
    # (cachectl.py)
    batch_unique = keyed.join(keeper, ["digest", id_col])
    if os.path.isdir(fp_path):
        hist = spark.read.parquet(fp_path).select("digest")
        novel = batch_unique.join(hist, "digest", "left_anti")
    else:
        novel = batch_unique
    with scoped_cache(batch_unique, novel):
        n_unique = batch_unique.count()
        n_accepted = novel.count()

        # 3. append novel docs + their fingerprints (append-only state)
        if n_accepted:
            novel.drop("digest").write.mode("append").parquet(corpus_path)
            novel.select("digest", id_col).write.mode("append").parquet(fp_path)

    return {
        "n_batch": n_batch,
        "n_within_dup": n_batch - n_unique,
        "n_hist_dup": n_unique - n_accepted,
        "n_accepted": n_accepted,
    }
