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


def ingest_batch_neardup(
    spark: SparkSession,
    batch: DataFrame,
    state_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 16,
    bands: int = 4,
    n: int = 3,
) -> dict[str, int]:
    """Incremental NEAR-duplicate ingestion: the MinHash-LSH counterpart
    of :func:`ingest_batch` (which catches only byte-identical texts).
    Each batch is checked against a persistent BAND-KEY state — a doc is
    a historical near-dup iff ANY of its ``bands`` LSH band keys was
    already seen; within the batch, a doc sharing a band key with a
    smaller-id batch member is a within-batch near-dup (exists-
    semantics: the smaller member's own classification is irrelevant,
    which keeps the whole contract SQL-expressible — the recursive
    "dedup against accepted canonicals only" variant is deliberately
    not chosen; the pure-query oracled twin is
    ``incremental_neardup_funnel`` in the registry).

    State = (band, bk, doc_id) rows for EVERY ingested doc (seen-
    semantics, append-only): ~bands·36 bytes per historical document —
    the 100 TB corpus collapses to a compact fingerprint table, and the
    per-batch check is one (band, bk) equi-join, never a corpus scan.
    Re-ingesting a batch is classification-idempotent: every doc's keys
    are already present, so everything classifies historical and the
    appends are empty. Docs with < n tokens (no signature, no band
    keys) can never collide — they are accepted.

    Returns ``{"n_batch", "n_hist_neardup", "n_within_neardup",
    "n_accepted"}``; appends accepted docs to ``state_dir/
    corpus_neardup`` and the batch's band keys to ``state_dir/
    neardup_bands``.
    """
    from ..operators.dedup import minhash_band_keys

    bands_path = os.path.join(state_dir, "neardup_bands")
    corpus_path = os.path.join(state_dir, "corpus_neardup")

    n_batch = batch.count()
    bk = minhash_band_keys(batch, text_col=text_col, k=k, bands=bands, n=n)
    if id_col != "doc_id":
        bk = bk.withColumnRenamed("doc_id", id_col)

    # every consumer (both classification counts, both appends) runs
    # inside the scope, so the cache releases with zero recompute
    # (cachectl.py); the signature pass runs once
    with scoped_cache(bk):
        if os.path.isdir(bands_path):
            state = spark.read.parquet(bands_path).select("band", "bk")
            hist_ids = (
                bk.join(state, ["band", "bk"], "left_semi").select(id_col).distinct()
            )
        else:
            hist_ids = bk.select(id_col).limit(0)
        # within-batch: smallest id per batch bucket; a doc with ANY
        # bucket whose min is a smaller id is a within-batch near-dup
        bucket_min = bk.groupBy("band", "bk").agg(F.min(id_col).alias("__min_id"))
        within_ids = (
            bk.join(bucket_min, ["band", "bk"])
            .filter(F.col("__min_id") < F.col(id_col))
            .select(id_col)
            .distinct()
        )
        with scoped_cache(hist_ids):
            n_hist = hist_ids.count()
            n_within = within_ids.join(hist_ids, id_col, "left_anti").count()
            accepted = (
                batch.join(hist_ids, id_col, "left_anti")
                .join(within_ids, id_col, "left_anti")
            )
            n_accepted = accepted.count()
            if n_accepted:
                accepted.write.mode("append").parquet(corpus_path)
        # seen-semantics: append EVERY batch doc's band keys (replays of
        # the same batch then classify 100% historical and append again
        # — harmless duplicates in an existence-checked state; dedupe on
        # compaction if the state is ever rewritten)
        if n_batch:
            bk.write.mode("append").parquet(bands_path)

    return {
        "n_batch": n_batch,
        "n_hist_neardup": n_hist,
        "n_within_neardup": n_within,
        "n_accepted": n_accepted,
    }


def compact_neardup_state(spark: SparkSession, state_dir: str) -> int:
    """Rewrite the near-dup band state with duplicates collapsed.

    Replays of an already-ingested batch append their band rows again
    (harmless for the existence-checked classification, wasteful on
    disk). Compaction distincts the state and swaps it in via
    write-to-temp + atomic rename — a crashed compaction leaves the old
    state readable. Returns the compacted row count."""
    import shutil

    bands_path = os.path.join(state_dir, "neardup_bands")
    if not os.path.isdir(bands_path):
        return 0
    tmp_path = bands_path + "._compact_tmp"
    compacted = spark.read.parquet(bands_path).distinct()
    compacted.write.mode("overwrite").parquet(tmp_path)
    n = spark.read.parquet(tmp_path).count()
    old_path = bands_path + "._compact_old"
    os.rename(bands_path, old_path)
    os.rename(tmp_path, bands_path)
    shutil.rmtree(old_path)
    return n
