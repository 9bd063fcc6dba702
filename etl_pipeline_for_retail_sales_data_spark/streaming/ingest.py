"""Streaming twin of the incremental corpus loops (r7 verdict #8): the
daily-batch dedup-ingest (plans/incremental_corpus.py) wired as a
``foreachBatch`` sink, so the batch and streaming ingestion stories are
ONE code path with two drivers.

Exactly-once: Structured Streaming delivers micro-batches AT LEAST once
(the same ``batch_id`` can be re-delivered after a failure between sink
success and offset-log write). Two layers make the sink exactly-once:

1. The epoch guard — each committed batch's ``epoch_id`` rides the
   ingest journal marker, i.e. the SAME atomic commit as the data
   (plans/incremental_corpus._commit): a crashed epoch either rolls
   forward (marker existed → data AND epoch flag appear) or back
   (neither does). A re-delivered epoch whose flag exists is skipped
   wholesale — zero reads, zero appends.
2. Even without the guard, the loops are classification-idempotent
   (every fingerprint already in the state → nothing accepted), so the
   corpus can never double-ingest; the guard just makes redelivery free
   and keeps the append-only band state from accumulating replay rows.

Scale shape is inherited: per-micro-batch cost proportional to the
batch (one bucketed equi-join against the state, state side never
shuffles), history never rescanned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from ..plans.incremental_corpus import (
    epoch_committed,
    ingest_batch,
    ingest_batch_bloom,
    ingest_batch_embdup,
    ingest_batch_neardup,
    recover_state,
)


def make_exact_ingestor(state_dir: str, on_stats=None, **ingest_kwargs):
    """foreachBatch callback: exact-dedup ingest of each micro-batch.
    ``on_stats(batch_id, funnel_dict)`` is invoked for every NON-skipped
    epoch (monitoring hook; tests use it)."""

    def ingest(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        recover_state(spark, state_dir)
        if epoch_committed(spark, state_dir, batch_id):
            return  # redelivery of a fully-committed epoch
        stats = ingest_batch(
            spark, batch_df, state_dir, epoch_id=batch_id, **ingest_kwargs
        )
        if on_stats is not None:
            on_stats(batch_id, stats)

    return ingest


def make_neardup_ingestor(state_dir: str, on_stats=None, **ingest_kwargs):
    """foreachBatch callback: MinHash-LSH near-dup ingest of each
    micro-batch against the persistent band-key state."""

    def ingest(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        recover_state(spark, state_dir)
        if epoch_committed(spark, state_dir, batch_id):
            return
        stats = ingest_batch_neardup(
            spark, batch_df, state_dir, epoch_id=batch_id, **ingest_kwargs
        )
        if on_stats is not None:
            on_stats(batch_id, stats)

    return ingest


def make_bloom_ingestor(state_dir: str, on_stats=None, **ingest_kwargs):
    """foreachBatch callback: Bloom-filter exact-dedup ingest (space-
    optimized state, no false negatives, tunable FP rate) of each
    micro-batch."""

    def ingest(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        recover_state(spark, state_dir)
        if epoch_committed(spark, state_dir, batch_id):
            return
        stats = ingest_batch_bloom(
            spark, batch_df, state_dir, epoch_id=batch_id, **ingest_kwargs
        )
        if on_stats is not None:
            on_stats(batch_id, stats)

    return ingest


def make_embdup_ingestor(state_dir: str, tables: list, on_stats=None, **ingest_kwargs):
    """foreachBatch callback: hyperplane-LSH embedding near-dup ingest of
    each micro-batch against the persistent (tbl, bucket) state."""

    def ingest(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        recover_state(spark, state_dir)
        if epoch_committed(spark, state_dir, batch_id):
            return
        stats = ingest_batch_embdup(
            spark, batch_df, state_dir, tables, epoch_id=batch_id, **ingest_kwargs
        )
        if on_stats is not None:
            on_stats(batch_id, stats)

    return ingest


def stream_ingest_embdup(
    stream_df: DataFrame,
    state_dir: str,
    tables: list,
    query_name: str,
    **ingest_kwargs,
) -> StreamingQuery:
    """Embedding-LSH twin of :func:`stream_ingest_neardup`."""
    return (
        stream_df.writeStream.foreachBatch(make_embdup_ingestor(state_dir, tables, **ingest_kwargs))
        .queryName(query_name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def stream_ingest_neardup(
    stream_df: DataFrame, state_dir: str, query_name: str, **ingest_kwargs
) -> StreamingQuery:
    """Start a streaming query running the near-dup ingest loop on every
    micro-batch, exactly once per epoch. ``availableNow`` drains the
    source and stops — the daily-batch trigger shape; a production
    stream uses a processing-time trigger with the same sink."""
    return (
        stream_df.writeStream.foreachBatch(make_neardup_ingestor(state_dir, **ingest_kwargs))
        .queryName(query_name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def stream_ingest_exact(
    stream_df: DataFrame, state_dir: str, query_name: str, **ingest_kwargs
) -> StreamingQuery:
    """Exact-dedup twin of :func:`stream_ingest_neardup`."""
    return (
        stream_df.writeStream.foreachBatch(make_exact_ingestor(state_dir, **ingest_kwargs))
        .queryName(query_name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
