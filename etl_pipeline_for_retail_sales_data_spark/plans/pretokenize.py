"""Pretokenization pipeline: tokenize → deterministic shuffle →
concat-and-chunk packing → shard assignment — the artifact a training
job actually reads (fixed-length sequences in shards), built from the
repo's own primitives:

    token counts      operators/bpe (learned subwords) or whitespace
    global order      operators/layout.shard_assignment (md5 two-phase
                      rank — seedless, partitioning-independent)
    token offsets     operators/windows.bucketed_prefix_sum (exclusive
                      prefix sum, two-phase, no single-partition window)
    sequences         each document spans token offsets
                      [prefix, prefix + n); the sequences it touches are
                      seq = offset div seq_len — one explode of the
                      per-doc sequence range, then a seq-keyed aggregate

Concat-and-chunk (documents flow head-to-tail into fixed seq_len
windows, a document may straddle a boundary) is the standard LLM
pretraining shape — sequence_packing in the registry is the
bin-per-document variant; this plan is the token-exact one.

Scale: the corpus is tokenized once (the count pass); everything after
operates on one row per document plus one row per (document, sequence)
span — never one row per token. All shuffles are keyed (md5 bucket,
prefix bucket, seq id); the only driver-side data is the BPE merge
table when subword mode is on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.layout import shard_assignment
from ..operators.text import TOKEN_RE
from ..operators.windows import bucketed_prefix_sum
from ..sources.readers import load_table


def packed_sequences(
    docs: DataFrame,
    seq_len: int = 128,
    n_shards: int = 8,
    merges: list[tuple[str, str]] | None = None,
) -> DataFrame:
    """One row per packed training sequence:
    (seq_id, shard_id, n_tokens, n_docs, first_doc, last_doc).

    ``merges`` = None counts whitespace tokens (exactly oracle-able);
    pass a learned BPE merge table (operators/bpe.bpe_train) to budget
    in subword tokens instead — same plan shape, the count column is the
    only difference. Every sequence holds exactly seq_len tokens except
    the final one; shards are assigned round-robin on seq_id (at the
    training side each worker streams its residue class)."""
    if merges is None:
        n_tok = F.size(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit(TOKEN_RE), 0)
        ).cast("long")
        counts = docs.na.drop(subset=["text"]).select(
            "doc_id", n_tok.alias("n_tokens")
        )
    else:
        from ..operators.bpe import bpe_encode

        counts = (
            bpe_encode(docs, merges)
            .groupBy("doc_id")
            .agg(F.count("*").alias("n_tokens"))
        )
    counts = counts.filter(F.col("n_tokens") > 0)

    pos = shard_assignment(counts, n_shards=1, id_col="doc_id").select(
        "doc_id", "global_pos"
    )
    ordered = counts.join(pos, "doc_id")
    with_prefix = bucketed_prefix_sum(
        ordered, "global_pos", "n_tokens", out_col="start"
    )
    spans = with_prefix.select(
        "doc_id",
        "n_tokens",
        "start",
        F.explode(
            F.sequence(
                F.expr(f"start div {seq_len}"),
                F.expr(f"(start + n_tokens - 1) div {seq_len}"),
            )
        ).alias("seq_id"),
    )
    overlap = F.least(
        F.col("start") + F.col("n_tokens"), (F.col("seq_id") + 1) * seq_len
    ) - F.greatest(F.col("start"), F.col("seq_id") * seq_len)
    return (
        spans.groupBy("seq_id")
        .agg(
            F.sum(overlap).cast("long").alias("n_tokens"),
            F.count("*").cast("long").alias("n_docs"),
            F.min_by("doc_id", "start").alias("first_doc"),
            F.max_by("doc_id", "start").alias("last_doc"),
        )
        .select(
            "seq_id",
            (F.col("seq_id") % n_shards).cast("long").alias("shard_id"),
            "n_tokens",
            "n_docs",
            "first_doc",
            "last_doc",
        )
    )


def build_packed_shards(
    spark: SparkSession,
    sf_dir: str,
    seq_len: int = 128,
    n_shards: int = 8,
    num_merges: int = 0,
) -> DataFrame:
    """The documents table through the full pipeline; ``num_merges`` > 0
    trains a BPE vocabulary first (iterative — rows-only territory) and
    budgets in subword tokens."""
    docs = load_table(spark, sf_dir, "documents")
    merges = None
    if num_merges > 0:
        from ..operators.bpe import bpe_train

        merges = bpe_train(docs, n_merges=num_merges)
    return packed_sequences(docs, seq_len=seq_len, n_shards=n_shards, merges=merges)
