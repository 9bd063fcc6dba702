"""Pretraining-example augmentation: deterministic span-corruption specs
(T5 denoising, Raffel et al. 2020) generated at corpus scale.

The pipeline stage after cleaning/dedup/packing: turn each document into
(input-with-sentinels, target) pairs by masking token spans. At 100 TB
the mask decisions must be (a) per-row local — no shuffle, no RNG state
shared across executors — and (b) reproducible across reruns and
engines, or examples silently change between pipeline versions. Both
come from hashing: every decision is md5(doc_id:block) integer
arithmetic, so the same corpus always yields the same masks, any
engine can replay them, and a resumed/backfilled run cannot fork.

Spark-first shape: pure per-doc array expressions inside whole-stage
codegen — tokens, fixed-size blocks, one masked span per block with
hash-derived offset/length. Zero shuffles, zero Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import spread
from .text import TOKEN_RE

BLOCK = 20  # tokens per block: one masked span per block
MAX_SPAN = 5  # span length in [1, MAX_SPAN]


def _h(doc_id, block, salt: str):
    """Portable per-(doc, block) uniform: low 8 hex digits of md5 as an
    integer — identical in any engine with md5 + hex parsing."""
    return F.conv(
        F.substring(F.md5(F.concat_ws(":", F.lit(salt), doc_id, block)), 1, 8), 16, 10
    ).cast("long")


def span_corruption_spec(
    df: DataFrame,
    text_col: str = "text",
    block: int = BLOCK,
    max_span: int = MAX_SPAN,
) -> DataFrame:
    """One masked span per ``block`` tokens: for block b of a doc, the
    span starts at block_start + (h1 % (block - max_span + 1)) and runs
    1 + (h2 % max_span) tokens (clipped to the doc tail), where h1/h2
    are md5(doc_id:b) integers — the block grid guarantees non-overlap
    without any sequential scan, so the whole spec is per-row
    expressions. Expected corruption rate = (1 + (max_span-1)/2)/block
    (15% at the 20/5 defaults, the T5 operating point). Output rows:
    (doc_id, sentinel_id, span_start, span_len) — the frame an example
    builder joins against tokenized docs to emit inputs/targets."""
    toks = F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_RE), 0)
    n = F.size(toks)
    n_blocks = F.floor(n / block).cast("int")
    base = (
        spread(df)
        .filter(F.col(text_col).isNotNull())
        .select("doc_id", n.alias("n_tokens"), n_blocks.alias("nb"))
        .filter(F.col("nb") >= 1)
    )
    b = F.explode(F.sequence(F.lit(0), F.col("nb") - 1)).alias("block_id")
    rows = base.select("doc_id", "n_tokens", b)
    h1 = _h(F.col("doc_id"), F.col("block_id"), "start")
    h2 = _h(F.col("doc_id"), F.col("block_id"), "len")
    start = (F.col("block_id") * block + (h1 % (block - max_span + 1))).cast("long")
    length = (F.lit(1) + (h2 % max_span)).cast("long")
    length = F.least(length, F.col("n_tokens") - start)
    return rows.select(
        "doc_id",
        F.col("block_id").cast("long").alias("sentinel_id"),
        start.alias("span_start"),
        length.alias("span_len"),
    )


def span_corruption_report(
    df: DataFrame,
    text_col: str = "text",
    block: int = BLOCK,
    max_span: int = MAX_SPAN,
) -> DataFrame:
    """Per-doc corruption accounting over the spec: sentinel count,
    masked-token count, and the masked fraction on the 1e-6 grid —
    the sanity frame checked against the target corruption rate before
    a pretokenization run commits. Docs shorter than one block appear
    with zero sentinels (nothing masked — matches T5's drop-short
    behavior only at the example builder, not here)."""
    toks = F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_RE), 0)
    base = (
        spread(df)
        .filter(F.col(text_col).isNotNull())
        .select("doc_id", F.size(toks).cast("long").alias("n_tokens"))
    )
    spec = span_corruption_spec(df, text_col, block, max_span)
    agg = spec.groupBy("doc_id").agg(
        F.count("*").alias("__ns"), F.sum("span_len").alias("__masked")
    )
    return base.join(agg, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        F.coalesce(F.col("__ns"), F.lit(0)).cast("long").alias("n_sentinels"),
        F.coalesce(F.col("__masked"), F.lit(0)).cast("long").alias("masked_tokens"),
        (
            F.floor(
                F.coalesce(F.col("__masked"), F.lit(0))
                / F.greatest(F.col("n_tokens"), F.lit(1))
                * 1e6
                + F.lit(0.5)
            )
            / 1e6
        ).alias("masked_fraction"),
    )


def fim_spec(df: DataFrame, text_col: str = "text", fim_rate_mod: int = 2) -> DataFrame:
    """Fill-in-the-middle transform spec (Bavarian et al. 2022, "Efficient
    Training of Language Models to Fill in the Middle"): split a document
    into prefix | middle | suffix at two uniform token cut points, emit
    the example as PSM (prefix-suffix-middle) or SPM order plus three
    sentinels; the rest of the corpus stays plain autoregressive ('ar').

    Same determinism contract as span_corruption_spec: the FIM gate, the
    PSM/SPM coin, and both cut points are md5(doc_id) integer arithmetic
    — per-row local, no RNG state, reproducible across engines, reruns,
    and partitionings. Cut points are two independent uniforms over
    [0, n] sorted (the published scheme), so middle length is
    triangular-distributed. Zero shuffles, zero Python: one scan emits
    the full spec frame an example builder consumes.
    """
    zero = F.lit(0)
    toks = F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_RE), 0)
    n = F.coalesce(F.size(toks).cast("long"), F.lit(0).cast("long"))
    fim = _h(F.col("doc_id"), zero, "fimgate") % fim_rate_mod == 0
    psm = _h(F.col("doc_id"), zero, "fimmode") % 2 == 0
    c1 = _h(F.col("doc_id"), zero, "fimcut1") % (n + 1)
    c2 = _h(F.col("doc_id"), zero, "fimcut2") % (n + 1)
    lo, hi = F.least(c1, c2), F.greatest(c1, c2)
    base = spread(df).select(
        "doc_id",
        n.alias("n_tokens"),
        fim.alias("fim"),
        F.when(~fim, F.lit("ar"))
        .when(psm, F.lit("psm"))
        .otherwise(F.lit("spm"))
        .alias("mode"),
        F.when(fim, lo).otherwise(n).cast("long").alias("prefix_len"),
        F.when(fim, hi - lo).otherwise(zero.cast("long")).cast("long").alias("middle_len"),
        F.when(fim, n - hi).otherwise(zero.cast("long")).cast("long").alias("suffix_len"),
        (n + F.when(fim, F.lit(3)).otherwise(zero)).cast("long").alias("out_tokens"),
    )
    return base
