"""Data-selection operators for training-corpus curation.

Extension tier (the reference — a pandas retail ETL,
/root/reference/scripts/transformation.py — has no text surface): the two
standard count-based selection methods large-scale LM data pipelines run
before training, re-expressed as Spark aggregates:

- :func:`bigram_lm_perplexity` — CCNet-style perplexity filtering (Wenzek
  et al. 2020) with a countable twin: an add-one-smoothed bigram LM
  trained on the corpus itself; a document's mean negative log-likelihood
  under that model flags statistically-unusual documents (the CCNet
  "tail" bucket). KenLM's 5-gram probabilities are float-opaque; the
  bigram form keeps every model parameter an exact integer count so the
  whole filter is engine-portable and oracle-checkable.
- :func:`dsir_importance` — Data Selection via Importance Resampling
  (Xie et al. 2023): hashed unigram bag features; a document's importance
  log-weight is the sum over its token occurrences of
  ln(p_target(bucket) / p_raw(bucket)) with add-one smoothing; selection
  keeps the top of the corpus by weight (percentile cut, boundary ties
  kept — top-k with equal weights is arbitrary, >= is the deterministic
  resolution).

Scale shape (both): ONE corpus tokenize/shingle pass feeds a hash
aggregate whose result IS the model — O(vocab) rows for the bigram LM,
O(hash buckets) rows for DSIR — orders of magnitude smaller than the
corpus. Documents join to the model by token equi-join (the DSIR bucket
table is broadcast; the bigram table is a shuffle equi-join on the word
pair) and reduce per document. No cross joins, no driver collects, no
per-row Python.

Float choreography: each ln() term is computed from ONE division of
exact-int64 products (both engines see the identical double), floored to
1e-6 micro-units, and cast to int64 — the per-document sum is then an
exact integer sum (order-free across partitions), and a single final
division rounds the score (the drift.py pattern). The int64 products
bound corpus size at ~3e9 tokens per (count+smoothing) factor before
overflow; beyond that, cast the factors to double first (exact below
2^53) — noted here because 100 TB corpora exceed it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import doc_shingles
from .sketches import cm_bucket
from .text import doc_terms


def _round4_of_micro_sum(sum_u: Column, denom: Column) -> Column:
    """floor(sum_u/denom / 100 + .5) / 1e4 — one double division of exact
    int64s, one rounding: identical across engines."""
    return F.floor(sum_u.cast("double") / denom / 100 + F.lit(0.5)) / 1e4


def bigram_lm_perplexity(
    df: DataFrame, text_col: str = "text", tail_quantile: float = 0.9
) -> DataFrame:
    """Per-document mean NLL under an add-one-smoothed bigram LM trained
    on the corpus itself; ``flagged`` marks the high-perplexity TAIL —
    documents whose score strictly exceeds the corpus's
    ``tail_quantile`` disc-percentile (CCNet buckets by perplexity
    percentile, not an absolute cut: absolute NLL shifts with corpus
    size and vocabulary, a percentile doesn't).

    Model: p(w2|w1) = (n(w1 w2) + 1) / (n(w1 ·) + V), V = corpus bigram
    second-word vocabulary. Every parameter is an integer count from one
    shingling pass; the per-occurrence NLL term ln((n1+V)/(n12+1)) is
    summed per document in exact 1e-6 micro-units, and the cut point is
    percentile_disc over the rounded per-doc scores — an actual data
    value, so the strict > comparison is engine-exact. Documents with
    fewer than 2 tokens have no bigrams: they surface with n_bigrams=0,
    nll=0.0, flagged=false (a length gate is a different filter's job).
    """
    bi_occ = (
        doc_shingles(df, n=2, distinct=False, text_col=text_col)
        .select(
            "doc_id",
            F.split(F.col("shingle"), " ", 2).alias("parts"),
        )
        .select(
            "doc_id",
            F.col("parts")[0].alias("w1"),
            F.col("parts")[1].alias("w2"),
        )
    )
    # the LM: O(distinct bigrams) rows — this frame is the model, reused
    # by the marginal, the vocab scalar, and the scoring join, all of
    # which re-read its repartition exchange (reuse-not-cache, cachectl)
    big = (
        bi_occ.groupBy("w1", "w2")
        .agg(F.count("*").alias("n12"))
        .repartition("w1")
    )
    uni = big.groupBy("w1").agg(F.sum("n12").alias("n1"))
    vocab = big.agg(F.count_distinct("w2").alias("v"))

    scored = (
        bi_occ.join(big, ["w1", "w2"])  # self-trained ⇒ every bigram hits
        .join(uni, "w1")
        .crossJoin(F.broadcast(vocab))
    )
    # one exact-int64 ratio, one ln, micro-unit floor (module docstring)
    nll = F.log((F.col("n1") + F.col("v")).cast("double") / (F.col("n12") + 1))
    term_u = F.floor(nll * 1e6 + F.lit(0.5)).cast("long")
    per_doc = scored.groupBy("doc_id").agg(
        F.count("*").alias("n_bigrams"), F.sum(term_u).alias("sum_u")
    )
    base = df.select("doc_id")
    nll4 = F.coalesce(
        _round4_of_micro_sum(F.col("sum_u"), F.col("n_bigrams")), F.lit(0.0)
    )
    # small O(docs) frame feeds BOTH the percentile cut and the output —
    # the repartition barrier makes both re-read one exchange, so the
    # model join never replays (reuse-not-cache, cachectl.py)
    out = (
        base.join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_bigrams"), F.lit(0)).cast("long").alias("n_bigrams"),
            nll4.alias("nll"),
        )
        .repartition("doc_id")
    )
    cut = out.agg(
        F.expr(
            f"percentile_disc({tail_quantile}) WITHIN GROUP (ORDER BY nll)"
        ).alias("cut")
    )
    return out.crossJoin(F.broadcast(cut)).select(
        "doc_id",
        "n_bigrams",
        "nll",
        (F.col("nll") > F.col("cut")).alias("flagged"),
    )


def dsir_importance(
    df: DataFrame,
    target_filter: Column,
    text_col: str = "text",
    buckets: int = 1024,
    seed: int = 7,
    keep_quantile: float = 0.75,
) -> DataFrame:
    """DSIR importance log-weight per document against a target subset of
    the same corpus (``target_filter`` selects the target rows, e.g. a
    trusted language or a quality flag); ``keep`` marks documents at or
    above the corpus's ``keep_quantile`` disc-percentile of log-weight —
    DSIR selects the top-k by weight; a percentile cut with
    boundary-ties-kept is the deterministic, engine-exact form of that
    top-k (absolute weights carry a smoothing-induced offset that shifts
    with corpus size, so a fixed 0.0 cut is meaningless).

    Features are hashed unigrams: md5(token) mod ``buckets`` — the
    engine-portable hash used by dataset_split/count-min. Bucket weights
    w_b = ln((n_target_b + 1)·(n_raw + B) / ((n_raw_b + 1)·(n_target + B)))
    form a ``buckets``-row table (broadcast to the scoring join); a
    document's log-weight is Σ_occurrences w_bucket(token) in exact
    micro-units. Weights for buckets unseen in the target exist too
    (add-one), so every token occurrence scores.
    """
    toks = doc_terms(df, text_col).withColumn(
        "bucket", cm_bucket(F.col("term"), seed, buckets)
    )
    # bucket-keyed repartition barrier: one tokenize+hash pass re-read by
    # the raw counts, target counts, and scoring aggregates — the raw and
    # target groupBys inherit the partitioning with no further exchange
    # (reuse-not-cache, cachectl.py)
    toks = toks.repartition("bucket")
    raw = toks.groupBy("bucket").agg(F.count("*").alias("n_raw_b"))
    target_ids = df.filter(target_filter).select("doc_id")
    tgt = (
        toks.join(F.broadcast(target_ids), "doc_id")
        .groupBy("bucket")
        .agg(F.count("*").alias("n_tgt_b"))
    )
    # bucket table: B rows. Totals are SUMS of the per-bucket counts
    # already computed above — reducing the B-row frames, not re-scanning
    # the corpus-sized token frame a third and fourth time
    table = (
        raw.join(tgt, "bucket", "left")
        .select(
            "bucket",
            "n_raw_b",
            F.coalesce(F.col("n_tgt_b"), F.lit(0)).alias("n_tgt_b"),
        )
        .crossJoin(
            F.broadcast(
                tgt.agg(F.coalesce(F.sum("n_tgt_b"), F.lit(0)).alias("n_tgt"))
                .crossJoin(
                    raw.agg(F.coalesce(F.sum("n_raw_b"), F.lit(0)).alias("n_raw"))
                )
            )
        )
    )
    b = F.lit(buckets)
    ratio = ((F.col("n_tgt_b") + 1) * (F.col("n_raw") + b)).cast("double") / (
        (F.col("n_raw_b") + 1) * (F.col("n_tgt") + b)
    )
    w_u = F.floor(F.log(ratio) * 1e6 + F.lit(0.5)).cast("long")
    weights = table.select("bucket", w_u.alias("w_u"))

    per_doc = (
        toks.join(F.broadcast(weights), "bucket")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_tokens"), F.sum("w_u").alias("sum_u"))
    )
    logw = F.coalesce(
        F.floor(F.col("sum_u").cast("double") / 100 + F.lit(0.5)) / 1e4, F.lit(0.0)
    )
    base = df.select("doc_id")
    out = (
        base.join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_tokens"), F.lit(0)).cast("long").alias("n_tokens"),
            logw.alias("log_weight"),
        )
        # barrier: both the percentile cut and the output re-read one
        # exchange (reuse-not-cache, cachectl.py)
        .repartition("doc_id")
    )
    cut = out.agg(
        F.expr(
            f"percentile_disc({keep_quantile}) WITHIN GROUP (ORDER BY log_weight)"
        ).alias("cut")
    )
    return out.crossJoin(F.broadcast(cut)).select(
        "doc_id",
        "n_tokens",
        "log_weight",
        (F.col("log_weight") >= F.col("cut")).alias("keep"),
    )


def domain_upsample(
    df: DataFrame,
    weights: dict[str, float],
    domain_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic mixture up/down-sampling with FRACTIONAL weights
    (the DoReMi-style mixture knob ``domain_mixture_sample`` can't turn:
    that one only caps domains DOWN; training mixes routinely need
    weight 2.5 — every doc appears twice, half appear a third time).

    Each row of domain d is replicated floor(w_d) times, plus one extra
    copy iff md5('up:' || id) mod 1e6 < frac(w_d)·1e6 — the same pure-
    function-of-the-row hash-Bernoulli gate as stratified_sample, so the
    realized mix is reproducible across engines, partitionings, and
    reruns, and weights < 1 degrade to plain deterministic downsampling.
    Domains missing from ``weights`` default to 1.0 (pass-through).

    Shape: one projection + one explode of sequence(1, n_copies) — no
    shuffle, no RNG state; output carries ``copy`` (1-based replica
    index) so downstream shuffling/sharding can spread replicas.
    """
    base_w = F.lit(1)
    frac_w = F.lit(0)
    for dom, w in weights.items():
        base_w = F.when(F.col(domain_col) == dom, int(w)).otherwise(base_w)
        frac_w = F.when(
            F.col(domain_col) == dom, int(round((w - int(w)) * 1_000_000))
        ).otherwise(frac_w)
    gate = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("up:"), F.col(id_col).cast("string"))), 1, 15
            ),
            16,
            10,
        ).cast("long")
        % 1_000_000
    )
    n_copies = (base_w + F.when(gate < frac_w, 1).otherwise(0)).cast("long")
    return (
        df.select(id_col, domain_col, n_copies.alias("n_copies"))
        .filter(F.col("n_copies") > 0)
        .select(
            id_col,
            domain_col,
            F.explode(
                F.sequence(F.lit(1).cast("long"), F.col("n_copies"))
            ).alias("copy"),
        )
    )


def token_budget_select(
    df: DataFrame,
    budget: int,
    text_col: str = "text",
    n_buckets: int = 100,
) -> DataFrame:
    """Greedy quality-ranked corpus subsetting under a token budget: rank
    documents by the composite quality score (quality desc, doc_id
    tiebreak) and keep the prefix whose CUMULATIVE token count stays
    within ``budget`` — the standard "best N tokens" selection step that
    sizes a training mix.

    Scale shape — the global prefix sum is computed WITHOUT a
    single-partition window over the corpus (the naive
    ``Window.orderBy(...)`` with no partition key serializes the whole
    table through one task): documents are range-bucketed by their
    (bounded-domain) quality score, per-bucket token totals collapse to
    an ``n_buckets``-row frame whose exclusive prefix sum is the only
    unpartitioned window (tiny by construction), and each document's
    global cumulative count = its bucket's offset + a within-bucket
    running sum (window PARTITIONED by bucket). Ordering across buckets
    agrees with ordering within them because the bucket key is a
    truncation of the same rounded quality score. All sums are exact
    integers, so the cut is bit-reproducible."""
    from pyspark.sql import Window

    from .text import quality_expr, token_count

    base = df.select(
        "doc_id",
        quality_expr(text_col).alias("quality"),
        token_count(F.col(text_col)).cast("long").alias("n_tokens"),
    ).withColumn("__bucket", F.floor(F.col("quality") * n_buckets).cast("long"))
    totals = base.groupBy("__bucket").agg(F.sum("n_tokens").alias("__btok"))
    wb = Window.orderBy(F.col("__bucket").desc())
    offsets = totals.select(
        "__bucket",
        (F.coalesce(F.sum("__btok").over(wb), F.lit(0)) - F.col("__btok")).alias("__off"),
    )
    ww = Window.partitionBy("__bucket").orderBy(
        F.col("quality").desc(), F.col("doc_id")
    )
    out = (
        base.join(F.broadcast(offsets), "__bucket")
        .withColumn("cum_tokens", F.col("__off") + F.sum("n_tokens").over(ww))
        .filter(F.col("cum_tokens") <= budget)
    )
    return out.select("doc_id", "quality", "n_tokens", "cum_tokens")


def hashed_linear_classifier(
    df: DataFrame, text_col: str = "text", dim: int = 512, seed: int = 11
) -> DataFrame:
    """fastText-style linear text classifier INFERENCE (Joulin et al. 2017,
    "Bag of Tricks for Efficient Text Classification") over hashed bag-of-
    words features — the shape of every learned quality/toxicity gate large
    corpus pipelines run (e.g. the CCNet/RefinedWeb quality classifiers).

    Feature hashing (Weinberger et al. 2009): token t contributes
    sign(t) * w[bucket(t)] where bucket is the portable md5 bucket
    (sketches.cm_bucket family) and sign is an independent md5 hex digit's
    parity — the unbiasing sign hash of the hashing trick. The "model" is a
    deterministic integer weight table w[b] = (b*2654435761 mod 2001) - 1000
    milli-units (a stand-in for trained weights — inference cost and plan
    shape are identical; a real model would broadcast the same-sized
    array). Margin = sum(signed milli-weights) / (1000 * n_tokens); the
    probability is the rational fast-sigmoid 0.5 + m / (2*(1+|m|))
    (Elliott 1993) — no exp(), so both engines compute bit-identical
    doubles from the exact-integer margin numerator.

    SCALE: the entire scorer is ONE narrow JVM projection — tokenize,
    hash, weigh, and fold per document with array higher-order functions
    (HOFs evaluate as interpreted JVM expressions — not codegen-fused,
    but never Python). Zero shuffles, zero joins, zero Python; at 100 TB
    it is a single map-only pass, and `keep` stays integer-exact
    (margin_milli > 0) regardless of float rounding.
    """
    toks = F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(r"\S+"), 0)
    h = "md5(concat('%d:', t))" % seed
    signed_w = (
        f"(1L - 2L * (CAST(conv(substring({h}, 7, 1), 16, 10) AS BIGINT) % 2L)) * "
        f"((CAST(conv(substring({h}, 1, 6), 16, 10) AS BIGINT) % {dim}L) "
        f"* 2654435761L % 2001L - 1000L)"
    )
    # The lambda-column API can't splice a SQL fragment over the lambda
    # variable; build the whole fold as one SQL expression instead.
    fold = (
        f"aggregate(transform(regexp_extract_all(lower({text_col}), '\\\\S+', 0), "
        f"t -> {signed_w}), 0L, (acc, x) -> acc + x)"
    )
    # null text degrades like the oracle's LEFT JOIN: 0 tokens, margin 0,
    # prob 0.5, keep false (size()/aggregate() would propagate NULL)
    base = df.select(
        "doc_id",
        F.coalesce(F.size(toks).cast("long"), F.lit(0).cast("long")).alias("n_tokens"),
        F.coalesce(F.expr(fold), F.lit(0).cast("long")).alias("margin_milli"),
    )
    m = F.when(F.col("n_tokens") == 0, F.lit(0.0)).otherwise(
        F.col("margin_milli").cast("double") / (1000.0 * F.col("n_tokens"))
    )
    return base.select(
        "doc_id",
        "n_tokens",
        (F.floor(m * 1e6 + F.lit(0.5)) / 1e6).alias("margin"),
        (F.floor((F.lit(0.5) + m / (2 * (1 + F.abs(m)))) * 1e6 + F.lit(0.5)) / 1e6).alias(
            "prob"
        ),
        (F.col("margin_milli") > 0).alias("keep"),
    )


def quantile_normalize(
    df: DataFrame, text_col: str = "text", by: str = "source", n_buckets: int = 100
) -> DataFrame:
    """Per-source quantile normalization (quantile matching) of the
    composite quality score — the cross-source calibration step mixed
    corpora need before one global quality cut: a score's meaning is
    its RANK within its own source, so each document is remapped to the
    GLOBAL score at the same relative rank. Standard quantile
    normalization (Bolstad et al. 2003, brought to corpus mixing by
    multi-source pipelines where per-source quality scales differ).

    All rank arithmetic is exact integers: the target global index is
    round((r-1)*(N-1)/(n_s-1)) computed by integer division, so both
    engines agree bit-for-bit; the remapped value is an existing score,
    never an interpolation.

    SCALE: the global rank uses the bucketed two-phase prefix sum
    (token_budget_select pattern) — the only unpartitioned window runs
    over the ~n_buckets bucket-count frame, never the data; within-bucket
    ranks are partitioned windows. The rank→value remap is a shuffle
    equi-join on the integer rank. No single-partition window at any
    size.
    """
    from pyspark.sql import Window

    from .text import quality_expr

    base = df.select(
        "doc_id",
        F.col(by).alias("source"),
        F.coalesce(quality_expr(text_col), F.lit(0.0)).alias("quality"),
    ).withColumn("__bucket", F.floor(F.col("quality") * n_buckets).cast("long"))
    totals = base.groupBy("__bucket").agg(F.count("*").alias("__bn"))
    wb = Window.orderBy("__bucket")
    offsets = totals.select(
        "__bucket",
        (F.coalesce(F.sum("__bn").over(wb), F.lit(0)) - F.col("__bn")).alias("__off"),
    )
    ww = Window.partitionBy("__bucket").orderBy("quality", "doc_id")
    ranked = (
        base.join(F.broadcast(offsets), "__bucket")
        .withColumn("rn", (F.col("__off") + F.row_number().over(ww)).cast("long"))
    )
    tot = ranked.agg(F.count("*").alias("__n_all"))
    ws = Window.partitionBy("source").orderBy("quality", "doc_id")
    wn = Window.partitionBy("source")
    withidx = (
        ranked.crossJoin(F.broadcast(tot))
        .withColumn("src_rank", F.row_number().over(ws).cast("long"))
        .withColumn("n_src", F.count("*").over(wn).cast("long"))
        .withColumn(
            "__idx",
            F.when(
                F.col("n_src") == 1,
                F.expr("(__n_all - 1) div 2"),
            ).otherwise(
                F.expr(
                    "((src_rank - 1) * (__n_all - 1) * 2 + (n_src - 1)) "
                    "div ((n_src - 1) * 2)"
                )
            )
            + 1,
        )
    )
    lookup = ranked.select(
        F.col("rn").alias("__rn"), F.col("quality").alias("norm_quality")
    )
    return withidx.join(lookup, withidx["__idx"] == lookup["__rn"]).select(
        "doc_id", "source", "quality", "src_rank", "n_src", "norm_quality"
    )
