"""Text-analysis operators for training-data pipelines: token stats,
language ID, quality scoring, fingerprinting (extension tier — the
reference has no string functions at all, SURVEY.md §2.2 note).

All expressions are built-in pyspark.sql.functions (JVM-side, codegen) —
no Python UDFs in any hot path. Regexes are chosen to behave identically
under Java regex (Spark) and RE2 (DuckDB oracle): ASCII classes, \\S, \\b.

Float determinism: scores use only +,*,/,min/max on doubles (bit-identical
across engines); rounding via the IEEE floor formula (functions.cents
rationale).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TOKEN_RE = r"\S+"


def chunk_documents(
    df, chunk_tokens: int = 64, overlap: int = 16, text_col: str = "text", id_col: str = "doc_id"
):
    """Split documents into overlapping token-window chunks — the standard
    LLM-training preprocessing step. Chunk starts advance by
    (chunk_tokens - overlap); the final partial chunk is kept. One output
    row per chunk, all JVM-side (sequence → slice → array_join), so a
    100 TB corpus fans out without a UDF."""
    from pyspark.sql import functions as F

    step = chunk_tokens - overlap
    toks = F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_RE), 0)
    starts = F.sequence(F.lit(0), F.greatest(F.size(toks) - 1, F.lit(0)), F.lit(step))
    chunks = F.transform(
        starts,
        lambda s: F.struct(
            (s / step).cast("long").alias("chunk_id"),
            F.array_join(F.slice(toks, s + 1, chunk_tokens), " ").alias("chunk_text"),
            F.least(F.size(toks) - s, F.lit(chunk_tokens)).cast("long").alias("n_tokens"),
        ),
    )
    return (
        df.filter(F.size(toks) > 0)
        .select(F.col(id_col), F.explode(chunks).alias("c"))
        .select(
            id_col,
            F.col("c.chunk_id").alias("chunk_id"),
            F.col("c.chunk_text").alias("chunk_text"),
            F.col("c.n_tokens").alias("n_tokens"),
        )
    )


def redact_patterns(df, text_col: str = "text", out_col: str = "redacted"):
    """Pattern scrubbing (PII-style): long digit runs and email-shaped
    tokens replaced with typed placeholders. Portable regexes (identical
    under Java regex and RE2-family engines), applied JVM-side."""
    from pyspark.sql import functions as F

    emails = F.regexp_replace(
        F.col(text_col), r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"
    )
    digits = F.regexp_replace(emails, r"\d{6,}", "<NUM>")
    return df.withColumn(out_col, digits)
PUNCT_RE = r"[[:punct:]]"  # DuckDB spelling; Spark uses \p{Punct} (same ASCII set)
SPARK_PUNCT_RE = r"\p{Punct}"

# Marker words per language for the n-gram/stopword heuristic. Word-boundary
# \b is ASCII-identical in Java regex and RE2.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "value"],
    "de": ["der", "die", "das", "und"],
    "fr": ["le", "la", "les", "et"],
    "es": ["el", "los", "las", "y"],
    "it": ["il", "lo", "gli", "e"],
}

STOPWORDS = ["the", "a", "an", "and", "of", "to", "in"]


def count_matches(c: Column, pattern: str) -> Column:
    """# of regex matches (Spark side). Oracle twin: len(regexp_extract_all(...))."""
    return F.regexp_count(c, F.lit(pattern))


def token_count(c: Column) -> Column:
    return count_matches(c, TOKEN_RE)


def punct_count(c: Column) -> Column:
    return count_matches(c, SPARK_PUNCT_RE)


def stopword_count(c: Column) -> Column:
    pat = r"\b(" + "|".join(STOPWORDS) + r")\b"
    return count_matches(F.lower(c), pat)


def round6(c: Column) -> Column:
    """IEEE-deterministic 6-decimal rounding (see functions.cents)."""
    return F.floor(c * 1e6 + F.lit(0.5)) / 1e6


def text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document stats: chars, tokens, punctuation, stopwords, ratios."""
    c = F.col(text_col)
    toks = token_count(c)
    return df.select(
        "doc_id",
        F.length(c).alias("n_chars"),
        toks.cast("long").alias("n_tokens"),
        punct_count(c).cast("long").alias("n_punct"),
        stopword_count(c).cast("long").alias("n_stopwords"),
        round6(F.length(c) / F.greatest(toks, F.lit(1))).alias("avg_token_len"),
    )


def quality_expr(text_col: str = "text") -> Column:
    """The composite quality score as a scan-local Column expression —
    callers gating a corpus should ``withColumn`` this, never join a
    quality frame back onto the corpus (a row-local score costs zero
    shuffles; a join costs one plus a second scan)."""
    c = F.col(text_col)
    toks = token_count(c).cast("double")
    stop_ratio = stopword_count(c) / F.greatest(toks, F.lit(1.0))
    punct_ratio = punct_count(c) / F.greatest(F.length(c).cast("double"), F.lit(1.0))
    length_signal = F.least(toks, F.lit(100.0)) / 100.0
    return round6(stop_ratio * 0.4 + length_signal * 0.3 + (1 - punct_ratio) * 0.3)


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Composite quality score in [0,1]: stopword signal + length signal +
    punctuation cleanliness. Pure rational arithmetic (no exp/log) so the
    oracle matches bit-for-bit."""
    c = F.col(text_col)
    toks = token_count(c).cast("double")
    stop_ratio = stopword_count(c) / F.greatest(toks, F.lit(1.0))
    punct_ratio = punct_count(c) / F.greatest(F.length(c).cast("double"), F.lit(1.0))
    return df.select(
        "doc_id",
        round6(stop_ratio).alias("stop_ratio"),
        round6(punct_ratio).alias("punct_ratio"),
        quality_expr(text_col).alias("quality"),
    )


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """N-gram/marker-word language ID: score = marker hits per language,
    predicted = argmax with alphabetical tiebreak (deterministic)."""
    lc = F.lower(F.col(text_col))
    scores = {
        lang: count_matches(lc, r"\b(" + "|".join(words) + r")\b")
        for lang, words in LANG_MARKERS.items()
    }
    # argmax via a struct-max trick would be opaque; explicit chained CASE
    # keeps SQL/Spark twins literally parallel.
    langs = sorted(LANG_MARKERS)
    best = F.lit(langs[0])
    best_score = scores[langs[0]]
    for lang in langs[1:]:
        cond = scores[lang] > best_score
        best = F.when(cond, F.lit(lang)).otherwise(best)
        best_score = F.when(cond, scores[lang]).otherwise(best_score)
    out = [F.col("doc_id")] + [scores[lang].cast("long").alias(f"score_{lang}") for lang in langs]
    return df.select(*out, best.alias("pred_lang"))


def doc_terms(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, term) pairs — lowercase whitespace tokens, duplicates kept
    (term frequency lives in the multiplicity). One explode, no shuffle."""
    toks = F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_RE), 0)
    return df.select("doc_id", F.explode(toks).alias("term"))


def tfidf_top_terms(df: DataFrame, text_col: str = "text", top_k: int = 5) -> DataFrame:
    """Top-k most characteristic terms per document by tf-idf.

    Weighting is the LOG-FREE smoothed variant ``tf * (N+1)/(df+1)`` — a
    strictly monotone transform of add-one log-idf per term, chosen because
    +,*,/ on doubles are bit-identical across engines while ln() can differ
    in the last ulp and flip a rank (functions.cents rationale). Extension
    tier: the reference has no string functions at all (SURVEY.md §2.2).

    Scale shape: ONE explode → ONE (doc, term) hash aggregate (the
    posting-list frame, persisted — it is the corpus's aggregated
    inverted index and every downstream statistic derives from it:
    df(term) is just its per-term row count, so the corpus is never
    re-exploded) → equi-join on term → per-doc top-k via ROW_NUMBER
    window. No cross join; N arrives as a broadcast scalar from a
    metadata-only count scan.
    """
    from pyspark.sql import Window

    tok = doc_terms(df, text_col)
    # reuse-not-cache (cachectl.py): the posting-list aggregate lands in a
    # term-keyed repartition exchange; the df(term) aggregate and the
    # scoring join both re-read it, so the corpus explodes exactly once
    # and nothing persists
    tf = (
        tok.groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
        .repartition("term")
    )
    # one row per (doc, term) ⇒ per-term row count IS count_distinct(doc)
    dft = tf.groupBy("term").agg(F.count("*").alias("df_docs"))
    n = df.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(dft, "term")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "score",
            round6(F.col("tf") * (F.col("n_docs") + F.lit(1.0)) / (F.col("df_docs") + F.lit(1.0))),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= top_k)
        .select("doc_id", "term", "tf", "df_docs", "score", F.col("rnk").cast("long").alias("rnk"))
    )


def bm25_rank(
    df: DataFrame,
    query_terms: list[str],
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 50,
) -> DataFrame:
    """BM25-family keyword relevance: top-k documents for a bag of query
    terms. Per-term weight is the raw Robertson idf ratio
    ``(N - df + 0.5)/(df + 0.5)`` WITHOUT the usual ln() — same per-term
    ranking (ln is monotone), bit-reproducible across engines (module
    docstring / functions.cents rationale); documented deviation from the
    textbook formula.

    Determinism choreography: dl and tf are integers; avgdl = int-sum / n
    (single exact division); the per-document score sums one term at a
    time IN THE LITERAL ORDER of ``query_terms`` via conditional
    aggregation — never a float SUM over an engine-ordered group.

    Scale shape (r12 — map-side rewrite, guide §2.3 "aggregate before
    you shuffle" taken to its limit): dl and the per-term tfs are
    computed per document FROM THE TOKEN ARRAY (``size`` /
    filtered-``size`` — no explode, no row multiplication), so the
    whole query is two corpus map passes and ZERO data-sized shuffles:
    (1) one aggregate over the per-doc stat rows yields every scalar at
    once (N, avgdl, df(term) per term — a 1-row broadcast); (2) the
    scoring pass re-derives the per-doc stats, cross-joins the scalar
    row, and feeds TakeOrderedAndProject. The former shape exploded the
    corpus twice and shuffled it twice (doc-keyed dl aggregate,
    term-keyed tf repartition) plus a tf⋈dl sort-merge join — all of it
    reconstructing per-document numbers that the document row already
    knew. Values are bit-identical: same integer dl/tf/df inputs, same
    float expression tree in the same literal-order sum
    (oracle-pinned)."""
    toks = F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_RE), 0)
    tf_cols = [
        F.size(F.filter(toks, lambda x: x == F.lit(t))).cast("long").alias(f"tf_{i}")
        for i, t in enumerate(query_terms)
    ]
    # one row per input row; null text ⇒ dl = size(null) = -1 (excluded
    # from avgdl and from matching below, like the exploded form where a
    # null text produced no token rows)
    per_doc = df.select("doc_id", F.size(toks).cast("long").alias("dl"), *tf_cols)
    has_dl = F.col("dl") >= 1
    scalars = per_doc.agg(
        F.count("*").alias("n_docs"),
        (
            F.sum(F.when(has_dl, F.col("dl")))
            / F.sum(has_dl.cast("long"))
        ).alias("avgdl"),
        *[
            F.sum((F.col(f"tf_{i}") >= 1).cast("long")).alias(f"df_{i}")
            for i in range(len(query_terms))
        ],
    )
    matched = per_doc.filter(
        F.greatest(*[F.col(f"tf_{i}") for i in range(len(query_terms))]) >= 1
        if len(query_terms) > 1
        else F.col("tf_0") >= 1
    )
    base = matched.crossJoin(F.broadcast(scalars))
    total = None
    for i in range(len(query_terms)):
        idf = (F.col("n_docs") - F.col(f"df_{i}") + F.lit(0.5)) / (
            F.col(f"df_{i}") + F.lit(0.5)
        )
        denom = F.col(f"tf_{i}") + F.lit(k1) * (
            F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("dl") / F.col("avgdl")
        )
        part = idf * F.col(f"tf_{i}") * F.lit(k1 + 1.0) / denom
        term_score = F.coalesce(
            F.when(F.col(f"tf_{i}") >= 1, part), F.lit(0.0)
        )
        total = term_score if total is None else total + term_score
    pivoted = base
    from pyspark.sql import Window

    # global top-k as sort+limit (planned as TakeOrderedAndProject — a
    # per-partition heap + driver merge of k rows, never a full sort); the
    # rank window then runs over only k rows
    top = (
        pivoted.select("doc_id", "dl", round6(total).alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(top_k)
    )
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return top.select(
        "doc_id", "dl", "score", F.row_number().over(w).cast("long").alias("rnk")
    )


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic document fingerprint: md5 of the whitespace/punct-
    normalized lowercase text — the exact-dedup key for noisy duplicates."""
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"[^a-z0-9]+", " "))
    return df.select("doc_id", F.md5(norm).alias("fp"))


def weighted_sample(
    df: DataFrame,
    weight_col: Column | str,
    k: int,
    seed: int = 0,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic weighted sampling without replacement (Efraimidis–
    Spirakis A-ES): each row draws a uniform u from a hash of (seed, id)
    and gets priority u^(1/w); the k highest priorities are the sample.
    Inclusion probability is proportional to weight, and because u comes
    from md5 — not an RNG — the sample is reproducible across runs,
    partitionings, and cluster sizes (re-running a 100 TB corpus job
    yields the same training subset; randomSplit/sample cannot promise
    that under repartitioning).

    Plan shape: scan-local priority computation + global top-k
    (TakeOrderedAndProject — per-partition heaps, no full sort). The
    transcendental pow() keeps this out of the DuckDB oracle set (ln/pow
    are not bit-stable across engines); determinism and weight-bias are
    pinned by property tests instead."""
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    # u in (0,1): 2^24-bucket md5 hash, offset by 0.5 so u is never 0 or 1
    h = F.conv(F.substring(F.md5(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string"))), 1, 6), 16, 10).cast("long")
    u = (h.cast("double") + 0.5) / F.lit(float(1 << 24))
    priority = F.pow(u, 1.0 / w.cast("double"))
    return df.withColumn("__priority", priority).orderBy(F.desc("__priority"), F.asc(id_col)).limit(k)


def cdc_chunks(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Content-defined chunking: a token ENDS its chunk when md5(token)
    starts with '0' (p = 1/16 → mean chunk ≈ 16 tokens). Unlike
    fixed-stride windows (chunk_documents), boundaries are decided by
    CONTENT, so inserting or deleting text early in a document only
    perturbs the chunks it touches — every later chunk keeps its digest,
    which is what makes chunk-level dedup robust to edits (the rsync /
    LBFS rolling-hash idea, md5-gated here so the DuckDB oracle can
    reproduce boundaries verbatim).

    All JVM-side array ops, no explode-shuffle: boundary positions →
    (start, end) spans → one slice per chunk; chunk ids are indexes in
    the UNFILTERED span list so they're stable across engines before the
    empty-span filter. Output: (doc_id, chunk_id, n_tokens, digest)."""
    toks = F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_RE), 0)
    d = df.select(id_col, toks.alias("__toks")).filter(F.size("__toks") > 0)
    # 0-based positions whose token closes a chunk
    bpos = F.filter(
        F.sequence(F.lit(0), F.size("__toks") - 1),
        lambda i: F.md5(F.element_at("__toks", i + 1)).startswith("0"),
    )
    starts = F.concat(F.array(F.lit(0)), F.transform(bpos, lambda p: p + 1))
    ends = F.concat(F.transform(bpos, lambda p: p + 1), F.array(F.size("__toks")))
    spans = d.select(
        id_col,
        F.col("__toks"),
        starts.alias("__starts"),
        ends.alias("__ends"),
    )
    idx = F.sequence(F.lit(0), F.size("__starts") - 1)
    chunks = F.transform(
        idx,
        lambda i: F.struct(
            i.cast("long").alias("chunk_id"),
            (F.element_at("__ends", i + 1) - F.element_at("__starts", i + 1))
            .cast("long")
            .alias("n_tokens"),
            F.array_join(
                F.slice(
                    F.col("__toks"),
                    F.element_at("__starts", i + 1) + 1,
                    F.element_at("__ends", i + 1) - F.element_at("__starts", i + 1),
                ),
                " ",
            ).alias("chunk_text"),
        ),
    )
    out = spans.select(id_col, F.explode(F.filter(chunks, lambda c: c["n_tokens"] > 0)).alias("c"))
    return out.select(
        id_col,
        F.col("c.chunk_id").alias("chunk_id"),
        F.col("c.n_tokens").alias("n_tokens"),
        F.md5(F.col("c.chunk_text")).alias("digest"),
    )


def _token_ngrams(toks: Column, n: int) -> Column:
    """Array of space-joined token n-grams (empty when < n tokens)."""
    starts = F.when(
        F.size(toks) >= n, F.sequence(F.lit(1), F.size(toks) - n + 1)
    ).otherwise(F.array().cast("array<int>"))
    return F.transform(starts, lambda s: F.array_join(F.slice(toks, s, n), " "))


def repetition_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style intra-document repetition metrics (Rae et al. 2021,
    "Scaling Language Models", App. A quality filters), token-granular:

    - ``top_bigram_count`` / ``top_bigram_frac``: occurrences of the most
      frequent word bigram and the fraction of tokens it covers
      (2*count / n_tokens) — high values flag boilerplate/spam.
    - ``dup_3gram_frac``: fraction of 3-gram OCCURRENCES that belong to a
      3-gram appearing >= 2 times within the document — the "fraction of
      text inside repeated n-grams" filter.

    Distributed shape: one explode of tagged n-grams -> (doc_id, n, gram)
    hash aggregate -> per-doc merge; never materializes a per-doc map.
    All counts are exact integers; the two fractions divide once at the
    end (round6) so the DuckDB oracle matches bit-for-bit."""
    toks = F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_RE), 0)
    # reuse-not-cache (cachectl.py): the tokenized frame lands in a
    # doc-keyed repartition exchange; the n-gram explode and the final
    # id/n_tokens join both re-read it, so the corpus is tokenized once
    # and nothing persists
    base = (
        df.na.drop(subset=[text_col])
        .select("doc_id", toks.alias("__toks"))
        .select("doc_id", F.size("__toks").cast("long").alias("n_tokens"), F.col("__toks"))
        .repartition("doc_id")
    )
    tagged = base.select(
        "doc_id",
        F.explode(
            F.array(
                F.struct(F.lit(2).alias("n"), _token_ngrams(F.col("__toks"), 2).alias("gs")),
                F.struct(F.lit(3).alias("n"), _token_ngrams(F.col("__toks"), 3).alias("gs")),
            )
        ).alias("e"),
    ).select("doc_id", F.col("e.n").alias("n"), F.explode("e.gs").alias("gram"))
    counts = tagged.groupBy("doc_id", "n", "gram").agg(F.count("*").alias("cnt"))
    # s2 and s3 are two filter branches — they share per_n's aggregate
    # exchange via ReuseExchange, so the explode + two-level aggregate
    # execute once (reuse-not-cache, cachectl.py)
    per_n = counts.groupBy("doc_id", "n").agg(
        F.max("cnt").alias("mx"),
        F.sum("cnt").alias("tot"),
        F.sum(F.when(F.col("cnt") >= 2, F.col("cnt")).otherwise(F.lit(0))).alias("dup"),
    )
    s2 = per_n.filter(F.col("n") == 2).select("doc_id", F.col("mx").alias("top2"))
    s3 = per_n.filter(F.col("n") == 3).select(
        "doc_id", F.col("dup").alias("dup3"), F.col("tot").alias("tot3")
    )
    out = base.select("doc_id", "n_tokens").join(s2, "doc_id", "left").join(s3, "doc_id", "left")
    return out.select(
        "doc_id",
        "n_tokens",
        F.coalesce(F.col("top2"), F.lit(0)).cast("long").alias("top_bigram_count"),
        round6(
            2.0 * F.coalesce(F.col("top2"), F.lit(0)) / F.greatest(F.col("n_tokens"), F.lit(1))
        ).alias("top_bigram_frac"),
        round6(
            F.coalesce(F.col("dup3"), F.lit(0)).cast("double")
            / F.greatest(F.coalesce(F.col("tot3"), F.lit(0)), F.lit(1))
        ).alias("dup_3gram_frac"),
    )


def crossdoc_ngram_scrub(df: DataFrame, n: int = 8, text_col: str = "text") -> DataFrame:
    """Substring-level cross-document dedup (the token-n-gram analog of
    suffix-array dedup in Lee et al. 2022, "Deduplicating Training Data
    Makes Language Models Better"): any n-gram of tokens that appears in
    >= 2 DISTINCT documents is scrubbed from every document, and the
    surviving tokens are re-joined in order. Catches boilerplate runs that
    document-level near-dup (MinHash/SimHash) keeps, because the documents
    themselves differ.

    Distributed shape (never all-pairs):
      1. explode (doc_id, start, gram) — one row per n-gram occurrence;
      2. gram -> count(distinct doc_id) hash aggregate; shared = cnt >= 2
         (a small frame at corpus scale: only grams that actually repeat);
      3. equi-join occurrences to shared grams, explode covered positions,
         distinct — per-doc covered-position set;
      4. anti-join token positions against covered, re-assemble with an
         in-group sort (array_sort(collect_list(struct(pos, tok)))).
    Shuffles are keyed on gram then (doc_id, pos) — both well-spread; the
    gram join inherits AQE skew splitting for degenerate corpora.

    Output: (doc_id, n_tokens, n_scrubbed, scrubbed_text); docs whose
    every token is covered stay present with scrubbed_text = ''."""
    toks = F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_RE), 0)
    # doc-keyed repartition barrier: one tokenize pass re-read by the
    # n-gram explode and the re-assembly (reuse-not-cache, cachectl.py)
    base = (
        df.na.drop(subset=[text_col])
        .select("doc_id", toks.alias("__toks"))
        .repartition("doc_id")
    )
    starts = F.when(
        F.size("__toks") >= n, F.sequence(F.lit(1), F.size("__toks") - n + 1)
    ).otherwise(F.array().cast("array<int>"))
    occ = base.select(
        "doc_id", F.explode(starts).alias("s"), F.col("__toks")
    ).select("doc_id", "s", F.array_join(F.slice("__toks", F.col("s"), n), " ").alias("gram"))
    shared = (
        occ.groupBy("gram")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("gram")
    )
    covered = (
        occ.join(shared, "gram")
        .select("doc_id", F.explode(F.sequence(F.col("s"), F.col("s") + n - 1)).alias("pos"))
        .distinct()
    )
    positions = base.select(
        "doc_id", F.posexplode("__toks").alias("pos0", "tok")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "tok")
    kept = positions.join(covered, ["doc_id", "pos"], "left_anti")
    rebuilt = kept.groupBy("doc_id").agg(
        F.count("*").alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tok"))), lambda st: st["tok"]
            ),
            " ",
        ).alias("scrubbed_text"),
    )
    out = (
        base.select("doc_id", F.size("__toks").cast("long").alias("n_tokens"))
        .join(rebuilt, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            (F.col("n_tokens") - F.coalesce(F.col("n_kept"), F.lit(0))).cast("long").alias("n_scrubbed"),
            F.coalesce(F.col("scrubbed_text"), F.lit("")).alias("scrubbed_text"),
        )
    )
    return out


def domain_mixture_sample(
    df: DataFrame,
    targets: dict[str, int],
    domain_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic domain-mixture resampling: downsample each domain so
    the kept corpus matches a target mixture EXACTLY (the data-mixing step
    of LLM corpus builds — DoReMi/Pile-style domain weights, applied as
    hard caps rather than sampling rates so reruns are reproducible).

    ``targets`` maps domain value -> integer weight (any scale; only the
    ratios matter). Let S = min_d count_d / w_d. Each domain keeps
    desired_d = floor(S * w_d) documents — computed as
    MIN_e (count_e * w_d) div w_e, pure int64 (floor(min) == min(floor)
    because floor is monotone), so Spark and the SQL oracle agree
    bit-for-bit. WHICH documents survive is decided by ranking on
    (md5(id), id) within the domain: a content-independent, seedless,
    partitioning-independent order.

    Scale notes: the counts and desired frames are O(#domains) and
    broadcast; the only big-data shuffle is the per-domain rank. With few
    domains and billions of rows the window is the hot key — at that scale
    switch to the rate-based hash-Bernoulli form (stratified_sample) and
    accept +-epsilon mixture error; this operator is the exact-count form.

    Output (one row per domain present in both df and targets):
    (domain, n_total, n_kept, kept_digest) where kept_digest is md5 of the
    comma-joined kept ids in id order — a checksum of the SAMPLE ITSELF,
    not just its size."""
    from pyspark.sql import Window

    spark = df.sparkSession
    wdf = spark.createDataFrame(
        [(k, int(v)) for k, v in sorted(targets.items())], f"{domain_col} string, wt long"
    )
    eligible = df.join(F.broadcast(wdf), domain_col)
    # this O(#domains) frame feeds the desired-cap computation AND the
    # final n_total join — both re-read its aggregate exchange via
    # ReuseExchange, so the corpus-wide count scan runs once and nothing
    # persists (the corpus itself is deliberately never cached: the rank
    # pass re-reads 3 pruned columns, cheaper at scale than a
    # corpus-sized cache)
    counts = eligible.groupBy(domain_col, "wt").agg(F.count("*").alias("cnt"))
    d = counts.select(F.col(domain_col).alias("d_dom"), F.col("wt").alias("d_wt"))
    e = counts.select(F.col("wt").alias("e_wt"), F.col("cnt").alias("e_cnt"))
    desired = (
        # O(#domains²) pairs — broadcast hint so the tiny cross plans as
        # a broadcast loop, not a CartesianProduct exchange
        d.crossJoin(F.broadcast(e))
        .groupBy("d_dom")
        .agg(F.min(F.expr("e_cnt * d_wt div e_wt")).alias("desired"))
        .select(F.col("d_dom").alias(domain_col), "desired")
    )
    rn = F.row_number().over(
        Window.partitionBy(domain_col).orderBy(
            F.md5(F.col(id_col).cast("string")), F.col(id_col)
        )
    )
    kept = (
        eligible.select(domain_col, id_col)
        .withColumn("rn", rn)
        .join(F.broadcast(desired), domain_col)
        .filter(F.col("rn") <= F.col("desired"))
    )
    kept_agg = kept.groupBy(domain_col).agg(
        F.count("*").alias("n_kept"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.col(id_col))),
                    lambda x: x.cast("string"),
                ),
                ",",
            )
        ).alias("kept_digest"),
    )
    return (
        counts.select(domain_col, F.col("cnt").cast("long").alias("n_total"))
        .join(kept_agg, domain_col, "left")
        .select(
            domain_col,
            "n_total",
            F.coalesce(F.col("n_kept"), F.lit(0)).cast("long").alias("n_kept"),
            F.coalesce(F.col("kept_digest"), F.lit("")).alias("kept_digest"),
        )
    )


def token_diversity(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document lexical-diversity quality gate: Simpson repeat
    concentration (Σc²/N², exact rational — the probability two random
    token draws coincide) and unigram Shannon entropy (nats). Low-entropy
    / high-concentration documents are boilerplate, keyword spam, or
    decode garbage — a standard pre-training corpus filter alongside the
    Gopher repetition rules (operators/text.repetition_stats).

    Scale shape: one explode → ONE (doc_id, token) hash aggregate → one
    per-doc aggregate; all shuffles keyed on doc_id (well spread). The
    ``low_diversity`` verdict uses ONLY exact int64 arithmetic
    (2·Σc² > N² ⟺ Simpson > 0.5) so the flag can never float-drift.
    Entropy follows the drift-family ln choreography: ln of small exact
    ints per term (floored 1e-6), final floor 1e-4 — empirically
    hash-stable across engines at every SF.

    Output: (doc_id, n_tokens, n_distinct, simpson, entropy,
    low_diversity); tokenless docs keep a row with zeros/false."""
    # doc-keyed repartition barrier: one tokenize pass re-read by the
    # token explode and the final id join (reuse-not-cache, cachectl.py)
    base = (
        df.na.drop(subset=[text_col])
        .select(
            "doc_id",
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_RE), 0).alias(
                "__toks"
            ),
        )
        .repartition("doc_id")
    )
    counts = (
        base.select("doc_id", F.explode("__toks").alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("c"))
    )
    # entropy terms as exact int64 micro-units: the per-doc sum is then
    # order-free (a float sum of 1e-6 multiples can land on the final
    # rounding boundary and let accumulation order pick the digit)
    term_u = F.floor(F.col("c") * F.log(F.col("c")) * 1e6 + F.lit(0.5)).cast("long")
    st = counts.groupBy("doc_id").agg(
        F.sum("c").alias("n"),
        F.count("*").alias("nd"),
        F.sum(F.col("c") * F.col("c")).alias("ss"),
        F.sum(term_u).alias("slog_u"),
    )
    simpson = F.floor(F.col("ss").cast("double") / (F.col("n") * F.col("n")) * 1e6 + F.lit(0.5)) / 1e6
    entropy = (
        F.floor(
            (F.log(F.col("n")) - (F.col("slog_u").cast("double") / 1e6) / F.col("n"))
            * 1e4
            + F.lit(0.5)
        )
        / 1e4
    )
    return (
        base.select("doc_id")
        .join(st, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_tokens"),
            F.coalesce(F.col("nd"), F.lit(0)).cast("long").alias("n_distinct"),
            F.coalesce(simpson, F.lit(0.0)).alias("simpson"),
            F.coalesce(entropy, F.lit(0.0)).alias("entropy"),
            F.coalesce(
                F.lit(2) * F.col("ss") > F.col("n") * F.col("n"), F.lit(False)
            ).alias("low_diversity"),
        )
    )


def zipf_fit(
    df: DataFrame,
    text_col: str = "text",
    n_buckets: int = 128,
    rank_chunk: int = 1 << 18,
) -> DataFrame:
    """Corpus-level Zipf rank-frequency fit: OLS slope of ln(freq) on
    ln(rank) over the vocabulary (natural text ⇒ slope ≈ −1; a corpus
    whose slope collapses toward 0 is synthetic/templated, one that
    steepens is boilerplate-dominated — a cheap whole-corpus health
    metric next to the per-doc gates).

    Scale shape (r11 — replaces the unpartitioned row_number window over
    the FULL vocabulary, the r10-verdict scale-killer): the OLS consumes
    only moment SUMS of (ln rank, ln count), and within a frequency tie
    class every token shares y = ln(c), so which token gets which rank is
    irrelevant — ranks can be ENUMERATED per class instead of sorted per
    token. That matters beyond plan hygiene: ranking (c desc, tok) with
    the quantile-bucket trick would still put the whole hapax class
    (c = 1, ~half a web-scale vocabulary) in ONE window partition,
    because a bucket key must be a function of c alone to keep tie
    classes intact. Pipeline:

    1. (token → count) hash aggregate over the corpus, then
       (count → class size m) hash aggregate over the vocabulary — the
       distinct-frequency frame, O(sqrt(n_tokens)) rows.
    2. Each class's rank offset a = Σ m over classes with larger c, via
       quantile buckets of c whose EXCLUSIVE offsets ride TWO bounded
       eager probes (NOTE: plan construction triggers two small Spark
       jobs — the drift-family probe discipline): (1) cutpoints of c,
       (2) exact per-bucket class-size totals (≤ ``n_buckets`` rows
       collected, prefix-summed driver-side and broadcast back as a
       literal frame — no ordered-only window remains at all, r11
       review). Bucket = count of cutpoints above c (monotone along
       the c-desc sort order); the within-bucket running sum is a
       window PARTITIONED by bucket over distinct c values (no ties).
    3. Ranks a+1..a+m explode from bounded ``sequence`` chunks of
       ``rank_chunk``; chunk descriptors are hash-repartitioned first so
       a giant class (hapaxes) fans out across the cluster instead of
       generating inside one task.

    Exactly the oracle's multiset of (x, y) terms, so the closed-form
    OLS on 1e-6-floored ln terms (final 1e-4, drift-family choreography)
    is unchanged.

    Output: one row (n_terms, n_tokens, zipf_slope, zipf_intercept);
    vocabularies with < 2 terms yield null slope/intercept."""
    import operator
    from functools import reduce

    from pyspark.sql import Window

    counts = (
        df.na.drop(subset=[text_col])
        .select(
            F.explode(
                F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_RE), 0)
            ).alias("tok")
        )
        .groupBy("tok")
        .agg(F.count("*").alias("c"))
    )
    classes = counts.groupBy("c").agg(F.count("*").alias("m"))
    qs = [i / n_buckets for i in range(1, max(2, n_buckets))]
    # the two construction probes (cutpoints, then per-bucket class
    # sizes) both reduce `classes`; uncached, EACH re-ran the corpus
    # tokenize+count. scoped_cache shares ONE materialization of the
    # tiny distinct-frequency frame (O(sqrt(n_tokens)) rows) across
    # both probes — construction runs one corpus pass, not two (r11
    # opt); the cache releases before return, so the returned plan (one
    # further corpus pass at collect time) and cache hygiene are
    # untouched.
    from ..cachectl import scoped_cache

    with scoped_cache(classes):
        cuts_row = classes.agg(
            F.percentile_approx("c", qs, 10_000).alias("cuts")
        ).collect()[0]
        cuts = sorted({int(c) for c in (cuts_row["cuts"] or [])})
        # bucket = number of cutpoints strictly above c: monotone non-
        # decreasing along the (c desc) rank order, a function of c
        # alone. Plain sum of comparisons, not a HOF lambda (heaps_fit
        # rationale: constraint inference across the bucket join does
        # not re-map a lambda's outer reference — Spark 4.1
        # INTERNAL_ERROR).
        bucket = reduce(
            operator.add,
            [(F.col("c") < F.lit(cut).cast("long")).cast("long") for cut in cuts],
            F.lit(0).cast("long"),
        )
        # probe 2 (bounded: ≤ n_buckets rows): exact per-bucket
        # class-size totals, prefix-summed DRIVER-side into exclusive
        # offsets — a Spark-side boff branch would re-derive the whole
        # corpus→classes lineage a second time in the main plan (r11
        # review; the heaps_fit pattern)
        btotals = (
            classes.select(bucket.alias("__bucket"), "m")
            .groupBy("__bucket")
            .agg(F.sum("m").alias("__bm"))
            .collect()
        )
    spark = df.sparkSession
    run = 0
    boff_rows = []
    for r in sorted(btotals, key=lambda r: r["__bucket"]):
        boff_rows.append((int(r["__bucket"]), run))
        run += int(r["__bm"])
    boff = spark.createDataFrame(boff_rows, "__bucket long, __boff long")
    ww = (
        Window.partitionBy("__bucket")
        .orderBy(F.col("c").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    classes_off = (
        classes.withColumn("__bucket", bucket)
        .join(F.broadcast(boff), "__bucket")
        .select(
            "c",
            "m",
            (F.col("__boff") + F.coalesce(F.sum("m").over(ww), F.lit(0))).alias("__a"),
        )
    )
    # chunked rank enumeration: ceil(m / rank_chunk) descriptor rows per
    # class, spread by hash so one task never generates a whole class
    chunks = classes_off.select(
        "c",
        "m",
        "__a",
        F.explode(
            F.sequence(
                F.lit(0).cast("long"),
                F.floor((F.col("m") - 1) / F.lit(rank_chunk)).cast("long"),
            )
        ).alias("__j"),
    ).repartition(F.col("c"), F.col("__j"))
    lo = F.col("__a") + F.col("__j") * F.lit(rank_chunk) + 1
    hi = F.least(
        F.col("__a") + (F.col("__j") + 1) * F.lit(rank_chunk),
        F.col("__a") + F.col("m"),
    )
    ranks = chunks.select("c", F.explode(F.sequence(lo, hi)).alias("r"))
    x = F.floor(F.log(F.col("r")) * 1e6 + F.lit(0.5)) / 1e6
    y = F.floor(F.log(F.col("c")) * 1e6 + F.lit(0.5)) / 1e6
    terms = ranks.select(x.alias("x"), y.alias("y"), "c")
    m = terms.agg(
        F.count("*").alias("k"),
        F.sum("c").alias("n_tok"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    den = F.col("k") * F.col("sxx") - F.col("sx") * F.col("sx")
    slope = (F.col("k") * F.col("sxy") - F.col("sx") * F.col("sy")) / F.nullif(
        den, F.lit(0.0)
    )
    intercept = (F.col("sy") - slope * F.col("sx")) / F.col("k")
    return m.select(
        F.col("k").cast("long").alias("n_terms"),
        F.coalesce(F.col("n_tok"), F.lit(0)).cast("long").alias("n_tokens"),
        (F.floor(slope * 1e4 + F.lit(0.5)) / 1e4).alias("zipf_slope"),
        (F.floor(intercept * 1e4 + F.lit(0.5)) / 1e4).alias("zipf_intercept"),
    )


def unicode_nfc_report(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Unicode NFC normalization report — the canonicalization step every
    multilingual corpus pipeline runs before hashing/dedup (decomposed
    sequences like 'e' + U+0301 hash differently from their composed
    forms, silently defeating exact dedup). The corpus text is ASCII, so
    each document gets a deterministic DECOMPOSED suffix (by doc_id
    parity) to exercise composition and canonical reordering for real.

    Normalization runs in an Arrow-batched pandas UDF
    (unicodedata.normalize — Spark has no builtin NFC; batch transfer,
    never row-at-a-time), and the md5 of the normalized string is emitted
    so the DuckDB oracle (nfc_normalize, ICU) must agree BYTE-FOR-BYTE
    with Python's unicodedata tables — verified, they do. Lengths are
    codepoint counts computed Python-side (Spark's length() counts UTF-16
    units on astral input; the suffixes stay in the BMP regardless).

    SCALE: one scan, one Arrow stage, zero shuffles.
    """
    from ..functions import spread

    acute, ring, diaer = "\u0301", "\u030a", "\u0308"
    hostile = F.when(
        F.col("doc_id") % 2 == 0,
        F.concat(F.coalesce(F.col(text_col), F.lit("")), F.lit(" cafe" + acute)),
    ).otherwise(
        F.concat(
            F.coalesce(F.col(text_col), F.lit("")),
            F.lit(" A" + ring + "ngstro" + diaer + "m"),
        )
    )

    def _nfc_batches(batches):
        import hashlib
        import unicodedata

        import pandas as pd

        for pdf in batches:
            raw = pdf["__hostile"].fillna("")
            nfc = raw.map(lambda x: unicodedata.normalize("NFC", x))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "nfc_md5": nfc.map(
                        lambda x: hashlib.md5(x.encode("utf-8")).hexdigest()
                    ),
                    "changed": (nfc != raw).astype(bool),
                    "n_chars_raw": raw.map(len).astype("int64"),
                    "n_chars_nfc": nfc.map(len).astype("int64"),
                }
            )

    return (
        spread(df)
        .select("doc_id", hostile.alias("__hostile"))
        .mapInPandas(
            _nfc_batches,
            "doc_id long, nfc_md5 string, changed boolean, "
            "n_chars_raw long, n_chars_nfc long",
        )
    )


def pmi_pairs(
    df: DataFrame,
    text_col: str = "text",
    window: int = 3,
    min_count: int = 5,
    top: int = 50,
) -> DataFrame:
    """Skip-gram PMI association mining — the word2vec statistic (SGNS
    factorizes the shifted-PMI matrix, Levy & Goldberg 2014): unordered
    token pairs co-occurring within ``window`` positions, ranked by
    PMI(a,b) = ln(#(a,b)·|D| / (#(a)·#(b))) with pair-multiset
    marginals (#(a) = Σ_b #(a,b), |D| = total pairs — the word2vec
    convention).

    Scale shape: pair generation is IN-ROW (one flatten of per-offset
    transforms over the token array — no self-join, no positional
    explode), so the corpus pass is map-only into ONE (a, b) hash
    aggregate; marginals re-aggregate the pair counts (pair-magnitude
    data, not corpus-magnitude); the top-k is orderBy + limit, which
    plans as TakeOrderedAndProject — a per-partition bounded top-k
    merged on the driver, so no task ever holds more than ``top`` rows
    (ADVICE r9: the previous unpartitioned row_number window funneled
    every surviving pair through one task).
    Float discipline: every ln argument is an exact int64; each term
    floors to 1e-6 micro-units and the PMI RANKING key is the exact
    int64 micro-unit sum (no float ties) — final value floors 1e-4
    (drift-family ln choreography).

    Output: top ``top`` rows (tok_a, tok_b, n_pair, pmi), pairs with
    n_pair >= min_count, ordered by pmi desc then lexicographic."""
    toks = F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_RE), 0)

    def _pair_at(dd: int):
        # single-arg closure: a two-parameter lambda would make
        # F.transform bind the second parameter to the ELEMENT INDEX
        def pair(i):
            return F.struct(
                F.least(
                    F.element_at(F.col("__toks"), i + 1),
                    F.element_at(F.col("__toks"), i + 1 + dd),
                ).alias("a"),
                F.greatest(
                    F.element_at(F.col("__toks"), i + 1),
                    F.element_at(F.col("__toks"), i + 1 + dd),
                ).alias("b"),
            )

        return pair

    per_offset = []
    for d in range(1, window + 1):
        # sequence(0, n-1-d) is DESCENDING when n-1-d < 0 — guard short docs
        idx = F.when(
            F.size(F.col("__toks")) > d,
            F.sequence(F.lit(0), F.size(F.col("__toks")) - 1 - d),
        ).otherwise(F.array().cast("array<int>"))
        per_offset.append(F.transform(idx, _pair_at(d)))
    pairs = (
        df.na.drop(subset=[text_col])
        .select(toks.alias("__toks"))
        .select(F.explode(F.flatten(F.array(*per_offset))).alias("p"))
        .select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("n_pair"))
    )
    # pair-multiset marginals: each pair contributes its count to BOTH
    # sides' marginals (a self-pair contributes twice, the convention
    # that keeps Σ marg = 2|D|)
    sides = pairs.select(F.col("a").alias("tok"), "n_pair").unionAll(
        pairs.select(F.col("b").alias("tok"), "n_pair")
    )
    marg = sides.groupBy("tok").agg(F.sum("n_pair").alias("m"))
    total = pairs.agg(F.sum("n_pair").alias("D"))
    lnu = lambda c: F.floor(F.log(c) * 1e6 + F.lit(0.5)).cast("long")  # noqa: E731
    scored = (
        pairs.filter(F.col("n_pair") >= min_count)
        .join(marg.withColumnRenamed("tok", "a").withColumnRenamed("m", "ma"), "a")
        .join(marg.withColumnRenamed("tok", "b").withColumnRenamed("m", "mb"), "b")
        .crossJoin(F.broadcast(total))
        .withColumn(
            "__pmi_u",
            lnu(F.col("n_pair")) + lnu(F.col("D")) - lnu(F.col("ma")) - lnu(F.col("mb")),
        )
    )
    return (
        scored.orderBy(F.col("__pmi_u").desc(), F.col("a").asc(), F.col("b").asc())
        .limit(top)
        .select(
            F.col("a").alias("tok_a"),
            F.col("b").alias("tok_b"),
            F.col("n_pair").cast("long").alias("n_pair"),
            (F.floor(F.col("__pmi_u").cast("double") / 1e6 * 1e4 + F.lit(0.5)) / 1e4).alias(
                "pmi"
            ),
        )
    )


def source_token_divergence(
    df: DataFrame, text_col: str = "text", max_sources: int = 64
) -> DataFrame:
    """Pairwise corpus-slice divergence over token distributions — the
    domain-mixing diagnostic a pre-training data team runs before
    setting source weights: for every source pair, total variation
    distance (exact) and Jensen-Shannon divergence (nats).

    Float discipline, the part that makes this cross-engine exact:
    - TVD = Σ_t |c_p·N_q − c_q·N_p| / (2·N_p·N_q) — the numerator sum is
      EXACT (decimal(38,0) arithmetic end-to-end, so counts × totals
      never wrap an int64 even at web-corpus token totals), one final
      division, floor 1e-6. Pure rational arithmetic, order-free.
    - JSD = H(m) − (H(p)+H(q))/2 with every entropy in the ln-of-int
      form: H(m) works on the exact INTEGER mixture numerators
      n_t = c_p·N_q + c_q·N_p over the constant denominator 2·N_p·N_q,
      so ln never sees a computed ratio — only exact integer arguments
      (the drift-family choreography: per-term 1e-6 floors into
      decimal(38,0) micro-unit sums — DuckDB's integer sums widen to
      HUGEINT, Spark's to decimal — final floor 1e-4).

    Scale shape: one (source, token) hash aggregate over the corpus;
    the source list is a bounded driver collect (hard-checked against
    ``max_sources`` — the repo's capped-collect discipline), and each
    token row fans out IN-ROW to its source pairs by exploding ONE
    constant-folded literal array of (source_a, source_b, na, nb)
    structs, with the per-source counts looked up from the row's token
    map AFTER the explode — no self-join, no cartesian,
    vocabulary-magnitude data end-to-end. (ADVICE r9: the previous
    form inlined one struct arm per pair into a single projection —
    O(S²) expressions blew whole-stage codegen's 64 KB method limit at
    ~20 sources and silently fell back to interpreted evaluation; the
    literal array folds to one constant, so codegen sees two
    element_at lookups however many sources there are.) Output: one
    row per source pair — (source_a, source_b, n_tokens_a, n_tokens_b,
    vocab_union, tvd, jsd)."""
    st = (
        df.na.drop(subset=[text_col, "source"])
        .select(
            "source",
            F.explode(
                F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_RE), 0)
            ).alias("tok"),
        )
        .groupBy("source", "tok")
        .agg(F.count("*").alias("c"))
    )
    totals = {
        r["source"]: int(r["n"])
        for r in st.groupBy("source").agg(F.sum("c").alias("n")).collect()
    }
    sources = sorted(totals)
    spark = df.sparkSession
    if len(sources) < 2:
        return spark.createDataFrame(
            [],
            "source_a string, source_b string, n_tokens_a long, n_tokens_b long, "
            "vocab_union long, tvd double, jsd double",
        )
    if len(sources) > max_sources:
        raise ValueError(
            f"source_token_divergence fans every token row out to all "
            f"{len(sources) * (len(sources) - 1) // 2} source pairs "
            f"(sources={len(sources)} > max_sources={max_sources}); the "
            f"O(S²) pair blow-up is a deliberate hard check — raise "
            f"max_sources explicitly if the fan-out cost is intended"
        )
    per_tok = st.groupBy("tok").agg(
        F.map_from_entries(F.collect_list(F.struct("source", "c"))).alias("m")
    )
    # ONE literal array of pair structs (constant-folded by Catalyst into
    # a single Literal), exploded per vocabulary row; the per-source
    # counts are two element_at map lookups AFTER the explode — codegen
    # stays O(1) in source count (docstring / ADVICE r9)
    pair_lits = F.array(
        *[
            F.struct(
                F.lit(sa).alias("source_a"),
                F.lit(sb).alias("source_b"),
                F.lit(totals[sa]).alias("na"),
                F.lit(totals[sb]).alias("nb"),
            )
            for i, sa in enumerate(sources)
            for sb in sources[i + 1:]
        ]
    )
    vocab = (
        per_tok.select("m", F.explode(pair_lits).alias("p"))
        .select(
            F.col("p.source_a").alias("source_a"),
            F.col("p.source_b").alias("source_b"),
            F.coalesce(F.element_at("m", F.col("p.source_a")), F.lit(0))
            .cast("long")
            .alias("ca"),
            F.coalesce(F.element_at("m", F.col("p.source_b")), F.lit(0))
            .cast("long")
            .alias("cb"),
            F.col("p.na").alias("na"),
            F.col("p.nb").alias("nb"),
        )
        .filter((F.col("ca") > 0) | (F.col("cb") > 0))
    )
    lnu = lambda c: F.floor(F.log(c) * 1e6 + F.lit(0.5)).cast("long")  # noqa: E731
    # all cross products and their sums run in decimal(38,0): the
    # entropy micro-unit terms overflow int64 around ~1e9 tokens/source
    # (num ~ c·N ~ 1e15 times lnu ~ 3.5e7), and the factors themselves
    # would overflow a long first at extreme counts — decimal end-to-end
    # matches DuckDB, whose integer SUM/products widen to HUGEINT
    dec = "decimal(38,0)"
    ca_d, cb_d = F.col("ca").cast(dec), F.col("cb").cast(dec)
    na_d, nb_d = F.col("na").cast(dec), F.col("nb").cast(dec)
    num = ca_d * nb_d + cb_d * na_d  # mixture numerator, exact decimal
    terms = vocab.select(
        "source_a", "source_b", "na", "nb",
        F.abs(ca_d * nb_d - cb_d * na_d).alias("__tv_num"),
        (num * lnu(num).cast(dec)).alias("__m_u"),
        F.when(F.col("ca") > 0, ca_d * lnu(F.col("ca")).cast(dec))
        .otherwise(F.lit(0).cast(dec)).alias("__p_u"),
        F.when(F.col("cb") > 0, cb_d * lnu(F.col("cb")).cast(dec))
        .otherwise(F.lit(0).cast(dec)).alias("__q_u"),
    )
    g = terms.groupBy("source_a", "source_b", "na", "nb").agg(
        F.count("*").alias("vocab_union"),
        F.sum("__tv_num").alias("tvn"),
        F.sum("__m_u").alias("smu"),
        F.sum("__p_u").alias("spu"),
        F.sum("__q_u").alias("squ"),
    )
    na, nb = F.col("na").cast("double"), F.col("nb").cast("double")
    denom = 2.0 * na * nb
    h_m = F.log(denom) - (F.col("smu").cast("double") / 1e6) / denom
    h_p = F.log(na) - (F.col("spu").cast("double") / 1e6) / na
    h_q = F.log(nb) - (F.col("squ").cast("double") / 1e6) / nb
    jsd = h_m - (h_p + h_q) / 2.0
    tvd = F.col("tvn").cast("double") / denom
    return g.select(
        "source_a",
        "source_b",
        F.col("na").cast("long").alias("n_tokens_a"),
        F.col("nb").cast("long").alias("n_tokens_b"),
        F.col("vocab_union").cast("long").alias("vocab_union"),
        (F.floor(tvd * 1e6 + F.lit(0.5)) / 1e6).alias("tvd"),
        (F.floor(jsd * 1e4 + F.lit(0.5)) / 1e4).alias("jsd"),
    )


def heaps_fit(df: DataFrame, text_col: str = "text", n_buckets: int = 128) -> DataFrame:
    """Heaps'/Herdan's-law vocabulary growth fit V(N) = K·N^β — the
    corpus-health companion to :func:`zipf_fit` (natural text: β ≈
    0.4-0.6; β collapsing toward 0 means a closed/templated vocabulary,
    β near 1 means decode garbage or id-like tokens): OLS of ln V(N) on
    ln N at power-of-two checkpoints of the token stream, read in
    doc_id order.

    Scale shape (r11 — single-tokenize): the returned plan runs
    ``regexp_extract_all`` over the corpus exactly ONCE. Global token
    positions come from a cumulative doc-length prefix sum computed
    with NO unpartitioned window over per-document rows (r9 verdict #2
    — at billions of documents one task would sort the whole doc_id
    domain): documents bucket by QUANTILE cutpoints of doc_id
    (quantile, not fixed-width, so an adversarial id distribution with
    a narrow cluster plus outliers still spreads ~evenly; sketch
    imprecision moves only bucket BOUNDARIES, never sums), and each
    document's global offset = its bucket's exclusive offset + a
    within-bucket running sum (window PARTITIONED by bucket). The
    bucket offsets ride TWO bounded eager probes at plan-construction
    time (NOTE: building the plan runs two small Spark jobs — the
    drift-family probe discipline): (1) corpus total + doc_id
    cutpoints, (2) exact per-bucket token totals (≤ ``n_buckets`` rows
    collected, prefix-summed driver-side and broadcast back as a
    literal frame). Driver-side offsets replace both the r10 tiny
    ordered-only window AND the former join of the tokenized corpus
    back to a separately-tokenized length frame — one corpus shuffle
    (by bucket, for the window) instead of two, and one tokenize
    instead of two. Ordering across buckets agrees with ordering
    within them because the bucket key (count of cutpoints < doc_id)
    is monotone in doc_id; non-numeric orderable doc_ids (dates,
    timestamps) key through their monotone numeric image
    (drift.monotone_double_key — r10 ADVICE). ``n_buckets`` defaults
    to 127 comparisons — measured to stay inside whole-stage codegen's
    64 KB method limit (255 blew it and fell back to per-operator
    codegen); raise it with care. Checkpoint counts are one in-row
    explode of the bounded checkpoint list over VOCABULARY rows. Float
    discipline: ln only on exact int64 checkpoints/counts, 1e-6
    floors, final 1e-4 (drift-family).

    Output: one row (n_tokens, n_vocab, n_checkpoints, heaps_beta,
    heaps_lnk); empty corpora yield zeros with null fit."""
    import operator
    from functools import reduce

    from pyspark.sql import Window

    from .drift import monotone_double_key

    base = (
        df.na.drop(subset=[text_col])
        .select(
            "doc_id",
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_RE), 0).alias(
                "__toks"
            ),
        )
    )
    key = monotone_double_key(df, F.col("doc_id"), "heaps_fit")
    qs = [i / n_buckets for i in range(1, max(2, n_buckets))]
    # probe 1 (r11 opt): cutpoints only — NO tokenize. The old probe
    # also summed token counts here, which re-ran regexp_extract_all
    # over the whole corpus a second time purely to learn n_total;
    # n_total is exactly the sum of probe 2's per-bucket totals, so
    # this probe now scans just (doc_id, text-null) — construction runs
    # TWO corpus regex passes → ONE (probe 2 + the returned plan).
    cuts_row = (
        df.na.drop(subset=[text_col])
        .agg(F.percentile_approx(key(F.col("doc_id")), qs, 10_000).alias("cuts"))
        .collect()[0]
    )
    cuts = sorted({float(c) for c in (cuts_row["cuts"] or [])})
    spark = df.sparkSession
    # bucket = count of quantile cutpoints < doc_id — monotone in
    # doc_id, ~even under any id distribution. A plain sum of
    # comparisons, NOT a higher-order-function lambda (drift.ks_drift
    # rationale: constraint inference does not re-map a lambda's outer
    # reference — Spark 4.1 INTERNAL_ERROR)
    bucket = reduce(
        operator.add,
        [(key(F.col("doc_id")) > F.lit(c)).cast("long") for c in cuts],
        F.lit(0).cast("long"),
    )
    # probe 2 (bounded: ≤ n_buckets rows): exact per-bucket token
    # totals, prefix-summed DRIVER-side into exclusive offsets — the
    # capped-collect discipline, O(n_buckets) rows only. Token counts
    # via regexp_count (r12): counting non-overlapping matches equals
    # size(regexp_extract_all(...)) by definition (pinned in tests) but
    # skips materializing every document's token ARRAY purely to take
    # its length — the probe pass keeps the regex scan and drops the
    # array build.
    btotals = (
        df.na.drop(subset=[text_col])
        .select(
            F.regexp_count(F.lower(F.col(text_col)), F.lit(TOKEN_RE)).alias("__len"),
            bucket.alias("__bucket"),
        )
        .groupBy("__bucket")
        .agg(F.sum("__len").alias("__btok"))
        .collect()
    )
    n_total = sum(int(r["__btok"]) for r in btotals)
    cps = sorted(
        {1 << i for i in range(1, 63) if (1 << i) < n_total}
        | ({n_total} if n_total else set())
    )
    if not cps:
        return spark.createDataFrame(
            [(0, 0, 0, None, None)],
            "n_tokens long, n_vocab long, n_checkpoints long, "
            "heaps_beta double, heaps_lnk double",
        )
    run = 0
    boff_rows = []
    for r in sorted(btotals, key=lambda r: r["__bucket"]):
        boff_rows.append((int(r["__bucket"]), run))
        run += int(r["__btok"])
    boff = spark.createDataFrame(boff_rows, "__bucket long, __boff long")
    ww = (
        Window.partitionBy("__bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = (
        base.select("doc_id", "__toks", F.size("__toks").alias("__len"))
        .withColumn("__bucket", bucket)
        .join(F.broadcast(boff), "__bucket")
        .select(
            "__toks",
            (
                F.col("__boff") + F.coalesce(F.sum("__len").over(ww), F.lit(0))
            ).alias("__off"),
        )
    )
    first = (
        offs.select(
            F.col("__off"),
            F.posexplode("__toks").alias("__p", "tok"),
        )
        .select("tok", (F.col("__off") + F.col("__p") + 1).alias("gp"))
        .groupBy("tok")
        .agg(F.min("gp").alias("fp"))
    )
    cp_arr = F.array(*[F.lit(c).cast("long") for c in cps])
    vc = (
        first.select("fp", F.explode(cp_arr).alias("cp"))
        .filter(F.col("fp") <= F.col("cp"))
        .groupBy("cp")
        .agg(F.count("*").alias("v"))
    )
    x = F.floor(F.log(F.col("cp")) * 1e6 + F.lit(0.5)) / 1e6
    y = F.floor(F.log(F.col("v")) * 1e6 + F.lit(0.5)) / 1e6
    m = vc.select(x.alias("x"), y.alias("y"), "cp", "v").agg(
        F.count("*").alias("k"),
        F.max(F.when(F.col("cp") == n_total, F.col("v"))).alias("nv"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    den = F.col("k") * F.col("sxx") - F.col("sx") * F.col("sx")
    slope = (F.col("k") * F.col("sxy") - F.col("sx") * F.col("sy")) / F.nullif(
        den, F.lit(0.0)
    )
    intercept = (F.col("sy") - slope * F.col("sx")) / F.col("k")
    return m.select(
        F.lit(n_total).cast("long").alias("n_tokens"),
        F.coalesce(F.col("nv"), F.lit(0)).cast("long").alias("n_vocab"),
        F.col("k").cast("long").alias("n_checkpoints"),
        (F.floor(slope * 1e4 + F.lit(0.5)) / 1e4).alias("heaps_beta"),
        (F.floor(intercept * 1e4 + F.lit(0.5)) / 1e4).alias("heaps_lnk"),
    )
