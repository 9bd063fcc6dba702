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


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Composite quality score in [0,1]: stopword signal + length signal +
    punctuation cleanliness. Pure rational arithmetic (no exp/log) so the
    oracle matches bit-for-bit."""
    c = F.col(text_col)
    toks = token_count(c).cast("double")
    stop_ratio = stopword_count(c) / F.greatest(toks, F.lit(1.0))
    punct_ratio = punct_count(c) / F.greatest(F.length(c).cast("double"), F.lit(1.0))
    length_signal = F.least(toks, F.lit(100.0)) / 100.0
    score = stop_ratio * 0.4 + length_signal * 0.3 + (1 - punct_ratio) * 0.3
    return df.select(
        "doc_id",
        round6(stop_ratio).alias("stop_ratio"),
        round6(punct_ratio).alias("punct_ratio"),
        round6(score).alias("quality"),
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


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic document fingerprint: md5 of the whitespace/punct-
    normalized lowercase text — the exact-dedup key for noisy duplicates."""
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"[^a-z0-9]+", " "))
    return df.select("doc_id", F.md5(norm).alias("fp"))
