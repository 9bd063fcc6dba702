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
- The fingerprint tables are BUCKETED on their join key (digest for the
  exact loop, (band, bk) for the near-dup loop): the state side of the
  classification join plans NO Exchange — only the new batch shuffles,
  into ``n_buckets`` partitions (size n_buckets for the cluster at
  production scale; the default 8 is the local-test shape). Asserted on
  the physical plan in tests/test_incremental_corpus.py.
- Crash atomicity: a batch publishes its corpus rows and its state rows
  with a single commit point. Both datasets are first written to hidden
  ``.staged-<token>`` directories (invisible to every reader), then a
  journal marker (one atomic rename) commits the batch, then the staged
  files move into the visible roots. :func:`recover_state` — run at the
  start of every ingest — rolls a crashed batch FORWARD when the marker
  exists and BACK when it does not, so a blind retry of a crashed run
  can never double-ingest (tested stepwise via the crash hooks).
- Idempotency: re-ingesting the same batch is a no-op — every digest is
  already in the state, so zero rows are appended.
- Within-batch duplicates collapse to min(doc_id) BEFORE the history
  join (cheapest first, same funnel ordering as plans/corpus.py).

Concurrency contract: ONE writer per state_dir at a time (the daily
scheduler's natural shape). The journal makes a crashed-then-retried
single writer safe; two CONCURRENT writers are not coordinated — a real
multi-writer deployment needs a table format with optimistic commits
(Delta/Iceberg). Filesystem ops go through the Hadoop FileSystem API
(fsutil.py), so state may live on file:// or HDFS; S3A's non-atomic
rename is explicitly out of contract.

The pure-query twin of this loop (day-partitioned funnel counts over a
static table, fully DuckDB-oracled) is `incremental_ingest_funnel` in
the registry; this module owns the real stateful writes, covered by
tests/test_incremental_corpus.py.
"""

from __future__ import annotations

import hashlib
import json
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..cachectl import scoped_cache
from ..fsutil import HadoopFS

STATE_ROOTS = (
    "corpus",
    "fingerprints",
    "corpus_neardup",
    "neardup_bands",
    "corpus_embdup",
    "embdup_buckets",
    "corpus_bloom",
    "bloom_bits",
)
DEFAULT_BUCKETS = 8  # local-test shape; size for the cluster in production


class SimulatedCrash(RuntimeError):
    """Raised by the test-only ``_crash`` hooks to exercise the recovery
    protocol at exact points. Never raised in production paths."""


def _join(*parts: str) -> str:
    return "/".join(p.rstrip("/") for p in parts)


def _norm_loc(loc: str) -> str:
    """Normalize a catalog-reported location (URI) and a caller path to
    a comparable form: strip the scheme and trailing slash but KEEP the
    authority (two clusters sharing a path must not compare equal)."""
    from urllib.parse import urlparse

    if ":" in loc.split("/", 1)[0]:
        u = urlparse(loc)
        return (u.netloc + u.path).rstrip("/")
    return loc.rstrip("/")


def _state_table_name(root_path: str) -> str:
    """Deterministic per-location catalog name for a bucketed state
    table (the in-memory catalog is session-scoped; every ingest
    re-registers idempotently)."""
    return "incr_state_" + hashlib.md5(root_path.encode()).hexdigest()[:12]


def _ensure_state_table(
    spark: SparkSession,
    root: str,
    like_df: DataFrame,
    bucket_cols: list[str],
    n_buckets: int,
) -> DataFrame:
    """Register (idempotently) the bucketed external table over ``root``
    and return it. The BUCKETED table is what lets the classification
    join read the state with NO Exchange: the scan itself reports
    hashpartitioning(bucket_cols, n_buckets), so only the batch side
    shuffles."""
    name = _state_table_name(root)
    if spark.catalog.tableExists(name):
        rows = spark.sql(f"DESCRIBE FORMATTED `{name}`").collect()
        loc = next((r[1] for r in rows if r[0] == "Location"), "")
        if _norm_loc(loc) != _norm_loc(root):
            # a stale same-name registration from a recycled path
            spark.sql(f"DROP TABLE IF EXISTS `{name}`")
    if not spark.catalog.tableExists(name):
        ddl = ", ".join(
            f"`{f.name}` {f.dataType.simpleString()}" for f in like_df.schema.fields
        )
        cols = ", ".join(f"`{c}`" for c in bucket_cols)
        spark.sql(
            f"CREATE TABLE `{name}` ({ddl}) USING PARQUET "
            f"CLUSTERED BY ({cols}) SORTED BY ({cols}) INTO {n_buckets} BUCKETS "
            f"LOCATION '{root}'"
        )
    return spark.table(name)


def _refresh_state_table(spark: SparkSession, root: str) -> None:
    name = _state_table_name(root)
    if spark.catalog.tableExists(name):
        spark.catalog.refreshTable(name)


def _staged_bucketed_write(
    df: DataFrame, staged_path: str, bucket_cols: list[str], n_buckets: int
) -> None:
    """Write ``df`` BUCKETED to ``staged_path``. Spark only writes bucket
    metadata through the table API, so the stage is a throwaway external
    table at the staged location; dropping it keeps the files. The
    bucketed part-file names survive the publish move verbatim, so the
    state table's scans keep trusting them."""
    tmp_table = "incr_stage_" + uuid.uuid4().hex[:16]
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, *bucket_cols)
        .sortBy(*bucket_cols)
        .option("path", staged_path)
        .format("parquet")
        .saveAsTable(tmp_table)
    )
    df.sparkSession.sql(f"DROP TABLE IF EXISTS `{tmp_table}`")


# ---------------------------------------------------------------------------
# commit protocol: stage (hidden) -> journal marker (atomic) -> publish moves
# ---------------------------------------------------------------------------


def _staged_dir(root: str, token: str) -> str:
    return _join(root, f".staged-{token}")


def _journal_dir(state_dir: str) -> str:
    return _join(state_dir, "_journal")


def _epochs_dir(state_dir: str) -> str:
    return _join(state_dir, "_epochs")


def _commits_dir(state_dir: str) -> str:
    return _join(state_dir, "_commits")


def _retire_marker(fs: HadoopFS, state_dir: str, token: str) -> None:
    """Move a fully-published journal marker into the commit LOG instead
    of deleting it — the audit trail of every batch that ever committed
    (token, roots, epoch). The rename is atomic; an already-retired
    marker (idempotent retry) is simply dropped."""
    fs.mkdirs(_commits_dir(state_dir))
    src = _join(_journal_dir(state_dir), token)
    if not fs.rename(src, _join(_commits_dir(state_dir), token)):
        fs.delete(src, False)  # a prior retry already retired it


def ingest_log(spark: SparkSession, state_dir: str):
    """The commit log as a list of dicts (token, roots, epoch or None) —
    one entry per batch that COMMITTED to this state, in no particular
    order (tokens are random; pair with the epoch id or the corpus rows
    for ordering). Batches that rolled back never appear; a batch rolled
    FORWARD by recover_state appears exactly once. Driver-side listing:
    the log is one tiny file per committed batch."""
    fs = HadoopFS(spark, state_dir)
    out = []
    for token in fs.list_names(_commits_dir(state_dir)):
        meta = json.loads(fs.read_text(_join(_commits_dir(state_dir), token)) or "{}")
        out.append(
            {"token": token, "roots": meta.get("roots", []), "epoch": meta.get("epoch")}
        )
    return out


def _record_epoch(fs: HadoopFS, state_dir: str, epoch_id: int) -> None:
    fs.mkdirs(_epochs_dir(state_dir))
    fs.touch_atomic(_join(_epochs_dir(state_dir), str(int(epoch_id))))


def epoch_committed(spark: SparkSession, state_dir: str, epoch_id: int) -> bool:
    """True iff a batch tagged ``epoch_id`` fully committed to this
    state (its marker rides the journal commit, so a crashed epoch is
    either rolled forward — marker appears — or rolled back — it never
    does). The streaming ingestor's redelivery guard."""
    return HadoopFS(spark, state_dir).exists(
        _join(_epochs_dir(state_dir), str(int(epoch_id)))
    )


def _write_marker(
    fs: HadoopFS,
    state_dir: str,
    token: str,
    roots: list[str],
    epoch_id: int | None = None,
) -> None:
    fs.mkdirs(_journal_dir(state_dir))
    meta: dict = {"roots": roots}
    if epoch_id is not None:
        meta["epoch"] = int(epoch_id)
    fs.touch_atomic(_join(_journal_dir(state_dir), token), json.dumps(meta))


def _publish_staged(fs: HadoopFS, root: str, token: str) -> None:
    """Move the staged part files into the visible root. Idempotent: the
    part-file names are globally unique (Spark job UUIDs), so a retried
    publish skips files that already arrived and re-moves the rest."""
    staged = _staged_dir(root, token)
    if not fs.exists(staged):
        return  # already fully published
    fs.mkdirs(root)
    for name in fs.list_names(staged):
        if name.startswith(("_", ".")):
            continue  # _SUCCESS and checksum files stay behind
        src, dst = _join(staged, name), _join(root, name)
        if fs.exists(dst):
            fs.delete(src, False)
        elif not fs.rename(src, dst) and not fs.exists(dst):
            raise IOError(f"publish: rename {src} -> {dst} failed")
    fs.delete(staged, True)


def recover_state(spark: SparkSession, state_dir: str) -> dict[str, int]:
    """Settle any crashed ingest or compaction at ``state_dir``; runs at
    the start of every ingest/compaction so a blind retry starts from a
    consistent state. Three sweeps:

    1. journaled batches → roll FORWARD (finish the publish moves, then
       retire the marker into the ``_commits`` log): the batch
       committed, readers just could not see all of it yet;
    2. orphan ``.staged-*`` dirs with no marker → roll BACK (delete):
       the batch never committed, the retry will redo it from scratch;
    3. half-swapped compactions → roll forward/back per the
       ``._compact_tmp`` / ``._compact_old`` state machine (same
       contract as sinks.recover_merge).

    Returns counts per action for logging/tests."""
    fs = HadoopFS(spark, state_dir)
    actions = {"rolled_forward": 0, "rolled_back": 0, "compact_settled": 0}

    jdir = _journal_dir(state_dir)
    for token in fs.list_names(jdir):
        if token.endswith(".tmp"):
            fs.delete(_join(jdir, token), False)
            continue
        meta = json.loads(fs.read_text(_join(jdir, token)) or "{}")
        for rel in meta.get("roots", []):
            _publish_staged(fs, _join(state_dir, rel), token)
        if meta.get("epoch") is not None:
            _record_epoch(fs, state_dir, meta["epoch"])
        _retire_marker(fs, state_dir, token)
        actions["rolled_forward"] += 1

    for rel in STATE_ROOTS:
        root = _join(state_dir, rel)
        for name in fs.list_names(root):
            if name.startswith(".staged-"):
                fs.delete(_join(root, name), True)
                actions["rolled_back"] += 1
        if _recover_swap(fs, root) != "ok":
            actions["compact_settled"] += 1
    for rel in STATE_ROOTS:
        _refresh_state_table(spark, _join(state_dir, rel))
    return actions


def _commit(
    spark: SparkSession,
    state_dir: str,
    staged: list[str],
    token: str,
    epoch_id: int | None = None,
    _crash: str | None = None,
) -> None:
    """The single commit point: marker rename, then publish moves. An
    ``epoch_id`` rides the marker, so the epoch's committed-flag can
    never separate from its data — recover_state records it on
    roll-forward, and a rolled-back batch never records it."""
    fs = HadoopFS(spark, state_dir)
    if _crash == "after_stage":
        raise SimulatedCrash("after_stage")
    _write_marker(fs, state_dir, token, staged, epoch_id)
    if _crash == "after_journal":
        raise SimulatedCrash("after_journal")
    for i, rel in enumerate(staged):
        _publish_staged(fs, _join(state_dir, rel), token)
        if _crash == "mid_publish" and i == 0:
            raise SimulatedCrash("mid_publish")
    if epoch_id is not None:
        _record_epoch(fs, state_dir, epoch_id)
    _retire_marker(fs, state_dir, token)
    for rel in staged:
        _refresh_state_table(spark, _join(state_dir, rel))


# ---------------------------------------------------------------------------
# ingestion loops
# ---------------------------------------------------------------------------


def fingerprint_state(
    spark: SparkSession, state_dir: str, id_col: str = "doc_id",
    n_buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """The exact-dedup state as its bucketed table (digest, id)."""
    like = spark.createDataFrame([], f"digest string, {id_col} long")
    return _ensure_state_table(
        spark, _join(state_dir, "fingerprints"), like, ["digest"], n_buckets
    )


def neardup_band_state(
    spark: SparkSession, state_dir: str, id_col: str = "doc_id",
    n_buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """The near-dup state as its bucketed table (id, band, bk)."""
    like = spark.createDataFrame([], f"{id_col} long, band int, bk string")
    return _ensure_state_table(
        spark, _join(state_dir, "neardup_bands"), like, ["band", "bk"], n_buckets
    )


def ingest_batch(
    spark: SparkSession,
    batch: DataFrame,
    state_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = DEFAULT_BUCKETS,
    epoch_id: int | None = None,
    _crash: str | None = None,
) -> dict[str, int]:
    """Ingest one batch of documents against the state at ``state_dir``.

    Returns the ingestion funnel as exact counts:
    ``{"n_batch", "n_within_dup", "n_hist_dup", "n_accepted"}``.
    Appends accepted docs to ``state_dir/corpus`` and their digests to
    the bucketed ``state_dir/fingerprints`` state, atomically (both or
    neither — see the module docstring's commit protocol). A crashed run
    can be retried blindly: :func:`recover_state` runs first and either
    finishes or undoes the crashed batch, so the retry never
    double-appends."""
    recover_state(spark, state_dir)
    corpus_root, fp_root = _join(state_dir, "corpus"), _join(state_dir, "fingerprints")
    digest = F.md5(F.col(text_col)).alias("digest")

    n_batch = batch.count()

    # 1. within-batch exact dedup: keep min(doc_id) per digest
    keyed = batch.select(digest, *batch.columns)
    keeper = keyed.groupBy("digest").agg(F.min(id_col).alias(id_col))
    batch_unique = keyed.join(keeper, ["digest", id_col])
    # 2. history check: one equi-join against the bucketed state — the
    # state side plans no Exchange, only the batch shuffles
    hist = fingerprint_state(spark, state_dir, id_col, n_buckets).select("digest")
    novel = batch_unique.join(hist, "digest", "left_anti")
    # every consumer (the unique count, the accepted count, both staged
    # writes) runs INSIDE this scope, so the caches release with zero
    # recompute — getPersistentRDDs() is empty when the funnel returns
    # (cachectl.py)
    with scoped_cache(batch_unique, novel):
        n_unique = batch_unique.count()
        n_accepted = novel.count()

        # 3. stage novel docs + their fingerprints, commit atomically
        if n_accepted:
            token = uuid.uuid4().hex
            novel.drop("digest").write.parquet(_staged_dir(corpus_root, token))
            _staged_bucketed_write(
                novel.select("digest", id_col),
                _staged_dir(fp_root, token),
                ["digest"],
                n_buckets,
            )
            _commit(
                spark,
                state_dir,
                ["corpus", "fingerprints"],
                token,
                epoch_id=epoch_id,
                _crash=_crash,
            )

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
    n_buckets: int = DEFAULT_BUCKETS,
    epoch_id: int | None = None,
    _crash: str | None = None,
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

    State = (doc_id, band, bk) rows for EVERY ingested doc (seen-
    semantics, append-only), BUCKETED on (band, bk): ~bands·36 bytes per
    historical document — the 100 TB corpus collapses to a compact
    fingerprint table, and the per-batch check is one (band, bk)
    equi-join that never shuffles the state side, never scans the
    corpus. Re-ingesting a batch is classification-idempotent: every
    doc's keys are already present, so everything classifies historical
    and the appends are empty. Docs with < n tokens (no signature, no
    band keys) can never collide — they are accepted.

    Corpus rows and band keys commit ATOMICALLY (module docstring): a
    crashed run retried blindly re-classifies, never double-appends.

    Returns ``{"n_batch", "n_hist_neardup", "n_within_neardup",
    "n_accepted"}``; appends accepted docs to ``state_dir/
    corpus_neardup`` and the batch's band keys to ``state_dir/
    neardup_bands``.
    """
    from ..operators.dedup import minhash_band_keys

    bk = minhash_band_keys(batch, text_col=text_col, k=k, bands=bands, n=n)
    if id_col != "doc_id":
        bk = bk.withColumnRenamed("doc_id", id_col)
    n_batch, n_hist, n_within, n_accepted = _ingest_keyed(
        spark,
        batch,
        state_dir,
        keys=bk,
        key_cols=("band", "bk"),
        corpus_rel="corpus_neardup",
        state_rel="neardup_bands",
        id_col=id_col,
        n_buckets=n_buckets,
        epoch_id=epoch_id,
        _crash=_crash,
    )
    return {
        "n_batch": n_batch,
        "n_hist_neardup": n_hist,
        "n_within_neardup": n_within,
        "n_accepted": n_accepted,
    }


def ingest_batch_embdup(
    spark: SparkSession,
    batch: DataFrame,
    state_dir: str,
    tables: list,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_buckets: int = DEFAULT_BUCKETS,
    epoch_id: int | None = None,
    _crash: str | None = None,
) -> dict[str, int]:
    """Incremental EMBEDDING near-duplicate ingestion — the third leg of
    the incremental family (exact digests → MinHash text LSH → hyperplane
    embedding LSH): each batch's vectors are checked against a persistent
    (tbl, bucket) sign-bit state (operators/similarity.multitable_buckets
    over the caller's seeded hyperplane ``tables``). A vector is a
    historical near-dup iff ANY of its per-table buckets was already
    seen; within the batch, sharing a bucket with a smaller-id member.
    Exists-semantics, append-only, same SQL-expressible contract as the
    text loop (oracled twin ``incremental_embdup_funnel``); state rows
    are ~n_tables·(id + small strings) per vector and the per-batch check
    is one bucketed (tbl, bucket) equi-join — the state side never
    shuffles, the corpus is never rescanned. Null vectors produce no
    buckets and are accepted (can never collide). Crash-atomic via the
    shared journal commit; ``epoch_id`` rides the marker.

    Returns ``{"n_batch", "n_hist_embdup", "n_within_embdup",
    "n_accepted"}``; appends accepted rows to ``state_dir/corpus_embdup``
    and the batch's bucket keys to ``state_dir/embdup_buckets``."""
    from ..operators.similarity import multitable_buckets

    keys = multitable_buckets(batch, tables, id_col=id_col, vec_col=vec_col)
    n_batch, n_hist, n_within, n_accepted = _ingest_keyed(
        spark,
        batch,
        state_dir,
        keys=keys,
        key_cols=("tbl", "bucket"),
        corpus_rel="corpus_embdup",
        state_rel="embdup_buckets",
        id_col=id_col,
        n_buckets=n_buckets,
        epoch_id=epoch_id,
        _crash=_crash,
    )
    return {
        "n_batch": n_batch,
        "n_hist_embdup": n_hist,
        "n_within_embdup": n_within,
        "n_accepted": n_accepted,
    }


def _ingest_keyed(
    spark: SparkSession,
    batch: DataFrame,
    state_dir: str,
    keys: DataFrame,
    key_cols: tuple,
    corpus_rel: str,
    state_rel: str,
    id_col: str,
    n_buckets: int,
    epoch_id: int | None,
    _crash: str | None,
) -> tuple[int, int, int, int]:
    """Shared engine of the LSH-keyed incremental loops: classify a batch
    against a persistent bucketed key state (historical iff ANY key seen;
    within-batch iff a smaller-id member shares a key), append accepted
    rows + the batch's keys atomically. Returns
    (n_batch, n_hist, n_within, n_accepted)."""
    recover_state(spark, state_dir)
    state_root = _join(state_dir, state_rel)
    corpus_root = _join(state_dir, corpus_rel)
    kc = list(key_cols)

    n_batch = batch.count()
    # every consumer (both classification counts, both staged writes)
    # runs inside the scope, so the cache releases with zero recompute
    # (cachectl.py); the key-derivation pass runs once
    with scoped_cache(keys):
        state = _ensure_state_table(
            spark, state_root, keys.select(id_col, *kc), kc, n_buckets
        ).select(*kc)
        hist_ids = keys.join(state, kc, "left_semi").select(id_col).distinct()
        # within-batch: smallest id per batch bucket; a row with ANY
        # bucket whose min is a smaller id is a within-batch near-dup
        bucket_min = keys.groupBy(*kc).agg(F.min(id_col).alias("__min_id"))
        within_ids = (
            keys.join(bucket_min, kc)
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
            staged: list[str] = []
            token = uuid.uuid4().hex
            if n_accepted:
                accepted.write.parquet(_staged_dir(corpus_root, token))
                staged.append(corpus_rel)
            # seen-semantics: append EVERY batch row's keys (replays of
            # the same batch then classify 100% historical and append
            # again — harmless duplicates in an existence-checked state;
            # compaction collapses them)
            if n_batch:
                _staged_bucketed_write(
                    keys.select(id_col, *kc),
                    _staged_dir(state_root, token),
                    kc,
                    n_buckets,
                )
                staged.append(state_rel)
            if staged:
                _commit(
                    spark, state_dir, staged, token, epoch_id=epoch_id, _crash=_crash
                )
    return n_batch, n_hist, n_within, n_accepted


def ingest_batch_bloom(
    spark: SparkSession,
    batch: DataFrame,
    state_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    m_bits: int = 1 << 20,
    k: int = 4,
    n_buckets: int = DEFAULT_BUCKETS,
    epoch_id: int | None = None,
    _crash: str | None = None,
) -> dict[str, int]:
    """Space-optimized exact-dedup ingestion: the fingerprint table is
    replaced by a PORTABLE Bloom filter (operators/dedup.bloom_positions)
    stored as one ``pos`` long per DISTINCT set bit, bucketed — the
    whole state is at most ``m_bits`` rows however large the corpus,
    ~10-15 BITS per document at 1% FP vs ~50 BYTES per digest in
    :func:`ingest_batch`. The trade, explicit: NO false negatives ever
    (a true duplicate's digest sets exactly the bits its first copy set,
    so every probe hits), but a tunable share of genuinely-novel docs is
    rejected as false positives once the filter loads up — size
    ``m_bits`` ≈ k·corpus/ln2 ÷ desired-FP for production. Rejected
    docs' digests are NOT inserted (they were judged duplicates), so
    decisions are replay-stable.

    Classification: a within-batch-deduped doc is ``maybe-historical``
    iff ALL ``k`` of its bit positions are present in the state — one
    bucketed equi-join on ``pos`` (state side never shuffles) + a
    per-doc count. Accepted docs append to ``corpus_bloom``; their
    distinct positions append to ``bloom_bits`` in the SAME atomic
    journal commit (crash ⇒ blind retry, never double-ingest).
    ``compact_bloom_state`` collapses replay/overlap duplicates. The
    md5 position math replays bit-exactly in DuckDB — the oracled twin
    ``incremental_bloom_funnel`` pins the DECISIONS, not just
    invariants.

    Returns ``{"n_batch", "n_within_dup", "n_rejected_maybe_dup",
    "n_accepted"}`` (``n_rejected_maybe_dup`` counts true duplicates
    AND false positives — the loop cannot tell them apart; that is the
    contract)."""
    from ..operators.dedup import bloom_positions

    recover_state(spark, state_dir)
    corpus_root = _join(state_dir, "corpus_bloom")
    bits_root = _join(state_dir, "bloom_bits")
    digest = F.md5(F.col(text_col)).alias("digest")

    n_batch = batch.count()
    keyed = batch.select(digest, *batch.columns)
    keeper = keyed.groupBy("digest").agg(F.min(id_col).alias(id_col))
    batch_unique = keyed.join(keeper, ["digest", id_col])

    probes = batch_unique.select(
        id_col, F.explode(bloom_positions(F.col("digest"), m_bits, k)).alias("pos")
    ).distinct()
    state = _ensure_state_table(
        spark,
        bits_root,
        spark.createDataFrame([], "pos long"),
        ["pos"],
        n_buckets,
    )
    # bucketed groupBy: generation-duplicate bits collapse shuffle-free
    state_pos = state.groupBy("pos").agg(F.lit(1).alias("__set")).select("pos")
    matched = probes.join(state_pos, "pos", "left_semi")
    per_doc = (
        probes.groupBy(id_col)
        .agg(F.count("*").alias("__n_probe"))
        .join(matched.groupBy(id_col).agg(F.count("*").alias("__n_hit")), id_col, "left")
    )
    hist_ids = per_doc.filter(
        F.col("__n_hit") == F.col("__n_probe")
    ).select(id_col)

    with scoped_cache(batch_unique, hist_ids):
        n_unique = batch_unique.count()
        n_hist = hist_ids.count()
        accepted = batch_unique.join(hist_ids, id_col, "left_anti")
        n_accepted = n_unique - n_hist
        if n_accepted:
            token = uuid.uuid4().hex
            accepted.drop("digest").write.parquet(_staged_dir(corpus_root, token))
            new_bits = (
                accepted.select(
                    F.explode(
                        bloom_positions(F.col("digest"), m_bits, k)
                    ).alias("pos")
                )
                # a null-text keeper has no digest and no positions — keep
                # the state free of null rows (they can never match)
                .filter(F.col("pos").isNotNull())
                .distinct()
            )
            _staged_bucketed_write(
                new_bits, _staged_dir(bits_root, token), ["pos"], n_buckets
            )
            _commit(
                spark,
                state_dir,
                ["corpus_bloom", "bloom_bits"],
                token,
                epoch_id=epoch_id,
                _crash=_crash,
            )

    return {
        "n_batch": n_batch,
        "n_within_dup": n_batch - n_unique,
        "n_rejected_maybe_dup": n_hist,
        "n_accepted": n_accepted,
    }


def compact_bloom_state(
    spark: SparkSession, state_dir: str, n_buckets: int = DEFAULT_BUCKETS
) -> int:
    """Collapse duplicate set-bit rows in the Bloom state (replays and
    cross-batch position collisions append the same ``pos`` again).
    After compaction the state is at most ``m_bits`` rows regardless of
    corpus size. Single writer assumed."""
    return _compact_state(spark, state_dir, "bloom_bits", ["pos"], n_buckets)


# ---------------------------------------------------------------------------
# compaction: distinct-rewrite + dir swap (recoverable)
# ---------------------------------------------------------------------------


def _recover_swap(fs: HadoopFS, root: str) -> str:
    """Settle a crashed compaction swap at ``root`` deterministically —
    the same four-state contract as sinks.recover_merge, over the Hadoop
    FS: root present → clear leftovers; root missing + complete tmp →
    roll forward; root missing + old → roll back."""
    tmp, old = root + "._compact_tmp", root + "._compact_old"
    if fs.exists(root):
        for left in (tmp, old):
            if fs.exists(left):
                fs.delete(left, True)
        return "ok"
    if fs.exists(_join(tmp, "_SUCCESS")):
        if not fs.rename(tmp, root):
            raise IOError(f"recover_swap: rename {tmp} -> {root} failed")
        if fs.exists(old):
            fs.delete(old, True)
        return "rolled_forward"
    if fs.exists(old):
        if not fs.rename(old, root):
            raise IOError(f"recover_swap: rename {old} -> {root} failed")
        if fs.exists(tmp):
            fs.delete(tmp, True)
        return "rolled_back"
    return "absent"


def _compact_state(
    spark: SparkSession,
    state_dir: str,
    rel: str,
    bucket_cols: list[str],
    n_buckets: int,
) -> int:
    """Rewrite one bucketed state root with duplicates collapsed, then
    swap the new directory in. The swap's only non-atomic window (root
    renamed away, tmp not yet renamed in) is settled by
    :func:`recover_state` / :func:`_recover_swap` on the next touch —
    roll forward (tmp is complete) — so a crash never loses the state.
    SINGLE WRITER assumed (module docstring): appends landing between
    the distinct read and the swap would be lost."""
    fs = HadoopFS(spark, state_dir)
    root = _join(state_dir, rel)
    _recover_swap(fs, root)
    if not fs.has_visible_files(root):
        return 0
    tmp, old = root + "._compact_tmp", root + "._compact_old"
    compacted = spark.read.parquet(root).distinct()
    # the rewrite goes through the bucketed writer so the swapped-in
    # files keep the bucket layout the state table's scans rely on
    _staged_bucketed_write(compacted, tmp, bucket_cols, n_buckets)
    n = spark.read.parquet(tmp).count()
    if fs.exists(old):
        fs.delete(old, True)
    if not fs.rename(root, old):
        raise IOError(f"compact: rename {root} -> {old} failed")
    if not fs.rename(tmp, root):
        raise IOError(f"compact: rename {tmp} -> {root} failed")
    fs.delete(old, True)
    _refresh_state_table(spark, root)
    return n


def compact_neardup_state(
    spark: SparkSession, state_dir: str, n_buckets: int = DEFAULT_BUCKETS
) -> int:
    """Collapse replay-duplicated band rows in the near-dup state.

    Replays of an already-ingested batch append their band rows again
    (harmless for the existence-checked classification, wasteful on
    disk). Compaction distincts the state and swaps it in, preserving
    the bucketed layout; a crashed swap is rolled forward by
    :func:`recover_state`. Single writer assumed. Returns the compacted
    row count."""
    return _compact_state(
        spark, state_dir, "neardup_bands", ["band", "bk"], n_buckets
    )


def compact_embdup_state(
    spark: SparkSession, state_dir: str, n_buckets: int = DEFAULT_BUCKETS
) -> int:
    """Embedding-loop twin of :func:`compact_neardup_state`: collapse
    replay-duplicated (id, tbl, bucket) rows, rewrite bucketed, swap in.
    Single writer assumed."""
    return _compact_state(
        spark, state_dir, "embdup_buckets", ["tbl", "bucket"], n_buckets
    )


def compact_fingerprints(
    spark: SparkSession, state_dir: str, n_buckets: int = DEFAULT_BUCKETS
) -> int:
    """Exact-loop symmetry of :func:`compact_neardup_state`: collapse
    duplicate (digest, id) rows in the fingerprint state (the exact loop
    never appends duplicates itself, but a restored/merged state can
    carry them) and rewrite it bucketed. Single writer assumed."""
    return _compact_state(spark, state_dir, "fingerprints", ["digest"], n_buckets)
