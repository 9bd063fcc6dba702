"""Manifest-versioned parquet tables: snapshot commits, time travel,
optimistic concurrency, vacuum — the minimal slice of a table format
(Delta/Iceberg) that upgrade parquet directories from "a pile of files"
to "a sequence of atomic snapshots".

Why the engine carries this: every replace/merge sink in `sinks.py`
mutates files in place, so a reader racing a writer can see a half
table, and yesterday's state is gone after today's run. A 100 TB
pipeline needs (a) readers pinned to a consistent snapshot while writers
land new data, (b) reproducible reads of past versions (train/eval sets
cite a corpus VERSION, not a directory), and (c) blind-retry safety. All
three fall out of one rule: DATA FILES ARE IMMUTABLE, commits only add
files and swap one tiny manifest pointer.

Layout (all under the table dir):
    data/<uuid>.parquet      immutable data files, never rewritten
    _manifests/v00042.json   snapshot = list of live data files + meta

Commit protocol: write data files → write manifest to a temp name →
`os.link` to the next version number. Hard-linking is atomic and FAILS
if the target exists, so two racing writers can both write data files
but only ONE wins the version — the loser raises `CommitConflict` and
retries on top of the winner's snapshot (optimistic concurrency, exactly
Delta's protocol). Readers list manifests only; a crashed writer leaves
orphan data files that `vacuum` reclaims, never a torn table.

Local-filesystem scope (like `sinks.merge_parquet`): rename/link
atomicity holds on POSIX; object stores need a commit service — the
protocol is unchanged, only the atomic primitive differs.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession


class CommitConflict(RuntimeError):
    """Another writer committed this version first — reread and retry."""


def _manifest_dir(table_dir: str) -> str:
    return os.path.join(table_dir, "_manifests")


def _versions(table_dir: str) -> list[int]:
    mdir = _manifest_dir(table_dir)
    if not os.path.isdir(mdir):
        return []
    return sorted(
        int(f[1:-5]) for f in os.listdir(mdir) if f.startswith("v") and f.endswith(".json")
    )


def current_version(table_dir: str) -> int | None:
    vs = _versions(table_dir)
    return vs[-1] if vs else None


def _read_manifest(table_dir: str, version: int) -> dict:
    with open(os.path.join(_manifest_dir(table_dir), f"v{version:05d}.json")) as f:
        return json.load(f)


def commit(
    spark: SparkSession,
    df: DataFrame,
    table_dir: str,
    mode: str = "append",
    extra: dict | None = None,
) -> int:
    """Commit ``df`` as the next snapshot. ``mode='append'`` keeps the
    previous snapshot's files and adds new ones; ``'replace'`` starts the
    file list fresh (previous files stay on disk for time travel until
    vacuumed). ``extra`` entries are embedded in the manifest ATOMICALLY
    with the commit (the transactional carrier for e.g. a streaming
    epoch id — see streaming/sinks.py). Returns the committed version
    number. Raises ``CommitConflict`` if a concurrent writer claimed the
    version."""
    if mode not in ("append", "replace"):
        raise ValueError(f"mode must be 'append' or 'replace', got {mode!r}")
    if "://" in table_dir:
        raise ValueError("versioned tables are local-filesystem scoped (see module doc)")
    os.makedirs(_manifest_dir(table_dir), exist_ok=True)

    base_version = current_version(table_dir)
    carried = (
        _read_manifest(table_dir, base_version)["files"]
        if mode == "append" and base_version is not None
        else []
    )

    # 1. land immutable data files under a fresh uuid directory
    batch_id = uuid.uuid4().hex
    data_dir = os.path.join(table_dir, "data", batch_id)
    df.write.mode("error").parquet(data_dir)
    new_files = sorted(
        os.path.join("data", batch_id, f)
        for f in os.listdir(data_dir)
        if f.endswith(".parquet")
    )

    # 2. atomically claim the next version: link fails iff it exists
    version = (base_version if base_version is not None else -1) + 1
    manifest = {
        "version": version,
        "mode": mode,
        "files": carried + new_files,
        "batch": batch_id,
        "committed_at": time.time(),
        **(extra or {}),
    }
    tmp = os.path.join(_manifest_dir(table_dir), f".tmp-{batch_id}.json")
    final = os.path.join(_manifest_dir(table_dir), f"v{version:05d}.json")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    try:
        os.link(tmp, final)
    except FileExistsError as e:
        raise CommitConflict(
            f"version {version} of {table_dir!r} was committed concurrently; "
            "reread the table and retry"
        ) from e
    finally:
        os.remove(tmp)
    return version


def read_table(
    spark: SparkSession,
    table_dir: str,
    version: int | None = None,
    merge_schema: bool = False,
) -> DataFrame:
    """Read a snapshot (latest by default, or any retained ``version`` —
    time travel). The file list is pinned at manifest-read time, so the
    returned DataFrame stays consistent even if writers commit while the
    query runs. ``merge_schema=True`` unions column sets across commits
    (append-only schema evolution: old files surface nulls for columns
    they predate — same contract as parquet ``mergeSchema``)."""
    v = current_version(table_dir) if version is None else version
    if v is None:
        raise FileNotFoundError(f"no committed version at {table_dir!r}")
    m = _read_manifest(table_dir, v)
    if not m["files"]:
        return spark.createDataFrame([], "__empty string").limit(0)
    paths = [os.path.join(table_dir, f) for f in m["files"]]
    reader = spark.read
    if merge_schema:
        reader = reader.option("mergeSchema", True)
    return reader.parquet(*paths)


def history(table_dir: str) -> list[dict]:
    """Commit log, oldest first: version, mode, file count, timestamp."""
    return [
        {k: m[k] for k in ("version", "mode", "committed_at")} | {"n_files": len(m["files"])}
        for m in (_read_manifest(table_dir, v) for v in _versions(table_dir))
    ]


def vacuum(table_dir: str, keep_last: int = 2) -> int:
    """Drop manifests older than the last ``keep_last`` versions and
    delete data files no retained snapshot references (crashed-writer
    orphans included). Returns the number of files deleted. Time travel
    reaches only retained versions afterward."""
    vs = _versions(table_dir)
    keep_vs = vs[-keep_last:] if keep_last > 0 else []
    live: set[str] = set()
    for v in keep_vs:
        live.update(_read_manifest(table_dir, v)["files"])
    deleted = 0
    for v in vs[:-keep_last] if keep_last > 0 else vs:
        os.remove(os.path.join(_manifest_dir(table_dir), f"v{v:05d}.json"))
    data_root = os.path.join(table_dir, "data")
    if os.path.isdir(data_root):
        for batch in os.listdir(data_root):
            bdir = os.path.join(data_root, batch)
            for f in os.listdir(bdir):
                rel = os.path.join("data", batch, f)
                if f.endswith(".parquet") and rel not in live:
                    os.remove(os.path.join(bdir, f))
                    deleted += 1
            if not any(f.endswith(".parquet") for f in os.listdir(bdir)):
                for f in os.listdir(bdir):
                    os.remove(os.path.join(bdir, f))
                os.rmdir(bdir)
    return deleted
