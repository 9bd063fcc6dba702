"""Custom Python DataSource WRITE path: a JSON-lines directory sink with
the full distributed commit protocol.

Each executor task serializes its partition to a temp file and returns a
WriterCommitMessage naming it; the driver's commit() atomically renames
every temp file into place and writes a ``_SUCCESS`` manifest, while
abort() removes the orphans — so a failed job leaves no partial output
visible, the same contract Spark's file sinks implement
(reference parity: the reference's CSV sink is a single-process
``to_csv`` overwrite, scripts/loading.py:124-132; this is its
distributed, atomic analog). Local/posix rename semantics; an object-store
connector would swap the rename for a PUT of staged keys.

Usage::

    register_writer(spark)
    df.write.format("jsonl_dir").mode("overwrite").option("path", out).save()
"""

from __future__ import annotations

import datetime
import json
import os
import uuid
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamWriter,
    DataSourceWriter,
    WriterCommitMessage,
)


@dataclass
class FileCommit(WriterCommitMessage):
    temp_path: str
    final_name: str
    n_rows: int


def _default(o):
    if isinstance(o, (datetime.date, datetime.datetime)):
        return o.isoformat()
    raise TypeError(f"not JSON serializable: {type(o)}")


class JsonlDirWriter(DataSourceWriter):
    def __init__(self, options, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonl_dir requires .option('path', ...)")
        self.overwrite = overwrite

    def write(self, iterator) -> FileCommit:
        # runs on the executor: stage to a temp name invisible to readers
        os.makedirs(self.path, exist_ok=True)
        final_name = f"part-{uuid.uuid4().hex}.jsonl"
        temp_path = os.path.join(self.path, f"_tmp-{final_name}")
        n = 0
        with open(temp_path, "w") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict(), default=_default) + "\n")
                n += 1
        return FileCommit(temp_path=temp_path, final_name=final_name, n_rows=n)

    def commit(self, messages) -> None:
        # runs on the driver, once, after every task succeeded
        if self.overwrite:
            for name in os.listdir(self.path):
                if name.endswith(".jsonl") and not name.startswith("_tmp-"):
                    os.remove(os.path.join(self.path, name))
        total = 0
        names = []
        for m in messages:
            if m is None:
                continue
            os.rename(m.temp_path, os.path.join(self.path, m.final_name))
            names.append(m.final_name)
            total += m.n_rows
        with open(os.path.join(self.path, "_SUCCESS"), "w") as f:
            json.dump({"files": sorted(names), "rows": total}, f)

    def abort(self, messages) -> None:
        for m in messages:
            if m is not None and os.path.exists(m.temp_path):
                os.remove(m.temp_path)


class JsonlDirStreamWriter(DataSourceStreamWriter):
    """Streaming micro-batch sink with EXACTLY-ONCE visibility: executors
    stage each partition to a temp file; the driver's per-batch commit()
    renames them into place and writes a ``_batch-<id>`` manifest. On
    failure-replay of an already-committed batch (Structured Streaming
    re-runs the last batch after a restart), the existing manifest is
    detected and the staged duplicates are DISCARDED — idempotent commit,
    the same contract as Spark's file-stream sink log."""

    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonl_dir requires .option('path', ...)")

    def write(self, iterator) -> FileCommit:
        from pyspark import TaskContext

        os.makedirs(self.path, exist_ok=True)
        pid = TaskContext.get().partitionId()
        final_name = f"part-{pid:05d}-{uuid.uuid4().hex}.jsonl"
        temp_path = os.path.join(self.path, f"_tmp-{final_name}")
        n = 0
        with open(temp_path, "w") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict(), default=_default) + "\n")
                n += 1
        return FileCommit(temp_path=temp_path, final_name=final_name, n_rows=n)

    def commit(self, messages, batchId: int) -> None:
        manifest = os.path.join(self.path, f"_batch-{batchId}")
        if os.path.exists(manifest):  # replayed batch: drop staged dupes
            self.abort(messages, batchId)
            return
        total, names = 0, []
        for m in messages:
            if m is None:
                continue
            name = f"batch-{batchId}-{m.final_name}"
            os.rename(m.temp_path, os.path.join(self.path, name))
            names.append(name)
            total += m.n_rows
        with open(manifest, "w") as f:
            json.dump({"files": sorted(names), "rows": total}, f)

    def abort(self, messages, batchId: int) -> None:
        for m in messages:
            if m is not None and os.path.exists(m.temp_path):
                os.remove(m.temp_path)


class JsonlDirDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "jsonl_dir"

    def writer(self, schema, overwrite: bool) -> JsonlDirWriter:
        return JsonlDirWriter(self.options, overwrite)

    def streamWriter(self, schema, overwrite: bool) -> JsonlDirStreamWriter:
        return JsonlDirStreamWriter(self.options)


def register_writer(spark) -> None:
    spark.dataSource.register(JsonlDirDataSource)
