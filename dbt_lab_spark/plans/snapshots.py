"""Append-only snapshot log with time-travel reads — the
lakehouse-lite table format the engine's CDC (plans/incremental.py),
diff (operators/dml.dataset_diff) and matview (plans/matview.py)
pieces compose against.

Layout (one directory per table):

    <root>/
      _log.json              # ordered snapshot records
      v00000/ ... v00042/    # immutable parquet snapshot directories

Every commit writes a NEW immutable directory and then appends one
record to the log via atomic rename — a reader at version N lists one
directory and is never affected by later commits (snapshot isolation
by construction).  `append` commits base ∪ batch as a new version
WITHOUT rewriting old data files: the new snapshot's record lists the
parent's files plus the new delta directory, so commit cost is
O(batch), not O(table) — the manifest-reuse idea object-store table
formats are built on.

100 TB posture: data is never copied on commit; the log is one small
JSON (one record per version, file lists only); time-travel reads are
`spark.read.parquet(*files)` over the recorded file set — partition
pruning and predicate pushdown apply unchanged.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession


class SnapshotTable:
    """Versioned parquet table: `commit` (full replace), `append`
    (delta commit), `read(version=)` (time travel), `versions()`,
    `rollback(version)` (a new commit pointing at old files — history
    is never destroyed)."""

    def __init__(self, root: str) -> None:
        self.root = root
        os.makedirs(root, exist_ok=True)

    # -- log -------------------------------------------------------------
    def _log_path(self) -> str:
        return os.path.join(self.root, "_log.json")

    def _log(self) -> list[dict]:
        if not os.path.exists(self._log_path()):
            return []
        with open(self._log_path()) as fh:
            return json.load(fh)

    def _append_log(self, record: dict) -> None:
        log = self._log()
        record["version"] = len(log)
        record["ts"] = time.time()
        log.append(record)
        tmp = self._log_path() + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(log, fh, indent=1)
        os.replace(tmp, self._log_path())

    def versions(self) -> list[int]:
        return [r["version"] for r in self._log()]

    # -- commits ---------------------------------------------------------
    def _new_dir(self, kind: str) -> str:
        d = os.path.join(self.root, f"v{len(self._log()):05d}_{kind}")
        return d

    def commit(self, df: DataFrame, operation: str = "commit") -> int:
        """Full-replace commit: materialize `df` as a new immutable
        snapshot directory."""
        d = self._new_dir("full")
        df.write.mode("errorifexists").parquet(d)
        self._append_log({"operation": operation, "files": [d]})
        return len(self._log()) - 1

    def append(self, batch: DataFrame) -> int:
        """Delta commit: write ONLY the batch; the new version's file
        set is the parent's files plus the delta directory (no
        rewrite of existing data)."""
        log = self._log()
        if not log:
            return self.commit(batch, operation="append")
        d = self._new_dir("delta")
        batch.write.mode("errorifexists").parquet(d)
        self._append_log({"operation": "append", "files": log[-1]["files"] + [d]})
        return len(self._log()) - 1

    def rollback(self, version: int) -> int:
        """Commit a new version whose file set IS an old version's —
        history stays intact, the head moves back."""
        log = self._log()
        target = next(r for r in log if r["version"] == version)
        self._append_log({"operation": f"rollback({version})", "files": list(target["files"])})
        return len(self._log()) - 1

    def append_stream_batch(self, batch: DataFrame, batch_id: int) -> int | None:
        """Idempotent foreachBatch sink: commit the micro-batch as a
        delta UNLESS this batch_id already committed — Structured
        Streaming re-delivers the last batch after a failure, and
        recording the id in the log turns at-least-once delivery into
        exactly-once table contents.  Returns the new version, or None
        for a replayed no-op."""
        if any(r.get("batch_id") == batch_id for r in self._log()):
            return None
        log = self._log()
        if not log:
            d = self._new_dir("full")
            batch.write.mode("errorifexists").parquet(d)
            self._append_log({"operation": "stream", "batch_id": batch_id, "files": [d]})
            return 0
        d = self._new_dir("delta")
        batch.write.mode("errorifexists").parquet(d)
        self._append_log(
            {"operation": "stream", "batch_id": batch_id, "files": log[-1]["files"] + [d]}
        )
        return len(self._log()) - 1

    # -- reads -----------------------------------------------------------
    def read(self, spark: SparkSession, version: int | None = None) -> DataFrame:
        """Read the head, or `version=` for time travel."""
        log = self._log()
        if not log:
            raise ValueError(f"snapshot table {self.root} has no commits")
        rec = log[-1] if version is None else next(
            r for r in log if r["version"] == version
        )
        return spark.read.parquet(*rec["files"])
