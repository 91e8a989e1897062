"""Materialized-view result cache with snapshot invalidation.

A query over slowly-changing parquet snapshots shouldn't recompute on
every read — but serving a stale cache after the snapshot moved is a
correctness bug, not a perf feature.  `MaterializedView` keys the
cached result on (a) a fingerprint of the inputs' on-disk state —
every data file's (path, size, mtime_ns) under the declared input
paths — and (b) a fingerprint of the query itself (its analyzed
logical plan string), so EITHER new data OR a changed view definition
invalidates.  Reads hit parquet when fresh and rebuild atomically
(plans/incremental.py's swap: readers never observe a half-written
view) when stale.

100 TB posture: the freshness check is a driver-side directory listing
(the same metadata a parquet scan lists anyway), never a data read; on
an object store the (path, size, mtime) listing is one LIST call per
input prefix.  The rebuild cost is the query itself — the cache makes
repeated dashboard/pipeline reads O(listing), not O(query).
"""

from __future__ import annotations

import hashlib
import json
import os
from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession

from dbt_lab_spark.plans.snapshots import _read_pq

from dbt_lab_spark.plans.incremental import _atomic_swap_write

_MANIFEST = "_matview_manifest.json"


def _input_fingerprint(paths: Sequence[str]) -> str:
    """Fingerprint the inputs' on-disk state: every file's
    (relpath, size, mtime_ns) under each input path, order-canonical."""
    h = hashlib.sha256()
    for root in sorted(paths):
        if os.path.isfile(root):
            st = os.stat(root)
            h.update(f"{root}|{st.st_size}|{st.st_mtime_ns}\n".encode())
            continue
        for dirpath, dirnames, filenames in os.walk(root):
            dirnames.sort()
            for fn in sorted(filenames):
                p = os.path.join(dirpath, fn)
                st = os.stat(p)
                rel = os.path.relpath(p, root)
                h.update(f"{root}::{rel}|{st.st_size}|{st.st_mtime_ns}\n".encode())
    return h.hexdigest()


def _plan_fingerprint(df: DataFrame) -> str:
    """Fingerprint the view definition via its analyzed logical plan
    (stable across sessions for the same query over the same schema;
    changes whenever the definition does)."""
    plan = df._jdf.queryExecution().analyzed().toString()  # noqa: SLF001
    # expression IDs (#123) vary run-to-run; strip them so the same
    # definition fingerprints identically across sessions
    import re

    canon = re.sub(r"#\d+L?", "#", plan)
    return hashlib.sha256(canon.encode()).hexdigest()


class MaterializedView:
    """A parquet-materialized query with freshness checking.

    >>> mv = MaterializedView("daily_rollup", build_fn, inputs=[sf_dir],
    ...                       store=state_dir)
    >>> df = mv.read(spark)     # rebuilds iff inputs or definition moved

    `build_fn(spark) -> DataFrame` declares the view; `inputs` are the
    paths whose on-disk state gates freshness.
    """

    def __init__(
        self,
        name: str,
        build: Callable[[SparkSession], DataFrame],
        inputs: Sequence[str],
        store: str,
    ) -> None:
        self.name = name
        self.build = build
        self.inputs = list(inputs)
        self.path = os.path.join(store, name)
        os.makedirs(store, exist_ok=True)

    # -- freshness -------------------------------------------------------
    def _manifest_path(self) -> str:
        return self.path + "." + _MANIFEST

    def _current_fingerprints(self, spark: SparkSession) -> dict[str, str]:
        return {
            "inputs": _input_fingerprint(self.inputs),
            "plan": _plan_fingerprint(self.build(spark)),
        }

    def is_fresh(self, spark: SparkSession) -> bool:
        if not os.path.exists(self.path) or not os.path.exists(self._manifest_path()):
            return False
        with open(self._manifest_path()) as fh:
            stored = json.load(fh)
        return stored == self._current_fingerprints(spark)

    # -- read / refresh --------------------------------------------------
    def refresh(self, spark: SparkSession) -> None:
        """Rebuild unconditionally (atomic swap — concurrent readers
        keep the old view until the rename lands)."""
        fps = self._current_fingerprints(spark)
        _atomic_swap_write(self.build(spark), self.path)
        tmp = self._manifest_path() + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(fps, fh)
        os.replace(tmp, self._manifest_path())

    def read(self, spark: SparkSession) -> DataFrame:
        """Serve the cached view, rebuilding first iff stale."""
        if not self.is_fresh(spark):
            self.refresh(spark)
        return _read_pq(spark, self.path)
