"""Pipeline layer: named, chainable, optionally-materialized stages —
the Spark-native analogue of the reference's BulkProcessingOperator
(mapred/qexec/BulkProcessingOperator.java:57-65: run children, then
materialize each operator's output as a temp table before the parent
runs) and of dbt's model DAG.

The idiomatic upgrade over the reference: stages are LAZY by default —
a chain of stages is one Catalyst plan, so the optimizer sees through
stage boundaries (pushdown crosses stages, no forced temp tables).
Materialization is opt-in per stage:
  - "cache"      — spark .persist() (memory+disk), for reuse fan-out
  - "checkpoint" — truncate lineage (long iterative chains)
  - "parquet"    — durable handoff (the reference's temp-table behavior)
"""

from __future__ import annotations

import os
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class Stage:
    """One named transformation.  `fn` receives (upstream dataframes
    dict) and returns a DataFrame."""

    name: str
    fn: Callable[[dict[str, DataFrame]], DataFrame]
    depends_on: tuple[str, ...] = ()
    materialize: str | None = None  # None | "cache" | "checkpoint" | "parquet"


@dataclass
class Pipeline:
    """A DAG of stages executed in dependency order.

    run() returns {stage_name: DataFrame}.  Stages without materialize
    stay lazy — the final consumer triggers one fused job, exactly what
    you want at scale.  Cycles and unknown dependencies are rejected.
    """

    spark: SparkSession
    workdir: str | None = None  # needed for "parquet" materialization
    stages: list[Stage] = field(default_factory=list)

    def add(
        self,
        name: str,
        fn: Callable[[dict[str, DataFrame]], DataFrame],
        depends_on: tuple[str, ...] = (),
        materialize: str | None = None,
    ) -> "Pipeline":
        if any(s.name == name for s in self.stages):
            raise ValueError(f"duplicate stage name {name!r}")
        self.stages.append(Stage(name, fn, depends_on, materialize))
        return self

    def _topo_order(self) -> list[Stage]:
        by_name = {s.name: s for s in self.stages}
        for s in self.stages:
            for d in s.depends_on:
                if d not in by_name:
                    raise ValueError(f"stage {s.name!r} depends on unknown {d!r}")
        done: list[Stage] = []
        seen: set[str] = set()
        visiting: set[str] = set()

        def visit(s: Stage) -> None:
            if s.name in seen:
                return
            if s.name in visiting:
                raise ValueError(f"cycle through stage {s.name!r}")
            visiting.add(s.name)
            for d in s.depends_on:
                visit(by_name[d])
            visiting.discard(s.name)
            seen.add(s.name)
            done.append(s)

        for s in self.stages:
            visit(s)
        return done

    def run(self) -> dict[str, DataFrame]:
        results: dict[str, DataFrame] = {}
        for s in self._topo_order():
            upstream = {d: results[d] for d in s.depends_on}
            df = s.fn(upstream)
            if s.materialize == "cache":
                df = df.persist()
            elif s.materialize == "checkpoint":
                df = df.localCheckpoint(eager=True)
            elif s.materialize == "parquet":
                if not self.workdir:
                    raise ValueError("parquet materialization needs a workdir")
                path = os.path.join(self.workdir, s.name)
                df.write.mode("overwrite").parquet(path)
                df = self.spark.read.parquet(path)
            elif s.materialize is not None:
                raise ValueError(f"unknown materialize mode {s.materialize!r}")
            results[s.name] = df
        return results
