"""Single-pass pipeline observability: `df.observe` wrappers.

At 100 TB a curation pipeline cannot afford a second scan just to
audit itself ("how many rows did the gate reject? how many nulls
slipped through?").  `DataFrame.observe` attaches aggregate metrics to
a plan node: Spark computes them as a side effect of whatever action
materializes the frame — zero extra passes, zero extra shuffles (the
metrics are accumulator-style, merged on the driver).

Batch: pass a `pyspark.sql.Observation`; after the first action on the
returned frame, `observation.get` yields the metric dict.  Streaming:
the same `observe(name, *exprs)` call surfaces the metrics per-batch
in `StreamingQueryProgress.observedMetrics[name]` — one code path for
both engines, like the rest of this package.

Only aggregate expressions are allowed, and DISTINCT aggregates are
rejected (INVALID_OBSERVED_METRICS — metrics must be mergeable
accumulator-style across tasks; use `approx_count_distinct`, whose HLL
sketch merges, where an NDV audit is needed).  Metrics ride the
existing job, so a frame that is never materialized reports nothing —
by design, observation never forces an action.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation


def observed(
    df: DataFrame, observation: Observation | str, metrics: dict[str, Column]
) -> DataFrame:
    """Attach named aggregate metrics to `df`, computed for free by the
    next action on the result.

    `observation`: an `Observation` (batch — read `observation.get`
    after an action) or a plain string name (streaming — read
    `progress.observedMetrics[name]`).  `metrics` maps output names to
    aggregate Columns; names are applied via `alias` so callers read
    them back by key.
    """
    exprs = [col.alias(name) for name, col in metrics.items()]
    return df.observe(observation, *exprs)
