from dbt_lab_spark.plans.pipeline import Pipeline, Stage
from dbt_lab_spark.plans.incremental import (
    Measure,
    partial_aggregate,
    merge_aggregates,
    incremental_update,
    read_state,
)

__all__ = [
    "Pipeline",
    "Stage",
    "Measure",
    "partial_aggregate",
    "merge_aggregates",
    "incremental_update",
    "read_state",
]
