"""Operator layer: the reference's physical-operator inventory
(SURVEY.md §2) as thin, typed wrappers over the DataFrame API.

These wrappers deliberately add *no* execution logic — they declare the
logical plan and let Catalyst/AQE choose the physical strategy.  The
value they add over raw DataFrame calls:
  - reference-shaped signatures (projection maps, predicate lists,
    agg spec tuples) so reference test plans translate 1:1;
  - semantic guardrails the reference enforced (SUM/AVG only on
    arithmetic types, HAVING requires GROUP BY);
  - scale posture (broadcast hints, salting helpers) in one place.
"""

from dbt_lab_spark.operators.scan import scan, index_scan
from dbt_lab_spark.operators.joins import (
    join,
    cross_join,
    theta_join,
    merge_join_hint,
    broadcast_join,
    salted_join,
    asof_join,
    range_join,
)
from dbt_lab_spark.operators.aggregate import group_by, grand_aggregate, rollup, cube, pivot, unpivot, AggSpec
from dbt_lab_spark.operators.sort import sort, limit, top_k
from dbt_lab_spark.operators.setops import union_all, union_distinct, intersect, except_all, except_distinct
from dbt_lab_spark.operators.window import ranked, top_k_per_group, windowed_agg, running_agg
from dbt_lab_spark.operators.dml import insert_into, delete_where, delete_by_keys, update_where, upsert_by_keys
from dbt_lab_spark.operators.observe import observed

__all__ = [
    "scan", "index_scan",
    "join", "cross_join", "theta_join", "merge_join_hint", "broadcast_join", "salted_join",
    "asof_join", "range_join",
    "group_by", "grand_aggregate", "rollup", "cube", "pivot", "unpivot", "AggSpec",
    "sort", "limit", "top_k",
    "union_all", "union_distinct", "intersect", "except_all", "except_distinct",
    "ranked", "top_k_per_group", "windowed_agg", "running_agg",
    "insert_into", "delete_where", "delete_by_keys", "update_where", "upsert_by_keys",
    "observed",
]
