"""Driver-local relations without the Python boundary.

``spark.createDataFrame(list_of_rows)`` compiles to ``Scan
ExistingRDD``: the rows are pickled into an RDD whose partitions each
spin (or borrow) a Python worker at EXECUTION time — so every
materialization of even a 1-row relation pays JVM->Python->JVM
round-trips, and a ``coalesce(1)`` downstream serializes all of those
worker start-ups into one task (measured 5.1 s for a 1-row sentinel
union at sf0.1; spark_optimization_guide §4: eliminate the Python
boundary).

Routing the same rows through a ``pyarrow.Table`` instead yields a pure
JVM ``LocalTableScan`` — zero Python at execution, one Arrow batch at
construction (measured 0.06 s for the same relation).  ``local_df``
below is the drop-in replacement used by every collect-then-return and
literal-rows site in the workload; on any conversion refusal (exotic
nesting the Arrow path can't express) it falls back to the classic
path, so behavior — not performance — is the contract.

For constant ONE-ROW sentinel rows built entirely from ``F.lit``
columns, prefer ``spark.range(1).select(...)`` — pure JVM with no
driver data at all.
"""

from __future__ import annotations

from collections.abc import Iterable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def _as_struct(schema: T.StructType | str) -> T.StructType:
    if isinstance(schema, T.StructType):
        return schema
    parsed = T._parse_datatype_string(schema)
    if not isinstance(parsed, T.StructType):  # pragma: no cover - caller bug
        raise TypeError(f"local_df schema must be a struct, got {parsed}")
    return parsed


def local_df(
    spark: SparkSession,
    rows: Sequence | Iterable,
    schema: T.StructType | str,
    fanout: bool = False,
) -> DataFrame:
    """``spark.createDataFrame(rows, schema)`` with a LocalTableScan plan.

    `rows` are driver-side tuples/Rows already bounded by the caller
    (collected aggregates, literal probe tables).  Values pass through
    pyarrow exactly: None -> null, NaN stays NaN (pyarrow's
    ``from_pandas=False`` default), timestamps/decimals/arrays/binary
    keep their declared types via ``to_arrow_schema``.

    ``fanout=True`` round-robin-repartitions the relation to
    min(len(rows), defaultParallelism): a LocalTableScan is ONE
    partition, so a local relation that FEEDS heavy distributed work
    (asset decode stages, per-file footer parsing) must be spread back
    out or the downstream stage serializes on one task.  Leave False
    for result relations that are only materialized/collected.
    """
    struct = _as_struct(schema)
    rows = list(rows)
    if not rows:
        return spark.createDataFrame([], struct)
    n_fan = (
        max(1, min(len(rows), spark.sparkContext.defaultParallelism))
        if fanout
        else None
    )
    try:
        import pyarrow as pa
        from pyspark.sql.pandas.types import to_arrow_schema

        arrow_schema = to_arrow_schema(struct)
        cols = list(zip(*(tuple(r) for r in rows)))
        arrays = [
            pa.array(list(col), type=arrow_schema.field(j).type)
            for j, col in enumerate(cols)
        ]
        df = spark.createDataFrame(
            pa.Table.from_arrays(arrays, schema=arrow_schema)
        )
    except Exception:
        # Conversion refused (nested Rows, exotic types): classic path.
        df = spark.createDataFrame(rows, struct)
    return df.repartition(n_fan) if n_fan else df
