"""DML: insert / delete.

Reference: InsertOperator appends child tuples and maintains B-tree
indexes (qexec/InsertOperator.java:7; factory
AbstractExtensionFactory.java:274-281); DeleteOperator removes tuples by
RID (qexec/DeleteOperator.java:7; factory :294).

Spark mapping (SURVEY.md §2.1): insert = parquet append (no indexes to
maintain — row-group stats regenerate on write); delete = anti-join +
rewrite, the immutable-storage idiom (Delta/Iceberg would do the same
under MERGE).  There is no RID in a DataFrame engine; deletes are by
key or by predicate.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession


def insert_into(df: DataFrame, path: str) -> None:
    """Append rows to a parquet-backed table (InsertOperator analogue)."""
    df.write.mode("append").parquet(path)


def delete_where(
    spark: SparkSession, path: str, predicate: Column, out_path: str | None = None
) -> None:
    """Delete rows matching a predicate by rewriting the table.

    `out_path=None` rewrites in place (read fully materializes before
    overwrite via a staging write — here we require an explicit out_path
    or rely on parquet overwrite semantics being safe only for separate
    paths; in-place rewrite goes through a temp dir).
    """
    df = spark.read.parquet(path).filter(~predicate)
    target = out_path or path
    if target == path:
        tmp = path + ".__rewrite_tmp"
        df.write.mode("overwrite").parquet(tmp)
        final = spark.read.parquet(tmp)
        final.write.mode("overwrite").parquet(path)
        # best effort cleanup of the staging copy
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
    else:
        df.write.mode("overwrite").parquet(target)


def delete_by_keys(
    table: DataFrame, deletions: DataFrame, keys: Sequence[str]
) -> DataFrame:
    """Delete-by-key as a transformation: anti-join the deletion set
    (the DeleteOperator capability without RIDs).  Returns the surviving
    rows; caller writes them where needed."""
    return table.join(deletions.select(*keys).distinct(), on=list(keys), how="left_anti")


def update_where(
    table: DataFrame, predicate: Column, assignments: dict[str, Column]
) -> DataFrame:
    """UPDATE ... SET ... WHERE as a transformation: conditional column
    rewrite (the reference parses UpdateQuery, parser/UpdateQuery.java:16,
    but rejects it at the processor, QueryProcessor.java:162-172 — this
    is the capability upgrade).  Rows matching `predicate` get each
    assignment applied; others pass through.  Caller persists via
    insert_into/overwrite — copy-on-write, the immutable-storage idiom.
    """
    from pyspark.sql import functions as F

    out = table
    for col_name, value in assignments.items():
        if col_name not in table.columns:
            raise KeyError(f"unknown column {col_name!r}")
        out = out.withColumn(col_name, F.when(predicate, value).otherwise(F.col(col_name)))
    return out


def upsert_by_keys(
    table: DataFrame,
    updates: DataFrame,
    keys: Sequence[str],
    version_column: str | None = None,
) -> DataFrame:
    """MERGE/upsert as a transformation (the CDC apply step; Delta's
    `MERGE WHEN MATCHED UPDATE WHEN NOT MATCHED INSERT` without a table
    format).  Updates win over existing rows on key collision; with
    `version_column`, the highest version wins regardless of side —
    the idempotent out-of-order-CDC variant.

    Plan: one union + one window (row_number over key, precedence
    desc) — a single shuffle on the key, same cost as the anti-join +
    union idiom but also dedups WITHIN the update batch, which the
    anti-join form silently doesn't.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    if set(table.columns) != set(updates.columns):
        raise ValueError(
            f"schema mismatch: table {sorted(table.columns)} vs updates {sorted(updates.columns)}"
        )
    tagged = table.withColumn("__src", F.lit(0)).unionByName(
        updates.withColumn("__src", F.lit(1))
    )
    precedence = (
        [F.col(version_column).desc(), F.col("__src").desc()]
        if version_column
        else [F.col("__src").desc()]
    )
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(*precedence)
    return (
        tagged.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__src", "__rn")
    )


def dataset_diff(old: DataFrame, new: DataFrame, keys: list[str]) -> DataFrame:
    """Row-level diff between two versions of a table: one full outer
    join on the key, classifying every row as added / removed /
    changed / unchanged, with a per-column `<col>_changed` flag
    (null-safe compare) for the non-key columns.

    The data-versioning audit a training pipeline runs between corpus
    snapshots ("what did this recrawl actually change?").  Plan: a
    single key shuffle for the full outer join; flags are narrow
    JVM-side expressions — cost is one co-partitioned pass at any
    scale.  Deterministic: no ordering dependence, null-safe equality.
    """
    from pyspark.sql import functions as F

    if set(old.columns) != set(new.columns):
        raise ValueError(
            f"schema mismatch: old {sorted(old.columns)} vs new {sorted(new.columns)}"
        )
    value_cols = [c for c in old.columns if c not in keys]
    o = old.select(
        *[F.col(k).alias(k) for k in keys],
        F.struct(*[F.col(c).alias(c) for c in value_cols]).alias("__old"),
    )
    n = new.select(
        *[F.col(k).alias(k) for k in keys],
        F.struct(*[F.col(c).alias(c) for c in value_cols]).alias("__new"),
    )
    joined = o.join(n, keys, "full_outer")
    any_changed = None
    for c in value_cols:
        flag = ~F.col("__old").getField(c).eqNullSafe(F.col("__new").getField(c))
        any_changed = flag if any_changed is None else (any_changed | flag)
    change = (
        F.when(F.col("__old").isNull(), F.lit("added"))
        .when(F.col("__new").isNull(), F.lit("removed"))
        .when(any_changed if any_changed is not None else F.lit(False), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return joined.select(
        *keys,
        change.alias("change"),
        *[
            F.when(
                F.col("__old").isNotNull() & F.col("__new").isNotNull(), fc_expr
            ).otherwise(F.lit(False)).alias(fc_name)
            for fc_expr, fc_name in [
                (
                    ~F.col("__old").getField(c).eqNullSafe(F.col("__new").getField(c)),
                    f"{c}_changed",
                )
                for c in value_cols
            ]
        ],
    )
