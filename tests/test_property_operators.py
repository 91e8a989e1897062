"""Property-style randomized operator tests — the Spark port of the
reference's randomized unit tests (random schemas, random tuples,
random conjunctive predicates; TestPhysicalOperatorsIStudents.java:181-320,
SURVEY.md §5.1).  The independent expected-set computation is DuckDB on
the identical rows, compared with the same canonicalization as the t2
gate.

Determinism: seeded random.Random per case — no flaky generation.
"""

from __future__ import annotations

import datetime
import random

import duckdb
import pandas as pd
import pytest

from tests.oracle import compare

TYPES = ["int", "bigint", "double2", "string", "timestamp"]
OPS = ["=", "<>", "<", "<=", ">", ">="]
_OP_SQL = {"=": "=", "<>": "<>", "<": "<", "<=": "<=", ">": ">", ">=": ">="}


def _gen_schema(rng: random.Random) -> list[tuple[str, str]]:
    n = rng.randint(3, 8)
    return [(f"c{i}", rng.choice(TYPES)) for i in range(n)]


def _gen_value(rng: random.Random, typ: str):
    if rng.random() < 0.08:
        return None
    if typ == "int":
        return rng.randint(-50, 50)
    if typ == "bigint":
        return rng.randint(-10_000, 10_000)
    if typ == "double2":
        return round(rng.uniform(-100, 100), 2)
    if typ == "string":
        return "".join(rng.choice("abcde") for _ in range(rng.randint(1, 6)))
    if typ == "timestamp":
        return datetime.datetime(2020, 1, 1) + datetime.timedelta(
            seconds=rng.randint(0, 3_000_000)
        )
    raise AssertionError(typ)


_SPARK_TYPES = {
    "int": "int",
    "bigint": "long",
    "double2": "double",
    "string": "string",
    "timestamp": "timestamp",
}


def _make_frames(rng: random.Random, spark, n_rows: int = 400):
    schema = _gen_schema(rng)
    rows = [tuple(_gen_value(rng, t) for _, t in schema) for _ in range(n_rows)]
    ddl = ", ".join(f"{c} {_SPARK_TYPES[t]}" for c, t in schema)
    sdf = spark.createDataFrame(rows, ddl)
    pdf = pd.DataFrame(rows, columns=[c for c, _ in schema])
    # pandas turns int columns with NULLs into floats; round-trip via
    # object dtype so duckdb sees proper NULLs + ints
    for (c, t) in schema:
        if t in ("int", "bigint"):
            pdf[c] = pdf[c].astype("Int64")
    con = duckdb.connect()
    con.register("t", pdf)
    return schema, sdf, con


def _sql_literal(v) -> str:
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    if isinstance(v, datetime.datetime):
        return f"TIMESTAMP '{v.isoformat(sep=' ')}'"
    return repr(v)


def _gen_predicates(rng: random.Random, schema, n_preds: int):
    """Conjunctive <col> <op> <literal> predicates, reference grammar
    shape (LowLevelPredicate.java:21; WHERE is a pure conjunction)."""
    preds = []
    for _ in range(n_preds):
        col, typ = rng.choice(schema)
        op = rng.choice(OPS)
        lit = None
        while lit is None:
            lit = _gen_value(rng, typ)
        preds.append((col, op, lit))
    return preds


@pytest.mark.parametrize("seed", [101, 202, 303, 404])
def test_random_scan_filter_project(spark, seed):
    rng = random.Random(seed)
    schema, sdf, con = _make_frames(rng, spark)
    preds = _gen_predicates(rng, schema, rng.randint(1, 3))
    keep = sorted(rng.sample([c for c, _ in schema], rng.randint(1, len(schema))))

    from pyspark.sql import functions as F

    cond = None
    for col, op, lit in preds:
        c = F.col(col)
        expr = {
            "=": c == lit, "<>": c != lit, "<": c < lit,
            "<=": c <= lit, ">": c > lit, ">=": c >= lit,
        }[op]
        cond = expr if cond is None else (cond & expr)
    out = sdf.filter(cond).select(*keep)

    where = " AND ".join(f"{c} {_OP_SQL[o]} {_sql_literal(v)}" for c, o, v in preds)
    sql = f"SELECT {', '.join(keep)} FROM t WHERE {where}"
    report = compare(out, con, sql)
    assert report["ok"], (preds, keep, report)


@pytest.mark.parametrize("seed", [11, 22, 33, 44])
def test_random_group_by_aggregates(spark, seed):
    rng = random.Random(seed)
    schema, sdf, con = _make_frames(rng, spark)
    group_col = rng.choice([c for c, t in schema if t in ("string", "int")] or [schema[0][0]])
    int_cols = [c for c, t in schema if t in ("int", "bigint")]
    any_col = rng.choice([c for c, _ in schema])

    from pyspark.sql import functions as F

    aggs = [
        F.count(any_col).alias("cnt"),
        F.min(any_col).alias("mn"),
        F.max(any_col).alias("mx"),
    ]
    sql_aggs = [
        f"COUNT({any_col}) AS cnt",
        f"MIN({any_col}) AS mn",
        f"MAX({any_col}) AS mx",
    ]
    if int_cols:
        ic = rng.choice(int_cols)
        aggs.append(F.sum(ic).alias("sm"))
        sql_aggs.append(f"CAST(SUM({ic}) AS BIGINT) AS sm")
    out = sdf.groupBy(group_col).agg(*aggs)
    sql = f"SELECT {group_col}, {', '.join(sql_aggs)} FROM t GROUP BY {group_col}"
    report = compare(out, con, sql)
    assert report["ok"], (group_col, report)


@pytest.mark.parametrize("seed", [7, 17, 27])
def test_random_equi_join(spark, seed):
    """Random equi-join of the frame against an aggregated copy of
    itself (guarantees key overlap), NULL keys never match — SQL and
    reference semantics agree (NULL fails all predicates)."""
    rng = random.Random(seed)
    schema, sdf, con = _make_frames(rng, spark)
    key = rng.choice([c for c, t in schema if t in ("int", "string")] or [schema[0][0]])

    from pyspark.sql import functions as F

    dim = sdf.groupBy(key).agg(F.count("*").alias("k_count"))
    out = sdf.select(key).join(dim, on=key, how="inner")
    sql = f"""
      SELECT a.{key} AS {key}, b.k_count
      FROM t a JOIN (SELECT {key}, COUNT(*) AS k_count FROM t GROUP BY {key}) b
        ON a.{key} = b.{key}
    """
    report = compare(out, con, sql)
    assert report["ok"], (key, report)


@pytest.mark.parametrize("seed", [5, 15])
def test_random_sort_topk(spark, seed):
    """Random multi-column asc/desc sort with full-row tie-break —
    order-sensitive comparison (top-k must agree exactly)."""
    rng = random.Random(seed)
    schema, sdf, con = _make_frames(rng, spark)
    cols = [c for c, _ in schema]
    n_sort = rng.randint(1, len(cols))
    sort_cols = rng.sample(cols, n_sort)
    asc = [rng.random() < 0.5 for _ in sort_cols]
    # tie-break on every remaining column for determinism
    rest = [c for c in cols if c not in sort_cols]
    all_cols = sort_cols + rest
    all_asc = asc + [True] * len(rest)

    from pyspark.sql import functions as F

    order = [F.col(c).asc_nulls_first() if a else F.col(c).desc_nulls_last()
             for c, a in zip(all_cols, all_asc)]
    out = sdf.orderBy(*order).limit(50)
    order_sql = ", ".join(
        f"{c} {'ASC NULLS FIRST' if a else 'DESC NULLS LAST'}"
        for c, a in zip(all_cols, all_asc)
    )
    sql = f"SELECT * FROM t ORDER BY {order_sql} LIMIT 50"
    report = compare(out, con, sql)
    assert report["ok"], (sort_cols, asc, report)


@pytest.mark.parametrize("seed", [42])
def test_salted_join_equals_plain_join(spark, seed):
    """Skew path: salted join must be result-identical to the plain
    equi-join on a skewed key distribution (90% of rows share one key)."""
    rng = random.Random(seed)
    from pyspark.sql import functions as F

    from dbt_lab_spark.operators import salted_join

    big = spark.createDataFrame(
        [(("hot" if rng.random() < 0.9 else f"k{rng.randint(0, 20)}"), i)
         for i in range(2000)],
        "k string, payload long",
    )
    small = spark.createDataFrame(
        [("hot", 1), ("k3", 2), ("k7", 3), ("missing", 4)], "k string, dim long"
    )
    plain = {(r.k, r.payload, r.dim)
             for r in big.join(small, on="k", how="inner").collect()}
    salted = {(r.k, r.payload, r.dim)
              for r in salted_join(big, small, key="k", salt_buckets=8).collect()}
    assert salted == plain and len(plain) > 1500


@pytest.mark.parametrize("seed", [61, 62])
def test_random_set_operations(spark, seed):
    """Set ops vs DuckDB on two random frames with a shared schema:
    UNION (distinct), UNION ALL, INTERSECT, EXCEPT."""
    rng = random.Random(seed)
    schema = [("a", "int"), ("b", "string")]
    def frame(n):
        rows = [tuple(_gen_value(rng, t) for _, t in schema) for _ in range(n)]
        return rows
    r1, r2 = frame(150), frame(150)
    sdf1 = spark.createDataFrame(r1, "a int, b string")
    sdf2 = spark.createDataFrame(r2, "a int, b string")
    con = duckdb.connect()
    con.register("t1", pd.DataFrame(r1, columns=["a", "b"]).astype({"a": "Int64"}))
    con.register("t2", pd.DataFrame(r2, columns=["a", "b"]).astype({"a": "Int64"}))

    from dbt_lab_spark.operators import except_distinct, intersect, union_all, union_distinct

    cases = [
        (union_distinct(sdf1, sdf2), "SELECT a, b FROM t1 UNION SELECT a, b FROM t2"),
        (union_all(sdf1, sdf2), "SELECT a, b FROM t1 UNION ALL SELECT a, b FROM t2"),
        (intersect(sdf1, sdf2), "SELECT a, b FROM t1 INTERSECT SELECT a, b FROM t2"),
        (except_distinct(sdf1, sdf2), "SELECT a, b FROM t1 EXCEPT SELECT a, b FROM t2"),
    ]
    for sdf, sql in cases:
        report = compare(sdf, con, sql)
        assert report["ok"], (sql, report)


@pytest.mark.parametrize("seed", [71, 72])
def test_random_window_rank_and_running(spark, seed):
    """Window functions vs DuckDB: row_number ranking and a cumulative
    frame-spec sum over random groups."""
    rng = random.Random(seed)
    rows = [
        (rng.randint(0, 5), i, rng.randint(-100, 100))
        for i in range(300)
    ]
    sdf = spark.createDataFrame(rows, "g int, id long, v long")
    con = duckdb.connect()
    con.register("t", pd.DataFrame(rows, columns=["g", "id", "v"]))

    from pyspark.sql import functions as F

    from dbt_lab_spark.operators import ranked, running_agg, top_k_per_group

    report = compare(
        ranked(sdf, ["g"], ["v", "id"], [False, True], "row_number", "rn"),
        con,
        """SELECT g, id, v, CAST(ROW_NUMBER() OVER
             (PARTITION BY g ORDER BY v DESC, id ASC) AS INT) AS rn FROM t""",
    )
    assert report["ok"], report

    report = compare(
        top_k_per_group(sdf, ["g"], ["v", "id"], 5, [False, True]),
        con,
        """SELECT g, id, v FROM (
             SELECT g, id, v, ROW_NUMBER() OVER
               (PARTITION BY g ORDER BY v DESC, id ASC) AS rn FROM t
           ) WHERE rn <= 5""",
    )
    assert report["ok"], report

    report = compare(
        running_agg(sdf, ["g"], ["id"], F.sum("v"), "cum_v"),
        con,
        """SELECT g, id, v, SUM(v) OVER (PARTITION BY g ORDER BY id
             ROWS UNBOUNDED PRECEDING) AS cum_v FROM t""",
    )
    assert report["ok"], report


def test_null_fails_all_predicates(spark):
    """Reference NULL semantics (LowLevelPredicate.java:102-132): a NULL
    operand fails every comparison — Spark's ternary logic agrees for
    all six operators, which is why no shim exists in expr.py."""
    from dbt_lab_spark.expr import compare

    df = spark.createDataFrame([(None,), (5,)], "x int")
    for op in ["=", "<>", "<", "<=", ">", ">="]:
        got = [r.x for r in df.filter(compare("x", op, 5)).collect()]
        assert None not in got, f"NULL passed predicate {op}"
    # and NULL = NULL is not true either
    df2 = spark.createDataFrame([(None, None)], "a int, b int")
    from dbt_lab_spark.expr import column_compare

    assert df2.filter(column_compare("a", "=", "b")).count() == 0
