"""Strict reference-grammar front end: tokenizer/parser unit tests
mirroring the reference's validity rules, plus compile-and-compare
against DuckDB and against the superset (spark.sql) entry.

Reference citations: token set Token.java:20-42, tokenizer behavior
SQLTokenizer.java:120-279, clause validity SelectQuery.java:284-293,
DML rejection QueryProcessor.java:162-172.
"""

import pytest

from dbt_lab_spark.catalog import Catalog
from dbt_lab_spark.parser import (
    ColumnRef,
    DmlQ,
    Literal,
    ParseError,
    Parser,
    StrictSqlProcessor,
    tokenize,
)

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# tokenizer
# ---------------------------------------------------------------------------


def test_tokenizer_keywords_case_insensitive():
    kinds = [t.kind for t in tokenize("select From WHERE gRoUp by")]
    assert kinds == ["SELECT", "FROM", "WHERE", "GROUP", "BY", "EOF"]


def test_tokenizer_operators_and_punct():
    kinds = [t.kind for t in tokenize("a.b <> 1 , ( ) <= >= < > =")]
    assert kinds == ["IDENT", "PERIOD", "IDENT", "<>", "INT", "COMMA",
                     "LPAREN", "RPAREN", "<=", ">=", "<", ">", "=", "EOF"]


def test_tokenizer_double_quoted_literal_with_escape():
    toks = tokenize('x.y = "BUILD\\"ING"')
    lit = [t for t in toks if t.kind == "LITERAL"]
    assert len(lit) == 1 and lit[0].text == 'BUILD"ING'


def test_tokenizer_unary_minus_vs_operator():
    # '- 5' after '=' is a negative number; after an identifier it is the
    # minus operator (SQLTokenizer.java:159-162)
    kinds = [t.kind for t in tokenize("a.b = -5")]
    assert "INT" in kinds and "MINUS" not in kinds
    kinds = [t.kind for t in tokenize("a.b - 5")]
    assert "MINUS" in kinds


def test_tokenizer_rejects_double_period_number():
    with pytest.raises(ParseError, match="invalid number"):
        tokenize("SELECT 1.2.3")


def test_tokenizer_rejects_invalid_characters():
    for bad in ["SELECT a.b FROM t;", "a.b = 'x'", "a | b"]:
        with pytest.raises(ParseError, match="invalid character"):
            tokenize(bad)


def test_tokenizer_rejects_unclosed_literal():
    with pytest.raises(ParseError, match="unclosed literal"):
        tokenize('a.b = "oops')


# ---------------------------------------------------------------------------
# parser: accepted reference shapes
# ---------------------------------------------------------------------------


def test_parse_full_select_shape():
    q = Parser(
        "SELECT n.n_name AS nation, COUNT(c.c_custkey) AS cnt "
        "FROM customer c, nation n "
        "WHERE c.c_nationkey = n.n_nationkey AND c.c_acctbal > 100.5 "
        "GROUP BY n.n_name HAVING cnt > 3 ORDER BY nation DESC"
    ).parse()
    assert [c.alias for c in q.select] == ["nation", "cnt"]
    assert q.select[1].agg == "COUNT"
    assert [t.alias for t in q.from_] == ["c", "n"]
    assert len(q.where) == 2
    assert q.where[1].rhs == Literal(100.5)
    assert q.group_by == [ColumnRef("n", "n_name")]
    assert q.having[0].lhs == "cnt"
    assert q.order_by[0].direction == "DESC"


def test_parse_from_subquery():
    # nested FROM-subquery, the TestJoinOrderOptimizerStudents.java:476
    # shape
    q = Parser(
        "SELECT s.mx AS mx FROM "
        "(SELECT MAX(r.r_regionkey) AS mx FROM region r GROUP BY r.r_name) s"
    ).parse()
    assert q.from_[0].alias == "s"
    assert q.from_[0].source.select[0].agg == "MAX"


def test_parse_arithmetic_expression_output():
    q = Parser("SELECT l.l_extendedprice * (1 - l.l_discount) AS rev FROM lineitem l").parse()
    assert q.select[0].alias == "rev"


def test_parse_dml_shapes():
    assert Parser('INSERT INTO nation VALUES (1, "x", 2, "y")').parse() == DmlQ("INSERT", "nation")
    assert Parser("DELETE FROM nation WHERE n.n_nationkey = 3").parse() == DmlQ("DELETE", "nation")
    assert Parser("UPDATE nation SET n.n_name = \"z\" WHERE n.n_nationkey = 1").parse() == DmlQ(
        "UPDATE", "nation"
    )


# ---------------------------------------------------------------------------
# parser: rejections the reference grammar implies
# ---------------------------------------------------------------------------


def test_rejects_tokens_absent_from_reference_grammar():
    # OR / LIKE / IN / LIMIT / DISTINCT / JOIN are not reference tokens
    # (Token.java:20-42) — they tokenize as identifiers and fail to parse.
    bad = [
        "SELECT c.a FROM t c WHERE c.a = 1 OR c.b = 2",
        'SELECT c.a FROM t c WHERE c.name LIKE "x"',
        "SELECT c.a FROM t c WHERE c.a IN (1, 2)",
        "SELECT c.a FROM t c LIMIT 5",
        "SELECT DISTINCT c.a FROM t c",
        "SELECT c.a FROM t c JOIN u d",
    ]
    for sql in bad:
        with pytest.raises(ParseError):
            Parser(sql).parse()


def test_rejects_missing_from():
    # SELECT and FROM are required (SelectQuery.java:284-293)
    with pytest.raises(ParseError):
        Parser("SELECT 1 AS one").parse()


def test_rejects_having_without_group_by():
    with pytest.raises(ParseError, match="HAVING requires GROUP BY"):
        Parser("SELECT COUNT(c.a) AS n FROM t c HAVING n > 1").parse()


def test_rejects_unqualified_column():
    # Column nodes are alias-qualified (Column.java:24-46)
    with pytest.raises(ParseError):
        Parser("SELECT custkey FROM customer c").parse()


# ---------------------------------------------------------------------------
# compile + execute
# ---------------------------------------------------------------------------


def test_strict_compile_matches_superset_sql(spark):
    cat = Catalog(SF)
    strict = StrictSqlProcessor(spark, cat)
    got = strict.process_query(
        "SELECT n.n_name AS nation, COUNT(c.c_custkey) AS cnt, "
        "MIN(c.c_acctbal) AS lo, MAX(c.c_acctbal) AS hi "
        "FROM customer c, nation n "
        "WHERE c.c_nationkey = n.n_nationkey AND c.c_acctbal > 0 "
        "GROUP BY n.n_name HAVING cnt > 1 ORDER BY nation"
    ).collect()
    cat.register_views(spark)
    want = spark.sql(
        "SELECT n_name AS nation, COUNT(c_custkey) AS cnt, "
        "MIN(c_acctbal) AS lo, MAX(c_acctbal) AS hi "
        "FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey "
        "WHERE c_acctbal > 0 GROUP BY n_name HAVING cnt > 1 ORDER BY nation"
    ).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    assert len(got) > 0


def test_strict_compile_padded_char_literal(spark):
    # double-quoted literal with the exact stored value
    cat = Catalog(SF)
    strict = StrictSqlProcessor(spark, cat)
    rows = strict.process_query(
        'SELECT c.c_custkey AS k FROM customer c WHERE c.c_mktsegment = "BUILDING"'
    ).collect()
    assert len(rows) > 0


def test_strict_plan_recovers_join_from_cross_product(spark):
    # Catalyst must turn cross-join + equality filter into a real join
    # (no CartesianProduct / BroadcastNestedLoopJoin in the plan).
    cat = Catalog(SF)
    strict = StrictSqlProcessor(spark, cat)
    df = strict.process_query(
        "SELECT c.c_name AS name, n.n_name AS nation FROM customer c, nation n "
        "WHERE c.c_nationkey = n.n_nationkey"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan


def test_strict_rejects_dml_execution(spark):
    strict = StrictSqlProcessor(spark, Catalog(SF))
    with pytest.raises(ValueError, match="not executable"):
        strict.process_query('INSERT INTO nation VALUES (1, "x", 2, "y")')


def test_strict_rejects_sum_on_string(spark):
    strict = StrictSqlProcessor(spark, Catalog(SF))
    with pytest.raises(ParseError, match="not legal"):
        strict.process_query(
            "SELECT SUM(c.c_name) AS s FROM customer c GROUP BY c.c_nationkey"
        ).collect()


# ---------------------------------------------------------------------------
# property: random reference-grammar queries == equivalent spark.sql
# ---------------------------------------------------------------------------


def test_random_reference_queries_match_spark_sql(spark):
    """Generate reference-grammar SELECTs over nation/region/customer
    (random projections, filters, optional group-by aggregation) and
    check the strict compiler's results equal the same query run
    through spark.sql on registered views."""
    import random

    cat = Catalog(SF)
    strict = StrictSqlProcessor(spark, cat)
    cat.register_views(spark)
    rng = random.Random(2024)

    numeric = {"customer": ["c_custkey", "c_nationkey", "c_acctbal"],
               "nation": ["n_nationkey", "n_regionkey"],
               "region": ["r_regionkey"]}
    group = {"customer": "c_nationkey", "nation": "n_regionkey", "region": "r_regionkey"}
    ops = ["=", "<>", ">", "<", ">=", "<="]

    for trial in range(12):
        table = rng.choice(list(numeric))
        t = table[0]
        cols = numeric[table]
        fcol = rng.choice(cols)
        op = rng.choice(ops)
        lit = rng.choice([0, 3, 10, 500])
        where = f"{t}.{fcol} {op} {lit}"
        where_sql = f"{fcol} {op} {lit}"
        if rng.random() < 0.5:
            c2 = rng.choice(cols)
            where += f" AND {t}.{c2} >= 0"
            where_sql += f" AND {c2} >= 0"
        if rng.random() < 0.5:
            g = group[table]
            agg_col = rng.choice(cols)
            strict_sql = (
                f"SELECT {t}.{g} AS k, COUNT({t}.{agg_col}) AS n, "
                f"MIN({t}.{agg_col}) AS lo, MAX({t}.{agg_col}) AS hi "
                f"FROM {table} {t} WHERE {where} GROUP BY {t}.{g}"
            )
            ref_sql = (
                f"SELECT {g} AS k, COUNT({agg_col}) AS n, "
                f"MIN({agg_col}) AS lo, MAX({agg_col}) AS hi "
                f"FROM {table} WHERE {where_sql} GROUP BY {g}"
            )
        else:
            proj = rng.sample(cols, min(2, len(cols)))
            sel = ", ".join(f"{t}.{c} AS {c}" for c in proj)
            strict_sql = f"SELECT {sel} FROM {table} {t} WHERE {where}"
            ref_sql = f"SELECT {', '.join(proj)} FROM {table} WHERE {where_sql}"
        got = sorted(tuple(r) for r in strict.process_query(strict_sql).collect())
        want = sorted(tuple(r) for r in spark.sql(ref_sql).collect())
        assert got == want, (trial, strict_sql)
