"""Strict reference-grammar SQL front end.

The default SQL entry (`sql.SqlProcessor`) hands strings to Spark's own
parser — a strict *superset* of the reference grammar, so every
reference query runs, but reference *error* behavior is not reproduced.
This module closes that gap: a tokenizer + recursive-descent parser for
exactly the reference's SQL subset, compiling to the same operator
layer.  In strict mode, what the reference rejects, we reject.

Faithfulness map (all citations into /root/reference):

- Token set: `minidbs-core/.../parser/Token.java:20-42` — SELECT FROM
  WHERE GROUP HAVING ORDER BY, INSERT INTO UPDATE SET DELETE VALUES,
  AS AND ASC/DESC, COUNT SUM AVG MIN MAX, ``. , ( ) + - * /``,
  ``= > < <> <= >=``, identifiers, double-quoted literals, integer and
  real numbers.  Notably ABSENT (hence rejected here): OR, LIKE, IN,
  NOT, NULL, DISTINCT, LIMIT, JOIN/ON, UNION.
- Tokenizer behavior: `parser/SQLTokenizer.java:120-279` — keywords
  case-insensitive (`:356-430`), literals in double quotes with
  backslash escapes (`:173,190-198`), unary minus disambiguated by the
  previous token (`:159-162`), at most one decimal point per number
  (`:214-224`), ParseException with statement position on invalid
  characters.
- Clause validity: `parser/SelectQuery.java:284-293` — SELECT and FROM
  are required.  NOTE: the reference javadoc says "HAVING implies that
  GROUP BY is set" but the code tests `having == null || groupBy ==
  null` (can't both be set), which contradicts its own alias-HAVING
  support (`parser/Predicate.java:266-276`) and would reject every
  HAVING query its operator layer supports.  We implement the javadoc
  contract (HAVING requires GROUP BY) and document the discrepancy.
- Column model: always alias-qualified `alias.column`
  (`parser/Column.java:24-46` — tableAlias is a constructor-required
  field); output columns are aggregated or plain with AS aliases
  (`parser/OutputColumn.java:17-60`); HAVING predicates reference
  SELECT aliases (`parser/Predicate.java:266-276`); ORDER BY references
  output columns (`parser/OrderColumn.java`).
- FROM: comma-separated table references with aliases, including
  parenthesized subqueries (`parser/TableReference.java:39-55`; nested
  example `minidbs-test/.../TestJoinOrderOptimizerStudents.java:476-502`).
- WHERE/HAVING: AND-only conjunctions of binary predicates
  (`parser/Predicate.java:56-80` operator enum; `WhereClause.java`).
- SUM/AVG only on arithmetic types
  (`qexec/OperatorFactory.java:357-361`, mirrored via types.is_arithmetic).
- DML parses but is rejected at execution
  (`QueryProcessor.java:162-172`).

Spark-first compilation: FROM tables become aliased scans joined as a
cross product with WHERE conjunctions applied as filters — Catalyst's
PushPredicateThroughJoin + ReorderJoin turn that into the same
equi-join tree the reference's optimizer would build, so no
hand-scheduling is needed.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dbt_lab_spark.catalog import Catalog
from dbt_lab_spark.types import is_arithmetic

# ---------------------------------------------------------------------------
# tokens
# ---------------------------------------------------------------------------

KEYWORDS = {
    "SELECT", "FROM", "WHERE", "GROUP", "HAVING", "ORDER", "BY",
    "INSERT", "INTO", "UPDATE", "SET", "DELETE", "VALUES",
    "AS", "AND",
}
AGGS = {"COUNT", "SUM", "AVG", "MIN", "MAX"}
# ASC/ASCENDING, DESC/DESCENDING (SQLTokenizer.java:403-408)
DIRECTIONS = {"ASC": "ASC", "ASCENDING": "ASC", "DESC": "DESC", "DESCENDING": "DESC"}
OPERATORS = {"=", ">", "<", "<>", "<=", ">="}
PUNCT = {".": "PERIOD", ",": "COMMA", "(": "LPAREN", ")": "RPAREN",
         "+": "PLUS", "-": "MINUS", "*": "MUL", "/": "DIV"}


class ParseError(Exception):
    """Mirror of the reference's ParseException: carries the statement
    and the offending position (parser/ParseException.java)."""

    def __init__(self, statement: str, position: int, message: str):
        self.statement = statement
        self.position = position
        super().__init__(f"{message} (at position {position}: "
                         f"...{statement[max(0, position - 10):position + 10]!r}...)")


@dataclass(frozen=True)
class Tok:
    kind: str   # keyword name, agg name, 'IDENT', 'LITERAL', 'INT', 'REAL', operator/punct kind, 'EOF'
    text: str
    pos: int


def tokenize(sql: str) -> list[Tok]:
    """Mirror of SQLTokenizer.nextToken (SQLTokenizer.java:120-279)."""
    toks: list[Tok] = []
    i, n = 0, len(sql)

    def last_kind() -> str:
        return toks[-1].kind if toks else "EMPTY"

    while i < n:
        c = sql[i]
        if c.isspace():
            i += 1
            continue
        start = i
        if c in PUNCT and not (
            # '-' may start a negative number unless the previous token
            # could end an operand (SQLTokenizer.java:159-162)
            c == "-" and last_kind() not in ("INT", "REAL", "IDENT", "RPAREN")
        ):
            toks.append(Tok(PUNCT[c], c, start))
            i += 1
        elif c in "=<>":
            if i + 1 < n and sql[i + 1] in "=<>":
                op = sql[i : i + 2]
                if op not in OPERATORS:
                    raise ParseError(sql, start, f"invalid operator {op!r}")
                toks.append(Tok(op, op, start))
                i += 2
            else:
                toks.append(Tok(c, c, start))
                i += 1
        elif c == '"':
            # double-quoted literal, backslash escapes (SQLTokenizer.java:173,190-198)
            buf, i = [], i + 1
            while i < n:
                if sql[i] == "\\" and i + 1 < n:
                    buf.append(sql[i + 1])
                    i += 2
                elif sql[i] == '"':
                    break
                else:
                    buf.append(sql[i])
                    i += 1
            if i >= n:
                raise ParseError(sql, start, "unclosed literal")
            toks.append(Tok("LITERAL", "".join(buf), start))
            i += 1
        elif c.isdigit() or c == "-":
            j = i + 1
            seen_dot = False
            while j < n and (sql[j].isdigit() or sql[j] == "."):
                if sql[j] == ".":
                    if seen_dot:  # at most one period (SQLTokenizer.java:214-224)
                        raise ParseError(sql, start, f"invalid number {sql[i:j + 1]!r}")
                    seen_dot = True
                j += 1
            text = sql[i:j]
            if text == "-":
                raise ParseError(sql, start, "invalid character '-'")
            toks.append(Tok("REAL" if seen_dot else "INT", text, start))
            i = j
        elif c.isidentifier():
            j = i + 1
            while j < n and (sql[j].isalnum() or sql[j] == "_"):
                j += 1
            word = sql[i:j]
            upper = word.upper()
            if upper in KEYWORDS:
                toks.append(Tok(upper, word, start))
            elif upper in AGGS:
                toks.append(Tok(upper, word, start))
            elif upper in DIRECTIONS:
                toks.append(Tok(DIRECTIONS[upper], word, start))
            else:
                toks.append(Tok("IDENT", word, start))
            i = j
        else:
            # e.g. ';', "'", '|' — invalid characters in this grammar
            # (SQLTokenizer.java:184-187)
            raise ParseError(sql, start, f"invalid character {c!r}")
    toks.append(Tok("EOF", "", n))
    return toks


# ---------------------------------------------------------------------------
# AST (mirrors parser/*.java node classes)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class ColumnRef:           # parser/Column.java: alias-qualified, both parts required
    table_alias: str
    name: str


@dataclass(frozen=True)
class Literal:             # parser/Literal.java + Integer/Real/StringLiteral
    value: object          # str | int | float


@dataclass(frozen=True)
class Arith:               # parser/Expression.java: binary +,-,*,/
    op: str
    left: object
    right: object


@dataclass(frozen=True)
class OutputCol:           # parser/OutputColumn.java
    expr: object           # ColumnRef | Arith | Literal
    agg: str | None        # None | COUNT/SUM/AVG/MIN/MAX
    alias: str


@dataclass(frozen=True)
class Pred:                # parser/Predicate.java
    lhs: object            # ColumnRef | Arith | str (HAVING alias)
    op: str
    rhs: object            # Literal | ColumnRef | Arith


@dataclass(frozen=True)
class TableRef:            # parser/TableReference.java
    source: object         # str (table name) | SelectQ (subquery)
    alias: str


@dataclass(frozen=True)
class OrderCol:            # parser/OrderColumn.java: references an output column
    alias: str
    direction: str         # ASC | DESC


@dataclass
class SelectQ:             # parser/SelectQuery.java
    select: list[OutputCol] = field(default_factory=list)
    from_: list[TableRef] = field(default_factory=list)
    where: list[Pred] = field(default_factory=list)
    group_by: list[ColumnRef] = field(default_factory=list)
    having: list[Pred] = field(default_factory=list)
    order_by: list[OrderCol] = field(default_factory=list)


@dataclass
class DmlQ:                # Insert/Update/DeleteQuery.java — parsed, rejected at execution
    kind: str              # INSERT | UPDATE | DELETE
    table: str


class Parser:
    """Recursive-descent parser over the reference grammar."""

    def __init__(self, sql: str):
        self.sql = sql
        self.toks = tokenize(sql)
        self.i = 0

    # -- token helpers ------------------------------------------------------
    def peek(self) -> Tok:
        return self.toks[self.i]

    def next(self) -> Tok:
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, kind: str) -> Tok:
        t = self.next()
        if t.kind != kind:
            raise ParseError(self.sql, t.pos, f"expected {kind}, found {t.kind} {t.text!r}")
        return t

    def accept(self, kind: str) -> Tok | None:
        if self.peek().kind == kind:
            return self.next()
        return None

    # -- entry --------------------------------------------------------------
    def parse(self) -> SelectQ | DmlQ:
        t = self.peek()
        if t.kind == "SELECT":
            q = self.parse_select()
            self.expect("EOF")
            return q
        if t.kind in ("INSERT", "UPDATE", "DELETE"):
            return self.parse_dml()
        raise ParseError(self.sql, t.pos, f"expected SELECT/INSERT/UPDATE/DELETE, found {t.text!r}")

    # -- SELECT -------------------------------------------------------------
    def parse_select(self) -> SelectQ:
        q = SelectQ()
        self.expect("SELECT")
        q.select.append(self.parse_output_col())
        while self.accept("COMMA"):
            q.select.append(self.parse_output_col())
        # SELECT and FROM are both required (SelectQuery.java:284-293)
        self.expect("FROM")
        q.from_.append(self.parse_table_ref())
        while self.accept("COMMA"):
            q.from_.append(self.parse_table_ref())
        if self.accept("WHERE"):
            q.where.append(self.parse_predicate(having=False))
            while self.accept("AND"):
                q.where.append(self.parse_predicate(having=False))
        if self.accept("GROUP"):
            self.expect("BY")
            q.group_by.append(self.parse_column_ref())
            while self.accept("COMMA"):
                q.group_by.append(self.parse_column_ref())
        if self.accept("HAVING"):
            q.having.append(self.parse_predicate(having=True))
            while self.accept("AND"):
                q.having.append(self.parse_predicate(having=True))
        if self.accept("ORDER"):
            self.expect("BY")
            q.order_by.append(self.parse_order_col(q.select))
            while self.accept("COMMA"):
                q.order_by.append(self.parse_order_col(q.select))
        # Clause validity: HAVING implies GROUP BY (SelectQuery.java:284-293
        # javadoc; see module docstring for the code/javadoc discrepancy).
        if q.having and not q.group_by:
            raise ParseError(self.sql, 0, "HAVING requires GROUP BY")
        return q

    def parse_output_col(self) -> OutputCol:
        t = self.peek()
        if t.kind in AGGS:
            agg = self.next().kind
            self.expect("LPAREN")
            expr = self.parse_expression()
            self.expect("RPAREN")
            self.expect("AS")
            alias = self.expect("IDENT").text
            return OutputCol(expr, agg, alias)
        expr = self.parse_expression()
        if self.accept("AS"):
            alias = self.expect("IDENT").text
        elif isinstance(expr, ColumnRef):
            alias = expr.name  # plain column defaults to its own name
        else:
            raise ParseError(self.sql, t.pos, "computed output column requires AS alias")
        return OutputCol(expr, None, alias)

    def parse_table_ref(self) -> TableRef:
        if self.accept("LPAREN"):
            sub = self.parse_select()
            self.expect("RPAREN")
            alias = self.expect("IDENT").text
            return TableRef(sub, alias)
        name = self.expect("IDENT").text
        # table alias is required: Column nodes are alias-qualified
        # (Column.java:24-46) so an unaliased table is unreachable
        alias_tok = self.accept("IDENT")
        alias = alias_tok.text if alias_tok else name
        return TableRef(name, alias)

    def parse_column_ref(self) -> ColumnRef:
        t1 = self.expect("IDENT")
        self.expect("PERIOD")
        t2 = self.expect("IDENT")
        return ColumnRef(t1.text, t2.text)

    def parse_order_col(self, select: list[OutputCol]) -> OrderCol:
        t1 = self.expect("IDENT")
        # ORDER BY references OUTPUT columns (OrderColumn.java).  The
        # alias.column form must resolve to a select-list entry whose
        # expression is exactly that ColumnRef — silently rebinding to
        # whichever output column shares the bare name could order by a
        # different table's column.
        if self.accept("PERIOD"):
            t2 = self.expect("IDENT")
            ref = ColumnRef(t1.text, t2.text)
            matches = [oc for oc in select if oc.agg is None and oc.expr == ref]
            if not matches:
                raise ParseError(
                    self.sql, t1.pos,
                    f"ORDER BY {t1.text}.{t2.text} does not name an output column",
                )
            alias = matches[0].alias
        else:
            alias = t1.text
        d = self.accept("ASC") or self.accept("DESC")
        return OrderCol(alias, d.kind if d else "ASC")

    # -- expressions & predicates ------------------------------------------
    def parse_expression(self):
        """+ - over terms; terms are * / over factors (Expression.java)."""
        left = self.parse_term()
        while self.peek().kind in ("PLUS", "MINUS"):
            op = self.next().kind
            right = self.parse_term()
            left = Arith("+" if op == "PLUS" else "-", left, right)
        return left

    def parse_term(self):
        left = self.parse_factor()
        while self.peek().kind in ("MUL", "DIV"):
            op = self.next().kind
            right = self.parse_factor()
            left = Arith("*" if op == "MUL" else "/", left, right)
        return left

    def parse_factor(self):
        t = self.peek()
        if t.kind == "LPAREN":
            self.next()
            e = self.parse_expression()
            self.expect("RPAREN")
            return e
        if t.kind == "INT":
            self.next()
            return Literal(int(t.text))
        if t.kind == "REAL":
            self.next()
            return Literal(float(t.text))
        if t.kind == "LITERAL":
            self.next()
            return Literal(t.text)
        if t.kind == "IDENT":
            return self.parse_column_ref()
        raise ParseError(self.sql, t.pos, f"unexpected token {t.text!r} in expression")

    def parse_predicate(self, having: bool) -> Pred:
        if having:
            # HAVING predicates reference SELECT aliases
            # (Predicate.java:266-276 alias-HAVING form)
            alias = self.expect("IDENT").text
            op = self.parse_operator()
            rhs = self.parse_rhs()
            return Pred(alias, op, rhs)
        lhs = self.parse_expression()
        if isinstance(lhs, Literal):
            raise ParseError(self.sql, self.peek().pos, "predicate LHS must reference a column")
        op = self.parse_operator()
        rhs = self.parse_rhs()
        return Pred(lhs, op, rhs)

    def parse_operator(self) -> str:
        t = self.next()
        if t.kind not in OPERATORS:
            raise ParseError(self.sql, t.pos, f"expected comparison operator, found {t.text!r}")
        return t.kind

    def parse_rhs(self):
        return self.parse_expression()

    # -- DML (parses; execution rejects, QueryProcessor.java:162-172) -------
    def parse_dml(self) -> DmlQ:
        t = self.next()
        if t.kind == "INSERT":
            self.expect("INTO")
            table = self.expect("IDENT").text
            self.expect("VALUES")
            self.expect("LPAREN")
            self.parse_expression()
            while self.accept("COMMA"):
                self.parse_expression()
            self.expect("RPAREN")
            self.expect("EOF")
            return DmlQ("INSERT", table)
        if t.kind == "DELETE":
            self.expect("FROM")
            table = self.expect("IDENT").text
            if self.accept("WHERE"):
                self.parse_predicate(having=False)
                while self.accept("AND"):
                    self.parse_predicate(having=False)
            self.expect("EOF")
            return DmlQ("DELETE", table)
        # UPDATE t SET a.col = expr [, ...] [WHERE ...]
        table = self.expect("IDENT").text
        self.expect("SET")
        self.parse_column_ref()
        self.expect("=")
        self.parse_expression()
        while self.accept("COMMA"):
            self.parse_column_ref()
            self.expect("=")
            self.parse_expression()
        if self.accept("WHERE"):
            self.parse_predicate(having=False)
            while self.accept("AND"):
                self.parse_predicate(having=False)
        self.expect("EOF")
        return DmlQ("UPDATE", table)


# ---------------------------------------------------------------------------
# compiler: AST -> DataFrame through the operator layer
# ---------------------------------------------------------------------------

_AGG_FNS = {"COUNT": F.count, "SUM": F.sum, "AVG": F.avg, "MIN": F.min, "MAX": F.max}
_OPS = {
    "=": lambda a, b: a == b,
    "<>": lambda a, b: a != b,
    ">": lambda a, b: a > b,
    "<": lambda a, b: a < b,
    ">=": lambda a, b: a >= b,
    "<=": lambda a, b: a <= b,
}


def _col(expr) -> F.Column:
    if isinstance(expr, ColumnRef):
        return F.col(f"{expr.table_alias}.{expr.name}")
    if isinstance(expr, Literal):
        return F.lit(expr.value)
    if isinstance(expr, Arith):
        a, b = _col(expr.left), _col(expr.right)
        return {"+": a + b, "-": a - b, "*": a * b, "/": a / b}[expr.op]
    raise TypeError(f"unexpected expression node {expr!r}")


def compile_select(q: SelectQ, spark: SparkSession, catalog: Catalog) -> DataFrame:
    """Build the DataFrame plan for a parsed strict-grammar query.

    Implicit joins are expressed as cross products + WHERE filters and
    left to Catalyst (PushPredicateThroughJoin + ReorderJoin recover the
    join tree; CBO orders it) — declarative, like the reference's
    SelectQueryAnalyzer -> optimizer pipeline, but with Spark doing the
    optimization.
    """
    # FROM: aliased scans (or compiled subqueries), cross-joined.
    df: DataFrame | None = None
    for ref in q.from_:
        if isinstance(ref.source, SelectQ):
            part = compile_select(ref.source, spark, catalog).alias(ref.alias)
        else:
            part = catalog.table(spark, ref.source).alias(ref.alias)
        df = part if df is None else df.crossJoin(part)
    assert df is not None  # FROM is required by the grammar

    for p in q.where:
        df = df.filter(_OPS[p.op](_col(p.lhs), _col(p.rhs)))

    has_aggs = any(c.agg for c in q.select)
    if q.group_by or has_aggs:
        # SUM/AVG legality: arithmetic input types only
        # (OperatorFactory.java:357-361)
        for c in q.select:
            if c.agg in ("SUM", "AVG") and isinstance(c.expr, ColumnRef):
                dt = df.select(_col(c.expr)).schema[0].dataType
                if not is_arithmetic(dt):
                    raise ParseError(
                        "", 0, f"{c.agg} is not legal on type {dt.simpleString()}"
                    )
        group_keys = {(g.table_alias, g.name) for g in q.group_by}
        exprs = []
        for c in q.select:
            if c.agg:
                exprs.append(_AGG_FNS[c.agg](_col(c.expr)).alias(c.alias))
            else:
                if not (isinstance(c.expr, ColumnRef)
                        and (c.expr.table_alias, c.expr.name) in group_keys):
                    raise ParseError(
                        "", 0,
                        f"non-aggregated output column {c.alias!r} must appear in GROUP BY",
                    )
        grouped = df.groupBy(*[_col(g).alias(f"__g_{g.table_alias}_{g.name}") for g in q.group_by])
        if not exprs:  # pure GROUP BY projection: keep a dummy count, dropped below
            exprs = [F.count(F.lit(1)).alias("__dummy_count")]
        df = grouped.agg(*exprs)
        # project group keys back under their SELECT aliases
        select_cols = []
        for c in q.select:
            if c.agg:
                select_cols.append(F.col(c.alias))
            else:
                select_cols.append(
                    F.col(f"__g_{c.expr.table_alias}_{c.expr.name}").alias(c.alias)
                )
        df = df.select(*select_cols)
    else:
        df = df.select(*[_col(c.expr).alias(c.alias) for c in q.select])

    for p in q.having:
        df = df.filter(_OPS[p.op](F.col(p.lhs), _col(p.rhs)))

    if q.order_by:
        df = df.orderBy(
            *[F.col(o.alias).asc() if o.direction == "ASC" else F.col(o.alias).desc()
              for o in q.order_by]
        )
    return df


class StrictSqlProcessor:
    """processQuery in strict reference mode: the reference grammar and
    nothing more.  DML parses but is rejected, exactly like
    QueryProcessor.java:162-172."""

    def __init__(self, spark: SparkSession, catalog: Catalog):
        self.spark = spark
        self.catalog = catalog

    def process_query(self, sql: str) -> DataFrame:
        ast = Parser(sql).parse()
        if isinstance(ast, DmlQ):
            raise ValueError(
                f"{ast.kind} is parsed but not executable at the SQL entry "
                "point (reference QueryProcessor.java:162-172); use the DML "
                "operators instead"
            )
        return compile_select(ast, self.spark, self.catalog)
