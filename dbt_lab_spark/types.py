"""Type surface of the reference engine mapped onto Spark SQL types.

The reference declares eleven fixed types (core/BasicType.java:11-64,
see SURVEY.md §1.2).  We expose the same names so catalog definitions can
be written in reference vocabulary, resolved to Spark types.  Schema is
always fixed/declared — never inferred — matching the reference's
catalogue-driven model (catalogue/TableSchema.java:20).
"""

from __future__ import annotations

from pyspark.sql import types as T

# MiniDBS BasicType -> Spark type (SURVEY.md §1.2 table).
# CHAR(n)/VAR_CHAR(n) both map to StringType; CHAR pad semantics are a
# storage detail we drop (strings are stored trimmed; comparisons are on
# trimmed values, which the oracle harness mirrors).
# TIME has no Spark type: stored as seconds-of-day INT by convention.
# RID has no user-facing equivalent in a DataFrame engine.
BASIC_TYPES: dict[str, T.DataType] = {
    "SMALL_INT": T.ShortType(),
    "INT": T.IntegerType(),
    "BIG_INT": T.LongType(),
    "FLOAT": T.FloatType(),
    "DOUBLE": T.DoubleType(),
    "CHAR": T.StringType(),
    "VAR_CHAR": T.StringType(),
    "DATE": T.DateType(),
    "TIME": T.IntegerType(),  # seconds of day
    "TIMESTAMP": T.TimestampType(),
}

# Types on which SUM/AVG are legal in the reference
# (qexec/OperatorFactory.java:357-361 restricts SUM/AVG to arithmetic
# types; COUNT/MIN/MAX work on all types).
ARITHMETIC_TYPES: tuple[type, ...] = (
    T.ShortType,
    T.IntegerType,
    T.LongType,
    T.FloatType,
    T.DoubleType,
    T.DecimalType,
)


def is_arithmetic(dt: T.DataType) -> bool:
    """True if SUM/AVG are legal on this type (reference semantics)."""
    return isinstance(dt, ARITHMETIC_TYPES)


def char_equals(col, literal: str, n: int):
    """CHAR(n) padded-compare semantics (reference core/CharField.java):
    both sides are padded (or truncated) to width n before comparing, so
    literals that differ only in trailing spaces compare equal — the
    behavior the reference's own tests rely on with padded literals
    (TestJoinOrderOptimizerStudents.java:139).

    rpad both pads short strings and truncates long ones, in Spark and
    in ANSI SQL alike, so the same expression serves engine and oracle.
    """
    from pyspark.sql import functions as F

    return F.rpad(col, n, " ") == F.rpad(F.lit(literal), n, " ")


def seconds_of_day(ts_col):
    """TIME values as seconds-of-day INT (reference core/TimeField.java;
    Spark has no TIME type, so the catalog convention is an INT column
    in [0, 86400) — this derives it from any timestamp column)."""
    from pyspark.sql import functions as F

    return (
        F.hour(ts_col) * 3600 + F.minute(ts_col) * 60 + F.second(ts_col)
    ).cast("int")


def resolve(name: str) -> T.DataType:
    """Resolve a reference type name (e.g. 'BIG_INT') to a Spark type."""
    key = name.strip().upper()
    # tolerate parameterized forms like CHAR(25)
    if "(" in key:
        key = key[: key.index("(")]
    if key not in BASIC_TYPES:
        raise KeyError(f"unknown reference type: {name!r}")
    return BASIC_TYPES[key]
