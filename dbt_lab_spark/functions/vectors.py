"""Vector math over array<float>/array<double> columns — JVM-side only.

Built from F.zip_with / F.aggregate so the whole expression stays inside
whole-stage codegen; no Python crossing.  Accumulation is sequential
left-to-right in double, which makes results deterministic and
comparable with an oracle that does the same.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_double_array(col: str | Column) -> Column:
    """Cast array<float> -> array<double> so all arithmetic is double."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Dot product: sequential double accumulation over zip_with."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def l2_norm(a: Column) -> Column:
    """Euclidean norm."""
    return F.sqrt(dot(a, a))


def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine similarity dot/(|a|*|b|) — the exact expression shape the
    DuckDB oracle mirrors (list_dot_product / sqrt*sqrt)."""
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
