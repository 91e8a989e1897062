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


def quantization_error_int8(v: Column) -> Column:
    """Per-component |x - dequant(quant_int8(x))| for min/max scalar
    int8 quantization (the standard 4x embedding-storage compression):
    q = clamp(floor((x - mn)/scale + 0.5), 0, 255), scale =
    (mx - mn)/255.  floor(+0.5) pins rounding identically across
    engines (round() half-cases differ); degenerate flat vectors get
    scale 1 (error 0).  The per-vector min/max/scale are threaded
    through array_repeat as zip_with ARGUMENTS — a lambda capture
    would re-aggregate them per component (O(d^2)/row)."""
    mn = F.array_min(v)
    sc = F.when(F.array_max(v) == mn, F.lit(1.0)).otherwise(
        (F.array_max(v) - mn) / F.lit(255.0)
    )
    n = F.size(v)
    centered = F.zip_with(v, F.array_repeat(mn, n), lambda x, m: x - m)
    resid = F.zip_with(
        centered,
        F.array_repeat(sc, n),
        lambda y, s: F.abs(
            y - s * F.least(F.greatest(F.floor(y / s + 0.5), F.lit(0.0)), F.lit(255.0))
        ),
    )
    return resid
