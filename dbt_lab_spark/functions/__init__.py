"""Scalar-function surface of the engine.

The reference's only scalar expressions are + - * / arithmetic
(parser/Expression.java:13-34, SURVEY.md §2.8); everything else here is
the declared upgrade surface: Spark's built-in string/date/math
functions plus the text-analysis and vector-math helpers the
training-data pipeline operators build on.  Everything stays JVM-side
(pyspark.sql.functions compositions) — no Python UDFs in this package.
"""

from dbt_lab_spark.functions.text import (
    token_count,
    char_classes,
    quality_score,
    lang_id,
    fingerprint,
    fingerprint64,
    bpe_ish_token_count,
    shingles,
)
from dbt_lab_spark.functions.vectors import dot, l2_norm, cosine_similarity, to_double_array
from dbt_lab_spark.functions.stats import (
    auc,
    calibration_bins,
    cohens_kappa,
    chi_square_independence,
    welch_t,
    kaplan_meier,
    seasonal_decompose,
)

__all__ = [
    "token_count",
    "char_classes",
    "quality_score",
    "lang_id",
    "fingerprint",
    "fingerprint64",
    "bpe_ish_token_count",
    "auc",
    "calibration_bins",
    "cohens_kappa",
    "chi_square_independence",
    "welch_t",
    "kaplan_meier",
    "seasonal_decompose",
    "shingles",
    "dot",
    "l2_norm",
    "cosine_similarity",
    "to_double_array",
]
