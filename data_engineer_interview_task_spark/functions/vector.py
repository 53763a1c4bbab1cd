"""Vector math over ``array<float>`` embedding columns — pure column
expressions (JVM-side, whole-stage-codegen'd); no Python UDFs.

Two precision modes:

- ``dot_expr``/``norm_expr``/``cosine_expr`` (double): the fast path for
  ranking/ANN at scale. Double addition is non-associative, so exact value
  reproducibility across engines is not guaranteed (ranks virtually always
  are, for non-identical random vectors).
- ``*_decimal`` variants: promote each term to DECIMAL before summation.
  Decimal addition is exact and associative, so the result is bit-identical
  regardless of partitioning or engine — these back the DuckDB-oracle-checked
  queries.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Scale chosen so 64 products of unit-ish components (|x|<1) can't overflow
# and rounding is well past float32 precision.
_DEC = "decimal(28,14)"


def dot_expr(a: Column, b: Column) -> Column:
    """Dot product of two float arrays, accumulated in double."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm_expr(a: Column) -> Column:
    """L2 norm, accumulated in double."""
    return F.sqrt(
        F.aggregate(
            a,
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )


def cosine_expr(a: Column, b: Column) -> Column:
    """Cosine similarity in double (fast path)."""
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def dot_decimal_expr(a: Column, b: Column) -> Column:
    """Exact-reproducible dot product: each pairwise product is computed in
    double, rounded once into DECIMAL(28,14), then summed exactly.

    The merge lambda casts back to the accumulator type — decimal addition
    widens (28,14)+(28,14) -> (29,14) and Spark's ``aggregate`` requires the
    lambda result to keep the zero's type. The cast is lossless here: |dot|
    of unit-ish 64-dim vectors is far below 10^13."""
    return F.aggregate(
        F.zip_with(
            a,
            b,
            lambda x, y: (x.cast("double") * y.cast("double")).cast(_DEC),
        ),
        F.lit(0).cast(_DEC),
        lambda acc, x: (acc + x).cast(_DEC),
    )


def sq_norm_decimal_expr(a: Column) -> Column:
    """Exact-reproducible squared L2 norm (DECIMAL accumulation)."""
    return F.aggregate(
        a,
        F.lit(0).cast(_DEC),
        lambda acc, x: (acc + (x.cast("double") * x.cast("double")).cast(_DEC)).cast(_DEC),
    )
