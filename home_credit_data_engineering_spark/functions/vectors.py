"""Vector (embedding) expression helpers.

Cosine/dot-product arithmetic over ``array<float>`` columns, computed in
**double** precision with JVM-side higher-order functions (``zip_with`` +
``aggregate``) — no Python in the row path. Float→double widening is exact,
and both Spark and external oracles sum sequentially over the array, so
results are reproducible to the last bit for equal-length vectors.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_double_array(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential-sum dot product in double precision."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; NULL when either vector has zero norm."""
    ad, bd = to_double_array(a), to_double_array(b)
    na, nb = norm(ad), norm(bd)
    return F.when((na > 0) & (nb > 0), dot(ad, bd) / (na * nb))
