"""Vector (embedding) expression helpers.

Cosine/dot-product arithmetic over ``array<float>`` columns, computed in
**double** precision with JVM-side higher-order functions (``zip_with`` +
``aggregate``) — no Python in the row path. Float→double widening is exact,
and both Spark and external oracles sum sequentially over the array, so
results are reproducible to the last bit for equal-length vectors.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
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
    """Cosine similarity; NULL when either vector has zero norm.

    Sequential-sum double arithmetic (interpreted higher-order
    functions) — bit-reproducible by external oracles, so this is the
    form for oracle-anchored queries. For high-volume candidate
    re-ranking (ANN paths, no oracle) use :func:`cosine_arrow`: numpy's
    pairwise summation differs in fp rounding order but is ~10-50×
    faster per pair.
    """
    ad, bd = to_double_array(a), to_double_array(b)
    na, nb = norm(ad), norm(bd)
    return F.when((na > 0) & (nb > 0), dot(ad, bd) / (na * nb))


def cosine_arrow(a: Column | str, b: Column | str) -> Column:
    """Vectorized cosine via an Arrow-batched pandas UDF.

    Each batch stacks both vector columns into (rows × dim) float64
    matrices and computes all similarities with numpy — no interpreted
    per-element lambdas, which dominate wall-clock when millions of
    candidate pairs are re-ranked (measured ~3× end-to-end on the IVF
    path at 10× sf0.1). NULL (NaN) when either norm is zero, matching
    :func:`cosine`; fp summation order differs from the sequential form
    (numpy pairwise), so oracle-anchored paths keep :func:`cosine`.
    """
    # Module-global imports so the stringified type hints (PEP 563 is
    # active in this module) resolve during pandas_udf inference.
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _cos(va: pd.Series, vb: pd.Series) -> pd.Series:
        if len(va) == 0:
            return pd.Series([], dtype="float64")
        A = np.array(va.tolist(), dtype=np.float64)
        B = np.array(vb.tolist(), dtype=np.float64)
        num = (A * B).sum(axis=1)
        na = np.linalg.norm(A, axis=1)
        nb = np.linalg.norm(B, axis=1)
        with np.errstate(divide="ignore", invalid="ignore"):
            out = np.where((na > 0) & (nb > 0), num / (na * nb), np.nan)
        return pd.Series(out)

    ac = F.col(a) if isinstance(a, str) else a
    bc = F.col(b) if isinstance(b, str) else b
    return _cos(to_double_array(ac), to_double_array(bc))
