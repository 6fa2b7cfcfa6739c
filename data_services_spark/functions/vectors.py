"""Vector math over ``array<float>`` embedding columns — pure Catalyst
expressions (no Python), so similarity search stays inside whole-stage codegen.

``F.aggregate`` is a deterministic left-to-right fold, so double accumulation
here is order-stable — the oracle must fold in the same element order (DuckDB
``list_`` lambdas do).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def dot_product(a: Column | str, b: Column | str) -> Column:
    a, b = _col(a), _col(b)
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column | str) -> Column:
    a = _col(a)
    return F.sqrt(
        F.aggregate(a, F.lit(0.0),
                    lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    return dot_product(a, b) / (l2_norm(a) * l2_norm(b))


def normalize_vec(a: Column | str) -> Column:
    a = _col(a)
    n = l2_norm(a)
    return F.transform(a, lambda x: x.cast("double") / n)
