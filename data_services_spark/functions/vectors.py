"""Vector math over ``array<float>`` embedding columns — pure Catalyst
expressions (no Python).

Two physical forms, same float semantics:

- **known dimension** (``dim=`` given): the dot product / norm unrolls into
  a flat left-associated sum ``a[0]*b[0] + a[1]*b[1] + ...`` of scalar
  expressions, which DOES participate in whole-stage codegen. This is the
  hot-path form: higher-order functions (``F.aggregate`` / ``F.zip_with``)
  are CodegenFallback in Spark — evaluated interpreted per row with an
  intermediate array allocation — measured ~13µs/row vs sub-µs unrolled on
  the 200k x 64-dim sf1 bench (knn_cosine 2.74s -> see BASELINE.md).
- **unknown dimension**: the ``F.aggregate`` fold, kept as the general
  fallback (and the only option for very high dims where an unrolled
  expression would overflow the JVM's 64KB method limit, ~dim > 2000 —
  there the Arrow/numpy kernel in operators/similarity.py is the real
  scale path anyway).

Both fold left-to-right over elements in index order, and IEEE
``0.0 + x == x`` exactly, so the two forms (and DuckDB's ``list_``
lambdas in the oracles) produce bit-identical doubles.

``dim`` must equal the true array length: the unrolled form indexes
``a[i]`` positionally and yields NULL if any index is out of range
(mirrors the fold's NULL-on-null-element behavior, but silently truncates
nothing — a shorter vector nulls the whole score).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def _check_dim(dim: int | None) -> None:
    # dim=0 would silently take the fold path on truthiness and a negative
    # dim would build an empty unroll and IndexError — both are caller
    # bugs; fail loudly instead.
    if dim is not None and dim <= 0:
        raise ValueError(f"dim must be a positive int or None, got {dim}")


def _unrolled_sum(terms: list[Column]) -> Column:
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def dot_product(a: Column | str, b: Column | str,
                dim: int | None = None) -> Column:
    _check_dim(dim)
    a, b = _col(a), _col(b)
    if dim:
        return _unrolled_sum([
            a.getItem(i).cast("double") * b.getItem(i).cast("double")
            for i in range(dim)])
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column | str, dim: int | None = None) -> Column:
    _check_dim(dim)
    a = _col(a)
    if dim:
        sq = [a.getItem(i).cast("double") * a.getItem(i).cast("double")
              for i in range(dim)]
        return F.sqrt(_unrolled_sum(sq))
    return F.sqrt(
        F.aggregate(a, F.lit(0.0),
                    lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )


def cosine_similarity(a: Column | str, b: Column | str,
                      dim: int | None = None) -> Column:
    return dot_product(a, b, dim) / (l2_norm(a, dim) * l2_norm(b, dim))


def normalize_vec(a: Column | str) -> Column:
    a = _col(a)
    n = l2_norm(a)
    return F.transform(a, lambda x: x.cast("double") / n)
