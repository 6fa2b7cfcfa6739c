"""Similarity search over embedding columns (SURVEY §2.11 L3/L4).

Two physical strategies with identical results:

- :func:`knn_topk` — pure Catalyst expressions (``zip_with`` dot product in
  whole-stage codegen) + ``TakeOrderedAndProject``. Per-partition top-k then
  a driver merge of k*num_partitions rows — the classic distributed top-k.
- :func:`knn_topk_arrow` — the 100 TB path: ``mapInPandas`` with a numpy
  matmul per Arrow batch and a partition-local top-k, so only
  k*num_partitions candidate rows ever shuffle. Same ordering contract.

Both accumulate in float64 left-to-right, so scores agree bit-for-bit.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from data_services_spark.functions.vectors import cosine_similarity


def _query_vector(embeddings: DataFrame, query_id: int,
                  id_col: str, vec_col: str) -> list[float]:
    row = embeddings.filter(F.col(id_col) == query_id).select(vec_col).head()
    if row is None:
        raise KeyError(f"query id {query_id} not found")
    return list(row[0])


def knn_topk(embeddings: DataFrame, query_id: int, k: int = 10,
             id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Brute-force cosine top-k against the vector of `query_id`.

    Excludes the query vector itself. Deterministic total order:
    (similarity desc, id asc). Returns (rank, vec_id, cosine_sim).
    """
    q = _query_vector(embeddings, query_id, id_col, vec_col)
    qcol = F.array(*[F.lit(float(x)) for x in q])
    scored = (embeddings.filter(F.col(id_col) != query_id)
              .select(F.col(id_col),
                      cosine_similarity(F.col(vec_col), qcol).alias("cosine_sim")))
    top = scored.orderBy(F.desc("cosine_sim"), F.col(id_col)).limit(k)
    w = Window.orderBy(F.desc("cosine_sim"), F.col(id_col))
    return top.select(F.row_number().over(w).cast("long").alias("rank"),
                      F.col(id_col), F.col("cosine_sim"))


def knn_topk_arrow(embeddings: DataFrame, query_id: int, k: int = 10,
                   id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Same contract as :func:`knn_topk`, Arrow/numpy physical plan."""
    import numpy as np
    import pandas as pd

    q = np.asarray(_query_vector(embeddings, query_id, id_col, vec_col),
                   dtype=np.float64)
    qn = np.sqrt((q * q).sum())

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        best: pd.DataFrame | None = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            m = np.stack(pdf[vec_col].map(
                lambda v: np.asarray(v, dtype=np.float64)).values)
            sims = (m @ q) / (np.sqrt((m * m).sum(axis=1)) * qn)
            cand = pd.DataFrame({id_col: pdf[id_col].values, "cosine_sim": sims})
            best = cand if best is None else pd.concat([best, cand])
            best = best.sort_values(
                ["cosine_sim", id_col], ascending=[False, True]).head(k)
        if best is not None:
            yield best

    scored = (embeddings.filter(F.col(id_col) != query_id)
              .select(id_col, vec_col)
              .mapInPandas(score, f"{id_col} long, cosine_sim double"))
    top = scored.orderBy(F.desc("cosine_sim"), F.col(id_col)).limit(k)
    w = Window.orderBy(F.desc("cosine_sim"), F.col(id_col))
    return top.select(F.row_number().over(w).cast("long").alias("rank"),
                      F.col(id_col), F.col("cosine_sim"))


def nearest_within_group(embeddings: DataFrame, group_col: str = "label",
                         id_col: str = "vec_id",
                         vec_col: str = "embedding") -> DataFrame:
    """L4: for every vector, its nearest neighbour within the same group
    (label-blocked all-pairs — the blocked form of the similarity self-join;
    at scale the blocks come from LSH buckets instead of labels).

    Returns (vec_id, nn_id, cosine_sim).
    """
    a = embeddings.select(F.col(group_col).alias("g"),
                          F.col(id_col).alias("vec_id"),
                          F.col(vec_col).alias("va"))
    b = embeddings.select(F.col(group_col).alias("g"),
                          F.col(id_col).alias("nn_id"),
                          F.col(vec_col).alias("vb"))
    pairs = (a.join(b, "g")
             .filter(F.col("vec_id") != F.col("nn_id"))
             .select("vec_id", "nn_id",
                     cosine_similarity("va", "vb").alias("cosine_sim")))
    w = Window.partitionBy("vec_id").orderBy(F.desc("cosine_sim"), F.col("nn_id"))
    return (pairs.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("vec_id", "nn_id", "cosine_sim"))
