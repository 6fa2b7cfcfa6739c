from data_services_spark.functions.numeric import dsum, davg, dmoney
from data_services_spark.functions.vectors import (
    cosine_similarity, dot_product, l2_norm, normalize_vec,
)

__all__ = [
    "dsum", "davg", "dmoney",
    "cosine_similarity", "dot_product", "l2_norm", "normalize_vec",
]
