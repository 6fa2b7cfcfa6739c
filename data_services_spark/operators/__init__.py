from data_services_spark.operators.merge import merge_nodes, merge_edges, first_by_rank
from data_services_spark.operators.normalize import (
    normalize_edges, normalization_failures, apply_node_map,
)
from data_services_spark.operators.subset import connected_edge_subset, meta_kg
from data_services_spark.operators.windows import (
    top_k_per_group, sessionize, tumbling, sliding,
)
from data_services_spark.operators.asof import asof_join, range_join
from data_services_spark.operators.dedup import (
    exact_text_dedup, fingerprint, minhash_signature, minhash_lsh_pairs,
    simhash64, simhash64_df, minhash_signatures, jaccard_pairs,
    winnow_fingerprint_rows, winnow_fingerprints, winnow_shared_pairs,
)
from data_services_spark.operators.similarity import (
    ivf_topk, knn_topk, knn_topk_arrow, nearest_within_group,
)
from data_services_spark.operators.text import (
    tokenize, term_frequencies, tfidf, quality_score, lang_id,
)
from data_services_spark.operators.multimodal import (
    attach_binary_payload, extract_payload_meta, decode_media,
)
from data_services_spark.operators.supplement import supplement
from data_services_spark.operators.components import (
    connected_components, connected_components_star, dedup_clusters,
)
from data_services_spark.operators.sampling import (
    deterministic_split, ngram_contamination, pack_by_token_budget,
    vocab_top_k,
)

__all__ = [
    "merge_nodes", "merge_edges", "first_by_rank",
    "normalize_edges", "normalization_failures", "apply_node_map",
    "connected_edge_subset", "meta_kg",
    "top_k_per_group", "sessionize", "tumbling", "sliding",
    "asof_join", "range_join",
    "exact_text_dedup", "fingerprint", "minhash_signature",
    "minhash_lsh_pairs", "simhash64", "simhash64_df", "minhash_signatures",
    "jaccard_pairs", "winnow_fingerprint_rows", "winnow_fingerprints",
    "winnow_shared_pairs",
    "ivf_topk", "knn_topk", "knn_topk_arrow", "nearest_within_group",
    "tokenize", "term_frequencies", "tfidf", "quality_score", "lang_id",
    "attach_binary_payload", "extract_payload_meta", "decode_media",
    "supplement",
    "connected_components", "connected_components_star",
    "dedup_clusters",
    "deterministic_split", "ngram_contamination", "pack_by_token_budget",
    "vocab_top_k",
]
