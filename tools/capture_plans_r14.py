"""Capture .explain('formatted') output for round-13 touched queries.

Usage: python tools/capture_plans_r14.py <suffix> [names...]
Writes plans/r14/<name>_<suffix>.txt  (suffix: before|after)
"""
import os, sys
sys.path.insert(0, "/root/repo")

DEFAULT = [
    "kgx_edge_merge", "bpe_tokenize", "bpe_tokenize_dict",
    "window_running_sum", "kgx_connected_subset", "kgx_meta_kg",
    "doc_chunks_bpe", "token_packing_bpe", "vocab_topk_bpe",
    "bpe_fertility", "token_packing_dict", "q1_pricing_summary",
    "q3_shipping_priority", "kgx_node_merge", "tumbling_window",
    "knn_cosine", "crawl_ingest", "text_dedup_exact",
]

def main():
    suffix = sys.argv[1]
    names = sys.argv[2:] or DEFAULT
    os.environ.setdefault("SPARK_GRAFT_AQE_ADVISORY_BYTES", str(4*1024*1024))
    from data_services_spark.registry import RAW_QUERIES
    from data_services_spark.session import get_spark
    spark = get_spark("plans_r14"); spark.sparkContext.setLogLevel("ERROR")
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    for n in names:
        df = RAW_QUERIES[n](spark, sf)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        with open(f"/root/repo/plans/r14/{n}_{suffix}.txt", "w") as f:
            f.write(f"# {n} ({suffix}) at {sf}\n" + txt)
        print("wrote", n, flush=True)
    spark.stop()

main()
