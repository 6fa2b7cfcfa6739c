"""Round-14 decomposition of corpus_curate / dedup_components (guide §1.1):
time each pipeline prefix, warm min-of-3 fresh plans, noop sink."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("SPARK_GRAFT_AQE_ADVISORY_BYTES", str(4 * 1024 * 1024))

import pyspark.sql.functions as F
from pyspark.sql import Window


def main():
    from data_services_spark import registry as R
    from data_services_spark.catalog import load_table
    from data_services_spark.functions.cache import persist_slot
    from data_services_spark.operators.components import dedup_clusters
    from data_services_spark.operators.dedup import verify_jaccard
    from data_services_spark.operators.text import tokenize
    from data_services_spark.plans.widen import rebalance_if_small
    from data_services_spark.session import get_spark
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("curate_decomp_r14")
    spark.sparkContext.setLogLevel("ERROR")

    def exact_rel(s, d):
        dd = R._derive_repartition(load_table(s, d, "documents"))
        n_tok = F.size(tokenize("text"))
        qual = (dd.filter(
                    (n_tok >= 5)
                    & (F.length(F.regexp_replace("text", r"[A-Za-z\s]", ""))
                       * 10 <= F.length("text") * 3))
                .select("doc_id", "source", "lang", "text",
                        n_tok.cast("long").alias("n_tokens")))
        keyw = Window.partitionBy(F.sha2(F.lower(F.trim("text")), 256))
        return persist_slot(
            R._CURATE_EXACT_CACHE,
            rebalance_if_small(
                qual.withColumn("keeper", F.min("doc_id").over(keyw))
                .filter(F.col("doc_id") == F.col("keeper")).drop("keeper"),
                source=dd))

    def cand_stage(s, d):
        ex = exact_rel(s, d)
        return R.minhash_lsh_pairs(ex, num_hashes=R._MH_N,
                                   bands=R._MH_BANDS, hash_family="md5")

    def pairs_stage(s, d):
        ex = exact_rel(s, d)
        cand = R.minhash_lsh_pairs(ex, num_hashes=R._MH_N,
                                   bands=R._MH_BANDS, hash_family="md5")
        return verify_jaccard(ex, cand, threshold=0.8).select("id_a", "id_b")

    def cc_stage(s, d):
        ex = exact_rel(s, d)
        cand = R.minhash_lsh_pairs(ex, num_hashes=R._MH_N,
                                   bands=R._MH_BANDS, hash_family="md5")
        pairs = persist_slot(
            R._NEARDUP_PAIRS_CACHE,
            verify_jaccard(ex, cand, threshold=0.8).select("id_a", "id_b"))
        return (dedup_clusters(ex, pairs)
                .filter(F.col("doc_id") == F.col("cluster_id"))
                .select("doc_id"))

    stages = {
        "exact": exact_rel,
        "lsh_cand": cand_stage,
        "pairs_verified": pairs_stage,
        "cc_keep": cc_stage,
        "full": lambda s, d: R.RAW_QUERIES["corpus_curate"](s, d),
        "dedup_components": lambda s, d:
            R.RAW_QUERIES["dedup_components"](s, d),
    }
    for name, fn in stages.items():
        spark.sparkContext.setJobDescription(f"curate {name}")
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        print(f"{name:18s} {best:8.4f}", flush=True)
    spark.stop()


main()
