"""Round-14 in-session A/B: crawl_ingest old (RR widen + post-agg
rebalance, 3 exchanges) vs new (keyed widen + pre-agg keyed rebalance
reused by the groupBy, 2 exchanges)."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("SPARK_GRAFT_AQE_ADVISORY_BYTES", str(4 * 1024 * 1024))

import pyspark.sql.functions as F


def build(spark, sf_dir, new: bool):
    from data_services_spark.catalog import load_table
    from data_services_spark.operators.text import hashed_linear_score
    from data_services_spark.operators.web import (
        canonicalize_url, html_to_text, synth_html, synth_url, url_domain)
    from data_services_spark.plans.widen import (
        keyed_rebalance_if_small, rebalance_if_small, widen_by_key,
        widen_if_narrow)
    base = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    d = widen_by_key(base, "doc_id") if new else widen_if_narrow(base)
    half = F.floor(F.col("doc_id") / F.lit(2)).cast("long")
    u = d.select("doc_id", "text",
                 synth_url(half, F.lit("web"), F.lit("xx")).alias("url"))
    canon = (u.withColumn("curl", canonicalize_url("url"))
             .withColumn("domain", url_domain(F.col("curl"))))
    if new:
        canon = keyed_rebalance_if_small(canon, "curl")
    surv = canon.groupBy("curl").agg(
        F.min("doc_id").alias("doc_id"),
        F.min_by("text", "doc_id").alias("text"),
        F.min_by("domain", "doc_id").alias("domain"))
    if not new:
        surv = rebalance_if_small(surv, d)
    page = surv.select("doc_id", "domain",
                       synth_html("text", "doc_id").alias("page"))
    x = page.select("doc_id", "domain",
                    html_to_text("page").alias("page_text"))
    return hashed_linear_score(x, text_col="page_text",
                               extra_cols=("domain",))


def main():
    from data_services_spark.session import get_spark
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("crawl_ab_r14")
    spark.sparkContext.setLogLevel("ERROR")

    ref = sorted(map(tuple, build(spark, sf_dir, False).collect()))
    got = sorted(map(tuple, build(spark, sf_dir, True).collect()))
    print("parity:", len(got), got == ref, flush=True)
    assert got == ref

    for _ in range(2):
        for new in (False, True):
            label = "new" if new else "old"
            spark.sparkContext.setJobDescription(f"crawl {label}")
            build(spark, sf_dir, new).write.format("noop") \
                .mode("overwrite").save()
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                build(spark, sf_dir, new).write.format("noop") \
                    .mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            print(f"{label} {best:8.4f}", flush=True)
    for new in (False, True):
        df = build(spark, sf_dir, new)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        print("new" if new else "old", "exchanges:", txt.count("Exchange ("))
    spark.stop()


main()
