"""EP1 end-to-end: fetch -> parse -> normalize -> supplement -> write KGX,
with reference-style load metadata (SURVEY §3 EP1)."""

from __future__ import annotations

import pyspark.sql.functions as F

from data_services_spark.plans.source_pipeline import run_source_pipeline
from data_services_spark.sources.fetch import LocalFileFetcher
from data_services_spark.sources.kgx import read_kgx_edges, read_kgx_nodes
from data_services_spark.sources.readers import read_csv

RAW = """!gaf-version: 2.1
g1\tGENE:1\talpha\tinteracts\tGENE:2
g2\tGENE:2\tbeta\tinteracts\tGENE:3
g3\tbadid\tgamma\tinteracts\tGENE:1
"""


def _parse(spark, path):
    df = read_csv(spark, path, sep="\t", header=False, comment="!").toDF(
        "row_id", "gene", "name", "rel", "target")
    nodes = df.select(F.col("gene").alias("id"), "name",
                      F.array(F.lit("biolink:Gene")).alias("category"))
    edges = df.select(F.col("gene").alias("subject"),
                      F.lit("biolink:interacts_with").alias("predicate"),
                      F.col("target").alias("object"),
                      F.lit("infores:test").alias(
                          "primary_knowledge_source"))
    return nodes, edges


def test_ep1_pipeline_end_to_end(spark, tmp_path):
    src = tmp_path / "raw.gaf"
    src.write_text(RAW)

    # NCBI-style resolver: GENE:1/2 canonicalize, GENE:3 and badid fail
    def resolver(ids):
        return {i: (i.replace("GENE:", "NCBIGene:")
                    if i in ("GENE:1", "GENE:2") else None)
                for i in ids}

    meta = run_source_pipeline(
        spark, "testsrc",
        url=f"file://{src}", landing_path=str(tmp_path / "landed.gaf"),
        out_dir=str(tmp_path / "kgx"),
        parse=_parse, fetcher=LocalFileFetcher(), resolver=resolver,
        supplement_nodes=True, version="2026-08")

    assert meta["fetch"]["success"] and meta["fetch"]["bytes"] > 0
    assert meta["stages"]["parse_nodes"] == {"records": 3, "skipped": 1}
    assert meta["stages"]["parse_edges"] == {"records": 3, "skipped": 1}
    # GENE:3 + badid never resolve
    assert meta["normalization_failures"] == 1  # 'badid' as a subject

    nodes = read_kgx_nodes(spark, str(tmp_path / "kgx" / "nodes"))
    edges = read_kgx_edges(spark, str(tmp_path / "kgx" / "edges"))
    ids = {r.id for r in nodes.select("id").collect()}
    # normalized where the service resolved, original id kept otherwise
    assert ids == {"NCBIGene:1", "NCBIGene:2", "badid"}
    subs = {r.subject for r in edges.collect()}
    assert subs == {"NCBIGene:1", "NCBIGene:2", "badid"}
    objs = {r.object for r in edges.collect()}
    assert objs == {"NCBIGene:2", "GENE:3", "NCBIGene:1"}
