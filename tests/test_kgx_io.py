"""KGX JSONL sink/source roundtrip and Neo4j CSV export headers
(SURVEY §2.1 K1/K2)."""

from __future__ import annotations

import glob

from data_services_spark.sources.kgx import (
    read_kgx_edges, read_kgx_nodes, write_kgx, write_neo4j_csv,
)


def _sample(spark):
    nodes = spark.createDataFrame(
        [("CUST:1", "alice", ["biolink:Person"], 1, {"k": "v"}),
         ("CUST:1", "alice-dup", ["biolink:Agent"], 2, None),
         ("CUST:2", "bob", [], 1, None)],
        "id string, name string, category array<string>, source_rank int, "
        "properties map<string,string>")
    edges = spark.createDataFrame(
        [("CUST:1", "biolink:knows", "CUST:2", "infores:x", ["a"], ["PMID:1"], 1)],
        "subject string, predicate string, object string, "
        "primary_knowledge_source string, aggregator_knowledge_sources "
        "array<string>, publications array<string>, source_rank int")
    return nodes, edges


def test_kgx_roundtrip_dedups_on_write(spark, tmp_path):
    nodes, edges = _sample(spark)
    out = str(tmp_path / "kgx")
    write_kgx(nodes, edges, out)
    n2 = read_kgx_nodes(spark, f"{out}/nodes")
    e2 = read_kgx_edges(spark, f"{out}/edges")
    assert n2.count() == 2          # duplicate CUST:1 dropped on write
    assert e2.count() == 1
    ids = {r["id"] for r in n2.collect()}
    assert ids == {"CUST:1", "CUST:2"}
    row = e2.head()
    assert row["publications"] == ["PMID:1"]


def test_neo4j_csv_headers(spark, tmp_path):
    nodes, edges = _sample(spark)
    out = str(tmp_path / "neo")
    write_neo4j_csv(nodes.dropDuplicates(["id"]), edges, out)
    nfile = sorted(glob.glob(f"{out}/nodes_csv/part-*.csv"))[0]
    header = open(nfile).readline().strip()
    assert header.split(",") == [":ID", "name", ":LABEL"]
    efile = sorted(glob.glob(f"{out}/edges_csv/part-*.csv"))[0]
    eheader = open(efile).readline().strip()
    assert eheader.split(",") == [":START_ID", ":END_ID", ":TYPE",
                                  "publications"]
