"""Source reader tests: CSV with comments, JSONL, XML (S4), N-Triples (S5)."""

from __future__ import annotations

import gzip

from data_services_spark.sources.rdf import (
    contract_curies, read_ntriples, subclass_edges,
)
from data_services_spark.sources.readers import read_csv, read_jsonl
from data_services_spark.sources.xml import read_xml


def test_csv_gaf_style_comments(spark, tmp_path):
    p = tmp_path / "goa.tsv"
    p.write_text("!gaf-version: 2.2\n"
                 "db\tid\ttaxon\n"
                 "UniProtKB\tP12345\t9606\n"
                 "!comment row\n"
                 "UniProtKB\tQ67890\t10090\n")
    df = read_csv(spark, str(p), sep="\t", header=True, comment="!")
    rows = {r["id"]: r["taxon"] for r in df.collect()}
    assert rows == {"P12345": 9606, "Q67890": 10090}


def test_csv_gzip_transparent(spark, tmp_path):
    p = tmp_path / "data.tsv.gz"
    with gzip.open(p, "wt") as f:
        f.write("a\tb\n1\tx\n2\ty\n")
    df = read_csv(spark, str(p), sep="\t", header=True,
                  schema="a int, b string")
    assert df.count() == 2


def test_jsonl_schema(spark, tmp_path):
    p = tmp_path / "n.jsonl"
    p.write_text('{"id": "A:1", "name": "x"}\n{"id": "B:2"}\n')
    df = read_jsonl(spark, str(p), schema="id string, name string")
    assert {r["id"] for r in df.collect()} == {"A:1", "B:2"}


HMDB_XML = """<?xml version="1.0"?>
<hmdb xmlns="http://www.hmdb.ca">
  <metabolite>
    <accession>HMDB0000001</accession>
    <name>1-Methylhistidine</name>
    <chemical_formula>C7H11N3O2</chemical_formula>
    <secondary_accessions><accession>HMDB00001</accession></secondary_accessions>
  </metabolite>
  <metabolite>
    <accession>HMDB0000002</accession>
    <name>1,3-Diaminopropane</name>
  </metabolite>
</hmdb>
"""


def test_xml_rowtag_extraction(spark, tmp_path):
    p = tmp_path / "hmdb.xml"
    p.write_text(HMDB_XML)
    df = read_xml(spark, str(p), row_tag="metabolite",
                  fields=["accession", "name", "chemical_formula"])
    rows = {r["accession"]: r for r in df.collect()}
    # first-match wins: the nested secondary accession must not override
    assert rows["HMDB0000001"]["name"] == "1-Methylhistidine"
    assert rows["HMDB0000001"]["chemical_formula"] == "C7H11N3O2"
    assert rows["HMDB0000002"]["chemical_formula"] is None


NT = """# a comment line
<http://purl.obolibrary.org/obo/UBERON_0000001> <http://www.w3.org/2000/01/rdf-schema#subClassOf> <http://purl.obolibrary.org/obo/UBERON_0000002> .
<http://purl.obolibrary.org/obo/UBERON_0000001> <http://www.w3.org/2000/01/rdf-schema#label> "anatomical entity"@en .

<http://example.org/x> <http://example.org/count> "42"^^<http://www.w3.org/2001/XMLSchema#integer> .
"""


def test_ntriples_parse(spark, tmp_path):
    p = tmp_path / "ub.nt"
    p.write_text(NT)
    df = read_ntriples(spark, str(p))
    rows = df.collect()
    assert len(rows) == 3
    by_pred = {r["predicate"]: r for r in rows}
    lab = by_pred["http://www.w3.org/2000/01/rdf-schema#label"]
    assert lab["object_literal"] == "anatomical entity"
    assert lab["literal_lang"] == "en"
    cnt = by_pred["http://example.org/count"]
    assert cnt["object_literal"] == "42"
    assert cnt["literal_datatype"].endswith("#integer")


def test_ntriples_subclass_and_curies(spark, tmp_path):
    p = tmp_path / "ub.nt"
    p.write_text(NT)
    triples = read_ntriples(spark, str(p))
    pm = spark.createDataFrame(
        [("http://purl.obolibrary.org/obo/UBERON_", "UBERON")],
        "iri_prefix string, curie_prefix string")
    edges = subclass_edges(contract_curies(triples, pm))
    r = edges.collect()
    assert [(e["subject"], e["predicate"], e["object"]) for e in r] == [
        ("UBERON:0000001", "biolink:subclass_of", "UBERON:0000002")]


def test_jdbc_roundtrip_embedded_derby(spark, tmp_path):
    """S6 end-to-end against a real database — embedded Derby (shipped in
    the Spark distribution for the Hive metastore): write via the JDBC
    sink, read back with a partitioned range scan, and assert the filter
    is pushed to the database, not applied after the fetch."""
    import pyspark.sql.functions as F

    from data_services_spark.sources.readers import read_jdbc

    url = f"jdbc:derby:{tmp_path}/kgdb;create=true"
    driver = "org.apache.derby.jdbc.EmbeddedDriver"
    df = spark.range(100).select(
        F.col("id").alias("node_key"),
        F.concat(F.lit("CUST:"), F.col("id").cast("string")).alias("curie"))
    (df.write.format("jdbc").option("url", url)
       .option("dbtable", "nodes").option("driver", driver).save())

    back = read_jdbc(spark, url, "nodes", partition_column="node_key",
                     num_partitions=4, driver=driver)
    assert back.count() == 100
    assert back.rdd.getNumPartitions() == 4  # range-split read

    filtered = back.filter(F.col("node_key") < 10)
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "node_key" in plan
    assert sorted(r.curie for r in filtered.collect()) == sorted(
        f"CUST:{i}" for i in range(10))


def test_orc_roundtrip_with_pushdown(spark, tmp_path):
    """S-family: ORC rides the same columnar scan contract as parquet —
    value-faithful roundtrip, filter pushdown, column pruning."""
    import pyspark.sql.functions as F

    from data_services_spark.sources.readers import read_orc, write_orc

    df = spark.range(1000).select(
        F.col("id"),
        (F.col("id") % 7).alias("bucket"),
        F.concat(F.lit("v"), F.col("id").cast("string")).alias("val"))
    write_orc(df, str(tmp_path / "t.orc"))
    back = read_orc(spark, str(tmp_path / "t.orc"))
    assert back.count() == 1000
    assert sorted(r.val for r in back.filter(F.col("id") < 3).collect()) \
        == ["v0", "v1", "v2"]
    plan = (back.filter(F.col("bucket") == 3).select("val")
            ._jdf.queryExecution().executedPlan().toString())
    assert "PushedFilters" in plan and "bucket" in plan
    # column pruning: the scan schema must not carry the unused `id`
    assert "ReadSchema" in plan
    rs = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "val" in rs and "id" not in rs


def test_quality_suite_one_pass_semantics(spark):
    """Constraint suite: exact fractions, NULLs fail their predicate,
    empty table is vacuously green except the row floor."""
    from data_services_spark.plans.quality import (
        in_range, min_rows, not_null, run_suite, unique)

    df = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (2, None), (4, 999.0)],
        "id long, v double")
    rep = {r["check"]: r for r in run_suite(df, [
        not_null("v"), unique("id"), in_range("v", 0, 100, threshold=0.5),
        min_rows(10),
    ]).collect()}
    assert rep["not_null:v"]["metric"] == 0.75
    assert not rep["not_null:v"]["passed"]
    assert rep["unique:id"]["metric"] == 0.75
    assert rep["in_range:v"]["metric"] == 0.5  # NULL counts as out-of-range
    assert rep["in_range:v"]["passed"]
    assert not rep["min_rows:10"]["passed"]

    empty = df.filter("id < 0")
    rep0 = {r["check"]: r for r in run_suite(empty, [
        not_null("v"), unique("id"), min_rows(1),
    ]).collect()}
    assert rep0["not_null:v"]["metric"] == 1.0 and rep0["not_null:v"]["passed"]
    assert rep0["unique:id"]["passed"]
    assert not rep0["min_rows:1"]["passed"]


def test_parquet_schema_evolution_reads_both_generations(spark, tmp_path):
    """Files written before and after a column was added scan as one
    table: merged footers when no schema is given, no merge pass when
    the superset schema is passed explicitly (the 100 TB path)."""
    from data_services_spark.sources.readers import read_parquet_evolved

    p = str(tmp_path / "landing")
    spark.createDataFrame([(1, "a"), (2, "b")], "id long, name string") \
        .write.mode("overwrite").parquet(p)
    spark.createDataFrame([(3, "c", 0.5)],
                          "id long, name string, score double") \
        .write.mode("append").parquet(p)

    merged = read_parquet_evolved(spark, p)
    assert set(merged.columns) == {"id", "name", "score"}
    rows = {r.id: r.score for r in merged.collect()}
    assert rows[1] is None and rows[3] == 0.5

    explicit = read_parquet_evolved(
        spark, p, "id long, name string, score double")
    assert {r.id: r.score for r in explicit.collect()} == rows


def test_fk_check_reports_dangling_keys(spark):
    from data_services_spark.plans.quality import fk_check

    fact = spark.createDataFrame(
        [(1,), (2,), (9,), (None,)], "k long")
    dim = spark.createDataFrame([(1,), (2,), (3,)], "id long")
    r = fk_check(fact, "k", dim, "id").head()
    # 3 non-null fks, 2 resolve; the null fk is excluded from the ratio
    assert r.metric == 2 / 3 and not r.passed
    ok = fk_check(fact.filter("k < 3"), "k", dim, "id").head()
    assert ok.metric == 1.0 and ok.passed
