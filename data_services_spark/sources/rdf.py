"""S5: RDF N-Triples source (UberGraph ontology axioms in the reference —
`[R: parsers/UberGraph/src/loadUG.py — unverified]`).

N-Triples is line-oriented (`<s> <p> <o> .` / literal objects), so the scan
is ``spark.read.text`` + built-in regex extraction — fully distributed,
no Python in the hot path. Turtle prefix-form files should be converted to
N-Triples upstream (the reference consumes pre-materialized ntriples dumps).

CURIE contraction (IRI -> `PREFIX:local`) is a broadcast join against a
prefix-map DataFrame, mirroring the reference's prefix tables
(`[R: Common/prefixes.py — unverified]`).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

# <subj> <pred> (<iri>|"literal"(^^<dt>|@lang)?) .
_NT = (r'^\s*<([^>]+)>\s+<([^>]+)>\s+'
       r'(?:<([^>]+)>|"((?:[^"\\]|\\.)*)"(?:\^\^<([^>]+)>|@(\S+))?)\s*\.\s*$')


def read_ntriples(spark: SparkSession, path: str) -> DataFrame:
    """N-Triples scan -> (subject, predicate, object_iri, object_literal,
    literal_datatype, literal_lang). Comment/blank lines dropped; exactly one
    of object_iri / object_literal is non-null per row."""
    lines = spark.read.text(path)
    parsed = lines.filter(~F.col("value").rlike(r"^\s*(#|$)")).select(
        F.regexp_extract("value", _NT, 1).alias("subject"),
        F.regexp_extract("value", _NT, 2).alias("predicate"),
        F.nullif(F.regexp_extract("value", _NT, 3), F.lit("")).alias("object_iri"),
        F.nullif(F.regexp_extract("value", _NT, 4), F.lit(""))
         .alias("object_literal"),
        F.nullif(F.regexp_extract("value", _NT, 5), F.lit(""))
         .alias("literal_datatype"),
        F.nullif(F.regexp_extract("value", _NT, 6), F.lit(""))
         .alias("literal_lang"),
    )
    return parsed.filter(F.col("subject") != "")


def contract_curies(triples: DataFrame, prefix_map: DataFrame,
                    cols: tuple[str, ...] = ("subject", "predicate",
                                             "object_iri")) -> DataFrame:
    """Rewrite IRI columns to CURIEs via a broadcast prefix map
    (`iri_prefix`, `curie_prefix`). Longest-prefix-wins; unmatched IRIs pass
    through unchanged."""
    pm = F.broadcast(
        prefix_map.orderBy(F.length("iri_prefix").desc())
        .agg(F.collect_list(F.struct("iri_prefix", "curie_prefix"))
             .alias("pm"))
    )
    out = triples.crossJoin(pm)
    for c in cols:
        hit = F.filter(
            F.col("pm"), lambda p: F.col(c).startswith(p["iri_prefix"]))
        first = F.element_at(hit, 1)
        out = out.withColumn(
            c,
            F.when(F.col(c).isNull() | (F.size(hit) == 0), F.col(c))
            .otherwise(F.concat(
                first["curie_prefix"], F.lit(":"),
                F.col(c).substr(F.length(first["iri_prefix"]) + 1,
                                F.length(F.col(c))))))
    return out.drop("pm")


def subclass_edges(triples: DataFrame) -> DataFrame:
    """UberGraph-style: rdfs:subClassOf axioms -> KGX edge frame."""
    RDFS_SUB = "http://www.w3.org/2000/01/rdf-schema#subClassOf"
    return (triples
            .filter((F.col("predicate") == RDFS_SUB)
                    & F.col("object_iri").isNotNull())
            .select(F.col("subject"),
                    F.lit("biolink:subclass_of").alias("predicate"),
                    F.col("object_iri").alias("object")))
