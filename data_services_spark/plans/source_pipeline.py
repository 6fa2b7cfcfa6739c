"""Per-source pipeline — the engine's equivalent of the reference's EP1
entry point (`python Common/load_manager.py <source_id>`;
`[R: Common/load_manager.py — SourceDataManager — unverified]`, SURVEY §3).

Reference stages and their shape here:

    fetch      GetData HTTP/FTP pull          -> SourceFetcher (driver-side)
    parse      row loop -> KGXFileWriter      -> parse() callable returning
                                                 (nodes, edges) DataFrames
    normalize  batched HTTP + dict rewrite    -> NodeNormalizerService map +
                                                 broadcast joins (J1/J2)
    supplement snpEff subprocess              -> operators.supplement (D3)
    write      nodes/edges JSONL + metadata   -> write_kgx (K1) +
                                                 LoadMetadata (K3)

The reference materializes JSONL between every stage; here the stages are
one lazy plan — the only actions are the final writes, and stage metrics
ride along via ``df.observe`` so counting adds zero extra passes.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from data_services_spark.operators.normalize import (
    NodeNormalizerService, normalization_failures, normalize_edges,
)
from data_services_spark.operators.supplement import supplement
from data_services_spark.plans.metadata import LoadMetadata
from data_services_spark.sources.fetch import SourceFetcher
from data_services_spark.sources.kgx import write_kgx

CURIE_RE = r"^[A-Za-z_.]+:\S+"

ParseFn = Callable[[SparkSession, str], tuple[DataFrame, DataFrame]]


def run_source_pipeline(
        spark: SparkSession, source_id: str, *,
        url: str, landing_path: str, out_dir: str,
        parse: ParseFn,
        fetcher: SourceFetcher | None = None,
        resolver: Callable[[list[str]], dict[str, str | None]] | None = None,
        supplement_cmd: Sequence[str] | None = None,
        supplement_nodes: bool = False,
        version: str | None = None) -> dict:
    """Run fetch→parse→normalize→(supplement)→write for one source.

    Returns the reference-style load-metadata dict (record/skip counts per
    stage, normalization failure count, wall time).
    """
    meta = LoadMetadata(source_id, version=version)

    if fetcher is not None:
        fetch_res = fetcher.fetch(url, landing_path)
    else:
        fetch_res = None

    nodes, edges = parse(spark, landing_path)
    nodes = meta.track(nodes, "parse_nodes",
                       valid=F.col("id").rlike(CURIE_RE))
    edges = meta.track(edges, "parse_edges",
                       valid=F.col("subject").rlike(CURIE_RE)
                       & F.col("object").rlike(CURIE_RE))

    n_failures = 0
    if resolver is not None:
        service = NodeNormalizerService(resolver)
        all_ids = (nodes.select("id")
                   .unionByName(edges.select(F.col("subject").alias("id")))
                   .unionByName(edges.select(F.col("object").alias("id"))))
        # one service pass over DISTINCT ids, then pure broadcast joins —
        # resolution never sits on the per-row hot path (SURVEY §2.10 D1)
        node_map = service.build_map(all_ids).filter(
            F.col("canon_id").isNotNull())
        failures = normalization_failures(edges, node_map, "subject")
        n_failures = failures.count()
        nmap = F.broadcast(node_map)
        nodes = (nodes.join(nmap, nodes.id == nmap.orig_id, "left")
                 .withColumn("id", F.coalesce("canon_id", "id"))
                 .drop("orig_id", "canon_id"))
        edges = normalize_edges(edges, node_map).drop(
            "subject_normalized", "object_normalized")

    if supplement_nodes:
        nodes = supplement(nodes, id_col="id", cmd=supplement_cmd)

    nodes = meta.track(nodes, "write_nodes")
    edges = meta.track(edges, "write_edges")
    write_kgx(nodes, edges, out_dir)

    out = meta.to_dict()
    out["normalization_failures"] = n_failures
    if fetch_res is not None:
        out["fetch"] = {"url": fetch_res.url,
                        "bytes": fetch_res.bytes_fetched,
                        "success": fetch_res.success}
    return out
