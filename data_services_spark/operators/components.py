"""Connected components over an edge list — iterative min-label
propagation (the clustering step of near-dup deduplication: LSH/Jaccard
pairs -> duplicate *groups* -> one canonical doc per group).

Algorithm: every node starts labeled with itself; each round takes the
min label across neighbors; converges in O(graph diameter) rounds.
Near-dup graphs are unions of small dense cliques, so the diameter — and
the round count — is tiny regardless of corpus size.

Scale notes (100 TB posture):
- each round is ONE shuffled join + ONE aggregation on the edge list —
  no per-node driver loops; the edge list never leaves executors;
- ``localCheckpoint`` truncates lineage each round (iterative plans
  otherwise grow exponentially and overwhelm the optimizer); on a real
  cluster prefer ``checkpoint()`` with a reliable checkpoint dir so
  recomputation-on-failure doesn't cascade;
- the convergence check piggybacks on the same pass (max label change),
  costing one scalar aggregate per round;
- for pathological diameters (chains), switch to the large-star/
  small-star variant — same primitives, O(log n) rounds.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def connected_components(edges: DataFrame, src: str = "src",
                         dst: str = "dst",
                         max_rounds: int = 25) -> DataFrame:
    """(node, component) for every node in ``edges``; component = min
    node id in its connected component. Raises if not converged within
    ``max_rounds`` (deterministic output matters more than best-effort)."""
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    sym = e.unionByName(e.select(F.col("b").alias("a"),
                                 F.col("a").alias("b")))
    sym = sym.localCheckpoint(eager=True)

    labels = (sym.select(F.col("a").alias("node")).distinct()
              .withColumn("label", F.col("node"))
              .localCheckpoint(eager=True))

    for _ in range(max_rounds):
        neighbor_min = (sym.join(labels, sym.b == labels.node)
                        .groupBy("a")
                        .agg(F.min("label").alias("nlabel")))
        new_labels = (labels.join(neighbor_min,
                                  labels.node == neighbor_min.a, "left")
                      .select("node",
                              F.least(F.col("label"),
                                      F.coalesce("nlabel", "label"))
                              .alias("label"),
                              (F.col("label") != F.least(
                                  F.col("label"),
                                  F.coalesce("nlabel", "label")))
                              .alias("changed")))
        new_labels = new_labels.localCheckpoint(eager=True)
        n_changed = new_labels.filter("changed").count()
        labels = new_labels.drop("changed")
        if n_changed == 0:
            return labels.select("node", F.col("label").alias("component"))
    raise RuntimeError(
        f"connected_components did not converge in {max_rounds} rounds — "
        "graph diameter too large; use the large-star/small-star variant")


def connected_components_star(edges: DataFrame, src: str = "src",
                              dst: str = "dst",
                              max_rounds: int = 40) -> DataFrame:
    """(node, component) via alternating large-star / small-star rounds
    (Kiveris et al., "Connected Components in MapReduce and Beyond") —
    O(log n) rounds regardless of graph diameter, vs O(diameter) for
    :func:`connected_components`. Use this for chain-like graphs; the
    simple propagation wins on the small dense cliques of near-dup data.

    Each round is two groupBy(min)+join passes over the edge list — no
    collect_list, so hub nodes cost a shuffle skew (AQE-splittable), not
    executor memory.
    """
    # orient every edge both ways; drop self-loops
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    e = (e.unionByName(e.select(F.col("v").alias("u"),
                                F.col("u").alias("v")))
         .filter(F.col("u") != F.col("v")).distinct()
         .localCheckpoint(eager=True))

    for _ in range(max_rounds):
        # large-star: m(u) = min(u, min neighbors); for v > u: (v, m)
        mins = e.groupBy("u").agg(F.min("v").alias("mv"))
        m = mins.select("u", F.least("u", "mv").alias("m"))
        ls = (e.join(m, "u").filter(F.col("v") > F.col("u"))
              .select(F.col("v").alias("u"), F.col("m").alias("v")))
        # small-star over edges oriented to the smaller endpoint:
        # for u with neighbors v <= u: m = min(neighbors); emit (v, m), (u, m)
        oriented = e.filter(F.col("v") < F.col("u"))
        smins = oriented.groupBy("u").agg(F.min("v").alias("m"))
        ss = (oriented.join(smins, "u")
              .select(F.col("v").alias("u"), F.col("m").alias("v"))
              .unionByName(smins.select("u", F.col("m").alias("v"))))
        new_e = (ls.unionByName(ss)
                 .filter(F.col("u") != F.col("v")).distinct())
        new_sym = (new_e.unionByName(
            new_e.select(F.col("v").alias("u"), F.col("u").alias("v")))
            .distinct().localCheckpoint(eager=True))
        # converged when the canonical (undirected) edge set is stable
        if (new_sym.exceptAll(e).limit(1).count() == 0
                and e.exceptAll(new_sym).limit(1).count() == 0):
            e = new_sym
            break
        e = new_sym
    else:
        raise RuntimeError(
            f"star components did not converge in {max_rounds} rounds")

    # at fixpoint every node is directly connected to its component min
    labels = (e.groupBy("u").agg(F.min("v").alias("mv"))
              .select(F.col("u").alias("node"),
                      F.least("u", "mv").alias("component")))
    return labels


def dedup_clusters(docs: DataFrame, pairs: DataFrame,
                   id_col: str = "doc_id") -> DataFrame:
    """Assign every document a cluster id: its component's min doc id for
    near-dup members, itself for singletons. ``min(cluster)`` doubles as
    the canonical-document choice (keep-lowest-id policy)."""
    comp = connected_components(pairs, src="id_a", dst="id_b")
    return (docs.select(id_col)
            .join(comp, docs[id_col] == comp.node, "left")
            .select(F.col(id_col),
                    F.coalesce("component", F.col(id_col))
                    .alias("cluster_id")))
