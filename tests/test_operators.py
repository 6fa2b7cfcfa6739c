"""Unit tests for asof/range joins, normalization service, subset, dedup,
similarity, text, multimodal operators on tiny in-memory frames."""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F
import pytest

from data_services_spark.operators import (
    asof_join, connected_edge_subset, exact_text_dedup, knn_topk,
    minhash_lsh_pairs, normalization_failures, sessionize, simhash64,
)
from data_services_spark.operators.normalize import (
    NodeNormalizerService, apply_node_map,
)


def _ts(minute: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, minute)


def test_asof_basic_and_no_match(spark):
    left = spark.createDataFrame(
        [(1, _ts(10), "p1"), (1, _ts(2), "p2"), (2, _ts(5), "p3")],
        "user_id long, ts timestamp, pid string")
    right = spark.createDataFrame(
        [(1, _ts(3), "s1"), (1, _ts(10), "s2"), (3, _ts(0), "s3")],
        "user_id long, ts timestamp, sid string")
    out = {r["pid"]: r for r in asof_join(
        left, right, on=["user_id"], left_ts="ts", right_ts="ts",
        right_payload=["sid"]).collect()}
    assert out["p1"]["sid_right"] == "s2"   # inclusive: equal ts matches
    assert out["p2"]["sid_right"] is None   # no prior signup
    assert out["p3"]["sid_right"] is None   # user has no signups


def test_apply_node_map_rewrites_and_flags(spark):
    edges = spark.createDataFrame(
        [("a", "p", "x"), ("b", "p", "y")], "subject string, predicate string, object string")
    nmap = spark.createDataFrame([("a", "A!")], "orig_id string, canon_id string")
    out = {r["object"]: r for r in apply_node_map(edges, nmap, "subject").collect()}
    assert out["x"]["subject"] == "A!" and out["x"]["subject_normalized"]
    assert out["y"]["subject"] == "b" and not out["y"]["subject_normalized"]
    fails = normalization_failures(edges, nmap, "subject").collect()
    assert [r["failed_id"] for r in fails] == ["b"]


def test_normalizer_service_builds_map(spark):
    def resolver(ids):
        return {i: (i.upper() if i != "skip" else None) for i in ids}

    svc = NodeNormalizerService(resolver, batch_size=2)
    ids = spark.createDataFrame([("a",), ("b",), ("skip",)], "id string")
    out = {r["orig_id"]: r["canon_id"] for r in svc.build_map(ids).collect()}
    assert out == {"a": "A", "b": "B", "skip": None}


def test_connected_edge_subset(spark):
    edges = spark.createDataFrame(
        [("n1", "p", "n2"), ("n1", "p", "missing"), ("missing", "p", "n2")],
        "subject string, predicate string, object string")
    nodes = spark.createDataFrame([("n1",), ("n2",)], "id string")
    kept = connected_edge_subset(edges, nodes).collect()
    assert len(kept) == 1
    assert kept[0]["subject"] == "n1" and kept[0]["object"] == "n2"


def test_sessionize_gap(spark):
    e = spark.createDataFrame(
        [(1, 1, _ts(0)), (2, 1, _ts(10)), (3, 1, _ts(50)), (4, 2, _ts(0))],
        "event_id long, user_id long, ts timestamp")
    out = {r["event_id"]: r["session_id"] for r in
           sessionize(e, gap_minutes=30).collect()}
    assert out[1] == 0 and out[2] == 0   # 10-min gap, same session
    assert out[3] == 1                   # 40-min gap, new session
    assert out[4] == 0


def test_exact_dedup_counts(spark):
    d = spark.createDataFrame(
        [(1, "Hello World"), (2, "  hello world "), (3, "other")],
        "doc_id long, text string")
    out = {r["keep_id"]: r["n_dups"] for r in exact_text_dedup(d).collect()}
    assert out == {1: 2, 3: 1}


def test_minhash_detects_near_dups(spark):
    base = "the quick brown fox jumps over the lazy dog " * 4
    near = base.replace("lazy", "sleepy")
    other = "completely different words entirely unrelated content here " * 4
    d = spark.createDataFrame(
        [(1, base), (2, near), (3, other)], "doc_id long, text string")
    pairs = {(r["id_a"], r["id_b"]): r["est_jaccard"]
             for r in minhash_lsh_pairs(d, num_hashes=32, bands=16).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] > 0.3
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_simhash_similar_docs_close(spark):
    base = "the quick brown fox jumps over the lazy dog " * 4
    d = spark.createDataFrame(
        [(1, base), (2, base.replace("lazy", "sleepy")), (3, "zzz yyy xxx")],
        "doc_id long, text string")
    out = {r["doc_id"]: int(r["sh"], 16) for r in
           d.select("doc_id", simhash64("text").alias("sh")).collect()}
    def hamming(a, b):
        return bin(a ^ b).count("1")
    assert hamming(out[1], out[2]) < hamming(out[1], out[3])


def test_knn_excludes_query_and_orders(spark):
    d = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.9, 0.1]), (2, [0.0, 1.0]), (3, [1.0, 0.01])],
        "vec_id long, embedding array<float>")
    out = knn_topk(d, query_id=0, k=2).collect()
    assert [r["vec_id"] for r in out] == [3, 1]
    assert [r["rank"] for r in out] == [1, 2]


def test_multimodal_decode_shape(spark):
    from data_services_spark.operators.multimodal import (
        attach_binary_payload, decode_media,
    )
    d = spark.createDataFrame([(1, "abc"), (2, "")], "doc_id long, text string")
    rows = {r["doc_id"]: r["features"] for r in
            decode_media(attach_binary_payload(d), feature_dim=4).collect()}
    assert len(rows[1]) == 4 and len(rows[2]) == 4
    assert rows[2] == [0.0, 0.0, 0.0, 0.0]
    assert rows[1] == [float(ord("a")), float(ord("b")), float(ord("c")), 0.0]


def test_ann_hyperplane_subset_of_bruteforce(spark):
    """LSH bucket pruning returns exactly the brute-force ranking restricted
    to the query's bucket, and the top hit survives when it shares a bucket
    with the query (here: an identical vector always does)."""
    from data_services_spark.operators.similarity import (
        ann_hyperplane_topk, knn_topk)
    import random

    random.seed(7)
    rows = [(i, [random.uniform(-1, 1) for _ in range(8)], 0)
            for i in range(30)]
    rows.append((99, list(rows[0][1]), 0))  # exact dup of vec 0
    e = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int")
    ann = ann_hyperplane_topk(e, query_id=0, k=5, n_planes=2).collect()
    assert ann, "query bucket must contain at least the exact dup"
    assert ann[0]["vec_id"] == 99 and ann[0]["cosine_sim"] > 0.999999
    brute = {r["vec_id"] for r in knn_topk(e, query_id=0, k=31).collect()}
    assert {r["vec_id"] for r in ann} <= brute


def test_embedding_near_dup_pairs(spark):
    from data_services_spark.operators.similarity import embedding_near_dup

    e = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0], 0),
         (2, [2.0, 0.0, 0.0], 0),      # scaled dup of 1, same label
         (3, [0.0, 1.0, 0.0], 0),      # orthogonal
         (4, [1.0, 0.0, 0.0], 1)],     # dup of 1 but different label block
        "vec_id long, embedding array<float>, label int")
    pairs = {(r["id_a"], r["id_b"])
             for r in embedding_near_dup(e, threshold=0.9).collect()}
    assert pairs == {(1, 2)}


def test_semdedup_matches_bruteforce(spark):
    """Cluster-local semantic dedup vs a Python reference: identical
    cell assignment (argmax dot, first-index tie-break) and identical
    survivor set (drop iff an earlier same-cell member is >= tau)."""
    import math
    import random

    from data_services_spark.operators.similarity import semdedup

    rnd = random.Random(13)
    dim, n = 8, 60
    rows = [(i, [rnd.gauss(0, 1) for _ in range(dim)]) for i in range(n)]
    # inject exact scaled copies (cosine 1.0, same argmax-dot cell)
    rows += [(i + 1000, [x * 3 for x in rows[i][1]]) for i in range(0, n, 10)]
    cents = [[rnd.gauss(0, 1) for _ in range(dim)] for _ in range(4)]
    tau = 0.95

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return d / (math.sqrt(sum(x * x for x in a))
                    * math.sqrt(sum(y * y for y in b)))

    # float32 round-trip: Spark reads array<float>, computes in double
    import numpy as np
    f32 = {i: [float(np.float32(x)) for x in v] for i, v in rows}
    cell = {}
    for i, _ in rows:
        ds = [sum(x * y for x, y in zip(f32[i], c)) for c in cents]
        cell[i] = ds.index(max(ds)) + 1
    expect_kept = {}
    for i in sorted(f32):
        expect_kept[i] = not any(
            cell[j] == cell[i] and cos(f32[j], f32[i]) >= tau
            for j in sorted(f32) if j < i)

    e = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {r["vec_id"]: (r["cell"], r["kept"])
           for r in semdedup(e, centroids=cents, threshold=tau,
                             dim=dim).collect()}
    assert len(got) == len(rows)
    for i in f32:
        assert got[i] == (cell[i], expect_kept[i]), i
    # every injected copy was dropped, every copy source survived its copy
    for i in range(0, n, 10):
        assert got[i + 1000][1] is False


def test_salted_agg_matches_plain(spark):
    from data_services_spark.operators.skew import salted_agg, salted_count

    df = spark.createDataFrame(
        [("hub", float(i)) for i in range(200)] + [("cold", 1.0), ("cold", 2.0)],
        "k string, v double")
    plain = {(r["k"]): (r["s"], r["c"]) for r in
             df.groupBy("k").agg(F.sum("v").alias("s"),
                                 F.count("v").alias("c")).collect()}
    salted = {(r["k"]): (r["s"], r["c"]) for r in
              salted_agg(df, ["k"],
                         partial=[F.sum("v").alias("s"),
                                  F.count("v").alias("c")],
                         combine=[F.sum("s").alias("s"),
                                  F.sum("c").cast("long").alias("c")],
                         n_buckets=8).collect()}
    assert plain == salted
    counts = {r["k"]: r["n"] for r in salted_count(df, ["k"]).collect()}
    assert counts == {"hub": 200, "cold": 2}


def test_salted_join_matches_plain(spark):
    from data_services_spark.operators.skew import salted_join

    probe = spark.createDataFrame(
        [("hub", i) for i in range(100)] + [("x", 0), ("miss", 1)],
        "k string, pv int")
    build = spark.createDataFrame(
        [("hub", "H"), ("x", "X"), ("unused", "U")], "k string, bv string")
    plain = sorted((r["k"], r["pv"], r["bv"]) for r in
                   probe.join(build, "k").collect())
    salted = sorted((r["k"], r["pv"], r["bv"]) for r in
                    salted_join(probe, build, "k", n_buckets=4).collect())
    assert plain == salted and len(plain) == 101


def test_supplement_deterministic_fake(spark):
    from data_services_spark.operators import supplement

    df = spark.createDataFrame(
        [("CUST:1", "a"), ("CUST:2", "b")], ["id", "payload"])
    out = supplement(df, id_col="id").collect()
    assert [r.annotation for r in out] == [
        r.annotation for r in supplement(df, id_col="id").collect()]
    assert all(r.annotation.startswith("ANN:") for r in out)
    assert out[0].annotation != out[1].annotation


def test_supplement_subprocess_line_protocol(spark):
    from data_services_spark.operators import supplement

    df = spark.createDataFrame([("x",), ("y",)], ["id"]).coalesce(1)
    out = supplement(df, id_col="id",
                     cmd=["sed", "s/^/got:/"]).collect()
    assert sorted(r.annotation for r in out) == ["got:x", "got:y"]


def test_local_fetcher_roundtrip(tmp_path):
    from data_services_spark.sources.fetch import (
        LocalFileFetcher, SourceFetcher,
    )

    src = tmp_path / "dump.tsv"
    src.write_text("a\tb\n")
    res = LocalFileFetcher().fetch(f"file://{src}", str(tmp_path / "in.tsv"))
    assert res.success and res.bytes_fetched == 4
    try:
        SourceFetcher().fetch("http://x", "y")
        raise AssertionError("base fetcher must not do network I/O")
    except NotImplementedError:
        pass


def test_connected_components_two_clusters_and_chain(spark):
    from data_services_spark.operators import connected_components

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (5, 4), (6, 5)],  # chain 4-5-6
        ["src", "dst"])
    got = {r.node: r.component
           for r in connected_components(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 4: 4, 5: 4, 6: 4}


def test_connected_components_empty_edges_observed_convergence(spark):
    """Round 13: the convergence count rides the checkpoint job as an
    Observation metric. Pin the empty-edge path explicitly — sum over a
    zero-row label frame is NULL where the old count() was 0, and the
    coalesce must convert that to immediate convergence, not a hang or
    a spurious extra round."""
    from data_services_spark.operators import (
        connected_components, dedup_clusters)

    empty = spark.createDataFrame([], "id_a long, id_b long")
    assert connected_components(empty, src="id_a", dst="id_b") \
        .collect() == []
    docs = spark.createDataFrame([(1,), (2,)], ["doc_id"])
    got = {r.doc_id: r.cluster_id
           for r in dedup_clusters(docs, empty).collect()}
    assert got == {1: 1, 2: 2}


def test_dedup_clusters_labels_singletons(spark):
    from data_services_spark.operators import dedup_clusters

    docs = spark.createDataFrame([(i,) for i in range(1, 6)], ["doc_id"])
    pairs = spark.createDataFrame([(2, 3), (4, 5)], ["id_a", "id_b"])
    got = {r.doc_id: r.cluster_id
           for r in dedup_clusters(docs, pairs).collect()}
    assert got == {1: 1, 2: 2, 3: 2, 4: 4, 5: 4}


def test_star_components_chain_and_random(spark):
    """large-star/small-star components == simple propagation, including
    a long chain (the diameter case the simple variant is slow on)."""
    import random

    from data_services_spark.operators import connected_components
    from data_services_spark.operators.components import (
        connected_components_star,
    )

    chain = [(i, i + 1) for i in range(0, 40)]          # diameter 40
    rng = random.Random(42)
    rand = [(rng.randrange(100, 160), rng.randrange(100, 160))
            for _ in range(60)]
    edges = spark.createDataFrame(
        [(a, b) for a, b in chain + rand if a != b], ["src", "dst"])

    got = {r.node: r.component
           for r in connected_components_star(edges).collect()}
    want = {r.node: r.component
            for r in connected_components(edges, max_rounds=60).collect()}
    assert got == want
    assert got[40] == 0  # far chain end reaches the root


def test_verify_jaccard_only_scores_candidates(spark):
    from data_services_spark.operators.dedup import verify_jaccard

    docs = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c x"), (3, "a b c d")],
        ["doc_id", "text"])
    # 1-3 are identical but NOT candidates -> must not appear
    cand = spark.createDataFrame([(1, 2)], ["id_a", "id_b"])
    got = verify_jaccard(docs, cand, threshold=0.5).collect()
    assert [(r.id_a, r.id_b) for r in got] == [(1, 2)]
    assert abs(got[0].jaccard - 3 / 5) < 1e-12


def test_ivf_topk_recall_vs_bruteforce(spark):
    from data_services_spark.catalog import load_table
    from data_services_spark.operators import knn_topk
    from data_services_spark.operators.similarity import ivf_topk

    from tests.conftest import SF_DIR
    emb = load_table(spark, SF_DIR, "embeddings")
    want = [r.vec_id for r in knn_topk(emb, query_id=0, k=10).collect()]
    got = [r.vec_id for r in
           ivf_topk(emb, query_id=0, k=10, n_cells=8, nprobe=4).collect()]
    # approximate: probing half the cells must recover most of top-10,
    # and ordering among found ids must match brute force
    overlap = len(set(want) & set(got))
    assert overlap >= 6, (want, got)
    got_filtered = [v for v in got if v in set(want)]
    want_filtered = [v for v in want if v in set(got)]
    assert got_filtered == want_filtered


def test_supplement_subprocess_handles_multiple_batches(spark):
    """A partition producing several Arrow batches must annotate them all
    (a single communicate() per partition closes stdin after the first
    batch and crashes the second; per-batch processes also can't deadlock
    against stdio-block-buffered tools — note: plain sed, no -u)."""
    from data_services_spark.operators import supplement

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "2")
    try:
        df = spark.createDataFrame(
            [(f"id{i}",) for i in range(7)], ["id"]).coalesce(1)
        out = supplement(df, id_col="id", cmd=["sed", "s/^/got:/"])
        assert sorted(r.annotation for r in out.collect()) == sorted(
            f"got:id{i}" for i in range(7))
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)


def test_supplement_subprocess_short_output_raises(spark):
    """A tool emitting fewer lines than rows is a protocol violation with
    a descriptive error, not an opaque pandas length mismatch."""
    from data_services_spark.operators import supplement

    df = spark.createDataFrame([("a",), ("b",), ("c",)], ["id"]).coalesce(1)
    out = supplement(df, id_col="id", cmd=["head", "-n", "1"])
    try:
        out.collect()
        raise AssertionError("expected line-protocol violation")
    except Exception as e:  # Py4J wraps the executor-side RuntimeError
        assert "line" in str(e) and "protocol" in str(e)


def test_simhash_column_and_df_forms_agree(spark):
    """simhash64 (single-expression) and simhash64_df (explode/groupBy)
    are two physical shapes of the SAME fingerprint — default (xxhash64,
    unseeded) families must produce identical hex strings."""
    from data_services_spark.operators import simhash64, simhash64_df

    d = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "pack my box with five dozen liquor jugs"),
         (3, "sphinx of black quartz judge my vow")],
        "doc_id long, text string")
    col_form = {r.doc_id: r.sh for r in
                d.select("doc_id", simhash64("text").alias("sh")).collect()}
    df_form = {r.doc_id: r.simhash for r in simhash64_df(d).collect()}
    assert col_form == df_form


def test_minhash_lsh_leaves_no_cached_rdds(spark):
    """minhash_lsh_pairs must not leak persisted blocks in a long-lived
    session (the self-join reuses the signature aggregation via Spark's
    ReuseExchange rule instead of an explicit persist). Snapshot-diff —
    not global emptiness — so the assertion tests minhash, not whatever
    other tests legitimately left pinned in the shared session."""
    from data_services_spark.operators import minhash_lsh_pairs
    from data_services_spark.plans.bucketing import physical_plan

    d = spark.createDataFrame(
        [(i, f"shared prefix words {'x' if i % 2 else 'y'} tail {i}")
         for i in range(20)], "doc_id long, text string")
    before = spark.sparkContext._jsc.sc().getPersistentRDDs().size()
    pairs = minhash_lsh_pairs(d, num_hashes=16, bands=8)
    pairs.collect()
    after = spark.sparkContext._jsc.sc().getPersistentRDDs().size()
    # <= not ==: the ContextCleaner may concurrently drop blocks whose
    # DataFrames earlier tests released; minhash itself must add none
    assert after <= before
    # the no-persist design leans on ReuseExchange firing for the
    # signature aggregation's two consumers — assert it actually does
    assert "ReusedExchange" in physical_plan(pairs)


def test_connected_components_frees_superseded_checkpoints(spark):
    """Iterative CC localCheckpoints every round; superseded rounds'
    blocks must be unpersisted as they're replaced, leaving exactly the
    final result's checkpoint pinned (O(1) per call, not O(rounds))."""
    from data_services_spark.operators.components import (
        connected_components, connected_components_star)

    # a 7-node chain forces multiple propagation rounds
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(7)], "src long, dst long")
    before = spark.sparkContext._jsc.sc().getPersistentRDDs().size()
    out = connected_components(edges)
    assert out.count() == 8
    mid = spark.sparkContext._jsc.sc().getPersistentRDDs().size()
    assert mid - before <= 1
    out2 = connected_components_star(edges)
    assert out2.count() == 8
    after = spark.sparkContext._jsc.sc().getPersistentRDDs().size()
    assert after - mid <= 1


def test_ivf_index_probe_prunes_partitions_and_recalls(spark, tmp_path):
    """The materialized IVF index must (a) turn cell selection into
    directory pruning — the probe plan's scan carries a PartitionFilters
    entry on __cell, before any data is read — and (b) keep recall >= 0.9
    vs brute force at nprobe=half the cells, (c) probe WITHOUT re-fitting
    (centroids come from the json artifact)."""
    from data_services_spark.catalog import load_table
    from data_services_spark.operators import knn_topk
    from data_services_spark.operators.similarity import (
        _query_vector, ivf_build_index, ivf_load_meta, ivf_probe_topk,
    )
    from data_services_spark.plans.bucketing import physical_plan
    from tests.conftest import SF_DIR

    emb = load_table(spark, SF_DIR, "embeddings")
    index_dir = str(tmp_path / "ivf")
    ivf_build_index(emb, index_dir, n_cells=8, seed=42)
    meta = ivf_load_meta(index_dir)
    assert meta["n_cells"] == 8 and len(meta["centroids"]) == 8

    qv = _query_vector(emb, 0, "vec_id", "embedding")
    probe = ivf_probe_topk(spark, index_dir, qv, k=10, nprobe=4,
                           exclude_id=0)
    plan = physical_plan(probe)
    assert "PartitionFilters" in plan
    assert "__cell" in plan.split("PartitionFilters", 1)[1][:200]

    got = [r.vec_id for r in probe.collect()]
    want = [r.vec_id for r in knn_topk(emb, query_id=0, k=10).collect()]
    overlap = len(set(want) & set(got))
    assert overlap >= 6, (want, got)
    got_filtered = [v for v in got if v in set(want)]
    want_filtered = [v for v in want if v in set(got)]
    assert got_filtered == want_filtered


def test_asof_directions_and_tolerance(spark):
    """forward takes the earliest at-or-after match, nearest takes the
    closer side with ties to backward, and tolerance nulls matches
    outside the band — pandas merge_asof semantics."""
    from data_services_spark.operators import asof_join

    left = spark.createDataFrame(
        [(1, _ts(10), "p1"), (1, _ts(30), "p2"), (2, _ts(5), "p3")],
        "user_id long, ts timestamp, pid string")
    right = spark.createDataFrame(
        [(1, _ts(8), "s_early"), (1, _ts(11), "s_late"),
         (1, _ts(50), "s_far")],
        "user_id long, ts timestamp, sid string")

    fwd = {r.pid: r.sid_right for r in asof_join(
        left, right, on=["user_id"], left_ts="ts", right_ts="ts",
        right_payload=["sid"], direction="forward").collect()}
    assert fwd == {"p1": "s_late", "p2": "s_far", "p3": None}

    fwd_tol = {r.pid: r.sid_right for r in asof_join(
        left, right, on=["user_id"], left_ts="ts", right_ts="ts",
        right_payload=["sid"], direction="forward",
        tolerance_seconds=5 * 60).collect()}
    assert fwd_tol == {"p1": "s_late", "p2": None, "p3": None}

    near = {r.pid: r.sid_right for r in asof_join(
        left, right, on=["user_id"], left_ts="ts", right_ts="ts",
        right_payload=["sid"], direction="nearest").collect()}
    # p1@10: prev 8 (gap 2) vs next 11 (gap 1) -> forward s_late
    # p2@30: prev 11 (gap 19) vs next 50 (gap 20) -> backward s_late
    assert near == {"p1": "s_late", "p2": "s_late", "p3": None}

    back_tol = {r.pid: r.sid_right for r in asof_join(
        left, right, on=["user_id"], left_ts="ts", right_ts="ts",
        right_payload=["sid"], tolerance_seconds=60).collect()}
    # p2@30: prior s_late@11 is 19 min away > 1 min tolerance
    assert back_tol == {"p1": None, "p2": None, "p3": None}

    import pytest as _pytest
    with _pytest.raises(ValueError):
        asof_join(left, right, on=["user_id"], left_ts="ts",
                  right_ts="ts", right_payload=["sid"],
                  direction="sideways")


def test_triangle_count_tiny_graph(spark):
    from data_services_spark.operators.components import triangle_count

    e = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (3, 5), (5, 1), (2, 1)],
        "src long, dst long")
    # {1,2,3}, {3,4,5}, {1,3,5}; duplicate/reversed edges collapse
    assert triangle_count(e).first().n_triangles == 3
    none = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    assert triangle_count(none).first().n_triangles == 0


def test_null_inputs_do_not_crash_or_conflate(spark):
    """Null text must not crash the dedup family nor conflate with empty
    string; null list props and null scalars must not break merge."""
    from data_services_spark.operators import (
        exact_text_dedup, merge_nodes, minhash_lsh_pairs,
    )

    d = spark.createDataFrame(
        [(1, None), (2, ""), (3, "hello world")], "doc_id long, text string")
    groups = {r.keep_id: r.content_hash for r in exact_text_dedup(d).collect()}
    assert set(groups) == {1, 2, 3}
    assert groups[1] is None            # null text -> its own null group
    assert groups[2] is not None        # empty string hashes normally
    assert minhash_lsh_pairs(d, num_hashes=8, bands=4).count() == 0

    n = spark.createDataFrame(
        [("X:1", "a", None, 1), ("X:1", None, ["c"], 2)],
        "id string, name string, category array<string>, source_rank int")
    out = merge_nodes(n).collect()[0]
    # null list rows are skipped by the union, null scalars lose to the
    # lower-rank non-null value
    assert (out.name, out.category, out.n_merged) == ("a", ["c"], 2)


def test_scd2_merge_paths(spark):
    from data_services_spark.operators.scd import scd2_merge

    state = spark.createDataFrame(
        [(1, "A", 0, 50),    # closed history: must pass through untouched
         (1, "B", 50, None), # open, will change
         (2, "C", 0, None),  # open, no-op update
         (3, "D", 0, None)], # open, no update at all
        "id long, seg string, valid_from long, valid_to long")
    upd = spark.createDataFrame(
        [(1, "B2", 100), (2, "C", 100), (9, "NEW", 100)],
        "id long, seg string, eff_ms long")
    rows = sorted(
        ((r["id"], r["seg"], r["valid_from"], r["valid_to"])
         for r in scd2_merge(state, upd, ["id"], ["seg"]).collect()),
        key=repr)
    assert rows == sorted([
        (1, "A", 0, 50),       # closed history passes through untouched
        (1, "B", 50, 100),     # changed: old version closed at eff
        (1, "B2", 100, None),  # changed: new open version
        (2, "C", 0, None),     # no-op update keeps the open row
        (3, "D", 0, None),     # untouched key
        (9, "NEW", 100, None), # brand-new key inserts
    ], key=repr)


def test_bfs_levels_chain(spark):
    from data_services_spark.operators.components import bfs_levels

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "src long, dst long")
    seeds = spark.createDataFrame([(1,)], "s long")
    got = {r["node"]: r["dist"]
           for r in bfs_levels(edges, seeds, iterations=2).collect()}
    # two rounds reach exactly two hops; 4 and the 10-11 island are absent
    assert got == {1: 0, 2: 1, 3: 2}


def test_bfs_checkpointed_matches_lazy_and_frees_blocks(spark):
    from data_services_spark.operators.components import (
        _persistent_rdd_ids, bfs_levels)

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11)], "src long, dst long")
    seeds = spark.createDataFrame([(1,), (10,)], "s long")
    lazy = {(r["node"], r["dist"])
            for r in bfs_levels(edges, seeds, iterations=3).collect()}
    before = len(_persistent_rdd_ids(spark))
    ck = bfs_levels(edges, seeds, iterations=3, checkpoint=True)
    got = {(r["node"], r["dist"]) for r in ck.collect()}
    after = len(_persistent_rdd_ids(spark))
    assert got == lazy == {(1, 0), (2, 1), (3, 2), (4, 3),
                           (10, 0), (11, 1)}
    # only the final round's checkpoint may stay pinned
    assert after - before <= 1


def test_scalable_running_sum_matches_window_and_distributes(spark):
    from data_services_spark.operators.windows import scalable_running_sum
    from pyspark.sql import Window

    df = spark.createDataFrame(
        [(i, (i * 37) % 11 + 1) for i in range(500)], "k long, v long")
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
    want = {(r["k"], r["s"]) for r in
            df.withColumn("s", F.sum("v").over(w)).collect()}
    out = scalable_running_sum(df, ["k"], "v", "s", num_partitions=7)
    got = {(r["k"], r["s"]) for r in out.collect()}
    assert got == want
    # the big table must NOT pass through a single task: row counts per
    # partition of the decomposed form stay well below the total. The
    # count must reference the window-derived column — counting lit(1)
    # lets the optimizer prune the window+exchange and measure the bare
    # scan instead — and AQE's tiny-partition coalescing is disabled for
    # the observation, since at toy row counts it legitimately merges
    # everything into one partition (see tests/test_plan_guard.py)
    key = "spark.sql.adaptive.coalescePartitions.enabled"
    saved = spark.conf.get(key)
    spark.conf.set(key, "false")
    try:
        sizes = [r["n"] for r in
                 out.groupBy(F.spark_partition_id().alias("p"))
                 .agg(F.count("s").alias("n")).collect()]
    finally:
        spark.conf.set(key, saved)
    assert max(sizes) < 500
    # The bucket must be a pure function of the data — any dependence on
    # physical partition ids can silently corrupt values when AQE gives
    # the two exchange consumers different coalesced readers (the round-4
    # driver hash mismatch). Nothing in the plan may read partition ids.
    from data_services_spark.plans.bucketing import physical_plan

    assert "spark_partition_id" not in physical_plan(out).lower()


def test_scalable_running_sum_stable_under_any_session_config(spark):
    """Value-identical output under adversarial AQE/coalesce/partition
    settings — the decomposition must not care how either branch of the
    plan is physically partitioned (the round-4 driver red: rows+schema
    matched, values didn't, under the driver's bare session)."""
    from data_services_spark.operators.windows import scalable_running_sum
    from pyspark.sql import Window

    df = spark.createDataFrame(
        [(i % 100, (i * 37) % 11 + 1, i) for i in range(997)],
        "k long, v long, tie long")  # duplicated keys: ties share buckets
    w = Window.orderBy("k", "tie").rowsBetween(
        Window.unboundedPreceding, 0)
    want = sorted((r["k"], r["tie"], r["s"]) for r in
                  df.withColumn("s", F.sum("v").over(w)).collect())
    knobs = [
        {"spark.sql.adaptive.enabled": "false"},
        {"spark.sql.adaptive.enabled": "true",
         "spark.sql.adaptive.advisoryPartitionSizeInBytes": "1024"},
        {"spark.sql.adaptive.enabled": "true",
         "spark.sql.adaptive.advisoryPartitionSizeInBytes": "256m",
         "spark.sql.adaptive.coalescePartitions.enabled": "true",
         "spark.sql.adaptive.coalescePartitions.minPartitionSize": "1"},
        {"spark.sql.shuffle.partitions": "3"},
        {"spark.sql.shuffle.partitions": "97",
         "spark.sql.adaptive.coalescePartitions.enabled": "false"},
    ]
    saved = {}
    for conf in knobs:
        for key, val in conf.items():
            if key not in saved:
                try:
                    saved[key] = spark.conf.get(key)
                except Exception:
                    saved[key] = None
            spark.conf.set(key, val)
        try:
            for npart in (None, 1, 5, 64):
                out = scalable_running_sum(
                    df, ["k", "tie"], "v", "s", num_partitions=npart)
                got = sorted((r["k"], r["tie"], r["s"])
                             for r in out.collect())
                assert got == want, (conf, npart)
        finally:
            for key, val in saved.items():
                if val is None:
                    spark.conf.unset(key)
                else:
                    spark.conf.set(key, val)
            saved = {}


def test_knn_literal_dim_path_matches_fold(spark):
    """The dim= literal-unrolled scoring (one codegen span, no join) must
    be bit-identical to the higher-order-fold broadcast path — same
    left-associated element order and IEEE 0.0+x==x (vectors.py doc)."""
    from data_services_spark.catalog import load_table

    e = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    fold = knn_topk(e, query_id=0, k=20).collect()
    lit = knn_topk(e, query_id=0, k=20, dim=64).collect()
    assert [(r.vec_id, r.rank) for r in fold] == \
           [(r.vec_id, r.rank) for r in lit]
    # exact float equality, not approx: the two forms share the same
    # operation sequence per element
    assert [r.cosine_sim for r in fold] == [r.cosine_sim for r in lit]


def test_knn_literal_dim_mismatch_raises(spark):
    d = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.5, 0.5])],
        "vec_id long, embedding array<float>")
    import pytest as _pytest
    with _pytest.raises(ValueError, match="dim=3"):
        knn_topk(d, query_id=0, k=1, dim=3)


def test_hll_union_is_lossless(spark):
    """HLL sketch union must equal sketching the whole column directly
    (register-wise max is lossless), and estimates must be near exact —
    the property the 100 TB two-level cardinality pattern rests on."""
    from data_services_spark.catalog import load_table
    import pyspark.sql.functions as F

    o = load_table(spark, "/root/testdata/sf0.001", "orders")
    merged = (o.groupBy("o_orderpriority")
              .agg(F.hll_sketch_agg("o_custkey").alias("sk"))
              .agg(F.hll_sketch_estimate(F.hll_union_agg("sk"))
                   .alias("n"))).head()[0]
    direct = o.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("o_custkey"))).head()[0]
    exact = o.agg(F.count_distinct("o_custkey")).head()[0]
    assert merged == direct
    assert abs(merged - exact) / exact < 0.05


def test_prepared_handle_is_memoized_per_session(spark):
    from data_services_spark import registry

    a = registry.prepared("q1_pricing_summary", spark,
                          "/root/testdata/sf0.001")
    b = registry.prepared("q1_pricing_summary", spark,
                          "/root/testdata/sf0.001")
    c = registry.prepared("q1_pricing_summary", spark,
                          "/root/testdata/sf0.01")
    assert a is b          # same (name, sf_dir, session) -> same handle
    assert a is not c      # different sf_dir -> fresh plan
    assert a.count() == 6  # and the handle still executes


def test_prepared_cache_is_bounded_lru_and_releasable(spark):
    """_PREPARED must not grow without bound in a long-lived service
    session (round-8 verdict ask #7): LRU-bounded at _PREPARED_CAP,
    recency refreshed on hit, and prepared_release() empties it.
    Eviction only ever costs a plan rebuild — pinned by checking a
    re-requested evicted handle is a NEW object that still executes."""
    from data_services_spark import registry

    registry.prepared_release()
    assert len(registry._PREPARED) == 0
    saved_cap = registry._PREPARED_CAP
    registry._PREPARED_CAP = 3
    try:
        dirs = [f"/root/testdata/sf0.001#{i}" for i in range(3)]
        # distinct keys via distinct sf_dir strings would break the
        # read; use distinct NAMES against one real dir instead
        names = ["q1_pricing_summary", "q6_forecast_revenue",
                 "record_counts", "string_functions"]
        sf = "/root/testdata/sf0.001"
        del dirs
        h0 = registry.prepared(names[0], spark, sf)
        registry.prepared(names[1], spark, sf)
        registry.prepared(names[2], spark, sf)
        # touch names[0] -> it becomes most-recent
        assert registry.prepared(names[0], spark, sf) is h0
        # 4th distinct key evicts the LRU entry (names[1], not names[0])
        registry.prepared(names[3], spark, sf)
        assert len(registry._PREPARED) == 3
        keys = {k[0] for k in registry._PREPARED}
        assert names[1] not in keys and names[0] in keys
        # evicted handle rebuilds fresh and still executes
        h1b = registry.prepared(names[1], spark, sf)
        assert h1b.count() >= 0
        registry.prepared_release()
        assert len(registry._PREPARED) == 0
    finally:
        registry._PREPARED_CAP = saved_cap
        registry.prepared_release()


def _encode_png(pixels, color_type, filters):
    """Minimal in-test PNG encoder (stdlib): forward-filters each row
    with the given per-row filter type so the decoder's unfilter paths
    (0 None, 1 Sub, 2 Up, 3 Average, 4 Paeth) all get exercised."""
    import struct
    import zlib

    import numpy as np

    px = np.asarray(pixels, np.uint8)
    h, w, ch = px.shape
    flat = px.reshape(h, w * ch).astype(np.int32)
    out = bytearray()
    for y, f in zip(range(h), filters):
        line = flat[y]
        prev = flat[y - 1] if y else np.zeros(w * ch, np.int32)
        enc = np.zeros(w * ch, np.int32)
        for x in range(w * ch):
            a = line[x - ch] if x >= ch else 0
            b = prev[x]
            c = prev[x - ch] if x >= ch else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else \
                    (b if pb <= pc else c)
            enc[x] = (line[x] - pred) & 0xFF
        out.append(f)
        out += enc.astype(np.uint8).tobytes()

    def chunk(ctype, data):
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data)))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(out)))
            + chunk(b"IEND", b""))


def _encode_wav(samples, rate=8000):
    import io
    import wave

    import numpy as np

    arr = np.asarray(samples, np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(arr.shape[1])
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(arr.astype("<i2").tobytes())
    return buf.getvalue()


def test_decode_png_real_all_filter_types():
    """The PNG decoder must invert every forward filter exactly —
    round-trip a known RGB image whose five rows use filters 0..4."""
    import numpy as np

    from data_services_spark.operators.multimodal import decode_png

    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, size=(5, 6, 3), dtype=np.uint8)
    payload = _encode_png(px, color_type=2, filters=[0, 1, 2, 3, 4])
    d = decode_png(payload)
    assert (d["width"], d["height"], d["channels"]) == (6, 5, 3)
    assert np.array_equal(d["pixels"], px)
    # grayscale too (1 channel, Paeth everywhere)
    g = rng.integers(0, 256, size=(4, 4, 1), dtype=np.uint8)
    d2 = decode_png(_encode_png(g, color_type=0, filters=[4, 4, 4, 4]))
    assert np.array_equal(d2["pixels"], g)
    import pytest as _pytest
    with _pytest.raises(ValueError):
        decode_png(b"not a png at all")


def test_decode_wav_real_pcm():
    import numpy as np

    from data_services_spark.operators.multimodal import decode_wav

    samples = np.array([[0, 1], [-5, 7], [100, -100], [32767, -32768]],
                       np.int16)
    d = decode_wav(_encode_wav(samples, rate=16000))
    assert (d["n_channels"], d["sample_rate"], d["n_samples"]) == (2, 16000, 4)
    assert np.array_equal(d["samples"], samples.astype(np.int64))
    import pytest as _pytest
    with _pytest.raises(ValueError):
        decode_wav(b"RIFFgarbage")


def test_decode_media_dispatches_real_codecs(spark):
    """End-to-end mapInPandas dispatch: PNG and WAV rows take the REAL
    decode path (exact integer features asserted against independently
    computed sums), unknown mimes and malformed media fall back to the
    byte-histogram stub."""
    import numpy as np

    import pyspark.sql.functions as F
    from data_services_spark.operators.multimodal import decode_media

    rng = np.random.default_rng(11)
    px = rng.integers(0, 256, size=(3, 4, 3), dtype=np.uint8)
    png = _encode_png(px, color_type=2, filters=[0, 2, 4])
    wav_samples = np.array([[3], [-4], [10]], np.int16)
    wav = _encode_wav(wav_samples, rate=8000)
    rows = [
        (1, bytearray(png), "image/png"),
        (2, bytearray(wav), "audio/wav"),
        (3, bytearray(b"abc"), "text/plain"),
        (4, bytearray(b"\x89PNG\r\n\x1a\nbroken"), "image/png"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary, m string") \
        .withColumn("media_meta", F.struct(F.col("m").alias("mime")))
    got = {r["doc_id"]: r["features"] for r in
           decode_media(df, feature_dim=8).collect()}
    sums = px.reshape(-1, 3).sum(axis=0)
    assert got[1] == [2.0, 4.0, 3.0, 3.0,
                      float(sums[0]), float(sums[1]), float(sums[2]), 0.0]
    assert got[2] == [1.0, 1.0, 8000.0, 3.0, 9.0, 17.0, -4.0, 10.0]
    # stub path: byte-histogram moments of the raw payload
    arr = np.frombuffer(b"abc", np.uint8)
    assert got[3] == [float(arr[i::8].sum() % 997) for i in range(8)]
    assert len(got[4]) == 8  # malformed PNG routed to stub, not an error


def test_decode_media_malformed_rows_fall_back_not_fail(spark):
    """Advisor finding (round 5): _decode caught only ValueError, but
    stdlib raises other types on crafted inputs that pass the signature
    check — zlib.error on corrupt IDAT bytes, struct.error on a
    truncated IHDR, ZeroDivisionError on a WAV fmt chunk declaring 0
    channels. Each such row must take the byte-histogram stub, never
    fail the whole mapInPandas job."""
    import struct
    import zlib

    import numpy as np

    import pyspark.sql.functions as F
    from data_services_spark.operators.multimodal import decode_media

    def chunk(ctype, data):
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data)))

    # valid signature + valid IHDR, but IDAT is NOT zlib data
    ihdr = struct.pack(">IIBBBBB", 4, 3, 8, 2, 0, 0, 0)
    corrupt_idat = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
                    + chunk(b"IDAT", b"this is not deflate")
                    + chunk(b"IEND", b""))
    # IHDR chunk whose declared length is 13 but data is truncated:
    # struct.unpack(">IIBBBBB") sees 5 bytes and raises struct.error
    truncated_ihdr = (b"\x89PNG\r\n\x1a\n"
                      + struct.pack(">I", 13) + b"IHDR" + b"\x00" * 5)
    # hand-built RIFF/WAVE with a fmt chunk declaring 0 channels
    fmt = struct.pack("<HHIIHH", 1, 0, 8000, 0, 0, 16)
    data = b"\x00\x00" * 4
    wav0 = (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
            + b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    rows = [(1, bytearray(corrupt_idat), "image/png"),
            (2, bytearray(truncated_ihdr), "image/png"),
            (3, bytearray(wav0), "audio/wav")]
    df = spark.createDataFrame(rows, "doc_id long, payload binary, m string") \
        .withColumn("media_meta", F.struct(F.col("m").alias("mime")))
    got = {r["doc_id"]: r["features"] for r in
           decode_media(df, feature_dim=8).collect()}
    for doc_id, payload in [(1, corrupt_idat), (2, truncated_ihdr),
                            (3, wav0)]:
        arr = np.frombuffer(payload, np.uint8)
        assert got[doc_id] == \
            [float(arr[i::8].sum() % 997) for i in range(8)], doc_id


def _dhash_reference(luma):
    """Independent numpy dHash reference (integer block means over the
    [i*H//8,(i+1)*H//8) x [j*W//9,(j+1)*W//9) grid, gradient bits) —
    shares no code with operators/multimodal.image_dhash's kernel."""
    import numpy as np

    luma = np.asarray(luma, np.int64)
    h, w = luma.shape
    hi = lo = 0
    blocks = [[0] * 9 for _ in range(8)]
    for i in range(8):
        for j in range(9):
            seg = luma[i * h // 8:(i + 1) * h // 8,
                       j * w // 9:(j + 1) * w // 9]
            blocks[i][j] = int(seg.sum()) // seg.size
    for i in range(8):
        for j in range(8):
            if blocks[i][j + 1] > blocks[i][j]:
                k = i * 8 + j
                if k >= 32:
                    hi |= 1 << (k - 32)
                else:
                    lo |= 1 << k
    return hi, lo


def test_image_dhash_matches_reference_gray_and_rgb(spark):
    """image_dhash through a REAL PNG encode->decode round trip must
    equal the independent numpy reference: grayscale (luma = pixel)
    on non-divisible dims (uneven blocks), and RGB through the integer
    luma (299R+587G+114B)//1000 with the filtered encoder."""
    import numpy as np

    from data_services_spark.operators.multimodal import (
        encode_png_gray, image_dhash)

    rng = np.random.default_rng(7)
    gray = rng.integers(0, 256, (13, 21), dtype=np.uint8)  # 13x21: uneven
    rgb = rng.integers(0, 256, (16, 18, 3), dtype=np.uint8)
    rgb_png = _encode_png(rgb, color_type=2, filters=[0, 1, 2, 3, 4] * 3
                          + [1])
    rows = [(1, bytearray(encode_png_gray(gray))), (2, bytearray(rgb_png)),
            (3, bytearray(b"not a png"))]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: (r["dhash_hi"], r["dhash_lo"], r["width"],
                         r["height"])
           for r in image_dhash(df).collect()}
    assert 3 not in got                      # undecodable rows drop
    assert got[1][:2] == _dhash_reference(gray)
    assert got[1][2:] == (21, 13)
    luma = (rgb[:, :, 0].astype(np.int64) * 299
            + rgb[:, :, 1].astype(np.int64) * 587
            + rgb[:, :, 2].astype(np.int64) * 114) // 1000
    assert got[2][:2] == _dhash_reference(luma)


def test_image_near_dup_band_guarantee_and_no_false_positives(spark):
    """Banded Hamming near-dup parity vs brute force: (a) NO pair above
    max_hamming survives (the exact bit_count verify); (b) EVERY pair
    at Hamming <= 3 is found (pigeonhole: 3 flipped bits cannot touch
    all 4 of the 16-bit bands); (c) found pairs are a subset of the
    brute-force <= max_hamming set (banding only loses recall, never
    invents pairs)."""
    import itertools
    import random

    from data_services_spark.operators.multimodal import image_near_dup

    rnd = random.Random(11)
    base = rnd.getrandbits(64)
    hashes = [base]
    for flips in (1, 2, 3, 7, 10, 11, 20):   # controlled distances
        h = base
        for b in rnd.sample(range(64), flips):
            h ^= 1 << b
        hashes.append(h)
    hashes.append(rnd.getrandbits(64))       # far-away stranger
    rows = [(i, (h >> 32) & 0xFFFFFFFF, h & 0xFFFFFFFF)
            for i, h in enumerate(hashes)]
    df = spark.createDataFrame(rows,
                               "doc_id long, dhash_hi long, dhash_lo long")
    got = {(r["id_a"], r["id_b"]): r["hamming"]
           for r in image_near_dup(df, max_hamming=10).collect()}
    brute = {}
    for (i, a), (j, b) in itertools.combinations(enumerate(hashes), 2):
        d = bin(a ^ b).count("1")
        if d <= 10:
            brute[(i, j)] = d
    assert all(v <= 10 for v in got.values())
    assert set(got) <= set(brute)
    assert all(got[k] == brute[k] for k in got)   # exact distances
    guaranteed = {k for k, v in brute.items() if v <= 3}
    assert guaranteed <= set(got)


def test_scalable_running_sum_string_keys(spark):
    """String order keys bucket by the monotone 8-byte-prefix surrogate:
    results must equal the plain global window, including unicode keys,
    duplicated keys, and keys sharing a long common prefix (which
    collapse into one bucket — order-consistency over balance)."""
    from pyspark.sql import Window

    from data_services_spark.operators.windows import scalable_running_sum

    keys = (["doc-%04d" % i for i in range(60)]
            + ["doc-%04d" % (i % 7) for i in range(40)]   # duplicates
            + ["sharedprefix_aaaaaaa_%02d" % i for i in range(30)]
            + ["", "a", "zz", "ä", "日本語", "\x00weird"])
    rows = [(k, (i * 37) % 11 + 1, i) for i, k in enumerate(keys)]
    df = spark.createDataFrame(rows, "k string, v long, tie long")
    w = Window.orderBy("k", "tie").rowsBetween(
        Window.unboundedPreceding, 0)
    want = sorted((r["k"], r["tie"], r["s"]) for r in
                  df.withColumn("s", F.sum("v").over(w)).collect())
    got = sorted((r["k"], r["tie"], r["s"]) for r in
                 scalable_running_sum(df, ["k", "tie"], "v", "s",
                                      num_partitions=9).collect())
    assert got == want


def test_quantile_bucket_count_capped_and_warned(spark):
    """Round-5 advisor: balance='quantile' builds an O(num_buckets)
    expression tree, so (a) the derived default in scalable_running_sum
    caps at 128 instead of inheriting shuffle.partitions=200 silently,
    and (b) an explicit count past 128 warns but is honored."""
    import warnings

    from data_services_spark.operators.windows import (
        bucket_by_leading_key, scalable_running_sum,
    )

    df = spark.range(200).select(
        F.col("id").alias("k"), (F.col("id") % 5 + 1).alias("v"))
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # any warning -> test failure
        got = sorted(
            (r["k"], r["s"]) for r in scalable_running_sum(
                df, ["k"], "v", "s", balance="quantile").collect())
    want = []
    run = 0
    for k in range(200):
        run += k % 5 + 1
        want.append((k, run))
    assert got == want
    with pytest.warns(UserWarning, match="num_buckets=150"):
        bucket_by_leading_key(df, "k", 150, balance="quantile")


def test_query_vector_cache_evicts_one_and_clears(spark):
    """Round-5 advisor: the qvec cache must evict ONE entry on overflow
    (not thrash from empty) and expose an explicit invalidation hook for
    in-place file rewrites."""
    from data_services_spark.operators import similarity as sim

    saved = dict(sim._QVEC_CACHE)
    sim._QVEC_CACHE.clear()
    try:
        sim._QVEC_CACHE.update({("k", i): [float(i)] for i in range(3)})
        old_max = sim._QVEC_CACHE_MAX
        sim._QVEC_CACHE_MAX = 3
        try:
            df = spark.createDataFrame(
                [(7, [1.0, 2.0])], "vec_id long, embedding array<double>")
            vec = sim._query_vector(df, 7, "vec_id", "embedding")
            assert vec == [1.0, 2.0]
            assert len(sim._QVEC_CACHE) == 3          # one in, one out
            assert ("k", 0) not in sim._QVEC_CACHE    # oldest evicted
            assert ("k", 1) in sim._QVEC_CACHE
        finally:
            sim._QVEC_CACHE_MAX = old_max
        assert sim.clear_query_vector_cache() == 3
        assert sim._QVEC_CACHE == {}
    finally:
        sim._QVEC_CACHE.clear()
        sim._QVEC_CACHE.update(saved)


def test_bucket_quantile_balance_on_skewed_keys(spark):
    """balance='quantile' must (a) keep the running sum exact on a
    heavily skewed key distribution and (b) actually balance where
    linear bucketing collapses: with 99% of keys in [0,10) and a sparse
    tail out to 1e9, linear puts ~everything in bucket 0."""
    from pyspark.sql import Window

    from data_services_spark.operators.windows import (
        bucket_by_leading_key, scalable_running_sum,
    )

    rows = [(i % 10, 1, i) for i in range(990)] + \
        [(10**9 + i, 1, 1000 + i) for i in range(10)]
    df = spark.createDataFrame(rows, "k long, v long, tie long")
    w = Window.orderBy("k", "tie").rowsBetween(
        Window.unboundedPreceding, 0)
    want = sorted((r["k"], r["tie"], r["s"]) for r in
                  df.withColumn("s", F.sum("v").over(w)).collect())
    for mode in ("linear", "quantile"):
        got = sorted((r["k"], r["tie"], r["s"]) for r in
                     scalable_running_sum(df, ["k", "tie"], "v", "s",
                                          num_partitions=8,
                                          balance=mode).collect())
        assert got == want, mode

    def max_bucket(mode):
        b = bucket_by_leading_key(df, "k", 8, balance=mode)
        return max(r["n"] for r in b.groupBy("__bucket")
                   .agg(F.count(F.lit(1)).alias("n")).collect())

    # linear: the whole head lands in bucket 0 (tail stretches the span)
    assert max_bucket("linear") >= 990
    # quantile: bounded by tie mass — each of the 10 head values is 99
    # rows, so no bucket need exceed ~2 tie-groups
    assert max_bucket("quantile") <= 250

    with pytest.raises(ValueError, match="balance"):
        bucket_by_leading_key(df, "k", 8, balance="nope")


def test_scalable_running_sum_null_keys_sort_first(spark):
    """NULL leading keys sort first (Spark NULLS FIRST) and must land in
    bucket 0 under BOTH balance modes. The linear mode once sent them to
    the LAST bucket because least()/greatest() SKIP nulls instead of
    propagating them — least(n-1, NULL) = n-1 — silently shifting every
    later row's offset."""
    from pyspark.sql import Window

    from data_services_spark.operators.windows import scalable_running_sum

    rows = [(None, 5, 0), (None, 3, 1)] + \
        [(i, 1, 10 + i) for i in range(50)]
    df = spark.createDataFrame(rows, "k long, v long, tie long")
    w = Window.orderBy("k", "tie").rowsBetween(
        Window.unboundedPreceding, 0)
    want = sorted(((r["k"], r["tie"], r["s"]) for r in
                   df.withColumn("s", F.sum("v").over(w)).collect()),
                  key=repr)
    for mode in ("linear", "quantile"):
        got = sorted(((r["k"], r["tie"], r["s"]) for r in
                      scalable_running_sum(df, ["k", "tie"], "v", "s",
                                           num_partitions=4,
                                           balance=mode).collect()),
                     key=repr)
        assert got == want, mode


def _winnow_ref(text: str, k: int = 8, w: int = 4) -> list[int]:
    """Plain-Python winnowing reference (Schleimer et al. fig. 5, the
    simple min-of-window form the operator implements)."""
    import hashlib

    s = text.strip().lower()

    def h(g: str) -> int:
        return int(hashlib.md5(f"win:{g}".encode()).hexdigest()[:15], 16)

    hs = ([h(s)] if len(s) - (k - 1) <= 0
          else [h(s[i:i + k]) for i in range(len(s) - k + 1)])
    sel = ([min(hs)] if len(hs) - (w - 1) <= 0
           else [min(hs[j:j + w]) for j in range(len(hs) - w + 1)])
    return sorted(set(sel))


def test_winnow_fingerprints_match_python_reference(spark):
    from data_services_spark.operators import winnow_fingerprints

    texts = ["the quick brown fox jumps over the lazy dog",
             "tiny",           # shorter than k -> single whole-text hash
             "exactly8!",      # one gram over k=8 after norm
             "",               # empty after trim
             "aaaaaaaaaaaaaaaaaaaa"]  # constant text -> 1 distinct gram
    d = spark.createDataFrame(list(enumerate(texts)),
                              "doc_id long, text string")
    got = {r["doc_id"]: list(r["fps"])
           for r in winnow_fingerprints(d, k=8, window=4).collect()}
    for i, t in enumerate(texts):
        assert got[i] == _winnow_ref(t, 8, 4), (i, t)


def test_winnow_guarantee_shared_substring_shares_fingerprint(spark):
    """The winnowing guarantee: two docs sharing a substring of length
    >= k + w - 1 share at least one selected fingerprint; disjoint-
    alphabet docs share none."""
    from data_services_spark.operators import (winnow_fingerprints,
                                               winnow_shared_pairs)

    shared = "a very distinctive common passage of text"  # len 41 >= 11
    d = spark.createDataFrame(
        [(1, f"prefix one {shared} suffix alpha"),
         (2, f"totally different opening {shared} and another ending"),
         (3, "zzz qqq vvv kkk www uuu mmm nnn ooo ppp rrr sss ttt")],
        "doc_id long, text string")
    fps = {r["doc_id"]: set(r["fps"])
           for r in winnow_fingerprints(d, k=8, window=4).collect()}
    assert fps[1] & fps[2], "guaranteed shared fingerprint missing"
    assert not (fps[1] & fps[3]) and not (fps[2] & fps[3])

    pairs = {(r["id_a"], r["id_b"]): r["n_shared"]
             for r in winnow_shared_pairs(d, k=8, window=4,
                                          min_shared=2).collect()}
    assert set(pairs) == {(1, 2)} and pairs[(1, 2)] >= 2


def test_winnow_shared_pairs_one_slot_cache_and_release(spark):
    """Round 13: winnow_shared_pairs persists its inverted index one-
    slot (the bm25/PPJoin device) so the per-character fingerprint fold
    runs once per call, not once per plan reference. Contract: at most
    one cached relation alive (second call evicts the first), release
    empties the slot, and the released path recomputes THE SAME rows."""
    from data_services_spark.operators import dedup as dd

    d = spark.createDataFrame(
        [(1, "a very distinctive common passage of text one"),
         (2, "a very distinctive common passage of text two"),
         (3, "zzz qqq vvv kkk www uuu mmm nnn ooo ppp rrr sss")],
        "doc_id long, text string")
    cached = sorted(tuple(r) for r in
                    dd.winnow_shared_pairs(d, k=8, window=4,
                                           min_shared=1).collect())
    dd.winnow_shared_pairs(d, k=8, window=4, min_shared=1).collect()
    assert len(dd._WINNOW_CACHE) == 1   # second call evicted the first
    dd.winnow_release()
    assert not dd._WINNOW_CACHE
    plain = dd.winnow_shared_pairs(d, k=8, window=4, min_shared=1)
    recomputed = sorted(tuple(r) for r in plain.collect())
    assert recomputed == cached
    dd.winnow_release()


def test_winnow_rows_equals_array_form(spark):
    """The row-form scale path must select EXACTLY the array form's
    fingerprints, including sub-k texts, exactly-one-window texts, and
    the partial-window (< w grams) document."""
    from data_services_spark.operators import (winnow_fingerprint_rows,
                                               winnow_fingerprints)

    texts = ["the quick brown fox jumps over the lazy dog again",
             "tiny", "exactly8!", "", "aa" * 40,
             "short but more than one gram", None]  # null == empty text
    d = spark.createDataFrame(list(enumerate(texts)),
                              "doc_id long, text string")
    for k, w in ((8, 4), (5, 3), (24, 8)):
        import pyspark.sql.functions as F

        want = {(r.doc_id, f) for r in
                winnow_fingerprints(d, k=k, window=w).collect()
                for f in r.fps}
        got = {(r.doc_id, r.fp) for r in
               winnow_fingerprint_rows(d, k=k, window=w).collect()}
        assert got == want, (k, w)


def test_ivf_incremental_append_probe_and_retrain(spark, tmp_path):
    """Generational IVF maintenance (round-6 verdict ask #4): appends
    assign to the nearest EXISTING centroid and rewrite only touched
    cell buckets — no 17s full rebuild per append — while (a) the probe
    sees appended vectors immediately (an appended exact duplicate of
    the query ranks first), (b) recall after append stays within
    tolerance of a from-scratch rebuild, and (c) the drift counter
    triggers a retrain that swaps state dirs atomically."""
    import os

    import pyspark.sql.functions as F

    from data_services_spark.catalog import load_table
    from data_services_spark.operators import knn_topk
    from data_services_spark.operators.similarity import (
        _query_vector, ivf_append, ivf_build_index, ivf_load_meta,
        ivf_maybe_retrain, ivf_probe_topk,
    )
    from tests.conftest import SF_DIR

    emb = load_table(spark, SF_DIR, "embeddings")
    base = emb.filter("vec_id % 5 != 0 or vec_id = 0")
    extra = emb.filter("vec_id % 5 = 0 and vec_id <> 0")
    index_dir = str(tmp_path / "ivf")
    ivf_build_index(base, index_dir, n_cells=8, seed=42,
                    incremental=True)

    res = ivf_append(spark, index_dir,
                     extra.select("vec_id", "embedding"),
                     drift_threshold=0.1)
    assert res["appended_rows"] == extra.count()
    assert res["retrain_recommended"]  # ~25% appended > 10% threshold

    qv = _query_vector(emb, 0, "vec_id", "embedding")
    got = [r.vec_id for r in
           ivf_probe_topk(spark, index_dir, qv, k=10, nprobe=4,
                          exclude_id=0).collect()]
    want = [r.vec_id for r in knn_topk(emb, query_id=0, k=10).collect()]
    # rebuild twin at identical params: append must not cost recall
    # beyond tolerance
    idx2 = str(tmp_path / "ivf2")
    ivf_build_index(emb, idx2, n_cells=8, seed=42)
    got_rebuild = [r.vec_id for r in
                   ivf_probe_topk(spark, idx2, qv, k=10, nprobe=4,
                                  exclude_id=0).collect()]
    inc_recall = len(set(got) & set(want))
    rebuild_recall = len(set(got_rebuild) & set(want))
    assert inc_recall >= rebuild_recall - 2, (got, got_rebuild, want)
    assert inc_recall >= 6

    # appended rows are live: an exact duplicate of the query vector
    # (appended AFTER the build) must rank first
    dup = (emb.filter("vec_id = 0")
           .select(F.lit(990001).cast("long").alias("vec_id"),
                   "embedding"))
    ivf_append(spark, index_dir, dup)
    after = ivf_probe_topk(spark, index_dir, qv, k=3, nprobe=4,
                           exclude_id=0).collect()
    assert after[0].vec_id == 990001
    assert abs(after[0].cosine_sim - 1.0) < 1e-12

    # drift-triggered retrain: fresh centroids, swapped state subdir,
    # old state removed, probe still correct
    old_subdir = ivf_load_meta(index_dir)["state_subdir"]
    rt = ivf_maybe_retrain(spark, index_dir, drift_threshold=0.1)
    assert rt["retrained"]
    meta = ivf_load_meta(index_dir)
    assert meta["state_subdir"] != old_subdir
    assert meta["appended"] == 0
    assert not os.path.isdir(os.path.join(index_dir, old_subdir))
    assert [d for d in os.listdir(index_dir)
            if d.startswith("corpus_state-")] == [meta["state_subdir"]]
    final = ivf_probe_topk(spark, index_dir, qv, k=3, nprobe=4,
                           exclude_id=0).collect()
    assert final[0].vec_id == 990001


def test_semdedup_indexed_matches_reference_both_layouts(spark, tmp_path):
    """Production SemDeDup over a trained IVF index: decisions equal a
    Python reference that replays the index's own assignment (k-means
    cells = argmin squared L2 to the persisted centroids) and the
    upper-triangular drop rule — on both the static partitioned layout
    and the generational state, including vectors added via ivf_append."""
    import math
    import random

    from data_services_spark.operators.similarity import (
        ivf_append, ivf_build_index, ivf_load_meta, semdedup_indexed,
    )

    rnd = random.Random(29)
    dim, n = 8, 80
    rows = [(i, [rnd.gauss(0, 1) for _ in range(dim)]) for i in range(n)]
    rows += [(i + 1000, [x * 2 for x in rows[i][1]]) for i in range(0, n, 8)]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    tau = 0.95

    def reference(index_dir, ids_vecs):
        import numpy as np
        meta = ivf_load_meta(index_dir)
        cents = [np.array(c) for c in meta["centroids"]]
        f32 = {i: np.array(v, dtype=np.float32).astype(float)
               for i, v in ids_vecs}
        cell = {i: int(np.argmin([((v - c) ** 2).sum() for c in cents]))
                for i, v in f32.items()}
        kept = {}
        for i in sorted(f32):
            kept[i] = not any(
                cell[j] == cell[i]
                and float(np.dot(f32[j], f32[i])
                          / (np.linalg.norm(f32[j])
                             * np.linalg.norm(f32[i]))) >= tau
                for j in sorted(f32) if j < i)
        return cell, kept

    for layout, incremental in (("static", False), ("generational", True)):
        index_dir = str(tmp_path / f"ivf_{layout}")
        ivf_build_index(e, index_dir, n_cells=4, seed=5,
                        incremental=incremental)
        got = {r["vec_id"]: (r["cell"], r["kept"])
               for r in semdedup_indexed(spark, index_dir,
                                         threshold=tau).collect()}
        cell, kept = reference(index_dir, rows)
        assert len(got) == len(rows)
        for i in cell:
            assert got[i] == (cell[i], kept[i]), (layout, i, got[i])

    # appended vectors join the dedup without a rebuild (generational)
    index_dir = str(tmp_path / "ivf_generational")
    extra = [(5000, rows[1][1]), (5001, [x * -1 for x in rows[2][1]])]
    ivf_append(spark, index_dir,
               spark.createDataFrame(extra,
                                     "vec_id long, embedding array<float>"))
    got = {r["vec_id"]: r["kept"]
           for r in semdedup_indexed(spark, index_dir,
                                     threshold=tau).collect()}
    assert len(got) == len(rows) + 2
    assert got[5000] is False  # exact copy of an earlier row -> dropped


def test_semdedup_blocked_triangle_join_parity(spark, tmp_path):
    """The blocked triangle join (skew fix for heavy k-means cells) must
    produce bit-identical decisions to the plain cell self-join: blocks
    partition members by id rank, so every (earlier, later) pair lands
    in exactly one block-pair. block_size=7 forces multi-block cells on
    a corpus with heavy duplicate clusters (the skew shape that
    serializes the plain join into one straggler task at scale)."""
    import random

    from data_services_spark.operators.similarity import (
        ivf_build_index, semdedup_indexed,
    )

    rnd = random.Random(41)
    dim = 8
    # 3 heavy near-dup families (30 noisy copies each) + background noise
    rows = []
    fams = [[rnd.gauss(0, 1) for _ in range(dim)] for _ in range(3)]
    for i in range(90):
        base = fams[i % 3]
        rows.append((i, [x * (1 + 0.001 * (i % 7)) for x in base]))
    rows += [(100 + i, [rnd.gauss(0, 1) for _ in range(dim)])
             for i in range(40)]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    index_dir = str(tmp_path / "ivf_blocked")
    ivf_build_index(e, index_dir, n_cells=3, seed=11)

    # The SQL-vs-numpy exact-equality assert below leans on a fixture
    # property: the numpy kernel's SIMD/pairwise summation can diverge
    # from the JVM's left-to-right sum within ~1 ulp, so no pair's
    # cosine may sit close to the 0.98 threshold. Make that margin
    # EXPLICIT (round-7 ADVICE): every within-family pair is a scalar
    # multiple (cosine ~ 1 after float32 rounding) and cross/noise
    # pairs are far below — assert nothing lands within 1e-4.
    import numpy as np
    arr = np.array([np.array(v, dtype=np.float32) for _, v in rows],
                   dtype=np.float64)
    nrm = arr / np.linalg.norm(arr, axis=1, keepdims=True)
    sims = nrm @ nrm.T
    off_diag = sims[~np.eye(len(rows), dtype=bool)]
    margin = np.abs(off_diag - 0.98).min()
    assert margin > 1e-4, f"fixture pair within {margin} of threshold"

    plain = {r["vec_id"]: (r["cell"], r["kept"])
             for r in semdedup_indexed(spark, index_dir, threshold=0.98,
                                       dim=dim, kernel="sql",
                                       block_size=None).collect()}
    blocked = {r["vec_id"]: (r["cell"], r["kept"])
               for r in semdedup_indexed(spark, index_dir, threshold=0.98,
                                         dim=dim, kernel="sql",
                                         block_size=7).collect()}
    assert plain == blocked
    # the numpy kernel (default) decides identically on margin-bearing
    # data — the documented Arrow-kernel float contract
    arrow = {r["vec_id"]: (r["cell"], r["kept"])
             for r in semdedup_indexed(spark, index_dir,
                                       threshold=0.98).collect()}
    assert plain == arrow
    assert sum(1 for c, k in plain.values() if not k) >= 80  # dups dropped


def test_semdedup_arrow_kernel_single_python_boundary(spark, tmp_path):
    """The numpy kernel is a DESIGNATED Arrow boundary: the plan must
    contain exactly one FlatMapGroupsInPandas and no other Python
    operator — the dedup math happens in one grouped kernel, not in
    row-at-a-time UDFs sprinkled through the plan."""
    from data_services_spark.operators.similarity import (
        ivf_build_index, semdedup_indexed,
    )

    e = spark.createDataFrame(
        [(i, [float(i % 7), float(i % 3)]) for i in range(40)],
        "vec_id long, embedding array<float>")
    index_dir = str(tmp_path / "ivf_boundary")
    ivf_build_index(e, index_dir, n_cells=2, seed=3)
    df = semdedup_indexed(spark, index_dir, threshold=0.99)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FlatMapGroupsInPandas") == 1
    for op in ("ArrowEvalPython", "BatchEvalPython", "MapInPandas",
               "PythonUDTF"):
        assert op not in plan
    assert df.count() == 40


def test_semdedup_indexed_rejects_sql_knobs_on_arrow_kernel(spark, tmp_path):
    """dim/block_size tune the SQL blocked-triangle join only; the
    arrow kernel batches whole cells and ignores both.  Passing them
    with kernel='arrow' must raise, not silently no-op (round-7
    ADVICE: block_size looked tunable but did nothing on the default
    path)."""
    import pytest as _pytest

    from data_services_spark.operators.similarity import (
        ivf_build_index, semdedup_indexed,
    )

    e = spark.createDataFrame(
        [(i, [float(i % 5), 1.0]) for i in range(20)],
        "vec_id long, embedding array<float>")
    index_dir = str(tmp_path / "ivf_knobs")
    ivf_build_index(e, index_dir, n_cells=2, seed=3)
    with _pytest.raises(ValueError, match="kernel='sql'"):
        semdedup_indexed(spark, index_dir, threshold=0.9, block_size=64)
    with _pytest.raises(ValueError, match="kernel='sql'"):
        semdedup_indexed(spark, index_dir, threshold=0.9, dim=2)
    # an EXPLICIT block_size=None is a knob too (it selects the plain
    # equi-join below) — the arrow kernel must reject it just as
    # loudly, not silently conflate it with "unset" (round-8 advice)
    with _pytest.raises(ValueError, match="kernel='sql'"):
        semdedup_indexed(spark, index_dir, threshold=0.9, block_size=None)
    # the sql kernel still accepts them
    assert semdedup_indexed(spark, index_dir, threshold=0.9,
                            kernel="sql", dim=2,
                            block_size=64).count() == 20
    # explicit None reaches the UNBLOCKED triangle join (no __blk rank
    # window in the plan) and decides identically to the blocked form
    plain = semdedup_indexed(spark, index_dir, threshold=0.9,
                             kernel="sql", block_size=None)
    assert "__blk" not in plain._jdf.queryExecution().optimizedPlan() \
        .toString()
    blocked = semdedup_indexed(spark, index_dir, threshold=0.9,
                               kernel="sql", block_size=64)
    assert sorted(map(tuple, plain.collect())) == \
        sorted(map(tuple, blocked.collect()))


def test_ivf_auto_sizes_cells_and_warns_on_hot_cells(spark, tmp_path):
    """k ∝ N made structural (round-7 verdict ask #4): n_cells=None
    derives the cell count from the corpus (ceil(N/target_cell_size),
    clamped), records the realized cell histogram ceiling in the
    artifact, keeps it an upper bound across appends, and
    semdedup_indexed warns — zero extra jobs — when a cell exceeds the
    arrow kernel's slab budget. Retrain RE-sizes an auto-sized index
    for the grown corpus."""
    import warnings as _warnings

    from data_services_spark.operators.similarity import (
        ivf_build_index, ivf_load_meta, ivf_append, ivf_maybe_retrain,
        semdedup_indexed,
    )

    rnd_rows = [(i, [float((i * 7 + j * 3) % 11) + 0.1, float(i % 5)])
                for i, j in ((i, i) for i in range(120))]
    e = spark.createDataFrame(rnd_rows,
                              "vec_id long, embedding array<float>")

    index_dir = str(tmp_path / "ivf_auto")
    meta = ivf_build_index(e, index_dir, target_cell_size=30,
                           incremental=True)
    assert meta["auto_sized"] is True
    assert meta["n_cells"] == 4  # ceil(120 / 30)
    assert sum(meta["cell_counts"].values()) == 120
    assert meta["max_cell"] == max(meta["cell_counts"].values())

    # append maintains the histogram as an upper bound
    extra = spark.createDataFrame(
        [(1000 + i, [0.1, 0.0]) for i in range(40)],
        "vec_id long, embedding array<float>")
    ivf_append(spark, index_dir, extra)
    meta2 = ivf_load_meta(index_dir)
    assert sum(meta2["cell_counts"].values()) == 160
    assert meta2["max_cell"] >= meta["max_cell"]

    # the slab-budget warning fires from the artifact alone
    with _warnings.catch_warnings(record=True) as caught:
        _warnings.simplefilter("always")
        df = semdedup_indexed(spark, index_dir, threshold=0.99,
                              max_cell_warn=10)
        assert any("quadratic" in str(w.message) for w in caught)
    assert df.count() == 160
    # and stays silent under the default budget
    with _warnings.catch_warnings(record=True) as caught:
        _warnings.simplefilter("always")
        semdedup_indexed(spark, index_dir, threshold=0.99)
        assert not [w for w in caught if "quadratic" in str(w.message)]

    # drift retrain re-sizes: 160 rows / 30 -> 6 cells
    out = ivf_maybe_retrain(spark, index_dir, force=True)
    assert out["retrained"]
    meta3 = ivf_load_meta(index_dir)
    assert meta3["n_cells"] == 6
    assert meta3["auto_sized"] is True

    # an explicit n_cells build is NOT auto-sized and retrains at its
    # literal count (oracle-pinned twins depend on it)
    fixed_dir = str(tmp_path / "ivf_fixed")
    m = ivf_build_index(e, fixed_dir, n_cells=3, incremental=True)
    assert m["auto_sized"] is False and m["n_cells"] == 3
    ivf_maybe_retrain(spark, fixed_dir, force=True)
    assert ivf_load_meta(fixed_dir)["n_cells"] == 3


def test_substring_dedup_exactsubstr_semantics(spark):
    """ExactSubstr (Lee et al. 2022) contract: every >= k-token span
    duplicated anywhere in the corpus is spliced out EXCEPT the global
    first occurrence (lowest (doc_id, pos)); within-doc repeats count;
    docs shorter than k are never cut; untouched docs round-trip their
    normalized text."""
    from data_services_spark.operators.dedup import substring_dedup

    span = " ".join(f"s{i}" for i in range(6))
    docs = [
        (1, "alpha " + span + " beta"),           # first occ -> intact
        (2, "gamma delta " + span + " epsilon"),  # copy -> spliced
        (3, "unrelated words only here"),         # untouched
        (4, "x " + span + " y " + span + " z"),   # both occs later than 1
        (5, "tiny doc"),                          # < k tokens
    ]
    d = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r["doc_id"]: r for r in substring_dedup(d, k=4).collect()}
    assert out[1]["n_removed"] == 0
    assert out[1]["clean_text"] == "alpha " + span + " beta"
    assert out[2]["n_removed"] == 6
    assert out[2]["clean_text"] == "gamma delta epsilon"
    assert out[3]["n_removed"] == 0
    assert out[4]["n_removed"] == 12 and out[4]["clean_text"] == "x y z"
    assert out[5]["n_removed"] == 0 and out[5]["clean_text"] == "tiny doc"
    # longer-than-k shared spans vanish wholly: the 6-token span at k=4
    # is covered by its three 4-gram occurrences
    assert all(f"s{i}" not in out[2]["clean_text"] for i in range(6))
    # within-doc-only repetition: second occurrence cut, first kept
    d2 = spark.createDataFrame(
        [(7, "p q " + span + " r " + span + " t")],
        "doc_id long, text string")
    o2 = substring_dedup(d2, k=4).collect()[0]
    assert o2["clean_text"] == "p q " + span + " r t"
    # repartition-stable (pure function of the corpus)
    again = {r["doc_id"]: r["clean_text"]
             for r in substring_dedup(d.repartition(5), k=4).collect()}
    assert again == {k: v["clean_text"] for k, v in out.items()}


def test_substring_dedup_long_duplicated_doc_is_linear(spark):
    """Round-10 splice rewrite stress (r9 verdict What's-wrong #3): a
    long doc that is one giant duplicated span — the worst case for
    the old O(T x R) array_contains splice, where T = R = n_tokens put
    ~10^8 comparisons in one task — must now complete quickly AND
    exactly: the interval-merge splice is O(starts + survivors). 30k
    duplicated tokens under the old form is ~9x10^8 ops (minutes); the
    60s ceiling is far above the linear cost and far below quadratic.
    Also pins run-merge edge semantics: interleaved touching/adjacent
    duplicate runs inside one doc collapse to the right complement."""
    import time

    from data_services_spark.operators.dedup import substring_dedup

    n = 30_000
    body = " ".join(f"w{i}" for i in range(n))
    docs = [(1, body), (2, "lead " + body + " tail")]
    # NULL text: n_removed must be 0 (the oracle's COALESCE; round-10
    # review — the splice rewrite briefly returned NULL here)
    docs.append((3, None))
    d = spark.createDataFrame(docs, "doc_id long, text string")
    t0 = time.monotonic()
    out = {r["doc_id"]: r for r in substring_dedup(d, k=50).collect()}
    took = time.monotonic() - t0
    assert took < 60, f"splice no longer linear: {took:.1f}s"
    assert out[3]["n_removed"] == 0 and out[3]["n_tokens"] is None
    # doc 1 is the global first occurrence -> intact
    assert out[1]["n_removed"] == 0 and out[1]["n_tokens"] == n
    # doc 2's copy of the whole body vanishes; its unique frame stays
    assert out[2]["n_removed"] == n
    assert out[2]["clean_text"] == "lead tail"
    # adjacent + overlapping runs: two spans separated by ONE unique
    # token produce two removal runs whose gap survives exactly
    span = " ".join(f"s{i}" for i in range(60))
    d2 = spark.createDataFrame(
        [(10, span), (11, span + " mid " + span)],
        "doc_id long, text string")
    o2 = {r["doc_id"]: r for r in substring_dedup(d2, k=50).collect()}
    assert o2[10]["n_removed"] == 0
    assert o2[11]["clean_text"] == "mid" and o2[11]["n_removed"] == 120


def test_pq_train_empty_corpus_raises_clearly(spark):
    """pq_train on an empty corpus must raise a clear ValueError, not
    the opaque 'NoneType is not subscriptable' from .first() returning
    None (round-8 advice)."""
    import pytest as _pytest

    from data_services_spark.operators.similarity import pq_train

    empty = spark.createDataFrame(
        [], "vec_id long, embedding array<float>")
    with _pytest.raises(ValueError, match="empty corpus"):
        pq_train(empty, m=2, k=2)


def test_pq_roundtrip_reference_and_trained_recall(spark):
    """Product quantization: (a) fixed-codebook encoding equals a
    plain-numpy argmin reference per subspace; (b) ADC distances equal
    the LUT-sum reference; (c) TRAINED codebooks (pq_train, the
    production path) reconstruct a clustered corpus well enough that
    ADC top-10 overlaps exact-L2 top-10 at >= 6/10 and an exact
    duplicate of the query ranks first."""
    import random

    import numpy as np

    from data_services_spark.operators.similarity import (
        pq_adc_topk, pq_encode, pq_fixed_codebooks, pq_train,
    )

    dim, m, kk = 16, 4, 8
    rnd = random.Random(3)
    centers = [[rnd.gauss(0, 1) for _ in range(dim)] for _ in range(6)]
    rows = []
    for i in range(240):
        base = centers[i % 6]
        rows.append((i, [float(np.float32(x + rnd.gauss(0, 0.05)))
                         for x in base]))
    e = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    books = pq_fixed_codebooks(dim, m=m, k=kk, seed=7)
    got = {r["vec_id"]: [r[f"code{j}"] for j in range(m)]
           for r in pq_encode(e, books).collect()}
    arr = {i: np.array(np.array(v, dtype=np.float32), dtype=np.float64)
           for i, v in rows}
    dsub = dim // m
    for i, v in arr.items():
        for j in range(m):
            cb = np.array(books[j])
            # the engine's argmin key: |c|^2 - 2 c.x (same tie order)
            keys = (cb * cb).sum(axis=1) - 2.0 * (cb @ v[j*dsub:(j+1)*dsub])
            assert got[i][j] == int(np.argmin(keys)), (i, j)

    q = [0.25 * ((x % 7) - 3) for x in range(dim)]
    top = pq_adc_topk(e, q, books, k=5).collect()
    qv = np.array(q)
    for r in top:
        ref = 0.0
        for j in range(m):
            c = np.array(books[j][got[r["vec_id"]][j]])
            d = qv[j*dsub:(j+1)*dsub] - c
            ref += float(d @ d)
        assert abs(r["adist"] - ref) < 1e-9
    assert [r["rank"] for r in top] == [1, 2, 3, 4, 5]

    # trained path: PQ at 4 subspaces x 8 codes quantizes the 0.05-noise
    # cluster members to (near-)identical codes, so the resolvable
    # guarantee is CLUSTER-level retrieval: every ADC top-10 hit must
    # come from the query's own cluster (ids ≡ 7 mod 6), which also
    # means cluster-recall 10/10 vs exact L2 (whose top-10 is the same
    # cluster's nearest members).
    trained = pq_train(e, m=m, k=kk, seed=5)
    query = rows[7][1]
    exact = sorted(arr, key=lambda i: float(
        ((arr[i] - np.array(np.array(query, dtype=np.float32),
                            dtype=np.float64)) ** 2).sum()))[:10]
    assert all(i % 6 == 1 for i in exact)  # fixture sanity
    got_top = [r["vec_id"] for r in
               pq_adc_topk(e, [float(x) for x in query], trained,
                           k=10).collect()]
    assert all(i % 6 == 7 % 6 for i in got_top), got_top
    assert 7 in got_top or exact[0] in got_top


def test_ivf_pq_probe_consistent_with_full_adc(spark):
    """The IVF-PQ probe must (a) return EXACTLY the full-corpus ADC
    ranking restricted to the probed cells (pruning changes which rows
    are scored, never a survivor's distance), and (b) at nprobe = all
    cells, equal the full ADC top-k outright."""
    import random

    from data_services_spark.operators.similarity import (
        hyperplane_planes, ivf_pq_topk, pq_adc_topk, pq_fixed_codebooks,
    )

    dim = 16
    rnd = random.Random(9)
    rows = [(i, [rnd.gauss(0, 1) for _ in range(dim)]) for i in range(200)]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = hyperplane_planes(dim, 4, seed=3)
    books = pq_fixed_codebooks(dim, m=4, k=8, seed=7)
    q = [0.3 * ((x % 5) - 2) for x in range(dim)]

    full = {r["vec_id"]: r["adist"]
            for r in pq_adc_topk(e, q, books, k=200).collect()}
    probed = ivf_pq_topk(e, q, cents, books, k=10, nprobe=2).collect()
    assert len(probed) == 10
    for r in probed:
        assert abs(r["adist"] - full[r["vec_id"]]) < 1e-12

    # nprobe = all cells -> identical to the unpruned ADC top-k
    allcells = [(r["vec_id"], r["adist"]) for r in
                ivf_pq_topk(e, q, cents, books, k=10,
                            nprobe=len(cents)).collect()]
    ref = sorted(full.items(), key=lambda t: (t[1], t[0]))[:10]
    assert allcells == ref


def test_hashed_linear_score_weights_df_parity(spark):
    """The production weights-DataFrame path (broadcast-join scoring of
    a trained-model artifact) must be bit-identical to the zero-shuffle
    formula path on every column — the formula is only a stand-in for a
    model that arrives as data, so the two code paths are one contract."""
    from data_services_spark.operators.text import (
        _CLS_ADD, _CLS_MOD, _CLS_MULT, _CLS_SHIFT, hashed_linear_score,
    )

    docs = spark.createDataFrame(
        [(1, "the cat sat on the mat"),
         (2, "single"),
         (3, ""),                       # tokenize('') = [''] -> 1 token
         (4, "a b a b a b a b"),
         (5, "zz yy xx ww vv uu")],
        "doc_id long, text string")

    def wtab(n):
        rows = [(b, ((b * _CLS_MULT + _CLS_ADD) % _CLS_MOD) - _CLS_SHIFT)
                for b in range(n)]
        return spark.createDataFrame(rows, "bucket long, weight long")

    formula = {r["doc_id"]: r for r in hashed_linear_score(
        docs, n_buckets=64, n_pair_buckets=256, seed=7).collect()}
    joined = {r["doc_id"]: r for r in hashed_linear_score(
        docs, n_buckets=64, n_pair_buckets=256, seed=7,
        weights=wtab(64), pair_weights=wtab(256)).collect()}
    assert set(formula) == set(joined) == {1, 2, 3, 4, 5}
    for k in formula:
        assert tuple(formula[k]) == tuple(joined[k])
    # single-token docs have exactly 1 feature (no bigrams) on both paths
    assert formula[2]["n_features"] == 1
    assert formula[3]["n_features"] == 1


def test_hashed_linear_score_requires_pair_weights(spark):
    from data_services_spark.operators.text import hashed_linear_score
    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    w = spark.createDataFrame([(0, 1)], "bucket long, weight long")
    with pytest.raises(ValueError, match="pair_weights"):
        hashed_linear_score(docs, weights=w).collect()


def test_prefix_jaccard_matches_bruteforce(spark):
    """The prefix-filter theorem in practice: on a corpus where the
    all-token join would key on stopwords shared by EVERY doc, the
    prefix join must still return exactly the brute-force result set
    (no false negatives — the filter only prunes, the verify only
    confirms). Values compared exactly, pair by pair."""
    from data_services_spark.operators.dedup import (
        jaccard_pairs, prefix_jaccard_join,
    )

    rows = []
    # 20 near-dup pairs: base text + one substituted token
    for i in range(20):
        base = f"the of and a common{i} rare{i}a rare{i}b rare{i}c rare{i}d"
        rows.append((2 * i, base))
        rows.append((2 * i + 1, base.replace(f"rare{i}d", f"rare{i}e")))
    # plus docs sharing ONLY stopwords (never 0.8-similar)
    for i in range(10):
        rows.append((100 + i, f"the of and a unique{i}x unique{i}y"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    for t in (0.8, 0.5):
        brute = {(r["id_a"], r["id_b"]): (r["inter"], r["jaccard"])
                 for r in jaccard_pairs(docs, threshold=t).withColumn(
                     "inter", F.lit(None)).collect()}
        pref = {(r["id_a"], r["id_b"]): r
                for r in prefix_jaccard_join(docs, threshold=t).collect()}
        assert set(pref) == set(brute)
        for (ia, ib), r in pref.items():
            assert r["sz_a"] >= 1 and r["sz_b"] >= 1
            assert abs(r["jaccard"] - brute[(ia, ib)][1]) == 0.0
    # the 0.8 run finds exactly the 20 engineered near-dup pairs
    out = prefix_jaccard_join(docs, threshold=0.8).collect()
    assert {(r["id_a"], r["id_b"]) for r in out} \
        == {(2 * i, 2 * i + 1) for i in range(20)}


def test_prefix_jaccard_threshold_validation_and_release(spark):
    from data_services_spark.operators import dedup as dd

    docs = spark.createDataFrame([(1, "a b"), (2, "a b")],
                                 "doc_id long, text string")
    with pytest.raises(ValueError, match="threshold"):
        dd.prefix_jaccard_join(docs, threshold=0.0)
    dd.prefix_jaccard_join(docs).collect()
    dd.prefix_jaccard_join(docs).collect()   # second call evicts first
    assert len(dd._PJ_CACHE) == 1
    dd.prefix_jaccard_release()
    assert not dd._PJ_CACHE


def test_hashed_linear_score_sparse_weights_left_join(spark):
    """A sparse model export (buckets the trainer never saw are absent
    from the table) scores those features 0 WITHOUT dropping them from
    the mean's denominator — an inner join would silently shrink
    n_features' effective weight and shift every score."""
    from data_services_spark.operators.text import hashed_linear_score

    docs = spark.createDataFrame([(1, "aa bb cc")],
                                 "doc_id long, text string")
    empty_w = spark.createDataFrame([], "bucket long, weight long")
    r = hashed_linear_score(docs, n_buckets=8, n_pair_buckets=16, seed=7,
                            weights=empty_w,
                            pair_weights=empty_w).collect()[0]
    assert r["n_features"] == 5 and r["logit_sum"] == 0
    assert r["score"] == 0.0 and r["keep"] is False


def test_html_to_text_subtrees_entities_and_title(spark):
    """Extraction semantics that a bare tag-strip gets wrong: script
    CONTENT in the body must vanish (not just the tags), head metadata
    is not body text, '&amp;lt;' decodes to the literal '&lt;' (amp
    decoded LAST), and a title-less page yields an empty title."""
    from data_services_spark.operators.web import html_title, html_to_text

    pages = [
        (1, "<html><head><title>T &amp; t</title></head>"
            "<body>keep <script>var x = 'DROP';</script>me"
            "<style>p{color:red}</style> &amp;lt;tag&amp;gt; "
            "a&lt;b &#39;q&#39;</body></html>"),
        (2, "<body>no title here</body>"),
        (3, "plain text, no tags &amp; one entity"),
    ]
    df = spark.createDataFrame(pages, "doc_id long, page string")
    got = {r["doc_id"]: (r["t"], r["x"]) for r in df.select(
        "doc_id", html_title("page").alias("t"),
        html_to_text("page").alias("x")).collect()}
    assert got[1] == ("T & t", "keep me &lt;tag&gt; a<b 'q'")
    assert "DROP" not in got[1][1] and "color" not in got[1][1]
    assert got[2] == ("", "no title here")
    assert got[3] == ("", "plain text, no tags & one entity")


def test_canonicalize_url_rules(spark):
    from data_services_spark.operators.web import (
        canonicalize_url, url_domain,
    )

    urls = [
        (1, "HTTP://Example.COM:80/a/b/../c?z=1&utm_x=2&a=3#f"),
        (2, "https://example.com/plain"),              # nothing to do
        (3, "https://other.example.com:8443/x?utm_only=1"),
        (4, "http://example.com/1/2/3/../../../deep"),  # 3 levels, <= 4-pass bound
        (5, "https://EXAMPLE.com/Case/Sensitive?B=2&a=1"),
    ]
    df = spark.createDataFrame(urls, "i long, url string")
    got = {r["i"]: (r["c"], r["d"]) for r in df.select(
        "i", canonicalize_url("url").alias("c"),
        url_domain(canonicalize_url("url")).alias("d")).collect()}
    assert got[1] == ("http://example.com/a/c?a=3&z=1", "example.com")
    assert got[2] == ("https://example.com/plain", "example.com")
    # non-default port kept; utm-only query collapses entirely
    assert got[3] == ("https://other.example.com:8443/x",
                      "example.com")
    assert got[4] == ("http://example.com/deep", "example.com")
    # path/query case preserved, host lowered, params sorted
    assert got[5] == ("https://example.com/Case/Sensitive?B=2&a=1",
                      "example.com")


def test_project_embeddings_matches_sequential_reference(spark):
    """Each projection is a flat LEFT-ASSOCIATED sum of float64
    products, so a plain Python loop over the same floats is the exact
    bit-level reference (same IEEE ops in the same order) — asserted
    with ==, no tolerance."""
    import random

    from data_services_spark.operators.similarity import (
        hyperplane_planes, project_embeddings,
    )

    dim, k = 16, 5
    planes = hyperplane_planes(dim, k, seed=3)
    rnd = random.Random(1)
    rows = [(i, [rnd.uniform(-1, 1) for _ in range(dim)])
            for i in range(50)]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {r["vec_id"]: [r[f"p{j}"] for j in range(k)]
           for r in project_embeddings(e, planes).collect()}
    import struct
    f32 = lambda x: struct.unpack("f", struct.pack("f", x))[0]
    for i, vec in rows:
        for j in range(k):
            acc = f32(vec[0]) * planes[j][0]
            for d in range(1, dim):
                acc = acc + f32(vec[d]) * planes[j][d]
            assert got[i][j] == acc, (i, j)


def test_prefix_jaccard_nonterminating_threshold_no_overflow(spark):
    """threshold=1/3 (a float with no short decimal form) must not
    overflow the integer prefix/verify arithmetic on large documents —
    the rational is bounded via limit_denominator(1000). 3000 distinct
    tokens would overflow BIGINT with the raw 16-digit fraction
    (confirmed ARITHMETIC_OVERFLOW before the fix)."""
    from data_services_spark.operators.dedup import prefix_jaccard_join

    big = " ".join(f"tok{i}" for i in range(3000))
    docs = spark.createDataFrame(
        [(1, big), (2, big + " extra0 extra1 extra2")],
        "doc_id long, text string")
    out = prefix_jaccard_join(docs, threshold=1 / 3).collect()
    assert {(r["id_a"], r["id_b"]) for r in out} == {(1, 2)}
    assert out[0]["inter"] == 3000


def test_hashed_linear_score_null_text_row_parity(spark):
    """NULL text: BOTH paths keep the document with NULL outputs — the
    weights path's explode used to drop the row entirely (review
    finding, confirmed)."""
    from data_services_spark.operators.text import (
        _CLS_ADD, _CLS_MOD, _CLS_MULT, _CLS_SHIFT, hashed_linear_score,
    )

    docs = spark.createDataFrame([(1, "a b"), (2, None)],
                                 "doc_id long, text string")
    wtab = spark.createDataFrame(
        [(b, ((b * _CLS_MULT + _CLS_ADD) % _CLS_MOD) - _CLS_SHIFT)
         for b in range(64)], "bucket long, weight long")
    formula = {r["doc_id"]: tuple(r) for r in hashed_linear_score(
        docs, n_buckets=64, n_pair_buckets=64, seed=7).collect()}
    joined = {r["doc_id"]: tuple(r) for r in hashed_linear_score(
        docs, n_buckets=64, n_pair_buckets=64, seed=7,
        weights=wtab, pair_weights=wtab).collect()}
    assert set(formula) == set(joined) == {1, 2}
    assert formula == joined
    assert formula[2][1] is None and formula[2][4] is None


def test_canonicalize_url_strips_whitespace_first(spark):
    """A trailing newline (unstripped crawl field) must not change the
    result vs the clean URL — and must not diverge between Java-regex
    '$' (matches before a trailing newline) and RE2 '$' (does not);
    stripping whitespace first removes the ambiguity entirely."""
    from data_services_spark.operators.web import canonicalize_url

    urls = [(1, "http://example.com/p?b=2#f"),
            (2, "http://example.com/p?b=2#f\n"),
            (3, " http://example.com/p\t?b=2#f \n")]
    df = spark.createDataFrame(urls, "i long, url string")
    got = {r["i"]: r["c"] for r in
           df.select("i", canonicalize_url("url").alias("c")).collect()}
    assert got[1] == got[2] == got[3] == "http://example.com/p?b=2"


def test_hashed_linear_score_extra_cols_pass_through_both_paths(spark):
    from data_services_spark.operators.text import (
        _CLS_ADD, _CLS_MOD, _CLS_MULT, _CLS_SHIFT, hashed_linear_score,
    )

    docs = spark.createDataFrame([(1, "a b", "d1"), (2, "c", "d2")],
                                 "doc_id long, text string, meta string")
    wtab = spark.createDataFrame(
        [(b, ((b * _CLS_MULT + _CLS_ADD) % _CLS_MOD) - _CLS_SHIFT)
         for b in range(32)], "bucket long, weight long")
    a = {r["doc_id"]: (r["meta"], r["logit_sum"]) for r in
         hashed_linear_score(docs, n_buckets=32, n_pair_buckets=32,
                             seed=7, extra_cols=("meta",)).collect()}
    b = {r["doc_id"]: (r["meta"], r["logit_sum"]) for r in
         hashed_linear_score(docs, n_buckets=32, n_pair_buckets=32,
                             seed=7, weights=wtab, pair_weights=wtab,
                             extra_cols=("meta",)).collect()}
    assert a == b and a[1][0] == "d1" and a[2][0] == "d2"


def test_image_near_dup_one_slot_cache_contract(spark):
    """The round-10 persist: each image_near_dup call holds at most
    ONE cached hash relation (the bm25/bigram one-slot contract) — a
    second call releases the first call's blocks, and the explicit
    release drops the last; results stay correct either way."""
    from data_services_spark.operators.multimodal import (
        _NEAR_DUP_CACHE, encode_png_gray, image_dhash, image_near_dup,
        image_near_dup_release,
    )

    def img(seed):
        px = [[(r * 7 + c * 13 + seed) % 256 for c in range(9)]
              for r in range(8)]
        return encode_png_gray(px)

    rows = [(i, img(i // 2)) for i in range(6)]  # 3 near-identical pairs
    d = spark.createDataFrame(rows, "doc_id long, payload binary")
    h = image_dhash(d)
    out1 = {(r.id_a, r.id_b) for r in
            image_near_dup(h, max_hamming=3).collect()}
    assert len(_NEAR_DUP_CACHE) == 1
    first = _NEAR_DUP_CACHE[0]
    out2 = {(r.id_a, r.id_b) for r in
            image_near_dup(image_dhash(d), max_hamming=3).collect()}
    assert out2 == out1 >= {(0, 1), (2, 3), (4, 5)}
    assert len(_NEAR_DUP_CACHE) == 1 and _NEAR_DUP_CACHE[0] is not first
    image_near_dup_release()
    assert not _NEAR_DUP_CACHE
    image_near_dup_release()  # idempotent on an empty slot


def test_prefix_jaccard_threshold_snap_warns(spark):
    """Round-10 advice: a threshold the den<=1000 rational snap MOVES
    warns (naming both values); practical thresholds pass silently."""
    import warnings

    from data_services_spark.operators.dedup import prefix_jaccard_join

    d = spark.createDataFrame([(1, "a b c"), (2, "a b d")],
                              "doc_id long, text string")
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # any warning fails the build
        prefix_jaccard_join(d, threshold=0.8)
        prefix_jaccard_join(d, threshold=1 / 3)
    with pytest.warns(UserWarning, match="snapped to"):
        prefix_jaccard_join(d, threshold=0.80005)


def test_hashed_linear_score_enforces_integer_unique_weights(spark):
    """Round-10 advice gate: a float model export must raise (the long
    cast would silently truncate and flip logits), and duplicate
    bucket ids must raise (each extra row multiplies its feature
    through the broadcast join)."""
    from data_services_spark.operators.text import hashed_linear_score

    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    ok = spark.createDataFrame([(0, 1)], "bucket long, weight long")
    frac = spark.createDataFrame([(0, 1.5)], "bucket long, weight double")
    dup = spark.createDataFrame([(0, 1), (0, 2)],
                                "bucket long, weight long")
    with pytest.raises(ValueError, match="fractional"):
        hashed_linear_score(docs, weights=frac, pair_weights=ok)
    with pytest.raises(ValueError, match="duplicate bucket"):
        hashed_linear_score(docs, weights=dup, pair_weights=ok)
    with pytest.raises(ValueError, match="fractional"):
        hashed_linear_score(docs, weights=ok, pair_weights=frac)
    # integral DOUBLES are fine (a model exported as float but holding
    # integer values scores identically, no false rejection)
    intish = spark.createDataFrame([(0, 2.0)], "bucket long, weight double")
    hashed_linear_score(docs, weights=intish, pair_weights=ok).collect()
    # round-10 review corners: NULL weights must raise (NULL != NULL is
    # NULL, so a plain inequality gate passes them and coalesce zeroes
    # the feature silently); NULL bucket ids must raise AS null-bucket,
    # not masquerade as "duplicates"
    nullw = spark.createDataFrame([(0, None)], "bucket long, weight long")
    with pytest.raises(ValueError, match="NULL or fractional"):
        hashed_linear_score(docs, weights=nullw, pair_weights=ok)
    nullb = spark.createDataFrame([(None, 1), (None, 2)],
                                  "bucket long, weight long")
    with pytest.raises(ValueError, match="NULL bucket"):
        hashed_linear_score(docs, weights=nullb, pair_weights=ok)


def test_min_k_per_group_scalable_matches_window_form(spark):
    """W4's skew-safe twin: same rows as the row_number window form,
    on every partition layout (the partial pass keys on the physical
    partition id, so the INTERMEDIATE varies with layout — the RESULT
    must not), hot key included."""
    import pyspark.sql.functions as F

    from data_services_spark.operators.windows import (
        min_k_per_group_scalable, top_k_per_group,
    )

    rows = [(f"g{i % 7}", i) for i in range(500)]
    rows += [("hot", 1000 + i) for i in range(3000)]  # one skewed group
    d = spark.createDataFrame(rows, "grp string, doc_id long")
    want = {(r["grp"], r["doc_id"]) for r in top_k_per_group(
        d, ["grp"], [F.col("doc_id")], 25).drop("rn").collect()}
    for parts in (1, 4, 32):
        got = {(r["grp"], r["doc_id"]) for r in min_k_per_group_scalable(
            d.repartition(parts), "grp", "doc_id", 25).collect()}
        assert got == want, parts
    # k larger than every group: identity
    small = spark.createDataFrame([("a", 1), ("a", 2), ("b", 3)],
                                  "grp string, doc_id long")
    assert min_k_per_group_scalable(small, "grp", "doc_id", 10).count() == 3
    with pytest.raises(ValueError, match="k must be"):
        min_k_per_group_scalable(small, "grp", "doc_id", 0)
    # a NULL group IS a group and caps at k (round-10 review: the semi
    # join must be null-safe on the group key or NULL-group rows vanish)
    nulls = spark.createDataFrame(
        [(None, 1), (None, 2), (None, 3), ("a", 4)],
        "grp string, doc_id long")
    got = {(r["grp"], r["doc_id"]) for r in
           min_k_per_group_scalable(nulls, "grp", "doc_id", 2).collect()}
    assert got == {(None, 1), (None, 2), ("a", 4)}


def test_html_to_text_sequential_pass_order_on_crossed_tags(spark):
    """Regression pin (round 12): head/script/style removal is THREE
    SEQUENTIAL passes, not one fused alternation — on crossed or
    malformed tag spans the two orders diverge, and the DuckDB oracle
    replays the sequential order. A fused leftmost-opener pass would
    turn the first fixture into 'X C D'."""
    from data_services_spark.operators.web import html_to_text

    cases = [
        # crossed script/head spans: head pass runs FIRST
        ("X<script>A<head>B</script>C</head>D", "X A D"),
        # crossed style/head: same order contract
        ("pre<style>s1<head>h</style>mid</head>post", "pre s1 post"),
        # well-formed nesting: orders agree (sanity)
        ("<head><style>x</style>t</head>body", "body"),
    ]
    d = spark.createDataFrame(
        [(i, h) for i, (h, _) in enumerate(cases)],
        "i long, page string")
    got = {r["i"]: r["t"]
           for r in d.select("i", html_to_text("page").alias("t")).collect()}
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, (i, got[i], want)
