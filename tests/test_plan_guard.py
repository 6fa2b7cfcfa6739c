"""Plan-regression guard for the headline queries (round-5 verdict ask
#8): correctness sweeps catch wrong VALUES; this file catches wrong
PLANS — a pushed filter silently dropping off a scan, a broadcast dim
join decaying to a shuffle join, an unplanned Cartesian, a Python
boundary appearing in a pure-JVM query, or a full table funneling
through a single-partition sort. Each would keep every oracle green
while quietly breaking the 100 TB posture, so CI pins the plan facts
the per-round PLANS.md audit reads off.

Facts are extracted exactly the way tools/plan_audit.py does (same
regexes over the formatted plan + post-AQE executed plan) at sf0.01 —
large enough that join-strategy choices match the bench, small enough
to execute in seconds.
"""

from __future__ import annotations

import re

import pytest

SF_DIR = "/root/testdata/sf0.01"

# name -> invariants. Semantics:
#   scans: exact parquet-scan count (a new scan = a new data pass)
#   pushed_min: at least this many scans carry pushed filters
#   joins: exact set of join algorithms allowed in the plan
#   exchanges_max: post-AQE shuffle-exchange ceiling
#   single_max: post-AQE Exchange SinglePartition ceiling (the scalable
#     decompositions legitimately single-partition their per-bucket
#     OFFSETS — tiny aggregated rows — never the main table; the
#     distribution test below proves the main table never funnels)
#   py: exact count of Python/Arrow boundary operators
EXPECTED = {
    "q1_pricing_summary": dict(scans=1, pushed_min=1, joins=set(),
                               exchanges_max=1, single_max=0, py=0),
    "q3_shipping_priority": dict(scans=3, pushed_min=3,
                                 joins={"BroadcastHashJoin"},
                                 exchanges_max=1, single_max=0, py=0),
    # complete TPC-H shape set (facts collected at sf0.01, round 5).
    # q2's SortMergeJoin is the post-aggregate min-cost join (both sides
    # derived, size estimates unknown — a legitimate shuffle join; AQE
    # may still convert it at runtime); the BroadcastNestedLoopJoins in
    # q11/q22 are 1-row scalar-threshold broadcasts, not data joins.
    "q2_min_cost_supplier": dict(
        scans=10, pushed_min=10,
        joins={"BroadcastHashJoin", "SortMergeJoin"},
        exchanges_max=4, single_max=0, py=0),
    "q4_order_priority": dict(scans=2, pushed_min=2,
                              joins={"BroadcastHashJoin"},
                              exchanges_max=1, single_max=0, py=0),
    "q5_region_revenue": dict(scans=6, pushed_min=6,
                              joins={"BroadcastHashJoin"},
                              exchanges_max=1, single_max=0, py=0),
    "q6_forecast_revenue": dict(scans=1, pushed_min=1, joins=set(),
                                exchanges_max=1, single_max=1, py=0),
    "q7_nation_volume": dict(scans=6, pushed_min=6,
                             joins={"BroadcastHashJoin"},
                             exchanges_max=1, single_max=0, py=0),
    "q8_market_share": dict(scans=8, pushed_min=8,
                            joins={"BroadcastHashJoin"},
                            exchanges_max=1, single_max=0, py=0),
    "q9_nation_profit": dict(scans=5, pushed_min=5,
                             joins={"BroadcastHashJoin"},
                             exchanges_max=1, single_max=0, py=0),
    "q10_returned_items": dict(scans=4, pushed_min=4,
                               joins={"BroadcastHashJoin"},
                               exchanges_max=1, single_max=0, py=0),
    "q11_important_parts": dict(scans=2, pushed_min=0,
                                joins={"BroadcastNestedLoopJoin"},
                                exchanges_max=3, single_max=1, py=0),
    "q12_priority_lines": dict(scans=2, pushed_min=2,
                               joins={"BroadcastHashJoin"},
                               exchanges_max=1, single_max=0, py=0),
    "q13_order_histogram": dict(scans=2, pushed_min=1,
                                joins={"BroadcastHashJoin"},
                                exchanges_max=2, single_max=0, py=0),
    "q14_promo_revenue": dict(scans=2, pushed_min=2,
                              joins={"BroadcastHashJoin"},
                              exchanges_max=1, single_max=1, py=0),
    "q15_top_supplier": dict(scans=3, pushed_min=3,
                             joins={"BroadcastHashJoin"},
                             exchanges_max=3, single_max=1, py=0),
    "q16_supplier_variety": dict(scans=2, pushed_min=2,
                                 joins={"BroadcastHashJoin"},
                                 exchanges_max=2, single_max=0, py=0),
    "q17_small_qty": dict(scans=2, pushed_min=2,
                          joins={"BroadcastHashJoin"},
                          exchanges_max=2, single_max=1, py=0),
    "q18_large_volume": dict(scans=3, pushed_min=3,
                             joins={"BroadcastHashJoin"},
                             exchanges_max=1, single_max=0, py=0),
    "q19_disjunctive": dict(scans=2, pushed_min=2,
                            joins={"BroadcastHashJoin"},
                            exchanges_max=1, single_max=1, py=0),
    "q20_excess_stock": dict(scans=5, pushed_min=5,
                             joins={"BroadcastHashJoin"},
                             exchanges_max=2, single_max=0, py=0),
    "q21_blocked_suppliers": dict(scans=4, pushed_min=4,
                                  joins={"BroadcastHashJoin"},
                                  exchanges_max=1, single_max=0, py=0),
    "q22_lost_customers": dict(
        scans=3, pushed_min=3,
        joins={"BroadcastHashJoin", "BroadcastNestedLoopJoin"},
        exchanges_max=2, single_max=1, py=0),
    "kgx_edge_merge": dict(scans=1, pushed_min=0, joins=set(),
                           exchanges_max=1, single_max=0, py=0),
    "kgx_node_merge": dict(scans=3, pushed_min=1, joins=set(),
                           exchanges_max=1, single_max=0, py=0),
    "window_running_sum": dict(scans=1, pushed_min=0, joins=set(),
                               exchanges_max=1, single_max=0, py=0),
    # tumbling_window (round-9): the single-SQL date_trunc form has NO
    # pushed filter — the old F.window() form pushed an isnotnull(ts)
    # the QUERY never asked for (it silently dropped NULL-ts rows,
    # diverging from the oracle's NULL-keeping GROUP BY; green only
    # because the fixture has no NULL ts). No filter is correct here.
    "tumbling_window": dict(scans=1, pushed_min=0, joins=set(),
                            exchanges_max=1, single_max=0, py=0),
    "knn_cosine": dict(scans=1, pushed_min=1, joins=set(),
                       exchanges_max=0, single_max=0, py=0),
    # two-pass prefix-sum consumers: the 1-row stats broadcast is a
    # BroadcastNestedLoopJoin by Spark's classification of a crossJoin,
    # and the offsets branch legitimately single-partitions tiny rows
    "running_sum_scalable": dict(
        scans=4, pushed_min=0,
        joins={"BroadcastHashJoin", "BroadcastNestedLoopJoin"},
        exchanges_max=4, single_max=2, py=0),
    "token_packing": dict(
        scans=4, pushed_min=0,
        joins={"BroadcastHashJoin", "BroadcastNestedLoopJoin"},
        exchanges_max=4, single_max=2, py=0),
    "length_batching": dict(
        scans=5, pushed_min=0,
        joins={"BroadcastHashJoin", "BroadcastNestedLoopJoin"},
        exchanges_max=6, single_max=3, py=0),
    # round-6 additions. source_mixture's single-partition exchange is
    # the S-row per-source window (w_sum), never the corpus;
    # embedding_quantize must stay a map-only projection; ann's two
    # scans are the corpus probe + the 1-row query branch, zero
    # shuffles (TakeOrdered merges driver-side).
    "source_mixture": dict(scans=2, pushed_min=1,
                           joins={"BroadcastHashJoin"},
                           exchanges_max=2, single_max=1, py=0),
    "embedding_quantize": dict(scans=1, pushed_min=0, joins=set(),
                               exchanges_max=0, single_max=0, py=0),
    "ann_lsh_topk": dict(scans=2, pushed_min=2,
                         joins={"BroadcastHashJoin"},
                         exchanges_max=0, single_max=0, py=0),
    # zorder_cluster: one lineitem scan + the broadcast 1-row min/max
    # aggregate (single-partition final agg) NLJ'd back; the interleave
    # itself must stay a map-side projection with zero Python.
    "zorder_cluster": dict(scans=2, pushed_min=0,
                           joins={"BroadcastNestedLoopJoin"},
                           exchanges_max=1, single_max=1, py=0),
    # winnowing: the fingerprint projection is zero-shuffle map-only
    # (and zero Python — higher-order array funcs, staged so the
    # interpreted lambdas never re-inline, dedup.py); the pairs query
    # (round 13) persists the inverted index ONE-SLOT MEMORY_ONLY, so
    # the per-character md5 fold runs ONCE — scans=1 (was 4: max-df
    # keep + both join sides + fps each re-derived the corpus), the
    # other reads are InMemoryTableScans. pushed_min drops to 0 with
    # the scans it sat on; the 3 exchanges are the cached index's
    # explode groupBy + the keep aggregate + the final pair groupBy.
    # Still broadcast-joins the tiny index; the corpus never funnels
    # through a single partition.
    "winnow_fingerprint": dict(scans=1, pushed_min=0, joins=set(),
                               exchanges_max=0, single_max=0, py=0),
    "winnow_pairs": dict(scans=1, pushed_min=0,
                         joins={"BroadcastHashJoin"},
                         exchanges_max=3, single_max=0, py=0),
    # row-form winnowing: gram explode + frame-spec window min — one
    # doc_id shuffle, everything codegen'd, no arrays, no Python.
    "winnow_rows": dict(scans=1, pushed_min=0, joins=set(),
                        exchanges_max=1, single_max=0, py=0),
    # round-7 additions, round-13 shape: semdedup now MATERIALIZES the
    # centroid assignment once (one-slot MEMORY_ONLY — the "100 TB run
    # materializes the assignment once" posture the round-7 comment
    # prescribed), so the k x dim fold runs ONCE: 2 parquet scans (the
    # corpus + injected-copies branches feeding the materialization),
    # every other read an InMemoryTableScan. The widen guard's
    # round-robin exchange (193 KB sf0.01 input is over the 128 KB
    # chain gate) is the 1 exchange; the cell self-join stays SMJ over
    # the cached relation and must never be a Cartesian. dsir's scoring
    # pass must stay JOIN-FREE: the bucket models enter as literal map
    # lookups (the join formulation measured 10x slower at sf1 —
    # nested-loop total attachments broke codegen over the exploded
    # token stream), so the plan is one persisted token-stream scan
    # feeding the per-doc aggregate.
    "semdedup": dict(scans=2, pushed_min=1,
                     joins={"BroadcastHashJoin", "SortMergeJoin"},
                     exchanges_max=2, single_max=0, py=0),
    "dsir_weights": dict(scans=1, pushed_min=0, joins=set(),
                         exchanges_max=1, single_max=0, py=0),
    # round-8: the selection step inherits the join-free scoring pass;
    # the top-k must plan as TakeOrderedAndProject (per-partition heads
    # + driver merge of k x partitions rows — asserted separately
    # below), never a global sort exchange.
    "dsir_resample": dict(scans=1, pushed_min=0, joins=set(),
                          exchanges_max=1, single_max=0, py=0),
    # round-8/9: BM25 — ONE parquet scan: the per-doc tf/length fold
    # persists (one-slot MEMORY_ONLY, bm25_release device, round-9 —
    # the r8 form re-tokenized the corpus for the stats branch), so
    # the stats aggregate and the scoring branch are both
    # InMemoryTableScans of the same materialization. The stats
    # broadcast is the documented tiny-agg BNLJ crossJoin, the only
    # exchange is the 1-row SinglePartition agg, and the ranking is
    # TakeOrderedAndProject (pinned below with dsir_resample's).
    "bm25_topk": dict(scans=1, pushed_min=0,
                      joins={"BroadcastNestedLoopJoin"},
                      exchanges_max=1, single_max=1, py=0),
    # round-8: hashed bigram LM — ONE parquet scan: the bigram stream
    # persists (one-slot MEMORY_ONLY, bigram_release device) and the
    # two bounded model fits (<= 256 / 65536 rows, map-side combined)
    # plus the scoring branch all read the cached materialization
    # (3 InMemoryTableScans, 1 Scan parquet). Both models re-enter via
    # broadcast HASH joins (never a literal 65k-entry map, never a
    # 1-row BNLJ); exchanges are the two tiny model aggs + the per-doc
    # aggregate, nothing single-partition, nothing Python.
    "lm_bigram_logprob": dict(scans=1, pushed_min=0,
                              joins={"BroadcastHashJoin"},
                              exchanges_max=3, single_max=0, py=0),
    # round-8 PQ: encoding is a pure map-only projection (codes unroll
    # as literal-fold argmins in one scan, zero exchanges); the ADC
    # probe scores codes against a literal LUT and TakeOrderedAndProject
    # merges k rows driver-side (the row_number over the k-row result
    # is post-AQE windowing of 10 rows, not an exchange).
    "pq_encode": dict(scans=1, pushed_min=0, joins=set(),
                      exchanges_max=0, single_max=0, py=0),
    "pq_adc_topk": dict(scans=1, pushed_min=0, joins=set(),
                        exchanges_max=0, single_max=0, py=0),
    # the IVF-PQ probe composes cell pruning + ADC scoring in the SAME
    # single map-only pass: still one scan, no joins, no exchanges —
    # the nprobe cells are literal ints chosen driver-side.
    "ivf_pq_topk": dict(scans=1, pushed_min=0, joins=set(),
                        exchanges_max=0, single_max=0, py=0),
    # round-9 ExactSubstr: the dup-grams table (count>1 only) and the
    # per-doc removal sets are both tiny relative to the corpus, so
    # both re-entries broadcast; the two exchanges are the map-side-
    # combined gram groupBy (the skew-proof choice over a gram window)
    # and the per-doc removal groupBy. Zero Python; the corpus never
    # single-partitions. 3 scans = gram derivation x2 (dup-detect +
    # join-back) + the splice branch.
    "substring_dedup": dict(scans=3, pushed_min=0,
                            joins={"BroadcastHashJoin"},
                            exchanges_max=2, single_max=0, py=0),
    # round-9 image hashing: the TWO Arrow boundaries per pipeline
    # (synth/encode + decode/dhash) are the DESIGNED Python surface of
    # L6/L18 — py is pinned exact so a third boundary (or an
    # accidental row-wise UDF) fails loudly. near_dup (round-10 fix):
    # the dHash relation is PERSISTED (one-slot) before the band
    # self-join, so the decode pipeline runs ONCE — 2 parquet scans
    # (corpus + jitter branch feeding the single materialization),
    # both join sides InMemoryTableScans. py=4 here is a PRINT
    # artifact: InMemoryTableScan lists its cached plan as
    # innerChildren, so the 2 logical Arrow ops appear under BOTH
    # scans of the cache; test_image_near_dup_single_decode_pass
    # below walks the REAL executed tree (children only) and asserts
    # ZERO Arrow ops outside the cached relation.
    "image_phash": dict(scans=1, pushed_min=0, joins=set(),
                        exchanges_max=0, single_max=0, py=2),
    "image_near_dup": dict(scans=2, pushed_min=1,
                           joins={"BroadcastHashJoin"},
                           exchanges_max=2, single_max=0, py=4),
    # round-9 quality classifier: the whole scoring pass (word + bigram
    # hashed-feature folds, weight formula, logit, decision) is per-row
    # aggregate HOFs in ONE map-only scan — zero exchanges, zero joins,
    # zero Python. The classifier adds NO shuffle to a 100 TB corpus.
    "quality_classifier": dict(scans=1, pushed_min=0, joins=set(),
                               exchanges_max=0, single_max=0, py=0),
    # round-9 PPJoin: the df-ordered per-doc array relation persists
    # (one-slot MEMORY_ONLY, prefix_jaccard_release device) so the
    # prefix explode and both verify sides read ONE materialization —
    # 2 parquet scans (token-df fit + array build), not the 8 measured
    # without the cache. Candidate and verify joins broadcast at this
    # scale; the exchanges are the df groupBy + the per-doc array
    # groupBy; zero Python.
    "jaccard_prefix_join": dict(scans=2, pushed_min=0,
                                joins={"BroadcastHashJoin"},
                                exchanges_max=2, single_max=0, py=0),
    # round-14 int-proxy rewrite (guide §2.3): ONE widened lineitem scan
    # feeds both typed edge legs through the shared (s,p,o)-proxy
    # distinct (was one scan per leg = 5 scans; now lineitem + part +
    # the broadcast mid = 3), the mid constraint pushes to the part
    # scan (pushed_min=3 keeps the attribute filter), both path joins
    # broadcast at this scale, and the exchanges are the keyed widen
    # (reused by the distinct) + the three-level count-distinct
    # aggregate's expands. Zero Python, strings built per OUTPUT group.
    "kgx_two_hop": dict(scans=3, pushed_min=3,
                        joins={"BroadcastHashJoin"},
                        exchanges_max=4, single_max=0, py=0),
    # round-9 negative sampling: the bucket-representative table is a
    # groupBy of the node relation down to <= 1024 rows; its dense rank
    # is a window over those few rows (the tiny-aggregate
    # single-partition exemption — bounded by the n_buckets KNOB, never
    # by the corpus; the two SinglePartition exchanges are that window
    # + the 1-row rep count) and both re-enter via broadcast (the count
    # as the documented 1-row BNLJ). The edge stream itself never
    # shuffles for the draw; exchanges: edge distinct + node
    # distinct/groupBy + the two tiny singles. Zero Python, and no
    # global NODE indexing (the corpus-sized single-partition
    # row_number this design exists to avoid).
    "kg_negative_sample": dict(scans=4, pushed_min=0,
                               joins={"BroadcastHashJoin",
                                      "BroadcastNestedLoopJoin"},
                               exchanges_max=6, single_max=2, py=0),
    # round-10 BPE: the whole tokenizer (normalize + delimiter render
    # + the full merge-table replace chain + delimiter arithmetic) is
    # ONE map-only scan — zero exchanges, zero joins, zero Python; at
    # 100 TB it rides whatever scan feeds it. The packing variant
    # inherits token_packing's scalable two-pass prefix-sum shape
    # unchanged (the tokenizer swap adds NO exchange).
    "bpe_tokenize": dict(scans=1, pushed_min=0, joins=set(),
                         exchanges_max=0, single_max=0, py=0),
    # round-11 learned-table twin: training happens at plan-BUILD time
    # (bounded driver artifact, memoized per session); the SCORING plan
    # this pins is the same map-only replace chain as bpe_tokenize.
    "bpe_tokenize_trained": dict(scans=1, pushed_min=0, joins=set(),
                                 exchanges_max=0, single_max=0, py=0),
    # round-12 real-vocabulary form: ONE scan feeding ONE Arrow
    # mapInPandas kernel (the py=1 is the design, not a leak — the
    # merge loop must run in Python to stay flat in merge-table size);
    # still zero exchanges/joins at pinned small-sf shape (the widen
    # guard adds its round-robin exchange only past the size
    # threshold, pinned separately in test_widen.py).
    "bpe_tokenize_dict": dict(scans=1, pushed_min=0, joins=set(),
                              exchanges_max=0, single_max=0, py=1),
    # round-11: the (doc_id, n_tokens) projection persists one-slot
    # (sampling._PACK_CACHE) before the prefix-sum machinery, so the
    # ~R-pass BPE replace chain executes ONCE — exactly one parquet
    # scan; every other branch reads 16-byte cached rows (r10 verdict
    # What's-wrong #1: the unpersisted plan re-tokenized the corpus on
    # 4 scans). The +1 exchange/single vs token_packing is the second
    # 1-row min/max bounds agg: the cached relation's two stats
    # subtrees no longer canonicalize to one ReusedExchange — a 1-row
    # stage, while the win is N fewer full-corpus tokenizations.
    "token_packing_bpe": dict(
        scans=1, pushed_min=0,
        joins={"BroadcastHashJoin", "BroadcastNestedLoopJoin"},
        exchanges_max=5, single_max=3, py=0),
    # round-12 composition twin: identical packing machinery fed by
    # the Arrow kernel's counts. scans=1 as in token_packing_bpe (the
    # one-slot persist); py=4 is TEXTUAL duplication of the cached
    # kernel subtree across the prefix-sum branches — the EXECUTED
    # kernel runs once (the cache materializes on the first branch;
    # the same textual-vs-executed distinction token_packing_bpe's
    # r11 scans note documents), pinned so a second REAL Python
    # boundary appearing would still fail loudly.
    "token_packing_dict": dict(
        scans=1, pushed_min=0,
        joins={"BroadcastHashJoin", "BroadcastNestedLoopJoin"},
        exchanges_max=5, single_max=3, py=4),
    # the subword vocab audit: explode rides the scan, ONE groupBy
    # exchange, top-k via TakeOrderedAndProject (asserted with the
    # dsir/bm25 pin below), zero Python.
    "vocab_topk_bpe": dict(scans=1, pushed_min=0, joins=set(),
                           exchanges_max=1, single_max=0, py=0),
    # BPE-windowed RAG chunking: the subword stream + the window
    # explode fuse into the one scan — fully map-side, like doc_chunks.
    "doc_chunks_bpe": dict(scans=1, pushed_min=0, joins=set(),
                           exchanges_max=0, single_max=0, py=0),
    # fertility-by-language: lang argmax + both token counts ride ONE
    # map-only projection (lang_id extra_cols — no join re-attaches
    # counts), then one tiny <=5-row groupBy exchange. Zero Python.
    "bpe_fertility": dict(scans=1, pushed_min=0, joins=set(),
                          exchanges_max=1, single_max=0, py=0),
    # per-domain cap on the skew-safe two-pass bottom-k: the partial
    # (group, partition-id) groupBy + the <=k x P re-group are the two
    # exchanges, the kept-keys relation broadcasts into the semi join,
    # and NO window ever funnels a hot domain through one task.
    "domain_cap": dict(scans=2, pushed_min=0,
                       joins={"BroadcastHashJoin"},
                       exchanges_max=2, single_max=0, py=0),
    # round-9 crawl front end: synth + extraction/canonicalization are
    # pure per-row regexp/string chains — ONE scan, nothing else. At
    # 100 TB both ride the ingest scan with zero added exchanges.
    "html_extract": dict(scans=1, pushed_min=0, joins=set(),
                         exchanges_max=0, single_max=0, py=0),
    "url_canonicalize": dict(scans=1, pushed_min=0, joins=set(),
                             exchanges_max=0, single_max=0, py=0),
    # round-9 JL projection: 8 unrolled literal folds in one map-only
    # scan — the knn/_bucket_expr device, one CodegenFallback barrier.
    "embedding_project": dict(scans=1, pushed_min=0, joins=set(),
                              exchanges_max=0, single_max=0, py=0),
    # round-9 ingest capstone: URL synth -> canonicalize -> exact-URL
    # dedup -> HTML synth -> extract -> classifier gate fuses into ONE
    # scan and ONE+ONE exchanges — the first-wins dedup groupBy plus
    # (round 12) the size-gated post-shuffle rebalance that stops AQE
    # byte-coalescing from serializing the heavy synth/extract/
    # classify chain on one task at bench scale (plans/widen.py:
    # rebalance_if_small; OFF at real scale, so 100 TB plans keep the
    # single dedup exchange). The min_by merge device carries
    # text/domain through the shuffle so no stage needs a join, and
    # every other stage is map-side string algebra or a per-row fold.
    # Zero Python.
    "crawl_ingest": dict(scans=1, pushed_min=0, joins=set(),
                         exchanges_max=2, single_max=0, py=0),
}


def _facts(spark, df):
    from tools.plan_audit import formatted_plan

    plan = formatted_plan(spark, df)
    df.toArrow()  # finalize AQE so executed-plan facts are real
    executed = df._jdf.queryExecution().executedPlan().toString() \
        .split("== Initial Plan ==")[0]
    return dict(
        scans=len(re.findall(r"^\(\d+\) Scan parquet", plan, re.M)),
        pushed=sum(1 for p in re.findall(r"PushedFilters: \[([^\]]*)\]",
                                         plan) if p.strip()),
        joins=set(re.findall(
            r"^\(\d+\) (BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin"
            r"|BroadcastNestedLoopJoin|CartesianProduct)", plan, re.M)),
        exchanges=len(re.findall(
            r"\bExchange (?:hashpartitioning|rangepartitioning|"
            r"SinglePartition)", executed)),
        single=len(re.findall(r"\bExchange SinglePartition", executed)),
        py=len(re.findall(
            r"\b(?:ArrowEvalPython|BatchEvalPython|FlatMapGroupsInPandas"
            r"|MapInPandas|PythonUDTF)\b", executed)),
    )


@pytest.mark.parametrize("name", sorted(EXPECTED))
def test_plan_invariants(spark, name):
    from data_services_spark.registry import RAW_QUERIES

    want = EXPECTED[name]
    got = _facts(spark, RAW_QUERIES[name](spark, SF_DIR))
    assert got["scans"] == want["scans"], got
    assert got["pushed"] >= want["pushed_min"], got
    assert got["joins"] == want["joins"], got
    assert got["exchanges"] <= want["exchanges_max"], got
    assert got["single"] <= want["single_max"], got
    assert got["py"] == want["py"], got
    assert "CartesianProduct" not in got["joins"], got


@pytest.mark.parametrize("name", ["running_sum_scalable", "token_packing",
                                  "length_batching"])
def test_scalable_forms_never_funnel_the_table(spark, name):
    """The guarantee the single_max ceiling can't express textually: the
    MAIN TABLE never passes through one task. AQE's partition coalescing
    is disabled for the observation — at this toy sf it legitimately
    merges every sub-advisory partition into one, which is exactly the
    behavior that vanishes at scale where partitions exceed the
    advisory; what must NOT vanish is the underlying multi-partition
    plan shape this test pins."""
    import pyspark.sql.functions as F

    from data_services_spark.registry import RAW_QUERIES

    key = "spark.sql.adaptive.coalescePartitions.enabled"
    # build FIRST: registry queries defensively configure_session(),
    # which would re-enable coalescing; AQE reads the conf at execution
    out = RAW_QUERIES[name](spark, SF_DIR)
    saved = spark.conf.get(key)
    spark.conf.set(key, "false")
    # the aggregate must REFERENCE a window-derived output column
    # (out.columns[-1]: running_tokens/chunk_id/batch_id) — counting
    # only spark_partition_id() lets the optimizer prune the whole
    # window+exchange away and measure the bare scan instead
    probe = out.columns[-1]
    try:
        total = out.count()
        sizes = [r["n"] for r in
                 out.groupBy(F.spark_partition_id().alias("p"))
                 .agg(F.count(probe).alias("n")).collect()]
    finally:
        spark.conf.set(key, saved)
    assert max(sizes) < total, (max(sizes), total)


def test_knn_codegen_stage_barrier_survives(spark):
    """knn_topk's float bit-stability vs the oracle rests on a
    CodegenFallback leaf — `aggregate(array(x), 1.0, (a,x) -> a)` —
    that keeps the scoring Project OUT of whole-stage codegen (the
    summation shape changes if the Project inlines into the codegen'd
    Filter stage). That barrier is version-fragile: a future Spark
    that codegens `aggregate` re-inlines the Project and silently
    changes the arithmetic (round-8 verdict What's-wrong #3). Pin the
    physical fact so an upgrade fails LOUDLY: the executed plan must
    contain the fallback expression, and the Project carrying it must
    NOT have a `*(n)` whole-stage-codegen marker."""
    from data_services_spark.registry import RAW_QUERIES

    df = RAW_QUERIES["knn_cosine"](spark, SF_DIR)
    df.toArrow()
    executed = df._jdf.queryExecution().executedPlan().toString() \
        .split("== Initial Plan ==")[0]
    scoring = [ln for ln in executed.splitlines()
               if "aggregate(" in ln and "Project" in ln]
    assert scoring, f"fallback leaf gone from plan:\n{executed[:2000]}"
    for ln in scoring:
        marker = ln.split("Project")[0]
        assert "*(" not in marker, f"scoring Project was codegen'd: {ln[:120]}"


@pytest.mark.parametrize("name", ["dsir_resample", "bm25_topk",
                                  "vocab_topk_bpe"])
def test_dsir_resample_topk_never_global_sorts(spark, name):
    """The top-k selections must execute as TakeOrderedAndProject
    (per-partition k-heads merged on the driver) — a global sort of the
    whole scored corpus for a k-row answer is the shape that stops
    scaling first. Pinned on the executed plan, not the optimized text:
    AQE cannot rewrite TakeOrderedAndProject into a sort+limit."""
    from data_services_spark.registry import RAW_QUERIES

    df = RAW_QUERIES[name](spark, SF_DIR)
    df.toArrow()
    executed = df._jdf.queryExecution().executedPlan().toString() \
        .split("== Initial Plan ==")[0]
    assert "TakeOrderedAndProject" in executed, executed[:2000]
    assert "Exchange rangepartitioning" not in executed, executed[:2000]


def test_image_near_dup_single_decode_pass(spark):
    """The round-10 fix for the r9 verdict's What's-wrong #1: the
    dHash relation persists (one-slot) before the band self-join, so
    the synth/encode + decode/dhash Arrow pipeline materializes ONCE
    and both join sides read InMemoryTableScans of it. The EXPECTED
    py=4 above is textual only (InMemoryTableScan prints its cached
    plan as innerChildren, doubling the 2 logical Arrow ops); this
    test walks the REAL executed tree — children(), which stops at
    InMemoryTableScan — and asserts zero Arrow boundaries outside the
    cache plus exactly two reads of it."""
    from data_services_spark.registry import RAW_QUERIES

    df = RAW_QUERIES["image_near_dup"](spark, SF_DIR)
    df.toArrow()

    def names(plan):
        n = plan.nodeName()
        # unwrap the AQE containers: AdaptiveSparkPlanExec holds the
        # final plan in executedPlan(), QueryStageExec leaves (Shuffle/
        # Broadcast/TableCache/Result) hold theirs in plan(); neither
        # exposes them via children(), which is exactly why the walk —
        # unlike the toString — never descends into innerChildren.
        if n == "AdaptiveSparkPlan":
            return [n, *names(plan.executedPlan())]
        if n.endswith("QueryStage"):
            return [n, *names(plan.plan())]
        out = [n]
        for i in range(plan.children().size()):
            out.extend(names(plan.children().apply(i)))
        return out

    seen = names(df._jdf.queryExecution().executedPlan())
    arrow = [n for n in seen
             if "Pandas" in n or "Arrow" in n or "Python" in n]
    assert not arrow, f"Arrow op outside the hash cache: {arrow}"
    inmem = [n for n in seen if n == "InMemoryTableScan"]
    assert len(inmem) == 2, seen
