"""Measure DuckDB on the EXACT oracle SQL of the 7 bench queries at sf0.1.

BASELINE.md's original rows were measured on *approximate analogues* of the
bench queries (e.g. a simple running-sum window vs window_running_sum's
added time-RANGE trailing frame; a 600k-group list-agg vs node-merge's
3.5k groups). This tool removes that slack: it runs the identical SQL
strings the correctness gate uses (registry.ORACLES) so the 2x-of-baseline
metric is apples-to-apples.

Methodology mirrors bench.py: full materialization into Arrow
(`.arrow()`, matching bench.py's `.toArrow()` — fetchall's Python-tuple
materialization would charge DuckDB an unfair per-row Python-object tax at
multi-million-row results), one untimed warmup, then min-of-3 warm
wall-clock per query.

    python tools/rebaseline_duckdb.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")

BENCH_QUERIES = (
    "q1_pricing_summary",
    "q3_shipping_priority",
    "kgx_edge_merge",
    "kgx_node_merge",
    "window_running_sum",
    "tumbling_window",
    "knn_cosine",
)

# LLM-pipeline headliners (round 11) — mirrors bench.py's
# LLM_BENCH_QUERIES; totaled separately (`value_llm`) so `value` stays
# comparable to every prior BASELINE_EXACT measurement.
LLM_BENCH_QUERIES = (
    "crawl_ingest",
    "text_dedup_exact",
    "bpe_tokenize",
    # the dict-kernel twin shares bpe_tokenize's oracle SQL verbatim,
    # so its DuckDB baseline is the same chain run under its own name
    "bpe_tokenize_dict",
)


def main() -> None:
    from data_services_spark.registry import ORACLES

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    timings: dict[str, float] = {}
    timings_llm: dict[str, float] = {}
    rows: dict[str, int] = {}
    for name in BENCH_QUERIES + LLM_BENCH_QUERIES:
        sql = ORACLES[name]
        res = con.execute(sql).arrow()  # untimed warmup
        rows[name] = res.num_rows
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            con.execute(sql).arrow()
            best = min(best, time.perf_counter() - t0)
        (timings_llm if name in LLM_BENCH_QUERIES
         else timings)[name] = round(best, 4)

    print(json.dumps({
        "metric": "duckdb_oracle_sql_warm",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "queries": timings,
        "queries_llm": timings_llm,
        "value_llm": round(sum(timings_llm.values()), 4),
        "rows": rows,
        "sf_dir": sf_dir,
        "duckdb": duckdb.__version__,
    }))


if __name__ == "__main__":
    main()
