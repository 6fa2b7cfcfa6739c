"""Generate the committed GAF-style TSV fixture for `csv_scan_agg` —
the first registry query that routes through the delimited-scan reader
(sources/readers.py read_csv) instead of parquet, closing the r12
verdict's "non-parquet scan paths are pytest-only" gap (What's-missing
#5).

Shape mirrors the reference's delimited biomedical sources (GAF-like:
leading `!` comment lines, NO header row, tab-separated, gzipped):

    !gaf-version: 2.2
    !generated-by: tools/make_csv_fixture.py (deterministic, seed below)
    UniProtKB	P{05d}	SYM{d}	GO:{07d}	<evidence>	<score>	<taxon>

Determinism contract (what makes the oracle exact):
- fixed LCG (no random module state), fixed row count;
- score is an integer 0..400 scaled by 0.25 — a dyadic rational whose
  500-row sums are exactly representable in double, so SUM(score) is
  order-independent across Spark partial aggregation and DuckDB;
- gzip written with mtime=0 so the committed bytes are reproducible.

Usage: python tools/make_csv_fixture.py   (rewrites fixtures/annotations.gaf.gz)
"""

from __future__ import annotations

import gzip
import io
import os

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "fixtures", "annotations.gaf.gz")

EVIDENCE = ("EXP", "IDA", "IEA", "ISS", "TAS", "ND")
TAXA = (9606, 10090, 7227, 6239)
N_ROWS = 500


def lcg(seed: int):
    s = seed
    while True:
        s = (s * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        yield s >> 33


def main() -> None:
    rng = lcg(42)
    buf = io.StringIO()
    buf.write("!gaf-version: 2.2\n")
    buf.write("!generated-by: tools/make_csv_fixture.py seed=42\n")
    buf.write("!note: comment lines must be dropped by the reader\n")
    for i in range(N_ROWS):
        ev = EVIDENCE[next(rng) % len(EVIDENCE)]
        taxon = TAXA[next(rng) % len(TAXA)]
        go = next(rng) % 2_000_000
        score = (next(rng) % 401) * 0.25
        buf.write(f"UniProtKB\tP{i:05d}\tSYM{i % 97}\tGO:{go:07d}"
                  f"\t{ev}\t{score}\t{taxon}\n")
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "wb") as f:
        with gzip.GzipFile(fileobj=f, mode="wb", mtime=0) as gz:
            gz.write(buf.getvalue().encode())
    print(f"wrote {OUT} ({N_ROWS} rows + 3 comment lines)")


if __name__ == "__main__":
    main()
