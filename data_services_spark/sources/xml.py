"""S4: XML source (HMDB metabolite dumps, PSI-MI interaction files in the
reference — `[R: parsers/hmdb/src/loadHMDB.py — unverified]`).

No spark-xml package is assumed. Strategy: read whole files with
``spark.read.text(wholetext=True)`` (one row per file — XML records span
lines, so line-splitting is unsafe), then ``mapInPandas`` with the stdlib
``xml.etree`` iterparse to emit one row per `row_tag` element. Arrow-batched,
parallel across files.

Scale posture: parallelism is per-file. A single 100 GB XML dump must be
pre-split into many files upstream (the reference downloads per-entry zips,
which maps naturally); the parser itself streams via iterparse and clears
elements, so memory stays bounded per record regardless of file size.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql import DataFrame, SparkSession


def read_xml(spark: SparkSession, path: str, row_tag: str,
             fields: Sequence[str]) -> DataFrame:
    """XML scan: one output row per `row_tag` element, one string column per
    requested field (absent -> null; first matching descendant wins). Type
    casts belong downstream where the source adapter declares its schema
    (SURVEY §1.2).

    The worker function is deliberately self-contained (stdlib imports only,
    no references to this module): cloudpickle ships it by value, so the
    executor Python workers do NOT need data_services_spark importable —
    the engine works spark-submit'ted without --py-files."""
    import pandas as pd

    fields = list(fields)
    schema = ", ".join(f"`{f}` string" for f in fields)
    raw = spark.read.text(path, wholetext=True)

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io
        import xml.etree.ElementTree as ET

        import pandas as pd

        def records(xml_text: str):
            for _, elem in ET.iterparse(io.StringIO(xml_text),
                                        events=("end",)):
                if elem.tag.rsplit("}", 1)[-1] != row_tag:
                    continue
                row: dict[str, str] = {}
                for child in elem.iter():
                    name = child.tag.rsplit("}", 1)[-1]
                    if (name in fields and name not in row
                            and child.text is not None):
                        text = child.text.strip()
                        if text:
                            row[name] = text
                yield {f: row.get(f) for f in fields}
                elem.clear()  # bound memory: drop each subtree once emitted

        for pdf in batches:
            rows = [r for text in pdf["value"] for r in records(text)]
            yield (pd.DataFrame(rows, columns=fields) if rows
                   else pd.DataFrame({f: pd.Series(dtype=object)
                                      for f in fields}))

    return raw.mapInPandas(parse, schema)
