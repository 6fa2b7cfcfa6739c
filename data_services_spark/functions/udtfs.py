"""D5 UDTF surface (SURVEY §2.10 D5): one row -> many rows via a Python
table function.

``explode`` covers every reference need (and stays JVM-side — always
prefer it); this module exists because the engine also exposes the
*user-defined* table-function surface for logic a lambda can't express.
Arrow-optimized evaluation is enabled session-wide
(``spark.sql.execution.pythonUDTF.arrow.enabled``).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.functions import udtf


@udtf(returnType="token string, pos int")
class TokenizeTF:
    """Emit (token, position) per whitespace token — the UDTF analogue of
    ``posexplode(split(text, ' '))``. Matches Python ``str.split(' ')``
    semantics exactly (single-space delimiter, empties preserved) so the
    DuckDB ``string_split`` oracle agrees."""

    def eval(self, text: str):  # noqa: ANN001 - UDTF protocol
        if text is None:
            return
        for i, t in enumerate(text.split(" ")):
            yield t, i


def register_udtfs(spark: SparkSession) -> None:
    """Idempotent per-session registration for SQL LATERAL use."""
    spark.udtf.register("tokenize_tf", TokenizeTF)
