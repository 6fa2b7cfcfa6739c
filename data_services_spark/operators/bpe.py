"""Byte-pair-encoding subword tokenization (round-10; SURVEY §2.11 —
the tokenizer-aware token accounting the r9 verdict listed as the top
missing user surface): a deterministic public BPE (Sennrich et al.
2016, arXiv:1508.07909) over a FIXED literal merge table, so every
token budget in the pipeline (packing, chunking) can be counted in
model-real subword tokens instead of whitespace words.

Spark-first shape — the whole tokenizer is a chain of built-in STRING
functions, no UDF, no explode, no shuffle:

- normalize to ``[a-z0-9 ]`` (lowercase, non-alphanumeric runs -> one
  space, trim);
- render the character symbols as a DELIMITED string: every char ``c``
  becomes ``_c_`` (one regexp_replace), so the word ``the`` is
  ``_t__h__e_`` — symbols never contain ``_`` (excluded by the
  normalization), so a pair (a, b) of ADJACENT symbols appears exactly
  as the substring ``_a__b_`` and nowhere else (a symbol-tail /
  symbol-head fragment always breaks on the double delimiter);
- each merge rule (a, b) -> ab is ONE ``replace(enc, '_a__b_',
  '_ab_')``: SQL replace scans left to right replacing non-overlapping
  occurrences — exactly BPE's within-pass greedy order — and both
  Spark and DuckDB define it identically, which is what makes the
  generated oracle exact;
- spaces are ordinary symbols that no rule touches, so merges can
  never cross a word boundary and no per-word explode is needed;
- counts come from delimiter arithmetic: a string of m symbols
  carries exactly 2m underscores.

Applying the rules as ONE ascending-rank pass each is equivalent to
the textbook iterate-min-rank-until-fixpoint BPE for any WELL-FORMED
table — one whose every non-single-character component is the output
of a strictly earlier rule and whose outputs are unique. Proof shape:
merging at rank r can only create a new occurrence of pair (a, b)
with rank r' < r by creating symbol a or b itself, whose unique
producing rule has rank < r' < r — a contradiction; so when pass r'
runs, every occurrence it will ever need to merge already exists.
:func:`_validate_merges` enforces well-formedness at import and
``test_bpe_pass_order_equals_reference`` pins the equivalence against
an independent min-rank Python implementation.

At 100 TB: map-only — ~R string scans of each document (R = table
size), all inside whole-stage codegen, output partitioning follows
the input's. The oracle generator emits the IDENTICAL replace chain
from the same table, so the two sides cannot drift.
"""

from __future__ import annotations

from functools import reduce

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

# Fixed public merge table (rank = position): frequent English letter
# pairs and the suffix/prefix compounds built from them. Deliberately
# small — the point is exact, model-real ACCOUNTING mechanics, not a
# shipped vocabulary; swap in a learned table (same well-formedness
# contract) for production budgets.
DEFAULT_MERGES: tuple[tuple[str, str], ...] = (
    ("t", "h"), ("i", "n"), ("e", "r"), ("a", "n"), ("o", "n"),
    ("r", "e"), ("a", "t"), ("e", "n"), ("o", "r"), ("e", "s"),
    ("t", "i"), ("t", "e"), ("o", "f"), ("i", "s"), ("i", "t"),
    ("a", "l"), ("a", "r"), ("a", "s"), ("s", "t"), ("n", "t"),
    ("n", "d"), ("o", "u"), ("e", "d"), ("l", "e"), ("o", "m"),
    ("r", "o"), ("e", "a"), ("o", "w"), ("q", "u"), ("i", "c"),
    ("th", "e"), ("an", "d"), ("in", "g"), ("a", "ti"), ("e", "nt"),
    ("i", "on"), ("ati", "on"), ("f", "or"), ("th", "at"),
    ("w", "it"), ("wit", "h"), ("w", "as"), ("er", "s"), ("c", "on"),
    ("c", "om"), ("p", "re"), ("p", "ro"), ("es", "t"), ("ou", "t"),
    ("al", "l"), ("t", "ed"), ("m", "ent"),
)


def _validate_merges(merges: tuple[tuple[str, str], ...]) -> None:
    """Raise unless ``merges`` is well-formed: every component is a
    single character or the output of a STRICTLY earlier rule, no two
    rules share an output, and no component contains the delimiter /
    a character outside the normalized alphabet. Well-formedness is
    what makes the ascending-pass evaluation equal textbook BPE (see
    module docstring)."""
    seen: set[str] = set()
    for i, (a, b) in enumerate(merges):
        for part in (a, b):
            if not part or any(ch not in "abcdefghijklmnopqrstuvwxyz"
                               "0123456789" for ch in part):
                raise ValueError(
                    f"merge {i} component {part!r} outside [a-z0-9]")
            if len(part) > 1 and part not in seen:
                raise ValueError(
                    f"merge {i} component {part!r} is not the output of "
                    "an earlier rule (table not well-formed)")
        out = a + b
        if out in seen:
            raise ValueError(f"duplicate merge output {out!r} at rule {i}")
        seen.add(out)


_validate_merges(DEFAULT_MERGES)

# The delimiter: excluded from the normalized alphabet, so symbol
# boundaries are unambiguous (see module docstring).
_D = "_"


def bpe_norm(col: Column | str) -> Column:
    """Normalized text: lowercase, non-alphanumeric runs -> single
    space, trimmed. The tokenizer's (and the oracle's) common ground."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), "[^a-z0-9]+", " "))


def bpe_encode(col: Column | str,
               merges: tuple[tuple[str, str], ...] = DEFAULT_MERGES
               ) -> Column:
    """The delimited symbol string after all merge passes: ``the cat``
    -> ``_the__ _c__at_`` (with ``_``-wrapped symbols; the space stays
    an untouched symbol). Intermediate representation — compose with
    :func:`bpe_token_count` / :func:`bpe_subwords`."""
    _validate_merges(merges)
    enc = F.regexp_replace(bpe_norm(col), "(.)", f"{_D}$1{_D}")
    return reduce(
        lambda acc, ab: F.replace(
            acc, F.lit(f"{_D}{ab[0]}{_D}{_D}{ab[1]}{_D}"),
            F.lit(f"{_D}{ab[0]}{ab[1]}{_D}")),
        merges, enc)


def bpe_token_count(col: Column | str,
                    merges: tuple[tuple[str, str], ...] = DEFAULT_MERGES
                    ) -> Column:
    """Subword token count (spaces excluded) as a long — the
    model-real replacement for whitespace word counts in token
    budgets. Delimiter arithmetic: m symbols carry 2m underscores;
    spaces count once per separator run in the normalized text."""
    enc = bpe_encode(col, merges)
    norm = bpe_norm(col)
    n_syms = ((F.length(enc)
               - F.length(F.replace(enc, F.lit(_D), F.lit("")))) / 2)
    n_spaces = (F.length(norm)
                - F.length(F.replace(norm, F.lit(" "), F.lit(""))))
    return (n_syms - n_spaces).cast("long")


def bpe_subwords(col: Column | str,
                 merges: tuple[tuple[str, str], ...] = DEFAULT_MERGES
                 ) -> Column:
    """The subword token stream as array<string> (spaces dropped),
    in document order."""
    enc = bpe_encode(col, merges)
    return F.filter(F.split(enc, _D),
                    lambda x: (x != "") & (x != " "))


def bpe_tokenize(docs: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id",
                 merges: tuple[tuple[str, str], ...] = DEFAULT_MERGES
                 ) -> DataFrame:
    """Per-document BPE accounting: (id, n_words, n_chars,
    n_bpe_tokens, bpe_text) where ``bpe_text`` is the space-joined
    subword segmentation. One map-only projection — zero shuffle,
    zero Python."""
    norm = bpe_norm(text_col)
    n_words = F.when(F.length(norm) == 0, F.lit(0)).otherwise(
        F.size(F.split(norm, " "))).cast("long")
    return docs.select(
        F.col(id_col),
        n_words.alias("n_words"),
        F.length(norm).cast("long").alias("n_chars"),
        bpe_token_count(text_col, merges).alias("n_bpe_tokens"),
        F.array_join(bpe_subwords(text_col, merges), " ")
        .alias("bpe_text"))


def bpe_sql(expr: str,
            merges: tuple[tuple[str, str], ...] = DEFAULT_MERGES
            ) -> dict[str, str]:
    """DuckDB SQL fragments generated from the SAME merge table —
    the oracle side of the exactness contract. Returns a dict with
    ``norm``, ``enc``, ``n_bpe``, ``subwords`` expressions over the
    given input SQL expression."""
    _validate_merges(merges)
    norm = f"trim(regexp_replace(lower({expr}), '[^a-z0-9]+', ' ', 'g'))"
    enc = f"regexp_replace({norm}, '(.)', '{_D}\\1{_D}', 'g')"
    for a, b in merges:
        enc = (f"replace({enc}, '{_D}{a}{_D}{_D}{b}{_D}',"
               f" '{_D}{a}{b}{_D}')")
    n_syms = f"((length({enc}) - length(replace({enc}, '{_D}', ''))) // 2)"
    n_spaces = f"(length({norm}) - length(replace({norm}, ' ', '')))"
    subwords = (f"list_filter(str_split({enc}, '{_D}'),"
                " x -> x != '' AND x != ' ')")
    # DuckDB's array_to_string([]) is NULL where Spark's array_join of
    # an empty array is '' — coalesce the empty case but preserve the
    # NULL-text row's NULL (both engines propagate NULL text to NULL)
    bpe_text = (f"CASE WHEN {norm} IS NULL THEN NULL "
                f"ELSE COALESCE(array_to_string({subwords}, ' '), '') END")
    return {
        "norm": norm,
        "enc": enc,
        "n_bpe": f"CAST({n_syms} - {n_spaces} AS BIGINT)",
        "subwords": subwords,
        "bpe_text": bpe_text,
    }
