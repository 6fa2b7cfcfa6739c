"""Web-corpus front-end operators (SURVEY §2.11 L22/L23): HTML text
extraction and URL canonicalization — the stages BEFORE every
dedup/quality/similarity operator in a crawl pipeline. Pure built-in
expressions (regexp/string chains — no Python boundary, zero shuffle:
both are per-row functions whose output partitioning follows the
input's).

Cross-engine regex discipline: Spark compiles Java regex, DuckDB
compiles RE2. Every pattern here stays inside the common subset —
explicit character classes (never \\s, whose definitions differ),
non-greedy ``.*?`` under an explicit ``(?s)`` flag, no lookarounds, no
backreferences — so the DuckDB oracles replay the exact semantics.

The test fixtures carry no real HTML or URLs, so each operator ships
with a deterministic synthesizer (``synth_html`` / ``synth_url`` — the
``synth_gray_payloads`` device from the image pipeline): the registry
queries synthesize from the documents table, run the real extractor,
and the oracle replays BOTH stages SQL-side. A green hash therefore
value-checks the synth, the extraction chain, and their composition.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

# Whitespace as an explicit class — Java's \s and RE2's \s disagree on
# vertical tab / unicode; the synths only emit these three.
_WS = "[ \\t\\n]"

# Core HTML entities, decode order LOAD-BEARING: '&amp;' LAST, so
# "&amp;lt;" decodes to the literal "&lt;", never to "<". One table for
# both body text and title extraction.
_ENTITIES = (("&lt;", "<"), ("&gt;", ">"), ("&quot;", "\""),
             ("&#39;", "'"), ("&amp;", "&"))


def _decode_entities(c: Column) -> Column:
    for ent, ch in _ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(ch))
    return c


def synth_html(text: Column | str, doc_id: Column | str) -> Column:
    """Deterministic HTML page from a text column: title from the id,
    nav/script/style boilerplate, the text split into <p> paragraphs at
    every 7th token (entity-encoding '&' so extraction must decode).
    Stands in for crawled HTML the same way synth_gray_payloads stands
    in for crawled images."""
    t = F.col(text) if isinstance(text, str) else text
    d = F.col(doc_id) if isinstance(doc_id, str) else doc_id
    toks = F.split(F.trim(t), " +")
    paras = F.concat_ws(
        "\n",
        F.transform(
            F.sequence(F.lit(0), F.floor((F.size(toks) - 1) / 7).cast("int")),
            lambda i: F.concat(
                F.lit("<p class=\"body\">"),
                F.replace(F.array_join(F.slice(toks, i * 7 + 1, 7), " "),
                          F.lit("&"), F.lit("&amp;")),
                F.lit("</p>"))))
    return F.concat(
        F.lit("<!DOCTYPE html>\n<html>\n<head>\n<title>Doc &amp; page "),
        d.cast("string"),
        F.lit("</title>\n<style>p { margin: 0; }</style>\n"
              "<script>var tracker = \"<p>not text</p>\";</script>\n"
              "</head>\n<body>\n<nav><a href=\"/\">Home</a> &gt;"
              " Section</nav>\n"),
        paras,
        F.lit("\n<footer>&copy; footer</footer>\n</body>\n</html>"))


def html_to_text(html: Column | str) -> Column:
    """Extract readable text from an HTML column: drop <script>/<style>
    subtrees (their CONTENT is not text — a bare tag-strip would leak
    javascript into the corpus), strip every remaining tag, decode the
    five core entities (&amp; LAST, so "&amp;lt;" decodes to "&lt;" not
    "<"), collapse whitespace. The honest scope of a deterministic
    extractor: tag/entity semantics, not content-density boilerplate
    ranking (trafilatura-class scoring is heuristic and version-bound;
    pair this with quality_score/quality_classifier downstream, which
    is where crawl pipelines put that judgement anyway)."""
    c = F.col(html) if isinstance(html, str) else html
    # <head> first (title/meta are metadata, not body text — html_title
    # extracts the title separately); script/style again AFTER, since
    # both also legally appear inside <body>. SEQUENTIAL passes on
    # purpose (round 12 tried fusing the three into one alternation —
    # reverted): on CROSSED/malformed tag spans the two orders
    # diverge ('X<script>A<head>B</script>C</head>D' is 'X A D'
    # sequentially but 'X C D' fused, leftmost-opener-wins), and the
    # DuckDB oracle replays the sequential order, so the fused form
    # would silently diverge from the oracle on exactly the malformed
    # pages real crawls carry. The three passes cost ~0.1s at sf0.1 —
    # the measured crawl bottleneck was AQE task coalescing, not
    # these regexes (ROUND12_NOTES #4).
    c = F.regexp_replace(c, "(?s)<head[^>]*>.*?</head>", " ")
    c = F.regexp_replace(c, "(?s)<script[^>]*>.*?</script>", " ")
    c = F.regexp_replace(c, "(?s)<style[^>]*>.*?</style>", " ")
    c = F.regexp_replace(c, "<[^>]*>", " ")
    return F.trim(F.regexp_replace(_decode_entities(c), _WS + "+", " "))


def html_title(html: Column | str) -> Column:
    """<title> content (entity-decoded, whitespace-collapsed); empty
    string when absent — crawl metadata, kept separate from body text."""
    c = F.col(html) if isinstance(html, str) else html
    t = F.regexp_extract(c, "(?s)<title[^>]*>(.*?)</title>", 1)
    return F.trim(F.regexp_replace(_decode_entities(t), _WS + "+", " "))


def synth_url(doc_id: Column | str, source: Column | str,
              lang: Column | str) -> Column:
    """Deterministic messy URL from document metadata: mixed-case
    scheme/host, default port, dot segments, tracking params out of
    order, fragment — every normalization the canonicalizer must do."""
    d = F.col(doc_id) if isinstance(doc_id, str) else doc_id
    s = F.col(source) if isinstance(source, str) else source
    lg = F.col(lang) if isinstance(lang, str) else lang
    return F.concat(
        F.lit("HTTPS://WwW."), F.upper(s), F.lit(".ExAmple.COM:443/"),
        lg, F.lit("/a/./b/../posts/item"), d.cast("string"),
        F.lit(".html?utm_source=feed&id="), d.cast("string"),
        F.lit("&utm_campaign=x&ref=tw#section-"), d.cast("string"))


def canonicalize_url(url: Column | str,
                     strip_params_prefix: str = "utm_") -> Column:
    """Canonical form for URL-level dedup (the crawl pipeline's
    cheapest dedup key — exact-URL dup groups dominate recrawls):

    - scheme and host lowercased (path/query case is significant and
      kept);
    - default ports dropped (``:443`` for https, ``:80`` for http);
    - fragment dropped (never sent to the server);
    - tracking params removed (prefix-configurable, default utm_*) and
      the SURVIVING params sorted — param order is transport noise;
    - dot segments resolved (``/./`` and ``segment/../``), bounded at
      4 passes — resolution is iterative by nature and a fixed-point
      loop is not expressible as one column expression; 4 covers paths
      nested 4 ``..`` deep, and crawlers rarely see more (documented
      knob, raise by chaining).

    Pure string algebra — identical in Java regex and RE2. The '$'
    anchors below are only cross-engine-safe on newline-free input
    (Java '$' matches before a trailing newline, RE2's does not), so
    ALL whitespace is stripped first: a literal space/tab/newline is
    never valid inside a URL (crawlers percent-encode), and unstripped
    crawl fields routinely carry a trailing newline.
    """
    c = F.col(url) if isinstance(url, str) else url
    c = F.regexp_replace(c, _WS, "")
    # split off fragment first (cheap, and keeps later regexes anchored)
    c = F.regexp_replace(c, "#.*$", "")
    # lowercase scheme://host[:port] only: rebuild from groups
    scheme = F.lower(F.regexp_extract(c, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    rest = F.regexp_replace(c, "^[A-Za-z][A-Za-z0-9+.-]*://", "")
    host = F.lower(F.regexp_extract(rest, "^([^/?]+)", 1))
    tail = F.regexp_replace(rest, "^[^/?]+", "")
    host = F.when(scheme == "https",
                  F.regexp_replace(host, ":443$", "")) \
        .when(scheme == "http", F.regexp_replace(host, ":80$", "")) \
        .otherwise(host)
    path = F.regexp_extract(tail, "^([^?]*)", 1)
    for _ in range(4):
        path = F.regexp_replace(path, "/\\./", "/")
        path = F.regexp_replace(path, "/[^/?]+/\\.\\./", "/")
    query = F.regexp_extract(tail, "\\?(.*)$", 1)
    kept = F.array_join(
        F.array_sort(F.filter(
            F.split(query, "&"),
            lambda p: (p != "") & ~p.startswith(strip_params_prefix))),
        "&")
    return F.concat(
        scheme, F.lit("://"), host, path,
        F.when(kept == "", F.lit("")).otherwise(F.concat(F.lit("?"), kept)))


def url_domain(canonical_url: Column | str) -> Column:
    """Registrable-domain approximation from a CANONICAL url: host
    minus a leading 'www.', reduced to its last two labels. (A public-
    suffix list is data, not logic — at deploy time broadcast-join the
    PSL the way the normalization map enters J1; two labels is the
    deterministic stand-in.)"""
    c = F.col(canonical_url) if isinstance(canonical_url, str) \
        else canonical_url
    host = F.regexp_extract(c, "^[a-z][a-z0-9+.-]*://([^/?]+)", 1)
    # a NON-default port survives canonicalization (it is significant)
    # but is never part of the domain
    host = F.regexp_replace(host, ":[0-9]+$", "")
    host = F.regexp_replace(host, "^www\\.", "")
    return F.regexp_extract(host, "([^.]+\\.[^.]+)$", 1)
