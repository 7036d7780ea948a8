"""HTML → text extraction for the Common-Crawl-shaped `pages` table.

The north rule's per-row invariant is *byte-identical extracted text per
url*: the same html bytes must yield the same text string on every
engine, every run, every partitioning. That rules out heuristic
extractors with tunable scoring (readability-style) and demands a small,
exactly-specified transform — the one implemented here:

  1. strip ``<!-- -->`` comments and the full content of ``<script>`` /
     ``<style>`` elements (case-insensitive, unterminated ones run to
     end-of-document, matching browser error recovery),
  2. tag substitution by display class: BLOCK tags (``p div h1..h6 li ul
     ol table tr title body html head header footer section article
     blockquote pre form`` + ``br``/``hr``) become a newline, table cells
     (``td th``) become a single space, every other tag (inline: ``a span
     b i em strong img ...``) becomes the empty string,
  3. character-reference decoding via the HTML5 named/numeric table
     (stdlib ``html.unescape``),
  4. whitespace canonicalization: within each line every run of
     non-newline whitespace (including NBSP from ``&nbsp;``) collapses to
     one space and is stripped at both ends; empty lines drop; lines
     join with ``\\n``.

Every step is order-fixed and pure, so the composition is a function of
the bytes alone. ``tests/test_webgraph.py`` pins a case table and
``queries.web_extract_text`` hash-checks the full corpus against a
closed-form DuckDB oracle (the synthesizer's pages have closed-form
text), which is exactly the byte-identity gate.

Plain-Python string work: runs inside Arrow-batched ``mapInPandas``
workers (operators/webgraph.extract_text), never as a per-row Spark UDF.
"""

from __future__ import annotations

import html as _html
import re

# content-swallowing elements + comments (browser error recovery: an
# unterminated one swallows to EOF, hence the (?:...|$) alternative)
_DROP_RE = re.compile(
    r"<!--.*?(?:-->|$)"
    r"|<script\b[^>]*>.*?(?:</script\s*>|$)"
    r"|<style\b[^>]*>.*?(?:</style\s*>|$)",
    re.I | re.S)

_BLOCK = ("p|div|h[1-6]|li|ul|ol|table|tr|title|body|html|head|header|"
          "footer|section|article|blockquote|pre|form|br|hr")
_BLOCK_RE = re.compile(rf"</?(?:{_BLOCK})\b[^>]*>", re.I)
_CELL_RE = re.compile(r"</?(?:td|th)\b[^>]*>", re.I)
_TAG_RE = re.compile(r"<[^>]*>")
# any whitespace except newline (covers NBSP, tabs, CR, unicode spaces)
_WS_RE = re.compile(r"[^\S\n]+")


def html_to_text(data: bytes | str) -> str:
    """The exactly-specified html→text transform (module docstring)."""
    text = data.decode("utf-8", "replace") if isinstance(data, bytes) else data
    text = _DROP_RE.sub("", text)
    text = _BLOCK_RE.sub("\n", text)
    text = _CELL_RE.sub(" ", text)
    text = _TAG_RE.sub("", text)
    text = _html.unescape(text)
    lines = (_WS_RE.sub(" ", ln).strip() for ln in text.split("\n"))
    return "\n".join(ln for ln in lines if ln)
