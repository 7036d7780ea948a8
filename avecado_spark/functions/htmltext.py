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


# ---------------------------------------------------------------------------
# charset sniffing (WHATWG encoding-standard ladder, the CC-corpus subset)
# ---------------------------------------------------------------------------

# WHATWG label table subset: legacy latin labels all mean windows-1252
_CHARSET_ALIASES = {
    "iso-8859-1": "windows-1252", "latin1": "windows-1252",
    "latin-1": "windows-1252", "ascii": "windows-1252",
    "us-ascii": "windows-1252", "x-user-defined": "windows-1252",
    "utf8": "utf-8", "unicode-1-1-utf-8": "utf-8",
    "iso-8859-15": "iso-8859-15", "shift-jis": "shift_jis",
    "sjis": "shift_jis", "x-sjis": "shift_jis",
}

_META_CHARSET_RE = re.compile(
    rb"""<meta[^>]+charset\s*=\s*["']?\s*([a-zA-Z0-9_\-]+)""", re.I)


def sniff_charset(data: bytes, content_type: str | None = None) -> str:
    """WHATWG-ladder charset detection for one html payload: BOM beats
    the Content-Type header charset, which beats a <meta charset=...> /
    http-equiv prescan of the first 1024 bytes, which beats the utf-8
    default. Labels normalize per the WHATWG table (all legacy latin
    labels mean windows-1252); unknown labels fall back to utf-8 so the
    caller always gets a codec python has."""
    if data[:3] == b"\xef\xbb\xbf":
        return "utf-8"
    if data[:2] == b"\xff\xfe":
        return "utf-16-le"
    if data[:2] == b"\xfe\xff":
        return "utf-16-be"
    label = None
    if content_type and "charset=" in content_type.lower():
        label = (content_type.lower().split("charset=", 1)[1]
                 .split(";")[0].strip().strip('"\''))
    if not label:
        m = _META_CHARSET_RE.search(data[:1024])
        if m:
            label = m.group(1).decode("ascii", "replace").lower()
    if not label:
        return "utf-8"
    label = _CHARSET_ALIASES.get(label, label)
    import codecs
    try:
        codecs.lookup(label)
    except LookupError:
        return "utf-8"
    return label


def decode_html(data: bytes, content_type: str | None = None) -> str:
    """Charset-aware front door for raw page bytes: sniff (BOM > header >
    meta prescan > utf-8), decode with 'replace', BOM stripped. The
    downstream html_to_text/parse_links transforms stay byte-exactly
    pinned on str input; this is where a non-utf-8 crawl enters them."""
    enc = sniff_charset(data, content_type)
    if enc == "utf-8" and data[:3] == b"\xef\xbb\xbf":
        data = data[3:]
    text = data.decode(enc, "replace")
    return text.lstrip("﻿")
