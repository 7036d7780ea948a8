"""WARC (ISO 28500 / WARC/1.0) reader — the container Common Crawl
actually ships, parsed into the pages schema.

Format facts this implements (all public, warc-specification + the CC
docs): a WARC file is a sequence of records, each

    WARC/1.0\r\n
    <header-name>: <value>\r\n ...
    \r\n
    <Content-Length bytes of block>
    \r\n\r\n

and Common Crawl gzips EVERY RECORD AS ITS OWN GZIP MEMBER, so a
`.warc.gz` is a concatenation of gzip members — the property that makes
per-record random access possible with an index, and what lets this
reader simply decompress the whole member stream (stdlib zlib handles
member concatenation) and walk records linearly.

For `response` records the block is an HTTP/1.1 response; the page body
is everything after the HTTP header terminator. `WARC-Target-URI`
carries the url, `WARC-Date` the capture timestamp (ISO-8601 Zulu).

Scale shape: one WARC file = one task (gzip members are not splittable
without the external index; CC files are ~1 GB — the task granularity
CC consumers actually use). The Spark surface reads
`binaryFile` rows and parses inside Arrow batches; emitted rows are
(url, warc_ts, html) — downstream derives text via
operators/webgraph.extract_text (jobs/ingest_warc.py composes both into
a snapshot table).

A fixture-grade writer (`warc_bytes`) lives here too so tests
round-trip real container bytes without external data.
"""

from __future__ import annotations

import gzip
import io
import zlib
from datetime import datetime, timezone
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession

_CRLF = b"\r\n"


def warc_bytes(records: list[tuple[str, int, bytes]],
               member_gzip: bool = True) -> bytes:
    """Serialize (url, epoch_s, html) triples as a WARC/1.0 byte stream —
    one `response` record each, each record its own gzip member when
    `member_gzip` (the Common-Crawl layout)."""
    out = io.BytesIO()
    for url, epoch_s, html in records:
        http = (b"HTTP/1.1 200 OK\r\n"
                b"Content-Type: text/html\r\n"
                b"Content-Length: " + str(len(html)).encode() + _CRLF +
                _CRLF + html)
        ts = datetime.fromtimestamp(epoch_s, tz=timezone.utc) \
            .strftime("%Y-%m-%dT%H:%M:%SZ")
        hdr = (b"WARC/1.0\r\n"
               b"WARC-Type: response\r\n"
               b"WARC-Target-URI: " + url.encode() + _CRLF +
               b"WARC-Date: " + ts.encode() + _CRLF +
               b"Content-Type: application/http; msgtype=response\r\n"
               b"Content-Length: " + str(len(http)).encode() + _CRLF +
               _CRLF)
        rec = hdr + http + _CRLF + _CRLF
        out.write(gzip.compress(rec) if member_gzip else rec)
    return out.getvalue()


def _gunzip_members(data: bytes) -> bytes:
    """Decompress a concatenation of gzip members (or pass through plain
    bytes)."""
    if data[:2] != b"\x1f\x8b":
        return data
    out = io.BytesIO()
    while data:
        d = zlib.decompressobj(wbits=31)
        out.write(d.decompress(data))
        out.write(d.flush())
        data = d.unused_data
    return out.getvalue()


def parse_warc(data: bytes) -> list[tuple[str, int, bytes]]:
    """All `response` records of one WARC file (plain or member-gzipped)
    as (url, epoch_s, html). Malformed trailing garbage stops the walk
    (truncated fetches are a fact of crawl life); a record with a bad
    length raises — a corrupt middle is NOT silently skipped."""
    raw = _gunzip_members(data)
    out: list[tuple[str, int, bytes]] = []
    pos = 0
    while True:
        nxt = raw.find(b"WARC/", pos)
        if nxt < 0:
            break
        pos = nxt
        hdr_end = raw.find(_CRLF + _CRLF, pos)
        if hdr_end < 0:
            break
        headers: dict[str, str] = {}
        for line in raw[pos:hdr_end].split(_CRLF)[1:]:
            k, _, v = line.decode("utf-8", "replace").partition(":")
            headers[k.strip().lower()] = v.strip()
        try:
            length = int(headers["content-length"])
        except (KeyError, ValueError):
            raise ValueError(f"WARC record at byte {pos}: bad Content-Length")
        block = raw[hdr_end + 4: hdr_end + 4 + length]
        if len(block) != length:
            break  # truncated tail
        pos = hdr_end + 4 + length
        if headers.get("warc-type") == "response":
            url = headers.get("warc-target-uri", "")
            ts = headers.get("warc-date", "1970-01-01T00:00:00Z")
            # WARC 1.1 allows fractional seconds (2024-01-01T00:00:00.123Z);
            # fromisoformat handles both forms. A malformed date degrades to
            # epoch 0 like other per-record defects — it must not abort the
            # whole file.
            try:
                epoch = int(datetime.fromisoformat(ts.rstrip("Zz"))
                            .replace(tzinfo=timezone.utc).timestamp())
            except ValueError:
                epoch = 0
            body_at = block.find(_CRLF + _CRLF)
            html = block[body_at + 4:] if body_at >= 0 else b""
            out.append((url, epoch, html))
    return out


WARC_SCHEMA = "url string, warc_ts timestamp, html binary"


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Distributed WARC scan: binaryFile rows (one file = one task, the
    gzip-member granularity) parsed inside Arrow batches into
    (url, warc_ts, html)."""
    import pandas as pd

    files = spark.read.format("binaryFile").load(path) \
                 .select("path", "content")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            urls, tss, htmls = [], [], []
            for content in b["content"]:
                for url, epoch, html in parse_warc(bytes(content)):
                    urls.append(url)
                    tss.append(datetime.fromtimestamp(epoch, tz=timezone.utc)
                               .replace(tzinfo=None))
                    htmls.append(html)
            yield pd.DataFrame({"url": urls, "warc_ts": tss, "html": htmls})

    return files.mapInPandas(run, schema=WARC_SCHEMA)
