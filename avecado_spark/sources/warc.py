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


def _walk_records(raw: bytes):
    """Yield (start, end, headers, block) per record of DECOMPRESSED WARC
    bytes. Malformed trailing garbage stops the walk (truncated fetches
    are a fact of crawl life); a record with a bad length raises — a
    corrupt middle is NOT silently skipped."""
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
        yield pos, hdr_end + 4 + length, headers, block
        pos = hdr_end + 4 + length


def _record_fields(headers: dict[str, str],
                   block: bytes) -> tuple[str, int, bytes]:
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
    return url, epoch, html


def parse_warc(data: bytes) -> list[tuple[str, int, bytes]]:
    """All `response` records of one WARC file (plain or member-gzipped)
    as (url, epoch_s, html)."""
    raw = _gunzip_members(data)
    return [_record_fields(headers, block)
            for _, _, headers, block in _walk_records(raw)
            if headers.get("warc-type") == "response"]


def build_warc_index(data: bytes) -> list[tuple[str, int, int, int]]:
    """Per-record index of one WARC file: (url, offset, length, epoch_s)
    for every `response` record — the CDX contract Common Crawl ships
    next to its WARCs. offset/length address the smallest independently
    readable byte range of the ORIGINAL file: the record's own gzip
    member for member-gzip files (the CC layout — fetchable with an HTTP
    Range GET and decompressed standalone), the raw record bytes for
    plain files. Invariant (test-pinned): parse_warc(data[offset:
    offset+length]) returns exactly that record."""
    out: list[tuple[str, int, int, int]] = []
    if data[:2] == b"\x1f\x8b":
        pos = 0
        while pos < len(data) and data[pos:pos + 2] == b"\x1f\x8b":
            d = zlib.decompressobj(wbits=31)
            raw = d.decompress(data[pos:]) + d.flush()
            end = len(data) - len(d.unused_data)
            n_resp = 0
            for _, _, headers, block in _walk_records(raw):
                if headers.get("warc-type") == "response":
                    n_resp += 1
                    url, epoch, _ = _record_fields(headers, block)
                    out.append((url, pos, end - pos, epoch))
            if n_resp > 1:
                # the documented invariant is one INDEPENDENTLY readable
                # range per record; a member packing several response
                # records cannot satisfy it (each entry would span the
                # whole member and read_warc_indexed would duplicate
                # records) — fail loudly instead (r08 advisor fix;
                # warc_bytes always writes one record per member)
                raise ValueError(
                    "build_warc_index: gzip member at offset "
                    f"{pos} holds {n_resp} response records — the "
                    "per-record range invariant needs one record per "
                    "member; re-pack the WARC or index it uncompressed")
            pos = end
        return out
    for start, end, headers, block in _walk_records(data):
        if headers.get("warc-type") == "response":
            url, epoch, _ = _record_fields(headers, block)
            out.append((url, start, end - start, epoch))
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


WARC_INDEX_SCHEMA = ("path string, url string, offset long, length long, "
                     "warc_ts timestamp")


def warc_index(spark: SparkSession, path: str) -> DataFrame:
    """Distributed index build: one pass over each WARC file (binaryFile,
    one file = one task) emitting (path, url, offset, length, warc_ts)
    per response record. Materialize this once per crawl; every later
    selective re-read goes through read_warc_indexed without scanning."""
    import pandas as pd

    files = spark.read.format("binaryFile").load(path) \
                 .select("path", "content")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            paths, urls, offs, lens, tss = [], [], [], [], []
            for p, content in zip(b["path"], b["content"]):
                for url, off, ln, epoch in build_warc_index(bytes(content)):
                    paths.append(p)
                    urls.append(url)
                    offs.append(off)
                    lens.append(ln)
                    tss.append(datetime.fromtimestamp(epoch, tz=timezone.utc)
                               .replace(tzinfo=None))
            yield pd.DataFrame({"path": paths, "url": urls, "offset": offs,
                                "length": lens, "warc_ts": tss})

    return files.mapInPandas(run, schema=WARC_INDEX_SCHEMA)


def _range_read_local(path: str, offset: int, length: int) -> bytes:
    from urllib.parse import urlparse
    p = urlparse(path).path if path.startswith("file:") else path
    with open(p, "rb") as f:
        f.seek(offset)
        return f.read(length)


def read_warc_indexed(index: DataFrame, opener=None) -> DataFrame:
    """Selective record fetch: given index rows (path, offset, length),
    range-read and parse ONLY those records — the re-crawl/re-extract
    path a 100 TB corpus uses instead of rescanning every file. Each
    index row costs one `opener(path, offset, length) -> bytes` call
    (injectable: an HTTP/S3 Range GET in production, local seek+read by
    default) plus one gzip-member inflate. Filters on the index prune
    work BEFORE any payload byte moves — the whole point of the index.
    Returns the read_warc schema (url, warc_ts, html)."""
    import pandas as pd

    fetch = opener or _range_read_local

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            urls, tss, htmls = [], [], []
            for p, off, ln in zip(b["path"], b["offset"], b["length"]):
                for url, epoch, html in parse_warc(
                        fetch(str(p), int(off), int(ln))):
                    urls.append(url)
                    tss.append(datetime.fromtimestamp(epoch, tz=timezone.utc)
                               .replace(tzinfo=None))
                    htmls.append(html)
            yield pd.DataFrame({"url": urls, "warc_ts": tss, "html": htmls})

    return (index.select("path", "offset", "length")
                 .mapInPandas(run, schema=WARC_SCHEMA))
