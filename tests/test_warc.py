"""WARC reader (sources/warc.py): byte-level round-trip, CC gzip-member
layout, truncation behavior, and the ingest job into a snapshot table."""

import os
import gzip

import pytest

from avecado_spark.sources.warc import parse_warc, read_warc, warc_bytes

RECS = [
    ("https://h.example/a", 1704067200, b"<html><body>A</body></html>"),
    ("https://h.example/b", 1704067260,
     b"<html><p>B \xe2\x9c\x93</p></html>"),       # utf-8 body
    ("https://h.example/c", 1704153600, b""),       # empty body
]


def test_parse_roundtrip_plain_and_member_gzip():
    for member_gzip in (False, True):
        data = warc_bytes(RECS, member_gzip=member_gzip)
        assert parse_warc(data) == RECS
    # whole-stream gzip (non-CC layout) also decompresses fine
    assert parse_warc(gzip.compress(warc_bytes(RECS, member_gzip=False))) \
        == RECS


def test_member_gzip_is_real_member_concatenation():
    data = warc_bytes(RECS)
    # each record its own gzip magic — count members
    assert data.count(b"\x1f\x8b\x08") >= len(RECS)


def test_truncated_tail_stops_clean_but_bad_length_raises():
    data = warc_bytes(RECS, member_gzip=False)
    assert parse_warc(data[: len(data) - 20]) == RECS[:2]  # truncated tail
    import re
    bad = re.sub(rb"Content-Length: \d+", b"Content-Length: xx", data,
                 count=1)  # corrupt the first (WARC-level) length header
    with pytest.raises(ValueError, match="Content-Length"):
        parse_warc(bad)


def test_warc11_fractional_seconds_and_bad_dates():
    """WARC 1.1 allows fractional seconds in WARC-Date; a malformed date
    degrades to epoch 0 per-record instead of aborting the file."""
    data = warc_bytes(RECS[:1], member_gzip=False)
    frac = data.replace(b"2024-01-01T00:00:00Z", b"2024-01-01T00:00:00.123Z")
    assert frac != data
    assert parse_warc(frac) == RECS[:1]  # int() truncates the .123
    bad = data.replace(b"2024-01-01T00:00:00Z", b"not-a-date-atall-xyZ")
    assert parse_warc(bad) == [(RECS[0][0], 0, RECS[0][2])]


def test_non_response_records_skipped():
    data = warc_bytes(RECS[:1], member_gzip=False)
    meta = (b"WARC/1.0\r\nWARC-Type: metadata\r\n"
            b"Content-Length: 4\r\n\r\nmeta\r\n\r\n")
    assert parse_warc(meta + data) == RECS[:1]


def test_read_warc_distributed_and_ingest_job(spark, tmp_path):
    import sys
    import os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from avecado_spark.sources import snapshots
    from jobs.ingest_warc import ingest_warc

    # two CC-layout warc.gz files
    (tmp_path / "crawl").mkdir()
    (tmp_path / "crawl" / "part-0.warc.gz").write_bytes(warc_bytes(RECS[:2]))
    (tmp_path / "crawl" / "part-1.warc.gz").write_bytes(warc_bytes(RECS[2:]))

    got = {(r["url"], int(r["warc_ts"].timestamp()), bytes(r["html"]))
           for r in read_warc(spark, str(tmp_path / "crawl")).collect()}
    assert got == set(RECS)

    table = str(tmp_path / "pages_table")
    m1 = ingest_warc(spark, str(tmp_path / "crawl" / "part-0.warc.gz"), table)
    assert (m1["snapshot"], m1["rows"]) == (1, 2)
    m2 = ingest_warc(spark, str(tmp_path / "crawl" / "part-1.warc.gz"), table)
    assert (m2["snapshot"], m2["rows"]) == (2, 3)   # cumulative snapshot
    tbl = snapshots.read(spark, table)
    row = {r["url"]: r for r in tbl.collect()}
    assert set(row) == {u for u, _, _ in RECS}
    # extracted text rode along, byte-identical to the pure transform
    from avecado_spark.functions.htmltext import html_to_text
    for u, _, h in RECS:
        assert row[u]["text_x"] == html_to_text(h)
    # time travel still sees only the first file's rows
    assert snapshots.read(spark, table, snapshot_id=1).count() == 2


def test_build_warc_index_range_reads_byte_identical():
    """The index invariant: parse_warc(data[offset:offset+length]) of any
    indexed record equals that record from the full scan — both CC
    member-gzip (member byte ranges) and plain (record byte ranges)."""
    from avecado_spark.sources.warc import build_warc_index

    for member_gzip in (True, False):
        data = warc_bytes(RECS, member_gzip=member_gzip)
        idx = build_warc_index(data)
        assert [(u, e) for u, _, _, e in idx] \
            == [(u, e) for u, e, _ in RECS]
        full = parse_warc(data)
        for k, (url, off, ln, _) in enumerate(idx):
            got = parse_warc(data[off:off + ln])
            assert got == [full[k]], (member_gzip, k)
        # ranges tile the member-gzip file exactly (each record one member)
        if member_gzip:
            assert idx[0][1] == 0
            for (_, o1, l1, _), (_, o2, _, _) in zip(idx, idx[1:]):
                assert o1 + l1 == o2
            assert idx[-1][1] + idx[-1][2] == len(data)


def test_warc_index_and_indexed_read_distributed(spark, tmp_path):
    """warc_index over two files + read_warc_indexed on a FILTERED index:
    only the selected records come back, byte-identical to the full
    distributed scan, without reading the unselected file ranges."""
    from avecado_spark.sources.warc import read_warc_indexed, warc_index

    d = tmp_path / "crawl"
    d.mkdir()
    (d / "part-0.warc.gz").write_bytes(warc_bytes(RECS[:2]))
    (d / "part-1.warc.gz").write_bytes(warc_bytes(RECS[2:]))

    idx = warc_index(spark, str(d))
    rows = sorted(idx.collect(), key=lambda r: r.url)
    assert [r.url for r in rows] == [u for u, _, _ in sorted(RECS)]

    full = {r.url: (r.warc_ts, bytes(r.html))
            for r in __import__("avecado_spark.sources.warc",
                                fromlist=["read_warc"])
            .read_warc(spark, str(d)).collect()}

    # selective re-read: two of three records, cross-file
    want = {"https://h.example/a", "https://h.example/c"}
    got = read_warc_indexed(idx.where(idx.url.isin(*want))).collect()
    assert {r.url for r in got} == want
    for r in got:
        assert (r.warc_ts, bytes(r.html)) == full[r.url]

    # opener injection: count range calls, byte windows honored
    calls = []
    def opener(path, off, ln):
        calls.append((path, off, ln))
        from urllib.parse import urlparse
        with open(urlparse(path).path if path.startswith("file:") else path, "rb") as f:
            f.seek(off)
            return f.read(ln)
    one = idx.where(idx.url == "https://h.example/b")
    got2 = read_warc_indexed(one, opener=opener).collect()
    assert len(got2) == 1 and bytes(got2[0].html) == RECS[1][2]


def test_crawl_round_loop_closure(spark, tmp_path):
    """frontier → fetch → WARC → snapshot append closes the loop: two
    rounds monotonically shrink the frontier, every round's fetches are
    durable WARC files, and snapshot time travel stays intact (the seed
    snapshot reads identically after both appends)."""
    from avecado_spark.sources import snapshots
    from jobs.crawl_round import run_crawl_round, synthetic_fetcher
    from jobs.ingest_warc import ingest_warc

    # seed corpus: 2 pages linking to 3 distinct missing urls
    seed = [
        ("https://h.example/seed0", 1704067200,
         b'<a href="https://h.example/m0">x</a>'
         b'<a href="https://h.example/m1">y</a>'),
        ("https://h.example/seed1", 1704067201,
         b'<a href="https://h.example/m1">y</a>'
         b'<a href="https://h.example/m2">z</a>'),
    ]
    d = tmp_path / "seed"
    d.mkdir()
    (d / "seed.warc.gz").write_bytes(warc_bytes(seed))
    table = str(tmp_path / "pages_table")
    ingest_warc(spark, str(d / "*.warc.gz"), table)
    seed_sid = snapshots.current_snapshot(table)
    seed_rows = sorted(r.url for r in
                       snapshots.read(spark, table, seed_sid).collect())

    warc_dir = str(tmp_path / "crawl")
    m1 = run_crawl_round(spark, table, warc_dir, synthetic_fetcher,
                         top_k=2, round_ts=1704070000)
    assert m1["frontier_before"] == 3
    assert m1["fetched"] == 2 and m1["failed"] == 0
    assert m1["frontier_after"] == 1       # fetched pages self-link only
    m2 = run_crawl_round(spark, table, warc_dir, synthetic_fetcher,
                         top_k=2, round_ts=1704080000)
    assert m2["frontier_before"] == 1
    assert m2["fetched"] == 1
    assert m2["frontier_after"] == 0       # loop drained

    # the fetched bytes are durable, indexable WARC
    from avecado_spark.sources.warc import warc_index
    idx = warc_index(spark, os.path.join(warc_dir, "round-*")).collect()
    assert len(idx) == 3

    # time travel: the seed snapshot is untouched by two appends
    assert sorted(r.url for r in
                  snapshots.read(spark, table, seed_sid).collect()) \
        == seed_rows
    assert snapshots.current_snapshot(table) == seed_sid + 2
    # and the head now contains seed + both rounds
    assert snapshots.read(spark, table).count() == 5


def test_ingest_with_index_table(spark, tmp_path):
    """--index-table commits the CDX record index next to the pages (the
    CC layout): reading one url's row from the index snapshot and
    range-fetching it returns the same html the pages table holds."""
    from avecado_spark.sources import snapshots
    from avecado_spark.sources.warc import read_warc_indexed
    from jobs.ingest_warc import ingest_warc

    d = tmp_path / "crawl"
    d.mkdir()
    (d / "a.warc.gz").write_bytes(warc_bytes(RECS))
    table = str(tmp_path / "pages")
    itable = str(tmp_path / "pages_index")
    m = ingest_warc(spark, str(d / "*.warc.gz"), table, index_table=itable)
    assert m["index_snapshot"] == 1 and m["rows"] == 3

    idx = snapshots.read(spark, itable)
    assert idx.count() == 3
    one = idx.where(idx.url == RECS[1][0])
    got = read_warc_indexed(one).collect()
    page = {r.url: bytes(r.html)
            for r in snapshots.read(spark, table).collect()}
    assert len(got) == 1
    assert bytes(got[0].html) == page[RECS[1][0]] == RECS[1][2]
