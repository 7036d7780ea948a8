"""sitemaps.org parsing (functions/sitemap.py), the seed operator, and
seeded crawl rounds."""

import gzip

import pytest

from avecado_spark.functions.sitemap import parse_sitemap, sitemap_urls

NS = 'xmlns="http://www.sitemaps.org/schemas/sitemap/0.9"'


def _urlset(entries):
    rows = "".join(
        f"<url><loc>{u}</loc>"
        + (f"<lastmod>{lm}</lastmod>" if lm else "") + "</url>"
        for u, lm in entries)
    return f'<?xml version="1.0"?><urlset {NS}>{rows}</urlset>'.encode()


def test_parse_urlset_lastmod_and_gzip():
    data = _urlset([
        ("https://h.example/a", "2024-03-05"),
        ("https://h.example/b", "2024-03-05T12:30:00+00:00"),
        ("https://h.example/c", "2024-03-05T12:30:00Z"),
        ("https://h.example/d", None),
        ("https://h.example/e", "not a date"),
    ])
    kind, got = parse_sitemap(data)
    assert kind == "urlset"
    assert got[0] == ("https://h.example/a", 1709596800)
    assert got[1][1] == got[2][1] == 1709641800
    assert got[3] == ("https://h.example/d", None)
    assert got[4][1] is None                        # bad date degrades
    assert parse_sitemap(gzip.compress(data))[1] == got  # .xml.gz


def test_sitemapindex_one_level_only():
    sub_a = _urlset([("https://h.example/1", None)])
    sub_b = _urlset([("https://h.example/2", None),
                     ("https://h.example/3", None)])
    index = (f'<?xml version="1.0"?><sitemapindex {NS}>'
             '<sitemap><loc>https://h.example/a.xml</loc></sitemap>'
             '<sitemap><loc>https://h.example/b.xml</loc></sitemap>'
             '</sitemapindex>').encode()
    store = {"https://h.example/a.xml": sub_a,
             "https://h.example/b.xml": sub_b}
    got = sitemap_urls(index, fetch=store.__getitem__)
    assert [u for u, _ in got] == [f"https://h.example/{k}"
                                   for k in (1, 2, 3)]
    with pytest.raises(ValueError, match="fetch"):
        sitemap_urls(index)                        # index needs fetch
    nested = {"https://h.example/a.xml": index,
              "https://h.example/b.xml": sub_b}
    with pytest.raises(ValueError, match="nested"):
        sitemap_urls(index, fetch=nested.__getitem__)
    with pytest.raises(ValueError, match="not a sitemap"):
        parse_sitemap(b"<html></html>")


def test_sitemap_seeds_operator_and_seeded_round(spark, tmp_path):
    """sitemap_seeds flattens the table distributedly; a seeded crawl
    round fetches sitemap urls nothing links to yet, and already-known
    urls are not re-fetched."""
    from avecado_spark.operators.webgraph import sitemap_seeds
    from avecado_spark.sources import snapshots
    from avecado_spark.sources.warc import warc_bytes
    from jobs.crawl_round import run_crawl_round, synthetic_fetcher
    from jobs.ingest_warc import ingest_warc

    sm = _urlset([("https://h.example/fresh1", "2024-03-05"),
                  ("https://h.example/fresh2", None),
                  ("https://h.example/seed", None)])   # already in corpus
    sitemaps = spark.createDataFrame([("h.example", bytearray(sm))],
                                     "host string, sitemap_xml binary")
    seeds = sitemap_seeds(sitemaps)
    rows = {r.url: r.lastmod_ts for r in seeds.collect()}
    assert set(rows) == {"https://h.example/fresh1",
                         "https://h.example/fresh2",
                         "https://h.example/seed"}
    assert rows["https://h.example/fresh1"] is not None

    seed_page = [("https://h.example/seed", 1704067200,
                  b'<a href="https://h.example/linked">x</a>')]
    d = tmp_path / "seed"
    d.mkdir()
    (d / "seed.warc.gz").write_bytes(warc_bytes(seed_page))
    table = str(tmp_path / "pages_table")
    ingest_warc(spark, str(d / "*.warc.gz"), table)

    m = run_crawl_round(spark, table, str(tmp_path / "crawl"),
                        synthetic_fetcher, top_k=10, seeds=seeds)
    # frontier = 1 linked + 2 fresh sitemap urls (the in-corpus seed url
    # is excluded)
    assert m["frontier_before"] == 3
    assert m["fetched"] == 3
    urls = {r.url for r in
            snapshots.read(spark, table).select("url").collect()}
    assert {"https://h.example/linked", "https://h.example/fresh1",
            "https://h.example/fresh2"} <= urls
    assert m["frontier_after"] == 0
