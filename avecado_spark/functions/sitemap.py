"""sitemaps.org XML parsing — url discovery's other half (robots.txt
names the sitemaps; the sitemaps name the urls a host WANTS crawled).

`parse_sitemap` handles both document kinds from the published protocol
(<urlset> of <url><loc>/<lastmod>, and <sitemapindex> of <sitemap><loc>)
with namespace-tolerant tag matching, gzip payloads (sitemaps ship as
.xml.gz), W3C datetime lastmod (date-only or full timestamp), and the
spec's 50k-entry cap enforced loudly. `sitemap_urls` flattens one level
of index indirection given a fetch function.
"""

from __future__ import annotations

import gzip
import xml.etree.ElementTree as ET
from datetime import datetime, timezone


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1].lower()


def _lastmod_epoch(text: str | None) -> int | None:
    if not text:
        return None
    t = text.strip()
    try:
        if len(t) == 10:                       # YYYY-MM-DD
            dt = datetime.strptime(t, "%Y-%m-%d")
            return int(dt.replace(tzinfo=timezone.utc).timestamp())
        dt = datetime.fromisoformat(t.replace("Z", "+00:00"))
        if dt.tzinfo is None:
            dt = dt.replace(tzinfo=timezone.utc)
        return int(dt.timestamp())
    except ValueError:
        return None


def parse_sitemap(data: bytes) -> tuple[str, list[tuple[str, int | None]]]:
    """One sitemap document → (kind, entries): kind is "urlset" or
    "sitemapindex"; entries are (loc, lastmod_epoch|None). Gzip payloads
    decompress transparently; entries beyond the protocol's 50,000 cap
    raise (a malformed generator, not data to ingest silently)."""
    if data[:2] == b"\x1f\x8b":
        data = gzip.decompress(data)
    root = ET.fromstring(data)
    kind = _local(root.tag)
    if kind not in ("urlset", "sitemapindex"):
        raise ValueError(f"not a sitemap document: root <{kind}>")
    child = "url" if kind == "urlset" else "sitemap"
    out: list[tuple[str, int | None]] = []
    for el in root:
        if _local(el.tag) != child:
            continue
        loc, lastmod = None, None
        for f in el:
            n = _local(f.tag)
            if n == "loc":
                loc = (f.text or "").strip()
            elif n == "lastmod":
                lastmod = _lastmod_epoch(f.text)
        if loc:
            out.append((loc, lastmod))
    if len(out) > 50_000:
        raise ValueError(f"sitemap exceeds the protocol's 50k cap "
                         f"({len(out)} entries)")
    return kind, out


def sitemap_urls(data: bytes, fetch=None) -> list[tuple[str, int | None]]:
    """All page urls of one sitemap, following ONE level of
    <sitemapindex> indirection via `fetch(loc) -> bytes` (the protocol
    forbids nested indexes). Without `fetch`, an index raises."""
    kind, entries = parse_sitemap(data)
    if kind == "urlset":
        return entries
    if fetch is None:
        raise ValueError("sitemapindex needs a fetch function to follow")
    out: list[tuple[str, int | None]] = []
    for loc, _ in entries:
        sub_kind, sub = parse_sitemap(fetch(loc))
        if sub_kind != "urlset":
            raise ValueError(f"nested sitemapindex at {loc} "
                             "(forbidden by the protocol)")
        out.extend(sub)
    return out
