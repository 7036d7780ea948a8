#!/usr/bin/env python3
"""spark-submit entry: WARC crawl files → snapshot-committed pages table.

    spark-submit --py-files avecado_spark.zip jobs/ingest_warc.py \
        --warc '/data/crawl/*.warc.gz' --table /tmp/pages_table

The ingestion seam of the pipeline: Common-Crawl-layout WARC files
(sources/warc.py; one file = one task) parsed to (url, warc_ts, html),
extracted text attached (the byte-identical html→text transform), and
the batch committed as ONE atomic snapshot of an Iceberg-shaped table
(sources/snapshots.py) — re-running the job on new files appends a new
snapshot; readers pinned to an older snapshot are unaffected; a failed
run commits nothing (HEAD swaps only after the manifest is durable).

Prints one JSON line: {"snapshot": id, "rows": n, "table": path}.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def ingest_warc(spark, warc_glob: str, table: str,
                index_table: str | None = None) -> dict:
    """Importable driver (tests drive a tmp dir). With `index_table`, the
    CDX-style record index (url, offset, length — sources/warc.warc_index)
    is committed alongside the pages, Common Crawl's actual layout: the
    WARC bytes stay the durable archive and the index makes any record
    range-readable later without a rescan."""
    from avecado_spark.operators.webgraph import extract_text
    from avecado_spark.sources import snapshots
    from avecado_spark.sources.warc import read_warc, warc_index

    pages = read_warc(spark, warc_glob)
    docs = pages.join(extract_text(pages), "url")
    sid = snapshots.append(table, docs)
    n = snapshots.read(spark, table, snapshot_id=sid).count()
    out = {"snapshot": sid, "rows": n, "table": table}
    if index_table is not None:
        isid = snapshots.append(index_table, warc_index(spark, warc_glob))
        out["index_snapshot"] = isid
        out["index_table"] = index_table
    return out


def main(argv):
    ap = argparse.ArgumentParser()
    ap.add_argument("--warc", required=True)
    ap.add_argument("--table", required=True)
    ap.add_argument("--index-table", default=None,
                    help="also commit the CDX-style record index to this "
                         "snapshot table")
    args = ap.parse_args(argv)

    from avecado_spark.api import spark_session
    spark = spark_session(app="ingest_warc")
    spark.sparkContext.setLogLevel("WARN")
    print(json.dumps(ingest_warc(spark, args.warc, args.table,
                             index_table=args.index_table)))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
