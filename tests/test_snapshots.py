"""Snapshot-isolated tables (sources/snapshots.py): pinned reads, time
travel, atomic commits."""

import os

import pytest
from pyspark.sql import functions as F

from avecado_spark.sources import snapshots as snap


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(F.col("id").alias("k"))


def test_append_overwrite_and_time_travel(spark, tmp_path):
    t = str(tmp_path / "tbl")
    s1 = snap.append(t, _df(spark, 0, 10))
    s2 = snap.append(t, _df(spark, 10, 15))
    s3 = snap.overwrite(t, _df(spark, 100, 103))
    assert (s1, s2, s3) == (1, 2, 3)
    assert snap.read(spark, t).count() == 3                 # current
    assert snap.read(spark, t, snapshot_id=2).count() == 15  # travel
    assert snap.read(spark, t, snapshot_id=1).count() == 10
    h = snap.history(t)
    assert [m["id"] for m in h] == [1, 2, 3]
    assert [m["op"] for m in h] == ["append", "append", "overwrite"]
    assert [m["rows"] for m in h] == [10, 15, 3]


def test_append_counts_only_new_files(spark, tmp_path, monkeypatch):
    """Append cost is O(new data): the manifest rows field comes from the
    parent manifest + a count over ONLY the newly written files — the
    carried files are never re-read at commit time."""
    t = str(tmp_path / "tbl")
    snap.append(t, _df(spark, 0, 10))
    seen = []
    orig = type(spark.read).parquet

    def spy(self, *paths):
        seen.append(paths)
        return orig(self, *paths)

    monkeypatch.setattr(type(spark.read), "parquet", spy)
    snap.append(t, _df(spark, 10, 15))
    h = snap.history(t)
    n_new = len(h[-1]["files"]) - len(h[0]["files"])
    commit_reads = [p for p in seen if all("stage-" not in x for x in p)]
    assert commit_reads, "commit should count the new files"
    assert all(len(p) == n_new for p in commit_reads)  # new files only
    assert h[-1]["rows"] == 15


def test_reader_pins_snapshot_across_commits(spark, tmp_path):
    """The Iceberg property the north rule leans on: a scan started at
    snapshot N keeps seeing N while the table moves on — long jobs are
    repeatable over a live corpus."""
    t = str(tmp_path / "tbl")
    snap.append(t, _df(spark, 0, 20))
    pinned = snap.read(spark, t)          # pins snapshot 1's file list
    snap.append(t, _df(spark, 20, 50))    # concurrent commit
    snap.overwrite(t, _df(spark, 0, 1))   # and a full rewrite
    assert pinned.count() == 20           # still exactly snapshot 1
    assert pinned.agg(F.sum("k")).first()[0] == sum(range(20))
    assert snap.read(spark, t).count() == 1


def test_no_head_until_manifest_durable(spark, tmp_path):
    t = str(tmp_path / "tbl")
    snap.append(t, _df(spark, 0, 5))
    # every file HEAD can point at exists and is complete json
    sid = snap.current_snapshot(t)
    assert sid == 1
    assert os.path.exists(os.path.join(t, f"snap-{sid:06d}.json"))
    # no stray .tmp files survive a commit
    assert not [f for f in os.listdir(t) if f.endswith(".tmp")]


def test_read_empty_or_missing_raises(spark, tmp_path):
    with pytest.raises(FileNotFoundError):
        snap.read(spark, str(tmp_path / "none"))


# ---------------------------------------------------------------------------
# the executable catalog contract (tests/snapshot_contract.py) run against
# the local implementation — a future Iceberg adapter subclasses the same
# suite unchanged
# ---------------------------------------------------------------------------

import sys as _sys

_sys.path.insert(0, os.path.dirname(__file__))
from snapshot_contract import SnapshotCatalogContract  # noqa: E402


class TestLocalSnapshotCatalog(SnapshotCatalogContract):
    catalog = snap
