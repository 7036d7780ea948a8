"""Executable contract for snapshot-isolated table catalogs.

sources/snapshots.py documents that a real catalog (Iceberg REST/Hive)
swaps in at the module boundary; this suite makes that claim executable:
any object exposing the five-function interface

    append(table, df) -> snapshot_id
    overwrite(table, df) -> snapshot_id
    read(spark, table, snapshot_id=None) -> DataFrame
    history(table) -> [ {id, parent, op, rows, ...} ... ]
    current_snapshot(table) -> snapshot_id | None

passes these tests or is not a snapshot catalog. Subclass with the
implementation under test:

    from tests.snapshot_contract import SnapshotCatalogContract
    class TestLocalSnapshots(SnapshotCatalogContract):
        catalog = my_catalog_module

The local implementation's subclass lives in tests/test_snapshots.py; a
future Iceberg adapter imports this module unchanged.
"""

import pytest
from pyspark.sql import functions as F


class SnapshotCatalogContract:
    catalog = None  # subclass responsibility

    def _df(self, spark, lo, hi):
        return spark.range(lo, hi).select(F.col("id").alias("k"))

    def test_contract_ids_history_and_ops(self, spark, tmp_path):
        """Snapshot ids advance monotonically; history records op,
        parentage, and exact row counts."""
        c = self.catalog
        t = str(tmp_path / "tbl")
        s1 = c.append(t, self._df(spark, 0, 10))
        s2 = c.append(t, self._df(spark, 10, 15))
        s3 = c.overwrite(t, self._df(spark, 100, 103))
        assert s1 < s2 < s3
        assert c.current_snapshot(t) == s3
        h = c.history(t)
        assert [m["id"] for m in h] == [s1, s2, s3]
        assert [m["op"] for m in h] == ["append", "append", "overwrite"]
        assert [m["rows"] for m in h] == [10, 15, 3]
        assert [m["parent"] for m in h] == [None, s1, s2]

    def test_contract_time_travel(self, spark, tmp_path):
        """Every committed snapshot stays readable and byte-stable after
        later commits, including an overwrite."""
        c = self.catalog
        t = str(tmp_path / "tbl")
        s1 = c.append(t, self._df(spark, 0, 10))
        want1 = sorted(r.k for r in c.read(spark, t, s1).collect())
        s2 = c.append(t, self._df(spark, 10, 15))
        c.overwrite(t, self._df(spark, 100, 103))
        assert sorted(r.k for r in c.read(spark, t, s1).collect()) == want1
        assert c.read(spark, t, s2).count() == 15
        assert sorted(r.k for r in c.read(spark, t).collect()) \
            == [100, 101, 102]

    def test_contract_reader_pins_under_concurrent_commit(self, spark,
                                                          tmp_path):
        """A DataFrame obtained from read() sees exactly the snapshot
        current at call time — commits that land AFTER the read never
        change what it returns (snapshot isolation, the Iceberg reader
        guarantee)."""
        c = self.catalog
        t = str(tmp_path / "tbl")
        c.append(t, self._df(spark, 0, 10))
        pinned = c.read(spark, t)
        c.append(t, self._df(spark, 10, 50))
        c.overwrite(t, self._df(spark, 500, 501))
        assert pinned.count() == 10
        assert sorted(r.k for r in pinned.collect()) == list(range(10))

    def test_contract_failed_commit_leaves_head(self, spark, tmp_path):
        """A commit whose data write fails must not move HEAD or corrupt
        the table (commit atomicity)."""
        c = self.catalog
        t = str(tmp_path / "tbl")
        s1 = c.append(t, self._df(spark, 0, 10))

        @F.udf("long")
        def boom(x):
            raise RuntimeError("injected write failure")

        bad = spark.range(0, 5).select(boom(F.col("id")).alias("k"))
        with pytest.raises(Exception):
            c.append(t, bad)
        assert c.current_snapshot(t) == s1
        assert c.read(spark, t).count() == 10

    def test_contract_missing_table_raises(self, spark, tmp_path):
        c = self.catalog
        with pytest.raises(Exception):
            c.read(spark, str(tmp_path / "nope"))
        assert c.current_snapshot(str(tmp_path / "nope")) is None
