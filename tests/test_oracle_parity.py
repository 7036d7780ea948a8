"""Local replica of the driver's correctness gate: run every registered
query in Spark AND its DuckDB oracle at sf0.01, compare row count, schema
arity, and order-insensitive values (columns sorted by name)."""

import math
import os

import pytest

from avecado_spark import queries as q

SF_ORACLE = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.10g}"
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v)


def _canon(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    return sorted(tuple(_norm(r[i]) for i in order) for r in rows)


ORACLES = q.oracle_sql()
CASES = sorted(ORACLES.keys())


@pytest.mark.parametrize("name", CASES)
def test_oracle_parity(spark, duck, name):
    fn = q.queries()[name]
    sdf = fn(spark, SF_ORACLE)
    scols = sdf.columns
    srows = sdf.collect()

    rel = duck.sql(ORACLES[name])
    dcols = [c for c in rel.columns]
    drows = rel.fetchall()

    assert sorted(c.lower() for c in scols) == sorted(c.lower() for c in dcols), \
        f"schema mismatch: spark={scols} duckdb={dcols}"
    assert len(srows) == len(drows), f"row count: spark={len(srows)} duckdb={len(drows)}"
    assert _canon(srows, [c.lower() for c in scols]) == _canon(drows, [c.lower() for c in dcols])
