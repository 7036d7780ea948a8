"""Local replica of the driver's correctness gate: run every registered
query in Spark AND its DuckDB oracle at sf0.01, compare row count, schema
arity, and order-insensitive values (columns sorted by name)."""

import math
import os

import pytest

from avecado_spark import queries as q

SF_ORACLE = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")


def _norm(v):
    # Type-tagged normalization: an int and a float that print the same must
    # NOT compare equal — the driver's gate goes through pandas, where a
    # DuckDB HUGEINT (sum of BIGINT) decays to float64 and hash-mismatches a
    # Spark BIGINT even when values agree (round-1 lesson: 6 queries).
    if isinstance(v, bool):
        return f"b:{v}"
    if isinstance(v, float):
        if math.isnan(v):
            return "f:nan"
        return f"f:{v:.10g}"
    if isinstance(v, int):
        return f"i:{v}"
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

    # Driver-style type gate: the driver goes through pandas, where a DuckDB
    # HUGEINT (sum of BIGINT) decays to float64 and hash-mismatches a Spark
    # BIGINT even when the values print identically (round-1 lesson: 6
    # queries failed on exactly this). Compare coarse type kinds per column.
    import pyarrow as pa

    def _kind(t):
        if pa.types.is_integer(t):
            return "int"
        if pa.types.is_floating(t):
            return "float"
        if pa.types.is_decimal(t):
            return "decimal"   # never matches: Spark side maps int/float
        if pa.types.is_boolean(t):
            return "bool"
        if pa.types.is_string(t) or pa.types.is_large_string(t):
            return "str"
        if pa.types.is_binary(t) or pa.types.is_large_binary(t):
            return "bytes"
        if pa.types.is_date(t):
            return "date"
        if pa.types.is_timestamp(t):
            return "ts"
        return str(t)

    _SPARK_KIND = {"tinyint": "int", "smallint": "int", "int": "int",
                   "bigint": "int", "float": "float", "double": "float",
                   "boolean": "bool", "string": "str", "binary": "bytes",
                   "date": "date", "timestamp": "ts", "timestamp_ntz": "ts"}
    duck_kinds = {f.name.lower(): _kind(f.type)
                  for f in rel.limit(0).arrow().schema}
    spark_kinds = {c.lower(): _SPARK_KIND.get(t, t) for c, t in sdf.dtypes}
    for col in spark_kinds:
        if col in duck_kinds:
            assert spark_kinds[col] == duck_kinds[col], \
                f"type kind mismatch on {col}: spark={spark_kinds[col]} duckdb={duck_kinds[col]}"

    assert sorted(c.lower() for c in scols) == sorted(c.lower() for c in dcols), \
        f"schema mismatch: spark={scols} duckdb={dcols}"
    assert len(srows) == len(drows), f"row count: spark={len(srows)} duckdb={len(drows)}"
    assert _canon(srows, [c.lower() for c in scols]) == _canon(drows, [c.lower() for c in dcols])


def test_tpch_q6_duckdb_parity(spark, duck):
    """tpch_q6_forecast rotated out of the registry in r06 (the 50-row
    artifact cap; s2_cell_docs_l12 took the slot) — its exact-oracle
    parity lives here instead, same gate as the registered rows."""
    from avecado_spark.queries import TPCH_Q6_SQL, tpch_q6_forecast
    sdf = tpch_q6_forecast(spark, SF_ORACLE)
    srows = sdf.collect()
    drows = duck.sql(TPCH_Q6_SQL).fetchall()
    assert len(srows) == len(drows) == 1
    assert _canon(srows, [c.lower() for c in sdf.columns]) \
        == _canon(drows, ["revenue_e4", "n_rows"])


def test_tpch_q12_duckdb_parity(spark, duck):
    """tpch_q12_priority rotated out of the registry in r06 (the 50-row
    artifact cap; j1e_pip_s2cover took the slot) — its exact-oracle
    parity lives here instead, same gate as the registered rows."""
    from avecado_spark.queries import TPCH_Q12_SQL, tpch_q12_priority
    sdf = tpch_q12_priority(spark, SF_ORACLE)
    srows = sdf.collect()
    drows = duck.sql(TPCH_Q12_SQL).fetchall()
    assert len(srows) == len(drows)
    assert _canon(srows, [c.lower() for c in sdf.columns]) \
        == _canon(drows, ["o_orderpriority", "returned_lines", "all_lines"])


def test_tpch_q3_duckdb_parity(spark, duck):
    """tpch_q3_shipping rotated out of the registry in r06 (the 50-row
    artifact cap; web_extract_text took the slot) — its exact-oracle
    parity lives here instead, same gate as the registered rows."""
    from avecado_spark.queries import TPCH_Q3_SQL, tpch_q3_shipping
    sdf = tpch_q3_shipping(spark, SF_ORACLE)
    srows = sdf.collect()
    rel = duck.sql(TPCH_Q3_SQL)
    drows = rel.fetchall()
    assert len(srows) == len(drows) == 10
    assert _canon(srows, [c.lower() for c in sdf.columns]) \
        == _canon(drows, [c.lower() for c in rel.columns])


def test_tpch_q10_duckdb_parity(spark, duck):
    """tpch_q10_returns rotated out of the registry in r06 (the 50-row
    artifact cap; web_extract_links took the slot) — its exact-oracle
    parity lives here instead, same gate as the registered rows."""
    from avecado_spark.queries import TPCH_Q10_SQL, tpch_q10_returns
    sdf = tpch_q10_returns(spark, SF_ORACLE)
    srows = sdf.collect()
    rel = duck.sql(TPCH_Q10_SQL)
    drows = rel.fetchall()
    assert len(srows) == len(drows) == 20
    assert _canon(srows, [c.lower() for c in sdf.columns]) \
        == _canon(drows, [c.lower() for c in rel.columns])


def test_tpch_q18_duckdb_parity(spark, duck):
    """tpch_q18_bigorders rotated out of the registry in r06 (the 50-row
    artifact cap; web_pagerank_top took the slot) — its exact-oracle
    parity lives here instead, same gate as the registered rows."""
    from avecado_spark.queries import TPCH_Q18_SQL, tpch_q18_bigorders
    sdf = tpch_q18_bigorders(spark, SF_ORACLE)
    srows = sdf.collect()
    rel = duck.sql(TPCH_Q18_SQL)
    drows = rel.fetchall()
    assert len(srows) == len(drows) > 0
    assert _canon(srows, [c.lower() for c in sdf.columns]) \
        == _canon(drows, [c.lower() for c in rel.columns])


def test_tpch_q14_duckdb_parity(spark, duck):
    """tpch_q14_promo rotated out of the registry in r06 (the 50-row
    artifact cap; sim_ann_sq8 took the slot) — its exact-oracle parity
    lives here instead, same gate as the registered rows."""
    from avecado_spark.queries import TPCH_Q14_SQL, tpch_q14_promo
    sdf = tpch_q14_promo(spark, SF_ORACLE)
    srows = sdf.collect()
    drows = duck.sql(TPCH_Q14_SQL).fetchall()
    assert len(srows) == len(drows) == 1
    assert _canon(srows, [c.lower() for c in sdf.columns]) \
        == _canon(drows, ["promo_e4", "total_e4"])


def test_web_indegree_duckdb_parity(spark, duck):
    """In-degree/anchor signals (unregistered: 50-row artifact cap) —
    exact-oracle parity, same gate as the registered rows."""
    from avecado_spark.queries import WEB_INDEGREE_SQL, web_indegree
    sdf = web_indegree(spark, SF_ORACLE)
    srows = sdf.collect()
    rel = duck.sql(WEB_INDEGREE_SQL)
    drows = rel.fetchall()
    assert len(srows) == len(drows) > 0
    assert _canon(srows, [c.lower() for c in sdf.columns]) \
        == _canon(drows, [c.lower() for c in rel.columns])


def test_web_hits_duckdb_parity(spark, duck):
    """Integer HITS (unregistered: 50-row artifact cap) — exact-oracle
    parity, same gate as the registered rows."""
    from avecado_spark.queries import WEB_HITS_SQL, web_hits
    sdf = web_hits(spark, SF_ORACLE)
    srows = sdf.collect()
    rel = duck.sql(WEB_HITS_SQL)
    drows = rel.fetchall()
    assert len(srows) == len(drows) > 0
    # non-vacuous: scores differentiate (not all-equal, zeros exist for
    # sink/source-free structure only if present)
    assert len({r["auth_i"] for r in srows}) > 10
    assert _canon(srows, [c.lower() for c in sdf.columns]) \
        == _canon(drows, [c.lower() for c in rel.columns])


def test_web_sample_split_duckdb_parity(spark, duck):
    """Deterministic md5-bucket sample + split (unregistered: 50-row
    artifact cap) — exact-oracle parity, same gate as registered rows."""
    from avecado_spark.queries import WEB_SAMPLE_SPLIT_SQL, web_sample_split
    sdf = web_sample_split(spark, SF_ORACLE)
    srows = sdf.collect()
    rel = duck.sql(WEB_SAMPLE_SPLIT_SQL)
    drows = rel.fetchall()
    assert len(srows) == len(drows) > 0
    # the sample is a real fraction (neither empty nor everything) and
    # every split is populated
    splits = {r["split"] for r in srows}
    assert splits == {"train", "valid", "test"}
    assert _canon(srows, [c.lower() for c in sdf.columns]) \
        == _canon(drows, [c.lower() for c in rel.columns])


def test_doc_stratified_duckdb_parity(spark, duck):
    """Per-language exact top-k (unregistered: 50-row artifact cap) —
    exact-oracle parity, same gate as registered rows."""
    from avecado_spark.queries import DOC_STRATIFIED_SQL, doc_stratified_top
    sdf = doc_stratified_top(spark, SF_ORACLE)
    srows = sdf.collect()
    rel = duck.sql(DOC_STRATIFIED_SQL)
    drows = rel.fetchall()
    assert len(srows) == len(drows) > 0
    assert _canon(srows, [c.lower() for c in sdf.columns]) \
        == _canon(drows, [c.lower() for c in rel.columns])


def _pinned_parity(spark, duck, fn, sql):
    sdf = fn(spark, SF_ORACLE)
    srows = sdf.collect()
    rel = duck.sql(sql)
    drows = rel.fetchall()
    assert len(srows) == len(drows) > 0
    assert _canon(srows, [c.lower() for c in sdf.columns]) \
        == _canon(drows, [c.lower() for c in rel.columns])


def test_tpch_q5_duckdb_parity(spark, duck):
    """tpch_q5_local_supplier rotated out of the registry in r07 (the
    50-row artifact cap; dedup_paragraph took the slot)."""
    from avecado_spark.queries import TPCH_Q5_SQL, tpch_q5_local_supplier
    _pinned_parity(spark, duck, tpch_q5_local_supplier, TPCH_Q5_SQL)


def test_tpch_q4_duckdb_parity(spark, duck):
    """Q4-style EXISTS semijoin (unregistered: 50-row artifact cap)."""
    from avecado_spark.queries import TPCH_Q4_SQL, tpch_q4_priority
    _pinned_parity(spark, duck, tpch_q4_priority, TPCH_Q4_SQL)


def test_tpch_q7_duckdb_parity(spark, duck):
    """Q7-style two-nation volume join (unregistered: 50-row cap)."""
    from avecado_spark.queries import TPCH_Q7_SQL, tpch_q7_volume
    _pinned_parity(spark, duck, tpch_q7_volume, TPCH_Q7_SQL)


def test_tpch_q9_duckdb_parity(spark, duck):
    """Q9-style profit rollup (unregistered: 50-row cap)."""
    from avecado_spark.queries import TPCH_Q9_SQL, tpch_q9_profit
    _pinned_parity(spark, duck, tpch_q9_profit, TPCH_Q9_SQL)


def test_hex_cell_docs_duckdb_parity(spark, duck):
    """Hex-grid binning (unregistered: 50-row artifact cap) — exact-
    oracle parity, same gate as the registered rows."""
    from avecado_spark.queries import HEX_CELL_DOCS_SQL, hex_cell_docs
    sdf = hex_cell_docs(spark, SF_ORACLE)
    srows = sdf.collect()
    rel = duck.sql(HEX_CELL_DOCS_SQL)
    drows = rel.fetchall()
    assert len(srows) == len(drows) > 10   # many populated cells
    assert _canon(srows, [c.lower() for c in sdf.columns]) \
        == _canon(drows, [c.lower() for c in rel.columns])


def test_web_frontier_duckdb_parity(spark, duck):
    """Crawl frontier (unregistered: 50-row artifact cap) — exact-oracle
    parity, same gate as the registered rows."""
    from avecado_spark.queries import WEB_FRONTIER_SQL, web_frontier
    sdf = web_frontier(spark, SF_ORACLE)
    srows = sdf.collect()
    rel = duck.sql(WEB_FRONTIER_SQL)
    drows = rel.fetchall()
    assert len(srows) == len(drows) > 0      # t2/t3 edge keys fall off
    # and the nofollow offsite targets are excluded
    assert all(not r["url"].startswith("https://dead.example.net")
               for r in srows)
    assert _canon(srows, [c.lower() for c in sdf.columns]) \
        == _canon(drows, [c.lower() for c in rel.columns])


def test_repetition_signals_duckdb_parity(spark, duck):
    """Gopher-style repetition signals (unregistered: 50-row artifact
    cap) — exact-oracle parity, same gate as the registered rows."""
    from avecado_spark.operators.textstats import (repetition_df,
                                                   repetition_sql)
    sdf = repetition_df(spark, SF_ORACLE)
    srows = sdf.collect()
    rel = duck.sql(f"SELECT * FROM {repetition_sql()} t")
    drows = rel.fetchall()
    assert len(srows) == len(drows) > 0
    # non-vacuous: the synthetic vocabulary is tiny, so every doc has a
    # repeated bigram
    assert all(r["top_bigram_frac"] > 0 for r in srows)
    assert _canon(srows, [c.lower() for c in sdf.columns]) \
        == _canon(drows, [c.lower() for c in rel.columns])
