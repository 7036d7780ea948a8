"""jobs/dedup_signatures.py: the table-backed (materialized-signature) pair
extraction must equal the in-session (localCheckpoint) path — the executable
form of the corpus-scale claim in operators/dedup.py."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tests.conftest import SF_DIR  # noqa: E402


def test_materialized_signature_pairs_match(spark, tmp_path):
    from jobs.dedup_signatures import materialize_signatures
    from avecado_spark.operators import dedup

    out = str(tmp_path / "sigs")
    metrics = materialize_signatures(spark, SF_DIR, out)
    assert metrics["minhash_bands"] > 0
    assert metrics["simhash_bands"] > 0

    pm_table = {(r.doc_a, r.doc_b) for r in
                spark.read.parquet(os.path.join(out, "pairs_minhash")).collect()}
    pm_mem = {(r.doc_a, r.doc_b) for r in
              dedup.lsh_pairs_df(spark, SF_DIR).collect()}
    assert pm_table == pm_mem

    ps_table = {(r.doc_a, r.doc_b, r.hamming) for r in
                spark.read.parquet(os.path.join(out, "pairs_simhash")).collect()}
    ps_mem = {(r.doc_a, r.doc_b, r.hamming) for r in
              dedup.simhash_pairs_df(spark, SF_DIR).collect()}
    assert ps_table == ps_mem
