#!/usr/bin/env python3
"""spark-submit entry: materialize dedup signatures, then extract pairs.

    spark-submit --py-files avecado_spark.zip jobs/dedup_signatures.py \
        --input /root/testdata/sf0.1 --out /tmp/dedup_sigs

At 10^12 documents the minhash/simhash signature pipeline is the expensive
leg (one md5 per shingle over the whole corpus); it must run ONCE and land
in storage, not be recomputed per downstream consumer. This job writes

    <out>/minhash_bands/   (doc_id, band, band_key)   partitioned by band
    <out>/simhash_bands/   (doc_id, simhash, band, bkey) partitioned by band
    <out>/pairs_minhash/   (doc_a, doc_b)
    <out>/pairs_simhash/   (doc_a, doc_b, hamming)

and the pair extraction joins FROM the tables
(dedup.lsh_pairs_from_table / simhash_pairs_from_table) — the executable
form of the scale claim in operators/dedup.py. Partitioning by band means
the self-join shuffles each band file against itself only, and incremental
re-dedup of a new corpus slice joins its fresh bands against the stored
table without touching historic text.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def materialize_signatures(spark, sf_dir: str, out: str) -> dict:
    """Write band tables + table-backed pairs; returns row-count metrics.
    Importable (tests call this against a tmp dir)."""
    from avecado_spark.operators import dedup

    mb_path = os.path.join(out, "minhash_bands")
    sb_path = os.path.join(out, "simhash_bands")
    (dedup.minhash_bands_df(spark, sf_dir)
          .write.mode("overwrite").partitionBy("band").parquet(mb_path))
    # simhash_df is map-side; re-derive bands here so the written table is
    # the exact input shape _simhash_pairs_from_bands expects
    from pyspark.sql import functions as F
    sh = dedup.simhash_df(spark, sf_dir)
    band_arr = F.array(*[
        F.struct(F.lit(b).cast("long").alias("band"),
                 F.expr(f"shiftright(simhash, {b * 15}) & 32767").alias("bkey"))
        for b in range(dedup.SIM_BANDS)])
    (sh.select("doc_id", "simhash", F.explode(band_arr).alias("bb"))
       .select("doc_id", "simhash", "bb.band", "bb.bkey")
       .write.mode("overwrite").partitionBy("band").parquet(sb_path))

    pm = dedup.lsh_pairs_from_table(spark, mb_path)
    ps = dedup.simhash_pairs_from_table(spark, sb_path)
    pm_path = os.path.join(out, "pairs_minhash")
    ps_path = os.path.join(out, "pairs_simhash")
    pm.write.mode("overwrite").parquet(pm_path)
    ps.write.mode("overwrite").parquet(ps_path)
    return {
        "minhash_bands": spark.read.parquet(mb_path).count(),
        "simhash_bands": spark.read.parquet(sb_path).count(),
        "pairs_minhash": spark.read.parquet(pm_path).count(),
        "pairs_simhash": spark.read.parquet(ps_path).count(),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="sf dir with documents.parquet")
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    from avecado_spark.api import spark_session
    spark = spark_session(app="dedup_signatures")
    metrics = materialize_signatures(spark, args.input, args.out)
    print(json.dumps(metrics))
    spark.stop()


if __name__ == "__main__":
    main()
