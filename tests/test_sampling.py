"""Deterministic sampling/splitting operators (operators/sampling.py):
the selection contracts — determinism, composability, disjoint-cover —
plus the plan shape (map-side filter, no exchange)."""

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _pages(spark):
    from avecado_spark.sources.pages import pages_df
    return pages_df(spark, SF).select("url")


def test_sample_is_deterministic_and_composable(spark):
    from avecado_spark.operators.sampling import sample_fraction
    pg = _pages(spark)
    a = {r["url"] for r in sample_fraction(pg, "url", 1, 16).collect()}
    b = {r["url"] for r in sample_fraction(pg, "url", 2, 16).collect()}
    a2 = {r["url"] for r in
          sample_fraction(pg.repartition(7), "url", 1, 16).collect()}
    assert a == a2              # layout-independent (df.sample is not)
    assert a < b                # nested: 1/16 strictly inside 2/16
    n = pg.count()
    assert 0 < len(a) < n
    # roughly the asked fraction (md5 uniformity; generous bounds)
    assert abs(len(b) / n - 2 / 16) < 0.03


def test_assign_splits_covers_disjointly(spark):
    from avecado_spark.operators.sampling import assign_splits
    pg = _pages(spark)
    out = assign_splits(pg, "url",
                        [("train", 980), ("valid", 10), ("test", 10)])
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "valid", "test"}
    assert sum(counts.values()) == pg.count()   # total cover, no NULLs
    assert counts["train"] > 50 * counts["valid"]
    with pytest.raises(ValueError, match="sum"):
        assign_splits(pg, "url", [("a", 1), ("b", 2)], den=1000)


def test_salted_buckets_are_decorrelated(spark):
    from avecado_spark.operators.sampling import bucket
    pg = _pages(spark)
    rows = pg.select(bucket("url", 16, "s1").alias("a"),
                     bucket("url", 16, "s2").alias("b")).collect()
    same = sum(1 for r in rows if r["a"] == r["b"]) / len(rows)
    assert abs(same - 1 / 16) < 0.03    # independent ⇒ collide at ~1/16


def test_sample_filter_is_map_side(spark, tmp_path):
    from avecado_spark.operators.sampling import sample_fraction
    _pages(spark).write.mode("overwrite").parquet(f"{tmp_path}/pages")
    stored = spark.read.parquet(f"{tmp_path}/pages")
    plan = (sample_fraction(stored, "url", 1, 16)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan, plan     # pure scan+filter


def test_stratified_take_exact_and_deterministic(spark):
    from avecado_spark.operators.sampling import stratified_take
    d = spark.read.parquet(f"{SF}/documents.parquet") \
             .select("doc_id", "lang", "n_chars")
    out = stratified_take(
        d, "lang", [F.col("n_chars").desc(), F.col("doc_id")], 5).collect()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r["lang"], []).append((r["rnk"], r["n_chars"],
                                                  r["doc_id"]))
    want = {}
    for r in d.collect():
        want.setdefault(r["lang"], []).append((-r["n_chars"], r["doc_id"]))
    for lang, got in by_lang.items():
        ref = sorted(want[lang])[:5]
        assert [(nc, di) for _, nc, di in sorted(got)] \
            == [(-nc, di) for nc, di in ref]
        assert [rk for rk, _, _ in sorted(got)] == list(range(1, len(got) + 1))


# ---------------------------------------------------------------------------
# corpus_prep job: staged checkpoints, deterministic output, resume
# ---------------------------------------------------------------------------

def test_corpus_prep_job_end_to_end_and_resume(spark, tmp_path):
    import json
    import os
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from jobs.corpus_prep import run_corpus_prep
    out = str(tmp_path / "corpus")
    m1 = run_corpus_prep(spark, SF, out)
    assert m1["resumed_stages"] == 0
    assert set(m1["splits"]) <= {"train", "valid", "test"}
    assert m1["splits"]["train"] > 0
    # synthetic pages are all distinct -> dedup keeps everything; the
    # sample is ~3/16 of the corpus
    n_pages = _pages(spark).count()
    assert abs(m1["rows"] / n_pages - 3 / 16) < 0.03
    # re-run: every stage resumes from storage, output identical
    m2 = run_corpus_prep(spark, SF, out)
    assert m2["resumed_stages"] == 3
    assert m2["splits"] == m1["splits"]
    lines = [json.loads(l) for l in open(f"{out}/metrics.jsonl")]
    stages = [l["stage"] for l in lines]
    assert stages == ["docs", "unique", "corpus", "final", "final"]
    # corpus rows carry the byte-identical extracted text + stats
    row = spark.read.parquet(f"{out}/corpus").first()
    assert row["text_x"] and row["n_tokens"] > 0 and row["split"]


def test_corpus_prep_para_dedup_stage(spark, tmp_path):
    """--para-dedup inserts the CCNet paragraph stage: the stage lands with
    its own _SUCCESS + metrics row, downstream stages consume the cleaned
    text, and a re-run resumes all four stages."""
    import json
    import os
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from jobs.corpus_prep import run_corpus_prep
    out = str(tmp_path / "corpus_para")
    m1 = run_corpus_prep(spark, SF, out, para_dedup="words:8")
    assert m1["resumed_stages"] == 0
    assert os.path.exists(f"{out}/para/_SUCCESS")
    lines = [json.loads(l) for l in open(f"{out}/metrics.jsonl")]
    para = next(l for l in lines if l["stage"] == "para")
    # non-vacuous: synthetic word-soup repeats some 8-word chunks
    assert para["paras_total"] > 0
    assert 0 <= para["paras_dropped"] < para["paras_total"]
    # downstream text is the reassembled (possibly shrunk) version
    row = spark.read.parquet(f"{out}/para").first()
    assert row["n_kept"] <= row["n_paras"]
    m2 = run_corpus_prep(spark, SF, out, para_dedup="words:8")
    assert m2["resumed_stages"] == 4
    assert m2["splits"] == m1["splits"]


def test_corpus_prep_quality_gate(spark, tmp_path):
    """The Gopher-style quality stage: a passing configuration
    checkpoints with _SUCCESS, records thresholds + counts, survivors
    satisfy the gate, and the job resumes; a drop-everything
    configuration fails LOUDLY (no silently-written empty corpus) and
    does not leave a resumable stage marker. The synthetic corpus is
    uniform (11 whitespace tokens/doc), so both edges are exercised
    with gates on either side of it."""
    import json
    import os
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import pytest
    from jobs.corpus_prep import run_corpus_prep
    out = str(tmp_path / "corpus_q")
    thresholds = {"min_tokens": 5, "max_top_bigram_frac": 0.9,
                  "max_dup_chunk_frac": 0.9}
    m1 = run_corpus_prep(spark, SF, out, quality=thresholds)
    assert m1["resumed_stages"] == 0
    assert os.path.exists(f"{out}/quality/_SUCCESS")
    lines = [json.loads(l) for l in open(f"{out}/metrics.jsonl")]
    q = next(l for l in lines if l["stage"] == "quality")
    assert q["thresholds"] == thresholds
    assert q["rows"] == q["rows_in"] > 0 and q["dropped"] == 0
    import pyspark.sql.functions as F
    survivors = spark.read.parquet(f"{out}/quality")
    assert survivors.where(F.col("n_tokens") < 5).count() == 0
    assert survivors.where(F.col("top_bigram_frac") > 0.9).count() == 0
    m2 = run_corpus_prep(spark, SF, out, quality=thresholds)
    assert m2["resumed_stages"] == 4
    assert m2["splits"] == m1["splits"]

    out_bad = str(tmp_path / "corpus_q_bad")
    with pytest.raises(ValueError, match="dropped ALL"):
        run_corpus_prep(spark, SF, out_bad,
                        quality={"min_tokens": 10_000})
    assert not os.path.exists(f"{out_bad}/quality/_SUCCESS")
