"""Focused guards for the r17 optimization reshapes — each pins the
internal equivalence the reshape's speed (or at-scale safety) depends
on, so a future edit can't silently break the exactness argument while
the oracle sweep is green by luck of the data."""

from __future__ import annotations

import os

from pyspark.sql import Window
from pyspark.sql import functions as F

from hadoop_job_analyzer_spark.catalog import load_table
from hadoop_job_analyzer_spark.registry import queries


def test_corpus_dedup_min_by_matches_window_shape(spark, sf_dir):
    """corpus_pipeline_e2e's exact-dedup stage (r17: min_by over the
    whole row per md5(text)) must select EXACTLY the rows the r16
    row_number window selected — the reshape's equivalence rests on
    doc_id being a total order within each content-hash group."""
    from hadoop_job_analyzer_spark.operators.corpus import _RATES, _DEFAULT_RATE, _bucket

    d = load_table(spark, sf_dir, "documents")
    base = d.withColumn("n_tokens", F.size(F.split("text", " ")))
    q = base.where(F.col("n_chars").between(50, 2000) & (F.col("n_tokens") >= 10))
    rate = F.coalesce(
        *[F.when(F.col("lang") == k, F.lit(v)) for k, v in _RATES.items()],
        F.lit(_DEFAULT_RATE),
    )
    mixed = q.where(_bucket(F.col("doc_id"), 100) < rate)
    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    dd_window = (
        mixed.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
    dd_minby = (
        mixed.groupBy(F.md5("text").alias("_tk"))
        .agg(F.min_by(F.struct(*mixed.columns), F.col("doc_id")).alias("_r"))
        .select("_r.*")
    )
    a = sorted(map(tuple, dd_window.collect()))
    b = sorted(map(tuple, dd_minby.collect()))
    assert a == b and len(a) > 0


def test_fingerprint_gate_exploded_branch_matches_inrow(spark, tmp_path):
    """The beyond-gate exploded branch of text_fingerprint must produce
    the same sketch values as the in-row path — exercised for REAL with
    a synthetic corpus containing a >_FP_INROW_MAX_CHARS document (the
    shipped fixtures never cross the gate), including a duplicated long
    text (the branch skips the collapse; its (_tkey, gram) dedup must
    absorb copies) and a short control. Baseline: the per-doc legacy
    twin, which is gate-free and dup-agnostic."""
    from hadoop_job_analyzer_spark.operators.textops import (
        _FP_INROW_MAX_CHARS,
        text_fingerprint_per_doc,
    )

    long_text = " ".join(f"tok{i % 997}x{i % 31}" for i in range(9000))
    assert len(long_text) > _FP_INROW_MAX_CHARS
    rows = [
        (1, long_text, "en", "src1", len(long_text)),
        (2, long_text, "en", "src1", len(long_text)),  # duplicate copy
        (3, "a short document body for the control row", "en", "src2", 42),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string, n_chars long")
    sf = str(tmp_path / "gate_sf")
    os.makedirs(sf, exist_ok=True)
    df.coalesce(1).write.mode("overwrite").parquet(os.path.join(sf, "documents.parquet"))

    got = sorted(map(tuple, queries()["text_fingerprint"](spark, sf).collect()))
    want = sorted(map(tuple, text_fingerprint_per_doc(spark, sf).collect()))
    assert got == want and len(got) == 3


def test_release_transient_caches_drops_operator_persists(spark, sf_dir):
    """r17 hygiene (VERDICT r16 #7): operator-internal persists that
    cannot be released in-operator (the consuming action runs
    caller-side) are registered via _common.tpersist; after the caller's
    action completes, session.release_transient_caches() must leave ZERO
    new entries in the persistent-RDD registry. Exercises the
    rare-shingle index (shared by jaccard+containment) and the
    edit-distance capped frame — the two sites VERDICT r16 named."""
    from hadoop_job_analyzer_spark import session as hja_session

    def _rdd_ids():
        m = spark.sparkContext._jsc.getPersistentRDDs()
        return {int(str(k)) for k in m.keySet().toArray()}

    q = queries()
    before = _rdd_ids()
    for key in ("dedup_ngram_jaccard", "dedup_containment", "text_edit_distance_join"):
        q[key](spark, sf_dir).write.format("noop").mode("overwrite").save()
    assert _rdd_ids() - before, "expected operator caches while in flight"
    hja_session.release_transient_caches(blocking=True)
    leaked = _rdd_ids() - before
    assert not leaked, f"lingering cached blocks after release: {sorted(leaked)}"


def test_kmeans_final_checkpoint_carries_no_vectors(spark, sf_dir):
    """r17 (ADVICE r16): the final-round localCheckpoint materializes the
    ASSIGNMENT only — vec_id, cen_id, cos — never the n×64 raw vector
    arrays the next select would drop. The returned frame's lineage is
    the checkpoint scan, so its schema (plus the absence of any array
    column) pins the projection."""
    df = queries()["emb_kmeans_iterative"](spark, sf_dir)
    assert [f.name for f in df.schema.fields] == ["vec_id", "cen_id", "cosine"]
    p = spark._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "simple")
    # the plan is a scan of the checkpointed rows + one rename projection:
    # no vector column survives into the materialized checkpoint
    assert "_v" not in p, p
