"""Focused guards for the r16 optimization reshapes — each pins the
internal equivalence the reshape's speed depends on, so a future edit
can't silently break the exactness argument while the oracle sweep is
green by luck of the data."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_km_sum_snap_matches_exploded_decimal_sum(spark):
    """_km_sum_snap (in-row (30,12)-accumulator aggregate) must equal the
    exploded SUM(CAST(t AS DECIMAL(38,12))) bit-for-bit — including
    values whose 12th decimal digit a (38,12) accumulator would round
    away (Spark adjusts (38,12)+(38,12) to scale 11)."""
    from hadoop_job_analyzer_spark.operators.neardup import _km_sum_snap

    # adversarial doubles: long non-terminating binary fractions, sign
    # flips, magnitudes from 1e-9 to 1e3 — 12th-decimal digits all live
    vals = [
        (i * 0.1234567891234 - 3.3) * ((-1) ** i) * (10.0 ** (i % 7 - 3))
        for i in range(64)
    ]
    df = spark.range(1).select(F.array(*[F.lit(v) for v in vals]).alias("a"))
    inrow = df.select(
        _km_sum_snap(F.transform("a", lambda x: x.cast("decimal(25,12)"))).alias("s")
    ).collect()[0].s
    exploded = (
        df.select(F.explode("a").alias("x"))
        .agg(F.sum(F.col("x").cast("decimal(38,12)")).cast("double").alias("s"))
        .collect()[0]
        .s
    )
    assert inrow == exploded, (inrow, exploded)


def test_km_assign_matches_r15_grouped_assignment(spark, sf_dir):
    """The map-only assignment (in-row dots + array_min argmax) must
    reproduce the r15 exploded join+groupBy assignment row-for-row —
    same nearest centroid, same 6-dp cosine, same lowest-cen_id ties."""
    from hadoop_job_analyzer_spark.catalog import load_table
    from hadoop_job_analyzer_spark.operators._common import spread
    from hadoop_job_analyzer_spark.operators.neardup import (
        _KM_K,
        _km_assign,
        _km_inputs,
        _km_snap,
    )

    vecs, cb0 = _km_inputs(spark, sf_dir)
    try:
        new = {
            r.vec_id: (r.cen_id, r.cos)
            for r in _km_assign(vecs, cb0).select("vec_id", "cen_id", "cos").collect()
        }
    finally:
        vecs.unpersist()

    # r15 reference shape, round 0 (initial codebook), verbatim semantics
    e = load_table(spark, sf_dir, "embeddings")
    ex = (
        spread(e, "vec_id")
        .select("vec_id", F.posexplode("embedding").alias("pos", "xf"))
        .select("vec_id", (F.col("pos") + 1).alias("i"), F.col("xf").cast("double").alias("x"))
    )
    vnorm = ex.groupBy("vec_id").agg(
        F.sum(_km_snap(F.col("x") * F.col("x"))).cast("double").alias("vn2")
    )
    cents = ex.where(F.col("vec_id") < _KM_K).select(
        F.col("vec_id").alias("cen_id"), "i", F.col("x").alias("c")
    )
    cn = cents.groupBy("cen_id").agg(
        F.sum(_km_snap(F.col("c") * F.col("c"))).cast("double").alias("cn2")
    )
    cos = (
        ex.join(F.broadcast(cents), "i")
        .groupBy("vec_id", "cen_id")
        .agg(F.sum(_km_snap(F.col("x") * F.col("c"))).cast("double").alias("dot"))
        .join(vnorm, "vec_id")
        .join(F.broadcast(cn), "cen_id")
        .select(
            "vec_id",
            "cen_id",
            F.round(F.col("dot") / F.sqrt(F.col("vn2") * F.col("cn2")), 6).alias("cos"),
        )
    )
    old = {
        r.vec_id: (r.cen_id, r.cos)
        for r in (
            cos.groupBy("vec_id")
            .agg(F.min(F.struct((-F.col("cos")).alias("nc"), F.col("cen_id"))).alias("m"))
            .select("vec_id", F.col("m.cen_id").alias("cen_id"), (-F.col("m.nc")).alias("cos"))
        ).collect()
    }
    assert new == old


def test_rare_shingle_index_matches_r15_exploded_distinct(spark, sf_dir):
    """_rare_shingle_index (in-row array_distinct + int64 hash) must equal
    the r15 exploded-distinct formulation row-for-row."""
    from pyspark.sql import Window

    from hadoop_job_analyzer_spark.catalog import load_table
    from hadoop_job_analyzer_spark.operators.llm import _shingles
    from hadoop_job_analyzer_spark.operators.neardup import (
        _JACCARD_MAX_DF,
        _rare_shingle_index,
    )

    new_df = _rare_shingle_index(spark, sf_dir)
    try:
        new = sorted((r.doc_id, r.h) for r in new_df.collect())
    finally:
        new_df.unpersist()
    old = sorted(
        (r.doc_id, r.h)
        for r in (
            _shingles(load_table(spark, sf_dir, "documents"))
            .distinct()
            .select(
                "doc_id",
                F.conv(F.substring(F.md5("shingle"), 1, 15), 16, 10)
                .cast("long")
                .alias("h"),
            )
            .withColumn("_df", F.count(F.lit(1)).over(Window.partitionBy("h")))
            .where(F.col("_df") <= _JACCARD_MAX_DF)
            .drop("_df")
        ).collect()
    )
    assert new == old and len(new) > 0


def test_fingerprint_inrow_matches_r15_exploded(spark, sf_dir):
    """text_fingerprint's in-row gram sketch must equal the r15 exploded
    dedup+aggregate pipeline row-for-row (min/max/count + fingerprint64)."""
    from hadoop_job_analyzer_spark.catalog import load_table
    from hadoop_job_analyzer_spark.operators._common import spread
    from hadoop_job_analyzer_spark.registry import queries

    new = sorted(
        tuple(r) for r in queries()["text_fingerprint"](spark, sf_dir).collect()
    )
    d = load_table(spark, sf_dir, "documents").where(F.length("text") >= 8)
    texts = d.groupBy(F.md5("text").alias("_tkey")).agg(F.first("text").alias("text"))
    raw = texts.select(
        "_tkey", "text", F.explode(F.expr("sequence(1, length(text) - 7)")).alias("i")
    ).select("_tkey", F.expr("md5(substr(text, i, 8))").alias("gram_md5"))
    pairs = (
        spread(raw, "_tkey", "gram_md5")
        .groupBy("_tkey", "gram_md5")
        .agg(F.lit(1).alias("_one"))
    )
    fp = pairs.groupBy("_tkey").agg(
        F.min("gram_md5").alias("fp_min"),
        F.max("gram_md5").alias("fp_max"),
        F.count(F.lit(1)).alias("n_distinct_grams"),
        F.conv(F.substring(F.min("gram_md5"), 1, 15), 16, 10)
        .cast("bigint")
        .alias("fingerprint64"),
    )
    old = sorted(
        tuple(r)
        for r in (
            d.select("doc_id", F.md5("text").alias("_tkey"))
            .join(fp, "_tkey")
            .select("doc_id", "fp_min", "fp_max", "n_distinct_grams", "fingerprint64")
        ).collect()
    )
    assert new == old and len(new) > 0


def test_components_stale_jump_matches_fresh_jump(spark, sf_dir):
    """_min_label_components with the r16 stale jump must produce the same
    labels as the r15 fresh-jump formulation on the real pair graph."""
    from hadoop_job_analyzer_spark.catalog import load_table
    from hadoop_job_analyzer_spark.operators.llm import dedup_near_minhash
    from hadoop_job_analyzer_spark.operators.neardup import _min_label_components

    pairs = dedup_near_minhash(spark, sf_dir)
    new = sorted(
        tuple(r) for r in _min_label_components(spark, sf_dir, pairs).collect()
    )

    # r15 reference: fresh jump from round 3 with the mid-round checkpoint
    edges = (
        pairs.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
        .union(pairs.select(F.col("doc_b").alias("a"), F.col("doc_a").alias("b")))
        .persist()
    )
    labels = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", F.col("doc_id").alias("component"))
        .localCheckpoint(eager=True)
    )
    for rnd in range(20):
        nbr = (
            edges.join(labels, edges["a"] == labels["doc_id"])
            .select(F.col("b").alias("doc_id"), "component")
            .groupBy("doc_id")
            .agg(F.min("component").alias("nbr_comp"))
        )
        stepped = labels.join(nbr, "doc_id", "left").select(
            "doc_id",
            F.col("component").alias("_old"),
            F.least(
                F.col("component"), F.coalesce(F.col("nbr_comp"), F.col("component"))
            ).alias("component"),
        )
        if rnd >= 2:
            sck = stepped.localCheckpoint(eager=True)
            ptr = sck.select(
                F.col("doc_id").alias("c_id"), F.col("component").alias("c_comp")
            )
            jumped = sck.join(ptr, sck["component"] == ptr["c_id"], "left").select(
                "doc_id",
                "_old",
                F.coalesce(F.col("c_comp"), F.col("component")).alias("component"),
            )
            checkpointed = jumped.localCheckpoint(eager=True)
        else:
            checkpointed = stepped.localCheckpoint(eager=True)
        changed = checkpointed.where(F.col("component") < F.col("_old")).count()
        labels = checkpointed.drop("_old")
        if changed == 0:
            break
    edges.unpersist()
    old = sorted(
        tuple(r)
        for r in labels.select(
            "doc_id",
            "component",
            F.when(F.col("doc_id") == F.col("component"), 1).otherwise(0).alias(
                "is_keeper"
            ),
        ).collect()
    )
    assert new == old and len(new) > 0
