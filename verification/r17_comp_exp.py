import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from hadoop_job_analyzer_spark.catalog import load_table
from hadoop_job_analyzer_spark.session import get_spark

SF = "/root/testdata/sf0.1"
spark = get_spark("r17-comp-exp")
load_table(spark, SF, "documents").cache().count()

from hadoop_job_analyzer_spark.operators.llm import dedup_near_minhash_full

def propagate(spark, sf_dir, pairs, hops, label=""):
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
    rounds = 0
    t0 = time.perf_counter()
    for rnd in range(20):
        cur = labels.select("doc_id", F.col("component").alias("_old"), "component")
        for _hop in range(hops):
            nbr = (
                edges.join(cur, edges["a"] == cur["doc_id"])
                .select(F.col("b").alias("doc_id"), "component")
                .groupBy("doc_id")
                .agg(F.min("component").alias("nbr_comp"))
            )
            stepped = cur.join(nbr, "doc_id", "left").select(
                "doc_id", "_old",
                F.least(F.col("component"), F.coalesce(F.col("nbr_comp"), F.col("component"))).alias("component"),
            )
            if rnd >= 1:
                ptr = labels.select(F.col("doc_id").alias("c_id"), F.col("component").alias("c_comp"))
                cur = stepped.join(ptr, stepped["component"] == ptr["c_id"], "left").select(
                    "doc_id", "_old",
                    F.coalesce(F.col("c_comp"), F.col("component")).alias("component"),
                )
            else:
                cur = stepped
        rt = time.perf_counter()
        checkpointed = cur.localCheckpoint(eager=True)
        t_ck = time.perf_counter() - rt
        changed = checkpointed.where(F.col("component") < F.col("_old")).count()
        t_cnt = time.perf_counter() - rt - t_ck
        rounds += 1
        print(f"  [{label}] round {rnd}: changed={changed} ckpt={t_ck:.3f}s cnt={t_cnt:.3f}s")
        labels = checkpointed.drop("_old")
        if changed == 0:
            break
    edges.unpersist()
    wall = time.perf_counter() - t0
    print(f"[{label}] hops={hops} rounds={rounds} propagation wall={wall:.3f}s")
    return labels

pairs = dedup_near_minhash_full(spark, SF).persist()
pairs.count()
for hops in (1, 2, 3):
    propagate(spark, SF, pairs, hops, label=f"h{hops}")
for hops in (1, 2):
    propagate(spark, SF, pairs, hops, label=f"h{hops}-again")
spark.stop()
