import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from hadoop_job_analyzer_spark.catalog import load_table
from hadoop_job_analyzer_spark.session import get_spark
from hadoop_job_analyzer_spark.operators._common import spread

GATE = 65536

def build(spark, sf_dir, mode):
    d = load_table(spark, sf_dir, "documents").where(F.length("text") >= 8)
    n = int(spark.conf.get("spark.sql.shuffle.partitions"))
    grams = F.transform(
        F.sequence(F.lit(1), F.length("text") - 7),
        lambda i: F.md5(F.col("text").substr(i, F.lit(8))),
    )
    def inrow(texts):
        return texts.select("_tkey", grams.alias("_g")).select(
            "_tkey",
            F.array_min("_g").alias("fp_min"),
            F.array_max("_g").alias("fp_max"),
            F.size(F.array_distinct("_g")).cast("bigint").alias("n_distinct_grams"),
            F.conv(F.substring(F.array_min("_g"), 1, 15), 16, 10).cast("bigint").alias("fingerprint64"),
        )
    def exploded(texts):
        raw = texts.select(
            "_tkey", "text", F.explode(F.expr("sequence(1, length(text) - 7)")).alias("i")
        ).select("_tkey", F.expr("md5(substr(text, i, 8))").alias("gram_md5"))
        gp = raw.groupBy("_tkey", "gram_md5").agg(F.lit(1).alias("_one"))
        return gp.groupBy("_tkey").agg(
            F.min("gram_md5").alias("fp_min"), F.max("gram_md5").alias("fp_max"),
            F.count(F.lit(1)).alias("n_distinct_grams"),
            F.conv(F.substring(F.min("gram_md5"), 1, 15), 16, 10).cast("bigint").alias("fingerprint64"),
        )
    if mode == "r16":
        texts = d.groupBy(F.md5("text").alias("_tkey")).agg(F.first("text").alias("text")).repartition(n)
        fp = inrow(texts)
    elif mode == "gate_shared":   # current impl: shared collapse, two filters
        texts = d.groupBy(F.md5("text").alias("_tkey")).agg(F.first("text").alias("text")).repartition(n)
        fp = inrow(texts.where(F.length("text") <= GATE)).unionByName(
            exploded(texts.where(F.length("text") > GATE)))
    elif mode == "gate_persist":  # shared collapse, persisted
        texts = d.groupBy(F.md5("text").alias("_tkey")).agg(F.first("text").alias("text")).repartition(n).persist()
        fp = inrow(texts.where(F.length("text") <= GATE)).unionByName(
            exploded(texts.where(F.length("text") > GATE)))
    elif mode == "gate_split":    # per-branch collapse
        ts = d.where(F.length("text") <= GATE).groupBy(F.md5("text").alias("_tkey")).agg(F.first("text").alias("text")).repartition(n)
        tl = d.where(F.length("text") > GATE).groupBy(F.md5("text").alias("_tkey")).agg(F.first("text").alias("text")).repartition(n)
        fp = inrow(ts).unionByName(exploded(tl))
    return d.select("doc_id", F.md5("text").alias("_tkey")).join(fp, "_tkey").select(
        "doc_id", "fp_min", "fp_max", "n_distinct_grams", "fingerprint64")

def noop(df): df.write.format("noop").mode("overwrite").save()

for SF in ("/root/testdata/sf0.1", "/tmp/hja_scale/x64"):
    spark = get_spark("r17-fp-gate")
    load_table(spark, SF, "documents").cache().count()
    modes = ["r16", "gate_shared", "gate_persist", "gate_split"]
    for m in modes: noop(build(spark, SF, m))  # warm
    res = {m: [] for m in modes}
    for r in range(3):
        for m in modes:
            t0 = time.perf_counter(); noop(build(spark, SF, m)); res[m].append(time.perf_counter() - t0)
    print(SF)
    for m in modes:
        w = sorted(res[m]); print(f"  {m:14s} med={w[1]:.3f}  {[round(x,3) for x in w]}")
    spark.stop()
