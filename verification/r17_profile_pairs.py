import os, sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import Window
from pyspark.sql import functions as F
from hadoop_job_analyzer_spark.catalog import load_table
from hadoop_job_analyzer_spark.session import get_spark
from hadoop_job_analyzer_spark.operators.llm import _shingles, _minhash_sigs, _band_rows, _BUCKET_CAP

SF = "/root/testdata/sf0.1"
spark = get_spark("r17-profile-pairs")
d = load_table(spark, SF, "documents"); d.cache().count()

def noop(df): df.write.format("noop").mode("overwrite").save()
def t(label, build, reps=3):
    walls = []
    for _ in range(reps):
        t0 = time.perf_counter(); noop(build()); walls.append(time.perf_counter() - t0)
    walls.sort(); print(f"{label:36s} {walls[len(walls)//2]:.3f}s  (runs: {[round(w,3) for w in walls]})")

# warm
noop(_shingles(d))
t("1 shingles explode", lambda: _shingles(d))
t("2 sigs (16-min groupBy)", lambda: _minhash_sigs(_shingles(d)))
t("3 bands (sigs+band rows)", lambda: _band_rows(_minhash_sigs(_shingles(d))))

def capped():
    bands = _band_rows(_minhash_sigs(_shingles(d)))
    w = Window.partitionBy("band", "band_sig").orderBy("doc_id")
    return bands.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") <= _BUCKET_CAP).drop("_rn")
t("4 capped (3 + cap window)", capped)

def pairs_nodistinct():
    b0 = capped().persist()
    a = b0.select(F.col("doc_id").alias("doc_a"), F.col("band").alias("band_a"), F.col("band_sig").alias("sig_a"))
    b = b0.select(F.col("doc_id").alias("doc_b"), F.col("band").alias("band_b"), F.col("band_sig").alias("sig_b"))
    out = a.join(b, (a.band_a == b.band_b) & (a.sig_a == b.sig_b) & (a.doc_a < b.doc_b)).select("doc_a", "doc_b")
    return out
def pairs_distinct():
    return pairs_nodistinct().distinct()
t("5 pairs join (no distinct)", pairs_nodistinct)
t("6 pairs join + distinct", pairs_distinct)

# shingle duplicate rate (for the array_distinct question)
sh = _shingles(d)
tot = sh.count()
dis = sh.distinct().count()
print(f"shingle rows={tot}, distinct (doc,shingle)={dis}, dup_fraction={1-dis/tot:.4f}")
# docs + avg shingles
print("docs:", d.count())
spark.stop()
