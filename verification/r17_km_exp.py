import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from hadoop_job_analyzer_spark.catalog import load_table
from hadoop_job_analyzer_spark.session import get_spark
from hadoop_job_analyzer_spark.operators.neardup import (
    _km_inputs, _km_assign, _km_recenter, _KM_ROUNDS, _km_snap, _km_onerow,
)

SF = "/root/testdata/sf0.1"
spark = get_spark("r17-km-exp")
load_table(spark, SF, "embeddings").cache().count()

def noop(df): df.write.format("noop").mode("overwrite").save()

def r16_recenter(asg):
    per_cent = (
        asg.select("cen_id", F.posexplode("_v").alias("_p", "x"))
        .groupBy("cen_id", "_p")
        .agg((F.sum(_km_snap("x")).cast("double") / F.count(F.lit(1))).alias("c"))
        .groupBy("cen_id")
        .agg(F.transform(F.array_sort(F.collect_list(F.struct("_p", "c"))), lambda s: s["c"]).alias("cvec"))
    )
    return _km_onerow(per_cent)

def variant(recenter, checkpoint_cb=True, project_final=True):
    def run():
        vecs, cb = _km_inputs(spark, SF)
        asg = None
        for rnd in range(_KM_ROUNDS):
            asg = _km_assign(vecs, cb)
            if rnd < _KM_ROUNDS - 1:
                cb = recenter(asg)
                if checkpoint_cb:
                    cb = cb.localCheckpoint(eager=True)
            else:
                if project_final:
                    asg = asg.select("vec_id", "cen_id", "cos").localCheckpoint(eager=True)
                else:
                    asg = asg.localCheckpoint(eager=True)
        vecs.unpersist()
        return asg.select("vec_id", "cen_id", F.col("cos").alias("cosine"))
    return run

def t(label, run, reps=3):
    walls = []
    for _ in range(reps):
        t0 = time.perf_counter(); noop(run()); walls.append(time.perf_counter() - t0)
    walls.sort(); print(f"{label:44s} {walls[len(walls)//2]:.3f}s  {[round(w,3) for w in walls]}")

# pieces first
vecs, cb0 = _km_inputs(spark, SF)
t0 = time.perf_counter(); noop(vecs); print(f"vecs persist+materialize {time.perf_counter()-t0:.3f}s")
t("piece: assign map only (1 round)", lambda: _km_assign(vecs, cb0))
t("piece: assign+recenter r16 (1 round)", lambda: r16_recenter(_km_assign(vecs, cb0)))
t("piece: assign+recenter r17flat (1 round)", lambda: _km_recenter(_km_assign(vecs, cb0)))
vecs.unpersist()

t("full r16 (explode recenter, ckpt)", variant(r16_recenter, True, False))
t("full r17flat (flat recenter, ckpt)", variant(_km_recenter, True, True))
t("full r16 recenter, NO cb ckpt", variant(r16_recenter, False, True))
t("full r16 recenter, ckpt, final projected", variant(r16_recenter, True, True))
spark.stop()
