"""A/B the argmin-stage parallelization for ivf/kmeans (round-13 opt).

The per-row argmin over ~63 literal centroids is interpreted HOF folds
(CodegenFallback) running inside the single-split embeddings scan task —
31 idle cores.  Candidate fix: repartition the (id, vec, norm) projection
feeding the argmin.  This measures plain vs repartitioned variants of
sim_ivf_topk's exec and a single kmeans assignment round.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

spark = (
    SparkSession.builder.master(f"local[{CPUS}]")
    .appName("xhs-profile-argmin")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.adaptive.enabled", "false")
    .config("spark.ui.enabled", "false")
    .config("spark.driver.memory", "16g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from xarray_histogram_spark.operators import similarity as sim
from xarray_histogram_spark.functions import vectors as V
from xarray_histogram_spark import entry_queries as eq


def run(df):
    df.write.format("noop").mode("overwrite").save()


def t(name, make, n=4, warm=1):
    dfs = [make() for _ in range(n + warm)]
    for d in dfs[:warm]:
        run(d)
    ts = []
    for d in dfs[warm:]:
        t0 = time.perf_counter()
        run(d)
        ts.append(time.perf_counter() - t0)
    print(f"{name:44s} min {min(ts)*1e3:8.1f} ms  med {sorted(ts)[len(ts)//2]*1e3:8.1f}", flush=True)


emb = eq.t(spark, SF_DIR, "embeddings")

# --- ivf_topk as-is ---
spark.sparkContext.setJobDescription("ivf plain")
t("ivf_topk plain", lambda: sim.ivf_topk(emb, query_id=0))

# --- variant: repartition inside the argmin (monkeypatched ivf_assign) ---
_orig_assign = sim.ivf_assign

def _assign_wide(df, id_col="vec_id", vec_col="embedding",
                 k_centroids=16, n_hint=512):
    out = _orig_assign(df, id_col, vec_col, k_centroids, n_hint)
    return out


def ivf_topk_wide(nparts):
    """ivf_topk with the argmin projection repartitioned: reimplement the
    tail of ivf_assign with a repartition between pre and the argmin."""
    df = emb
    step = sim._centroid_step(512, 16)
    cents_rows = (
        df.where((F.col("vec_id") % step) == 0)
        .select(F.col("vec_id").alias("cid"), F.col("embedding").alias("cv"))
        .collect()
    )
    cents = sorted(((int(r["cid"]), [float(x) for x in r["cv"]]) for r in cents_rows))
    v = F.col("embedding")
    pre = df.select(F.col("vec_id"), v, V.norm(v).alias("__nv"))
    pre = pre.repartition(nparts)
    arr = F.array(
        *[
            F.struct(
                V.cosine_pre(
                    v, F.array(*[F.lit(x) for x in cv]),
                    F.col("__nv"), F.lit(V.norm_lit(cv)),
                ).alias("sim"),
                F.lit(-cid).alias("ncid"),
            )
            for cid, cv in cents
        ]
    )
    assigned = pre.select(
        F.col("vec_id"), F.col("embedding"),
        (-F.array_max(arr)["ncid"]).cast("bigint").alias("cid"),
    )
    q = df.where(F.col("vec_id") == 0).select(
        F.col("embedding").alias("__qv"), V.norm(F.col("embedding")).alias("__qn")
    )
    cents_df = df.where((F.col("vec_id") % step) == 0).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cv")
    )
    qsim = V.cosine_pre(F.col("__qv"), F.col("cv"), F.col("__qn"), V.norm(F.col("cv")))
    probes = (
        q.crossJoin(F.broadcast(cents_df))
        .select("__qv", "__qn", "cid", qsim.alias("sim"))
        .orderBy(F.desc("sim"), F.col("cid"))
        .limit(2)
        .select("__qv", "__qn", "cid")
    )
    cand = assigned.join(F.broadcast(probes), "cid")
    cos = V.cosine_pre(F.col("embedding"), F.col("__qv"), V.norm(F.col("embedding")), F.col("__qn"))
    return (
        cand.where(F.col("vec_id") != 0)
        .select(F.col("vec_id"), cos.alias("cos"))
        .orderBy(F.desc("cos"), F.col("vec_id"))
        .limit(10)
    )


for n in (CPUS, 2 * CPUS):
    spark.sparkContext.setJobDescription(f"ivf wide {n}")
    t(f"ivf_topk argmin-repartition({n})", lambda n=n: ivf_topk_wide(n))

# interleave to de-noise
spark.sparkContext.setJobDescription("ivf plain again")
t("ivf_topk plain (again)", lambda: sim.ivf_topk(emb, query_id=0))
spark.sparkContext.setJobDescription(f"ivf wide {CPUS} again")
t(f"ivf_topk argmin-repartition({CPUS}) again", lambda: ivf_topk_wide(CPUS))

# value identity check
a = sim.ivf_topk(emb, query_id=0).collect()
b = ivf_topk_wide(CPUS).collect()
print("values identical:", a == b)
