"""Array-literal meta projection vs affine-arithmetic meta: planning and
execution cost on the flat-1d mirror, interleaved sampling."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

spark = (
    SparkSession.builder.master(f"local[{CPUS}]")
    .appName("xhs-profile-meta")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.adaptive.enabled", "false")
    .config("spark.sql.inMemoryColumnarStorage.compressed", "false")
    .config("spark.sql.inMemoryColumnarStorage.batchSize", "131072")
    .config("spark.ui.enabled", "false")
    .config("spark.driver.memory", "16g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from xarray_histogram_spark import Regular, histogram
from xarray_histogram_spark.plans.histogram import spine_ids_zero, axis_meta_exprs

spec = Regular(100, -3.0, 3.0)


def run(df):
    df.write.format("noop").mode("overwrite").save()


def t_plan(df, n=9):
    times = []
    for _ in range(n):
        d2 = df.select("*")
        t0 = time.perf_counter()
        d2._jdf.queryExecution().executedPlan()
        times.append(time.perf_counter() - t0)
    return min(times) * 1000


warm = spark.range(10_000_000, numPartitions=24).select(
    F.randn(99).cast("float").alias("x")).cache()
warm.count()
for _ in range(12):
    run(histogram(warm, "x", spec).df)
warm.unpersist(blocking=True)
spark.sparkContext._jvm.System.gc()

df = spark.range(10_000_000, numPartitions=24).select(
    F.randn(1).cast("float").alias("x")).cache()
df.count()

keep = spec.keep_pred_col(F.col("x"), False)
idc = spec.raw_id_col_kept(F.col("x")).alias("b")
src = df.where(keep).select(idc, F.lit(1).cast("bigint").alias("__v"))
spine = spine_ids_zero(spark, ["z"], [spec], False, "CAST(0 AS BIGINT)")\
    .selectExpr("z_bin AS b", "__v")
dense = src.unionByName(spine).groupBy("b").agg(F.sum("__v").alias("__val")).coalesce(1)

# A: current array-literal meta
metaA = dense.selectExpr(
    "b AS z_bin", *axis_meta_exprs("z", spec, False), "__val",
    "CAST(__val AS DOUBLE) AS hist_z")

# B: affine meta
lo, hi, n = -3.0, 3.0, 100
d = hi - lo
left = f"({lo!r} + {d!r} * CAST(b AS DOUBLE) / {n})"
right = f"(CASE WHEN b = {n - 1} THEN {hi!r} ELSE {lo!r} + {d!r} * CAST(b + 1 AS DOUBLE) / {n} END)"
metaB = dense.selectExpr(
    "b AS z_bin",
    f"{left} AS z_bins",
    "__val",
    f"{right} - {left} AS __z_width",
    f"({left} + {right}) / 2.0 AS __z_center",
    "false AS __z_is_flow",
    "CAST(__val AS DOUBLE) AS hist_z",
)

print("plan  A(array) =", round(t_plan(metaA), 1), "ms   B(affine) =",
      round(t_plan(metaB), 1), "ms", flush=True)

for dd in (metaA, metaB):
    for _ in range(3):
        run(dd)
ta, tb = [], []
for _ in range(15):
    t0 = time.perf_counter(); run(metaA); ta.append(time.perf_counter() - t0)
    t0 = time.perf_counter(); run(metaB); tb.append(time.perf_counter() - t0)
ta.sort(); tb.sort()
print(f"exec  A min={ta[0]*1000:.1f} med={ta[7]*1000:.1f}   "
      f"B min={tb[0]*1000:.1f} med={tb[7]*1000:.1f}", flush=True)

# values identical?
import pandas as pd
pa = metaA.toPandas().sort_values("z_bin").reset_index(drop=True)
pb = metaB.toPandas().sort_values("z_bin").reset_index(drop=True)
same = all(
    (pa[c].values.tobytes() == pb[c].values.tobytes())
    for c in ("z_bins", "__z_width", "__z_center")
)
print("bit-identical meta:", same)
df.unpersist(blocking=True)
spark.stop()
