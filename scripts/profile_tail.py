"""Is the coalesce(1) aggregate tail a win or a loss on the mirror path?"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

spark = (
    SparkSession.builder.master(f"local[{CPUS}]")
    .appName("xhs-profile-tail")
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


def t(name, d, n=15):
    for _ in range(3):
        run(d)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        run(d)
        ts.append(time.perf_counter() - t0)
    ts.sort()
    print(f"{name:40s} min={ts[0]*1000:7.1f}ms med={ts[n//2]*1000:7.1f}ms", flush=True)


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
u = src.unionByName(spine)
dense = u.groupBy("b").agg(F.sum("__v").alias("__val"))


def meta(d):
    return d.selectExpr("b AS z_bin", *axis_meta_exprs("z", spec, False), "__val",
                        "CAST(__val AS DOUBLE) AS hist_z")


t("tail 8 tasks", meta(dense))
t("tail coalesce(1)", meta(dense.coalesce(1)))
t("tail coalesce(4)", meta(dense.coalesce(4)))
t("tail repartition-hint none again", meta(dense))
t("engine plan (current coalesce1)", histogram(df, "x", spec).df)
df.unpersist(blocking=True)
spark.stop()
