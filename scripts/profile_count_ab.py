"""Interleaved A/B: current engine mirror plans (COUNT(*) − spine) vs the
round-3 SUM(lit-1) formulation, same process, alternating runs."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from functools import reduce

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

spark = (
    SparkSession.builder.master(f"local[{CPUS}]")
    .appName("xhs-ab")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.adaptive.enabled", "false")
    .config("spark.sql.inMemoryColumnarStorage.compressed", "false")
    .config("spark.sql.inMemoryColumnarStorage.batchSize", "131072")
    .config("spark.ui.enabled", "false")
    .config("spark.driver.memory", "16g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from xarray_histogram_spark import Regular, histogram, histogram2d, histogram_columns
from xarray_histogram_spark.plans.histogram import spine_ids_zero, axis_meta_exprs

spec = Regular(100, -3.0, 3.0)


def run(df):
    df.write.format("noop").mode("overwrite").save()


def ab(name, da, db, n=13):
    for _ in range(3):
        run(da); run(db)
    ta, tb = [], []
    for _ in range(n):
        t0 = time.perf_counter(); run(da); ta.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); run(db); tb.append(time.perf_counter() - t0)
    ta.sort(); tb.sort()
    print(f"{name:14s} NEW min={ta[0]*1000:6.1f} med={ta[n//2]*1000:6.1f} | "
          f"OLD min={tb[0]*1000:6.1f} med={tb[n//2]*1000:6.1f}", flush=True)


warmdf = spark.range(10_000_000, numPartitions=24).select(
    F.randn(99).cast("float").alias("x")).cache()
warmdf.count()
for _ in range(10):
    run(histogram(warmdf, "x", spec).df)
warmdf.unpersist(blocking=True)
spark.sparkContext._jvm.System.gc()

# flat
df = spark.range(10_000_000, numPartitions=24).select(
    F.randn(1).cast("float").alias("x")).cache()
df.count()
new_flat = histogram(df, "x", spec).df
keep = F.col("x").between(-3.0, 3.0)
idc = spec.raw_id_col_kept(F.col("x")).alias("x_bin")
src = df.where(keep).select(idc, F.lit(1).cast("bigint").alias("__v"))
sp = spine_ids_zero(spark, ["x"], [spec], False, "CAST(0 AS BIGINT)")
old_dense = src.unionByName(sp).groupBy("x_bin").agg(
    F.coalesce(F.sum("__v"), F.expr("CAST(0 AS BIGINT)")).alias("__val")).coalesce(1)
old_flat = old_dense.selectExpr(
    "x_bin", *axis_meta_exprs("x", spec, False), "__val",
    "CAST(__val AS DOUBLE) AS x_histogram")
ab("flat_1d", new_flat, old_flat)
df.unpersist(blocking=True)
spark.sparkContext._jvm.System.gc()

# two var
df2 = spark.range(10_000_000, numPartitions=24).select(
    F.randn(2).cast("float").alias("x"),
    F.randn(3).cast("float").alias("y"),
).cache()
df2.count()
new_two = histogram2d(df2, "x", "y", [spec, spec]).df
w2 = spec.n + 2
keep2 = F.col("x").between(-3.0, 3.0) & F.col("y").between(-3.0, 3.0)
fk = ((spec.raw_id_col_kept(F.col("x")).cast("bigint") + 1) * w2
      + spec.raw_id_col_kept(F.col("y")).cast("bigint") + 1)
src2 = df2.where(keep2).select(fk.alias("__fk"), F.lit(1).cast("bigint").alias("__v"))
sp2 = spine_ids_zero(spark, ["x", "y"], [spec, spec], False, "CAST(0 AS BIGINT)")\
    .select(((F.col("x_bin").cast("bigint") + 1) * w2 + F.col("y_bin").cast("bigint") + 1)
            .alias("__fk"), "__v")
old2 = src2.unionByName(sp2).groupBy("__fk").agg(
    F.coalesce(F.sum("__v"), F.expr("CAST(0 AS BIGINT)")).alias("__val")).coalesce(1)
old2 = old2.selectExpr(
    f"CAST((__fk div {w2}) % {w2} - 1 AS INT) AS x_bin",
    f"CAST(__fk % {w2} - 1 AS INT) AS y_bin", "__val")
old2 = old2.selectExpr(
    "x_bin", "y_bin", *axis_meta_exprs("x", spec, False),
    *axis_meta_exprs("y", spec, False), "__val",
    "CAST(__val AS DOUBLE) AS hist")
ab("two_var", new_two, old2)
df2.unpersist(blocking=True)
spark.sparkContext._jvm.System.gc()

# along dim: new engine (branch+count) vs r03 (branch+sum, 8-task tail)
df3 = spark.range(10_000_000, numPartitions=10).select(
    F.randn(4).cast("float").alias("x0"),
    F.randn(5).cast("float").alias("x1"),
    F.randn(6).cast("float").alias("x2"),
).cache()
df3.count()
cols = ["x0", "x1", "x2"]
new_along = histogram_columns(df3, cols, spec, dim_name="d").df


def old_branch(c, k):
    d = df3.where(F.col(c).between(-3.0, 3.0))
    return d.select(
        (spec.raw_id_col_kept(F.col(c)).cast("bigint") + F.lit(1)
         + F.lit(k * w2)).alias("__fk"),
        F.lit(1).cast("bigint").alias("__v"))


ub = reduce(lambda a, b: a.unionByName(b),
            [old_branch(c, k) for k, c in enumerate(cols)])
sp3 = (
    spark.range(1)
    .selectExpr("explode(sequence(0, 2)) AS d")
    .selectExpr("d", f"explode(sequence(-1, {spec.n})) AS b")
    .selectExpr(f"CAST(d * {w2} + b + 1 AS BIGINT) AS __fk",
                "CAST(0 AS BIGINT) AS __v")
)
old3 = ub.unionByName(sp3).groupBy("__fk").agg(F.sum("__v").alias("__val"))
old3 = old3.selectExpr(
    f"CAST(__fk div {w2} AS INT) AS __d",
    f"CAST(__fk % {w2} - 1 AS INT) AS value_bin", "__val")
old3 = old3.selectExpr(
    "element_at(array('x0','x1','x2'), __d + 1) AS d", "value_bin",
    *axis_meta_exprs("value", spec, False), "__val",
    "CAST(__val AS DOUBLE) AS hist")
ab("along_dim", new_along, old3)
df3.unpersist(blocking=True)
spark.stop()
