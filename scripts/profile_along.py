"""Compare along-dim mirror plan variants under bench conditions.

The bench input is a 10-partition cached 3-float-column table; the plan
variant chosen in plans.histogram.histogram_columns must win HERE (the
driver's BENCH gate reads this exact workload)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

spark = (
    SparkSession.builder.master(f"local[{CPUS}]")
    .appName("xhs-profile-along")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.adaptive.enabled", "false")
    .config("spark.sql.inMemoryColumnarStorage.compressed", "false")
    .config("spark.sql.inMemoryColumnarStorage.batchSize", "131072")
    .config("spark.ui.enabled", "false")
    .config("spark.driver.memory", "16g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from xarray_histogram_spark import Regular, histogram, histogram_columns
from xarray_histogram_spark.plans.histogram import spine_ids_zero, id_col

spec = Regular(100, -3.0, 3.0)
w = spec.n + 2


def run(df):
    df.write.format("noop").mode("overwrite").save()


def t_exec(name, df, n=11, warm=2):
    for _ in range(warm):
        run(df)
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        run(df)
        times.append(time.perf_counter() - t0)
    times.sort()
    print(f"{name:50s} min={times[0]*1000:7.1f}ms med={times[n//2]*1000:7.1f}ms")


# warm JVM
warmdf = spark.range(10_000_000, numPartitions=24).select(
    F.randn(99).cast("float").alias("x")).cache()
warmdf.count()
for _ in range(8):
    run(histogram(warmdf, "x", spec).df)
warmdf.unpersist(blocking=True)

cols = ["x0", "x1", "x2"]
df3 = spark.range(10_000_000, numPartitions=10).select(
    F.randn(4).cast("float").alias("x0"),
    F.randn(5).cast("float").alias("x1"),
    F.randn(6).cast("float").alias("x2"),
).cache()
df3.count()

t_exec("scan floor: count all 3 cols",
       df3.groupBy().agg(F.count("x0"), F.count("x1"), F.count("x2")))

# A: current engine plan (posexplode of value array)
t_exec("A posexplode(values) [current]",
       histogram_columns(df3, cols, spec, dim_name="d").df)

# B: union of 3 pruned branches (r03 plan) + coalesce(1) tail
def branch(c, k):
    d = df3.where(F.col(c).between(-3.0, 3.0))
    return d.select(
        (spec.raw_id_col_kept(F.col(c)).cast("bigint") + F.lit(1)
         + F.lit(k * w)).alias("__fk"),
        F.lit(1).cast("bigint").alias("__v"))
from functools import reduce
ub = reduce(lambda a, b: a.unionByName(b), [branch(c, k) for k, c in enumerate(cols)])
spine = spark.range(3 * w).selectExpr("CAST(id + ((id div {}) * 0) AS BIGINT)".format(w)).limit(0)  # placeholder
spineB = (
    spark.range(1)
    .selectExpr("explode(sequence(0, 2)) AS d")
    .selectExpr("d", f"explode(sequence(-1, {spec.n})) AS b")
    .selectExpr(f"CAST(d * {w} + b + 1 AS BIGINT) AS __fk",
                "CAST(0 AS BIGINT) AS __v")
)
aggB = ub.unionByName(spineB).groupBy("__fk").agg(F.sum("__v").alias("__val")).coalesce(1)
t_exec("B 3-branch union (r03) + coalesce(1)", aggB)

# C: bucketize BEFORE explode: per-row array of 3 fks (NULL if dropped)
fks = []
for k, c in enumerate(cols):
    i = spec.raw_id_col_kept(F.col(c)).cast("bigint")
    keep = F.col(c).between(-3.0, 3.0)
    fks.append(F.when(keep, i + F.lit(1) + F.lit(k * w)))
genC = df3.select(F.explode(F.array(*fks)).alias("__fk")).where(F.col("__fk").isNotNull())
aggC = genC.unionByName(spineB.select("__fk")).groupBy("__fk").agg(
    (F.count(F.lit(1)) - F.lit(1)).alias("__val")).coalesce(1)
t_exec("C explode(prebucketized fks)", aggC)

# D: stack generator (no array alloc)
stack_args = ", ".join(f"{k}L, CAST(x{k} AS DOUBLE)" for k in range(3))
genD = df3.selectExpr(f"stack(3, {stack_args}) AS (__d, __x)")
genD = genD.where(F.col("__x").between(-3.0, 3.0))
idD = spec.raw_id_col_kept(F.col("__x")).cast("bigint")
dataD = genD.select((F.col("__d").cast("bigint") * F.lit(w) + idD + F.lit(1)).alias("__fk"),
                    F.lit(1).cast("bigint").alias("__v"))
aggD = dataD.unionByName(spineB).groupBy("__fk").agg(F.sum("__v").alias("__val")).coalesce(1)
t_exec("D stack generator", aggD)

# E: posexplode but input repartitioned to 24 first (extra shuffle)
# skipped: 3e7-row shuffle can't win

# B2: 3-branch union WITHOUT coalesce (exact r03 plan)
aggB2 = ub.unionByName(spineB).groupBy("__fk").agg(F.sum("__v").alias("__val"))
t_exec("B2 3-branch union (r03, 8-task tail)", aggB2)

df3.unpersist(blocking=True)
spark.stop()
