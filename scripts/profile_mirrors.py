"""Profile the baseline mirrors: where do the milliseconds go?

Times (a) driver-side planning (analysis+optimization+physical plan),
(b) full execution, for the current engine plans and several plan variants,
plus floor measurements (cached-scan count, trivial action overhead).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

spark = (
    SparkSession.builder.master(f"local[{CPUS}]")
    .appName("xhs-profile")
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

spec = Regular(100, -3.0, 3.0)


def run(df):
    df.write.format("noop").mode("overwrite").save()


def t_plan(df, n=7):
    """Driver-side planning cost: force analysis+optimize+physical planning
    of a FRESH logical plan each time (re-select to defeat plan caching)."""
    times = []
    for _ in range(n):
        d2 = df.select("*")
        t0 = time.perf_counter()
        d2._jdf.queryExecution().executedPlan()
        times.append(time.perf_counter() - t0)
    return min(times)


def t_exec(df, n=9, warm=2):
    for _ in range(warm):
        run(df)
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        run(df)
        times.append(time.perf_counter() - t0)
    return min(times)


def report(name, df):
    p = t_plan(df)
    e = t_exec(df)
    print(f"{name:42s} plan={p*1000:7.1f}ms exec={e*1000:7.1f}ms")


# ---------- warm the JVM like bench does ----------
warm = spark.range(10_000_000, numPartitions=24).select(
    F.randn(99).cast("float").alias("x")).cache()
warm.count()
for _ in range(10):
    run(histogram(warm, "x", spec).df)
warm.unpersist(blocking=True)

# ---------- flat 1d ----------
df = spark.range(10_000_000, numPartitions=24).select(
    F.randn(1).cast("float").alias("x")).cache()
df.count()

report("flat: trivial action (range(1))", spark.range(1))
report("flat: cached scan count", df.groupBy().count())
report("flat: scan+bucketize sparse agg (no spine)", df.select(spec.raw_id_col_kept(F.col("x")).alias("b")).where(F.col("x").between(-3.0, 3.0)).groupBy("b").count())
report("flat: full histogram plan", histogram(df, "x", spec).df)
h = histogram(df, "x", spec)
print("  partitions of final:", h.df.rdd.getNumPartitions() if False else "skip")
report("flat: full histogram (repeat)", histogram(df, "x", spec).df)
df.unpersist(blocking=True)

# ---------- along dim ----------
df3 = spark.range(10_000_000, numPartitions=10).select(
    F.randn(4).cast("float").alias("x0"),
    F.randn(5).cast("float").alias("x1"),
    F.randn(6).cast("float").alias("x2"),
).cache()
df3.count()
report("along: cached scan count", df3.groupBy().count())
report("along: histogram_columns current", histogram_columns(df3, ["x0", "x1", "x2"], spec, dim_name="d").df)

# variant: single scan, inline 3 structs per row, one agg
w = spec.n + 2
ids = [spec.raw_id_col(F.col(c)).cast("bigint") for c in ("x0", "x1", "x2")]
fks = [(i + F.lit(1) + F.lit(k * w)) for k, i in enumerate(ids)]
gen = df3.select(F.explode(F.array(*fks)).alias("__fk"))
agg = gen.groupBy("__fk").count()
report("along: single-scan explode variant", agg)

df3.unpersist(blocking=True)
spark.stop()
