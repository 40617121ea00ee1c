"""Profile the bench floor: where do the baseline-mirror milliseconds go?"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

from xarray_histogram_spark import Regular, histogram

spark = (
    SparkSession.builder.master("local[32]")
    .appName("probe")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.adaptive.enabled", "false")
    .config("spark.sql.inMemoryColumnarStorage.compressed", "false")
    .config("spark.ui.enabled", "false")
    .config("spark.driver.memory", "16g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")


def t(name, fn, n=6, warm=2):
    for _ in range(warm):
        fn()
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        times.append((time.perf_counter() - t0) * 1000)
    runs = " ".join(f"{x:7.1f}" for x in times)
    print(f"{name:44s} min={min(times):7.1f} ms   runs: {runs}")


def noop(df):
    df.write.format("noop").mode("overwrite").save()


one = spark.range(1, numPartitions=1)
t("JOB FLOOR: range(1).count", lambda: one.count())
t("JOB FLOOR: range(1) noop", lambda: noop(one))

flat = spark.range(10_000_000, numPartitions=16).select(
    F.randn(1).cast("float").alias("x")
).cache()
flat.count()

spec = Regular(100, -3.0, 3.0)
hist_df = histogram(flat, "x", spec).df

t("cached scan flat.count", lambda: flat.count())
t("cached agg sum(x) collect", lambda: flat.agg(F.sum("x")).collect())
bexpr = F.floor((F.col("x") + 3.0) * (100 / 6.0)).cast("int").alias("b")
t("groupBy(bin).count collect", lambda: flat.groupBy(bexpr).count().collect())
t("hist plan noop", lambda: noop(hist_df))
t("hist plan collect", lambda: hist_df.collect())

# partition-count sensitivity of the cached scan
for np_ in (4, 8, 32, 64):
    d = spark.range(10_000_000, numPartitions=np_).select(
        F.randn(1).cast("float").alias("x")
    ).cache()
    d.count()
    t(f"cached scan count, {np_} parts", lambda d=d: d.count())
    t(f"groupBy(bin).count collect, {np_} parts",
      lambda d=d: d.groupBy(bexpr).count().collect())
    d.unpersist()

# parquet-backed instead of cached
pq_path = "/tmp/probe_flat.parquet"
if not os.path.exists(pq_path):
    spark.range(10_000_000, numPartitions=16).select(
        F.randn(1).cast("float").alias("x")
    ).write.mode("overwrite").parquet(pq_path)
pq = spark.read.parquet(pq_path)
t("parquet scan count", lambda: pq.count())
t("parquet groupBy(bin).count collect", lambda: pq.groupBy(bexpr).count().collect())

# RDD-free single-stage: conditional-sum observe-style (no shuffle at all)
t("agg count+min+max collect",
  lambda: flat.agg(F.count("x"), F.min("x"), F.max("x")).collect())
