"""Decompose the flat-mirror aggregation cost: scan floor, ungrouped agg,
grouped agg variants, at 1e7 cached float rows."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

spark = (
    SparkSession.builder.master(f"local[{CPUS}]")
    .appName("xhs-profile-agg")
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

spec = Regular(100, -3.0, 3.0)


def run(df):
    df.write.format("noop").mode("overwrite").save()


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

keep = F.col("x").between(-3.0, 3.0)
idc = spec.raw_id_col_kept(F.col("x")).alias("b")

variants = {
    "scan_count_star": df.groupBy().count(),
    "scan_sum_x": df.agg(F.sum("x")),
    "ungrouped_sum_of_bucket": df.where(keep).select(idc).agg(F.sum("b")),
    "grouped_count": df.where(keep).select(idc).groupBy("b").count(),
    "grouped_sum_lit1": df.where(keep)
        .select(idc, F.lit(1).cast("bigint").alias("v"))
        .groupBy("b").agg(F.sum("v")),
    "grouped_count_direct": df.where(keep).groupBy(idc).count(),
    "grouped_count_int_key": df.where(keep)
        .select(idc.cast("int").alias("b")).groupBy("b").count(),
}
order = list(variants)
for d in variants.values():
    for _ in range(3):
        run(d)
res = {k: [] for k in order}
for _ in range(13):
    for k in order:
        t0 = time.perf_counter()
        run(variants[k])
        res[k].append(time.perf_counter() - t0)
for k in order:
    ts = sorted(res[k])
    print(f"{k:26s} min={ts[0]*1000:7.1f} med={ts[6]*1000:7.1f}", flush=True)
df.unpersist(blocking=True)
spark.stop()
