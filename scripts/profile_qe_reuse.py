"""Interleaved A/B/C on the flat mirror:

A  noop-write per run            — planning + full execution + commit
B  memoized toRdd().count()      — SHUFFLE REUSE (dishonest: map stage
                                   skipped after run 1; shown only to
                                   size the result-stage floor)
C  pre-planned fresh QE per run  — planning done before the timing loop,
                                   each QE executed exactly ONCE (fresh
                                   shuffle id → full recomputation)

C is the honest floor-cut VERDICT r04 asked for: the ~10-14 ms per-save
re-optimization moves out of the timed body while every timed sample
still scans + bucketizes + aggregates all 1e7 rows.
"""
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

from xarray_histogram_spark import Regular, histogram

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.adaptive.enabled", "false")
    .config("spark.sql.inMemoryColumnarStorage.compressed", "false")
    .config("spark.sql.inMemoryColumnarStorage.batchSize", "131072")
    .config("spark.ui.enabled", "false")
    .config("spark.driver.memory", "16g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

spec = Regular(100, -3.0, 3.0)
inp = spark.range(10_000_000, numPartitions=24).select(
    F.randn(1).cast("float").alias("x")
).cache()
inp.count()
plan = histogram(inp, "x", spec).df

# warm all paths
plan.write.format("noop").mode("overwrite").save()
jrdd0 = plan._jdf.queryExecution().toRdd()
jrdd0.count()

N = 15
# pre-plan N fresh QueryExecutions for variant C (planning outside loop)
fresh = []
t0 = time.perf_counter()
for _ in range(N):
    p = histogram(inp, "x", spec).df
    fresh.append(p._jdf.queryExecution().toRdd())
prep = (time.perf_counter() - t0) / N

a, b, c = [], [], []
for i in range(N):
    t0 = time.perf_counter()
    plan.write.format("noop").mode("overwrite").save()
    a.append(time.perf_counter() - t0)
    t0 = time.perf_counter()
    jrdd0.count()
    b.append(time.perf_counter() - t0)
    t0 = time.perf_counter()
    fresh[i].count()
    c.append(time.perf_counter() - t0)

for name, xs in (("noop_save", a), ("reused_qe(cheat)", b), ("fresh_qe_once", c)):
    xs = sorted(xs)
    print(f"{name:18s} min={xs[0]*1e3:7.1f}ms p25={xs[N//4]*1e3:7.1f}ms "
          f"med={statistics.median(xs)*1e3:7.1f}ms")
print(f"per-plan prep (build+optimize, outside loop): {prep*1e3:.1f}ms")
print("loadavg:", open("/proc/loadavg").read().strip())
