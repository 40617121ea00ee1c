"""Stage-level breakdown of the flat-1d mirror via the Spark event log."""
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
EVDIR = "/tmp/xhs-eventlog"
os.makedirs(EVDIR, exist_ok=True)
for f in glob.glob(EVDIR + "/*"):
    os.remove(f)

spark = (
    SparkSession.builder.master(f"local[{CPUS}]")
    .appName("xhs-profile-flat")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.adaptive.enabled", "false")
    .config("spark.sql.inMemoryColumnarStorage.compressed", "false")
    .config("spark.sql.inMemoryColumnarStorage.batchSize", "131072")
    .config("spark.ui.enabled", "false")
    .config("spark.driver.memory", "16g")
    .config("spark.eventLog.enabled", "true")
    .config("spark.eventLog.dir", EVDIR)
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from xarray_histogram_spark import Regular, histogram

spec = Regular(100, -3.0, 3.0)


def run(df):
    df.write.format("noop").mode("overwrite").save()


# warm like bench
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
plan = histogram(df, "x", spec).df

variants = {
    "count": df.groupBy().count(),
    "sum_x": df.agg(F.sum("x")),
    "noop_scan": df,
    "full_hist": plan,
}
timings = {}
for name, d in variants.items():
    for _ in range(3):
        run(d)
    ts = []
    for _ in range(13):
        t0 = time.perf_counter()
        run(d)
        ts.append(time.perf_counter() - t0)
    timings[name] = (min(ts), sorted(ts)[len(ts) // 2])

# mark, then one clean timed run of the full plan for event-log parsing
marker_t0 = time.time() * 1000
t0 = time.perf_counter()
run(plan)
wall = time.perf_counter() - t0
spark.stop()

for name, (mn, md) in timings.items():
    print(f"{name:12s} min={mn*1000:7.1f}ms median={md*1000:7.1f}ms")
print(f"parsed run wall: {wall*1000:.1f}ms")

# parse event log: stages after marker_t0
ev = glob.glob(EVDIR + "/*")[0]
stages = []
tasks = {}
jobs = []
with open(ev) as f:
    for line in f:
        e = json.loads(line)
        if e["Event"] == "SparkListenerJobStart" and e["Submission Time"] >= marker_t0 - 5:
            jobs.append((e["Job ID"], e["Submission Time"]))
        elif e["Event"] == "SparkListenerJobEnd":
            for j in jobs:
                if j[0] == e["Job ID"]:
                    jobs[jobs.index(j)] = (j[0], j[1], e["Completion Time"])
        elif e["Event"] == "SparkListenerStageCompleted":
            si = e["Stage Info"]
            if si.get("Submission Time", 0) >= marker_t0 - 5:
                stages.append(
                    (si["Stage ID"], si["Number of Tasks"],
                     si["Submission Time"], si["Completion Time"])
                )
        elif e["Event"] == "SparkListenerTaskEnd":
            sid = e["Stage ID"]
            ti = e["Task Info"]
            if ti["Launch Time"] >= marker_t0 - 5:
                tasks.setdefault(sid, []).append(
                    (ti["Finish Time"] - ti["Launch Time"],
                     e.get("Task Metrics", {}))
                )

for j in jobs:
    if len(j) == 3:
        print(f"job {j[0]}: submit->end {j[2]-j[1]}ms")
for sid, ntasks, sub, comp in stages:
    tl = tasks.get(sid, [])
    durs = sorted(t[0] for t in tl)
    if tl:
        m0 = tl[0][1]
        ks = {}
        for d, m in tl:
            if m:
                ks.setdefault("deser", []).append(m["Executor Deserialize Time"])
                ks.setdefault("run", []).append(m["Executor Run Time"])
                ks.setdefault("cpu", []).append(m.get("Executor CPU Time", 0) / 1e6)
                ks.setdefault("gc", []).append(m["JVM GC Time"])
        agg = {k: (sum(v), max(v)) for k, v in ks.items()}
    else:
        agg = {}
    print(f"stage {sid}: {ntasks} tasks, wall {comp-sub}ms, "
          f"task dur min/med/max {durs[0] if durs else '-'}"
          f"/{durs[len(durs)//2] if durs else '-'}/{durs[-1] if durs else '-'}ms, "
          f"metrics(sum,max): {agg}")
