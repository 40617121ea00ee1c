"""Job-level timeline of incremental_dedup (round-14, VERDICT item 4).

The round-13 profile showed ~1.8 s of dedup_incremental's ~3.3 s exec
above its component subtrees and attributed it to the SEQUENTIAL
broadcast-materialization chain (shard bands -> candidates -> new sets
-> kdup, each its own sub-job at a ~300 ms local floor).  This script
makes that claim measurable: run the registry entry once with the UI
on, then read /api/v1/.../jobs and print each job's submission ->
completion window so the serialization (or overlap) of the broadcast
builds is visible.

    python scripts/profile_incr_timeline_r14.py [entry_name]
"""
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
ENTRY = sys.argv[1] if len(sys.argv) > 1 else "dedup_incremental"

spark = (
    SparkSession.builder.master(f"local[{CPUS}]")
    .appName("xhs-incr-timeline")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.adaptive.enabled", "false")
    .config("spark.ui.enabled", "true")
    .config("spark.ui.port", "4049")
    .config("spark.driver.memory", "16g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from xarray_histogram_spark import entry_queries as eq


def run(df):
    df.write.format("noop").mode("overwrite").save()


df = eq.registry()[ENTRY][0](spark, SF_DIR)
run(df)  # warm: codegen + scratch builds out of the measured window
time.sleep(0.5)

app_id = spark.sparkContext.applicationId
base = f"http://localhost:4049/api/v1/applications/{app_id}"


def jobs():
    with urllib.request.urlopen(base + "/jobs") as r:
        return json.loads(r.read())


before = {j["jobId"] for j in jobs()}
spark.sparkContext.setJobDescription(f"{ENTRY} timed pass")
t0 = time.perf_counter()
run(df)
wall = time.perf_counter() - t0
time.sleep(0.5)

new = [j for j in jobs() if j["jobId"] not in before]
new.sort(key=lambda j: j["submissionTime"])


def ts(s):
    # "2026-08-18T04:00:00.123GMT" -> seconds float
    from datetime import datetime

    return datetime.strptime(s[:23], "%Y-%m-%dT%H:%M:%S.%f").timestamp()


def stages():
    with urllib.request.urlopen(base + "/stages") as r:
        return {s["stageId"]: s for s in json.loads(r.read())}


smap = stages()
t_first = min(ts(j["submissionTime"]) for j in new)
print(f"\n{ENTRY}: wall {wall*1e3:.0f} ms, {len(new)} jobs")
for j in new:
    sub = ts(j["submissionTime"]) - t_first
    end = ts(j["completionTime"]) - t_first if j.get("completionTime") else -1
    print(f"  job {j['jobId']:4d}  {sub*1e3:7.0f} -> {end*1e3:7.0f} ms "
          f"({(end-sub)*1e3:6.0f} ms, {j['numTasks']:3d} tasks)")
    for sid in sorted(j.get("stageIds", [])):
        s = smap.get(sid)
        if not s or s.get("status") == "SKIPPED":
            continue
        nm = (s.get("name") or "").split("\n")[0][:80]
        print(f"      stage {sid:4d} [{s.get('status','?'):9s}] "
              f"{s.get('numTasks', 0):3d}t  in={s.get('inputBytes',0)>>20}MB "
              f"sh_r={s.get('shuffleReadBytes',0)>>10}KB "
              f"sh_w={s.get('shuffleWriteBytes',0)>>10}KB  {nm}")
