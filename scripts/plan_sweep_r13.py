"""Mechanical plan sweep over the ENTIRE registry (round-13 optimization).

For every entry: build the plan at sf0.01 and count physical-plan features
that matter at 100 TB — exchanges (by type), join strategies, Python eval
nodes, sorts, windows, scans without pushed filters.  Prints one CSV-ish
line per entry plus a flagged-outliers section at the end.

This is an audit artifact, not a gate: the numbers feed OPTIMIZATION_r13.md.
"""
import io
import os
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("xhs-plan-sweep")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "false")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from xarray_histogram_spark import entry_queries as eq

    registry = eq.registry()
    rows = []
    for name, (fn, _) in registry.items():
        try:
            df = fn(spark, SF_DIR)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
        except Exception as ex:  # noqa: BLE001
            rows.append((name, {"ERROR": str(ex)[:120]}))
            continue
        # count only tree occurrences (lines with operator ids "(n)")
        tree = plan.split("\n\n")[0]
        feat = {
            "exch": len(re.findall(r"Exchange \(", tree)),
            "rr": len(re.findall(r"RoundRobinPartitioning", plan)),
            "single": len(re.findall(r"SinglePartition", plan)),
            "bhj": len(re.findall(r"BroadcastHashJoin[^(]*\(", tree)),
            "smj": len(re.findall(r"SortMergeJoin[^(]*\(", tree)),
            "shj": len(re.findall(r"ShuffledHashJoin[^(]*\(", tree)),
            "bnlj": len(re.findall(r"BroadcastNestedLoopJoin[^(]*\(", tree)),
            "cart": len(re.findall(r"CartesianProduct[^(]*\(", tree)),
            "sort": len(re.findall(r"Sort[^(]*\(", tree)),
            "win": len(re.findall(r"Window[^(]*\(", tree)),
            "py": len(re.findall(r"BatchEvalPython|ArrowEvalPython", plan)),
            "mip": len(re.findall(r"MapInPandas|MapInArrow|FlatMapGroupsInPandas", plan)),
            "scans": len(re.findall(r"Scan parquet", tree)),
            "nofilt": len(re.findall(r"PushedFilters: \[\]", plan)),
        }
        rows.append((name, feat))

    keys = ["exch", "rr", "single", "bhj", "smj", "shj", "bnlj", "cart",
            "sort", "win", "py", "mip", "scans", "nofilt"]
    print("name," + ",".join(keys))
    for name, feat in rows:
        if "ERROR" in feat:
            print(f"{name},ERROR:{feat['ERROR']}")
        else:
            print(f"{name}," + ",".join(str(feat[k]) for k in keys))

    print("\n== flagged ==")
    for name, feat in rows:
        if "ERROR" in feat:
            print(f"{name}: ERROR {feat['ERROR']}")
            continue
        flags = []
        if feat["cart"]:
            flags.append("CartesianProduct")
        if feat["bnlj"]:
            flags.append("BroadcastNestedLoopJoin")
        if feat["py"]:
            flags.append("PythonEval")
        if feat["smj"]:
            flags.append(f"SortMergeJoin x{feat['smj']}")
        if feat["exch"] >= 5:
            flags.append(f"exchanges={feat['exch']}")
        if feat["scans"] >= 4:
            flags.append(f"scans={feat['scans']}")
        if flags:
            print(f"{name}: " + "; ".join(flags))


if __name__ == "__main__":
    main()
