"""Standalone driver-contract simulation, runnable from ANY directory:
entry() smoke + every queries() entry compared exactly against its
oracle_sql() in DuckDB — the same bar as the per-round CORRECTNESS gate.

Usage: python scripts/driver_sim.py [sf_dir]   (default /root/testdata/sf0.01)
"""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

from pyspark.sql import SparkSession


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as e
    from util import assert_matches_sql, duck

    df = e.entry(spark)
    print(f"entry: {df.count()} rows, schema {[f.name for f in df.schema.fields][:4]}…")

    qs, os_ = e.queries(), e.oracle_sql()
    con = duck(sf)
    fails = []
    t0 = time.time()
    for name, fn in qs.items():
        sql = os_.get(name)
        try:
            sdf = fn(spark, sf)
            if sql is None:
                print(f"  {name}: rows-only {sdf.count()}")
                continue
            assert_matches_sql(sdf, sql, con)
        except Exception as ex:  # noqa: BLE001 - report and continue
            fails.append(name)
            print(f"  FAIL {name}: {str(ex)[:200]}")
    print(f"checked {len(qs)} queries in {time.time() - t0:.0f}s; "
          f"failures: {len(fails)} {fails}")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
