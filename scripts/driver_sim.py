"""Standalone driver-contract simulation: run EVERY registry query against
its DuckDB oracle, at any parallelism/scale.

    python scripts/driver_sim.py [sf_dir] [master] [shuffle_partitions] [names]

Defaults replicate the DRIVER's conditions (sf0.01, local[32], 32
partitions, AQE on) rather than the test fixture's local[4]/4 — the
point is verifying the determinism contract (every oracle hash must be
partitioning-independent) at a parallelism the unit suite never uses.
``names`` (optional, comma-separated) restricts the run to those registry
entries — the fast re-verify loop after touching a single operator; the
full sweep stays the pre-driver gate.  Exits non-zero listing any
mismatching query.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402


# Entries allowed to ship WITHOUT an oracle (genuinely non-SQL-expressible
# ops get the driver's weaker rows-only check).  Currently EMPTY — all
# registered queries are oracle-backed; a missing oracle on any other name
# is a dropped/None oracle bug and must FAIL loudly, not silently
# downgrade to a vacuous smoke check (ADVICE r07).
_ROWS_ONLY_OK: frozenset = frozenset()


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    master = sys.argv[2] if len(sys.argv) > 2 else "local[32]"
    parts = sys.argv[3] if len(sys.argv) > 3 else "32"
    only = set(sys.argv[4].split(",")) if len(sys.argv) > 4 else None
    spark = (
        SparkSession.builder.master(master)
        .config("spark.sql.shuffle.partitions", parts)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry
    from tests.util import assert_matches_sql, duck

    con = duck(sf)
    qs, oracles = entry.queries(), entry.oracle_sql()
    if only is not None:
        unknown = only - set(qs)
        if unknown:
            print(f"unknown query names: {sorted(unknown)}")
            return 1
        qs = {n: f for n, f in qs.items() if n in only}
    bad = []
    for name in qs:
        try:
            sql = oracles.get(name)
            if sql is None:
                if name not in _ROWS_ONLY_OK:
                    raise AssertionError(
                        "missing oracle for an entry not in _ROWS_ONLY_OK "
                        "(dropped/None oracle?)"
                    )
                print(f"SKIPPED oracle (rows-only check): {name}", flush=True)
                n = qs[name](spark, sf).count()
                assert n >= 0
            else:
                assert_matches_sql(qs[name](spark, sf), sql, con)
        except Exception as ex:  # noqa: BLE001 — report and continue
            bad.append((name, str(ex)[:200]))
            print(f"FAIL {name}: {str(ex)[:200]}", flush=True)
    print(f"{len(qs) - len(bad)}/{len(qs)} queries oracle-green "
          f"at {master}/{parts} partitions, sf_dir={sf}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
