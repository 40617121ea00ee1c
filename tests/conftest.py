import os

import pytest
from pyspark.sql import SparkSession

SF_DIR = os.environ.get("TEST_SF_DIR", "/root/testdata/sf0.001")

# Suite profile (see pytest.ini).  Default = the driver-window profile:
# reduced hypothesis/fuzz iteration counts so the driver's fixed pytest
# window fits; XHS_TEST_FULL=1 restores every seed/example (the full
# battery run before each round ends).  Both profiles run the SAME
# tests — only iteration counts differ; the heavy batteries that are
# deselected outright carry @pytest.mark.slow instead.
FULL_SUITE = bool(os.environ.get("XHS_TEST_FULL"))


def scaled_examples(n: int) -> int:
    """Hypothesis max_examples for the active profile: the full count
    under XHS_TEST_FULL=1, roughly a third (floor 3) in the default
    driver-window profile."""
    return n if FULL_SUITE else max(3, n // 3)


def scaled_seeds(seeds, keep: int = 1):
    """Fuzz-mirror seed list for the active profile: all seeds under
    XHS_TEST_FULL=1, the first ``keep`` seeds in the default
    driver-window profile (one seed still exercises the full
    engine-vs-oracle path; the extra seeds are breadth, not gate —
    the random-spec generator fuzzes pass a larger ``keep`` so several
    spec families stay covered per run)."""
    seeds = list(seeds)
    return seeds if FULL_SUITE else seeds[:keep]


@pytest.fixture(scope="session")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .appName("xhs-tests")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "4g")
        .getOrCreate()
    )
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def lineitem(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/lineitem.parquet")


@pytest.fixture(scope="session")
def orders(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/orders.parquet")
