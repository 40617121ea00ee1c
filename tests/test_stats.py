"""Statistics tests: exact DuckDB-oracle matches + numerical parity vs raw
samples (the reference's tolerance tests, tests/test_accessor.py:334-363:
hist-derived stats within half a bin width of raw-sample values)."""

import numpy as np
import pytest

from xarray_histogram_spark import Regular, histogram
from xarray_histogram_spark.oracle import stats_oracle_sql

from .util import assert_matches_sql, duck


@pytest.fixture(scope="module")
def con(sf_dir):
    return duck(sf_dir)


SPEC = Regular(25, 1.0, 51.0)


@pytest.fixture(scope="module")
def hist_q(lineitem):
    return histogram(lineitem, "l_quantity", SPEC, group_by=["l_returnflag"])


def check_stat(df, kind, con, **kw):
    sql = stats_oracle_sql(
        kind, "lineitem", ["l_quantity"], [SPEC], "l_quantity",
        group_by=["l_returnflag"], **kw,
    )
    assert_matches_sql(df, sql, con)


def test_mean_oracle(hist_q, con):
    check_stat(hist_q.mean(), "mean", con)


def test_var_oracle(hist_q, con):
    check_stat(hist_q.var(), "var", con)


def test_std_oracle(hist_q, con):
    check_stat(hist_q.std(), "std", con)


def test_moment_oracle(hist_q, con):
    check_stat(hist_q.moment(3), "moment", con, order=3)


def test_median_oracle(hist_q, con):
    check_stat(hist_q.median(), "median", con)


def test_ppf_oracle(hist_q, con):
    check_stat(hist_q.ppf(0.9), "ppf", con, q=0.9)


def test_interval_oracle(hist_q, con):
    check_stat(hist_q.interval(0.8), "interval", con, confidence=0.8)


def test_cdf_oracle(hist_q, con):
    check_stat(hist_q.cdf(25.0), "cdf", con, x=25.0)


def test_weighted_stats_oracle(lineitem, con):
    r = histogram(
        lineitem, "l_quantity", SPEC, weights="l_extendedprice",
        group_by=["l_returnflag"],
    )
    sql = stats_oracle_sql(
        "mean", "lineitem", ["l_quantity"], [SPEC], "l_quantity",
        weights="l_extendedprice", group_by=["l_returnflag"],
    )
    assert_matches_sql(r.mean(), sql, con)


def test_stats_vs_raw_samples(lineitem):
    """Reference tolerance: hist-derived mean/median/std within half a bin
    width of the raw-sample statistic (continuous column; integer-valued
    columns discretise onto bin edges and inflate the error)."""
    lo, hi, n = 900.0, 105000.0, 40
    spec = Regular(n, lo, hi)
    vals = np.array([r["l_extendedprice"] for r in lineitem.collect()])
    vals = vals[(vals >= lo) & (vals < hi)]
    half_bin = (hi - lo) / n / 2.0
    h = histogram(lineitem, "l_extendedprice", spec)
    got_mean = h.mean().collect()[0][0]
    got_median = h.median().collect()[0][0]
    got_std = h.std().collect()[0][0]
    assert abs(got_mean - vals.mean()) < half_bin
    assert abs(got_median - np.median(vals)) < half_bin
    assert abs(got_std - vals.std()) < half_bin


def test_ppf_numpy_parity(lineitem):
    """ppf equals the piecewise-linear inverse-CDF computed in numpy."""
    vals = np.array([r["l_quantity"] for r in lineitem.collect()])
    counts, edges = np.histogram(vals, bins=25, range=(1.0, 51.0))
    # emulate boost half-open last bin: values == 51 would be dropped; none here
    cum = np.cumsum(counts).astype(float)
    tot = cum[-1]
    q = 0.75
    j = int(np.searchsorted(cum, q * tot))
    cumb = cum[j] - counts[j]
    expected = edges[j] + (q * tot - cumb) / counts[j] * (edges[j + 1] - edges[j])
    h = histogram(lineitem, "l_quantity", SPEC)
    got = h.ppf(0.75).collect()[0][0]
    assert got == pytest.approx(expected, rel=1e-12)


def test_stats_reject_categorical(lineitem):
    from xarray_histogram_spark import StrCategory

    h = histogram(lineitem, "l_returnflag", StrCategory(("A", "N", "R")))
    with pytest.raises(ValueError):
        h.mean()


def test_ppf_q_range(hist_q):
    with pytest.raises(ValueError):
        hist_q.ppf(0.0)
    with pytest.raises(ValueError):
        hist_q.ppf(1.5)


def test_stats_invariant_under_normalize_and_follow_scale(spark, lineitem):
    """Statistics read the raw internal mass (__val), so they are invariant
    under normalize() (scipy rv_histogram semantics — normalization cancels
    in every mass ratio, even on uneven Variable widths) and follow a
    coordinate scale().  Guards the sparse-aggregate fast path against
    staleness when result-algebra ops wrap the result."""
    from xarray_histogram_spark import Variable as _Var

    spec = _Var((1.0, 5.0, 20.0, 51.0))  # uneven widths — the risky case
    h = histogram(lineitem, "l_quantity", spec, group_by=["l_returnflag"])
    raw_med = sorted((r["l_returnflag"], r["l_quantity_median"])
                     for r in h.median().collect())
    norm_med = sorted((r["l_returnflag"], r["l_quantity_median"])
                      for r in h.normalize().median().collect())
    assert raw_med == norm_med
    raw_mean = sorted((r["l_returnflag"], r["l_quantity_mean"])
                      for r in h.mean().collect())
    norm_mean = sorted((r["l_returnflag"], r["l_quantity_mean"])
                       for r in h.normalize().mean().collect())
    assert raw_mean == norm_mean
    sc_mean = sorted((r["l_returnflag"], r["l_quantity_mean"])
                     for r in h.scale(2.0).mean().collect())
    assert all(abs(a[1] * 2.0 - b[1]) < 1e-9
               for a, b in zip(raw_mean, sc_mean))


def test_stats_keep_all_flow_groups(spark):
    """A flow=True group whose every row lands in flow bins must still get
    a (NULL-statistic) row — the dense result carries its zero-mass core
    bins, and the sparse fast path must not be used in flow mode (it would
    drop the group entirely)."""
    rows = [("A", 100.0), ("A", -5.0), ("B", 0.5), ("B", 0.7)]
    df = spark.createDataFrame(rows, "g string, x double")
    h = histogram(df, "x", Regular(4, 0.0, 1.0), group_by=["g"], flow=True)
    med = {r["g"]: r["x_median"] for r in h.median().collect()}
    assert set(med) == {"A", "B"}
    assert med["A"] is None and med["B"] is not None
    mean = {r["g"]: r["x_mean"] for r in h.mean().collect()}
    assert set(mean) == {"A", "B"} and mean["A"] is None


def test_stats_sparse_and_dense_paths_agree(spark, lineitem, tmp_path):
    """A reloaded result has no sparse aggregate (_sparse=None → dense
    statistics path); a fresh result uses the sparse fast path.  Every
    statistic must be bit-identical across the two paths."""
    from xarray_histogram_spark import read_result, write_result

    h = histogram(lineitem, "l_quantity", Regular(12, 1.0, 51.0),
                  group_by=["l_returnflag"])
    assert h._sparse is not None
    path = str(tmp_path / "h")
    write_result(h, path)
    r = read_result(spark, path)
    assert r._sparse is None
    for stat in ("median", "mean", "std"):
        fresh = sorted(map(str, getattr(h, stat)().collect()))
        reload = sorted(map(str, getattr(r, stat)().collect()))
        assert fresh == reload, stat
    fresh_ppf = sorted(map(str, h.ppf(0.9).collect()))
    reload_ppf = sorted(map(str, r.ppf(0.9).collect()))
    assert fresh_ppf == reload_ppf
