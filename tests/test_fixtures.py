"""FIXTURES.md parity matrix: the driver's described synthetic fixtures
(F1 samples_1d, F2 samples_grid, F3 samples_pair, F4 samples_normal)
exercised against numpy oracles with the reference's tolerances — the
tabular analog of the reference's parametrized-grid tests (SURVEY §5)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from xarray_histogram_spark import (
    IntCategory,
    Integer,
    Regular,
    StrCategory,
    Variable,
    histogram,
    histogramdd,
)

SEED = 42


@pytest.fixture(scope="module")
def f1_samples_1d(spark):
    rng = np.random.default_rng(SEED)
    n = 10_000
    val = rng.uniform(0, 1, n)
    null_mask = rng.uniform(0, 1, n) < 0.01
    rows = [
        (
            int(i),
            None if null_mask[i] else float(val[i]),
            int(rng.integers(0, 10)),
            bool(rng.integers(0, 2)),
            str(rng.choice(["a", "b", "c"])),
            float(rng.uniform(0, 1)),
        )
        for i in range(n)
    ]
    return (
        spark.createDataFrame(
            rows, "i: long, val: double, val_int: long, val_bool: boolean, "
            "val_str: string, weight: double"
        ).cache(),
        np.where(null_mask, np.nan, val),
    )


def test_f1_regular_vs_numpy(f1_samples_1d):
    df, val = f1_samples_1d
    clean = val[~np.isnan(val)]
    expected, _ = np.histogram(clean, bins=30, range=(0.0, 1.0))
    r = histogram(df, "val", Regular(30, 0.0, 1.0))
    got = np.array(
        [row["val_histogram"] for row in r.df.orderBy("val_bin").collect()]
    )
    # boost half-open last bin vs numpy closed: atol=1 on the last bin
    np.testing.assert_allclose(got[:-1], expected[:-1])
    assert abs(got[-1] - expected[-1]) <= 1


def test_f1_flow_combinations(f1_samples_1d):
    df, val = f1_samples_1d
    clean = val[~np.isnan(val)]
    n_null = int(np.isnan(val).sum())
    lo, hi = 0.2, 0.8
    for under in (True, False):
        for over in (True, False):
            spec = Regular(6, lo, hi, underflow=under, overflow=over)
            r = histogram(df, "val", spec, flow=True, storage="int64")
            rows = {row["val_bin"]: row["val_histogram"] for row in r.df.collect()}
            if under:
                assert rows[-1] == (clean < lo).sum()
            else:
                assert -1 not in rows
            if over:
                # NaN/NULL → overflow
                assert rows[6] == (clean >= hi).sum() + n_null
            else:
                assert 6 not in rows


def test_f1_integer_intcat_bool_str(f1_samples_1d):
    df, _ = f1_samples_1d
    pdf = df.toPandas()
    # Integer axis
    r = histogram(df, "val_int", Integer(0, 10), storage="int64")
    got = {row["val_int_bins"]: row["val_int_histogram"] for row in r.df.collect()}
    for v in range(10):
        assert got[v] == (pdf["val_int"] == v).sum()
    # IntCategory with overflow
    r2 = histogram(df, "val_int", IntCategory((2, 5, 8, 7)), flow=True,
                   storage="int64")
    got2 = {row["val_int_bin"]: row["val_int_histogram"] for row in r2.df.collect()}
    assert got2[0] == (pdf["val_int"] == 2).sum()
    assert got2[4] == (~pdf["val_int"].isin([2, 5, 8, 7])).sum()
    # bool via Integer(0,2)
    r3 = histogram(df, "val_bool", Integer(0, 2), storage="int64")
    got3 = {row["val_bool_bins"]: row["val_bool_histogram"] for row in r3.df.collect()}
    assert got3[0] == (~pdf["val_bool"]).sum() and got3[1] == pdf["val_bool"].sum()
    # StrCategory
    r4 = histogram(df, "val_str", StrCategory(("a", "b")), flow=True,
                   storage="int64")
    got4 = {row["val_str_bins"]: row["val_str_histogram"] for row in r4.df.collect()}
    assert got4["a"] == (pdf["val_str"] == "a").sum()
    assert got4["_flow_bin"] == (pdf["val_str"] == "c").sum()


@pytest.fixture(scope="module")
def f2_samples_grid(spark):
    rng = np.random.default_rng(SEED)
    rows = []
    for x in range(4):
        for y in range(5):
            for w in range(20):
                rows.append(
                    (x, y, w, float(rng.uniform(0, 1)), float(rng.uniform(0, 1)))
                )
    return spark.createDataFrame(
        rows, "x: int, y: int, w: int, val: double, weight: double"
    ).cache()


def test_f2_per_slice_decomposition(f2_samples_grid):
    """Histogram grouped by (x, y) equals an independent histogram of every
    (x, y) slice (reference tests/test_histogram.py:355-363)."""
    spec = Regular(8, 0.0, 1.0)
    whole = histogram(
        f2_samples_grid, "val", spec, group_by=["x", "y"], storage="int64"
    )
    lookup = {
        (r["x"], r["y"], r["val_bin"]): r["val_histogram"]
        for r in whole.df.collect()
    }
    for x, y in [(0, 0), (2, 3), (3, 4)]:
        sl = f2_samples_grid.where((F.col("x") == x) & (F.col("y") == y))
        rs = histogram(sl, "val", spec, storage="int64")
        for r in rs.df.collect():
            assert lookup[(x, y, r["val_bin"])] == r["val_histogram"]


def test_f2_weighted_grouped_vs_numpy(f2_samples_grid):
    pdf = f2_samples_grid.toPandas()
    spec = Regular(5, 0.0, 1.0)
    r = histogram(
        f2_samples_grid, "val", spec, weights="weight", group_by=["x"]
    )
    got = {(row["x"], row["val_bin"]): row["val_histogram"] for row in r.df.collect()}
    for x in range(4):
        sl = pdf[pdf["x"] == x]
        w = np.round(sl["weight"].to_numpy() * 1e6)  # engine quantisation
        exp, _ = np.histogram(
            sl["val"], bins=5, range=(0.0, 1.0), weights=w / 1e6
        )
        for b in range(5):
            assert got[(x, b)] == pytest.approx(exp[b], rel=1e-9, abs=2e-6)


@pytest.fixture(scope="module")
def f3_samples_pair(spark):
    rng = np.random.default_rng(SEED)
    n = 10_000
    rows = []
    for i in range(n):
        var2 = float(rng.uniform(0, 1))  # function of i only
        for r_ in range(2):
            rows.append(
                (i, r_, float(rng.uniform(0, 1)), var2, float(rng.uniform(0, 1)))
            )
    return spark.createDataFrame(
        rows, "i: long, r: int, var1: double, var2: double, var3: double"
    ).cache()


def test_f3_broadcast_semantics(f3_samples_pair):
    """var2 constant across the r dim: the 2-D histogram restricted to one r
    slice equals the var2-marginal — the reference's broadcast test analog
    (tests/test_histogram.py:477-506)."""
    specs = [Regular(6, 0.0, 1.0), Regular(6, 0.0, 1.0)]
    h = histogramdd(
        f3_samples_pair, ["var1", "var2"], specs, group_by=["r"],
        storage="int64",
    )
    pdf = h.df.toPandas()
    # each r slice contains every i exactly once → var2 marginals match
    m0 = pdf[pdf["r"] == 0].groupby("var2_bin")["var1_var2_histogram"].sum()
    m1 = pdf[pdf["r"] == 1].groupby("var2_bin")["var1_var2_histogram"].sum()
    assert (m0 == m1).all()


def test_f3_3var(f3_samples_pair):
    specs = [Regular(4, 0.0, 1.0)] * 3
    h = histogramdd(
        f3_samples_pair, ["var1", "var2", "var3"], specs, storage="int64"
    )
    total = h.df.agg(F.sum("var1_var2_var3_histogram")).first()[0]
    assert total == f3_samples_pair.count()
    assert h.df.count() == 64


@pytest.fixture(scope="module")
def f4_samples_normal(spark):
    rng = np.random.default_rng(SEED)
    rows = []
    for g in range(10):
        for v in rng.normal(5.0, 1.0, 1000):
            rows.append((g, float(v)))
    return spark.createDataFrame(rows, "g: int, val: double").cache(), rows


def test_f4_stats_tolerance(f4_samples_normal):
    """Hist-derived stats within half a bin width of raw per-group values
    (reference tests/test_accessor.py:334-363), bins Regular(30, 0, 10)."""
    df, rows = f4_samples_normal
    spec = Regular(30, 0.0, 10.0)
    half_bin = (10.0 - 0.0) / 30 / 2
    h = histogram(df, "val", spec, group_by=["g"])
    med = {r["g"]: r["val_median"] for r in h.median().collect()}
    mean = {r["g"]: r["val_mean"] for r in h.mean().collect()}
    std = {r["g"]: r["val_std"] for r in h.std().collect()}
    import collections

    by_g = collections.defaultdict(list)
    for g, v in rows:
        if 0.0 <= v < 10.0:
            by_g[g].append(v)
    for g in range(10):
        arr = np.array(by_g[g])
        assert abs(med[g] - np.median(arr)) < half_bin
        assert abs(mean[g] - arr.mean()) < half_bin
        assert abs(std[g] - arr.std()) < half_bin


def test_jsonl_corpus_corrupt_record_capture(spark, tmp_path):
    """PERMISSIVE ingestion: malformed lines are quarantined in the
    corrupt column with data columns NULL; good lines parse; the stats
    helper counts both."""
    from pyspark.sql import types as T

    from xarray_histogram_spark.sources.corpus import (
        corrupt_line_stats, read_jsonl_corpus,
    )

    p = tmp_path / "corpus"
    p.mkdir()
    (p / "part-0.jsonl").write_text(
        '{"doc_id": 1, "text": "ok"}\n'
        '{"doc_id": 2, "text": "naïve ☃"}\n'
        'this line is not json\n'
        '{"doc_id": 4, "text": null}\n'
        '{"doc_id": "notanumber", "text": "hi"}\n'
    )
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ])
    df = read_jsonl_corpus(spark, str(p), schema)
    all_rows = df.collect()
    rows = {r.doc_id: r for r in all_rows if r.doc_id is not None}
    assert rows[1].text == "ok" and rows[1]._corrupt_record is None
    assert rows[2].text == "naïve ☃"
    assert rows[4].text is None and rows[4]._corrupt_record is None
    bad = [r for r in all_rows if r.doc_id is None]
    # the unparseable line AND the type-mismatch line both quarantine,
    # and the partial parse ("text": "hi") is NULLED — corrupt rows never
    # leak data values into the clean stream
    assert len(bad) == 2
    assert all(r._corrupt_record is not None for r in bad)
    assert all(r.text is None for r in bad)
    s = corrupt_line_stats(df).collect()[0]
    assert s.n_lines == 5 and s.n_corrupt == 2

    import pytest as _pt

    with _pt.raises(ValueError, match="collides"):
        read_jsonl_corpus(spark, str(p), schema, corrupt_col="text")


def test_csv_corpus_lossless_roundtrip(spark, tmp_path):
    """CSV round-trip is LOSSLESS on the hostile cases: embedded commas,
    RFC-doubled quotes, tabs, unicode, and — the classic CSV trap —
    NULL vs empty string (disambiguated by the '\\N' marker both
    sides).  Types restore from text via the explicit schema."""
    from pyspark.sql import types as T

    from xarray_histogram_spark.sources.corpus import (
        read_csv_corpus, write_csv_corpus,
    )

    rows = [
        (1, "plain"),
        (2, "has,comma"),
        (3, 'has "quote" and ""double""'),
        (4, None),
        (5, ""),
        (6, "naïve ☃ 文字"),
        (7, "tab\tinside"),
        (8, "\\N literal backslash-N text"),
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    path = str(tmp_path / "csv")
    write_csv_corpus(df, path)
    back = read_csv_corpus(spark, path, df.schema)
    all_rows = back.collect()
    got = sorted((r.doc_id, r.text) for r in all_rows)
    assert got == sorted(rows)
    # (asserted off the collected rows: a corrupt-col-only query on the
    # raw CSV source trips SPARK-21610, same as JSONL)
    assert all(r._corrupt_record is None for r in all_rows)


def test_csv_corpus_corrupt_record_capture(spark, tmp_path):
    """Malformed CSV rows (type mismatch) quarantine with data columns
    NULLed — the same corrupt_col-IS-NULL trust contract as JSONL."""
    from pyspark.sql import types as T

    from xarray_histogram_spark.sources.corpus import read_csv_corpus

    p = tmp_path / "corpus"
    p.mkdir()
    (p / "part-0.csv").write_text(
        "doc_id,text\n"
        "1,ok\n"
        "notanumber,hi\n"
        "3,fine\n"
    )
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ])
    df = read_csv_corpus(spark, str(p), schema)
    all_rows = df.collect()
    good = {r.doc_id: r for r in all_rows if r._corrupt_record is None}
    bad = [r for r in all_rows if r._corrupt_record is not None]
    assert good[1].text == "ok" and good[3].text == "fine"
    # the type-mismatch row quarantines and its partial parse is NULLED
    assert len(bad) == 1
    assert bad[0].doc_id is None and bad[0].text is None
    with pytest.raises(ValueError, match="collides"):
        read_csv_corpus(spark, str(p), schema, corrupt_col="text")


@pytest.mark.slow  # ~130 s of subprocess Spark startups; full-profile only
@pytest.mark.parametrize(
    "script", ["migration_from_reference.py", "curation_pipeline.py"]
)
def test_examples_run_green(script):
    """The runnable walkthroughs are part of the public surface (README
    links them) — run each as a real subprocess at sf0.001 so API drift
    in the examples fails the suite, not the first reader."""
    import os
    import subprocess
    import sys

    from .conftest import SF_DIR

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, os.path.join(root, "examples", script), SF_DIR],
        capture_output=True, text=True, timeout=540,
    )
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    assert "OK" in r.stdout


def test_csv_corpus_write_validation_guards(spark, tmp_path):
    """The writer REJECTS the three shapes that cannot round-trip
    through splittable CSV (each reproduced as silent corruption before
    its guard): embedded newlines (a multiLine=False reader trusts the
    truncated prefix), a field equal to the null marker (reads back as
    NULL — quoting cannot disambiguate, verified), and NUL bytes
    (hypothesis-found: univocity's parser uses '\\0' as its internal
    no-char sentinel and silently DROPS a NUL inside a quoted field on
    read while an unquoted one survives — ",\\x00" round-tripped to
    "," — data-dependent, so ALL NULs are refused).  validate=False
    opts out for multi_line=True consumers."""
    from xarray_histogram_spark.sources.corpus import (
        read_csv_corpus, write_csv_corpus,
    )

    nl = spark.createDataFrame(
        [(1, "line1\nline2")], "doc_id LONG, text STRING"
    )
    with pytest.raises(ValueError, match="embedded newlines"):
        write_csv_corpus(nl, str(tmp_path / "a"))
    mk = spark.createDataFrame([(1, "\\N")], "doc_id LONG, text STRING")
    with pytest.raises(ValueError, match="null marker"):
        write_csv_corpus(mk, str(tmp_path / "b"))
    nul = spark.createDataFrame([(1, ",\x00x")], "doc_id LONG, text STRING")
    with pytest.raises(ValueError, match="NUL bytes"):
        write_csv_corpus(nul, str(tmp_path / "n"))
    # …and the NUL check survives validate=False (review-found: the
    # newline escape hatch must not waive the guard that has no safe
    # reader configuration — multi_line=True does not recover a
    # quoted-field NUL)
    with pytest.raises(ValueError, match="NUL bytes"):
        write_csv_corpus(nul, str(tmp_path / "n2"), validate=False)
    # opt-out + multi_line=True reader round-trips the newline doc
    p = str(tmp_path / "c")
    write_csv_corpus(nl, p, validate=False)
    back = read_csv_corpus(spark, p, nl.schema, multi_line=True)
    rows = back.collect()
    assert len(rows) == 1 and rows[0].text == "line1\nline2"
    assert rows[0]._corrupt_record is None
