"""Seeded randomized cross-engine fuzz of the oracle generator: random spec
family × flow × weights × grouping combinations, each run through BOTH the
engine and `histogram_oracle_sql`, compared exactly.  Hardens the generator
beyond the fixed registry configurations."""

import random

import pytest
from pyspark.sql import functions as F

from xarray_histogram_spark import (
    IntCategory,
    Integer,
    Regular,
    StrCategory,
    Variable,
    histogramdd,
)
from xarray_histogram_spark import oracle as orc

from .conftest import scaled_seeds as _seeds
from .util import assert_matches_sql, duck


def _random_config(rng: random.Random):
    kind = rng.choice(["regular", "log", "sqrt", "pow", "variable", "vbinary",
                       "integer", "intcat", "strcat"])
    if kind == "regular":
        lo = rng.uniform(0.0, 20.0)
        spec, col = Regular(rng.randint(3, 24), lo, lo + rng.uniform(5.0, 80.0)), "l_quantity"
    elif kind == "log":
        spec, col = Regular(rng.randint(3, 12), rng.uniform(0.5, 2.0),
                            rng.uniform(40.0, 60.0), transform="log"), "l_quantity"
    elif kind == "sqrt":
        spec, col = Regular(rng.randint(3, 12), 0.0,
                            rng.uniform(40.0, 60.0), transform="sqrt"), "l_quantity"
    elif kind == "pow":
        # exact=True: the oracle-deterministic literal-edge path (Math.pow
        # vs C pow may differ in the last ulp on the fast path)
        lo = rng.uniform(0.0, 2.0)
        spec, col = Regular(
            rng.randint(3, 12), lo, lo + rng.uniform(40.0, 60.0),
            transform="pow", power=rng.choice([0.5, 2.0, 3.0]), exact=True,
        ), "l_quantity"
    elif kind in ("variable", "vbinary"):
        cuts = sorted({round(rng.uniform(1.0, 50.0), 3) for _ in range(rng.randint(3, 9))})
        if len(cuts) < 2:
            cuts = [1.0, 25.0, 50.0]
        spec = Variable(tuple(cuts), binary=(kind == "vbinary"))
        col = "l_quantity"
    elif kind == "integer":
        lo = rng.randint(-2, 10)
        spec, col = Integer(lo, lo + rng.randint(2, 40)), "l_linenumber"
    elif kind == "intcat":
        cats = tuple(sorted(rng.sample(range(1, 8), rng.randint(2, 5))))
        spec, col = IntCategory(cats), "l_linenumber"
    else:
        cats = tuple(sorted(rng.sample(["A", "N", "R"], rng.randint(2, 3))))
        spec, col = StrCategory(cats), "l_returnflag"
    flow = rng.random() < 0.5
    weights = "l_extendedprice" if rng.random() < 0.4 else None
    group_by = ["l_linestatus"] if rng.random() < 0.4 and col != "l_linenumber" else []
    density = rng.random() < 0.3
    return spec, col, flow, weights, group_by, density


@pytest.mark.parametrize("seed", _seeds(range(12), keep=4))
def test_fuzzed_spec_matches_oracle(spark, sf_dir, seed):
    rng = random.Random(20260813 + seed)
    spec, col, flow, weights, group_by, density = _random_config(rng)
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    r = histogramdd(
        li, [col], [spec], flow=flow, weights=weights,
        group_by=group_by, density=density,
    )
    sql = orc.histogram_oracle_sql(
        "lineitem", [col], [spec], flow=flow, weights=weights,
        group_by=group_by, density=density,
    )
    assert_matches_sql(r.df, sql, duck(sf_dir))


@pytest.mark.parametrize("seed", _seeds(range(6), keep=2))
def test_fuzzed_2var_matches_oracle(spark, sf_dir, seed):
    rng = random.Random(777 + seed)
    s1 = Regular(rng.randint(3, 10), rng.uniform(0.0, 5.0), rng.uniform(40.0, 60.0))
    cuts = sorted({round(rng.uniform(0.0, 0.1), 4) for _ in range(rng.randint(3, 6))})
    if len(cuts) < 2:
        cuts = [0.0, 0.05, 0.1]
    s2 = Variable(tuple(cuts))
    flow = rng.random() < 0.5
    weights = "l_extendedprice" if rng.random() < 0.5 else None
    group_by = ["l_returnflag"] if rng.random() < 0.5 else []
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    r = histogramdd(
        li, ["l_quantity", "l_discount"], [s1, s2], flow=flow,
        weights=weights, group_by=group_by,
    )
    sql = orc.histogram_oracle_sql(
        "lineitem", ["l_quantity", "l_discount"], [s1, s2], flow=flow,
        weights=weights, group_by=group_by,
    )
    assert_matches_sql(r.df, sql, duck(sf_dir))


@pytest.mark.parametrize("seed", _seeds(range(8), keep=3))
def test_fuzzed_stats_match_oracle(spark, sf_dir, seed):
    """Randomized distribution-statistic configs through both the engine
    and `stats_oracle_sql` (fold-heavy generator — the riskiest mirror)."""
    from xarray_histogram_spark.plans import stats as st

    rng = random.Random(4242 + seed)
    kind = rng.choice(["mean", "var", "std", "median", "moment", "ppf",
                       "cdf", "interval"])
    lo = rng.uniform(0.5, 3.0)
    spec = Regular(rng.randint(4, 16), lo, lo + rng.uniform(20.0, 60.0))
    group_by = ["l_returnflag"] if rng.random() < 0.5 else []
    weights = "l_extendedprice" if rng.random() < 0.3 else None
    skw = {}
    if kind == "moment":
        skw["order"] = rng.randint(1, 4)
    elif kind == "ppf":
        skw["q"] = round(rng.uniform(0.05, 0.95), 2)
    elif kind == "cdf":
        skw["x"] = round(rng.uniform(lo, lo + 20.0), 2)
    elif kind == "interval":
        skw["confidence"] = round(rng.uniform(0.5, 0.95), 2)
    from xarray_histogram_spark import histogramdd

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    h = histogramdd(li, ["l_quantity"], [spec], group_by=group_by,
                    weights=weights)
    if kind == "moment":
        sdf = st.moment(h, skw["order"], "l_quantity")
    elif kind == "ppf":
        sdf = st.ppf(h, skw["q"], "l_quantity")
    elif kind == "cdf":
        sdf = st.cdf(h, skw["x"], "l_quantity")
    elif kind == "interval":
        sdf = st.interval(h, skw["confidence"], "l_quantity")
    else:
        sdf = getattr(st, kind)(h, "l_quantity")
    sql = orc.stats_oracle_sql(
        kind, "lineitem", ["l_quantity"], [spec], "l_quantity",
        group_by=group_by, weights=weights, **skw,
    )
    assert_matches_sql(sdf, sql, duck(sf_dir))


@pytest.mark.parametrize("seed", _seeds(range(6), keep=2))
def test_fuzzed_binned_statistic_matches_oracle(spark, sf_dir, seed):
    """Randomized binned-statistic configs (axis × stats × grouping ×
    flow × scale) through engine and DuckDB mirror, compared exactly —
    includes the round-4 sum_sq / sample_var accumulator stats."""
    from xarray_histogram_spark.plans.binned import (
        STATS, binned_statistic, binned_statistic_sql,
    )

    rng = random.Random(20260814 + seed)
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    con = duck(sf_dir)
    if rng.random() < 0.5:
        lo = rng.uniform(1.0, 10.0)
        spec = Regular(rng.randint(3, 12), lo, lo + rng.uniform(20.0, 45.0))
    else:
        cuts = sorted({round(rng.uniform(1.0, 50.0), 2) for _ in range(4)})
        if len(cuts) < 2:
            cuts = [1.0, 25.0, 50.0]
        spec = Variable(tuple(cuts))
    x = "l_quantity"
    value = rng.choice(["l_discount", "l_tax", "l_extendedprice"])
    # keep the exact-int square inside int64: big-magnitude values use a
    # smaller quantization scale (documented overflow bound)
    scale = 2 if value == "l_extendedprice" else rng.choice([4, 6])
    k = rng.randint(1, len(STATS))
    stats = tuple(rng.sample(list(STATS), k))
    group_by = ["l_returnflag"] if rng.random() < 0.4 else []
    flow = rng.random() < 0.3
    got = binned_statistic(
        li, x, spec, value, stats, group_by=group_by, flow=flow,
        weight_scale=scale,
    )
    sql = binned_statistic_sql(
        "lineitem", x, spec, value, stats, group_by=group_by, flow=flow,
        weight_scale=scale,
    )
    assert_matches_sql(got, sql, con)


# ---------------------------------------------------------------------------
# regex-mirror fuzz: pii_scrub / extract_urls over adversarial random text
# ---------------------------------------------------------------------------

_PII_ATOMS = [
    "@", ".", "-", "+", ":", "/", " ", "\t", "\n", "\x0b", "'", '"',
    "http://", "https://", "ftp://", "www.", ".com", ".org", ".co",
    "example", "mail", "user", "ssn", "(", ")", "[", "]", "$", "\\",
    "123", "45", "6789", "0", "99", "255", "１２３", "naïve", "文字",
    "4111", "1111-",
    "☃", "a", "B", "zz", "%", "#", "?", "=", "&", "_", "~", ",",
    "- ", "* ", "...", "the ", "be ", "with ", "of ", "\r", "...\r\n",
]


def _random_text(rng: random.Random) -> str:
    n = rng.randint(0, 24)
    return "".join(rng.choice(_PII_ATOMS) for _ in range(n))


@pytest.mark.parametrize("seed", _seeds([101, 202, 303]))
def test_fuzzed_pii_url_mirrors(spark, seed):
    """Spark (Java regex) vs DuckDB (RE2) over random near-PII text: the
    shared-syntax pattern subset must scan/replace identically — any
    divergence (greediness, class contents, alternation order, unicode)
    is a real oracle bug, not tolerance noise."""
    import duckdb
    import pandas as pd

    from xarray_histogram_spark.operators import text as tx

    rng = random.Random(seed)
    rows = [(i, _random_text(rng)) for i in range(300)]
    rows += [(300, None), (301, "")]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"]).astype(
        {"doc_id": "int64"}
    )
    df = spark.createDataFrame(pdf, "doc_id long, text string")
    con = duckdb.connect()
    con.register("fuzzdocs", pdf)
    assert_matches_sql(
        tx.pii_scrub(df, "text", "doc_id"),
        tx.pii_scrub_sql("fuzzdocs", "text", "doc_id"),
        con,
    )
    assert_matches_sql(
        tx.extract_urls(df, "text", "doc_id"),
        tx.extract_urls_sql("fuzzdocs", "text", "doc_id"),
        con,
    )
    # gopher_rules shares the regex/tokenizer mirror surface (line split,
    # anchored bullet/ellipsis classes, int/int ratios) — fuzz it too
    assert_matches_sql(
        tx.gopher_rules(df, "text", "doc_id", min_words=3),
        tx.gopher_rules_sql("fuzzdocs", "text", "doc_id", min_words=3),
        con,
    )


@pytest.mark.parametrize("seed", _seeds([31, 62]))
def test_fuzzed_ngram_familiarity_mirror(spark, seed):
    """Random text corpora (shared + unique vocab, NULL/empty/short
    docs, mixed case) × gram widths vs the DuckDB mirror: the window
    corpus counts, integer sums and the single exact division must
    hash-match on any partitioning."""
    import duckdb
    import pandas as pd

    from xarray_histogram_spark.operators import text as tx

    rng = random.Random(seed)
    vocab = [f"w{k}" for k in range(40)] + ["THE", "the", "The"]
    rows = []
    for i in range(250):
        m = rng.randrange(0, 9)
        rows.append((i, " ".join(rng.choice(vocab) for _ in range(m))
                     if m else ""))
    rows += [(250, None), (251, "solo"), (252, "  spaced   out  ")]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"]).astype(
        {"doc_id": "int64"}
    )
    df = spark.createDataFrame(pdf, "doc_id long, text string")
    con = duckdb.connect()
    con.register("famdocs", pdf)
    for n in (1, 2, 3):
        assert_matches_sql(
            tx.ngram_familiarity(df, "text", "doc_id", n=n),
            tx.ngram_familiarity_sql("famdocs", "text", "doc_id", n=n),
            con,
        )


@pytest.mark.parametrize("seed", _seeds([11, 22]))
def test_fuzzed_balanced_sample_mirror(spark, seed):
    """Random group distributions (skew, NULL groups, NULL keys) ×
    random targets: Spark's Python-integer thresholds and the oracle's
    HUGEINT division must agree on every row's membership."""
    import duckdb
    import pandas as pd

    from xarray_histogram_spark.operators import sampling as sp

    rng = random.Random(seed)
    groups = ["a", "b", None, "dominant", "é"]
    weights = [1, 2, 1, 12, 1]
    rows = []
    for i in range(400):
        g = rng.choices(groups, weights)[0]
        key = None if rng.random() < 0.03 else i
        rows.append((key, g))
    pdf = pd.DataFrame(rows, columns=["id", "grp"]).astype({"id": "Int64"})
    # build the Spark frame from the raw rows: pandas' nullable Int64
    # round-trips NULLs as NaN floats through createDataFrame
    df = spark.createDataFrame(rows, "id long, grp string")
    con = duckdb.connect()
    con.register("fuzzrows", pdf)
    target = rng.choice([1, 7, 50, 120, 1000])
    assert_matches_sql(
        sp.balanced_sample(df, "grp", "id", target).select("id", "grp"),
        sp.balanced_sample_sql("fuzzrows", ["id", "grp"], "grp", "id",
                               target),
        con,
    )


@pytest.mark.parametrize("seed", _seeds(range(6), keep=2))
def test_fuzzed_rollup_matches_oracle(spark, sf_dir, seed):
    """Rollup/cube oracle fuzz: random spec family × flow × weights ×
    group-hierarchy depth × cube flag — the one oracle generator family
    the seeded fuzz did not yet cover (its GROUPING SETS / grouping_id
    arithmetic is hand-mirrored)."""
    from xarray_histogram_spark.plans.rollup import (
        rollup_histogramdd, rollup_histogramdd_sql,
    )

    rng = random.Random(424242 + seed)
    spec, col, flow, weights, _gb, _d = _random_config(rng)
    if col == "l_returnflag":
        col = "l_quantity"
        spec = Regular(8, 1.0, 51.0)
    hierarchy = rng.choice(
        [["l_returnflag"], ["l_returnflag", "l_linestatus"]]
    )
    cube = rng.random() < 0.5
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    df = rollup_histogramdd(
        li, [col], [spec], hierarchy, cube=cube, flow=flow, weights=weights
    )
    sql = rollup_histogramdd_sql(
        "lineitem", [col], [spec], hierarchy, cube=cube, flow=flow,
        weights=weights,
    )
    assert_matches_sql(df, sql, duck(sf_dir))


@pytest.mark.parametrize("seed", _seeds([7, 77, 777]))
def test_fuzzed_asof_join_mirror(spark, seed):
    """As-of join fuzz: random key/timestamp collisions (many exact ts
    ties, NULL keys/timestamps on both sides, random tolerance) through
    the union+window plan and the LATERAL rank-1 oracle — the tie-break
    and NULL conventions are the historically bug-dense surface."""
    import duckdb

    from xarray_histogram_spark.operators.joins import asof_join, asof_join_sql

    rng = random.Random(seed)
    keys = ["u1", "u2", None]
    lrows, rrows = [], []
    for i in range(120):
        k = rng.choice(keys)
        # coarse grid => heavy exact-timestamp collisions
        ts = rng.randrange(0, 40) * 1000 if rng.random() > 0.03 else None
        lrows.append((i, k, ts))
    for j in range(80):
        k = rng.choice(keys)
        ts = rng.randrange(0, 40) * 1000 if rng.random() > 0.05 else None
        val = None if rng.random() < 0.1 else round(rng.uniform(0, 9), 3)
        rrows.append((j, k, ts, val))
    ldf = spark.createDataFrame(lrows, "lid LONG, k STRING, ts LONG")
    rdf = spark.createDataFrame(rrows, "rid LONG, k STRING, ts LONG, v DOUBLE")
    con = duckdb.connect()
    con.register("lt", ldf.toPandas())
    con.register("rt", rdf.toPandas())
    tol = rng.choice([None, 2000, 10_000])
    got = asof_join(ldf, rdf, ["k"], "ts", ["v"], "rid", tolerance=tol)
    sql = asof_join_sql("SELECT * FROM lt", "SELECT * FROM rt", ["k"], "ts",
                        ["v"], "rid", tolerance=tol)
    assert_matches_sql(got, sql, con)


@pytest.mark.parametrize("seed", _seeds([5, 55]))
def test_fuzzed_curate_mirror(spark, sf_dir, seed):
    """Composed curation pipeline fuzz: random quality threshold, language
    filter, split fractions, salt and dedup shape — the hand-composed CTE
    oracle must match both the wide-window and narrow-semi-join plans."""
    from xarray_histogram_spark.operators.curate import (
        curate_documents, curate_documents_sql,
    )

    rng = random.Random(seed)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    qmin = rng.choice([None, 0.1, 0.25])
    langs = rng.choice([None, ("en",), ("en", "und", "fr")])
    a = round(rng.uniform(0.5, 0.8), 2)
    b = round((1.0 - a) / 2, 3)
    splits = [("train", a), ("val", b), ("test", round(1.0 - a - b, 3))]
    salt = f"s{seed}"
    sql = curate_documents_sql(
        "documents", "text", "doc_id",
        quality_min=qmin, langs=langs, splits=splits, salt=salt,
    )
    for wide in (True, False):
        got = curate_documents(
            docs, "text", "doc_id",
            quality_min=qmin, langs=langs, splits=splits, salt=salt,
            wide_rows=wide,
        )
        assert_matches_sql(got, sql, duck(sf_dir))


@pytest.mark.parametrize("seed", _seeds([3, 33, 333]))
def test_fuzzed_funnel_and_range_mirror(spark, seed):
    """Funnel + range-join fuzz over collision-heavy random events:
    timestamps on a coarse grid that lands EXACTLY on window-bucket
    multiples (the delicate pmod-floor bucket math), random funnel depth
    and window, NULL timestamps, stage types missing entirely for some
    keys."""
    import duckdb

    from xarray_histogram_spark.operators.joins import (
        funnel_conversion, funnel_conversion_sql,
        range_join_count, range_join_count_sql,
    )

    rng = random.Random(seed)
    types = ["view", "cart", "buy", "refund"]
    rows = []
    for i in range(250):
        k = rng.randrange(0, 12)
        # multiples of 500 → many ts exactly at bucket edges for W=1000/2000
        ts = rng.randrange(0, 40) * 500 if rng.random() > 0.03 else None
        rows.append((i, k, ts, rng.choice(types)))
    df = spark.createDataFrame(rows, "eid LONG, k LONG, ts LONG, et STRING")
    con = duckdb.connect()
    con.register("fe", df.toPandas())

    depth = rng.choice([2, 3, 4])
    window = rng.choice([None, 3000])
    got = funnel_conversion(df.where("ts IS NOT NULL"), "k", "ts", "et",
                            types[:depth], window=window)
    sql = funnel_conversion_sql("SELECT * FROM fe WHERE ts IS NOT NULL",
                                "k", "ts", "et", types[:depth],
                                window=window)
    assert_matches_sql(got, sql, con)

    w = rng.choice([1000, 2000, 777])
    left = df.where("ts IS NOT NULL")
    got2 = range_join_count(left, left, ["k"], "ts", w, "eid")
    lsql = "SELECT * FROM fe WHERE ts IS NOT NULL"
    sql2 = range_join_count_sql(lsql, lsql, ["k"], "ts", w, "eid")
    assert_matches_sql(got2, sql2, con)


def _random_corpus(rng: random.Random, n: int = 120) -> list:
    """Random small corpus with NATURAL near-dups (tiny vocabulary),
    planted cross-id duplicates, NULLs, empties, and degenerate repeats
    — the shapes that stress banding, Jaccard, and NULL semantics."""
    vocab = ["alpha", "beta", "gamma", "delta", "の", "naïve", "x9"]
    rows = []
    for i in range(n):
        r = rng.random()
        if r < 0.08:
            rows.append((i, None))
        elif r < 0.14:
            rows.append((i, ""))
        elif r < 0.22 and rows:
            # duplicate an earlier doc (exact or near)
            src = rng.choice(rows)[1] or "fallback text body"
            suffix = "" if rng.random() < 0.5 else " tail"
            rows.append((i, src + suffix))
        elif r < 0.30:
            rows.append((i, "shared boilerplate page body"))  # degenerate
        else:
            n_words = rng.randint(1, 30)
            rows.append(
                (i, " ".join(rng.choice(vocab) for _ in range(n_words)))
            )
    return rows


@pytest.mark.parametrize("seed", _seeds([7, 77, 777]))
def test_fuzzed_incremental_dedup_mirror(spark, seed):
    """incremental_dedup vs its composed DuckDB mirror on random corpora
    with planted cross-/within-shard duplicates, NULL/empty texts and a
    degenerate boilerplate key — every verdict column must hash-match."""
    import duckdb
    import pandas as pd

    from xarray_histogram_spark.operators import dedup as dd

    rng = random.Random(seed)
    rows = _random_corpus(rng)
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"]).astype(
        {"doc_id": "int64"}
    )
    df = spark.createDataFrame(pdf, "doc_id long, text string")
    con = duckdb.connect()
    con.register("fuzzcorp", pdf)
    mod = rng.choice([3, 4])
    new_df = df.where(F.col("doc_id") % mod == 0)
    kept_df = df.where(F.col("doc_id") % mod != 0)
    thr = rng.choice([0.7, 0.8, 0.9])
    assert_matches_sql(
        dd.incremental_dedup(new_df, kept_df, "text", "doc_id",
                             threshold=thr),
        dd.incremental_dedup_sql(
            f"SELECT doc_id, text FROM fuzzcorp WHERE doc_id % {mod} = 0",
            f"SELECT doc_id, text FROM fuzzcorp WHERE doc_id % {mod} <> 0",
            "text", "doc_id", threshold=thr,
        ),
        con,
    )


@pytest.mark.parametrize("seed", _seeds([19, 191]))
def test_fuzzed_chunk_near_keep_mirror(spark, seed):
    """chunk_near_keep vs its composed DuckDB mirror on random corpora
    under RANDOM window grids (incl. stride>chunk gap mode) and
    thresholds — the packed-uid keep policy must hash-match, NULL/empty
    texts and planted near-dups included."""
    import duckdb
    import pandas as pd

    from xarray_histogram_spark.operators import dedup as dd

    rng = random.Random(seed)
    rows = _random_corpus(rng, 80)
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"]).astype(
        {"doc_id": "int64"}
    )
    df = spark.createDataFrame(pdf, "doc_id long, text string")
    con = duckdb.connect()
    con.register("fuzzcorp", pdf)
    for _ in range(3):
        chunk = rng.randint(1, 8)
        stride = rng.randint(1, 10)
        thr = rng.choice([0.6, 0.8, 0.95])
        assert_matches_sql(
            dd.chunk_near_keep(df, "text", "doc_id", chunk, stride, k=4,
                               threshold=thr),
            dd.chunk_near_keep_sql("fuzzcorp", "text", "doc_id", chunk,
                                   stride, k=4, threshold=thr),
            con,
        )


@pytest.mark.parametrize("seed", _seeds([29, 291]))
def test_fuzzed_linear_quality_score_mirror(spark, seed):
    """linear_quality_score vs its mirror on random corpora under RANDOM
    weight tables / sizes / biases — bucket assignment and the
    left-to-right double fold must be bit-identical, NULL/empty/unicode
    texts included."""
    import duckdb
    import pandas as pd

    from xarray_histogram_spark.operators import text as tx

    rng = random.Random(seed)
    rows = _random_corpus(rng, 70)
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"]).astype(
        {"doc_id": "int64"}
    )
    df = spark.createDataFrame(pdf, "doc_id long, text string")
    con = duckdb.connect()
    con.register("lqcorp", pdf)
    for _ in range(3):
        n = rng.choice([2, 17, 64, 256])
        w = [rng.uniform(-1, 1) for _ in range(n)]
        bias = rng.uniform(-2, 2)
        assert_matches_sql(
            tx.linear_quality_score(df, "text", "doc_id", w, bias=bias),
            tx.linear_quality_score_sql("lqcorp", "text", "doc_id", w,
                                        bias=bias),
            con,
        )


@pytest.mark.parametrize("seed", _seeds([31, 311]))
def test_fuzzed_mixture_weights_mirror(spark, seed):
    """mixture_weights vs its mirror under RANDOM group assignments,
    random integral masses (including zero-mass groups) and random
    un-normalized targets that cover a random subset of the groups."""
    import duckdb
    import pandas as pd

    from xarray_histogram_spark.operators import sampling as sp

    rng = random.Random(seed)
    groups = ["g%d" % i for i in range(rng.randint(2, 8))] + [None]
    rows = [
        (i, rng.choice(groups),
         0 if rng.random() < 0.15 else rng.randint(0, 500))
        for i in range(120)
    ]
    pdf = pd.DataFrame(rows, columns=["doc_id", "src", "ntok"]).astype(
        {"doc_id": "int64", "ntok": "int64"}
    )
    df = spark.createDataFrame(pdf, "doc_id long, src string, ntok long")
    con = duckdb.connect()
    con.register("mxcorp", pdf)
    for _ in range(3):
        named = [g for g in groups if g is not None]
        tgt = {
            g: rng.uniform(0.0, 5.0)
            for g in rng.sample(named, rng.randint(1, len(named)))
        }
        tgt["phantom"] = rng.uniform(0.0, 2.0)
        if not sum(tgt.values()) > 0:
            tgt["phantom"] = 1.0
        for wc in (None, "ntok"):
            assert_matches_sql(
                sp.mixture_weights(df, "src", tgt, weight_col=wc),
                sp.mixture_weights_sql("mxcorp", "src", tgt, weight_col=wc),
                con,
            )


@pytest.mark.parametrize("seed", _seeds([41, 411]))
def test_fuzzed_temperature_weights_mirror(spark, seed):
    """temperature_weights vs its mirror under RANDOM group assignments
    and random integral masses (including zero-mass groups and NULL
    group keys), across every supported sqrt_steps — the tempered
    BIGINTs must match because IEEE sqrt is correctly rounded in both
    engines, and LARGE masses (up to 2⁵⁵, past double's 2⁵³ exactness)
    pin that the bigint→double rounding agrees too.  Masses stay small
    enough that the 120-row TOTAL fits int64 — past that the engines
    legitimately diverge (Spark's bigint window sum overflows under
    ANSI while DuckDB silently promotes to HUGEINT), which is why the
    operators' contract caps total mass at int64 (~9.2e18 ≈ 9
    exa-tokens — orders of magnitude past a 100 TB corpus)."""
    import duckdb
    import pandas as pd

    from xarray_histogram_spark.operators import sampling as sp

    rng = random.Random(seed)
    groups = ["g%d" % i for i in range(rng.randint(2, 8))] + [None]
    rows = [
        (i, rng.choice(groups),
         0 if rng.random() < 0.15 else
         rng.randint(0, 500) if rng.random() < 0.8 else
         rng.randint(1 << 40, 1 << 55))
        for i in range(120)
    ]
    pdf = pd.DataFrame(rows, columns=["doc_id", "src", "ntok"]).astype(
        {"doc_id": "int64", "ntok": "int64"}
    )
    df = spark.createDataFrame(pdf, "doc_id long, src string, ntok long")
    con = duckdb.connect()
    con.register("tmcorp", pdf)
    for steps in (1, 2, 3, 4):
        for wc in (None, "ntok"):
            assert_matches_sql(
                sp.temperature_weights(df, "src", weight_col=wc,
                                       sqrt_steps=steps),
                sp.temperature_weights_sql("tmcorp", "src", weight_col=wc,
                                           sqrt_steps=steps),
                con,
            )


@pytest.mark.parametrize("seed", _seeds([47, 471]))
def test_fuzzed_epoch_upsample_mirror(spark, seed):
    """epoch_plan + upsample_corpus vs their mirrors under RANDOM group
    assignments, random integral masses (zero-mass groups and NULL
    group keys included) and a RANDOM normalized target — the
    materialized repeat multiset must match row-for-row because
    n_epochs/epoch_frac derive from doubles both engines already agree
    on and the fractional epoch uses the gated draw<threshold pair.
    The mixture is built over a doc-count mass (weight_col=None) and a
    token mass; the target deliberately omits one observed group (the
    0.0 drop arm) and the zero-mass groups exercise the NULL arm."""
    import duckdb
    import pandas as pd

    from xarray_histogram_spark.operators import sampling as sp

    rng = random.Random(seed)
    groups = ["g%d" % i for i in range(rng.randint(3, 7))] + [None]
    rows = [
        (i, rng.choice(groups),
         0 if rng.random() < 0.2 else rng.randint(0, 50))
        for i in range(90)
    ]
    pdf = pd.DataFrame(rows, columns=["doc_id", "src", "ntok"]).astype(
        {"doc_id": "int64", "ntok": "int64"}
    )
    df = spark.createDataFrame(pdf, "doc_id long, src string, ntok long")
    con = duckdb.connect()
    con.register("upcorp", pdf)
    # random target over a strict subset of the groups (drop arm)
    named = [g for g in groups if g is not None]
    tgt = {g: rng.uniform(0.1, 5.0) for g in named[:-1]}
    for wc in (None, "ntok"):
        mix = sp.mixture_weights(df, "src", tgt, weight_col=wc)
        mix_sql = sp.mixture_weights_sql("upcorp", "src", tgt,
                                         weight_col=wc)
        # max_repeats generous: random shares can need many epochs
        plan = sp.epoch_plan(mix, max_repeats=10**6)
        plan_sql = sp.epoch_plan_sql(mix_sql, max_repeats=10**6)
        assert_matches_sql(plan, plan_sql, con)
        assert_matches_sql(
            sp.upsample_corpus(df, "src", plan, "doc_id",
                               salt=f"fz{seed}"),
            sp.upsample_corpus_sql("upcorp", "src", plan_sql, "doc_id",
                                   ["doc_id", "src", "ntok"],
                                   salt=f"fz{seed}"),
            con,
        )


@pytest.mark.parametrize("seed", _seeds([23, 231]))
def test_fuzzed_extend_loop_mirror(spark, seed, tmp_path):
    """The multi-shard band-index production loop on RANDOM corpora
    under a RANDOM shard split: seed the index, verdict shard 1, extend
    with its admitted keepers, verdict shard 2 against the extended
    index — vs the composed incremental_dedup_sql mirror.  Random
    near-dups, NULL/empty texts and degenerate boilerplate all flow
    through band_rows → extend_band_index → the index-probed verify."""
    import duckdb
    import pandas as pd

    from xarray_histogram_spark.operators import dedup as dd

    rng = random.Random(seed)
    rows = _random_corpus(rng, 90)
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"]).astype(
        {"doc_id": "int64"}
    )
    df = spark.createDataFrame(pdf, "doc_id long, text string")
    con = duckdb.connect()
    con.register("loopcorp", pdf)
    m = rng.randint(3, 5)
    r_kept = rng.randrange(m)
    r_s1 = (r_kept + 1) % m
    kept0 = df.where(F.col("doc_id") % m == r_kept)
    shard1 = df.where(F.col("doc_id") % m == r_s1)
    shard2 = df.where(
        (F.col("doc_id") % m != r_kept) & (F.col("doc_id") % m != r_s1)
    )
    path = str(tmp_path / "fuzzloop")
    dd.band_rows(kept0, "text", "doc_id").write.parquet(path)
    v1 = dd.incremental_dedup(
        shard1, kept0, "text", "doc_id",
        kept_bands=spark.read.parquet(path),
    )
    dd.extend_band_index(shard1, v1, path, "text", "doc_id")
    kept_union = kept0.unionAll(
        shard1.join(v1.where(F.col("keep")).select("doc_id"), "doc_id")
    )
    got = dd.incremental_dedup(
        shard2, kept_union, "text", "doc_id",
        kept_bands=spark.read.parquet(path),
    )
    k0 = f"SELECT doc_id, text FROM loopcorp WHERE doc_id % {m} = {r_kept}"
    s1 = f"SELECT doc_id, text FROM loopcorp WHERE doc_id % {m} = {r_s1}"
    s2 = (
        f"SELECT doc_id, text FROM loopcorp WHERE doc_id % {m} != {r_kept} "
        f"AND doc_id % {m} != {r_s1}"
    )
    v1_sql = dd.incremental_dedup_sql(s1, k0, "text", "doc_id")
    ku = (
        f"{k0} UNION ALL SELECT s.doc_id, s.text FROM ({s1}) s "
        f"JOIN ({v1_sql}) v ON s.doc_id = v.doc_id WHERE v.keep"
    )
    assert_matches_sql(
        got, dd.incremental_dedup_sql(s2, ku, "text", "doc_id"), con
    )
    # the extended index equals a rebuild from the admitted union — the
    # append path must never diverge from the from-scratch band set
    back = sorted(map(tuple, spark.read.parquet(path).collect()))
    rebuilt = sorted(map(tuple, dd.band_rows(
        kept_union, "text", "doc_id").collect()))
    assert back == rebuilt


@pytest.mark.parametrize("seed", _seeds([13, 131]))
def test_fuzzed_corpus_report_mirror(spark, seed):
    """corpus_report (with the per-rule Gopher breakdown) vs its mirror
    under RANDOM thresholds, NULL group keys, NULL/empty texts — the
    n_fail_<rule> comparisons must complement the keep conjuncts exactly
    on both engines."""
    import duckdb
    import pandas as pd

    from xarray_histogram_spark.operators.curate import (
        corpus_report, corpus_report_sql,
    )

    rng = random.Random(seed)
    rows = [
        (i, rng.choice(["a", "b", None]), t)
        for i, t in _random_corpus(rng, 150)
    ]
    pdf = pd.DataFrame(rows, columns=["doc_id", "source", "text"]).astype(
        {"doc_id": "int64"}
    )
    df = spark.createDataFrame(pdf, "doc_id long, source string, text string")
    con = duckdb.connect()
    con.register("fuzzrep", pdf)
    thr = dict(
        min_words=rng.randint(1, 8),
        max_words=rng.randint(10, 40),
        min_mean_word_len=round(rng.uniform(1.0, 4.0), 2),
        max_mean_word_len=round(rng.uniform(5.0, 12.0), 2),
        max_symbol_ratio=round(rng.uniform(0.01, 0.5), 2),
        max_bullet_frac=round(rng.uniform(0.1, 0.9), 2),
        max_ellipsis_frac=round(rng.uniform(0.1, 0.9), 2),
        min_alpha_word_frac=round(rng.uniform(0.1, 0.9), 2),
        min_required_words=rng.randint(0, 2),
    )
    assert_matches_sql(
        corpus_report(df, "text", "doc_id", "source", **thr),
        corpus_report_sql("fuzzrep", "text", "doc_id", "source", **thr),
        con,
    )
