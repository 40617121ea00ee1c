"""The round-13 server-parsed vector expression builders must be
SEMANTICALLY IDENTICAL to the Column-API spellings they replaced —
``sameSemantics`` compares canonicalized analyzed plans, so a pass here
pins that plans, values, and error behavior are unchanged (the builders
exist only to kill the O(elements) py4j construction cost)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from xarray_histogram_spark.functions import vectors as V

VEC = [0.1, -0.0, 1e-300, 5e-324, -123456789.123456789, 1.5, 2.25, -0.75]


def _bits(rows):
    """Bit-level row images: NaN-safe, -0.0-sensitive equality."""
    import struct

    def enc(v):
        if isinstance(v, float):
            return struct.pack("<d", v)
        return v

    return [tuple(enc(v) for v in r) for r in rows]


def test_sdouble_exact_roundtrip(spark):
    import struct

    tricky = [
        0.1, -0.0, 1e-300, 5e-324, 1.7976931348623157e308,
        -2.2250738585072014e-308, 123456789.123456789, 1e16, -1e-16,
        float("nan"), float("inf"), float("-inf"),
    ]
    got = spark.range(1).select(
        F.expr(V.lit_vec_sql(tricky)).alias("a")
    ).collect()[0]["a"]
    for x, y in zip(tricky, got):
        assert struct.pack("<d", x) == struct.pack("<d", y)


def test_dot_lit_expr_same_semantics(spark):
    df = spark.createDataFrame(
        [(1, [1.0] * len(VEC)), (2, None), (3, [float("nan")] * len(VEC))],
        "id: long, embedding: array<double>",
    )
    a = df.select(V.dot_lit(F.col("embedding"), VEC).alias("d"))
    b = df.select(V.dot_lit_expr("embedding", VEC).alias("d"))
    assert a.sameSemantics(b)
    assert _bits(a.collect()) == _bits(b.collect())


def test_lsh_bucket_expr_same_semantics(spark):
    from xarray_histogram_spark.operators.similarity import ANN_PLANES, PLANES

    df = spark.createDataFrame(
        [(1, [float(i) / 7 for i in range(64)]), (2, None)],
        "id: long, embedding: array<float>",
    )
    for planes in (PLANES, ANN_PLANES):
        a = df.select(V.lsh_bucket(F.col("embedding"), planes).alias("b"))
        b = df.select(V.lsh_bucket_expr("embedding", planes).alias("b"))
        assert a.sameSemantics(b)
        assert _bits(a.collect()) == _bits(b.collect())
        # the folded-literal form (round 13): no sameSemantics (different
        # shape — one fold over a constant-folded array literal), but the
        # VALUES must be bit-equal and the plane array must actually
        # constant-fold to a single Literal
        c = df.select(V.lsh_bucket_fold_expr("embedding", planes).alias("b"))
        pc = c._jdf.queryExecution().optimizedPlan().toString()
        assert "named_struct" not in pc
        assert _bits(a.collect()) == _bits(c.collect())


def test_argmin_cid_expr_same_semantics(spark):
    from xarray_histogram_spark.operators.similarity import _argmin_cid_expr

    cents = [
        (0, [float(i % 5) for i in range(8)]),
        (7, [float((i + 3) % 4) for i in range(8)]),
        (9, [0.5] * 8),
    ]
    df = spark.createDataFrame(
        [(1, [1.0] * 8), (2, [0.5] * 8), (3, None)],
        "id: long, embedding: array<float>",
    )
    pre = df.select(
        F.col("embedding"), V.norm(F.col("embedding")).alias("__nv")
    )
    v = F.col("embedding")
    arr = F.array(
        *[
            F.struct(
                V.cosine_pre(
                    v, F.array(*[F.lit(float(x)) for x in cv]),
                    F.col("__nv"), F.lit(V.norm_lit(cv)),
                ).alias("sim"),
                F.lit(-cid).alias("ncid"),
            )
            for cid, cv in cents
        ]
    )
    a = pre.select((-F.array_max(arr)["ncid"]).cast("bigint").alias("cid"))
    b = pre.select(_argmin_cid_expr("embedding", cents).alias("cid"))
    # The folded form (round-13 second pass) is a transform over ONE
    # constant-folded array-of-structs literal, so the optimized plans
    # are no longer byte-equal to the per-centroid Column build — the
    # VALUES must be (bit-level: same cosine_pre fold per centroid, same
    # struct-max over the same multiset), and the centroid array must
    # actually constant-fold to a single Literal (no named_struct left
    # in the optimized plan — a non-foldable spelling would put the
    # construction back on every row).
    pb = b._jdf.queryExecution().optimizedPlan().toString()
    assert "named_struct" not in pb
    assert "transform" in pb
    assert _bits(a.collect()) == _bits(b.collect())


def test_dot_expr_dimension_mismatch_still_raises(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 2.0, 3.0])], "id: long, embedding: array<double>"
    )
    bad = df.select(V.dot_lit_expr("embedding", [1.0, 2.0]).alias("d"))
    with pytest.raises(Exception, match="dimension mismatch"):
        bad.collect()


def test_sdouble_every_form():
    assert V.sdouble(1.5) == "1.5D"
    assert V.sdouble(float("nan")) == "CAST('NaN' AS DOUBLE)"
    assert V.sdouble(float("inf")) == "CAST('Infinity' AS DOUBLE)"
    assert V.sdouble(float("-inf")) == "CAST('-Infinity' AS DOUBLE)"
    assert math.copysign(1.0, float(V.sdouble(-0.0)[:-1])) == -1.0
