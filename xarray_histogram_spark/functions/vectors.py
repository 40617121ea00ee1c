"""Cross-engine deterministic vector math over array<float> embedding columns.

Dot products / norms are strict sequential left folds (element order of the
array), seeded with 0.0 on both engines — Spark ``aggregate(zip_with(...))``
and DuckDB ``list_reduce(list_prepend(0.0, list_transform(...)))`` execute
the same IEEE additions in the same order, so cosine scores are
bit-identical and top-k cutoffs cannot disagree.  float→double casts happen
per element before multiplying (both engines widen identically)."""

from __future__ import annotations

import math
from typing import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..binspec import flit

_D0 = "CAST(0.0 AS DOUBLE)"


def _fold(products: Column) -> Column:
    return F.aggregate(products, F.lit(0.0), lambda acc, x: acc + x)


def dot(a: Column, b: Column) -> Column:
    # Dimension guard: zip_with pads the shorter array with nulls, which
    # would silently null the whole fold (and downstream: every LSH bucket
    # 0, empty ANN results) — mismatched dimensions are data corruption
    # and must raise, not degrade.  NULL embeddings keep their historical
    # NULL-dot behavior.
    prods = F.zip_with(
        a, b, lambda x, y: x.cast("double") * y.cast("double")
    )
    ok = a.isNull() | b.isNull() | (F.size(a) == F.size(b))
    return F.when(ok, _fold(prods)).otherwise(
        F.raise_error(
            F.concat(
                F.lit("embedding dimension mismatch: "),
                F.size(a).cast("string"),
                F.lit(" vs "),
                F.size(b).cast("string"),
            )
        )
    )


def dot_sql(a: str, b: str) -> str:
    prods = (
        f"list_transform({a}, (x, i) -> CAST(x AS DOUBLE) * "
        f"CAST({b}[i] AS DOUBLE))"
    )
    return f"list_reduce(list_prepend({_D0}, {prods}), (p, q) -> p + q)"


def dot_lit(a: Column, vec: Sequence[float]) -> Column:
    return dot(a, F.array(*[F.lit(float(v)) for v in vec]))


# ---------------------------------------------------------------------------
# Spark-SQL-dialect builders (round-13 optimization, driver-side only).
#
# The Column API pays one py4j round trip per call: a single dot_lit over a
# 64-dim literal is ~80 round trips (64 lits + 2 lambda registrations +
# arithmetic), and the argmin kernels repeat that per centroid — measured
# 3.5-17 s of pure DRIVER time to CONSTRUCT one ivf/kmeans/ann plan (37 830
# round trips for one 63-centroid argmin).  These builders render the SAME
# expression as ONE Spark-SQL string parsed server-side; after analysis the
# tree is semantically identical to the Column-built one (pinned by
# ``sameSemantics`` in tests), so plans, values and error behavior are
# unchanged — only the construction cost drops ~50×.
#
# Exactness: finite doubles are rendered with ``repr`` (shortest round-trip
# form; Java's ``Double.parseDouble`` is correctly rounded, so the parsed
# literal is bit-identical — the flit/DuckDB precedent), NaN/±Infinity via
# explicit CASTs.
# ---------------------------------------------------------------------------


def sdouble(x: float) -> str:
    """Exact Spark-SQL double literal for any IEEE double."""
    xd = float(x)
    if math.isnan(xd):
        return "CAST('NaN' AS DOUBLE)"
    if math.isinf(xd):
        return f"CAST('{'-' if xd < 0 else ''}Infinity' AS DOUBLE)"
    return repr(xd) + "D"


def lit_vec_sql(vec: Sequence[float]) -> str:
    """Spark-SQL ``array(...)`` literal of exact doubles — one parse, zero
    per-element driver round trips."""
    return "array(" + ", ".join(sdouble(v) for v in vec) + ")"


def dot_sql_spark(a: str, b: str) -> str:
    """Spark-SQL twin of ``dot`` — identical fold, identical dimension
    guard (same operand association, so the analyzed tree matches)."""
    prods = (
        f"zip_with({a}, {b}, (x, y) -> "
        f"CAST(x AS DOUBLE) * CAST(y AS DOUBLE))"
    )
    fold = f"aggregate({prods}, 0.0D, (acc, x) -> acc + x)"
    ok = f"{a} IS NULL OR {b} IS NULL OR size({a}) = size({b})"
    err = (
        f"raise_error(concat('embedding dimension mismatch: ', "
        f"CAST(size({a}) AS STRING), ' vs ', CAST(size({b}) AS STRING)))"
    )
    return f"(CASE WHEN {ok} THEN {fold} ELSE {err} END)"


def cosine_pre_sql_spark(a: str, b: str, na: str, nb: str) -> str:
    """Spark-SQL twin of ``cosine_pre`` (same total-guard).  The Infinity
    bound has no parse-time literal spelling, so the analyzed tree carries
    an unfolded ``CAST('Infinity' AS DOUBLE)`` that ConstantFolding
    collapses — the OPTIMIZED plan is byte-identical to the Column build
    (pinned at that level in tests); use ``cosine_pre_expr`` when a
    ``sameSemantics``-level match matters more than parse count."""
    r = f"try_divide({dot_sql_spark(a, b)}, {na} * {nb})"
    return (
        f"(CASE WHEN (NOT isnan({r})) AND "
        f"(abs({r}) != CAST('Infinity' AS DOUBLE)) THEN {r} END)"
    )


def cosine_pre_expr(a: str, b: str, na: str, nb: str) -> Column:
    """``cosine_pre`` with the heavy ``try_divide(dot, na·nb)`` core parsed
    server-side and the (cheap, literal-free) total-guard built via the
    Column API — ``sameSemantics``-identical to ``cosine_pre``.
    Arguments are SQL fragments (quoted column names / literal arrays)."""
    r = F.expr(f"try_divide({dot_sql_spark(a, b)}, {na} * {nb})")
    return F.when(~F.isnan(r) & (F.abs(r) != F.lit(float("inf"))), r)


def dot_lit_expr(col_name: str, vec: Sequence[float]) -> Column:
    """``dot_lit(F.col(col_name), vec)`` built in ONE server-side parse."""
    return F.expr(dot_sql_spark(f"`{col_name}`", lit_vec_sql(vec)))


def dot_lit_sql(a: str, vec: Sequence[float]) -> str:
    lits = "[" + ", ".join(flit(v) for v in vec) + "]"
    prods = f"list_transform({a}, (x, i) -> CAST(x AS DOUBLE) * ({lits})[i])"
    return f"list_reduce(list_prepend({_D0}, {prods}), (p, q) -> p + q)"


def cosine(a: Column, b: Column) -> Column:
    """TOTAL cosine similarity: any degenerate input — zero norm (ANSI
    DIVIDE_BY_ZERO would otherwise abort the job on one corrupt row) or a
    non-finite element (NaN/inf sims sort ABOVE every real similarity in
    desc on BOTH engines, so a corrupt vector would rank #1 in top-k and
    pair with everything in threshold dedup) — yields NULL.  NULL sims
    lose desc orderings on both engines (nulls last), so degenerate
    vectors drop out of results instead of poisoning them.  For every
    finite nonzero-norm input the value is bit-identical to the plain
    division."""
    r = F.try_divide(dot(a, b), F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))
    return F.when(~F.isnan(r) & (F.abs(r) != F.lit(float("inf"))), r)


def norm(a: Column) -> Column:
    """``sqrt(dot(a, a))`` — the cosine denominator factor, exposed so hot
    paths can evaluate a vector's norm ONCE (per row, per query, per
    literal centroid) and reuse it across many cosine evaluations via
    ``cosine_pre``.  The factored value is the exact expression ``cosine``
    computes inline, so substituting it is bit-identical."""
    return F.sqrt(dot(a, a))


def norm_lit(vec: Sequence[float]) -> float:
    """Driver-side norm of a LITERAL vector: the same left-fold of
    per-element double products the in-plan fold executes (Python floats
    are IEEE doubles; the fold order is identical) and the same
    correctly-rounded sqrt (math.sqrt, JVM Math.sqrt and DuckDB sqrt all
    implement IEEE-754 sqrt exactly — the temperature_weights precedent),
    so embedding the result as a literal is bit-identical to evaluating
    the norm fold on the literal array once per row."""
    acc = 0.0
    for x in vec:
        xd = float(x)
        acc += xd * xd
    return math.sqrt(acc)


def cosine_pre(a: Column, b: Column, na: Column, nb: Column) -> Column:
    """``cosine(a, b)`` with PRECOMPUTED norms (``na = norm(a)``,
    ``nb = norm(b)``): the identical ``try_divide(dot, na·nb)`` value and
    the identical total-guard as ``cosine`` — only the two norm folds are
    evaluated zero times here.  Callers are responsible for passing the
    true norms; every in-repo caller passes ``norm(...)`` of the same
    column or ``norm_lit`` of the same literal, which is what makes the
    rewrite bit-exact (the oracle mirrors keep the inline spelling)."""
    r = F.try_divide(dot(a, b), na * nb)
    return F.when(~F.isnan(r) & (F.abs(r) != F.lit(float("inf"))), r)


def cosine_sql(a: str, b: str) -> str:
    denom = f"(sqrt({dot_sql(a, a)}) * sqrt({dot_sql(b, b)}))"
    div = f"{dot_sql(a, b)} / {denom}"
    return (
        f"(CASE WHEN {denom} = 0 THEN NULL "
        f"WHEN isfinite({div}) THEN {div} END)"
    )


def hyperplanes(n: int, dim: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (seeded numpy), embedded as
    literals in BOTH engines — the random-projection LSH family for cosine."""
    import numpy as np

    rng = np.random.default_rng(seed)
    return rng.standard_normal((n, dim)).tolist()


def lsh_bucket(emb: Column, planes: Sequence[Sequence[float]]) -> Column:
    """Sign-bit bucket id: Σ 2^j · [dot(v, h_j) > 0]."""
    acc = F.lit(0)
    for j, p in enumerate(planes):
        acc = acc + F.when(dot_lit(emb, p) > F.lit(0.0), F.lit(2**j)).otherwise(
            F.lit(0)
        )
    return acc


def lsh_bucket_expr(col_name: str, planes: Sequence[Sequence[float]]) -> Column:
    """``lsh_bucket(F.col(col_name), planes)`` in ONE server-side parse —
    the identical left-associated ``0 + CASE ... END + ...`` chain (pinned
    by ``sameSemantics`` in tests), ~50× cheaper to construct."""
    terms = "0"
    for j, p in enumerate(planes):
        d = dot_sql_spark(f"`{col_name}`", lit_vec_sql(p))
        terms += f" + (CASE WHEN {d} > 0.0D THEN {2 ** j} ELSE 0 END)"
    return F.expr(terms)


def lsh_bucket_fold_expr(
    col_name: str, planes: Sequence[Sequence[float]]
) -> Column:
    """``lsh_bucket`` as a fold over ONE foldable
    ``array(named_struct('pv', …, 'w', 2^j), …)`` literal that
    ConstantFolding collapses into a single ``Literal`` node (round 13 —
    the ``_argmin_cid_expr`` pattern): per-task plan setup becomes O(1)
    in plane count instead of shipping one inlined dot subtree per
    plane.  VALUES identical to ``lsh_bucket``/``lsh_bucket_expr``:
    ``aggregate`` folds left over array order, producing the same
    left-associated integer sum ``0 + t_0 + t_1 + …`` with each term the
    same ``CASE WHEN dot > 0 THEN 2^j ELSE 0 END`` over the same doubles
    (bit-equality pinned in tests/test_vectors_expr.py)."""
    entries = ", ".join(
        "named_struct('pv', " + lit_vec_sql(p) + f", 'w', {2 ** j})"
        for j, p in enumerate(planes)
    )
    d = dot_sql_spark(f"`{col_name}`", "p.pv")
    return F.expr(
        f"aggregate(array({entries}), 0, "
        f"(acc, p) -> acc + (CASE WHEN {d} > 0.0D THEN p.w ELSE 0 END))"
    )


def lsh_bucket_sql(emb: str, planes: Sequence[Sequence[float]]) -> str:
    terms = [
        f"CASE WHEN {dot_lit_sql(emb, p)} > {_D0} THEN {2**j} ELSE 0 END"
        for j, p in enumerate(planes)
    ]
    return "(" + " + ".join(terms) + ")"
