"""Temporal join operators: as-of join and banded range join.

The reference has no join machinery at all (SURVEY.md §2.4: xarray
broadcasting, ``core.py:261``, is its only implicit equi-join), but an
event/training-data pipeline needs the two classic temporal joins Spark
has no native operator for.  Both are built in the shape that survives
100 TB:

* ``asof_join`` — the union-and-window formulation: tag both sides, union,
  ONE window over the join keys ordered by ``(ts, side, right-id)`` that
  carries the latest right-side row forward as a struct.  One shuffle of
  left+right narrow rows, no inequality join — the naive
  ``l.ts >= r.ts`` theta-join Spark would plan for the equivalent SQL is
  a per-key cartesian (BroadcastNestedLoop at worst), quadratic in events
  per key.  Skewed keys cost what any per-key window costs; the payload
  carried through the shuffle is only the projected right value columns.
* ``range_join_count`` — inequality band ``l.ts < r.ts <= l.ts + W``
  turned into an equi-join: right rows are expanded to the (at most two)
  W-aligned buckets whose left rows they can serve, the join runs on
  ``(key, bucket)``, and an exact band filter keeps true matches.  Each
  (l, r) pair meets in exactly one bucket (the left row's own), so no
  dedup pass is needed.  Right rows duplicate at most 2×; at scale AQE
  picks broadcast vs shuffle per side as usual.

All timestamp arithmetic is integer epoch-microseconds (the registry's
``unix_micros``/``epoch_us`` convention) — bit-exact on both engines.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    value_cols: Sequence[str],
    right_id_col: str,
    tolerance: Optional[int] = None,
) -> DataFrame:
    """Backward as-of join: attach to each left row the most recent right
    row with the same ``keys`` and ``right.ts <= left.ts``.

    Ties on ``ts`` are broken deterministically: a right row at exactly
    ``left.ts`` DOES match (inclusive bound — the union sorts right rows
    before left rows at equal ts), and among several right rows at the
    same instant the one with the greatest ``right_id_col`` wins (the SQL
    mirror's ``ORDER BY ts DESC, id DESC LIMIT 1``).

    ``tolerance`` (in the ts unit, i.e. microseconds) null-outs matches
    older than ``left.ts - tolerance``.  Output: every left column, plus
    ``asof_ts``, ``asof_<right_id_col>`` and ``asof_<v>`` for each value
    column — all NULL where no right row qualifies.

    Right rows with a NULL key or NULL ``ts`` are dropped (SQL equality /
    inequality semantics: they can match nothing); NULL-key left rows come
    out unmatched rather than joining each other.

    The matched row travels as ONE struct through ``last(..., ignorenulls)``
    so all output columns come from the same right row even when a value
    column is legitimately NULL in it (per-column ``last`` would skip to
    an older row for that column only — a row-tearing bug).
    """
    keys = list(keys)
    value_cols = list(value_cols)
    reserved = {"__side", "__m", "__rid", "__match"} | {
        "asof_ts",
        f"asof_{right_id_col}",
        *[f"asof_{v}" for v in value_cols],
    }
    clash = sorted(reserved & set(left.columns))
    if clash:
        raise ValueError(
            f"asof_join: left columns {clash} collide with internal or "
            "output column names (asof_*/__*); rename them before joining"
        )
    lpay = [c for c in left.columns if c not in set(keys) | {ts_col}]
    # NULL faithfulness vs the SQL mirror: `r.k = l.k` never matches a NULL
    # key and `r.ts <= l.ts` is never true for a NULL ts, so right rows
    # with a NULL key or NULL ts can match NOTHING — drop them up front
    # (the window would otherwise group NULL keys together and sort NULL
    # ts first, i.e. "before everything").  NULL-key/ts LEFT rows stay and
    # come out unmatched, exactly like the mirror's LEFT JOIN.
    right = right.where(F.col(ts_col).isNotNull())
    for k in keys:
        right = right.where(F.col(k).isNotNull())
    match_struct = F.struct(
        F.col(ts_col).alias("__mts"),
        F.col(right_id_col).alias("__mid"),
        *[F.col(v).alias(f"__mv_{v}") for v in value_cols],
    )
    rtypes = dict(right.dtypes)
    lt = left.select(
        *keys,
        F.col(ts_col),
        F.lit(1).alias("__side"),
        F.lit(None).cast(rtypes[right_id_col]).alias("__rid"),
        F.lit(None)
        .cast(right.select(match_struct.alias("m")).schema["m"].dataType)
        .alias("__m"),
        *lpay,
    )
    ltypes = dict(left.dtypes)
    rt = right.select(
        *keys,
        F.col(ts_col),
        F.lit(0).alias("__side"),
        F.col(right_id_col).alias("__rid"),
        match_struct.alias("__m"),
        *[F.lit(None).cast(ltypes[c]).alias(c) for c in lpay],
    )
    # Frame note: ROWS UNBOUNDED PRECEDING..CURRENT ROW over a total order
    # for right rows (ts, side=0, rid unique).  Left rows tied on ts only
    # tie with other left rows (side=1) — they contribute NULL __m, so the
    # arbitrary order among them cannot change any row's last(__m).
    w = (
        Window.partitionBy(*keys)
        .orderBy(
            # nulls FIRST so a NULL-id right row loses equal-ts ties to any
            # real id (the mirror's ORDER BY id DESC under NULLS-LAST)
            F.col(ts_col).asc(), F.col("__side").asc(), F.col("__rid").asc_nulls_first()
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    m = F.last(F.col("__m"), ignorenulls=True).over(w)
    if tolerance is not None:
        m = F.when(
            m.isNotNull() & ((F.col(ts_col) - m["__mts"]) <= F.lit(tolerance)), m
        )
    out = (
        lt.unionByName(rt)
        .select(
            *keys,
            F.col(ts_col),
            F.col("__side"),
            *lpay,
            m.alias("__match"),
        )
        .where(F.col("__side") == 1)
    )
    return out.select(
        *keys,
        F.col(ts_col),
        *lpay,
        F.col("__match")["__mts"].alias("asof_ts"),
        F.col("__match")["__mid"].alias(f"asof_{right_id_col}"),
        *[F.col("__match")[f"__mv_{v}"].alias(f"asof_{v}") for v in value_cols],
    )


def asof_join_sql(
    left_sql: str,
    right_sql: str,
    keys: Sequence[str],
    ts_col: str,
    value_cols: Sequence[str],
    right_id_col: str,
    tolerance: Optional[int] = None,
) -> str:
    """DuckDB mirror: LEFT JOIN LATERAL rank-1 subquery — an independent
    formulation of the same semantics (greatest ``ts`` then greatest id at
    or before the left timestamp, optional tolerance band)."""
    keys = list(keys)
    on = " AND ".join(f"r.{k} = l.{k}" for k in keys)
    tol = (
        f" AND r.{ts_col} >= l.{ts_col} - {int(tolerance)}"
        if tolerance is not None
        else ""
    )
    vals = ", ".join(
        [f"r.{ts_col} AS asof_ts", f"r.{right_id_col} AS asof_{right_id_col}"]
        + [f"r.{v} AS asof_{v}" for v in value_cols]
    )
    return (
        f"SELECT l.*, {vals} FROM ({left_sql}) l "
        f"LEFT JOIN LATERAL ("
        f"SELECT * FROM ({right_sql}) r "
        f"WHERE {on} AND r.{ts_col} <= l.{ts_col}{tol} "
        f"ORDER BY r.{ts_col} DESC, r.{right_id_col} DESC LIMIT 1"
        f") r ON TRUE"
    )


def range_join_count(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    window: int,
    left_id_col: str,
) -> DataFrame:
    """Per left row, count right rows with the same keys inside the band
    ``(l.ts, l.ts + window]`` (strictly after, within ``window`` µs).

    Equi-join on ``(keys, bucket)`` where bucket = ``ts div window``: a
    right row at bucket ``b`` can only serve left rows in buckets ``b``
    and ``b-1``, so the right side is exploded to those two bucket keys
    and the exact band predicate filters inside the hash join.  A (l, r)
    pair meets exactly once (at the left row's own bucket), so the count
    needs no dedup.  Unmatched left rows keep count 0 via the left join.
    """
    keys = list(keys)
    w = int(window)
    # Exact integer floor division (pmod is non-negative, so ts - pmod is
    # the floor multiple and DIV on the exact multiple is floor) — a
    # double `floor(ts / w)` loses ulps past 2^53 and can misplace a row
    # one bucket over, silently dropping an in-band match.
    bucket = F.expr(
        f"(CAST({ts_col} AS BIGINT) - pmod(CAST({ts_col} AS BIGINT), "
        f"CAST({w} AS BIGINT))) DIV CAST({w} AS BIGINT)"
    ).cast("bigint")
    lb = left.select(
        F.col(left_id_col),
        *keys,
        F.col(ts_col),
        bucket.alias("__bucket"),
    )
    rb = right.select(
        *keys,
        F.col(ts_col).alias("__rts"),
        F.explode(F.array(bucket, bucket - F.lit(1))).alias("__bucket"),
    )
    joined = lb.join(rb, keys + ["__bucket"], "left")
    hit = (
        F.col("__rts").isNotNull()
        & (F.col("__rts") > F.col(ts_col))
        & (F.col("__rts") <= F.col(ts_col) + F.lit(w))
    )
    return joined.groupBy(left_id_col, *keys, ts_col).agg(
        F.sum(F.when(hit, F.lit(1)).otherwise(F.lit(0)))
        .cast("bigint")
        .alias("n_in_window")
    )


def range_join_count_sql(
    left_sql: str,
    right_sql: str,
    keys: Sequence[str],
    ts_col: str,
    window: int,
    left_id_col: str,
) -> str:
    """DuckDB mirror: direct inequality LEFT JOIN + COUNT — the textbook
    formulation the Spark plan deliberately avoids."""
    keys = list(keys)
    on = " AND ".join(f"r.{k} = l.{k}" for k in keys)
    gb = ", ".join([f"l.{left_id_col}"] + [f"l.{k}" for k in keys] + [f"l.{ts_col}"])
    sel = ", ".join(
        [f"l.{left_id_col}"] + [f"l.{k}" for k in keys] + [f"l.{ts_col}"]
    )
    return (
        f"SELECT {sel}, CAST(COUNT(r.{ts_col}) AS BIGINT) AS n_in_window "
        f"FROM ({left_sql}) l LEFT JOIN ({right_sql}) r "
        f"ON {on} AND r.{ts_col} > l.{ts_col} "
        f"AND r.{ts_col} <= l.{ts_col} + {int(window)} "
        f"GROUP BY {gb}"
    )


def _check_stages(stages: Sequence[str]) -> list:
    """Shared funnel validation: >= 2 DISTINCT stages.  A repeated stage
    name would let ONE event satisfy both occurrences (the non-strict
    ``ts >= t_{i-1}`` chain) — "two clicks" funnels need a strict-sequence
    operator, not a repeated label."""
    stages = list(stages)
    if len(stages) < 2:
        raise ValueError("funnel: need at least 2 stages")
    if len(set(stages)) != len(stages):
        raise ValueError("funnel: stages must be distinct")
    return stages


def funnel_conversion(
    events: DataFrame,
    key: str,
    ts_col: str,
    type_col: str,
    stages: Sequence[str],
    window: Optional[int] = None,
) -> DataFrame:
    """Sequential funnel: per key, the earliest time of stage ``i`` at or
    after the earliest completion of stage ``i-1`` (the classic ordered
    min-chain), plus a conversion flag.

    ``t_0 = min(ts | type = stages[0])``;
    ``t_i = min(ts | type = stages[i] and ts >= t_{i-1})``.  A stage with
    no qualifying event yields NULL from that stage on (``ts >= NULL`` is
    never true).  ``converted`` is true when every stage fired and, if
    ``window`` is given, ``t_last - t_0 <= window``.  The clock anchors at
    the key's EARLIEST stage-0 event (the greedy earliest-completion
    chain, which finds an ordered chain iff one exists); per-attempt
    re-anchoring ("any later attempt may convert within its own window")
    is a different, inherently heavier operator — this one reports the
    first attempt's outcome.

    Shape: ONE hash exchange on the key; the k stage mins are k window
    projections over the SAME partitioning (Spark plans one exchange and
    chains the Window operators), then an output-bounded per-key
    aggregate.  No joins, no iteration over the corpus — at 100 TB this
    costs exactly one events shuffle regardless of funnel depth.
    """
    stages = _check_stages(stages)
    w = Window.partitionBy(key)
    df = events.select(key, ts_col, type_col)
    prev = None
    for i, s in enumerate(stages):
        cond = F.col(type_col) == F.lit(s)
        if prev is not None:
            cond = cond & (F.col(ts_col) >= F.col(prev))
        name = f"t_{i}"
        df = df.withColumn(name, F.min(F.when(cond, F.col(ts_col))).over(w))
        prev = name
    tcols = [f"t_{i}" for i in range(len(stages))]
    out = df.groupBy(key).agg(*[F.min(c).alias(c) for c in tcols])
    conv = F.col(tcols[-1]).isNotNull()
    if window is not None:
        conv = conv & (
            (F.col(tcols[-1]) - F.col(tcols[0])) <= F.lit(int(window))
        )
    return out.select(key, *tcols, conv.alias("converted"))


def funnel_conversion_sql(
    table_sql: str,
    key: str,
    ts_col: str,
    type_col: str,
    stages: Sequence[str],
    window: Optional[int] = None,
) -> str:
    """DuckDB mirror: the same ordered min-chain as window expressions."""
    stages = _check_stages(stages)
    sel, prev = [], None
    for i, s in enumerate(stages):
        # stage names are DATA, not identifiers: escape embedded quotes
        cond = f"{type_col} = '{s.replace(chr(39), chr(39) * 2)}'"
        if prev is not None:
            cond += f" AND {ts_col} >= {prev}"
        sel.append(
            f"MIN(CASE WHEN {cond} THEN {ts_col} END) "
            f"OVER (PARTITION BY {key}) AS t_{i}"
        )
        prev = f"t_{i}"
    # each t_i references t_{i-1}: chain via nested selects
    inner = f"SELECT {key}, {ts_col}, {type_col} FROM ({table_sql}) t0"
    for i, s in enumerate(sel):
        inner = f"SELECT *, {s} FROM ({inner}) s{i}"
    last, first = f"MIN(t_{len(stages) - 1})", "MIN(t_0)"
    conv = f"{last} IS NOT NULL"
    if window is not None:
        conv += f" AND ({last} - {first}) <= {int(window)}"
    return (
        f"SELECT {key}, "
        + ", ".join(f"MIN(t_{i}) AS t_{i}" for i in range(len(stages)))
        + f", ({conv}) AS converted "
        f"FROM ({inner}) x GROUP BY {key}"
    )


# ---------------------------------------------------------------------------
# cohort retention
# ---------------------------------------------------------------------------

_PERIOD_SECONDS = {"day": 86_400, "week": 604_800}


def retention_cohorts(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    period: str = "week",
) -> DataFrame:
    """Cohort-retention triangle: users grouped by their FIRST activity
    period, counted in every later period they return — the standard
    product-analytics rollup.  Returns (cohort, offset, n_users) where
    ``cohort`` is the epoch-period index of first activity and ``offset``
    counts periods since it (offset 0 = the cohort size itself).

    Period indices are exact integer epoch divisions (no calendar
    arithmetic, no timezone), so both engines agree bit-for-bit.

    Scale shape: ONE distinct aggregate on (user, period) — the only
    input-sized shuffle — then a user-partitioned window MIN for the
    cohort over the already-reduced distinct frame (no join against a
    first-seen table; the window does repartition, but its input is
    #users·#periods rows, not the corpus), then an output-bounded
    (cohort, offset) count.  Each distinct (user, period) row
    contributes exactly one user to one cell, so no count-distinct pass
    is needed.  NULL timestamps drop (they belong to no period) and so
    do NULL user ids — grouping them would fuse all anonymous activity
    into ONE pseudo-user and silently skew the triangle."""
    secs = _PERIOD_SECONDS.get(period)
    if secs is None:
        raise ValueError(f"period must be one of {sorted(_PERIOD_SECONDS)}")
    wk = F.floor(F.unix_timestamp(F.col(ts_col)) / F.lit(secs)).cast("bigint")
    act = (
        df.where(F.col(ts_col).isNotNull() & F.col(user_col).isNotNull())
        .select(F.col(user_col).alias("__u"), wk.alias("__p"))
        .distinct()
    )
    w = Window.partitionBy("__u")
    out = act.withColumn("__cohort", F.min("__p").over(w))
    return (
        out.groupBy(
            F.col("__cohort").alias("cohort"),
            (F.col("__p") - F.col("__cohort")).alias("offset"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
    )


def retention_cohorts_sql(
    table: str, user_col: str, ts_col: str, period: str = "week"
) -> str:
    """DuckDB mirror: identical integer epoch-period arithmetic, window
    MIN cohort, (cohort, offset) count."""
    secs = _PERIOD_SECONDS.get(period)
    if secs is None:
        raise ValueError(f"period must be one of {sorted(_PERIOD_SECONDS)}")
    return (
        f"WITH act AS (SELECT DISTINCT {user_col} AS u, "
        f"CAST(floor(epoch({ts_col}) / {secs}) AS BIGINT) AS p "
        f"FROM {table} "
        f"WHERE {ts_col} IS NOT NULL AND {user_col} IS NOT NULL), "
        f"c AS (SELECT u, p, MIN(p) OVER (PARTITION BY u) AS cohort FROM act) "
        f"SELECT cohort, p - cohort AS offset, "
        f"CAST(COUNT(*) AS BIGINT) AS n_users "
        f"FROM c GROUP BY cohort, p - cohort"
    )
