"""Watermarked stream-stream temporal join.

The batch engine's banded range join (operators/joins.py) has a native
Structured Streaming twin: a stream-stream INNER equi-join with a
time-range condition.  Spark keeps both sides in the state store and uses
the two watermarks plus the band bounds to expire state — a right row can
stop waiting once the left watermark passes ``r.ts`` (no earlier left row
can still arrive), and vice versa, so state is bounded by
``rate × (watermark delay + band width)`` regardless of stream length.

Output is the matched PAIRS (append-mode legal with event-time bounds on
both inputs); the converged multi-batch result is deterministic — a pair
either is or is not in band, independent of arrival order — so the gated
query hash-compares a REAL 3-micro-batch execution against the batch
inequality-join oracle.

Scale notes: the shuffle is the equi-key hash partition of both streams
(same as the batch join); the band condition evaluates inside the
streaming symmetric hash join, and state expiry follows the watermark —
this is the one temporal-join shape that never rescans history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_range_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts_col: str,
    window_us: int,
    delay: str = "1 day",
) -> DataFrame:
    """Pairs (left row, right row) with equal ``key`` and
    ``l.ts < r.ts <= l.ts + window_us`` over two watermarked streams.

    ``left``/``right`` must carry an event-time ``ts_col`` (TIMESTAMP);
    both get ``withWatermark(ts_col, delay)`` — the delay bounds how late
    either side may arrive AND (with the band) how long join state lives.
    Columns other than ``key``/``ts_col`` are preserved with ``l_``/``r_``
    prefixes; the band is evaluated on integer epoch-micros.
    """
    # the synthesized epoch-micros outputs are named l_t / r_t: a payload
    # column literally named "t" would prefix into the same name and make
    # every downstream by-name reference AMBIGUOUS_REFERENCE
    if "t" in left.columns and "t" not in (key, ts_col):
        raise ValueError(
            "streaming_range_join: left payload column 't' collides with "
            "the synthesized l_t output — rename it first"
        )
    if "t" in right.columns and "t" not in (key, ts_col):
        raise ValueError(
            "streaming_range_join: right payload column 't' collides with "
            "the synthesized r_t output — rename it first"
        )
    lw = left.withWatermark(ts_col, delay)
    rw = right.withWatermark(ts_col, delay)
    lp = lw.select(
        F.col(key).alias("__k"),
        F.col(ts_col).alias("__lts"),
        *[
            F.col(c).alias(f"l_{c}")
            for c in left.columns
            if c not in (key, ts_col)
        ],
    )
    rp = rw.select(
        F.col(key).alias("__rk"),
        F.col(ts_col).alias("__rts"),
        *[
            F.col(c).alias(f"r_{c}")
            for c in right.columns
            if c not in (key, ts_col)
        ],
    )
    # Band bounds in NATIVE timestamp+interval arithmetic: Spark's
    # StreamingJoinHelper can only derive state-expiry watermarks from
    # direct attribute comparisons — wrapping the event-time columns in
    # unix_micros() makes the condition opaque ("Failed to extract state
    # value watermark") and join state would never expire.  INTERVAL
    # MICROSECOND keeps the band exact.
    joined = lp.join(
        rp,
        (F.col("__k") == F.col("__rk"))
        & (F.col("__rts") > F.col("__lts"))
        & (
            F.col("__rts")
            <= F.expr(f"__lts + INTERVAL {int(window_us)} MICROSECOND")
        ),
        "inner",
    )
    lt = F.expr("unix_micros(__lts)")
    rt = F.expr("unix_micros(__rts)")
    return joined.select(
        F.col("__k").alias(key),
        lt.cast("bigint").alias("l_t"),
        rt.cast("bigint").alias("r_t"),
        *[c for c in joined.columns if c.startswith(("l_", "r_"))],
    )


def streaming_range_join_sql(
    left_sql: str, right_sql: str, key: str, window_us: int
) -> str:
    """Batch oracle: the direct inequality join over the same inputs.
    ``left_sql``/``right_sql`` must expose ``{key}``, ``t`` (epoch micros)
    and any ``l_``/``r_``-prefixed payload columns already renamed."""
    return (
        f"SELECT l.{key}, l.t AS l_t, r.t AS r_t, l.* EXCLUDE ({key}, t), "
        f"r.* EXCLUDE ({key}, t) "
        f"FROM ({left_sql}) l JOIN ({right_sql}) r "
        f"ON r.{key} = l.{key} AND r.t > l.t "
        f"AND r.t <= l.t + {int(window_us)}"
    )
