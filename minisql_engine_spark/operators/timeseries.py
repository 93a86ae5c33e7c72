"""Time-series regularization: resample onto a fixed grid + gap fill.

Event streams are irregular; training features and dashboards want
fixed-step series. ``resample_forward_fill`` puts every key on an
aligned grid and carries the last observation forward across gaps —
the standard as-of semantics expressed with only JVM operators:

1. the grid is ``sequence(floor(min_ts), floor(max_ts), step)``
   exploded per key — generated distributed, never collected;
2. observed values aggregate per (key, slot) — ``max_by`` keeps the
   LATEST observation inside a slot (ties by timestamp are broken by
   value to stay deterministic);
3. the fill is ``last(value, ignoreNulls) OVER (PARTITION BY key
   ORDER BY slot)`` — one window shuffle on the key, the same
   partitioning the slot aggregate already produced.

Scale: everything shuffles on the series key exactly once
(grid, slot-agg, and fill all hash-partition by key — AQE reuses the
exchange); grid size is bounded by span/step per key, independent of
event count. Leading slots before a key's first observation stay
NULL by design (there is nothing to carry forward) — callers choose
a default with ``coalesce``.

Oracle: DuckDB replays the identical recipe (generate_series +
arg_max + last_value IGNORE NULLS) — asserted in
``tests/test_timeseries.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from minisql_engine_spark.operators.portable_round import fx6 as _fx6


def resample_forward_fill(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    step_seconds: int = 3600,
) -> DataFrame:
    """(key, slot_ts, value, is_observed): one row per key per
    ``step_seconds`` slot spanning that key's [min, max] event range,
    value = last observation at-or-before the slot."""
    from pyspark.sql.window import Window

    step = int(step_seconds)
    # FLOOR-align exact microseconds to the step: pmod() is >= 0 for
    # negative dividends, so `us - pmod(us, step_us)` floors toward
    # -inf for pre-1970 timestamps too.  The quotient uses integer
    # `div`, never a double divide: a double can't represent every
    # long past 2^53, so `(x / y).cast('long')` could land one slot
    # off at the extremes of Spark's timestamp range, diverging from
    # the oracle's exact integer `//`.
    step_us = step * 1_000_000
    slot = (
        F.expr(
            f"(unix_micros({ts_col}) -"
            f" pmod(unix_micros({ts_col}), {step_us})) div {step_us}"
        )
        * step
    )

    # per-key span → exploded grid (one shuffle on key)
    span = events.groupBy(F.col(key_col).alias("_k")).agg(
        F.min(slot).alias("_lo"), F.max(slot).alias("_hi")
    )
    grid = span.select(
        "_k",
        F.explode(
            F.sequence(F.col("_lo"), F.col("_hi"), F.lit(step))
        ).alias("_slot"),
    )

    # latest observation per (key, slot); value tiebreak for determinism
    obs = (
        events.select(
            F.col(key_col).alias("_k"),
            slot.alias("_slot"),
            F.expr(f"unix_micros({ts_col})").alias("_ts"),
            F.col(value_col).alias("_v"),
        )
        .groupBy("_k", "_slot")
        .agg(
            # lexicographic struct max == "value of the latest ts,
            # ties to the larger value" — the same expression DuckDB
            # evaluates (struct_pack max), so both engines pick the
            # identical observation
            F.max(F.struct(F.col("_ts"), F.col("_v")))
            .getField("_v")
            .alias("_obs")
        )
    )

    w = (
        Window.partitionBy("_k")
        .orderBy("_slot")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(obs, ["_k", "_slot"], "left")
        .select(
            F.col("_k").alias(key_col),
            F.timestamp_seconds(F.col("_slot")).alias("slot_ts"),
            F.last("_obs", ignorenulls=True).over(w).alias(value_col),
            F.col("_obs").isNotNull().alias("is_observed"),
        )
    )


def resample_forward_fill_sql(
    table: str = "events",
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    step_seconds: int = 3600,
) -> str:
    """DuckDB oracle twin of :func:`resample_forward_fill`."""
    step = int(step_seconds)
    step_us = step * 1_000_000
    # same floor-mod alignment as the Spark side: ((x % m) + m) % m is
    # the portable non-negative modulo, so this floors pre-1970 too
    slot = (
        f"((epoch_us({ts_col}) - (((epoch_us({ts_col}) % {step_us})"
        f" + {step_us}) % {step_us})) // {step_us}) * {step}"
    )
    return (
        f"WITH span AS (SELECT {key_col} AS _k, min({slot}) AS _lo,"
        f"  max({slot}) AS _hi FROM {table} GROUP BY {key_col}),"
        " grid AS (SELECT _k, unnest(range(_lo, _hi + 1, "
        f"{step})) AS _slot FROM span),"
        f" obs AS (SELECT {key_col} AS _k, {slot} AS _slot,"
        f"  (max(struct_pack(t := epoch_us({ts_col}),"
        f"   v := {value_col}))).v AS _obs"
        f"  FROM {table} GROUP BY 1, 2)"
        # ::TIMESTAMP strips DuckDB's tz-awareness (Spark emits naive)
        f" SELECT g._k AS {key_col},"
        " CAST(to_timestamp(g._slot) AS TIMESTAMP) AS slot_ts,"
        "  last_value(o._obs IGNORE NULLS) OVER ("
        "   PARTITION BY g._k ORDER BY g._slot"
        f"   ROWS UNBOUNDED PRECEDING) AS {value_col},"
        "  o._obs IS NOT NULL AS is_observed"
        " FROM grid g LEFT JOIN obs o ON o._k = g._k AND o._slot = g._slot"
    )


def rolling_event_features(
    events: DataFrame,
    window_s: tuple[int, ...] = (300, 3600),
    user_col: str = "user_id",
    ts_col: str = "ts",
    val_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-event trailing time-window features — the feature-
    engineering staple (fraud/abuse/rate signals): for each event and
    each ``w`` in ``window_s``, the count / exact sum / mean of
    ``val_col`` over that user's events in ``[ts − w, ts]``
    (inclusive both ends, the RANGE-frame convention).

    Exactness: the windowed sum accumulates DECIMAL(38,12) (a double
    sum would depend on frame iteration order within timestamp ties),
    divides in double, rounds to 6 — the package policy. RANGE frames
    are value-based, so rows tied on (user, ts) see identical frames
    in both engines regardless of sort nondeterminism.

    Plan: ONE window partition (hash-shuffle on user, sort by time)
    shared by every (window × aggregate) column — Spark evaluates all
    frames in a single WindowExec pass; nothing else shuffles. Frame
    bounds are integer microseconds over ``unix_micros``.
    """
    from pyspark.sql.window import Window

    us = F.unix_micros(F.col(ts_col))
    out_cols = [F.col(id_col), F.col(user_col), F.col(ts_col)]
    for w in window_s:
        win = (
            Window.partitionBy(user_col)
            .orderBy(us)
            .rangeBetween(-int(w) * 1_000_000, 0)
        )
        cnt = F.count(F.col(val_col)).over(win)
        ssum = F.sum(
            F.col(val_col).cast("decimal(38,12)")
        ).over(win)
        tag = _wtag(w)
        out_cols += [
            cnt.cast("bigint").alias(f"n_{tag}"),
            _fx6(ssum.cast("double")).alias(f"sum_{tag}"),
            _fx6(
                ssum.cast("double") / cnt.cast("double")
            ).alias(f"avg_{tag}"),
        ]
    return events.select(*out_cols)


def rolling_event_features_sql(
    window_s: tuple[int, ...] = (300, 3600),
    table: str = "events",
    user_col: str = "user_id",
    ts_col: str = "ts",
    val_col: str = "value",
    id_col: str = "event_id",
) -> str:
    """DuckDB oracle twin of :func:`rolling_event_features` — RANGE
    frames over ``epoch_us`` with the same decimal accumulation."""
    cols = [id_col, user_col, ts_col]
    for w in window_s:
        tag = _wtag(w)
        frame = (
            f"OVER (PARTITION BY {user_col} ORDER BY epoch_us({ts_col})"
            f" RANGE BETWEEN {int(w) * 1_000_000} PRECEDING"
            " AND CURRENT ROW)"
        )
        cols += [
            f"CAST(count({val_col}) {frame} AS BIGINT) AS n_{tag}",
            f"floor(CAST(sum(CAST({val_col} AS DECIMAL(38,12)))"
            f" {frame} AS DOUBLE) * 1e6 + 0.5) / 1e6 AS sum_{tag}",
            f"floor(CAST(sum(CAST({val_col} AS DECIMAL(38,12)))"
            f" {frame} AS DOUBLE)"
            f" / CAST(count({val_col}) {frame} AS DOUBLE)"
            f" * 1e6 + 0.5) / 1e6 AS avg_{tag}",
        ]
    return f"SELECT {', '.join(cols)} FROM {table}"


def _wtag(w: int) -> str:
    """300 → '5m', 3600 → '1h', 90 → '90s'."""
    if w % 3600 == 0:
        return f"{w // 3600}h"
    if w % 60 == 0:
        return f"{w // 60}m"
    return f"{w}s"
