"""As-of join — a temporal operator Spark lacks natively.

For each left row, attach the single most recent right row with
``right_ts <= left_ts`` (backward direction) sharing the join key —
the standard market-data / event-enrichment operator (cf. DuckDB's
native ``ASOF JOIN``, pandas ``merge_asof``).

Spark-first realization as a composition of existing DataFrame ops
(no UDF, no per-row loop): union the two sides tagged, then a
running ``last(..., ignorenulls=True)`` window ordered by timestamp
carries the latest right payload forward onto every left row.

Cost: ONE shuffle on the join key + a sort within partitions — the
same cost profile as a sort-merge join, fully distributed, no state
collected. Skewed keys are split by AQE. This beats the naive
"join all earlier rows then argmax" plan, which explodes to
O(|L|·|R|) pairs per key before reducing.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str] | str,
    left_ts: str,
    right_ts: str,
    right_values: Sequence[str],
    prefix: str = "asof_",
) -> DataFrame:
    """Backward as-of join (latest right at-or-before each left row).

    Right rows at exactly ``left_ts`` match (ties resolve to the
    right row, like DuckDB ASOF and ``merge_asof`` defaults). If the
    right side can hold several rows per (key, ts), pre-aggregate it
    first — the operator attaches exactly one payload per left row.

    Output: all left columns + ``{prefix}ts`` + ``{prefix}<value>``
    columns (NULL when no earlier right row exists).
    """
    keys = [on] if isinstance(on, str) else list(on)
    payload = F.struct(
        F.col(right_ts).alias("_ts"), *[F.col(c) for c in right_values]
    )
    r = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("_evt_ts"),
        F.lit(1).alias("_is_right"),
        payload.alias("_r"),
    )
    l = left.select(  # noqa: E741
        "*",
        F.col(left_ts).alias("_evt_ts"),
        F.lit(0).alias("_is_right"),
        F.lit(None).cast(r.schema["_r"].dataType).alias("_r"),
    )
    merged = l.unionByName(r, allowMissingColumns=True)
    # rights sort BEFORE lefts at equal ts → equal-ts rows match
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("_evt_ts"), F.col("_is_right").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = merged.withColumn(
        "_latest", F.last("_r", ignorenulls=True).over(w)
    )
    out = carried.filter(F.col("_is_right") == 0).select(
        *[c for c in left.columns],
        F.col("_latest._ts").alias(f"{prefix}ts"),
        *[F.col(f"_latest.{c}").alias(f"{prefix}{c}") for c in right_values],
    )
    return out


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str] | str,
    left_ts: str,
    right_ts: str,
    right_values: Sequence[str],
    prefix: str = "asof_",
) -> DataFrame:
    """Forward as-of join (EARLIEST right at-or-after each left row) —
    the mirror of :func:`asof_join_backward`: same union-and-window
    plan, with the frame looking forward (``first`` over
    [currentRow, unboundedFollowing]) and rights sorting AFTER lefts
    at equal ts so exact-timestamp rows still match. Same single
    key-shuffle cost."""
    keys = [on] if isinstance(on, str) else list(on)
    payload = F.struct(
        F.col(right_ts).alias("_ts"), *[F.col(c) for c in right_values]
    )
    r = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("_evt_ts"),
        F.lit(1).alias("_is_right"),
        payload.alias("_r"),
    )
    l = left.select(  # noqa: E741
        "*",
        F.col(left_ts).alias("_evt_ts"),
        F.lit(0).alias("_is_right"),
        F.lit(None).cast(r.schema["_r"].dataType).alias("_r"),
    )
    merged = l.unionByName(r, allowMissingColumns=True)
    # rights sort AFTER lefts at equal ts → equal-ts rows match
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("_evt_ts"), F.col("_is_right"))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    carried = merged.withColumn(
        "_next", F.first("_r", ignorenulls=True).over(w)
    )
    return carried.filter(F.col("_is_right") == 0).select(
        *[c for c in left.columns],
        F.col("_next._ts").alias(f"{prefix}ts"),
        *[F.col(f"_next.{c}").alias(f"{prefix}{c}") for c in right_values],
    )


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str] | str,
    left_ts: str,
    right_ts: str,
    right_values: Sequence[str],
    prefix: str = "asof_",
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """Nearest as-of join: the right row closest in time in EITHER
    direction (ties prefer the earlier right row, like pandas
    ``merge_asof(direction='nearest')``); ``tolerance_seconds``
    drops matches further than the bound. Composition of the
    backward and forward passes — two key-shuffles total."""
    back = asof_join_backward(
        left, right, on, left_ts, right_ts, right_values, prefix="_b_"
    )
    both = asof_join_forward(
        back, right, on, left_ts, right_ts, right_values, prefix="_f_"
    )
    lts = F.expr(f"unix_micros({left_ts})")
    gap_b = lts - F.expr("unix_micros(_b_ts)")
    gap_f = F.expr("unix_micros(_f_ts)") - lts
    use_b = F.col("_b_ts").isNotNull() & (
        F.col("_f_ts").isNull() | (gap_b <= gap_f)
    )
    pick = lambda c: F.when(  # noqa: E731
        use_b, F.col(f"_b_{c}")
    ).otherwise(F.col(f"_f_{c}"))
    out = both.select(
        *[c for c in left.columns],
        pick("ts").alias(f"{prefix}ts"),
        *[pick(c).alias(f"{prefix}{c}") for c in right_values],
    )
    if tolerance_seconds is not None:
        gap = F.abs(
            F.expr(f"unix_micros({prefix}ts)") - lts
        ) / F.lit(1_000_000)
        keep = F.col(f"{prefix}ts").isNotNull() & (
            gap <= F.lit(float(tolerance_seconds))
        )
        out = out.select(
            *[c for c in left.columns],
            *[
                F.when(keep, F.col(f"{prefix}{c}"))
                .otherwise(F.lit(None))
                .alias(f"{prefix}{c}")
                for c in ["ts", *right_values]
            ],
        )
    return out
