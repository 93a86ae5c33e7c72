"""Stream-stream interval join: click→purchase attribution.

The canonical two-stream correlation: attribute each purchase to the
clicks by the same user within the preceding ``max_lag``. Written
batch/stream-unified like the rest of this package — the same
function body runs on static DataFrames (for the DuckDB oracle) and
on watermarked streams, where Spark plans it as a symmetric stateful
join:

* each side buffers rows in the state store keyed by ``user_id``;
* the interval condition (``click_ts ∈ [purchase_ts − max_lag,
  purchase_ts]``) + BOTH watermarks let the engine compute a state
  eviction bound per side (clicks older than watermark − max_lag can
  never match a future purchase and are dropped) — without the time
  bound the state would grow forever, which is why this operator
  REQUIRES watermarked inputs in streaming mode;
* output is append-mode: a joined row is emitted once both matching
  rows have arrived.

Scale: state is hash-partitioned by user_id across executors; skewed
hot users bound state by ``max_lag`` × their event rate, not history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def attribution_join(
    clicks: DataFrame,
    purchases: DataFrame,
    max_lag: str = "2 hours",
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """(purchase_id, user_id, purchase_ts, click_id, click_ts,
    lag_seconds) — one row per (purchase, qualifying click) pair.
    Inner join: un-attributed purchases are a separate anti-join
    question, deliberately not mixed into the stateful operator."""
    c = clicks.select(
        F.col(user_col).alias("c_user"),
        F.col(id_col).alias("click_id"),
        F.col(ts_col).alias("click_ts"),
    )
    p = purchases.select(
        F.col(user_col).alias("user_id"),
        F.col(id_col).alias("purchase_id"),
        F.col(ts_col).alias("purchase_ts"),
    )
    cond = (
        (p["user_id"] == c["c_user"])
        & (c["click_ts"] <= p["purchase_ts"])
        & (
            c["click_ts"]
            >= p["purchase_ts"] - F.expr(f"INTERVAL {max_lag}")
        )
    )
    return p.join(c, cond).select(
        "purchase_id",
        "user_id",
        "purchase_ts",
        "click_id",
        "click_ts",
        # exact µs difference, integer-floor-divided to seconds:
        # per-operand second-truncation (unix_timestamp) disagrees
        # with a fractional-epoch oracle on sub-second components,
        # and float division + CAST would round-half-even in DuckDB
        F.expr(
            "(unix_micros(purchase_ts) - unix_micros(click_ts))"
            " div 1000000"
        ).alias("lag_seconds"),
    )


def attribution_join_events(
    events: DataFrame,
    max_lag: str = "2 hours",
    click_type: str = "click",
    purchase_type: str = "purchase",
) -> DataFrame:
    """:func:`attribution_join` specialized to the ``events`` table
    shape (filter the two event types out of one stream). In
    streaming mode pass a watermarked stream; the two filters become
    two independently-stated sides of the symmetric join."""
    clicks = events.filter(F.col("event_type") == click_type)
    purchases = events.filter(F.col("event_type") == purchase_type)
    return attribution_join(clicks, purchases, max_lag)
