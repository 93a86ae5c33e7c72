"""Arrow-vectorized Python functions (Pandas UDFs).

The engine's UDF surface (SURVEY §2.2 UDF row). Two canonical shapes:

* scalar ``@pandas_udf`` — Arrow-batched columnar transfer, ~10-100×
  a row-at-a-time Python UDF. ``quality_score_pandas_udf`` mirrors
  ``operators.text.with_quality_score`` exactly and is equality-tested
  against the native-expression version — demonstrating when to use
  which: built-ins for anything expressible (JVM, codegen), Pandas UDF
  only for logic Spark can't express.
* grouped ``applyInPandas`` — per-group pandas programs with an
  explicit output schema (``customer_order_features``).

Both paths stream Arrow record batches per partition/group: Python
memory stays bounded at 100 TB.
"""

from __future__ import annotations

import re

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

_PUNCT = re.compile(r"[^A-Za-z0-9\s]")
_STOP = re.compile(r"\b(the|and|of|to|in|is|it|that|was|for)\b")


@F.pandas_udf(DoubleType())
def quality_score_pandas_udf(text: pd.Series) -> pd.Series:
    """Vectorized quality score — same recipe as
    ``operators.text.with_quality_score`` (kept in lockstep by
    tests/test_extensions2.py)."""
    null_mask = text.isna()
    filled = text.fillna("")  # compute on '', mask back to NULL at the end
    stripped = filled.str.strip()
    n_chars = filled.str.len().astype("int64")
    n_tokens = stripped.str.split(r"\s+").map(len).where(stripped != "", 0)
    n_punct = filled.str.count(_PUNCT)
    n_stop = filled.str.lower().str.count(_STOP)
    safe_tokens = n_tokens.clip(lower=1)
    safe_chars = n_chars.clip(lower=1)
    punct_ratio = n_punct / safe_chars
    stop_ratio = n_stop / safe_tokens
    mean_word_len = (n_chars - (n_tokens - 1)) / safe_tokens
    score = (
        0.5
        + stop_ratio.clip(upper=0.3)
        - punct_ratio.clip(upper=0.3)
        + ((mean_word_len >= 3) & (mean_word_len <= 10)) * 0.2
    )
    return score.mask(null_mask)  # NULL in → NULL out, like the native op


FEATURES_SCHEMA = StructType(
    [
        StructField("c_custkey", LongType()),
        StructField("n_orders", LongType()),
        StructField("total_cents", LongType()),
        StructField("first_order", TimestampType()),
        StructField("last_order", TimestampType()),
    ]
)


def customer_order_features(orders: DataFrame) -> DataFrame:
    """Per-customer order features via grouped ``applyInPandas``.

    Spend is accumulated in integer cents (exact, order-independent)
    so the result is bit-comparable to the SQL oracle. One shuffle on
    the group key; each group is a bounded pandas frame.

    Perf note (measured): ~1 ms/group of Python overhead — 14.6 s for
    15k customers at sf0.1 vs ~0.3 s native. This function exists to
    exercise the grouped-UDF surface; an aggregation expressible in
    SQL (like this one) should run on the native path, and
    ``applyInPandas`` should be reserved for per-group programs Spark
    can't express (model scoring, per-entity time-series fitting, …)
    where groups are large enough to amortize the overhead.
    """

    def per_customer(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("o_orderkey")
        cents = (pdf["o_totalprice"] * 100).round().astype("int64")
        return pd.DataFrame(
            {
                "c_custkey": [pdf["o_custkey"].iloc[0]],
                "n_orders": [len(pdf)],
                "total_cents": [int(cents.sum())],
                "first_order": [pdf["o_orderdate"].min()],
                "last_order": [pdf["o_orderdate"].max()],
            }
        )

    return orders.groupBy("o_custkey").applyInPandas(
        per_customer, schema=FEATURES_SCHEMA
    )


@F.pandas_udf("double")
def weighted_avg_price_udaf(price: pd.Series, qty: pd.Series) -> float:
    """Grouped-aggregate Pandas UDF (UDAF surface): quantity-weighted
    mean price, accumulated in exact integer cents so the result is a
    single IEEE division of two exact integers — deterministic and
    oracle-reproducible. (Int64 cents×cents products fit comfortably
    at bench scale; at extreme scale switch the accumulator to
    Python ints / decimal.)"""
    cents_p = (price * 100).round().astype("int64")
    cents_q = (qty * 100).round().astype("int64")
    num = int((cents_p * cents_q).sum())
    den = int(cents_q.sum())
    return float(num) / float(den) if den else None
