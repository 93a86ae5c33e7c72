"""Exact heavy hitters via a two-pass SpaceSaving candidate sketch.

The vocabulary of a 100 TB corpus does not fit a shuffle comfortably:
``GROUP BY token`` moves one row per distinct (partition, token) even
with map-side partials, and the long Zipf tail dominates that volume.
The classic scale answer is *candidate generation + exact recount*:

1. **Candidate pass (map-side, no shuffle).** Each partition runs a
   SpaceSaving sketch [Metwally et al., ICDT'05] with ``m`` counters
   over its own tokens. SpaceSaving guarantees every item whose
   within-partition count exceeds ``N_p / m`` survives in the sketch,
   and by pigeonhole any *global* heavy hitter (count ≥ N/k over total
   N) has at least one partition where its share is ≥ ``N_p / k`` —
   so with ``m ≥ 2k`` counters the union of per-partition candidates
   is a **superset** of the true heavy-hitter set (strictly:
   ``N_p/k > N_p/m`` whenever the item occurs at all). Only ≤
   ``partitions × m`` candidate rows leave the executors.
2. **Exact recount (one bounded shuffle).** The token stream is
   semi-joined against the broadcast candidate set and counted
   exactly; the final filter ``tf · k ≥ N`` is pure integer
   arithmetic, so the output is *exact and deterministic* — the
   sketch only ever bounds which tokens are worth counting, it never
   decides a count. The DuckDB oracle is the plain exact
   ``GROUP BY token HAVING tf·k ≥ N`` with no sketch at all; the
   hash-compare therefore *proves* the candidate pass lost nothing.

The candidate pass is the one deliberate Python stage in this module:
SpaceSaving is an imperative, order-dependent fold no Catalyst
expression can express. It runs as Arrow-batched ``mapInPandas`` with
per-batch ``value_counts`` (vectorized C) feeding weighted sketch
updates — the weighted variant preserves the SpaceSaving invariant
(an absent item's true count is ≤ the minimum counter, which is
≤ N_p/m, because eviction sets the new counter to min + weight and
the minimum is monotone). Eviction does a linear min-scan, fine for
the ``m`` in the hundreds/thousands used here; a production JVM
implementation would keep a min-heap.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import _norm_text, _ws_tokens

_NORM_SQL = "regexp_replace(lower(trim({c})), '\\s+', ' ', 'g')"


def _space_saving_partition(m: int):
    """Per-partition weighted SpaceSaving over a ``token`` column."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict[str, int] = {}
        for pdf in batches:
            for tok, c in pdf["token"].value_counts().items():
                c = int(c)
                if tok in counters:
                    counters[tok] += c
                elif len(counters) < m:
                    counters[tok] = c
                else:
                    # SpaceSaving eviction: the new item inherits the
                    # minimum counter + its own weight (overestimate,
                    # never an undercount — the superset guarantee).
                    min_tok = min(counters, key=counters.get)
                    counters[tok] = counters.pop(min_tok) + c
        yield pd.DataFrame({"token": pd.Series(list(counters), dtype="str")})

    return fn


def _token_stream(df: DataFrame, text_col: str) -> DataFrame:
    """One ``token`` column: whitespace tokens of the normalized text
    (the `_NORM` rule shared with dedup / vocabulary_stats)."""
    return df.select(
        F.explode(_ws_tokens(_norm_text(F.col(text_col)))).alias("token")
    )


def frequent_tokens(
    df: DataFrame,
    k: int,
    text_col: str = "text",
    sketch_size: int | None = None,
) -> DataFrame:
    """(token, tf) for every token with ``tf · k ≥ N`` (frequency at
    least 1/k of the N-token corpus), exact counts, ordered (tf desc,
    token asc).

    Plan: a map-side SpaceSaving candidate pass (zero shuffle, ≤
    partitions·m candidate rows out), a map-side total-count aggregate
    (``sum(size(tokens))`` — no explode), then ONE shuffle that
    carries only candidate tokens into the exact recount. The
    threshold compare is integer (``tf·k ≥ N``) — no float boundary.

    ``sketch_size`` defaults to ``2k``; any value ≥ k+1 preserves the
    superset guarantee (see module docstring), the margin just trades
    candidate-set size against sketch update cost. Practical range:
    k up to ~10⁵ — beyond that the per-partition sketch (m entries)
    and the broadcast candidate set (≤ partitions·m rows) stop being
    "small"; a 1/k that fine is vocabulary accounting, which is what
    ``vocabulary_stats`` (full groupBy) is for.
    """
    if k < 1:
        raise ValueError(f"need k >= 1, got {k}")
    m = sketch_size if sketch_size is not None else 2 * k
    if m <= k:
        raise ValueError(f"sketch_size must exceed k for the guarantee, got {m} <= {k}")
    toks = _token_stream(df, text_col)
    candidates = (
        toks.mapInPandas(_space_saving_partition(m), schema="token string")
        .distinct()
    )
    total = df.agg(
        F.sum(F.size(_ws_tokens(_norm_text(F.col(text_col)))))
        .cast("bigint")
        .alias("n_total")
    )
    counts = (
        toks.join(F.broadcast(candidates), "token", "left_semi")
        .groupBy("token")
        .agg(F.count("*").cast("bigint").alias("tf"))
    )
    return (
        counts.crossJoin(F.broadcast(total))
        .filter(F.col("tf") * F.lit(k) >= F.col("n_total"))
        .select("token", "tf")
        .orderBy(F.col("tf").desc(), F.col("token"))
    )


def frequent_tokens_exact(
    df: DataFrame, k: int, text_col: str = "text"
) -> DataFrame:
    """Sketch-free twin: full ``GROUP BY token`` then the same integer
    threshold — the shape to use when the vocabulary is known small.
    ``frequent_tokens`` must equal this exactly (tested)."""
    if k < 1:
        raise ValueError(f"need k >= 1, got {k}")
    toks = _token_stream(df, text_col)
    total = df.agg(
        F.sum(F.size(_ws_tokens(_norm_text(F.col(text_col)))))
        .cast("bigint")
        .alias("n_total")
    )
    return (
        toks.groupBy("token")
        .agg(F.count("*").cast("bigint").alias("tf"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("tf") * F.lit(k) >= F.col("n_total"))
        .select("token", "tf")
        .orderBy(F.col("tf").desc(), F.col("token"))
    )


def frequent_tokens_sql(
    table: str = "documents",
    k: int = 1000,
    text_col: str = "text",
) -> str:
    """DuckDB oracle: the exact heavy-hitter definition with no
    sketch — identical tokenization (`_NORM` + whitespace split) and
    the same integer threshold."""
    norm = _NORM_SQL.format(c=text_col)
    return (
        f"WITH toks AS (SELECT unnest(string_split({norm}, ' ')) AS token"
        f" FROM {table} WHERE trim({text_col}) <> ''),"
        " tot AS (SELECT count(*) AS n_total FROM toks),"
        " tf AS (SELECT token, CAST(count(*) AS BIGINT) AS tf"
        "  FROM toks GROUP BY token)"
        f" SELECT token, tf FROM tf CROSS JOIN tot"
        f" WHERE tf * {k} >= n_total"
        " ORDER BY tf DESC, token"
    )
