"""Scale-adaptive scan fan-out (guide §2.5, "input skew").

The local driver testdata is ONE single-row-group parquet file per
table, and Spark cannot split a parquet scan below row-group
granularity — so every scan stage (and all map-side work fused into
it: projections, explodes, hash/regex work, partial aggregates) runs
as ONE task regardless of ``maxPartitionBytes`` (documented since
PLANS_r5; measured again this round: the ``stats_corr`` decimal sums
and the ``editsim_pairs`` variant explode were single-threaded on a
32-core session).

``fan_out`` is the guide's fix — "one huge unsplittable file …
repartition immediately after the read" — made CONDITIONAL so it is
a no-op at scale: the exchange is inserted only when the input's
actual partition count is below the session's default parallelism.
At 100 TB the scan fans out for free from file/row-group counts, the
condition is false, and the plan is untouched — which answers the
r5 objection ("an extra Exchange just to fan out 600 KB of text …
would be WRONG at scale"). Locally it buys N-core parallelism on the
map-heavy stage for one narrow-row shuffle.

Results are unchanged by construction: round-robin ``repartition(n)``
is deterministic under ``spark.sql.execution.sortBeforeRepartition``
(on by default), and every consumer in this engine is
order-insensitive (the driver hash, pytest's normalize, and the
aggregates/joins the fan-out feeds).

Apply it to MAP-BOUND inputs only (expensive per-row work follows),
and AFTER projecting to the columns the consumer needs — the shuffle
should carry keys and short strings, not document bodies the
consumer would have pruned (guide §2.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, parts: int | None = None) -> DataFrame:
    """Round-robin repartition ``df`` up to ``parts`` (default: the
    session's ``defaultParallelism``) when — and only when — its
    physical plan currently provides fewer partitions. The partition
    probe is plan-time only (no job)."""
    sc = df.sparkSession.sparkContext
    target = parts or sc.defaultParallelism
    if target <= 1:
        return df
    try:
        current = df.rdd.getNumPartitions()
    except Exception:  # pragma: no cover — planning failure surfaces later
        return df
    if current >= target:
        return df
    return df.repartition(target)
