"""Z-order (Morton-curve) data layout for multi-dimensional scan
pruning.

Directory partitioning prunes on ONE key hierarchy; sorting the data
prunes on ONE column's min/max stats. When queries filter on SEVERAL
columns (ship date AND part, user AND time), the 100 TB answer is
multi-dimensional clustering: sort the table by the interleaved-bit
Z-value of the filter columns, so every output file covers a small
hyper-rectangle of the value space and its parquet footer min/max
stats exclude it for selective predicates on ANY of the clustered
columns (Delta Lake's ``OPTIMIZE ZORDER BY``, same idea).

Construction, all JVM-side integer arithmetic:

1. one tiny agg computes each column's (min, max), broadcast back
   as a 1-row cross join (no collect);
2. each value is scaled to a ``bits``-wide integer rank
   ``floor((x − min) / (max − min) · (2^bits − 1))`` (NULLs → 0:
   they cluster together at the curve origin);
3. the Z-value interleaves the columns' bits
   (``Σ_b Σ_i bit(x_i, b) << (b·n + i)``) — a single BIGINT
   expression, whole-stage codegen;
4. ``repartitionByRange(z)`` + ``sortWithinPartitions(z)`` →
   parquet. Range partitioning keeps files disjoint in Z — that
   disjointness is what turns footer stats into pruning.

At cluster scale the range boundaries come from Spark's sampled
range partitioner — no driver materialization, one shuffle, and the
write parallelism is the target file count. Verified behavior (not
just shape): ``tests/test_zorder.py`` reads the written footers and
asserts a selective predicate on EACH clustered dimension excludes
most files, while a linear sort only prunes its own lead column.

Reference scope: layout/DDL is absent from the reference engine
(sqlengine.py reads bare CSVs); this extends SURVEY §2.2's writes
row with the multi-dim clustering lever.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_BITS = 16


def with_zvalue(
    df: DataFrame,
    cols: Sequence[str],
    bits: int = DEFAULT_BITS,
    z_col: str = "_z",
) -> DataFrame:
    """``df`` plus a Morton Z-value column over the numeric ``cols``,
    each scaled to ``bits`` via the DataFrame's own min/max (one tiny
    broadcast agg). ``bits · len(cols)`` must fit a signed BIGINT."""
    n = len(cols)
    if n == 0:
        raise ValueError("zorder needs at least one column")
    if bits * n > 62:
        raise ValueError(
            f"{bits} bits × {n} cols = {bits * n} exceeds a signed BIGINT"
        )
    # NaN-proof bounds: Spark's max() orders NaN above every double,
    # so one NaN row would poison hi (every rank becomes NaN→0 and
    # the dimension silently stops clustering). NaNs are excluded
    # from the bounds and cluster with NULLs at the curve origin.
    def _finite(c: str):
        x = F.col(c).cast("double")
        return F.when(~F.isnan(x), x)

    stats = df.agg(
        *[
            F.min(_finite(c)).alias(f"_zlo_{i}")
            for i, c in enumerate(cols)
        ],
        *[
            F.max(_finite(c)).alias(f"_zhi_{i}")
            for i, c in enumerate(cols)
        ],
    )
    top = (1 << bits) - 1
    ranks = []
    for i, c in enumerate(cols):
        lo, hi = F.col(f"_zlo_{i}"), F.col(f"_zhi_{i}")
        x = F.col(c).cast("double")
        scaled = F.when(
            x.isNull() | F.isnan(x) | (hi <= lo), F.lit(0).cast("long")
        ).otherwise(F.floor((x - lo) / (hi - lo) * top).cast("long"))
        ranks.append(F.least(F.lit(top).cast("long"), scaled))
    z = F.lit(0).cast("long")
    for b in range(bits):
        for i, r in enumerate(ranks):
            z = z + F.shiftleft(
                F.shiftright(r, b).bitwiseAND(F.lit(1)), b * n + i
            ).cast("long")
    drop = [f"_zlo_{i}" for i in range(n)] + [f"_zhi_{i}" for i in range(n)]
    return (
        df.crossJoin(F.broadcast(stats))
        .withColumn(z_col, z)
        .drop(*drop)
    )


def write_zordered(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    bits: int = DEFAULT_BITS,
    n_files: int = 16,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as parquet clustered on the Z-order of ``cols``:
    range-partitioned into ``n_files`` Z-disjoint files, sorted
    within each, so footer min/max stats prune on every clustered
    dimension."""
    (
        with_zvalue(df, cols, bits)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode(mode)
        .parquet(path)
    )


def file_prune_fraction(
    path: str, col: str, lo: float, hi: float
) -> float:
    """Fraction of the written parquet files a ``col BETWEEN lo AND
    hi`` predicate can SKIP, judged purely by footer min/max — i.e.
    exactly what a parquet reader's row-group pruning sees. Test/
    diagnostic helper (driver-side metadata only, no data read)."""
    import glob
    import os

    import pyarrow.parquet as pq

    files = sorted(glob.glob(os.path.join(path, "*.parquet")))
    if not files:
        raise ValueError(f"no parquet files under {path}")
    skipped = 0
    for f in files:
        md = pq.read_metadata(f)
        fmin = None
        fmax = None
        for rg in range(md.num_row_groups):
            rgmd = md.row_group(rg)
            for ci in range(rgmd.num_columns):
                cmd = rgmd.column(ci)
                if cmd.path_in_schema != col or cmd.statistics is None:
                    continue
                s = cmd.statistics
                if s.min is not None:
                    fmin = s.min if fmin is None else min(fmin, s.min)
                if s.max is not None:
                    fmax = s.max if fmax is None else max(fmax, s.max)
        if (
            fmin is not None
            and fmax is not None
            and (fmax < lo or fmin > hi)
        ):
            skipped += 1
    return skipped / len(files)
