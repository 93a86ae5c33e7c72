"""Z-order layout: the written files must actually prune on EVERY
clustered dimension (footer min/max), beat a linear sort's non-lead
columns, and round-trip the data unchanged."""

from __future__ import annotations

import os
import sys
import tempfile

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from minisql_engine_spark.sources import load_table  # noqa: E402
from minisql_engine_spark.sources.zorder import (  # noqa: E402
    file_prune_fraction,
    with_zvalue,
    write_zordered,
)

COLS = ("o_custkey", "o_totalprice")


@pytest.fixture(scope="module")
def paths(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    base = tempfile.mkdtemp(prefix="zorder_")
    zpath = os.path.join(base, "z")
    lpath = os.path.join(base, "linear")
    write_zordered(orders, zpath, COLS, n_files=32)
    # linear control: same file count, sorted by the FIRST column only
    (
        orders.repartitionByRange(32, "o_custkey")
        .sortWithinPartitions("o_custkey")
        .write.mode("overwrite")
        .parquet(lpath)
    )
    return orders, zpath, lpath


def _band(df, col, frac=0.05, at=0.3):
    """A ``frac``-wide band centered at the ``at`` point of the value
    range — deliberately OFF the range midpoint, which is the Z
    curve's top-level binary boundary (files straddle it by
    construction, so a mid band is the worst case, not the typical
    one)."""
    lo, hi = df.agg(
        F.min(F.col(col).cast("double")), F.max(F.col(col).cast("double"))
    ).first()
    mid = lo + (hi - lo) * at
    half = (hi - lo) * frac / 2
    return mid - half, mid + half


def test_zorder_roundtrip_is_lossless(spark, paths):
    orders, zpath, _ = paths
    back = spark.read.parquet(zpath)
    assert back.count() == orders.count()
    assert sorted(back.columns) == sorted(orders.columns)
    # decimal sums: order-independent, so layout changes can't drift
    dec = F.sum(F.col("o_totalprice").cast("decimal(38,6)"))
    assert orders.agg(dec, F.count("*")).first() == back.agg(
        dec, F.count("*")
    ).first()


def test_zorder_prunes_on_every_dimension(paths):
    """A 5%-band predicate on EACH clustered column must skip ≥ half
    the z-ordered files by footer stats alone."""
    orders, zpath, _ = paths
    for col in COLS:
        lo, hi = _band(orders, col)
        frac = file_prune_fraction(zpath, col, lo, hi)
        assert frac >= 0.5, (col, frac)


def test_zorder_beats_linear_sort_on_second_dimension(paths):
    """The linear layout prunes its lead column but NOT the second
    one; z-order must prune the second dimension strictly better."""
    orders, zpath, lpath = paths
    lo, hi = _band(orders, "o_totalprice")
    z = file_prune_fraction(zpath, "o_totalprice", lo, hi)
    lin = file_prune_fraction(lpath, "o_totalprice", lo, hi)
    assert z > lin, (z, lin)
    # and the lead column still prunes fine on both layouts
    lo, hi = _band(orders, "o_custkey")
    assert file_prune_fraction(zpath, "o_custkey", lo, hi) >= 0.5


def test_zvalue_nulls_and_constant_columns(spark):
    df = spark.createDataFrame(
        [(1, None, 7.0), (2, 5, 7.0), (3, 9, 7.0)],
        "id long, a long, b double",
    )
    out = with_zvalue(df, ["a", "b"], bits=8)
    rows = {r.id: r._z for r in out.collect()}
    # constant column contributes 0 bits; NULL clusters at origin
    assert rows[1] == 0
    assert rows[2] >= 0 and rows[3] > rows[2]


def test_zvalue_rejects_bad_args(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    with pytest.raises(ValueError):
        with_zvalue(orders, [])
    with pytest.raises(ValueError):
        with_zvalue(orders, ["o_custkey"] * 4, bits=16)


def test_zvalue_nan_does_not_poison_dimension(spark):
    """One NaN row must not zero the whole dimension's ranks (Spark
    max() ranks NaN above every double): finite rows keep a real
    spread, the NaN row clusters at the origin with NULLs."""
    df = spark.createDataFrame(
        [(1, 1.0, 5.0), (2, float("nan"), 6.0), (3, 100.0, 7.0)],
        "id long, a double, b double",
    )
    rows = {r.id: r._z for r in with_zvalue(df, ["a", "b"], bits=8).collect()}
    assert rows[3] > rows[1]  # finite spread survives on dimension a
    # NaN row ranks 0 on a; only its b-dimension bits differ from id=1's
    assert rows[2] != rows[3]
