"""SCD Type-2 dimension maintenance: change detection, interval
closing, idempotent re-apply, bi-temporal as-of reads, and a DuckDB
replay of the apply itself."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from minisql_engine_spark.sources import load_table
from minisql_engine_spark.sources.scd2 import (
    scd2_apply,
    scd2_apply_sql,
    scd2_as_of,
    scd2_current,
    scd2_init,
)
from minisql_engine_spark.sources.snapshots import read_snapshot


@pytest.fixture()
def dim(spark, sf_dir, tmp_path):
    base = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("k"),
        F.col("n_name").alias("name"),
        F.col("n_regionkey").alias("region"),
    )
    path = str(tmp_path / "dim")
    scd2_init(base, path, "k", ts=10)
    return base, path


def _rows(df):
    return sorted(
        (
            r["k"],
            r["name"],
            r["region"],
            r["valid_from"],
            r["valid_to"],
            r["is_current"],
        )
        for r in df.collect()
    )


def test_change_close_insert_and_as_of(spark, dim):
    base, path = dim
    # ts=100: rename key 0, move key 1 to a new region, add key 900 —
    # non-targeted attributes copy the base row so only the intended
    # field differs per key
    b0 = {r["k"]: (r["name"], r["region"]) for r in base.collect()}
    upd = spark.createDataFrame(
        [
            (0, "RENAMED", b0[0][1]),
            (1, b0[1][0], 99),
            (900, "ATLANTIS", 4),
        ],
        "k bigint, name string, region bigint",
    )
    scd2_apply(spark, path, upd, "k", ts=100)

    cur = {r["k"]: r for r in scd2_current(spark, path).collect()}
    assert cur[0]["name"] == "RENAMED" and cur[0]["valid_from"] == 100
    assert cur[1]["region"] == 99
    assert cur[900]["name"] == "ATLANTIS"
    # untouched keys keep their original open row
    assert cur[5]["valid_from"] == 10 and cur[5]["valid_to"] is None

    full = read_snapshot(spark, path)
    closed = {
        r["k"]: r
        for r in full.filter(~F.col("is_current")).collect()
    }
    assert set(closed) == {0, 1}
    assert closed[0]["valid_to"] == 100 and closed[0]["name"] == b0[0][0]

    # business-time travel: before the change the old names hold
    old = {r["k"]: r["name"] for r in scd2_as_of(spark, path, 50).collect()}
    assert old[0] == b0[0][0]
    assert 900 not in old
    new = {r["k"]: r["name"] for r in scd2_as_of(spark, path, 150).collect()}
    assert new[0] == "RENAMED" and new[900] == "ATLANTIS"
    # exactly one row per key at any as-of instant
    for ts in (10, 50, 100, 150):
        asof = scd2_as_of(spark, path, ts)
        assert asof.count() == asof.select("k").distinct().count()


def test_identical_reapply_is_content_noop(spark, dim):
    base, path = dim
    upd = spark.createDataFrame(
        [(0, "X", 7)], "k bigint, name string, region bigint"
    )
    v1 = scd2_apply(spark, path, upd, "k", ts=100)
    before = _rows(read_snapshot(spark, path, v1))
    v2 = scd2_apply(spark, path, upd, "k", ts=200)  # same attrs again
    assert _rows(read_snapshot(spark, path, v2)) == before


def test_duplicate_keys_rejected(spark, dim):
    base, path = dim
    dup = spark.createDataFrame(
        [(0, "A", 1), (0, "B", 2)], "k bigint, name string, region bigint"
    )
    with pytest.raises(ValueError, match="duplicate"):
        scd2_apply(spark, path, dup, "k", ts=100)
    with pytest.raises(ValueError, match="attributes"):
        scd2_apply(
            spark,
            path,
            spark.createDataFrame([(0, "A")], "k bigint, name string"),
            "k",
            ts=100,
        )


def test_key_only_dimension_rejected(spark, sf_dir, tmp_path):
    """A dimension with no attribute columns has nothing to version:
    init refuses it, and apply refuses a key-only update batch
    (rather than crashing on a None change-predicate)."""
    base = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("k")
    )
    path = str(tmp_path / "dim_keyonly")
    with pytest.raises(ValueError, match="no attribute columns"):
        scd2_init(base, path, "k", ts=10)

    full = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("k"),
        F.col("n_name").alias("name"),
    )
    path2 = str(tmp_path / "dim_full")
    scd2_init(full, path2, "k", ts=10)
    with pytest.raises(ValueError, match="no attribute columns"):
        scd2_apply(spark, path2, base, "k", ts=20)


def test_apply_matches_duckdb_oracle(spark, dim):
    """One apply replays bit-for-bit in SQL: same null-safe change
    detection, same closing/inserting, over the same base version."""
    base, path = dim
    upd_rows = [(0, "RENAMED", 77), (900, None, 4)]  # incl. NULL attr
    upd = spark.createDataFrame(
        upd_rows, "k bigint, name string, region bigint"
    )
    v = scd2_apply(spark, path, upd, "k", ts=100)

    con = duckdb.connect()
    con.register(
        "base_v1", read_snapshot(spark, path, v - 1).toPandas()
    )
    con.register("upd", upd.toPandas())
    want = sorted(
        map(
            tuple,
            con.execute(
                scd2_apply_sql("base_v1", "upd", "k", ["name", "region"], 100)
            ).fetchall(),
        )
    )
    got = _rows(read_snapshot(spark, path, v))
    norm = lambda rows: [  # noqa: E731  (None/NaN normalization)
        tuple(
            None
            if (x != x if isinstance(x, float) else x is None)
            else (int(x) if isinstance(x, float) and x == int(x) else x)
            for x in r
        )
        for r in rows
    ]
    assert norm(got) == norm(want)


def test_null_attr_change_detected_null_safely(spark, dim):
    """NULL → value and value → NULL are CHANGES; NULL → NULL is
    not (IS DISTINCT FROM semantics on both engines)."""
    base, path = dim
    to_null = spark.createDataFrame(
        [(0, None, 0)], "k bigint, name string, region bigint"
    )
    b0 = {r["k"]: (r["name"], r["region"]) for r in base.collect()}
    to_null = spark.createDataFrame(
        [(0, None, b0[0][1])], "k bigint, name string, region bigint"
    )
    scd2_apply(spark, path, to_null, "k", ts=100)
    assert scd2_current(spark, path).filter("k = 0").first()["name"] is None
    # NULL → NULL: idempotent, nothing closes
    v = scd2_apply(spark, path, to_null, "k", ts=200)
    full = read_snapshot(spark, path, v)
    assert full.filter((F.col("k") == 0) & ~F.col("is_current")).count() == 1


def test_fact_enrichment_asof_event_time(spark, dim):
    """The point of SCD2: each fact row joins the dimension version
    valid AT ITS OWN timestamp. Facts before the change see old
    attributes, facts after see new ones — one range-predicate join,
    verified row by row against the change timeline."""
    base, path = dim
    b0 = {r["k"]: r["name"] for r in base.collect()}
    upd = spark.createDataFrame(
        [(0, "RENAMED", 0)], "k bigint, name string, region bigint"
    )
    scd2_apply(spark, path, upd, "k", ts=100)

    facts = spark.createDataFrame(
        [(1, 0, 50), (2, 0, 100), (3, 0, 150), (4, 5, 70)],
        "fact_id bigint, k bigint, ts bigint",
    )
    d = read_snapshot(spark, path)
    enriched = facts.join(
        d,
        (facts["k"] == d["k"])
        & (d["valid_from"] <= facts["ts"])
        & (d["valid_to"].isNull() | (d["valid_to"] > facts["ts"])),
    ).select("fact_id", "name")
    got = {r["fact_id"]: r["name"] for r in enriched.collect()}
    # interval semantics are half-open [from, to): ts=100 sees the NEW row
    assert got == {1: b0[0], 2: "RENAMED", 3: "RENAMED", 4: b0[5]}
    # exactly one dimension row matched per fact (intervals partition time)
    assert enriched.count() == facts.count()
