"""Entity-resolved SCD2 dimension maintenance (VERDICT r11 task 3):
record_linkage output drives entity_rollup golden records, which key
a Type-2 dimension — the MDM end-state (match → merge → versioned
dimension) composing two certified families in one flow.

The story the composition proves: raw-record churn coalesces to
ENTITY-level history. Batch 2 carries a balance update for every
21st customer — BOTH of that entity's raw registrations change (the
equality-agreement field must stay consistent within the entity or
linkage would rightly split it), yet the dimension sees exactly ONE
history event per entity: the golden record's bal_c moves, the
apply closes/reopens that entity's row. Entities whose records
didn't change are untouched (idempotent apply), and one brand-new
record opens a new singleton entity. The DuckDB oracle replays the
ENTIRE chain: both batches' staging, the blocked linkage with
recursive-CTE closure, the survivorship chooser, and the apply's
null-safe change detection, term for term."""

from __future__ import annotations

import hashlib
import os
import shutil
import tempfile

from pyspark.sql import functions as F

from minisql_engine_spark.operators.linkage import (
    entity_rollup,
    entity_rollup_sql,
    record_linkage,
    record_linkage_sql,
)
from minisql_engine_spark.sources.parquet_catalog import load_table
from minisql_engine_spark.sources.scd2 import (
    read_snapshot,
    scd2_apply,
    scd2_apply_sql,
    scd2_init,
)
from tests.conftest import assert_matches_oracle

_LINK_KW = dict(
    exact_weights={"bal_c": 2},
    name_weight=3,
    max_name_dist=2,
    threshold=5,
)
_ROLLUP_KW = dict(first_cols=("name", "block"), max_cols=("bal_c",))
_ATTRS = ["n_members", "name", "block", "bal_c"]

_BASE_SELECT = (
    "SELECT CAST(c_custkey AS BIGINT) AS rec_id,"
    " concat(CAST(c_nationkey AS VARCHAR), ':', c_mktsegment)"
    "  AS block,"
    " lower(c_name) AS name,"
    " CAST(round(c_acctbal * 100) AS BIGINT) AS bal_c"
    " FROM customer"
)

#: batch-1 staging — the entity_rollup_golden driver-row corpus
_STAGE1_SQL = (
    _BASE_SELECT
    + " UNION ALL"
    " SELECT CAST(c_custkey + 1000000 AS BIGINT),"
    " concat(CAST(c_nationkey AS VARCHAR), ':', c_mktsegment),"
    " concat(substring(lower(c_name), 1, length(c_name) - 1), 'x'),"
    " CAST(round(c_acctbal * 100) AS BIGINT)"
    " FROM customer WHERE c_custkey % 7 = 0"
)

_BUMP = " + CASE WHEN c_custkey % 21 = 0 THEN 100000 ELSE 0 END"

#: batch-2 staging — every 21st customer's balance moves by 100000
#: cents on BOTH raw registrations (one business event, two raw-row
#: changes), plus one brand-new singleton record
_STAGE2_SQL = (
    "SELECT CAST(c_custkey AS BIGINT) AS rec_id,"
    " concat(CAST(c_nationkey AS VARCHAR), ':', c_mktsegment)"
    "  AS block,"
    " lower(c_name) AS name,"
    " CAST(round(c_acctbal * 100) AS BIGINT)" + _BUMP + " AS bal_c"
    " FROM customer"
    " UNION ALL"
    " SELECT CAST(c_custkey + 1000000 AS BIGINT),"
    " concat(CAST(c_nationkey AS VARCHAR), ':', c_mktsegment),"
    " concat(substring(lower(c_name), 1, length(c_name) - 1), 'x'),"
    " CAST(round(c_acctbal * 100) AS BIGINT)" + _BUMP +
    " FROM customer WHERE c_custkey % 7 = 0"
    " UNION ALL"
    " SELECT CAST(2000000 AS BIGINT), 'zz:NEW',"
    " 'brand new entity', CAST(123456 AS BIGINT)"
)


def _base(spark, sf_dir):
    return load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").cast("long").alias("rec_id"),
        F.concat_ws(
            ":", F.col("c_nationkey"), F.col("c_mktsegment")
        ).alias("block"),
        F.lower(F.col("c_name")).alias("name"),
        F.round(F.col("c_acctbal") * 100).cast("long").alias("bal_c"),
    )


def _bumped(base):
    """Batch-2 mutation: +100000 cents for every 21st customer —
    applied to the SOURCE rows, so derived dirty copies inherit it
    (one business event, consistent across the entity's raw rows)."""
    return base.withColumn(
        "bal_c",
        F.when(
            F.col("rec_id") % 21 == 0, F.col("bal_c") + 100_000
        )
        .otherwise(F.col("bal_c"))
        .cast("long"),
    )


def _dirty(base):
    return base.filter(F.col("rec_id") % 7 == 0).select(
        (F.col("rec_id") + 1_000_000).alias("rec_id"),
        "block",
        F.expr(
            "concat(substring(name, 1, length(name) - 1), 'x')"
        ).alias("name"),
        "bal_c",
    )


def _golden(spark, staged):
    resolved = record_linkage(staged, **_LINK_KW)
    return entity_rollup(staged, resolved, **_ROLLUP_KW)


def _golden_sql(stage_sql: str) -> str:
    return entity_rollup_sql(
        stage_sql,
        record_linkage_sql(stage_sql, **_LINK_KW),
        **_ROLLUP_KW,
    )


def _run_cycle(spark, sf_dir):
    """init(golden batch 1, ts=100) → apply(golden batch 2, ts=200);
    returns the bi-temporal dimension DataFrame."""
    base = _base(spark, sf_dir)
    g1 = _golden(spark, base.unionByName(_dirty(base)))
    new_rec = spark.sql(
        "SELECT CAST(2000000 AS BIGINT) AS rec_id, 'zz:NEW' AS block,"
        " 'brand new entity' AS name, CAST(123456 AS BIGINT) AS bal_c"
    )
    b2 = _bumped(base)
    g2 = _golden(
        spark,
        b2.unionByName(_dirty(b2)).unionByName(
            new_rec.select("rec_id", "block", "name", "bal_c")
        ),
    )
    tag = hashlib.md5(("escd2" + sf_dir).encode()).hexdigest()[:12]
    path = os.path.join(tempfile.gettempdir(), f"minisql_escd2_{tag}")
    shutil.rmtree(path, ignore_errors=True)
    try:
        scd2_init(g1, path, "entity", ts=100)
        scd2_apply(spark, path, g2, "entity", ts=200)
        return read_snapshot(spark, path).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(path, ignore_errors=True)


def _oracle_sql() -> str:
    apply_sql = scd2_apply_sql(
        "base", "updates", "entity", _ATTRS, ts=200
    )
    return (
        "WITH base AS (SELECT g.*,"
        " CAST(100 AS BIGINT) AS valid_from,"
        " CAST(NULL AS BIGINT) AS valid_to, TRUE AS is_current"
        f" FROM ({_golden_sql(_STAGE1_SQL)}) g),"
        f" updates AS ({_golden_sql(_STAGE2_SQL)})"
        f" SELECT * FROM ({apply_sql})"
    )


def test_entity_scd2_oracle_parity(spark, duck, sf_dir):
    """The full chain — both batches' staging, linkage, rollup, and
    the apply — replays exactly in DuckDB."""
    out = _run_cycle(spark, sf_dir)
    assert_matches_oracle(
        out, duck.execute(_oracle_sql()).df(), "entity_scd2"
    )


def test_entity_scd2_entity_level_history(spark, sf_dir):
    """The MDM invariants: one business event (two raw-row changes)
    becomes ONE entity-history event (closed [100,200) + open
    [200,)), untouched entities stay single open rows (idempotent
    apply), the new record opens a new entity at 200, and no raw
    duplicate id (>= 1e6, < 2e6) ever keys the dimension."""
    dim = _run_cycle(spark, sf_dir).toPandas()
    # dimension keys are resolved entity ids = min member id — never
    # a staged duplicate's offset id
    assert (dim[dim.entity != 2_000_000].entity < 1_000_000).all()
    # changed entities: source key % 21 == 0 (the bump), each with
    # its dirty copy intact (n_members stays 2 — linkage stable
    # because the equality field moved consistently)
    changed = dim[dim.entity % 21 == 0]
    closed = changed[~changed.is_current]
    opened = changed[changed.is_current]
    assert len(closed) > 0 and len(closed) == len(opened)
    assert (closed.valid_from == 100).all()
    assert (closed.valid_to == 200).all()
    assert (opened.valid_from == 200).all()
    # the bump propagated through max-survivorship: +100000 exactly
    merged = closed.merge(
        opened, on="entity", suffixes=("_old", "_new")
    )
    assert (merged.bal_c_new - merged.bal_c_old == 100_000).all()
    # untouched entities: one open row from 100, no history
    still = dim[
        (dim.entity % 21 != 0) & (dim.entity != 2_000_000)
    ]
    assert still.is_current.all()
    assert (still.valid_from == 100).all()
    # the brand-new record is a fresh singleton entity from 200
    new = dim[dim.entity == 2_000_000]
    assert len(new) == 1
    assert bool(new.is_current.iloc[0])
    assert int(new.valid_from.iloc[0]) == 200
    assert int(new.n_members.iloc[0]) == 1
