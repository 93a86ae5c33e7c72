"""Record linkage — oracle parity on the staged dirty corpus,
planted-pair recovery, agreement-weight gating, transitivity, and
parameter rails."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from minisql_engine_spark.operators.linkage import (
    record_linkage,
    record_linkage_sql,
)
from minisql_engine_spark.sources.parquet_catalog import load_table
from tests.conftest import assert_matches_oracle

_STAGING_SQL = (
    "SELECT CAST(c_custkey AS BIGINT) AS rec_id,"
    " concat(CAST(c_nationkey AS VARCHAR), ':', c_mktsegment) AS block,"
    " lower(c_name) AS name, c_acctbal AS bal FROM customer"
    " UNION ALL"
    " SELECT CAST(c_custkey + 1000000 AS BIGINT),"
    " concat(CAST(c_nationkey AS VARCHAR), ':', c_mktsegment),"
    " concat(substring(lower(c_name), 1, length(c_name) - 1), 'x'),"
    " c_acctbal"
    " FROM customer WHERE c_custkey % 7 = 0"
)


def _staged(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    base = cust.select(
        F.col("c_custkey").cast("long").alias("rec_id"),
        F.concat_ws(
            ":", F.col("c_nationkey"), F.col("c_mktsegment")
        ).alias("block"),
        F.lower(F.col("c_name")).alias("name"),
        F.col("c_acctbal").alias("bal"),
    )
    dirty = base.filter(F.col("rec_id") % 7 == 0).select(
        (F.col("rec_id") + 1_000_000).alias("rec_id"),
        "block",
        F.expr(
            "concat(substring(name, 1, length(name) - 1), 'x')"
        ).alias("name"),
        "bal",
    )
    return base.unionByName(dirty)


def test_linkage_oracle_staged_corpus(spark, duck, sf_dir):
    out = record_linkage(
        _staged(spark, sf_dir), exact_weights={"bal": 2}
    )
    assert_matches_oracle(
        out,
        duck.execute(
            record_linkage_sql(_STAGING_SQL, exact_weights={"bal": 2})
        ).df(),
        "linkage",
    )


def test_linkage_planted_pairs_recovered_exactly(spark, sf_dir):
    """Every planted copy resolves to its source entity (recall 1.0)
    and nothing else links (precision 1.0 on this staging — the
    balance-agreement gate kills the near-name-only pairs TPC-H's
    sequential names produce)."""
    out = record_linkage(
        _staged(spark, sf_dir), exact_weights={"bal": 2}
    ).toPandas()
    planted = out[out.rec_id >= 1_000_000]
    assert (planted.entity == planted.rec_id - 1_000_000).all()
    assert (~planted.is_canonical).all()
    multi = out[out.n_members > 1]
    assert len(multi) == 2 * len(planted)
    singles = out[out.n_members == 1]
    assert (singles.entity == singles.rec_id).all()
    assert singles.is_canonical.all()


def test_linkage_weight_gate_and_transitivity(spark, duck):
    """Hand-built block: a-b match by name+bal, b-c match by name+bal,
    a-c name too far — transitivity still puts all three in one
    entity; d shares the name rule only (weight 3 < 5) and stays
    out."""
    rows = [
        (1, "blk", "acme corp", 10.0),
        (2, "blk", "acme c0rp", 10.0),   # lev 1 to a, bal equal
        (3, "blk", "acme c0rpx", 10.0),  # lev 1 to b, lev 2 to a
        (4, "blk", "acme corps", 99.0),  # lev 1 to a, bal differs
    ]
    df = spark.createDataFrame(
        rows, "rec_id long, block string, name string, bal double"
    )
    got = {
        r["rec_id"]: (r["entity"], r["n_members"])
        for r in record_linkage(
            df, exact_weights={"bal": 2}
        ).collect()
    }
    assert got[1] == (1, 3) and got[2] == (1, 3) and got[3] == (1, 3)
    assert got[4] == (4, 1)
    # oracle agrees on the same crafted block
    import pandas as pd

    duck.register(
        "_lk_crafted",
        pd.DataFrame(rows, columns=["rec_id", "block", "name", "bal"]),
    )
    assert_matches_oracle(
        record_linkage(df, exact_weights={"bal": 2}),
        duck.execute(
            record_linkage_sql(
                "SELECT * FROM _lk_crafted", exact_weights={"bal": 2}
            )
        ).df(),
        "linkage_crafted",
    )


def test_linkage_blocking_is_hard_boundary(spark):
    """Identical records in different blocks never pair — blocking is
    the scale contract, recall across keys comes from composing
    passes, not widening one."""
    rows = [
        (1, "b1", "same name", 5.0),
        (2, "b2", "same name", 5.0),
    ]
    df = spark.createDataFrame(
        rows, "rec_id long, block string, name string, bal double"
    )
    out = record_linkage(df, exact_weights={"bal": 2}).toPandas()
    assert (out.n_members == 1).all()


def test_linkage_rejects_bad_params():
    with pytest.raises(ValueError, match="threshold"):
        record_linkage_sql("SELECT 1", threshold=0)
    with pytest.raises(ValueError, match="weights must be >= 0"):
        record_linkage_sql("SELECT 1", exact_weights={"x": -1})


def test_entity_rollup_survivorship(spark, duck, sf_dir):
    """Golden records from the staged dirty corpus: one row per
    entity, first-rule fields from the canonical member, max-rule
    fields from the entity max — oracle-exact."""
    from minisql_engine_spark.operators.linkage import (
        entity_rollup,
        entity_rollup_sql,
    )

    staged = _staged(spark, sf_dir)
    resolved = record_linkage(staged, exact_weights={"bal": 2})
    out = entity_rollup(
        staged,
        resolved,
        first_cols=("name", "block"),
        max_cols=("bal",),
    )
    sql = entity_rollup_sql(
        _STAGING_SQL,
        record_linkage_sql(_STAGING_SQL, exact_weights={"bal": 2}),
        first_cols=("name", "block"),
        max_cols=("bal",),
    )
    assert_matches_oracle(out, duck.execute(sql).df(), "rollup")
    got = out.toPandas()
    # one golden row per entity; planted entities keep the SOURCE
    # (min-id, un-typo'd) name under the first rule
    assert got.entity.is_unique
    two = got[got.n_members == 2]
    assert len(two) > 0
    assert (~two.name.str.endswith("x")).all()


def test_entity_rollup_recency_wins(spark, duck):
    """With a recency column the most-recent member's first-rule
    values win (ties -> min id), while max-rule fields stay the
    entity max — pinned on a hand-built entity."""
    from minisql_engine_spark.operators.linkage import (
        entity_rollup,
        entity_rollup_sql,
    )
    import pandas as pd

    recs = [
        (1, "blk", "old name", 10.0, 100),
        (2, "blk", "old n4me", 30.0, 300),
        (3, "blk", "old nam3", 20.0, 300),  # recency tie with 2
    ]
    res = [(1, 1), (2, 1), (3, 1)]
    rdf = spark.createDataFrame(
        recs, "rec_id long, block string, name string,"
        " bal double, seen long"
    )
    sdf = spark.createDataFrame(res, "rec_id long, entity long")
    out = entity_rollup(
        rdf,
        sdf,
        recency_col="seen",
        first_cols=("name",),
        max_cols=("bal",),
    ).toPandas()
    # recency 300 tie between ids 2 and 3 -> min id 2 wins firsts;
    # bal is the entity max (30.0 happens to be id 2's)
    assert out.iloc[0].to_dict() == {
        "entity": 1,
        "n_members": 3,
        "name": "old n4me",
        "bal": 30.0,
    }
    duck.register(
        "_ro_recs",
        pd.DataFrame(
            recs, columns=["rec_id", "block", "name", "bal", "seen"]
        ),
    )
    duck.register(
        "_ro_res", pd.DataFrame(res, columns=["rec_id", "entity"])
    )
    sql = entity_rollup_sql(
        "SELECT * FROM _ro_recs",
        "SELECT * FROM _ro_res",
        recency_col="seen",
        first_cols=("name",),
        max_cols=("bal",),
    )
    assert_matches_oracle(
        entity_rollup(
            rdf, sdf, recency_col="seen",
            first_cols=("name",), max_cols=("bal",),
        ),
        duck.execute(sql).df(),
        "rollup_recency",
    )
