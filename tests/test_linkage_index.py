"""Incremental linkage index — the equivalence contract (labels ==
one-shot record_linkage over the union after ANY batch sequence),
the entity-merge cascade, admission rails, DuckDB oracle parity via
the one-shot twin, and downstream composition (entity_rollup plugs
into the index surface unchanged)."""

from __future__ import annotations

import hashlib
import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from minisql_engine_spark.operators.linkage import (
    record_linkage,
    record_linkage_sql,
)
from minisql_engine_spark.operators.linkage_index import (
    admit_linkage_batch,
    init_linkage_index,
    linkage_index_entities,
)
from minisql_engine_spark.sources.parquet_catalog import load_table
from tests.conftest import assert_matches_oracle

_KW = dict(
    exact_weights={"bal_c": 2},
    name_weight=3,
    max_name_dist=2,
    threshold=5,
)


def _tmp(tag: str) -> str:
    h = hashlib.md5(tag.encode()).hexdigest()[:12]
    return os.path.join(tempfile.gettempdir(), f"minisql_lidx_{h}")


def _base(spark, sf_dir):
    return load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").cast("long").alias("rec_id"),
        F.concat_ws(
            ":", F.col("c_nationkey"), F.col("c_mktsegment")
        ).alias("block"),
        F.lower(F.col("c_name")).alias("name"),
        F.round(F.col("c_acctbal") * 100).cast("long").alias("bal_c"),
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


def _entities_pdf(df):
    return (
        df.select("rec_id", "entity", "is_canonical", "n_members")
        .toPandas()
        .sort_values("rec_id")
        .reset_index(drop=True)
    )


def test_incremental_equals_oneshot(spark, duck, sf_dir):
    """Init with the clean corpus, admit the dirty copies as batch 1
    — after EACH step the index labels equal one-shot linkage over
    the union, and the final state matches the DuckDB one-shot twin
    (the equivalence contract makes the one-shot oracle the
    incremental oracle)."""
    base = _base(spark, sf_dir)
    dirty = _dirty(base)
    path = _tmp("equiv" + sf_dir)
    shutil.rmtree(path, ignore_errors=True)
    try:
        init_linkage_index(base, path, **_KW)
        got0 = _entities_pdf(linkage_index_entities(spark, path))
        want0 = _entities_pdf(record_linkage(base, **_KW))
        assert got0.equals(want0)

        admit_linkage_batch(spark, path, dirty, 1, **_KW)
        got1 = linkage_index_entities(spark, path)
        want1 = _entities_pdf(
            record_linkage(base.unionByName(dirty), **_KW)
        )
        assert _entities_pdf(got1).equals(want1)
        # planted pairs resolved: two-member entities exist
        assert (want1.n_members == 2).any()

        staging = (
            "SELECT CAST(c_custkey AS BIGINT) AS rec_id,"
            " concat(CAST(c_nationkey AS VARCHAR), ':', c_mktsegment)"
            "  AS block, lower(c_name) AS name,"
            " CAST(round(c_acctbal * 100) AS BIGINT) AS bal_c"
            " FROM customer UNION ALL"
            " SELECT CAST(c_custkey + 1000000 AS BIGINT),"
            " concat(CAST(c_nationkey AS VARCHAR), ':', c_mktsegment),"
            " concat(substring(lower(c_name), 1,"
            "  length(c_name) - 1), 'x'),"
            " CAST(round(c_acctbal * 100) AS BIGINT)"
            " FROM customer WHERE c_custkey % 7 = 0"
        )
        assert_matches_oracle(
            got1.select(
                "rec_id", "entity", "is_canonical", "n_members"
            ),
            duck.execute(
                record_linkage_sql(staging, **_KW)
            ).df(),
            "linkage_index",
        )
    finally:
        shutil.rmtree(path, ignore_errors=True)


def _mk(spark, rows):
    return spark.createDataFrame(
        rows, "rec_id long, block string, name string, bal_c long"
    )


def test_merge_cascade(spark):
    """A later record bridging two existing entities MERGES them to
    the component minimum: A='abcdef' and B='abxyzf' never match
    (lev 3, equal bal only = 2 < 5), but C='abcyzf' is within lev 2
    of both — admitting C relabels B's entity 2 -> 1."""
    path = _tmp("cascade")
    shutil.rmtree(path, ignore_errors=True)
    try:
        init_linkage_index(
            _mk(spark, [(1, "blk", "abcdef", 50),
                        (2, "blk", "abxyzf", 50)]),
            path,
            **_KW,
        )
        before = _entities_pdf(linkage_index_entities(spark, path))
        assert sorted(before.entity) == [1, 2]

        admit_linkage_batch(
            spark, path, _mk(spark, [(3, "blk", "abcyzf", 50)]),
            1, **_KW,
        )
        after = _entities_pdf(linkage_index_entities(spark, path))
        assert list(after.entity) == [1, 1, 1]
        assert list(after.n_members) == [3, 3, 3]
        assert list(after.is_canonical) == [True, False, False]
        # still equal to the one-shot over the union
        want = _entities_pdf(
            record_linkage(
                _mk(spark, [(1, "blk", "abcdef", 50),
                            (2, "blk", "abxyzf", 50),
                            (3, "blk", "abcyzf", 50)]),
                **_KW,
            )
        )
        assert after.equals(want)
    finally:
        shutil.rmtree(path, ignore_errors=True)


def test_blocking_still_bounds(spark):
    """A would-match pair in DIFFERENT blocks never links through
    the index either — the blocked-candidates contract survives
    incrementality."""
    path = _tmp("blocks")
    shutil.rmtree(path, ignore_errors=True)
    try:
        init_linkage_index(
            _mk(spark, [(1, "b1", "same name", 50)]), path, **_KW
        )
        admit_linkage_batch(
            spark, path, _mk(spark, [(2, "b2", "same name", 50)]),
            1, **_KW,
        )
        got = _entities_pdf(linkage_index_entities(spark, path))
        assert sorted(got.entity) == [1, 2]
    finally:
        shutil.rmtree(path, ignore_errors=True)


def test_admission_rails(spark):
    path = _tmp("rails")
    shutil.rmtree(path, ignore_errors=True)
    try:
        init_linkage_index(
            _mk(spark, [(1, "blk", "abcdef", 50)]), path, **_KW
        )
        with pytest.raises(ValueError, match="already in the index"):
            admit_linkage_batch(
                spark, path,
                _mk(spark, [(1, "blk", "abcdef", 50)]), 1, **_KW,
            )
        with pytest.raises(ValueError, match="duplicate"):
            admit_linkage_batch(
                spark, path,
                _mk(spark, [(9, "blk", "x", 1), (9, "blk", "y", 2)]),
                1, **_KW,
            )
    finally:
        shutil.rmtree(path, ignore_errors=True)


def test_committed_batch_dir_clobber_rail(spark):
    """A colliding batch NUMBER with fresh ids (checkpoint reset /
    shared batch_base) must be REFUSED, not silently overwrite the
    committed records/batch=1 dir — its records would vanish from
    the store while their labels persist. An ORPHAN dir (written,
    labels never committed) stays overwritable: an identical replay
    must succeed. Pins ADVICE r12 (ingest.py:539)."""
    path = _tmp("clobber")
    shutil.rmtree(path, ignore_errors=True)
    try:
        init_linkage_index(
            _mk(spark, [(1, "blk", "abcdef", 50)]), path, **_KW
        )
        admit_linkage_batch(
            spark, path, _mk(spark, [(2, "blk", "qqqqqq", 7)]),
            1, **_KW,
        )
        with pytest.raises(ValueError, match="already committed"):
            admit_linkage_batch(
                spark, path,
                _mk(spark, [(3, "blk", "rrrrrr", 8)]), 1, **_KW,
            )
        # committed state intact: both admitted ids still resolve
        got = sorted(
            r["rec_id"]
            for r in linkage_index_entities(spark, path).collect()
        )
        assert got == [1, 2]
        # orphan simulation: a records dir whose ids never reached
        # the label snapshot is invisible to the rail and may be
        # overwritten by the crash replay
        orphan = _mk(spark, [(4, "blk", "ssssss", 9)])
        orphan.write.mode("overwrite").parquet(
            os.path.join(path, "records", "batch=2")
        )
        admit_linkage_batch(spark, path, orphan, 2, **_KW)
        got = sorted(
            r["rec_id"]
            for r in linkage_index_entities(spark, path).collect()
        )
        assert got == [1, 2, 4]
        # crash-mid-write simulation: a batch dir holding NO durable
        # part file (only _SUCCESS / _temporary debris) must read as
        # UNCOMMITTED — the rail may not raise 'Unable to infer
        # schema' on the exact crashed-admission replay the orphan
        # carve-out exists for (ADVICE r13, linkage_index.py:156)
        crashed = os.path.join(path, "records", "batch=3")
        os.makedirs(os.path.join(crashed, "_temporary"), exist_ok=True)
        open(os.path.join(crashed, "_SUCCESS"), "w").close()
        admit_linkage_batch(
            spark, path, _mk(spark, [(5, "blk", "tttttt", 11)]),
            3, **_KW,
        )
        got = sorted(
            r["rec_id"]
            for r in linkage_index_entities(spark, path).collect()
        )
        assert got == [1, 2, 4, 5]
    finally:
        shutil.rmtree(path, ignore_errors=True)


def test_rollup_composes_with_index(spark):
    """entity_rollup consumes linkage_index_entities unchanged —
    the incremental index slots into the MDM chain."""
    from minisql_engine_spark.operators.linkage import entity_rollup

    path = _tmp("compose")
    shutil.rmtree(path, ignore_errors=True)
    try:
        recs0 = _mk(spark, [(1, "blk", "abcdef", 50),
                            (5, "blk", "zzzzzz", 10)])
        recs1 = _mk(spark, [(3, "blk", "abcdez", 50)])
        init_linkage_index(recs0, path, **_KW)
        admit_linkage_batch(spark, path, recs1, 1, **_KW)
        golden = entity_rollup(
            recs0.unionByName(recs1),
            linkage_index_entities(spark, path),
            first_cols=("name", "block"),
            max_cols=("bal_c",),
        ).toPandas().sort_values("entity").reset_index(drop=True)
        assert list(golden.entity) == [1, 5]
        assert list(golden.n_members) == [2, 1]
        assert golden.name.iloc[0] == "abcdef"  # canonical min-id
    finally:
        shutil.rmtree(path, ignore_errors=True)


def test_stream_admit_linkage(spark, tmp_path):
    """Streaming MDM: file-per-trigger micro-batches resolve against
    the index; the final labels equal one-shot record_linkage over
    everything admitted (the equivalence contract, now across
    micro-batch boundaries), a mid-stream bridge merges existing
    entities, and a fresh-checkpoint replay admits nothing."""
    import os

    from minisql_engine_spark.streaming.ingest import (
        stream_admit_linkage,
    )

    seed = _mk(spark, [(1, "blk", "abcdef", 50),
                       (2, "blk", "abxyzf", 50)])
    b1 = _mk(spark, [(10, "blk", "abcdeg", 50)])   # links to 1
    b2 = _mk(spark, [(20, "blk", "abcyzf", 50)])   # bridges 1 and 2
    drop = str(tmp_path / "drop")
    for part in [b1, b2]:
        part.coalesce(1).write.mode("append").parquet(drop)
    path = str(tmp_path / "lidx")
    init_linkage_index(seed, path, **_KW)

    schema = spark.read.parquet(drop).schema
    q = stream_admit_linkage(
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(drop),
        path,
        str(tmp_path / "ckpt"),
        **_KW,
    )
    q.awaitTermination(120)

    got = _entities_pdf(linkage_index_entities(spark, path))
    want = _entities_pdf(
        record_linkage(
            seed.unionByName(b1).unionByName(b2), **_KW
        )
    )
    assert got.equals(want)
    assert set(got.entity) == {1}  # the bridge merged everything

    # fresh-checkpoint replay: at-least-once delivery, idempotent
    # admission — labels unchanged, no new records dirs
    dirs_before = sorted(os.listdir(os.path.join(path, "records")))
    q2 = stream_admit_linkage(
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(drop),
        path,
        str(tmp_path / "ckpt2"),
        **_KW,
    )
    q2.awaitTermination(120)
    got2 = _entities_pdf(linkage_index_entities(spark, path))
    assert got2.equals(want)
    assert sorted(
        os.listdir(os.path.join(path, "records"))
    ) == dirs_before


def test_bucketed_layout_identity(spark, sf_dir, tmp_path):
    """The bucketed-catalog layout produces EXACTLY the directory
    layout's labels across an init + two-admission sequence (and so,
    by the equivalence contract, the one-shot resolution)."""
    from minisql_engine_spark.operators.linkage_index import (
        admit_linkage_batch_bucketed,
        init_linkage_index_bucketed,
    )
    from minisql_engine_spark.sources.bucketing import drop_bucketed

    base = _base(spark, sf_dir)
    b1 = _dirty(base)
    b2 = base.filter(F.col("rec_id") % 11 == 0).select(
        (F.col("rec_id") + 3_000_000).alias("rec_id"),
        "block",
        F.concat(F.lit("zz "), F.col("name")).alias("name"),
        "bal_c",
    )
    dir_path = str(tmp_path / "lidx_dir")
    lbl_path = str(tmp_path / "lidx_lbl")
    tbl = "linkage_idx_bucketed_test"
    drop_bucketed(spark, tbl)
    init_linkage_index(base, dir_path, **_KW)
    init_linkage_index_bucketed(base, tbl, lbl_path, **_KW)
    try:
        for i, batch in enumerate([b1, b2], start=1):
            admit_linkage_batch(spark, dir_path, batch, i, **_KW)
            admit_linkage_batch_bucketed(
                spark, tbl, lbl_path, batch, **_KW
            )
        got_dir = _entities_pdf(
            linkage_index_entities(spark, dir_path)
        )
        got_tbl = _entities_pdf(
            linkage_index_entities(spark, lbl_path)
        )
        assert got_tbl.equals(got_dir)
        want = _entities_pdf(
            record_linkage(
                base.unionByName(b1).unionByName(b2), **_KW
            )
        )
        assert got_tbl.equals(want)
    finally:
        drop_bucketed(spark, tbl)


def test_bucketed_admission_zero_exchange_on_index_side(
    spark, sf_dir, tmp_path
):
    """With broadcast disabled, the batch×index block join (the
    cross_raw construction _resolve_against builds) reads the
    bucketed record store with NO Exchange above it: the scan
    reports Bucketed: true, the SortMergeJoin's index side is
    satisfied by the table's bucketing, and the single Exchange in
    the tree is the batch hashing into the index's buckets."""
    from minisql_engine_spark.operators.linkage import (
        _weighted_edges,
    )
    from minisql_engine_spark.operators.linkage_index import (
        _match_cols,
        init_linkage_index_bucketed,
    )
    from minisql_engine_spark.sources.bucketing import drop_bucketed
    from tests.test_plans import plan_of

    base = _base(spark, sf_dir)
    tbl = "linkage_idx_bucketed_plan"
    lbl_path = str(tmp_path / "lbl")
    drop_bucketed(spark, tbl)
    init_linkage_index_bucketed(base, tbl, lbl_path, **_KW)
    bpath = str(tmp_path / "batch")
    _dirty(base).write.parquet(bpath)
    batch = spark.read.parquet(bpath)
    cols = _match_cols("rec_id", "block", "name", {"bal_c": 2})
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        a = batch.select(*[F.col(c).alias(f"a_{c}") for c in cols])
        b = spark.table(tbl).select(
            *[F.col(c).alias(f"b_{c}") for c in cols]
        )
        cross_raw = _weighted_edges(
            a.join(b, F.col("a_block") == F.col("b_block")),
            id_col="rec_id",
            name_col="name",
            exact_weights={"bal_c": 2},
            name_weight=3,
            max_name_dist=2,
            threshold=5,
        )
        plan = plan_of(cross_raw)
        assert "SortMergeJoin" in plan, plan
        assert "Bucketed: true" in plan, plan
        assert plan.count("- Exchange") == 1, plan
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold",
            str(64 * 1024 * 1024),
        )
        drop_bucketed(spark, tbl)


def test_compaction_preserves_decisions_and_contract(spark, sf_dir):
    """compact_linkage_index consolidates the batch dirs to one
    reserved batch=-1 dir and compacts the label snapshot, changing
    NOTHING observable: the entities surface is identical, a
    POST-compaction admission still satisfies the one-shot
    equivalence contract, and the records file count drops."""
    from minisql_engine_spark.operators.linkage_index import (
        compact_linkage_index,
    )

    base = _base(spark, sf_dir)
    d1 = _dirty(base)
    d2 = base.filter(F.col("rec_id") % 11 == 0).select(
        (F.col("rec_id") + 2_000_000).alias("rec_id"),
        "block",
        F.expr(
            "concat(substring(name, 1, length(name) - 1), 'z')"
        ).alias("name"),
        "bal_c",
    )
    path = _tmp("compact")
    shutil.rmtree(path, ignore_errors=True)
    try:
        init_linkage_index(base, path, **_KW)
        admit_linkage_batch(spark, path, d1, 1, **_KW)
        before_pdf = _entities_pdf(linkage_index_entities(spark, path))
        nb, na, ver = compact_linkage_index(spark, path)
        assert na < nb
        assert sorted(
            os.listdir(os.path.join(path, "records"))
        ) == ["batch=-1"]
        after_pdf = _entities_pdf(linkage_index_entities(spark, path))
        assert before_pdf.equals(after_pdf)
        # post-compaction admission: equivalence contract holds
        admit_linkage_batch(spark, path, d2, 2, **_KW)
        got = _entities_pdf(linkage_index_entities(spark, path))
        want = _entities_pdf(
            record_linkage(
                base.unionByName(d1).unionByName(d2), **_KW
            )
        )
        assert got.equals(want)
    finally:
        shutil.rmtree(path, ignore_errors=True)


def test_compaction_rails(spark, sf_dir):
    """Single-writer lock fails fast; a mutation between the staging
    read and the swap aborts with the live store untouched; negative
    batch numbers are refused at admission (reserved for the
    compacted dir)."""
    from minisql_engine_spark.operators.linkage_index import (
        compact_linkage_index,
    )

    base = _base(spark, sf_dir).limit(50)
    path = _tmp("cprail")
    shutil.rmtree(path, ignore_errors=True)
    try:
        init_linkage_index(base, path, **_KW)
        with pytest.raises(ValueError, match="batch_no"):
            admit_linkage_batch(
                spark, path, _dirty(base).limit(1), -1, **_KW
            )
        records = os.path.join(path, "records")
        lock = records + ".compact.lock"
        open(lock, "w").close()
        with pytest.raises(RuntimeError, match="single-writer"):
            compact_linkage_index(spark, path)
        os.unlink(lock)
        # concurrent-admission abort: append a file after the staging
        # read via a monkeypatched reader (the semdedup rail pattern)
        import pyspark.sql.readwriter as rw

        real = rw.DataFrameReader.parquet
        state = {"fired": False}

        def evil(reader, *paths, **kw):
            if not state["fired"] and paths and paths[0] == records:
                state["fired"] = True
                df = real(reader, *paths, **kw)
                _dirty(base).limit(1).write.mode("overwrite").parquet(
                    os.path.join(records, "batch=7")
                )
                return df
            return real(reader, *paths, **kw)

        rw.DataFrameReader.parquet = evil
        try:
            with pytest.raises(RuntimeError, match="changed during"):
                compact_linkage_index(spark, path)
        finally:
            rw.DataFrameReader.parquet = real
        assert not os.path.exists(records + ".compact")
        assert not os.path.exists(lock)
        # the concurrently-written batch dir survived the abort
        assert os.path.exists(os.path.join(records, "batch=7"))
    finally:
        shutil.rmtree(path, ignore_errors=True)
