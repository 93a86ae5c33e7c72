"""Snapshot tables: version isolation, time travel, MERGE/DELETE."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from minisql_engine_spark.sources import load_table
from minisql_engine_spark.sources.snapshots import (
    current_version,
    delete_from_snapshot,
    list_versions,
    merge_snapshot,
    read_snapshot,
    vacuum_snapshots,
    write_snapshot,
)


@pytest.fixture()
def base(spark, sf_dir, tmp_path):
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text", "source")
        .filter(F.col("doc_id") < 200)
    )
    path = str(tmp_path / "tbl")
    v = write_snapshot(docs, path)
    assert v == 1
    return docs, path


def test_versions_and_time_travel(spark, base, tmp_path):
    docs, path = base
    v2 = write_snapshot(docs.filter(F.col("doc_id") < 50), path)
    assert v2 == 2
    assert list_versions(path) == [1, 2]
    assert read_snapshot(spark, path).count() == 50  # latest
    assert read_snapshot(spark, path, version=1).count() == docs.count()
    with pytest.raises(FileNotFoundError):
        read_snapshot(spark, path, version=9)


def test_merge_upsert_semantics(spark, base):
    docs, path = base
    n0 = docs.count()
    updates = spark.createDataFrame(
        [
            (5, "REPLACED BODY", "web"),     # update existing key
            (100001, "BRAND NEW DOC", "web"),  # insert
        ],
        "doc_id bigint, text string, source string",
    )
    v = merge_snapshot(spark, path, updates, ["doc_id"])
    assert v == 2
    cur = read_snapshot(spark, path)
    assert cur.count() == n0 + 1
    assert (
        cur.filter(F.col("doc_id") == 5).first()["text"] == "REPLACED BODY"
    )
    assert cur.filter(F.col("doc_id") == 100001).count() == 1
    # version 1 untouched (snapshot isolation / time travel)
    old = read_snapshot(spark, path, version=1)
    assert old.filter(F.col("doc_id") == 5).first()["text"] != "REPLACED BODY"
    assert old.count() == n0


def test_merge_schema_mismatch_rejected(spark, base):
    _, path = base
    bad = spark.createDataFrame([(1, "x")], "doc_id bigint, text string")
    with pytest.raises(ValueError):
        merge_snapshot(spark, path, bad, ["doc_id"])


def test_delete_where(spark, base):
    docs, path = base
    n0 = docs.count()
    n_web = docs.filter(F.col("source") == "web").count()
    v = delete_from_snapshot(spark, path, "source = 'web'")
    assert v == 2
    cur = read_snapshot(spark, path)
    assert cur.count() == n0 - n_web
    assert cur.filter(F.col("source") == "web").count() == 0
    assert read_snapshot(spark, path, version=1).count() == n0


def test_merge_plan_broadcasts_update_keys(spark, base):
    """The base (big side) must not shuffle: the update-key anti join
    builds a broadcast from the keys."""
    from tests.test_plans import plan_of

    docs, path = base
    updates = spark.createDataFrame(
        [(5, "x", "web")], "doc_id bigint, text string, source string"
    )
    keys = updates.select("doc_id").distinct()
    base_df = read_snapshot(spark, path)
    merged = base_df.join(
        F.broadcast(keys), ["doc_id"], "left_anti"
    ).unionByName(updates)
    plan = plan_of(merged)
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_vacuum_removes_old_versions_only(spark, base):
    docs, path = base
    write_snapshot(docs.filter(F.col("doc_id") < 50), path)
    write_snapshot(docs.filter(F.col("doc_id") < 10), path)
    removed = vacuum_snapshots(path, keep_last=2)
    assert removed == [1]
    assert list_versions(path) == [2, 3]
    assert read_snapshot(spark, path, version=2).count() == 50
    assert read_snapshot(spark, path).count() == 10
    with pytest.raises(FileNotFoundError):
        read_snapshot(spark, path, version=1)
    with pytest.raises(ValueError):
        vacuum_snapshots(path, keep_last=0)


def test_append_and_compact(spark, base):
    """Appends add a dir per batch without rewriting existing bytes;
    compaction rewrites into one content-identical dir."""
    import glob
    import os

    from minisql_engine_spark.sources.snapshots import (
        append_snapshot,
        compact_snapshot,
    )

    docs, path = base
    more = docs.select(
        (F.col("doc_id") + 10_000).alias("doc_id"), "text", "source"
    )
    v1_files = set(glob.glob(os.path.join(path, "data", "*", "*.parquet")))
    v2 = append_snapshot(more.filter(F.col("doc_id") < 10_050), path)
    v3 = append_snapshot(
        more.filter(
            (F.col("doc_id") >= 10_050) & (F.col("doc_id") < 10_100)
        ),
        path,
    )
    assert (v2, v3) == (2, 3)
    # append never rewrote a pre-existing file
    assert v1_files <= set(
        glob.glob(os.path.join(path, "data", "*", "*.parquet"))
    )
    n = read_snapshot(spark, path).count()
    assert n == docs.count() + 100
    # time travel still sees the pre-append content
    assert read_snapshot(spark, path, version=1).count() == docs.count()

    before = len(glob.glob(os.path.join(path, "data", "*", "*.parquet")))
    v4 = compact_snapshot(spark, path)
    ids_before = sorted(
        r["doc_id"]
        for r in read_snapshot(spark, path, version=3).collect()
    )
    ids_after = sorted(
        r["doc_id"] for r in read_snapshot(spark, path).collect()
    )
    assert ids_after == ids_before  # content-identical
    with open(
        os.path.join(path, "_versions", f"v{v4}.json")
    ) as f:
        import json

        man = json.load(f)
    assert len(man["data_dirs"]) == 1
    after = len(
        glob.glob(os.path.join(man["data_dirs"][0], "*.parquet"))
    )
    assert after < before  # small files actually packed


def test_schema_evolution_defaults_and_time_travel(spark, base):
    from minisql_engine_spark.sources.snapshots import (
        add_snapshot_column,
        append_snapshot,
    )

    docs, path = base
    v2 = add_snapshot_column(path, "quality", "double", default=0.5)
    assert v2 == 2
    cur = read_snapshot(spark, path)
    assert "quality" in cur.columns
    assert cur.filter(F.col("quality") != 0.5).count() == 0
    # pre-evolution version keeps the old schema
    assert "quality" not in read_snapshot(spark, path, version=1).columns

    # appends must supply the evolved column explicitly...
    more = docs.select(
        (F.col("doc_id") + 20_000).alias("doc_id"), "text", "source"
    ).limit(10)
    with pytest.raises(ValueError, match="evolved column"):
        append_snapshot(more, path)
    # ...and real values coexist with defaults for old files
    append_snapshot(more.withColumn("quality", F.lit(0.9)), path)
    got = read_snapshot(spark, path)
    assert got.filter(F.col("quality") == 0.9).count() == 10
    assert got.filter(F.col("quality") == 0.5).count() == docs.count()
    # a MERGE materializes the column physically and clears the patch
    upd = got.limit(5).withColumn("quality", F.lit(1.0))
    merge_snapshot(spark, path, upd, ["doc_id"])
    assert read_snapshot(spark, path).filter(
        F.col("quality") == 1.0
    ).count() == 5


def test_evolution_then_vacuum_gc(spark, base):
    """Compaction + vacuum reclaims appended small dirs."""
    import glob
    import os

    from minisql_engine_spark.sources.snapshots import (
        append_snapshot,
        compact_snapshot,
    )

    docs, path = base
    append_snapshot(docs.limit(10).select(
        (F.col("doc_id") + 30_000).alias("doc_id"), "text", "source"
    ), path)
    compact_snapshot(spark, path)
    removed = vacuum_snapshots(path, keep_last=1)
    assert removed == [1, 2]
    dirs = glob.glob(os.path.join(path, "data", "*"))
    assert len(dirs) == 1  # only the compacted dir survives
    assert read_snapshot(spark, path).count() == docs.count() + 10


def test_merge_pruned_rewrites_only_overlapping_files(spark, base):
    """Footer-stats file pruning: updates hitting one key range leave
    every other file untouched on disk, carried by reference."""
    import json as _json
    import os

    from minisql_engine_spark.sources.snapshots import (
        append_snapshot,
        merge_snapshot_pruned,
    )

    docs, path = base
    # three more single-file batches with disjoint doc_id ranges
    for lo in (1000, 2000, 3000):
        append_snapshot(
            docs.limit(50)
            .select(
                (F.col("doc_id") + lo).alias("doc_id"), "text", "source"
            )
            .coalesce(1),
            path,
        )
    before = read_snapshot(spark, path)
    n_before = before.count()

    upd = (
        before.filter(
            (F.col("doc_id") >= 2000) & (F.col("doc_id") < 2010)
        )
        .withColumn("text", F.lit("PATCHED"))
    )
    v = merge_snapshot_pruned(spark, path, upd, "doc_id")

    with open(os.path.join(path, "_versions", f"v{v}.json")) as f:
        man = _json.load(f)
    carried = [e for e in man["data_dirs"] if os.path.isfile(e)]
    # the [0,200) seed file(s), 1000- and 3000-range files carry over
    # by reference; only the 2000-range file was rewritten
    assert len(carried) >= 3
    got = read_snapshot(spark, path)
    assert got.count() == n_before
    assert got.filter(F.col("text") == "PATCHED").count() == 10
    patched_ids = {r["doc_id"] for r in got.filter(F.col("text") == "PATCHED").collect()}
    assert patched_ids == {r["doc_id"] for r in upd.collect()}
    # untouched rows identical to before
    assert got.filter(
        (F.col("doc_id") >= 3000) & (F.col("text") == "PATCHED")
    ).count() == 0


def test_vacuum_protects_files_carried_by_reference(spark, base):
    """GC must not rmtree a dir whose files a pruned-merge manifest
    still references."""
    from minisql_engine_spark.sources.snapshots import (
        append_snapshot,
        merge_snapshot_pruned,
    )

    docs, path = base
    append_snapshot(
        docs.limit(20)
        .select((F.col("doc_id") + 5000).alias("doc_id"), "text", "source")
        .coalesce(1),
        path,
    )
    n = read_snapshot(spark, path).count()
    upd = read_snapshot(spark, path).filter(
        F.col("doc_id") >= 5000
    ).withColumn("text", F.lit("X"))
    merge_snapshot_pruned(spark, path, upd, "doc_id")
    vacuum_snapshots(path, keep_last=1)
    got = read_snapshot(spark, path)
    assert got.count() == n  # carried-by-reference files survived GC
    assert got.filter(F.col("text") == "X").count() == 20


def test_merge_pruned_refuses_pending_evolution(spark, base):
    from minisql_engine_spark.sources.snapshots import (
        add_snapshot_column,
        merge_snapshot_pruned,
    )

    docs, path = base
    add_snapshot_column(path, "q", "double", default=0.0)
    upd = read_snapshot(spark, path).limit(1)
    with pytest.raises(ValueError, match="compact_snapshot"):
        merge_snapshot_pruned(spark, path, upd, "doc_id")


def test_commit_constraints_gate(spark, base, tmp_path):
    """CHECK constraints: a violating commit leaves NO new version and
    no orphan data dir; NULL passes (SQL CHECK rule); appends gate
    only their new rows."""
    import glob
    import os

    from minisql_engine_spark.sources.snapshots import (
        ConstraintViolation,
        append_snapshot,
        write_snapshot,
    )

    docs, path = base
    rules = ["doc_id IS NOT NULL", "n_extra >= 0"]
    good = docs.limit(20).withColumn("n_extra", F.lit(1))
    bad = good.withColumn(
        "n_extra", F.when(F.col("doc_id") < 10, -5).otherwise(1)
    )
    p2 = str(tmp_path / "gated")
    write_snapshot(good, p2, constraints=rules)
    dirs_before = set(glob.glob(os.path.join(p2, "data", "*")))
    with pytest.raises(ConstraintViolation) as ei:
        append_snapshot(bad, p2, constraints=rules)
    assert ei.value.counts == {"n_extra >= 0": 10}
    assert current_version(p2) == 1  # no new version
    assert set(glob.glob(os.path.join(p2, "data", "*"))) == dirs_before
    # NULL passes the SQL CHECK rule
    nullish = good.withColumn(
        "n_extra", F.lit(None).cast("int")
    )
    assert append_snapshot(nullish, p2, constraints=rules) == 2


def test_sorted_layout_composes_with_pruned_merge(spark, base, tmp_path):
    """Range-clustered writes (the zorder layout contract) turn the
    pruned MERGE into a one-file rewrite."""
    import glob
    import json as _json
    import os

    from minisql_engine_spark.sources.snapshots import (
        merge_snapshot_pruned,
        write_snapshot,
    )

    docs, path = base
    p2 = str(tmp_path / "sorted")
    clustered = docs.repartitionByRange(4, "doc_id").sortWithinPartitions(
        "doc_id"
    )
    write_snapshot(clustered, p2)
    n_files = len(glob.glob(os.path.join(p2, "data", "*", "*.parquet")))
    assert n_files == 4

    upd = docs.orderBy("doc_id").limit(3).withColumn(
        "text", F.lit("PATCHED")
    )
    v = merge_snapshot_pruned(spark, p2, upd, "doc_id")
    with open(os.path.join(p2, "_versions", f"v{v}.json")) as f:
        man = _json.load(f)
    carried = [e for e in man["data_dirs"] if os.path.isfile(e)]
    assert len(carried) == 3  # 3 of 4 range-files untouched
    got = read_snapshot(spark, p2)
    assert got.filter(F.col("text") == "PATCHED").count() == 3
    assert got.count() == docs.count()


def test_optimistic_concurrency_append_retries(spark, base):
    """A racing writer steals the version number: append retries on
    top of the winner's manifest without rewriting its data; MERGE
    raises for the caller (its base moved)."""
    import glob
    import json as _json
    import os

    from minisql_engine_spark.sources.snapshots import (
        ConcurrentCommitError,
        append_snapshot,
    )

    docs, path = base
    # fake competitor claims v2 listing v1's dirs (a no-op append)
    with open(os.path.join(path, "_versions", "v1.json")) as f:
        v1 = _json.load(f)
    with open(os.path.join(path, "_versions", "v2.json"), "w") as f:
        _json.dump({"version": 2, "data_dirs": v1["data_dirs"]}, f)

    # monkey-level race: current_version says 2 now, so append targets
    # 3 — pre-claim 3 as well to force one retry onto 4
    with open(os.path.join(path, "_versions", "v3.json"), "w") as f:
        _json.dump({"version": 3, "data_dirs": v1["data_dirs"]}, f)

    more = docs.limit(5).select(
        (F.col("doc_id") + 40_000).alias("doc_id"), "text", "source"
    )
    v = append_snapshot(more, path)
    assert v == 4
    assert read_snapshot(spark, path).count() == docs.count() + 5
    # no orphan dirs: every data dir is referenced by some manifest
    refs = set()
    for mp in glob.glob(os.path.join(path, "_versions", "*.json")):
        with open(mp) as f:
            refs.update(_json.load(f)["data_dirs"])
    on_disk = set(glob.glob(os.path.join(path, "data", "*")))
    assert on_disk <= refs

    # the claim primitive is single-winner: a commit targeting an
    # already-claimed version raises (this is the path MERGE/DELETE
    # hit when a racer lands between their base read and their claim
    # — they call _commit once and do NOT auto-retry, since their
    # content was computed from a base that moved)
    from minisql_engine_spark.sources.snapshots import _commit

    with open(os.path.join(path, "_versions", "v5.json"), "w") as f:
        _json.dump({"version": 5, "data_dirs": v1["data_dirs"]}, f)
    upd = docs.limit(1)
    with pytest.raises(ConcurrentCommitError):
        _commit(upd, path, 5)


def test_delete_range_pruned_drops_whole_files(spark, base, tmp_path):
    """Retention delete on a range-clustered table: fully-covered
    files vanish by metadata alone, boundary files rewrite, the rest
    carry by reference — content equals the naive delete."""
    import glob
    import json as _json
    import os

    from minisql_engine_spark.sources.snapshots import (
        delete_range_pruned,
        write_snapshot,
    )

    docs, path = base
    p2 = str(tmp_path / "ranged")
    write_snapshot(
        docs.repartitionByRange(4, "doc_id").sortWithinPartitions(
            "doc_id"
        ),
        p2,
    )
    files = sorted(
        glob.glob(os.path.join(p2, "data", "*", "*.parquet"))
    )
    assert len(files) == 4
    # pick a range covering file 2 entirely and straddling file 3
    import pyarrow.parquet as pq

    ranges = []
    for f in files:
        md = pq.ParquetFile(f).metadata
        st = md.row_group(0).column(0).statistics
        lo_, hi_ = st.min, st.max
        for rg in range(md.num_row_groups):
            s2 = md.row_group(rg).column(0).statistics
            lo_, hi_ = min(lo_, s2.min), max(hi_, s2.max)
        ranges.append((lo_, hi_))
    ranges.sort()
    lo = ranges[1][0]                    # start of 2nd file
    hi = (ranges[2][0] + ranges[2][1]) // 2  # middle of 3rd file
    expected = docs.filter(
        ~((F.col("doc_id") >= lo) & (F.col("doc_id") <= hi))
    )
    v = delete_range_pruned(spark, p2, "doc_id", lo, hi)
    got = read_snapshot(spark, p2)
    assert sorted(r["doc_id"] for r in got.collect()) == sorted(
        r["doc_id"] for r in expected.collect()
    )
    with open(os.path.join(p2, "_versions", f"v{v}.json")) as f:
        man = _json.load(f)
    carried = [e for e in man["data_dirs"] if os.path.isfile(e)]
    # files 1 and 4 carried untouched; file 2 dropped wholly (not in
    # the manifest and never rewritten); file 3 rewritten
    assert len(carried) == 2
    assert set(carried) == {files[0], files[3]}


def test_merge_lost_update_raises(spark, base, monkeypatch):
    """A commit landing between the merge's base pin and its claim
    must COLLIDE (ConcurrentCommitError), never be silently merged
    over — the lost-update race the r5 advisor flagged: the merge
    used to recompute current_version()+1 AFTER reading the base, so
    an interleaved writer's rows vanished without an error."""
    import minisql_engine_spark.sources.snapshots as snap

    docs, path = base
    updates = spark.createDataFrame(
        [(5, "x", "web")], "doc_id bigint, text string, source string"
    )
    real_read = snap.read_snapshot

    def racy_read(spark_, p, version=None):
        df = real_read(spark_, p, version)
        # a concurrent writer lands right after the merge pins its base
        snap.write_snapshot(real_read(spark_, p).limit(10), p)
        return df

    monkeypatch.setattr(snap, "read_snapshot", racy_read)
    with pytest.raises(snap.ConcurrentCommitError):
        merge_snapshot(spark, path, updates, ["doc_id"])
    monkeypatch.undo()
    # the concurrent writer's commit is intact (nothing lost)
    assert read_snapshot(spark, path).count() == 10


def test_delete_lost_update_raises(spark, base, monkeypatch):
    """Same pinning contract for DELETE."""
    import minisql_engine_spark.sources.snapshots as snap

    docs, path = base
    real_read = snap.read_snapshot

    def racy_read(spark_, p, version=None):
        df = real_read(spark_, p, version)
        snap.write_snapshot(real_read(spark_, p).limit(10), p)
        return df

    monkeypatch.setattr(snap, "read_snapshot", racy_read)
    with pytest.raises(snap.ConcurrentCommitError):
        delete_from_snapshot(spark, path, "source = 'web'")


def test_delete_where_keeps_null_predicate_rows(spark, base, tmp_path):
    """SQL DELETE removes rows where the predicate is TRUE; rows
    where it evaluates NULL are KEPT (a NULL source row survives
    ``DELETE WHERE source = 'web'``)."""
    docs, path = base
    p2 = str(tmp_path / "nulls")
    with_nulls = docs.unionByName(
        spark.createDataFrame(
            [(9001, "null-source", None), (9002, None, "web")],
            "doc_id bigint, text string, source string",
        )
    )
    write_snapshot(with_nulls, p2)
    delete_from_snapshot(spark, p2, "source = 'web'")
    got = read_snapshot(spark, p2)
    # the NULL-source row survives; the web row (9002) does not
    assert got.filter(F.col("doc_id") == 9001).count() == 1
    assert got.filter(F.col("doc_id") == 9002).count() == 0
    assert got.filter(F.col("source") == "web").count() == 0


def test_delete_range_pruned_keeps_null_key_rows(spark, base, tmp_path):
    """NULL-key rows are invisible to parquet min/max stats, so a
    file "entirely inside" the deleted range can still hold NULL-key
    rows that SQL range-DELETE must keep: the null_count footer stat
    forces such files onto the rewrite path, and the rewrite filter
    keeps predicate-NULL rows."""
    from minisql_engine_spark.sources.snapshots import (
        delete_range_pruned,
    )

    docs, path = base
    p2 = str(tmp_path / "nullkeys")
    with_nulls = docs.limit(40).unionByName(
        spark.createDataFrame(
            [(None, "null-key", "web")],
            "doc_id bigint, text string, source string",
        )
    )
    # one file: min/max cover [0, 39], plus a NULL key the stats hide
    write_snapshot(with_nulls.coalesce(1), p2)
    delete_range_pruned(spark, p2, "doc_id", 0, 1000)
    got = read_snapshot(spark, p2).collect()
    assert len(got) == 1
    assert got[0]["text"] == "null-key"


def test_delete_range_pruned_quoted_string_bounds(spark, base, tmp_path):
    """String bounds containing quotes must not break (or inject
    into) the rewrite filter — bounds travel as typed lit() Columns,
    never repr-spliced SQL text."""
    from minisql_engine_spark.sources.snapshots import (
        delete_range_pruned,
    )

    docs, path = base
    p2 = str(tmp_path / "strkeys")
    tbl = spark.createDataFrame(
        [("a'1", 1), ("b'2", 2), ("c'3", 3), ("d'4", 4)],
        "name string, v int",
    )
    write_snapshot(tbl.coalesce(1), p2)
    delete_range_pruned(spark, p2, "name", "b'", "c'ز")
    got = sorted(r["name"] for r in read_snapshot(spark, p2).collect())
    assert got == ["a'1", "d'4"]


# --- CDC: diff_snapshots -----------------------------------------------------


def test_diff_append_is_added_only_and_zero_read(spark, base):
    from minisql_engine_spark.sources.snapshots import (
        append_snapshot,
        diff_dirs,
        diff_snapshots,
    )

    docs, path = base
    batch = docs.limit(0).union(
        spark.createDataFrame(
            [(9001, "new one", "srcX"), (9002, "new two", "srcX")],
            docs.schema,
        )
    )
    v2 = append_snapshot(batch, path)
    only_from, only_to, shared = diff_dirs(path, 1, v2)
    assert only_from == []        # history never read
    assert len(only_to) >= 1 and shared
    out = diff_snapshots(spark, path, 1, v2).collect()
    assert {r["op"] for r in out} == {"added"}
    assert sorted(r["doc_id"] for r in out) == [9001, 9002]


def test_diff_multiset_duplicates_survive(spark, base):
    from minisql_engine_spark.sources.snapshots import (
        append_snapshot,
        diff_snapshots,
    )

    docs, path = base
    dup = spark.createDataFrame(
        [(7777, "twice", "s"), (7777, "twice", "s")], docs.schema
    )
    v2 = append_snapshot(dup, path)
    out = diff_snapshots(spark, path, 1, v2).collect()
    assert len(out) == 2 and all(r["doc_id"] == 7777 for r in out)


def test_diff_merge_emits_exact_change_and_reverse(spark, base):
    from minisql_engine_spark.sources.snapshots import (
        diff_snapshots,
        merge_snapshot_pruned,
    )

    docs, path = base
    upd = docs.filter(F.col("doc_id") < 10).withColumn(
        "text", F.concat(F.lit("X:"), F.col("text"))
    )
    v3 = merge_snapshot_pruned(spark, path, upd, "doc_id")
    out = diff_snapshots(spark, path, 1, v3).collect()
    added = {r["doc_id"] for r in out if r["op"] == "added"}
    removed = {r["doc_id"] for r in out if r["op"] == "removed"}
    assert added == removed == set(range(10))
    assert all(
        r["text"].startswith("X:") for r in out if r["op"] == "added"
    )
    # direction flips op
    rev = diff_snapshots(spark, path, v3, 1).collect()
    assert {r["op"] for r in rev if r["doc_id"] < 10} == {
        "added",
        "removed",
    }
    assert all(
        not r["text"].startswith("X:")
        for r in rev
        if r["op"] == "added"
    )


def test_diff_compaction_is_empty(spark, base):
    """Compaction is a content-identical rewrite: the CDC diff across
    it must be EXACTLY empty even though every byte moved."""
    from minisql_engine_spark.sources.snapshots import (
        append_snapshot,
        compact_snapshot,
        diff_snapshots,
    )

    docs, path = base
    append_snapshot(
        spark.createDataFrame([(9001, "x", "s")], docs.schema), path
    )
    v3 = compact_snapshot(spark, path)
    assert diff_snapshots(spark, path, v3 - 1, v3).count() == 0


def test_diff_metadata_only_evolution_is_empty(spark, base):
    from minisql_engine_spark.sources.snapshots import (
        add_snapshot_column,
        diff_snapshots,
    )

    docs, path = base
    v2 = add_snapshot_column(path, "flag", "int", 0)
    assert diff_snapshots(spark, path, 1, v2).count() == 0
    # and an append AFTER evolution diffs only the new rows, with
    # pre-evolution files conformed through the recorded default
    from minisql_engine_spark.sources.snapshots import (
        append_snapshot,
        read_snapshot,
    )

    batch = read_snapshot(spark, path).filter(
        F.col("doc_id") < 0
    )  # empty, evolved schema
    batch = spark.createDataFrame(
        [(9001, "post", "s", 5)], batch.schema
    )
    v3 = append_snapshot(batch, path)
    out = diff_snapshots(spark, path, v2, v3).collect()
    assert [(r["op"], r["doc_id"], r["flag"]) for r in out] == [
        ("added", 9001, 5)
    ]


def test_delete_range_pruned_tolerates_empty_data_file(
    spark, base, tmp_path
):
    """A zero-row data file (e.g. an overwrite that filtered
    everything away) has no footer min/max at all; the range logic
    must treat it as disjoint-from-everything, not crash or rewrite
    it (the r9 hypothesis find: TypeError on None < int)."""
    from minisql_engine_spark.sources.snapshots import (
        append_snapshot,
        delete_range_pruned,
        read_snapshot,
        write_snapshot,
    )

    docs, path = base
    p2 = str(tmp_path / "with_empty")
    write_snapshot(docs.filter("doc_id < 50"), p2)
    # commit an APPEND whose data file holds zero rows
    append_snapshot(docs.filter("doc_id < 0").coalesce(1), p2)
    before = read_snapshot(spark, p2).count()
    delete_range_pruned(spark, p2, "doc_id", 10, 19)
    after = read_snapshot(spark, p2)
    assert after.count() == before - 10
    assert after.filter("doc_id BETWEEN 10 AND 19").count() == 0
