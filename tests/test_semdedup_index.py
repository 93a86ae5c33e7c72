"""Incremental semantic-dedup index — per-batch oracle parity (the
DuckDB twin re-derives the frozen cells and replays the fx6 verify),
the chained cross-batch memory (a batch-2 near-dup of a batch-1
ADMISSION is rejected), replay idempotence (self-collision at
sim 10⁶), and the partition-pruned candidate scan."""

from __future__ import annotations

import hashlib
import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from minisql_engine_spark.operators.semdedup_index import (
    admit_semdedup_batch,
    init_semdedup_index,
    semdedup_admission_sql,
    semdedup_against_index,
)
from minisql_engine_spark.sources.parquet_catalog import load_table
from tests.conftest import assert_matches_oracle

FX = 10**6
T = 400_000


def _tmp(tag: str) -> str:
    h = hashlib.md5(tag.encode()).hexdigest()[:12]
    return os.path.join(tempfile.gettempdir(), f"minisql_sdix_{h}")


def _corpus_parts(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    init = emb.filter(F.col("vec_id") % 3 == 0)
    b1 = emb.filter(F.col("vec_id") % 3 == 1)
    b2 = emb.filter(F.col("vec_id") % 3 == 2)
    return emb, init, b1, b2


def test_admission_oracle_chained(spark, duck, sf_dir):
    """Two chained batches on the corpus, each decision table
    hash-equal to the DuckDB twin: batch 1 verifies against the init
    index; batch 2 against init ∪ batch-1 ADMITTED — the oracle
    chain materializes step 1's admissions exactly like the index
    append does."""
    emb, init, b1, b2 = _corpus_parts(spark, sf_dir)
    path = _tmp("oracle")
    shutil.rmtree(path, ignore_errors=True)
    try:
        init_semdedup_index(init, path)
        duck.execute(
            "CREATE OR REPLACE VIEW sdix_init AS"
            " SELECT * FROM embeddings WHERE vec_id % 3 = 0"
        )
        duck.execute(
            "CREATE OR REPLACE VIEW sdix_b1 AS"
            " SELECT * FROM embeddings WHERE vec_id % 3 = 1"
        )
        d1 = admit_semdedup_batch(spark, path, b1, T)
        o1 = semdedup_admission_sql("sdix_b1", "sdix_init", "sdix_init", T)
        assert_matches_oracle(
            d1, duck.execute(o1).df(), "sdix_batch1"
        )
        # chain: admitted(b1) joins the oracle's index side
        duck.execute(
            "CREATE OR REPLACE TABLE sdix_adm1 AS"
            " SELECT e.* FROM embeddings e JOIN ("
            + o1
            + ") d ON d.vec_id = e.vec_id WHERE d.admitted"
        )
        duck.execute(
            "CREATE OR REPLACE VIEW sdix_ix2 AS"
            " SELECT * FROM sdix_init"
            " UNION ALL SELECT * FROM sdix_adm1"
        )
        duck.execute(
            "CREATE OR REPLACE VIEW sdix_b2 AS"
            " SELECT * FROM embeddings WHERE vec_id % 3 = 2"
        )
        d2 = admit_semdedup_batch(spark, path, b2, T)
        assert_matches_oracle(
            d2,
            duck.execute(
                semdedup_admission_sql(
                    "sdix_b2", "sdix_ix2", "sdix_init", T
                )
            ).df(),
            "sdix_batch2",
        )
    finally:
        shutil.rmtree(path, ignore_errors=True)


def test_cross_batch_memory_and_replay(spark, sf_dir):
    """Planted semantics: a scaled copy of an init vector (cosine
    exactly 1.0) is rejected in batch 1; a scaled copy of a batch-1
    ADMITTED vector is rejected in batch 2 (the index remembers
    admissions, not just init); a fresh orthogonal vector admits;
    replaying an admitted batch rejects everything (self-collision)
    and appends nothing."""
    dims = 64

    def unit(axis, vid):
        v = [0.0] * dims
        v[axis] = 1.0
        return (vid, v, 0)

    def scaled(axis, vid, s=0.5):
        v = [0.0] * dims
        v[axis] = s
        return (vid, v, 0)

    schema = "vec_id bigint, embedding array<float>, label int"
    init = spark.createDataFrame(
        [unit(0, 1), unit(1, 2), unit(2, 3), unit(3, 4)], schema
    )
    path = _tmp("planted")
    shutil.rmtree(path, ignore_errors=True)
    try:
        init_semdedup_index(init, path, n_cells=4, dims=dims)
        # batch 1: copy of init axis-0 (reject), fresh axis-10 (admit)
        b1 = spark.createDataFrame(
            [scaled(0, 101), unit(10, 102)], schema
        )
        d1 = {
            r["vec_id"]: r.asDict()
            for r in admit_semdedup_batch(spark, path, b1, T).collect()
        }
        assert d1[101]["admitted"] is False
        assert d1[101]["max_sim_fx6"] == FX  # exact direction match
        assert d1[102]["admitted"] is True
        # batch 2: copy of the batch-1 ADMISSION (axis-10) — must be
        # rejected by the appended index state, plus a fresh admit
        b2 = spark.createDataFrame(
            [scaled(10, 201), unit(11, 202)], schema
        )
        d2 = {
            r["vec_id"]: r.asDict()
            for r in admit_semdedup_batch(spark, path, b2, T).collect()
        }
        assert d2[201]["admitted"] is False  # cross-batch memory
        assert d2[201]["max_sim_fx6"] == FX
        assert d2[202]["admitted"] is True
        # replay batch 2: every vector self-collides, nothing appends
        before = sorted(
            str(p)
            for p in _walk_files(os.path.join(path, "vecs"))
        )
        d2r = {
            r["vec_id"]: r["admitted"]
            for r in admit_semdedup_batch(spark, path, b2, T).collect()
        }
        assert d2r == {201: False, 202: False}
        after = sorted(
            str(p)
            for p in _walk_files(os.path.join(path, "vecs"))
        )
        assert before == after  # idempotent: no new files
    finally:
        shutil.rmtree(path, ignore_errors=True)


def _walk_files(root):
    out = []
    for d, _, fs in os.walk(root):
        out += [os.path.join(d, f) for f in fs if f.endswith(".parquet")]
    return out


def test_candidate_scan_is_partition_pruned(spark, sf_dir):
    """The index side of the admission join must carry partition
    filters on ``cell`` — a batch touching few cells reads few cell
    dirs, never the whole index (the 100 TB contract)."""
    emb, init, b1, _ = _corpus_parts(spark, sf_dir)
    path = _tmp("prune")
    shutil.rmtree(path, ignore_errors=True)
    try:
        init_semdedup_index(init, path)
        small = b1.limit(5)
        plan = (
            semdedup_against_index(spark, path, small, T)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        segs = plan.split("PartitionFilters: [")[1:]
        assert any(
            "cell" in s[: s.find("]")] and s[: s.find("]")].strip()
            for s in segs
        ), plan[:2000]
    finally:
        shutil.rmtree(path, ignore_errors=True)


def test_threshold_rails():
    with pytest.raises(ValueError, match="threshold_fx6"):
        semdedup_admission_sql("b", "i", threshold_fx6=0)


def test_nprobe_oracle_and_monotone(spark, duck, sf_dir):
    """n_probe=2 admission replays exactly in the SQL twin (batch
    side probes its 2 nearest frozen cells, home stays rank-1), and
    probing is monotonically conservative on the corpus: every p=2
    admission is also a p=1 admission."""
    emb, init, b1, _ = _corpus_parts(spark, sf_dir)
    path = _tmp("nprobe")
    shutil.rmtree(path, ignore_errors=True)
    try:
        init_semdedup_index(init, path)
        duck.execute(
            "CREATE OR REPLACE VIEW npx_init AS"
            " SELECT * FROM embeddings WHERE vec_id % 3 = 0"
        )
        duck.execute(
            "CREATE OR REPLACE VIEW npx_b1 AS"
            " SELECT * FROM embeddings WHERE vec_id % 3 = 1"
        )
        d2 = semdedup_against_index(spark, path, b1, T, n_probe=2)
        assert_matches_oracle(
            d2,
            duck.execute(
                semdedup_admission_sql(
                    "npx_b1", "npx_init", "npx_init", T, n_probe=2
                )
            ).df(),
            "sdix_nprobe2",
        )
        adm1 = {
            r["vec_id"]
            for r in semdedup_against_index(spark, path, b1, T)
            .filter("admitted")
            .collect()
        }
        adm2 = {
            r["vec_id"] for r in d2.filter("admitted").collect()
        }
        assert adm2 <= adm1  # more candidates can only reject more
    finally:
        shutil.rmtree(path, ignore_errors=True)


def test_nprobe_catches_cell_border_neighbor(spark):
    """Planted cross-cell miss: with frozen axis cells a/b, the
    stored near-dup w=[.6,.8] lives in b's cell while the probe
    q=[.8,.6] homes to a's cell — cos(q,w)=0.96 ≥ 0.9 but p=1 never
    sees it (cell a holds only a, cos 0.8 < 0.9) and falsely admits;
    p=2 probes b's cell and rejects. Home cell is p-invariant."""
    dims = 8
    schema = "vec_id bigint, embedding array<float>, label int"

    def vec(x, y, vid):
        v = [0.0] * dims
        v[0], v[1] = x, y
        return (vid, v, 0)

    TT = 900_000
    path = _tmp("border")
    shutil.rmtree(path, ignore_errors=True)
    try:
        init_semdedup_index(
            spark.createDataFrame(
                [vec(1.0, 0.0, 1), vec(0.0, 1.0, 2)], schema
            ),
            path, n_cells=2, dims=dims,
        )
        # w homes to b's cell (cos .8 vs .6) and admits (only b there,
        # cos .8 < .9)
        w = spark.createDataFrame([vec(0.6, 0.8, 10)], schema)
        dw = admit_semdedup_batch(spark, path, w, TT).collect()[0]
        assert dw["admitted"] is True
        q = spark.createDataFrame([vec(0.8, 0.6, 20)], schema)
        d1 = semdedup_against_index(spark, path, q, TT).collect()[0]
        d2 = semdedup_against_index(
            spark, path, q, TT, n_probe=2
        ).collect()[0]
        assert d1["admitted"] is True  # the p=1 cell-border MISS
        assert d2["admitted"] is False  # p=2 sees w: cos .96 >= .9
        assert d2["max_sim_fx6"] == 960_000
        assert d1["cell"] == d2["cell"]  # home cell is p-invariant
    finally:
        shutil.rmtree(path, ignore_errors=True)


def test_zero_norm_rail(spark):
    """A zero-norm embedding is rejected at the door (init AND
    admission): its cosine is NaN, so a replayed batch containing it
    would NOT self-collide at 10⁶ and would re-append every replay —
    the rail keeps the idempotence contract honest (and matches the
    property suite's 'norm rail' vector filter)."""
    dims = 8
    schema = "vec_id bigint, embedding array<float>, label int"
    ok = [(1, [1.0] + [0.0] * (dims - 1), 0)]
    zero = [(2, [0.0] * dims, 0)]
    path = _tmp("zeronorm")
    shutil.rmtree(path, ignore_errors=True)
    try:
        with pytest.raises(ValueError, match="zero-norm"):
            init_semdedup_index(
                spark.createDataFrame(ok + zero, schema),
                path, n_cells=1, dims=dims,
            )
        shutil.rmtree(path, ignore_errors=True)
        init_semdedup_index(
            spark.createDataFrame(ok, schema), path, n_cells=1,
            dims=dims,
        )
        with pytest.raises(ValueError, match="zero-norm"):
            semdedup_against_index(
                spark, path, spark.createDataFrame(zero, schema), T
            )
    finally:
        shutil.rmtree(path, ignore_errors=True)


def test_compaction_single_writer_rails(spark):
    """Compaction is single-writer: a held lock file makes a second
    compaction fail fast, and an index mutation between the staging
    read and the swap (a concurrent admission's append) aborts the
    swap with the live index untouched — appended vectors are never
    silently dropped."""
    from minisql_engine_spark.operators.semdedup_index import (
        compact_semdedup_index,
    )

    dims = 8
    schema = "vec_id bigint, embedding array<float>, label int"

    def unit(axis, vid):
        v = [0.0] * dims
        v[axis] = 1.0
        return (vid, v, 0)

    path = _tmp("lockrail")
    shutil.rmtree(path, ignore_errors=True)
    try:
        init_semdedup_index(
            spark.createDataFrame([unit(0, 1), unit(1, 2)], schema),
            path, n_cells=2, dims=dims,
        )
        vecs = os.path.join(path, "vecs")
        lock = vecs + ".compact.lock"
        # rail 1: held lock → fail fast, lock left in place
        open(lock, "w").close()
        with pytest.raises(RuntimeError, match="single-writer"):
            compact_semdedup_index(spark, path)
        assert os.path.exists(lock)
        os.unlink(lock)
        # rail 2: mutate the listing mid-compaction via a read hook —
        # simulate by appending a file after the snapshot. Emulate the
        # race deterministically: take the operator's own snapshot
        # semantics (any .parquet add/remove/size change) and verify
        # the abort path by appending between two real calls is not
        # observable from outside, so instead call compaction with a
        # monkeypatched spark.read that appends a sliver first.
        import pyspark.sql.readwriter as rw

        real_load = rw.DataFrameReader.parquet
        state = {"fired": False}

        def evil_parquet(reader, *paths, **kw):
            if not state["fired"] and paths and paths[0] == vecs:
                state["fired"] = True
                df = real_load(reader, *paths, **kw)
                # concurrent admission lands AFTER the staging read
                spark.createDataFrame(
                    [(99, [1.0] * dims, 7)],
                    "vec_id bigint, embedding array<float>, cell int",
                ).write.mode("append").partitionBy("cell").parquet(vecs)
                return df
            return real_load(reader, *paths, **kw)

        rw.DataFrameReader.parquet = evil_parquet
        try:
            before = sorted(_walk_files(vecs))
            with pytest.raises(RuntimeError, match="changed during"):
                compact_semdedup_index(spark, path)
        finally:
            rw.DataFrameReader.parquet = real_load
        after = sorted(_walk_files(vecs))
        # live index holds everything incl. the concurrent append;
        # no staged dir or lock left behind
        assert set(before) < set(after)
        assert not os.path.exists(vecs + ".compact")
        assert not os.path.exists(lock)
        assert (
            spark.read.parquet(vecs).filter("vec_id = 99").count() == 1
        )
    finally:
        shutil.rmtree(path, ignore_errors=True)


def test_stream_admit_semdedup(spark, sf_dir, tmp_path):
    """Streaming semantic admission: file-per-trigger micro-batches
    through the REAL streaming engine produce EXACTLY the index state
    of the sequential batch calls (same drop order), and a
    fresh-checkpoint replay admits nothing (self-collision
    idempotence) and appends no files."""
    from minisql_engine_spark.streaming.ingest import (
        stream_admit_semdedup,
    )

    emb, init, b1, b2 = _corpus_parts(spark, sf_dir)
    drop = str(tmp_path / "drop")
    b1.coalesce(1).write.mode("append").parquet(drop)
    b2.coalesce(1).write.mode("append").parquet(drop)

    # reference: sequential batch admission (same micro-batch split —
    # file order is mod-time order, b1 then b2)
    ref = _tmp("stream_ref")
    shutil.rmtree(ref, ignore_errors=True)
    live = str(tmp_path / "lidx")
    try:
        init_semdedup_index(init, ref)
        admit_semdedup_batch(spark, ref, b1, T)
        admit_semdedup_batch(spark, ref, b2, T)
        init_semdedup_index(init, live)
        schema = spark.read.parquet(drop).schema
        q = stream_admit_semdedup(
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(drop),
            live,
            str(tmp_path / "ckpt"),
            T,
        )
        q.awaitTermination(120)

        def _state(p):
            return (
                spark.read.parquet(os.path.join(p, "vecs"))
                .select("vec_id", "cell")
                .toPandas()
                .sort_values("vec_id")
                .reset_index(drop=True)
            )

        assert _state(live).equals(_state(ref))
        # fresh-checkpoint replay: nothing admits, no new files
        before = sorted(_walk_files(os.path.join(live, "vecs")))
        q2 = stream_admit_semdedup(
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(drop),
            live,
            str(tmp_path / "ckpt2"),
            T,
        )
        q2.awaitTermination(120)
        assert sorted(_walk_files(os.path.join(live, "vecs"))) == before
    finally:
        shutil.rmtree(ref, ignore_errors=True)


def test_compaction_preserves_decisions(spark, sf_dir):
    """Compaction rewrites the vecs layout to one file per cell and
    changes NO admission decision: a probe batch's decision table is
    identical before and after, and the file count drops to the
    touched-cell count."""
    from minisql_engine_spark.operators.semdedup_index import (
        compact_semdedup_index,
    )

    emb, init, b1, b2 = _corpus_parts(spark, sf_dir)
    path = _tmp("compact")
    shutil.rmtree(path, ignore_errors=True)
    try:
        init_semdedup_index(init, path)
        admit_semdedup_batch(spark, path, b1, T)
        probe = b2.limit(50).localCheckpoint(eager=True)
        before_pdf = (
            semdedup_against_index(spark, path, probe, T)
            .toPandas()
            .sort_values("vec_id")
            .reset_index(drop=True)
        )
        n_before, n_after = compact_semdedup_index(spark, path)
        assert n_after < n_before  # init + admission slivers merged
        cells = (
            spark.read.parquet(os.path.join(path, "vecs"))
            .select("cell")
            .distinct()
            .count()
        )
        assert n_after == cells  # one file per populated cell
        after_pdf = (
            semdedup_against_index(spark, path, probe, T)
            .toPandas()
            .sort_values("vec_id")
            .reset_index(drop=True)
        )
        assert before_pdf.equals(after_pdf)
    finally:
        shutil.rmtree(path, ignore_errors=True)
