"""Property-based tests for the r12 operators: keep-best
survivorship ≡ a Python argmax replay on arbitrary cluster/score
relations (NULLs, ties, singletons included), and the video frame
vote ≡ brute-force per-frame Hamming counting on random hash
relations straddling the radius boundary."""

from __future__ import annotations

import os
import sys

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import pytest  # noqa: E402

SLOW = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# ids 0..9, clusters from a tiny domain (guaranteed shared
# clusters), scores sparse (None = unscored) with deliberate ties
KB_CASE = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=9),       # doc id
        st.integers(min_value=0, max_value=3),       # cluster
        st.one_of(
            st.none(), st.integers(min_value=-5, max_value=5)
        ),                                            # score
    ),
    min_size=1,
    max_size=14,
    unique_by=lambda t: t[0],
)


@pytest.fixture(scope="module")
def _spark():
    # module-scoped so hypothesis examples share one session
    # (getOrCreate returns the suite's JVM-wide session)
    from minisql_engine_spark import get_spark

    return get_spark("props-r12", shuffle_partitions=4)


@given(case=KB_CASE)
@SLOW
def test_keep_best_equals_argmax_replay(_spark, case):
    from minisql_engine_spark.operators.dedup import (
        keep_best_of_cluster,
    )

    labels = [(i, c) for i, c, _ in case]
    scores = [(i, s) for i, _, s in case if s is not None]
    ldf = _spark.createDataFrame(
        labels, "doc_id long, component long"
    )
    if scores:
        sdf = _spark.createDataFrame(scores, "doc_id long, s long")
    else:
        sdf = _spark.createDataFrame([], "doc_id long, s long")
    got = {
        r["doc_id"]: bool(r["is_kept"])
        for r in keep_best_of_cluster(ldf, sdf).collect()
    }
    # replay: per cluster, argmax by (score with None lowest, -id)
    by_cluster: dict[int, list[tuple[int, int | None]]] = {}
    for i, c, s in case:
        by_cluster.setdefault(c, []).append((i, s))
    want = {}
    for c, members in by_cluster.items():
        best = max(
            members,
            key=lambda t: (
                t[1] if t[1] is not None else -(1 << 62),
                -t[0],
            ),
        )[0]
        for i, _s in members:
            want[i] = i == best
    assert got == want


# small hash domain so band collisions and near-ties are common;
# 4 frames per "video"
VIDEO_HASHES = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),            # doc id
        st.lists(
            st.integers(min_value=0, max_value=(1 << 64) - 1),
            min_size=4,
            max_size=4,
        ),
    ),
    min_size=2,
    max_size=6,
    unique_by=lambda t: t[0],
)


@given(case=VIDEO_HASHES, max_h=st.integers(min_value=0, max_value=3),
       min_f=st.integers(min_value=1, max_value=4))
@SLOW
def test_frame_vote_equals_bruteforce(_spark, case, max_h, min_f):
    """hash_near_pairs on composite (doc, frame) ids + the frame
    vote == brute-force per-frame Hamming counting, for any hash
    relation and any (radius ≤ 3, vote) setting."""
    from pyspark.sql import functions as F

    from minisql_engine_spark.operators.multimodal import (
        hash_near_pairs,
        _signed64,
    )

    rows = [
        (doc * 16 + f, _signed64(h))
        for doc, hs in case
        for f, h in enumerate(hs)
    ]
    hdf = _spark.createDataFrame(rows, "fid long, dhash long")
    pairs = hash_near_pairs(hdf, "fid", "dhash", max_h)
    voted = (
        pairs.filter(F.col("id_a") % 16 == F.col("id_b") % 16)
        .select(
            F.expr("id_a DIV 16").alias("a"),
            F.expr("id_b DIV 16").alias("b"),
        )
        .groupBy("a", "b")
        .count()
        .filter(F.col("count") >= min_f)
    )
    got = {(r["a"], r["b"]) for r in voted.collect()}
    want = set()
    docs = dict(case)
    ids = sorted(docs)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            n = sum(
                1
                for f in range(4)
                if bin(docs[a][f] ^ docs[b][f]).count("1") <= max_h
            )
            if n >= min_f:
                want.add((a, b))
    assert got == want


# small integer grid in 4 dims, no zero vectors (norm rail), unique
# ids; an init set and a batch drawn from the same pool so exact and
# near collisions are common
VEC = st.lists(
    st.integers(min_value=-3, max_value=3), min_size=4, max_size=4
).filter(lambda v: any(v))
SDIX_CASE = st.tuples(
    st.lists(
        st.tuples(st.integers(min_value=0, max_value=9), VEC),
        min_size=1, max_size=6, unique_by=lambda t: t[0],
    ),
    st.lists(
        st.tuples(st.integers(min_value=100, max_value=109), VEC),
        min_size=1, max_size=5, unique_by=lambda t: t[0],
    ),
    st.integers(min_value=1, max_value=10**6),
)


@given(case=SDIX_CASE)
@SLOW
def test_semdedup_admission_equals_bruteforce(_spark, case, tmp_path_factory):
    """With n_cells=1 the cell machinery vanishes and admission must
    equal the brute-force rule: reject iff ANY index vector has
    round(cos,6)·1e6 ≥ threshold — replayed here in plain Python
    (the clustering stages carry their own oracle tests)."""
    import math
    import shutil

    from minisql_engine_spark.operators.semdedup_index import (
        admit_semdedup_batch,
        init_semdedup_index,
    )

    init_rows, batch_rows, t = case
    schema = "vec_id bigint, embedding array<float>, label int"
    init = _spark.createDataFrame(
        [(i, [float(x) for x in v], 0) for i, v in init_rows], schema
    )
    batch = _spark.createDataFrame(
        [(i, [float(x) for x in v], 0) for i, v in batch_rows], schema
    )
    path = str(tmp_path_factory.mktemp("sdix_prop") / "ix")
    try:
        init_semdedup_index(init, path, n_cells=1, dims=4)
        got = {
            r["vec_id"]: bool(r["admitted"])
            for r in admit_semdedup_batch(
                _spark, path, batch, t
            ).collect()
        }
    finally:
        shutil.rmtree(path, ignore_errors=True)

    def cos_fx6(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return round(round(dot / (na * nb), 6) * 10**6)

    want = {
        bid: all(cos_fx6(bv, iv) < t for _, iv in init_rows)
        for bid, bv in batch_rows
    }
    assert got == want


SDIX_FULLPROBE_CASE = st.tuples(
    st.lists(
        st.tuples(st.integers(min_value=0, max_value=9), VEC),
        min_size=2, max_size=6, unique_by=lambda t: t[0],
    ),
    st.lists(
        st.tuples(st.integers(min_value=100, max_value=109), VEC),
        min_size=1, max_size=5, unique_by=lambda t: t[0],
    ),
    st.integers(min_value=1, max_value=10**6),
    st.integers(min_value=2, max_value=3),           # n_cells
)


@given(case=SDIX_FULLPROBE_CASE)
@SLOW
def test_semdedup_fullprobe_equals_bruteforce(
    _spark, case, tmp_path_factory
):
    """With n_probe = n_cells every cell is probed, so the cell
    structure is irrelevant and admission must equal the brute-force
    rule REGARDLESS of how the clustering fell out — the r14 recall
    knob's correctness contract (the admitted flag is partition-
    independent; only the home cell depends on the clustering)."""
    import math
    import shutil

    from minisql_engine_spark.operators.semdedup_index import (
        init_semdedup_index,
        semdedup_against_index,
    )

    init_rows, batch_rows, t, n_cells = case
    n_cells = min(n_cells, len(init_rows))  # k <= n for the clustering
    schema = "vec_id bigint, embedding array<float>, label int"
    init = _spark.createDataFrame(
        [(i, [float(x) for x in v], 0) for i, v in init_rows], schema
    )
    batch = _spark.createDataFrame(
        [(i, [float(x) for x in v], 0) for i, v in batch_rows], schema
    )
    path = str(tmp_path_factory.mktemp("sdix_fp") / "ix")
    try:
        init_semdedup_index(init, path, n_cells=n_cells, dims=4)
        got = {
            r["vec_id"]: bool(r["admitted"])
            for r in semdedup_against_index(
                _spark, path, batch, t, n_probe=n_cells
            ).collect()
        }
    finally:
        shutil.rmtree(path, ignore_errors=True)

    def cos_fx6(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return round(round(dot / (na * nb), 6) * 10**6)

    want = {
        bid: all(cos_fx6(bv, iv) < t for _, iv in init_rows)
        for bid, bv in batch_rows
    }
    assert got == want
