"""Integer-exact PageRank — python replay, invariants, plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from minisql_engine_spark.operators.graph import (
    DAMP_DEN,
    DAMP_NUM,
    SCALE,
    clear_graph_cache,
    pagerank,
)


def _py_pagerank(edges: list[tuple[str, str]], n_iter: int) -> dict:
    """Driver-side integer replay — the same floor arithmetic."""
    nodes = sorted({n for e in edges for n in e})
    n = len(nodes)
    deg: dict = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    teleport = (SCALE * (DAMP_DEN - DAMP_NUM)) // (100 * n)
    rank = {v: SCALE // n for v in nodes}
    for _ in range(n_iter):
        nxt = {v: teleport for v in nodes}
        for s, t in edges:
            nxt[t] += (rank[s] * DAMP_NUM) // (DAMP_DEN * deg[s])
        rank = nxt
    return rank


def _sym(pairs):
    out = list(pairs) + [(b, a) for a, b in pairs]
    return out


def test_pagerank_matches_python_replay(spark):
    # star + chain + a triangle — mixed degrees
    pairs = [
        ("a", "b"), ("a", "c"), ("a", "d"),
        ("d", "e"), ("e", "f"),
        ("x", "y"), ("y", "z"), ("z", "x"),
    ]
    edges = _sym(pairs)
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {
        r["node"]: r["pr_units"]
        for r in pagerank(df, n_iter=5).collect()
    }
    assert got == _py_pagerank(edges, 5)
    clear_graph_cache()


def test_pagerank_uniform_on_regular_graph(spark):
    # a cycle is 2-regular once symmetric: every node keeps the same
    # rank at every iteration (exact equality — integer arithmetic)
    cyc = [(str(i), str((i + 1) % 6)) for i in range(6)]
    df = spark.createDataFrame(_sym(cyc), "src string, dst string")
    ranks = [r["pr_units"] for r in pagerank(df, n_iter=4).collect()]
    assert len(set(ranks)) == 1
    clear_graph_cache()


def test_pagerank_hub_outranks_leaves(spark):
    pairs = [("hub", f"leaf{i}") for i in range(8)]
    df = spark.createDataFrame(_sym(pairs), "src string, dst string")
    got = {
        r["node"]: r["pr_units"]
        for r in pagerank(df, n_iter=6).collect()
    }
    assert all(got["hub"] > got[f"leaf{i}"] for i in range(8))
    clear_graph_cache()


def test_pagerank_mass_conservation_bound(spark):
    pairs = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"), ("a", "c")]
    edges = _sym(pairs)
    df = spark.createDataFrame(edges, "src string, dst string")
    out = pagerank(df, n_iter=7)
    total = out.agg(F.sum("pr_units")).collect()[0][0]
    n, m, iters = 4, len(edges), 7
    # each iteration floors once per node (teleport) and once per
    # edge (contribution): leak < (n + m) per iteration, plus the
    # initial SCALE // n remainder
    assert SCALE - (n + m + 1) * (iters + 1) <= total <= SCALE
    clear_graph_cache()


def test_pagerank_directed_dangling_leaks_but_finite(spark):
    # pure sink 'z': its mass leaks each iteration (documented), all
    # ranks stay positive and bounded
    df = spark.createDataFrame(
        [("a", "z"), ("b", "z"), ("a", "b")], "src string, dst string"
    )
    got = {
        r["node"]: r["pr_units"]
        for r in pagerank(df, n_iter=5).collect()
    }
    assert set(got) == {"a", "b", "z"}
    assert all(0 < v <= SCALE for v in got.values())
    assert got["z"] == max(got.values())
    clear_graph_cache()


def test_pagerank_zero_iters_is_uniform_init(spark):
    df = spark.createDataFrame(
        _sym([("a", "b"), ("b", "c")]), "src string, dst string"
    )
    got = {
        r["node"]: r["pr_units"]
        for r in pagerank(df, n_iter=0).collect()
    }
    assert got == {"a": SCALE // 3, "b": SCALE // 3, "c": SCALE // 3}
    clear_graph_cache()
