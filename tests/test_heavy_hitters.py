"""Heavy hitters: oracle parity, sketch≡exact, superset guarantee."""

from __future__ import annotations

import pandas as pd
import pytest

from minisql_engine_spark.operators.heavy_hitters import (
    _space_saving_partition,
    frequent_tokens,
    frequent_tokens_exact,
    frequent_tokens_sql,
)
from minisql_engine_spark.sources import load_table

from tests.conftest import assert_matches_oracle


@pytest.mark.parametrize("k", [50, 200, 1000])
def test_frequent_tokens_oracle(spark, duck, sf_dir, k):
    docs = load_table(spark, sf_dir, "documents")
    out = frequent_tokens(docs, k)
    oracle = duck.sql(frequent_tokens_sql("documents", k)).df()
    assert_matches_oracle(out, oracle, f"frequent_tokens k={k}")


def test_sketch_equals_exact(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    a = frequent_tokens(docs, 100).toPandas()
    b = frequent_tokens_exact(docs, 100).toPandas()
    pd.testing.assert_frame_equal(a, b)


def test_minimal_sketch_size_still_superset(spark, sf_dir):
    """m = k+1 is the theoretical floor; the exact recount must still
    see every true heavy hitter."""
    docs = load_table(spark, sf_dir, "documents")
    tight = frequent_tokens(docs, 100, sketch_size=101).toPandas()
    exact = frequent_tokens_exact(docs, 100).toPandas()
    pd.testing.assert_frame_equal(tight, exact)


def test_sketch_size_validation(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    with pytest.raises(ValueError):
        frequent_tokens(docs, 100, sketch_size=100)
    with pytest.raises(ValueError):
        frequent_tokens(docs, 0)


def test_space_saving_superset_property():
    """Adversarial single-partition stream: a heavy item arriving
    LAST, after the sketch is saturated by tail noise, must still be
    present (the eviction-inherits-min overestimate guarantees it)."""
    m, n_tail = 20, 400
    tail = [f"t{i}" for i in range(n_tail)]  # 400 singletons
    heavy = ["HOT"] * 60  # 60/460 ≈ 13% > N/m = 23
    stream = tail + heavy  # heavy arrives after saturation
    batches = [pd.DataFrame({"token": stream[i : i + 50]}) for i in range(0, len(stream), 50)]
    (result,) = list(_space_saving_partition(m)(iter(batches)))
    assert "HOT" in set(result["token"])


def test_space_saving_batch_order_independent_superset():
    """The guarantee holds whatever the batch boundaries are."""
    m = 10
    stream = (["a"] * 30 + [f"x{i}" for i in range(80)] + ["b"] * 30)
    for size in (1, 7, 140):
        batches = [
            pd.DataFrame({"token": stream[i : i + size]})
            for i in range(0, len(stream), size)
        ]
        (result,) = list(_space_saving_partition(m)(iter(batches)))
        toks = set(result["token"])
        # a and b both have 30/140 ≈ 21% > N/m = 14
        assert {"a", "b"} <= toks, f"batch size {size} lost a heavy hitter"


def test_empty_and_null_text(spark):
    docs = spark.createDataFrame(
        [(1, "spark spark spark"), (2, ""), (3, None), (4, "  \t ")],
        "doc_id bigint, text string",
    )
    out = frequent_tokens(docs, 2).toPandas()
    assert out.to_dict("records") == [{"token": "spark", "tf": 3}]


def test_space_saving_superset_property_randomized():
    """Randomized streams (Zipf-ish mixtures, adversarial orderings):
    the sketch must contain every item whose count exceeds N/m."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=30, deadline=None)
    @given(
        st.lists(
            st.sampled_from([f"h{i}" for i in range(4)] + [f"t{i}" for i in range(60)]),
            min_size=1,
            max_size=600,
        ),
        st.integers(min_value=5, max_value=25),
        st.integers(min_value=1, max_value=97),
    )
    def check(stream, m, batch_size):
        from collections import Counter

        batches = [
            pd.DataFrame({"token": stream[i : i + batch_size]})
            for i in range(0, len(stream), batch_size)
        ]
        (result,) = list(_space_saving_partition(m)(iter(batches)))
        kept = set(result["token"])
        n = len(stream)
        for tok, cnt in Counter(stream).items():
            if cnt > n / m:
                assert tok in kept, (
                    f"lost {tok} ({cnt}/{n} > N/m={n / m:.1f}, m={m})"
                )

    check()
