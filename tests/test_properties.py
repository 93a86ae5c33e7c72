"""Property-based tests (hypothesis): filter / join / aggregate
against an in-memory Python oracle on small random integer tables —
especially the duplicate-key join shapes the reference got wrong
(SURVEY Q5), where a reimplementation is most likely to inherit bugs."""

from __future__ import annotations

import os
import sys
from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from minisql_engine_spark.operators import relational as R  # noqa: E402

# keys drawn from a tiny domain → guaranteed duplicate keys
ROW = st.tuples(
    st.integers(min_value=0, max_value=4),
    st.integers(min_value=-100, max_value=100),
)
TABLE = st.lists(ROW, min_size=0, max_size=12)

SLOW = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _df(spark, rows, cols):
    return spark.createDataFrame(rows, cols) if rows else spark.createDataFrame(
        [], f"{cols[0]} long, {cols[1]} long"
    )


@given(t1=TABLE, t2=TABLE)
@SLOW
def test_join_multiset_semantics(spark, t1, t2):
    """Inner equi-join must be the exact multiset of matching pairs
    (the reference collapsed many-to-many matches, Q5)."""
    df1 = _df(spark, t1, ["k", "v1"])
    df2 = _df(spark, t2, ["k2", "v2"])
    got = Counter(
        (r["k"], r["v1"], r["v2"])
        for r in R.equi_join(
            df1, df2, on=F.col("k") == F.col("k2")
        ).collect()
    )
    want = Counter(
        (k1, v1, v2) for (k1, v1) in t1 for (k2, v2) in t2 if k1 == k2
    )
    assert got == want


@given(t1=TABLE, lit=st.integers(min_value=-2, max_value=6))
@SLOW
def test_filter_comparators_vs_oracle(spark, t1, lit):
    import operator

    df = _df(spark, t1, ["k", "v"])
    for op_name, op_fn in [
        ("<", operator.lt), (">", operator.gt), ("<=", operator.le),
        (">=", operator.ge), ("!=", operator.ne), ("=", operator.eq),
    ]:
        got = sorted(
            (r["k"], r["v"])
            for r in df.filter(R.comparison("k", op_name, lit)).collect()
        )
        want = sorted((k, v) for (k, v) in t1 if op_fn(k, lit))
        assert got == want, op_name


@given(t1=TABLE)
@SLOW
def test_aggregates_vs_oracle(spark, t1):
    df = _df(spark, t1, ["k", "v"])
    row = R.aggregate(
        df,
        [
            ("max", "v", "mx"),
            ("min", "v", "mn"),
            ("sum", "v", "sm"),
            ("count", "v", "ct"),
        ],
    ).collect()[0]
    vals = [v for (_, v) in t1]
    assert row["mx"] == (max(vals) if vals else None)
    assert row["mn"] == (min(vals) if vals else None)
    assert row["sm"] == (sum(vals) if vals else None)
    assert row["ct"] == len(vals)


@given(t1=TABLE)
@SLOW
def test_distinct_and_group_by_vs_oracle(spark, t1):
    df = _df(spark, t1, ["k", "v"])
    got = sorted(r["k"] for r in R.distinct_values(df, ["k"]).collect())
    assert got == sorted({k for (k, _) in t1})
    grouped = {
        r["k"]: (r["sm"], r["ct"])
        for r in R.aggregate(
            df, [("sum", "v", "sm"), ("count", "v", "ct")], group_by=["k"]
        ).collect()
    }
    want: dict[int, tuple[int, int]] = {}
    for k, v in t1:
        s, c = want.get(k, (0, 0))
        want[k] = (s + v, c + 1)
    assert grouped == want
