"""Bloom-filter membership + portable HLL sketch tests: DuckDB
parity, the no-false-negative theorem, FPR bound, and the
distributive merge properties that make both structures shardable."""

from __future__ import annotations

from pyspark.sql import functions as F

from minisql_engine_spark.operators.membership import (
    bloom_admission,
    bloom_admission_sql,
    bloom_build,
    bloom_merge,
    bloom_probe,
)
from minisql_engine_spark.operators.sketch import (
    hll_distinct,
    hll_distinct_sql,
    hll_estimate,
    hll_merge,
    hll_sketch,
)
from minisql_engine_spark.sources import load_table
from tests.conftest import assert_matches_oracle


# --------------------------------------------------------------------------
# Bloom filter
# --------------------------------------------------------------------------


def test_bloom_admission_oracle(spark, duck, sf_dir):
    out = bloom_admission(load_table(spark, sf_dir, "documents"))
    ora = duck.execute(bloom_admission_sql()).fetchdf()
    assert_matches_oracle(out, ora, "bloom_admission")


def test_bloom_no_false_negatives_and_fpr(spark, sf_dir):
    """Every indexed key must probe maybe_present (theorem of the
    construction); false-positive rate stays under the sizing bound."""
    rows = bloom_admission(load_table(spark, sf_dir, "documents")).collect()
    fn = [r for r in rows if r["present"] and not r["maybe_present"]]
    assert fn == []
    n = len(rows)
    fp = sum(1 for r in rows if r["is_false_positive"])
    # k=5, ~10 bits/key at both test SFs → theoretical FPR < 1e-2;
    # allow 5% as a loose determinism-safe ceiling
    assert fp / n < 0.05


def test_bloom_merge_equals_whole_build(spark):
    keys = spark.range(0, 300).select(
        F.md5(F.col("id").cast("string")).alias("key")
    )
    a = keys.filter(F.col("key") < "8")
    b = keys.filter(F.col("key") >= "8")
    merged = bloom_merge(bloom_build(a), bloom_build(b))
    whole = bloom_build(keys)
    assert merged.exceptAll(whole).count() == 0
    assert whole.exceptAll(merged).count() == 0


def test_bloom_probe_routes_all_members(spark):
    """Disjoint new keys mostly probe negative (the cheap common
    case); member keys all probe positive."""
    members = spark.range(0, 200).select(
        F.concat(F.lit("m:"), F.col("id")).alias("key")
    )
    bloom = bloom_build(members)
    fresh = spark.range(0, 200).select(
        F.concat(F.lit("new:"), F.col("id")).alias("key")
    )
    got = {
        r["key"]: r["maybe_present"]
        for r in bloom_probe(
            members.unionByName(fresh), bloom
        ).collect()
    }
    assert all(got[f"m:{i}"] for i in range(200))
    fresh_hits = sum(1 for i in range(200) if got[f"new:{i}"])
    assert fresh_hits < 10  # 200 keys in 65536 bits: FPR ≈ 0


def test_bloom_probe_plan_broadcasts_filter(spark):
    """The probe join must broadcast the word relation — the batch
    side never shuffles for the filter."""
    members = spark.range(0, 50).select(
        F.col("id").cast("string").alias("key")
    )
    plan = bloom_probe(members, bloom_build(members))._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


# --------------------------------------------------------------------------
# HyperLogLog
# --------------------------------------------------------------------------


def test_hll_distinct_oracle_events(spark, duck, sf_dir):
    """Raw-estimator branch (high-cardinality event_id) replays
    bit-for-bit, including the exact count and the error guard."""
    out = hll_distinct(
        load_table(spark, sf_dir, "events"),
        F.col("event_id").cast("string"),
    )
    ora = duck.execute(
        hll_distinct_sql(table="events", key_sql="CAST(event_id AS VARCHAR)")
    ).fetchdf()
    assert_matches_oracle(out, ora, "hll_events")
    assert out.collect()[0]["within_10pct"] is True


def test_hll_distinct_oracle_tokens_linear_branch(spark, duck, sf_dir):
    """Small-cardinality key (documents.source) exercises the
    linear-counting correction branch in both engines."""
    out = hll_distinct(
        load_table(spark, sf_dir, "documents"), F.col("source")
    )
    ora = duck.execute(
        hll_distinct_sql(table="documents", key_sql="source")
    ).fetchdf()
    assert_matches_oracle(out, ora, "hll_sources")
    row = out.collect()[0]
    # tiny n → linear counting is near-exact
    assert row["within_10pct"] is True


def test_hll_merge_equals_whole_sketch(spark, sf_dir):
    """Union of per-shard sketches == one-shot sketch (distributive
    state — the property that makes HLL an aggview measure)."""
    ev = load_table(spark, sf_dir, "events")
    key = F.col("event_id").cast("string")
    a = ev.filter(F.col("event_id") % 2 == 0)
    b = ev.filter(F.col("event_id") % 2 == 1)
    merged = hll_merge(hll_sketch(a, key), hll_sketch(b, key))
    whole = hll_sketch(ev, key)
    assert merged.exceptAll(whole).count() == 0
    assert whole.exceptAll(merged).count() == 0
    # and the merged estimate equals the whole-corpus estimate
    em = hll_estimate(merged).collect()[0]["estimate"]
    ew = hll_estimate(whole).collect()[0]["estimate"]
    assert em == ew


def test_hll_overlapping_merge_idempotent(spark):
    """Re-presenting the same keys cannot move the sketch (max is
    idempotent) — the replay-safety the streaming indexes rely on."""
    keys = spark.range(0, 1000).select(
        F.col("id").cast("string").alias("k")
    )
    s = hll_sketch(keys, F.col("k"))
    twice = hll_merge(s, s)
    assert twice.exceptAll(s).count() == 0
    assert s.exceptAll(twice).count() == 0


# --------------------------------------------------------------------------
# Count-Min sketch
# --------------------------------------------------------------------------


def test_cms_frequency_oracle_collisions(spark, duck, sf_dir):
    """Undersized width (w=256 < key cardinality) forces real
    collisions; every counter and estimate still replays exactly, and
    never_under holds for every key."""
    from minisql_engine_spark.operators.sketch import (
        cms_frequency_report,
        cms_frequency_report_sql,
    )

    ev = load_table(spark, sf_dir, "events").select(
        F.col("user_id").cast("string").alias("key")
    )
    out = cms_frequency_report(ev, "key", w=256, d=4)
    ora = duck.execute(
        cms_frequency_report_sql(
            "(SELECT CAST(user_id AS VARCHAR) AS key FROM events) o",
            "key",
            w=256,
            d=4,
        )
    ).fetchdf()
    assert_matches_oracle(out, ora, "cms_frequency")
    rows = out.collect()
    assert all(r["never_under"] for r in rows)
    # collisions must actually occur at this sizing, or the test
    # proves nothing
    assert any(r["est"] > r["exact"] for r in rows)


def test_cms_token_frequency_oracle(spark, duck, sf_dir):
    from minisql_engine_spark.operators.sketch import (
        cms_token_frequency,
        cms_token_frequency_sql,
    )

    out = cms_token_frequency(load_table(spark, sf_dir, "documents"))
    ora = duck.execute(cms_token_frequency_sql()).fetchdf()
    assert_matches_oracle(out, ora, "cms_tokens")


def test_cms_merge_equals_whole_and_bound(spark):
    """Shard-merge == one-shot sketch (elementwise-sum distributive
    state), and the average overestimate respects the e/w·N expected
    bound with slack."""
    import math

    from minisql_engine_spark.operators.sketch import (
        cms_build,
        cms_estimate,
        cms_merge,
    )

    w, d = 64, 4
    items = spark.range(0, 5000).select(
        (F.col("id") % 500).cast("string").alias("key")
    )
    a = items.filter(F.col("id") % 2 == 0)
    b = items.filter(F.col("id") % 2 == 1)
    merged = cms_merge(cms_build(a, "key", w, d), cms_build(b, "key", w, d))
    whole = cms_build(items, "key", w, d)
    assert merged.exceptAll(whole).count() == 0
    assert whole.exceptAll(merged).count() == 0
    keys = items.select("key").distinct()
    est = cms_estimate(keys, whole, "key", w, d).collect()
    n_total = 5000
    exact_each = 10
    overs = [r["est"] - exact_each for r in est]
    assert min(overs) >= 0  # never under
    assert sum(overs) / len(overs) <= math.e / w * n_total  # expected bound


# --------------------------------------------------------------------------
# Histogram quantiles (the mergeable approximate-quantile path)
# --------------------------------------------------------------------------


def test_histogram_quantiles_oracle(spark, duck, sf_dir):
    from minisql_engine_spark.operators.stats import (
        histogram_quantiles,
        histogram_quantiles_sql,
    )

    out = histogram_quantiles(
        load_table(spark, sf_dir, "events"), "value", 0.0, 640.0
    )
    ora = duck.execute(
        histogram_quantiles_sql("events", "value", 0.0, 640.0)
    ).fetchdf()
    assert_matches_oracle(out, ora, "hist_quantiles")
    rows = out.collect()
    assert all(r["within_two_widths"] for r in rows)


def test_histogram_quantiles_edges(spark, duck):
    """Values outside [lo, hi) clamp to the range edges; a
    single-bucket pileup interpolates inside that bucket; NULLs are
    excluded — identical in both engines."""
    from minisql_engine_spark.operators.stats import (
        histogram_quantiles,
        histogram_quantiles_sql,
    )

    rows = [(i, v) for i, v in enumerate(
        [-5.0, -1.0, 2.0, 2.1, 2.2, 2.3, 99.0, None]
    )]
    sdf = spark.createDataFrame(rows, ["id", "v"])
    duck.execute("CREATE OR REPLACE TABLE _hq(id BIGINT, v DOUBLE)")
    duck.executemany("INSERT INTO _hq VALUES (?, ?)", rows)
    out = histogram_quantiles(sdf, "v", 0.0, 10.0, n_buckets=10,
                              probs=(0.2, 0.5, 0.9, 1.0))
    ora = duck.execute(
        histogram_quantiles_sql("_hq", "v", 0.0, 10.0, n_buckets=10,
                                probs=(0.2, 0.5, 0.9, 1.0))
    ).fetchdf()
    assert_matches_oracle(out, ora, "hist_quantiles_edges")
    got = {r["prob"]: r["est"] for r in out.collect()}
    assert got[0.2] == 0.0   # target rank falls in the underflow bucket
    assert got[1.0] == 10.0  # overflow bucket clamps to hi


# --------------------------------------------------------------------------
# Per-group HLL (incremental approximate COUNT DISTINCT)
# --------------------------------------------------------------------------


def test_hll_group_oracle_and_accuracy(spark, duck, sf_dir):
    """Per-event-type distinct-user sketch replays exactly; every
    group estimate lands within 10% of the exact distinct count."""
    from minisql_engine_spark.operators.sketch import (
        hll_group_estimate,
        hll_group_sketch,
        hll_group_distinct_sql,
    )

    ev = load_table(spark, sf_dir, "events")
    out = hll_group_estimate(
        hll_group_sketch(ev, "event_type", F.col("user_id").cast("string"))
    )
    ora = duck.execute(
        hll_group_distinct_sql(
            "events", "event_type", "CAST(user_id AS VARCHAR)"
        )
    ).fetchdf()
    assert_matches_oracle(out, ora, "hll_group")
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    for r in out.collect():
        assert abs(r["estimate"] - exact[r["grp"]]) / exact[r["grp"]] < 0.10


def test_hll_group_incremental_maintenance(spark, sf_dir):
    """Three batches maintained by per-(group, reg) max merge equal
    the one-shot sketch — the distributive-state property that makes
    per-group approx-distinct an incremental aggregate view."""
    from minisql_engine_spark.operators.sketch import (
        hll_group_merge,
        hll_group_sketch,
    )

    ev = load_table(spark, sf_dir, "events")
    key = F.col("user_id").cast("string")
    state = None
    for i in range(3):
        batch = ev.filter(F.col("event_id") % 3 == i)
        sk = hll_group_sketch(batch, "event_type", key)
        state = sk if state is None else hll_group_merge(state, sk)
    whole = hll_group_sketch(ev, "event_type", key)
    assert state.exceptAll(whole).count() == 0
    assert whole.exceptAll(state).count() == 0


def test_cms_and_hist_plan_shapes(spark, sf_dir):
    """Scale-shape gates: the CMS probe joins the broadcast counter
    relation (never sort-merge), and histogram quantiles keep their
    single window on the tiny histogram relation with no data-sized
    sort below it."""
    from minisql_engine_spark.operators.sketch import (
        cms_frequency_report,
    )
    from minisql_engine_spark.operators.stats import (
        histogram_quantiles,
    )

    ev = load_table(spark, sf_dir, "events")
    cms = cms_frequency_report(
        ev.select(F.col("user_id").cast("string").alias("key")),
        "key",
        w=256,
        d=4,
    )
    p1 = cms._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in p1
    assert "SortMergeJoin" not in p1

    hq = histogram_quantiles(ev, "value", 0.0, 640.0)
    p2 = hq._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in p2
    # the percentile comparison is the only sort-based aggregate;
    # the histogram estimate itself must stay hash-aggregated
    assert "HashAggregate" in p2
