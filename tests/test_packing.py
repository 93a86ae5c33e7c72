"""Sequence packing + mixture sampling: DuckDB parity and the
invariants the oracle hash can't see (fullness, coverage, split
semantics, budget cutoff)."""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from minisql_engine_spark.operators.mixture import (  # noqa: E402
    mixture_report,
    mixture_report_sql,
    mixture_sample,
    mixture_sample_sql,
)
from minisql_engine_spark.operators.packing import (  # noqa: E402
    pack_sequences,
    pack_sequences_sql,
    packing_stats,
    packing_stats_sql,
)
from tests.conftest import assert_matches_oracle  # noqa: E402

WEIGHTS = {"src0": 3.0, "src1": 1.0, "src2": 1.0, "src5": 0.5, "src19": 2.0}


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    from minisql_engine_spark.sources import load_table

    return load_table(spark, sf_dir, "documents")


# --- oracle parity ---------------------------------------------------------


@pytest.mark.parametrize("cap", [64, 512, 5000])
def test_pack_matches_oracle(docs, duck, cap):
    assert_matches_oracle(
        pack_sequences(docs, cap),
        duck.execute(pack_sequences_sql("documents", cap)).df(),
        f"pack_sequences cap={cap}",
    )


def test_pack_stats_match_oracle(docs, duck):
    assert_matches_oracle(
        packing_stats(pack_sequences(docs, 512), 512),
        duck.execute(packing_stats_sql("documents", 512)).df(),
        "packing_stats",
    )


@pytest.mark.parametrize("budget", [2000, 100_000])
def test_mixture_matches_oracle(docs, duck, budget):
    assert_matches_oracle(
        mixture_sample(docs, WEIGHTS, budget),
        duck.execute(mixture_sample_sql("documents", WEIGHTS, budget)).df(),
        f"mixture budget={budget}",
    )


def test_mixture_report_matches_oracle(docs, duck):
    assert_matches_oracle(
        mixture_report(mixture_sample(docs, WEIGHTS, 6000)),
        duck.execute(mixture_report_sql("documents", WEIGHTS, 6000)).df(),
        "mixture_report",
    )


# --- packing invariants ----------------------------------------------------


def test_pack_pieces_cover_each_doc_exactly(docs, spark):
    """Per doc: pieces are contiguous, disjoint, and sum to n_tokens —
    no token lost or duplicated by the chunking."""
    packed = pack_sequences(docs, 128)
    per_doc = packed.groupBy("doc_id", "n_tokens").agg(
        F.sum("piece_tokens").alias("covered"),
        F.min("tok_begin").alias("lo"),
        F.max("tok_end").alias("hi"),
        F.count("*").alias("n_pieces"),
    )
    bad = per_doc.filter(
        (F.col("covered") != F.col("n_tokens"))
        | (F.col("lo") != 0)
        | (F.col("hi") != F.col("n_tokens"))
    )
    assert bad.count() == 0
    # a doc longer than the capacity must split across >1 sequence
    assert (
        per_doc.filter(
            (F.col("n_tokens") > 128) & (F.col("n_pieces") < 2)
        ).count()
        == 0
    )


def test_pack_every_sequence_full_except_last(docs):
    """Concat-and-chunk wastes nothing: within a shard every seq_id
    below the max holds exactly `capacity` tokens."""
    cap = 128
    packed = pack_sequences(docs, cap)
    seqs = packed.groupBy("shard", "seq_id").agg(
        F.sum("piece_tokens").alias("seq_tokens")
    )
    last = packed.groupBy("shard").agg(F.max("seq_id").alias("last_seq"))
    bad = (
        seqs.join(last, "shard")
        .filter(
            (F.col("seq_id") < F.col("last_seq"))
            & (F.col("seq_tokens") != cap)
        )
    )
    assert bad.count() == 0


def test_pack_empty_docs_produce_no_rows(spark):
    df = spark.createDataFrame(
        [(1, "a b c"), (2, ""), (3, "   "), (4, None)],
        "doc_id long, text string",
    )
    out = pack_sequences(df, 10)
    assert [r.doc_id for r in out.collect()] == [1]


def test_pack_deterministic_across_runs(docs):
    a = sorted(map(tuple, pack_sequences(docs, 96).collect()))
    b = sorted(map(tuple, pack_sequences(docs, 96).collect()))
    assert a == b


def test_pack_rejects_bad_capacity(docs):
    with pytest.raises(ValueError):
        pack_sequences(docs, 0)


# --- mixture invariants ----------------------------------------------------


def test_mixture_drops_unweighted_sources(docs):
    out = mixture_sample(docs, WEIGHTS, 10_000)
    kept = {r.source for r in out.select("source").distinct().collect()}
    assert kept <= set(WEIGHTS)


def test_mixture_budget_cutoff_and_straddler(docs):
    """Every selected doc was admitted while the running total was
    still below the allowance (straddler rule), and the FIRST doc
    past the allowance per source is the last one kept."""
    out = mixture_sample(docs, WEIGHTS, 4000)
    viol = out.filter(
        F.col("cum_tokens") - F.col("n_tokens")
        >= F.col("allowance_tokens")
    )
    assert viol.count() == 0
    # at most one selected doc per source crosses the allowance
    crossers = (
        out.filter(F.col("cum_tokens") > F.col("allowance_tokens"))
        .groupBy("source")
        .count()
        .filter(F.col("count") > 1)
    )
    assert crossers.count() == 0


def test_mixture_exhausted_source_keeps_everything(docs):
    """A source whose full token mass is under its allowance keeps
    every doc (no phantom cutoff)."""
    big = {"src0": 1.0}
    out = mixture_sample(docs, big, 10_000_000)
    n_src0 = docs.filter(F.col("source") == "src0").count()
    assert out.count() == n_src0


def test_mixture_rejects_bad_weights(docs):
    with pytest.raises(ValueError):
        mixture_sample(docs, {}, 100)
    with pytest.raises(ValueError):
        mixture_sample(docs, {"src0": -1.0}, 100)
    with pytest.raises(ValueError):
        mixture_sample(docs, {"src0": 0.0}, 100)


def test_compose_training_set_end_to_end(spark, docs):
    """curate → mixture → pack: deterministic, only curated TRAIN
    docs are packed, and every packed doc honors the mixture's
    source weighting (unweighted sources absent)."""
    from minisql_engine_spark.pipeline import (
        compose_training_set,
        curate_corpus,
    )

    weights = {"src0": 2.0, "src1": 1.0, "src2": 1.0}
    packed = compose_training_set(
        docs,
        mixture_weights=weights,
        token_budget=3000,
        capacity=128,
        min_tokens=10,
        langs=None,
        near_dups=False,
    )
    rows = packed.collect()
    assert rows, "pipeline produced no sequences"
    packed_ids = {r.doc_id for r in rows}

    curated = curate_corpus(
        docs, min_tokens=10, langs=None, near_dups=False
    )
    train_ids = {
        r.doc_id
        for r in curated.filter(F.col("split") == "train")
        .select("doc_id")
        .collect()
    }
    assert packed_ids <= train_ids
    src_of = {
        r.doc_id: r.source
        for r in docs.select("doc_id", "source").collect()
    }
    assert {src_of[i] for i in packed_ids} <= set(weights)

    again = {
        tuple(r)
        for r in compose_training_set(
            docs,
            mixture_weights=weights,
            token_budget=3000,
            capacity=128,
            min_tokens=10,
            langs=None,
            near_dups=False,
        ).collect()
    }
    assert again == {tuple(r) for r in rows}


def test_training_shard_export_roundtrip_and_pruning(spark, docs, tmp_path):
    """Sharded export: lossless roundtrip, manifest ≡ packing_stats,
    and a single-shard read partition-prunes at the source."""
    from minisql_engine_spark.operators.packing import (
        packing_stats,
        read_training_shard,
        write_training_shards,
    )

    packed = pack_sequences(docs, 256)
    path = str(tmp_path / "shards")
    write_training_shards(packed, path, 256)

    back = spark.read.parquet(path)
    cols = packed.columns
    assert sorted(map(tuple, back.select(*cols).collect())) == sorted(
        map(tuple, packed.collect())
    )
    manifest = spark.read.parquet(path + "_manifest")
    assert sorted(map(tuple, manifest.collect())) == sorted(
        map(tuple, packing_stats(packed, 256).collect())
    )

    a_shard = packed.select("shard").first().shard
    one = read_training_shard(spark, path, a_shard)
    plan = one._sc._jvm.PythonSQLUtils.explainString(
        one._jdf.queryExecution(), "formatted"
    )
    assert "PartitionFilters: [isnotnull(shard" in plan, plan[:1500]
    expected = packed.filter(F.col("shard") == a_shard).count()
    assert one.count() == expected


def test_mixture_priority_admission(spark, duck, sf_dir):
    """priority_col: the binding allowance goes to the best-scored
    docs first; oracle replays the same (priority DESC, md5, id)
    order."""
    from minisql_engine_spark.operators.mixture import (
        mixture_sample,
        mixture_sample_sql,
    )
    from minisql_engine_spark.sources import load_table
    from tests.conftest import assert_matches_oracle

    docs = load_table(spark, sf_dir, "documents").withColumn(
        "score", (F.col("doc_id") % 7).cast("double")
    )
    weights = {"web": 1.0, "books": 1.0}
    out = mixture_sample(docs, weights, 5000, priority_col="score")
    # register the scored frame for the oracle
    duck.execute(
        "CREATE OR REPLACE VIEW _scored AS SELECT *,"
        " CAST(doc_id % 7 AS DOUBLE) AS score FROM documents"
    )
    oracle = duck.sql(
        mixture_sample_sql("_scored", weights, 5000, priority_col="score")
    ).df()
    assert_matches_oracle(out, oracle, "mixture priority")
    # the admitted set is quality-first: every admitted doc's score is
    # >= every skipped doc's score within its source (modulo the one
    # straddler-boundary doc per source)
    sel = out.toPandas()
    alldocs = docs.filter(
        F.col("source").isin(*weights)
    ).select("doc_id", "source", "score").toPandas()
    for src_name, grp in alldocs.groupby("source"):
        chosen = set(sel[sel["source"] == src_name]["doc_id"])
        if not chosen or len(chosen) == len(grp):
            continue
        min_chosen = grp[grp["doc_id"].isin(chosen)]["score"].min()
        max_skipped = grp[~grp["doc_id"].isin(chosen)]["score"].max()
        # boundary doc can break the invariant by at most one rank
        assert min_chosen >= max_skipped - 1.0
