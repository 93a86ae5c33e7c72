"""Video perceptual near-dups (r12) — oracle parity on the
deterministic corpus, planted-pair semantics (exact copies match all
frames, frame-local edits survive the vote at min_frames ≤ n−1 and
are rejected at min_frames = n), frame-alignment, and rails."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from minisql_engine_spark.operators.multimodal import (
    perceptual_video_corpus,
    video_near_dups,
    video_near_dups_sql,
)
from minisql_engine_spark.sources.parquet_catalog import load_table
from tests.conftest import assert_matches_oracle


def _corpus(spark, sf_dir, **kw):
    return perceptual_video_corpus(
        load_table(spark, sf_dir, "documents"), **kw
    )


def test_video_near_dups_oracle(spark, duck, sf_dir):
    out = video_near_dups(_corpus(spark, sf_dir))
    assert_matches_oracle(
        out,
        duck.execute(video_near_dups_sql()).df(),
        "video_near_dups",
    )


def test_video_planted_semantics(spark, sf_dir):
    """Exact copies match 4/4 at ham 0; partial copies (last frame
    re-rendered) match exactly 3/4 — kept at min_frames=3, dropped
    at min_frames=4."""
    got = video_near_dups(_corpus(spark, sf_dir)).toPandas()
    exact = got[(got.id_b - got.id_a == 1000) & (got.id_a < 60)]
    assert len(exact) == 6
    assert (exact.n_frames_matched == 4).all()
    assert (exact.ham_total == 0).all()
    partial = got[(got.id_b - got.id_a == 2000) & (got.id_a < 60)]
    assert len(partial) == 6
    assert (partial.n_frames_matched == 3).all()
    # dup vs partial copies of the same source: also 3 shared frames
    cross = got[(got.id_a >= 1000) & (got.id_b >= 2000)]
    assert len(cross) == 6
    assert (cross.n_frames_matched == 3).all()
    # no cross-source accidental pairs at radius 3
    assert len(got) == 18

    strict = video_near_dups(
        _corpus(spark, sf_dir), min_frames=4
    ).toPandas()
    assert (strict.id_b - strict.id_a == 1000).all()
    assert len(strict) == 6


def test_video_oracle_strict_vote(spark, duck, sf_dir):
    """min_frames=4 replays in the twin too."""
    assert_matches_oracle(
        video_near_dups(_corpus(spark, sf_dir), min_frames=4),
        duck.execute(video_near_dups_sql(min_frames=4)).df(),
        "video_near_dups_strict",
    )


def test_video_rails():
    with pytest.raises(ValueError, match="min_frames"):
        video_near_dups_sql(min_frames=5)
    with pytest.raises(ValueError, match="min_frames"):
        video_near_dups(None, min_frames=0)
    with pytest.raises(ValueError, match="composite-id radix"):
        video_near_dups(None, n_frames=17, min_frames=1)


def test_video_frame_sampler_recovers_digests(spark, sf_dir):
    """The even byte-range sampler recovers exactly the per-frame
    md5 digests the corpus concatenated — the plumbing identity the
    oracle's per-frame derivation rests on."""
    import hashlib

    from minisql_engine_spark.operators.multimodal import (
        sample_frames,
    )

    corpus = _corpus(spark, sf_dir, n=3, n_dups=0, n_partial=0)
    rows = (
        sample_frames(corpus, n_frames=4)
        .orderBy("doc_id", "frame_idx")
        .collect()
    )
    assert len(rows) == 12
    for r in rows:
        want = hashlib.md5(
            f"{r['doc_id']}:f{r['frame_idx']}".encode()
        ).digest()
        assert bytes(r["frame_bytes"]) == want
