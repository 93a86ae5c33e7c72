"""Tests for skew-salted join, as-of join, writers, Pandas-UDF
surfaces, and streaming dedup."""

from __future__ import annotations

import os
import sys
import tempfile
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from minisql_engine_spark.operators.skew import salted_join  # noqa: E402
from minisql_engine_spark.operators.asof import asof_join_backward  # noqa: E402
from minisql_engine_spark.sources import load_table  # noqa: E402
from minisql_engine_spark.sources.writers import (  # noqa: E402
    read_back,
    write_parquet,
)


def test_salted_join_equals_plain_join(spark, sf_dir):
    """Salting must preserve exact join multiplicity on skewed keys."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    plain = Counter(
        (r["o_orderkey"], r["c_mktsegment"])
        for r in orders.join(customer, "o_custkey").collect()
    )
    salted = Counter(
        (r["o_orderkey"], r["c_mktsegment"])
        for r in salted_join(orders, customer, on="o_custkey", n_salts=8).collect()
    )
    assert plain == salted and len(plain) > 0


def _skew_fixtures(spark, n=2_000_000, keys=10_000):
    """Synthesized skew: one key owns 20% of the big side (the
    power-law-entity case); a uniform twin of identical size is the
    control."""
    skewed = spark.range(n).select(
        F.when(F.col("id") % 5 == 0, 0)
        .otherwise(F.pmod(F.hash("id"), F.lit(keys)))
        .cast("bigint")
        .alias("k"),
        F.concat(F.lit("x" * 32), F.col("id").cast("string")).alias(
            "payload"
        ),
    )
    uniform = spark.range(n).select(
        F.pmod(F.hash("id"), F.lit(keys)).cast("bigint").alias("k"),
        F.concat(F.lit("x" * 32), F.col("id").cast("string")).alias(
            "payload"
        ),
    )
    small = spark.range(keys).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("dim")
    )
    return skewed, uniform, small


def _noop_time(df, reps=2):
    import time as _time

    df.write.format("noop").mode("overwrite").save()  # codegen warm
    best = float("inf")
    for _ in range(reps):
        t0 = _time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        best = min(best, _time.perf_counter() - t0)
    return best


def test_aqe_skew_split_bounds_skewed_join(spark):
    """VERDICT r3 #6: with AQE skew-join on (session default; the
    256 MB partition threshold is lowered here because the synthetic
    data is MBs, not the real-cluster GBs), a 20%-hot-key sort-merge
    join must (a) actually get split — `skew=true` in the final
    adaptive plan — and (b) run within 2× of the uniform control."""
    skewed, uniform, small = _skew_fixtures(spark)
    saved = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        )
    }
    try:
        # force a shuffle join (the 10k-row small side would broadcast
        # and dodge the skew entirely — which IS the first-choice fix,
        # but not what this test measures)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "100KB",
        )
        spark.conf.set(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes", "100KB"
        )
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2"
        )
        # (a) the split fires: execute THIS query execution (count()
        # et al. build a different one) and read the final AQE plan
        j = skewed.join(small, "k")
        qe = j._jdf.queryExecution()
        qe.executedPlan().execute().count()
        plan = qe.executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan[:2000]
        # (b) runtime within 2× of uniform (+0.5 s absolute grace for
        # sub-second local noise)
        t_uni = _noop_time(uniform.join(small, "k"))
        t_skew = _noop_time(skewed.join(small, "k"))
        if t_skew > 2.0 * t_uni + 0.5:
            # under full-suite load a single GC pause can poison one
            # side's min-of-2 — re-measure both before declaring a
            # regression
            t_uni = _noop_time(uniform.join(small, "k"), reps=3)
            t_skew = _noop_time(skewed.join(small, "k"), reps=3)
        assert t_skew <= 2.0 * t_uni + 0.5, (t_skew, t_uni)
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_salted_join_bounds_skewed_join(spark):
    """The deterministic fallback for skew too extreme for AQE's
    split: per-row salting keeps the same 20%-hot-key join within 2×
    of the uniform control too (multiplicity equality is covered by
    test_salted_join_equals_plain_join)."""
    skewed, uniform, small = _skew_fixtures(spark)
    saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        t_uni = _noop_time(uniform.join(small, "k"))
        t_salt = _noop_time(salted_join(skewed, small, on="k", n_salts=8))
        if t_salt > 2.0 * t_uni + 0.5:
            t_uni = _noop_time(uniform.join(small, "k"), reps=3)
            t_salt = _noop_time(
                salted_join(skewed, small, on="k", n_salts=8), reps=3
            )
        assert t_salt <= 2.0 * t_uni + 0.5, (t_salt, t_uni)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [(1, 100, "l1"), (1, 205, "l2"), (2, 50, "l3")],
        ["k", "t", "tag"],
    ).select("k", F.timestamp_seconds("t").alias("ts"), "tag")
    right = spark.createDataFrame(
        [(1, 100, 10.0), (1, 200, 20.0), (1, 300, 30.0), (3, 10, 99.0)],
        ["k", "t", "v"],
    ).select("k", F.timestamp_seconds("t").alias("ts"), "v")
    out = {
        r["tag"]: (r["asof_v"])
        for r in asof_join_backward(
            left, right, on="k", left_ts="ts", right_ts="ts",
            right_values=["v"],
        ).collect()
    }
    assert out["l1"] == 10.0   # equal-ts matches
    assert out["l2"] == 20.0   # latest at-or-before 205
    assert out["l3"] is None   # no right rows for key 2


def test_partitioned_write_and_partition_pruning(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").withColumn(
        "o_year", F.year("o_orderdate")
    )
    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, "orders_by_year")
        write_parquet(orders, path, partition_by=["o_year"])
        assert any(d.startswith("o_year=") for d in os.listdir(path))
        back = read_back(spark, path)
        assert back.count() == orders.count()
        pruned = back.filter(F.col("o_year") == 1995)
        plan = pruned._sc._jvm.PythonSQLUtils.explainString(
            pruned._jdf.queryExecution(), "formatted"
        )
        assert "PartitionFilters: [isnotnull(o_year" in plan  # pruning
        assert pruned.count() == orders.filter(F.col("o_year") == 1995).count()


def test_pandas_udf_matches_native_quality(spark, sf_dir):
    from minisql_engine_spark.functions import quality_score_pandas_udf
    from minisql_engine_spark.operators.text import with_quality_score

    docs = load_table(spark, sf_dir, "documents")
    native = {
        r["doc_id"]: r["quality_score"]
        for r in with_quality_score(docs).select("doc_id", "quality_score").collect()
    }
    vectorized = {
        r["doc_id"]: r["q"]
        for r in docs.select(
            "doc_id", quality_score_pandas_udf("text").alias("q")
        ).collect()
    }
    assert native.keys() == vectorized.keys()
    for k in native:
        assert abs(native[k] - vectorized[k]) < 1e-12, k


def test_streaming_dedup_within_watermark(spark, sf_dir):
    """dropDuplicatesWithinWatermark on a real stream: duplicated
    input events collapse back to the original count."""
    from minisql_engine_spark.streaming import read_events_stream

    batch_n = load_table(spark, sf_dir, "events").count()
    s = read_events_stream(spark, sf_dir, with_watermark="1 hour")
    doubled = s.unionByName(s)  # plant exact duplicates
    deduped = doubled.dropDuplicatesWithinWatermark(["event_id"])
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert spark.table("dedup_stream").count() == batch_n


def test_scale_shuffle_partitions(spark, sf_dir):
    from minisql_engine_spark.session import scale_shuffle_partitions

    before = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        # explicit bytes: 10 GiB / 128 MiB = 80 partitions (>= parallelism)
        n = scale_shuffle_partitions(spark, input_bytes=10 * 1024**3)
        assert n == max(80, spark.sparkContext.defaultParallelism)
        assert spark.conf.get("spark.sql.shuffle.partitions") == str(n)
        # from a DataFrame's optimizer estimate: small table → floor
        df = load_table(spark, sf_dir, "nation")
        n2 = scale_shuffle_partitions(spark, df=df)
        assert n2 == spark.sparkContext.defaultParallelism
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)


def test_multimodal_decoder_injection(spark, sf_dir):
    """A production codec can be wired through extract_features
    without editing the module: inject a toy decoder and verify its
    outputs flow through the Arrow pipeline."""
    from minisql_engine_spark.operators.multimodal import (
        extract_features,
        synthesize_payloads,
    )
    from minisql_engine_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents").limit(20)
    payloads = synthesize_payloads(docs)
    out = extract_features(
        payloads, decoder=lambda b: (len(b) * 2, 42.0)
    ).collect()
    assert len(out) == 20
    # md5 payloads are 16 bytes; the toy decoder doubles the count
    assert all(r["n_bytes"] == 32 and r["mean_byte"] == 42.0 for r in out)


def _pil_available() -> bool:
    try:
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


def test_decoder_selection_is_guarded():
    """default_image_decoder picks the real Pillow codec exactly when
    the library imports; the stub raises NotImplementedError (never a
    silent wrong answer) when it doesn't."""
    from minisql_engine_spark.operators.multimodal import (
        _fake_decode_stats,
        decode_image,
        default_image_decoder,
        pil_image_stats,
    )

    chosen = default_image_decoder()
    if _pil_available():
        assert chosen is pil_image_stats
    else:
        assert chosen is _fake_decode_stats
        import pytest as _pytest

        with _pytest.raises(NotImplementedError):
            decode_image(b"\x89PNG\r\n\x1a\n")


import pytest as _pt  # noqa: E402


@_pt.mark.skipif(not _pil_available(), reason="Pillow not installed")
def test_real_png_decodes_through_extract_features(spark, sf_dir):
    """With Pillow present, a real PNG flows through the SAME Arrow
    pipeline: synthesize a 4×4 image, encode to PNG bytes, decode via
    pil_image_stats inside extract_features."""
    import io

    import numpy as np
    from PIL import Image

    from minisql_engine_spark.operators.multimodal import (
        PAYLOAD_SCHEMA,
        extract_features,
        pil_image_stats,
    )

    arr = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    png = buf.getvalue()
    rows = [(1, "image", 4, 4, bytearray(png))]
    payloads = spark.createDataFrame(rows, PAYLOAD_SCHEMA)
    out = extract_features(payloads, decoder=pil_image_stats).collect()
    assert len(out) == 1
    assert out[0]["n_bytes"] == arr.size
    assert abs(out[0]["mean_byte"] - float(arr.mean())) < 1e-9


def test_real_wav_decodes_through_extract_features(spark, sf_dir):
    """decode_audio is a REAL stdlib-wave decoder (no optional deps):
    synthesize a 2-channel 16-bit WAV, check shape/values, then run
    it through the SAME Arrow pipeline via wav_audio_stats."""
    import io
    import wave as _wave

    import numpy as np

    from minisql_engine_spark.operators.multimodal import (
        PAYLOAD_SCHEMA,
        decode_audio,
        extract_features,
        wav_audio_stats,
    )

    samples = np.arange(-8, 8, dtype=np.int16).reshape(-1, 2)  # 8×2
    buf = io.BytesIO()
    with _wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(samples.tobytes())
    wav = buf.getvalue()

    arr = decode_audio(wav)
    assert arr.shape == (8, 2)
    assert (arr == samples).all()

    rows = [(1, "audio", 0, 0, bytearray(wav))]
    payloads = spark.createDataFrame(rows, PAYLOAD_SCHEMA)
    out = extract_features(payloads, decoder=wav_audio_stats).collect()
    assert len(out) == 1
    assert out[0]["n_bytes"] == samples.size
    assert abs(out[0]["mean_byte"] - float(samples.mean())) < 1e-9

    # non-WAV bytes keep the injectable-codec contract
    import pytest as _pt2

    with _pt2.raises(NotImplementedError):
        decode_audio(b"not a wav file")


def test_jsonl_roundtrip_with_explicit_schema(spark, sf_dir):
    """JSONL write → schema-explicit read must preserve rows and
    types; a corrupt line must land in _corrupt_record, not poison
    the good rows (PERMISSIVE)."""
    import glob
    import gzip

    from minisql_engine_spark.sources.writers import read_jsonl, write_jsonl

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, "docs_jsonl")
        write_jsonl(docs, path, partition_by=["source"], compression=None)
        assert any(d.startswith("source=") for d in os.listdir(path))
        back = read_jsonl(spark, path, schema="doc_id bigint, text string, source string")
        assert back.count() == docs.count()
        assert dict(back.dtypes)["doc_id"] == "bigint"
        # splittability contract: uncompressed jsonl is plain newline text
        part = sorted(glob.glob(os.path.join(path, "source=*", "part-*")))[0]
        with open(part, "rb") as f:
            assert f.read(1) == b"{"

        # corrupt-row isolation
        bad = os.path.join(tmp, "bad")
        os.makedirs(bad)
        with open(os.path.join(bad, "rows.jsonl"), "w") as f:
            f.write('{"doc_id": 1, "text": "ok", "source": "s"}\n')
            f.write("not json at all\n")
        got = read_jsonl(
            spark,
            bad,
            schema="doc_id bigint, text string, source string, _corrupt_record string",
        )
        rows = got.collect()
        assert len(rows) == 2
        corrupt = [r for r in rows if r["_corrupt_record"] is not None]
        assert len(corrupt) == 1 and corrupt[0]["doc_id"] is None

    # gzip sink writes .gz part files (file-per-split documented)
    with tempfile.TemporaryDirectory() as tmp:
        gz = os.path.join(tmp, "gz")
        write_jsonl(docs.limit(10), gz)
        parts = glob.glob(os.path.join(gz, "part-*.gz"))
        assert parts
        with gzip.open(parts[0], "rb") as f:
            assert f.read(1) == b"{"


def test_orc_roundtrip_pushdown_and_pruning(spark, sf_dir):
    """ORC must round-trip exactly and give the same scan-level
    guarantees as parquet: partition pruning + predicate pushdown +
    column pruning in the vectorized reader."""
    from minisql_engine_spark.sources.writers import read_orc, write_orc

    orders = load_table(spark, sf_dir, "orders").withColumn(
        "o_year", F.year("o_orderdate")
    )
    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, "orders_orc")
        write_orc(orders, path, partition_by=["o_year"])
        back = read_orc(spark, path)
        assert back.count() == orders.count()
        pruned = back.filter(F.col("o_year") == 1995).filter(
            F.col("o_custkey") == 7
        ).select("o_orderkey")
        plan = pruned._sc._jvm.PythonSQLUtils.explainString(
            pruned._jdf.queryExecution(), "formatted"
        )
        assert "PartitionFilters: [isnotnull(o_year" in plan
        assert "PushedFilters: [IsNotNull(o_custkey), EqualTo(o_custkey,7)]" in plan
        assert "ReadSchema: struct<o_orderkey:bigint" in plan


def test_pandas_topk_agrees_with_jvm_fold(spark, sf_dir):
    """The BLAS-batched top-k must return the same neighbor rankings
    as the exact JVM-fold path (scores may differ in the last rounded
    unit from summation order; rankings must not)."""
    from minisql_engine_spark.operators.similarity import (
        brute_force_topk,
        brute_force_topk_pandas,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    qids = [0, 1, 2, 3, 4]
    jvm = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in brute_force_topk(emb, qids, k=10).collect()
    }
    vec = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in brute_force_topk_pandas(emb, qids, k=10).collect()
    }
    assert len(jvm) == len(vec) == 50
    agree = sum(jvm[key] == vec[key] for key in jvm)
    assert agree >= 48  # ties at the rounded 6th decimal may swap


def test_multimodal_resize_rewrites_payload_and_meta(spark, sf_dir):
    from minisql_engine_spark.operators.multimodal import (
        resize_images,
        synthesize_payloads,
    )
    from minisql_engine_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents").limit(30)
    out = resize_images(synthesize_payloads(docs), width=32, height=32)
    rows = out.collect()
    assert len(rows) == 30
    assert all(r["width"] == 32 and r["height"] == 32 for r in rows)
    # fake resize targets (32*32)//256 = 4 bytes
    assert all(len(r["payload"]) == 4 for r in rows)
    # injectable resizer takes precedence
    out2 = resize_images(
        synthesize_payloads(docs),
        width=8,
        height=8,
        resizer=lambda b, w, h: b"\x01" * (w + h),
    ).collect()
    assert all(r["payload"] == b"\x01" * 16 for r in out2)


def test_multimodal_frame_sampling_partitions_payload(spark, sf_dir):
    from minisql_engine_spark.operators.multimodal import (
        sample_frames,
        synthesize_payloads,
    )
    from minisql_engine_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents").limit(60)
    payloads = synthesize_payloads(docs)
    frames = sample_frames(payloads, n_frames=4).collect()
    by_doc = {}
    for r in frames:
        by_doc.setdefault(r["doc_id"], []).append(r)
    orig = {r["doc_id"]: (r["modality"], r["payload"]) for r in payloads.collect()}
    for doc_id, rows in by_doc.items():
        modality, payload = orig[doc_id]
        rows.sort(key=lambda r: r["frame_idx"])
        if modality == "video":
            assert len(rows) == 4
            # plumbing invariant: frames reassemble the payload
            assert b"".join(r["frame_bytes"] for r in rows) == payload
        else:
            assert len(rows) == 1 and rows[0]["frame_bytes"] == payload
    assert set(by_doc) == set(orig)


def test_truncated_wav_keeps_codec_contract(spark):
    """A WAV with a truncated data chunk (odd byte count at width=2)
    must surface NotImplementedError — the injectable-codec
    contract — not a raw numpy ValueError that fails the Arrow
    batch."""
    import io
    import wave as _wave

    import numpy as np
    import pytest as _pt3

    from minisql_engine_spark.operators.multimodal import decode_audio

    buf = io.BytesIO()
    with _wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(np.arange(8, dtype=np.int16).tobytes())
    truncated = buf.getvalue()[:-1]  # odd data-chunk length
    with _pt3.raises(NotImplementedError):
        decode_audio(truncated)


def _build_test_avi(frames_px, width, height):
    """Minimal spec-faithful uncompressed AVI: RIFF('AVI ',
    LIST(hdrl: avih + LIST(strl: strh+strf)), LIST(movi: 00db...)).
    ``frames_px`` is a list of (h, w, 3) uint8 BGR top-down arrays."""
    import struct

    import numpy as np

    def chunk(fourcc, body):
        pad = b"\x00" if len(body) % 2 else b""
        return fourcc + struct.pack("<I", len(body)) + body + pad

    def lst(subtype, body):
        return chunk(b"LIST", subtype + body)

    stride = (width * 3 + 3) & ~3
    frame_chunks = b""
    for f in frames_px:
        rows = []
        for y in range(height - 1, -1, -1):  # bottom-up storage
            row = f[y].tobytes()
            rows.append(row + b"\x00" * (stride - len(row)))
        frame_chunks += chunk(b"00db", b"".join(rows))
    avih = chunk(b"avih", struct.pack("<14I", 33333, 0, 0, 0, len(frames_px), 0, 1, 0, width, height, 0, 0, 0, 0))
    strh = chunk(b"strh", b"vids" + b"DIB " + struct.pack("<12I", 0, 0, 0, 1, 30, 0, len(frames_px), 0, 0, 0, 0, 0))
    # BITMAPINFOHEADER: biSize, biWidth, biHeight, planes+bpp, biCompression(0=BI_RGB), ...
    strf = chunk(b"strf", struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, stride * height, 0, 0, 0, 0))
    hdrl = lst(b"hdrl", avih + lst(b"strl", strh + strf))
    movi = lst(b"movi", frame_chunks)
    riff_body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def test_real_avi_decodes_through_frame_sampling(spark):
    """decode_video is a REAL stdlib RIFF/BI_RGB parser: build a
    spec-faithful 2-frame AVI, decode it, and drive it through the
    SAME Arrow pipelines via avi_video_stats / avi_frame_extractor."""
    import numpy as np

    from minisql_engine_spark.operators.multimodal import (
        PAYLOAD_SCHEMA,
        avi_frame_extractor,
        avi_video_stats,
        decode_video,
        extract_features,
        sample_frames,
    )

    w, h = 5, 3
    f0 = np.arange(h * w * 3, dtype=np.uint8).reshape(h, w, 3)
    f1 = np.full((h, w, 3), 200, dtype=np.uint8)
    avi = _build_test_avi([f0, f1], w, h)

    frames = decode_video(avi)
    assert len(frames) == 2
    assert frames[0].shape == (h, w, 3)
    assert (frames[0] == f0).all() and (frames[1] == f1).all()

    n_px, mean = avi_video_stats(avi)
    assert n_px == 2 * h * w * 3
    expected_mean = float(
        np.concatenate([f0.reshape(-1), f1.reshape(-1)]).mean()
    )
    assert abs(mean - expected_mean) < 1e-9

    rows = [(1, "video", 0, 0, bytearray(avi))]
    payloads = spark.createDataFrame(rows, PAYLOAD_SCHEMA)
    out = extract_features(payloads, decoder=avi_video_stats).collect()
    assert out[0]["n_bytes"] == n_px

    sampled = sample_frames(
        payloads, n_frames=2, frame_extractor=avi_frame_extractor
    ).collect()
    assert len(sampled) == 2
    got0 = np.frombuffer(bytes(sampled[0]["frame_bytes"]), dtype=np.uint8)
    assert (got0.reshape(h, w, 3) == f0).all()


def test_compressed_or_corrupt_avi_keeps_codec_contract():
    import pytest as _pytest

    from minisql_engine_spark.operators.multimodal import decode_video

    with _pytest.raises(NotImplementedError):
        decode_video(b"not a riff at all")
    # a real RIFF but compressed (biCompression != 0)
    import struct

    import numpy as np

    avi = bytearray(
        _build_test_avi([np.zeros((2, 2, 3), np.uint8)], 2, 2)
    )
    idx = avi.find(struct.pack("<IiiHH", 40, 2, 2, 1, 24))
    avi[idx + 16 : idx + 20] = struct.pack("<I", 1)  # BI_RLE8
    with _pytest.raises(NotImplementedError):
        decode_video(bytes(avi))


def test_coverage_rotation_table_current():
    """COVERAGE.md's rotation ledger must equal a fresh render from
    the driver registry (r5 verdict task 9): window names, their
    oracle status, and the archived list can never drift from
    __spark_entry__.py. Regenerate with `python tools/gen_rotation.py`
    after any rotation."""
    import os

    from tools.gen_rotation import BEGIN, END, render

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "COVERAGE.md")) as f:
        doc = f.read()
    assert BEGIN in doc and END in doc, "generated ledger section missing"
    committed = doc[doc.index(BEGIN) : doc.index(END) + len(END)]
    assert committed == render(), (
        "COVERAGE.md rotation ledger is stale — run "
        "python tools/gen_rotation.py"
    )


def test_coverage_upper_cells_consistent_with_registry():
    """The HAND-WRITTEN upper tables of COVERAGE.md (the per-row
    "Driver query (oracle?)" cells) can no longer disagree with the
    registry (r6 verdict "What's wrong" #2): a `name` ✓ claim must
    point at an oracled registry entry, every oracled WINDOW entry
    must carry its ✓ somewhere above the generated ledger (so a
    promotion that forgets to update its cell fails here), and every
    rows-only window entry must at least be mentioned."""
    import os
    import re

    import importlib

    em = importlib.import_module("__spark_entry__")
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "COVERAGE.md")) as f:
        doc = f.read()
    upper = doc.split("<!-- BEGIN GENERATED ROTATION LEDGER")[0]
    checked = set(re.findall(r"`(\w+)` ✓", upper))
    window = set(em.queries())
    oracled = set(em.oracle_sql())
    all_oracled = oracled | set(em.archived_oracle_sql())
    phantom = checked - all_oracled
    assert not phantom, (
        f"COVERAGE.md marks {sorted(phantom)} ✓ but the registry has "
        "no oracle for them"
    )
    stale = {n for n in window & oracled if n not in checked}
    assert not stale, (
        f"window entries {sorted(stale)} are oracled but their "
        "COVERAGE.md upper-table cells don't say `name` ✓ — update "
        "the row that promoted them"
    )
    unmentioned = {
        n for n in window - oracled if f"`{n}`" not in upper
    }
    assert not unmentioned, (
        f"rows-only window entries {sorted(unmentioned)} are not "
        "mentioned in COVERAGE.md's upper tables"
    )


def test_coverage_driver_history_current():
    """COVERAGE.md's driver-certification history must equal a fresh
    render from the CORRECTNESS_r*.json files (r8 verdict task 3 —
    the ledger claimed `embedding_drift` ✓ while the driver had never
    hash-certified it).

    VERDICT r10 task 1: the driver writes CORRECTNESS_r{N}.json AFTER
    the builder's final round-N commit, so an unrestricted compare
    reddened a tree that was green at commit time (r9, r10). The
    compare is therefore restricted to rounds <= the newest round the
    committed ledger already includes, and a separate staleness rail
    allows AT MOST ONE on-disk CORRECTNESS file newer than that —
    the single post-commit landing. A builder who forgets to run
    `python tools/gen_driver_history.py` at round open leaves TWO
    newer files behind once their own round's file lands, so the next
    round's first pytest run still fails."""
    import os
    import re

    from tools.gen_driver_history import BEGIN, END, on_disk_rounds, render

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "COVERAGE.md")) as f:
        doc = f.read()
    assert BEGIN in doc and END in doc, "driver-history section missing"
    committed = doc[doc.index(BEGIN) : doc.index(END) + len(END)]
    committed_rounds = {int(m) for m in re.findall(r"\br(\d+)\b", committed)}
    assert committed_rounds, "committed ledger names no rounds"
    newest_committed = max(committed_rounds)
    assert committed == render(max_round=newest_committed), (
        "COVERAGE.md driver history disagrees with the CORRECTNESS "
        f"files for rounds <= r{newest_committed} — run "
        "python tools/gen_driver_history.py"
    )
    newer = [r for r in on_disk_rounds() if r > newest_committed]
    assert len(newer) <= 1, (
        f"COVERAGE.md driver history ends at r{newest_committed} but "
        f"rounds {newer} have CORRECTNESS files on disk; only the one "
        "post-commit landing is tolerated — run "
        "python tools/gen_driver_history.py"
    )


def test_coverage_no_unqualified_check_on_driver_failed_entries():
    """Any entry whose LAST driver verdict is FAIL must not carry an
    unqualified `name` ✓ claim in the hand-written tables above the
    generated sections."""
    import glob
    import json
    import os
    import re

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    last: dict[str, str] = {}
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        with open(path) as f:
            for name, rec in json.load(f).items():
                if rec.get("err") == "no_oracle":
                    last[name] = "rows-only"
                elif (
                    rec.get("rows_match")
                    and rec.get("schema_match")
                    and rec.get("hash_match")
                ):
                    last[name] = "green"
                else:
                    last[name] = "FAIL"
    with open(os.path.join(root, "COVERAGE.md")) as f:
        doc = f.read()
    upper = doc[: doc.index("## Rotation ledger")]
    offenders = []
    for name, status in last.items():
        if status != "FAIL":
            continue
        for line in upper.splitlines():
            if re.search(rf"`{re.escape(name)}` ✓", line) and (
                "FAIL" not in line
            ):
                offenders.append(name)
    assert not offenders, (
        f"entries with a FAILED last driver verdict carry a ✓ in "
        f"COVERAGE.md without disclosing the FAIL on the same row: "
        f"{offenders}"
    )
