"""Unicode normalization (NFC oracle parity, NFKC folding, control
stripping, dedup composition) and perceptual image hashing (dHash
determinism, banding exhaustiveness, near-dup pairs vs a local
brute-force reference)."""

from __future__ import annotations

import unicodedata

import duckdb
import pytest
from pyspark.sql import functions as F

from minisql_engine_spark.operators.normalize import (
    normalize_text,
    normalize_text_sql,
)

COMPOSED = "café"            # é as one codepoint
DECOMPOSED = "café"         # e + combining acute


def test_nfc_matches_duckdb_oracle(spark):
    rows = [
        (1, COMPOSED),
        (2, DECOMPOSED),
        (3, "plain ascii"),
        (4, None),
        (5, "ﬁnal Ａ mix"),   # ﬁ ligature + fullwidth A (NFC keeps)
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {
        r["doc_id"]: r["text_norm"]
        for r in normalize_text(df, form="NFC")
        .select("doc_id", "text_norm")
        .collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t (doc_id BIGINT, text VARCHAR)"
    )
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    want = dict(
        con.execute(
            normalize_text_sql("t")
        ).fetchall()
    )
    assert got == want
    assert got[1] == got[2] == COMPOSED  # NFC composes


def test_nfkc_folds_compatibility_forms(spark):
    df = spark.createDataFrame(
        [(1, "ﬁne ＡＢ"), (2, "①")],  # ﬁ, ＡＢ, ①
        "doc_id bigint, text string",
    )
    got = {
        r["doc_id"]: r["text_norm"]
        for r in normalize_text(df, form="NFKC").collect()
    }
    assert got[1] == "fine AB"
    assert got[2] == "1"


def test_strip_controls_removes_invisibles(spark):
    df = spark.createDataFrame(
        [(1, "a\u200bb\u00adc\x01d keep\ttab\nline")],
        "doc_id bigint, text string",
    )
    got = normalize_text(df, strip_controls=True).first()["text_norm"]
    assert got == "abcd keep\ttab\nline"


def test_invalid_form_rejected(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id bigint, text string")
    with pytest.raises(ValueError, match="normalization form"):
        normalize_text(df, form="NFX")


def test_normalization_unfragments_dedup(spark):
    """The motivating property: composed and decomposed spellings of
    the same text are DIFFERENT contents to the exact-dedup hash
    until normalization runs first."""
    from minisql_engine_spark.operators.dedup import exact_dedup

    df = spark.createDataFrame(
        [(1, COMPOSED), (2, DECOMPOSED)], "doc_id bigint, text string"
    )
    assert exact_dedup(df).count() == 2  # fragmented without NFC
    normed = normalize_text(df, out_col="text2").select(
        "doc_id", F.col("text2").alias("text")
    )
    assert exact_dedup(normed).count() == 1


# ---------------------------------------------------------------------------
# dHash + image near-dups
# ---------------------------------------------------------------------------


def test_dhash_deterministic_and_gradient():
    import numpy as np

    from minisql_engine_spark.operators.multimodal import dhash64

    a = np.arange(256, dtype=np.uint8).reshape(16, 16)
    assert dhash64(a) == dhash64(a.copy())
    # strictly increasing columns → every horizontal comparison true
    grad = np.tile(np.arange(9, dtype=np.uint8) * 20, (8, 1))
    assert dhash64(grad) == (1 << 64) - 1
    # strictly decreasing → no bit set
    assert dhash64(grad[:, ::-1].copy()) == 0
    # RGB input collapses to grayscale (same hash as its mean plane)
    rgb = np.stack([a, a, a], axis=2)
    assert dhash64(rgb) == dhash64(a)


def test_dhash_small_edit_small_distance():
    import numpy as np

    from minisql_engine_spark.operators.multimodal import dhash64

    a = np.arange(256, dtype=np.uint8).reshape(16, 16)
    b = a.copy()
    b[0, 0] = 255
    d = bin(dhash64(a) ^ dhash64(b)).count("1")
    assert d <= 3


def test_image_near_dups_matches_brute_force(spark):
    """Distributed pairs == local brute force with the same decoder
    and hash over the same payloads (the pytest-oracle tier the
    multimodal family documents)."""
    from minisql_engine_spark.operators.multimodal import (
        _fake_image_array,
        dhash64,
        image_near_dups,
        synthesize_payloads,
    )

    base = spark.range(0, 60).select(F.col("id").alias("doc_id"))
    pay = synthesize_payloads(base).select("doc_id", "payload")
    # plant exact perceptual duplicates under new ids (same payload)
    dups = pay.filter(F.col("doc_id") < 6).select(
        (F.col("doc_id") + 1000).alias("doc_id"), "payload"
    )
    all_pay = pay.unionByName(dups)
    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in image_near_dups(all_pay, max_hamming=3).collect()
    }
    rows = all_pay.collect()
    hashes = {
        r["doc_id"]: dhash64(_fake_image_array(bytes(r["payload"])))
        for r in rows
    }
    want = set()
    ids = sorted(hashes)
    for i, ai in enumerate(ids):
        for bi in ids[i + 1 :]:
            d = bin(hashes[ai] ^ hashes[bi]).count("1")
            if d <= 3:
                want.add((ai, bi, d))
    assert got == want
    # the planted exact duplicates are all found at hamming 0
    assert all((i, i + 1000, 0) in got for i in range(6))


def test_image_dhash_real_frame_decoder(spark):
    """The decoder slot composes with the REAL stdlib AVI frame
    decoder: hash a video's first frame through the distributed path
    and match the local computation."""
    import numpy as np

    from minisql_engine_spark.operators.multimodal import (
        dhash64,
        decode_video,
        image_dhash,
    )
    from tests.test_extensions2 import _build_test_avi

    w, h = 16, 8
    f0 = (np.arange(h * w * 3, dtype=np.uint32) % 256).astype(
        np.uint8
    ).reshape(h, w, 3)
    payload = _build_test_avi([f0], w, h)
    df = spark.createDataFrame(
        [(1, bytearray(payload))], "doc_id bigint, payload binary"
    )

    def first_frame(p: bytes):
        return decode_video(p)[0]

    got = image_dhash(df, decoder=first_frame).first()["dhash"]
    want = dhash64(decode_video(payload)[0])
    want_signed = want - (1 << 64) if want >= 1 << 63 else want
    assert got == want_signed


# ---------------------------------------------------------------------------
# Audio fingerprint + near-dups
# ---------------------------------------------------------------------------


def _sine_wav_samples(freqs, n=4096, rate=8000, amp=8000, noise=0):
    """Deterministic int16 mono harmonic mixture (1/k amplitude
    rolloff — broadband like real audio, so every band carries
    energy) + optional seeded noise, as an (n, 1) array."""
    import numpy as np

    t = np.arange(n) / rate
    x = sum(
        (1.0 / (i + 1)) * np.sin(2 * np.pi * f * t)
        for i, f in enumerate(freqs)
    ) * (amp / 2)
    if noise:
        rng = np.random.RandomState(7)
        x = x + rng.normal(0, noise, n)
    return np.clip(x, -32768, 32767).astype("int16").reshape(-1, 1)

RICH = [90, 200, 330, 470, 650, 900, 1300, 1900, 2600, 3300]
OTHER = [130, 260, 410, 560, 780, 1100, 1600, 2200, 2900, 3600]


def test_audio_fingerprint_invariances():
    import numpy as np

    from minisql_engine_spark.operators.multimodal import (
        audio_fingerprint,
    )

    a = _sine_wav_samples(RICH)
    fp = audio_fingerprint(a)
    assert len(fp) == 4096 // 256 - 1  # first frame skipped
    assert all(0 <= v < 1 << 16 for v in fp)
    # deterministic
    assert fp == audio_fingerprint(a.copy())
    # volume-near-invariant: halving amplitude (with int16
    # re-quantization — exact scaling is exactly invariant) flips at
    # most a stray tie bit
    half = audio_fingerprint((a * 0.5).astype("int16"))
    ber_half = sum(
        bin(x ^ y).count("1") for x, y in zip(fp, half)
    ) / (len(fp) * 16)
    assert ber_half < 0.02
    # mild noise flips few bits per frame
    noisy = _sine_wav_samples(RICH, noise=50)
    fpn = audio_fingerprint(noisy)
    ber = sum(bin(x ^ y).count("1") for x, y in zip(fp, fpn)) / (
        len(fp) * 16
    )
    assert ber < 0.25
    # a different recording is far away
    other = audio_fingerprint(_sine_wav_samples(OTHER))
    ber2 = sum(bin(x ^ y).count("1") for x, y in zip(fp, other)) / (
        len(fp) * 16
    )
    assert ber2 > ber


def test_audio_near_dups_finds_noisy_copy_not_stranger(spark):
    from minisql_engine_spark.operators.multimodal import (
        audio_near_dups,
        decode_audio,
    )
    import io
    import wave as _wave

    def wav_bytes(samples):
        buf = io.BytesIO()
        with _wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(8000)
            w.writeframes(samples.tobytes())
        return buf.getvalue()

    clean = _sine_wav_samples(RICH)
    noisy = _sine_wav_samples(RICH, noise=50)
    stranger = _sine_wav_samples(OTHER)
    df = spark.createDataFrame(
        [
            (1, bytearray(wav_bytes(clean))),
            (2, bytearray(wav_bytes(noisy))),
            (3, bytearray(wav_bytes(stranger))),
        ],
        "doc_id bigint, payload binary",
    )
    pairs = {
        (r["id_a"], r["id_b"]): r["ber"]
        for r in audio_near_dups(df, decoder=decode_audio).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] < 0.25
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_audio_fingerprints_distributed_match_local(spark):
    """The Arrow path equals the local computation payload for
    payload (fake decoder, md5 payloads)."""
    from minisql_engine_spark.operators.multimodal import (
        _fake_audio_array,
        audio_fingerprint,
        audio_fingerprints,
        synthesize_payloads,
    )

    base = spark.range(0, 20).select(F.col("id").alias("doc_id"))
    pay = synthesize_payloads(base).select("doc_id", "payload")
    got = {}
    for r in audio_fingerprints(pay).collect():
        got.setdefault(r["doc_id"], {})[r["frame_idx"]] = r["fp"]
    for r in pay.collect():
        want = audio_fingerprint(_fake_audio_array(bytes(r["payload"])))
        assert [got[r["doc_id"]][i] for i in range(len(want))] == want


def test_null_payloads_pass_through_not_crash(spark):
    """NULL binary payloads follow the text operators' rule: NULL in,
    NULL (or zero frames) out — never a batch-killing TypeError. And
    a NULL row must not perturb its batch-mates' 64-bit hashes
    (object-dtype guard against float64 coercion)."""
    from pyspark.sql.types import (
        BinaryType,
        LongType,
        StructField,
        StructType,
    )

    from minisql_engine_spark.operators.multimodal import (
        _fake_image_array,
        audio_fingerprints,
        dhash64,
        image_dhash,
        synthesize_payloads,
    )

    base = spark.range(0, 8).select(F.col("id").alias("doc_id"))
    pay = synthesize_payloads(base).select("doc_id", "payload")
    null_row = spark.createDataFrame(
        [(999, None)],
        StructType(
            [
                StructField("doc_id", LongType()),
                StructField("payload", BinaryType()),
            ]
        ),
    )
    mixed = pay.unionByName(null_row).coalesce(1)  # same Arrow batch

    hashes = {
        r["doc_id"]: r["dhash"] for r in image_dhash(mixed).collect()
    }
    assert hashes[999] is None
    payloads = {r["doc_id"]: bytes(r["payload"]) for r in pay.collect()}
    for did, p in payloads.items():
        want = dhash64(_fake_image_array(p))
        want = want - (1 << 64) if want >= 1 << 63 else want
        assert hashes[did] == want, f"doc {did} hash perturbed"

    fps = audio_fingerprints(mixed)
    assert fps.filter(F.col("doc_id") == 999).count() == 0
    assert fps.filter(F.col("doc_id") != 999).count() > 0


def test_tone_decoder_near_dups_structure(spark, sf_dir):
    """The driver's audio_near_dups corpus (byte-parameterized tone
    clips, 4 exact + 4 perturbed copies): exactly the 12 implied
    pairs surface — exact pairs at BER 0, noisy pairs at small
    nonzero BER — and no stranger pair passes the verify. Pinned by
    local brute force over the same decoder + fingerprint."""
    import numpy as np

    from minisql_engine_spark.operators.multimodal import (
        audio_fingerprint,
        audio_near_dups,
        byte_tone_decoder,
        perceptual_corpus,
    )
    from minisql_engine_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    corpus = perceptual_corpus(docs, n=40, n_dups=4, n_noisy=4)
    rows = audio_near_dups(corpus, decoder=byte_tone_decoder).collect()
    got = {(r["id_a"], r["id_b"]): r["ber"] for r in rows}

    # local brute force with the same decoder and fingerprints
    payloads = {
        r["doc_id"]: bytes(r["payload"]) for r in corpus.collect()
    }
    fps = {
        did: audio_fingerprint(byte_tone_decoder(p))
        for did, p in payloads.items()
    }
    expect = {}
    ids = sorted(fps)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            fa, fb = fps[a], fps[b]
            n = min(len(fa), len(fb))
            if n == 0 or not any(x == y for x, y in zip(fa, fb)):
                continue  # no exact sub-fingerprint collision
            errs = sum(
                bin((x ^ y) & 0xFFFF).count("1")
                for x, y in zip(fa[:n], fb[:n])
            )
            ber = errs / (n * 16.0)
            if ber <= 0.25:
                expect[(a, b)] = ber
    assert set(got) == set(expect)
    for k in got:
        assert abs(got[k] - expect[k]) < 1e-9, k
    exact = {k for k in got if k[1] - k[0] == 1000 and k[0] < 1000}
    noisy = {k for k in got if k[1] >= 2000}
    assert len(exact) == 4 and all(got[k] == 0.0 for k in exact)
    assert len(noisy) == 8 and all(got[k] > 0.0 for k in noisy)
    assert len(got) == 12  # no strangers
