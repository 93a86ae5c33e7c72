"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Treats image/audio/video as ``BinaryType`` columns with a typed
metadata struct, and implements decode / feature-extract as
Arrow-batched ``mapInPandas`` transforms (§2.4 multimodal mandate).

The container has no image/audio libraries, so the actual codec step
is STUBBED: ``decode_image``/``decode_audio`` raise
``NotImplementedError`` with a clear message, and the pipeline runs a
deterministic fake decode (byte statistics of the payload) instead.
Everything around the stub — schema, binary handling, Arrow batch
shape, partitioning — is real and tested.

Scale notes: payloads stay distributed end-to-end (never collected);
``mapInPandas`` streams Arrow record batches per partition, so Python
memory is bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch``
regardless of table size; feature extraction is embarrassingly
parallel (no shuffle).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: Output schema of the feature extractor — explicit, stable.
FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("modality", StringType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("n_bytes", LongType()),
        StructField("mean_byte", DoubleType()),
    ]
)

PAYLOAD_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("modality", StringType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("payload", BinaryType()),
    ]
)


def synthesize_payloads(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach a deterministic fake binary payload + typed metadata.

    Payload = md5 digest bytes of the id (16 opaque bytes) — a
    deterministic stand-in for real image/audio bytes that the SQL
    oracle can reproduce arithmetically. Metadata (modality, width,
    height) derives from the id. Pure map-side.
    """
    did = F.col(id_col).cast("bigint")
    return docs.select(
        did.alias("doc_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (did % 3 + 1).cast("int"),
        ).alias("modality"),
        (F.lit(64) + (did % 8) * 32).alias("width"),
        (F.lit(64) + (did % 5) * 48).alias("height"),
        F.unhex(F.md5(did.cast("string"))).alias("payload"),
    )


def decode_image(payload: bytes) -> "object":
    """Decode an image payload into an H×W[×C] uint8 array.

    Uses Pillow automatically when it is importable on the executor
    (guarded import — the library is optional); otherwise raises
    ``NotImplementedError``. The Spark-side plumbing (binary column →
    Arrow batch → per-row bytes) is identical either way, so
    environments with Pillow get real decoding with no code changes.
    """
    try:
        from PIL import Image
    except ImportError:
        raise NotImplementedError(
            "image decoding requires Pillow, which is not installed; "
            "pip install Pillow (or inject a custom decoder) to enable"
        ) from None
    import io

    import numpy as np

    with Image.open(io.BytesIO(payload)) as img:
        return np.asarray(img)


def pil_image_stats(payload: bytes) -> tuple[int, float]:
    """Real-codec drop-in for ``extract_features``'s ``decoder``
    slot: decodes with Pillow and returns (n_pixels, mean_pixel) —
    same ``bytes -> (count, mean)`` contract as the deterministic
    fake. Raises ``NotImplementedError`` without Pillow."""
    arr = decode_image(payload)
    return int(arr.size), (float(arr.mean()) if arr.size else 0.0)


def default_image_decoder():
    """The decoder ``extract_features`` should use for IMAGE columns:
    :func:`pil_image_stats` when Pillow imports, else the
    deterministic fake (byte statistics, oracle-reproducible). The
    choice happens ONCE on the driver; the chosen callable is what
    ships to executors."""
    try:
        import PIL  # noqa: F401

        return pil_image_stats
    except ImportError:
        return _fake_decode_stats


def decode_audio(payload: bytes) -> "object":
    """Decode a WAV/PCM audio payload into an (n_frames, n_channels)
    int16 array using ONLY the stdlib ``wave`` module — a REAL
    decoder with zero optional dependencies (compressed formats
    would need soundfile/librosa; inject a custom decoder for
    those). Raises ``NotImplementedError`` for non-WAV bytes so the
    injectable-codec contract matches ``decode_image``."""
    import io
    import wave

    import numpy as np

    try:
        with wave.open(io.BytesIO(payload), "rb") as w:
            n_ch = w.getnchannels()
            width = w.getsampwidth()
            frames = w.readframes(w.getnframes())
    except (wave.Error, EOFError) as e:
        raise NotImplementedError(
            f"payload is not an uncompressed WAV ({e}); wire "
            "soundfile/librosa (or inject a decoder) for compressed "
            "audio"
        ) from None
    try:
        if width == 2:
            arr = np.frombuffer(frames, dtype=np.int16)
        elif width == 1:
            # WAV 8-bit is unsigned; center to the int16 contract
            arr = (
                np.frombuffer(frames, dtype=np.uint8).astype(np.int16)
                - 128
            ) * 256
        else:
            raise NotImplementedError(
                f"unsupported WAV sample width {width} (1/2 bytes handled)"
            )
        return arr.reshape(-1, n_ch)
    except ValueError as e:
        # truncated data chunk / frame count not divisible by the
        # channel count — undecodable bytes keep the same contract
        # as a bad container, they must not fail the Arrow UDF batch
        raise NotImplementedError(
            f"corrupt WAV payload ({e}); inject a tolerant decoder "
            "to handle truncated audio"
        ) from None


def wav_audio_stats(payload: bytes) -> tuple[int, float]:
    """Real-codec drop-in for ``extract_features``'s AUDIO decoder
    slot: (n_samples, mean_sample) from :func:`decode_audio` — the
    same ``bytes -> (count, mean)`` contract as the deterministic
    fake."""
    arr = decode_audio(payload)
    return int(arr.size), (float(arr.mean()) if arr.size else 0.0)


def _fake_decode_stats(payload: bytes) -> tuple[int, float]:
    """Deterministic fake decode: byte count + mean byte value."""
    n = len(payload)
    return n, (sum(payload) / n if n else 0.0)


def extract_features(
    with_payloads: DataFrame,
    decoder=None,
) -> DataFrame:
    """Feature extraction over binary payloads via ``mapInPandas``.

    Arrow-batched: each partition arrives as an iterator of pandas
    DataFrames; per-row byte processing happens in numpy/pure Python,
    output rows follow ``FEATURE_SCHEMA``.

    ``decoder`` is an injectable codec — a picklable callable
    ``bytes -> (n_bytes, mean_value)`` shipped to executors inside
    the Arrow UDF, so production users wire Pillow/librosa WITHOUT
    editing this module (e.g. ``lambda b: real_image_stats(b)``
    calling :func:`decode_image`). Default stays the deterministic
    fake (byte statistics) that the SQL oracle can reproduce.
    """
    decode = decoder or _fake_decode_stats

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            stats = pdf["payload"].map(decode)
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "modality": pdf["modality"],
                    "width": pdf["width"],
                    "height": pdf["height"],
                    "n_bytes": stats.map(lambda t: t[0]),
                    "mean_byte": stats.map(lambda t: t[1]),
                }
            )
            yield out

    return with_payloads.mapInPandas(run, schema=FEATURE_SCHEMA)


# ---------------------------------------------------------------------------
# Resize + frame sampling (the remaining §2.4 multimodal verbs)
# ---------------------------------------------------------------------------

RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("modality", StringType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("payload", BinaryType()),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("n_frames", LongType()),
        StructField("frame_bytes", BinaryType()),
    ]
)


def _fake_resize(payload: bytes, w: int, h: int) -> bytes:
    """Deterministic fake resize: cycle the payload bytes to a length
    proportional to the target area (capped) — honest about doing no
    image math, while giving the pipeline a real, size-changed binary
    to carry."""
    if not payload:
        return b""
    target = max(1, min((w * h) // 256, 4096))
    reps = target // len(payload) + 1
    return (payload * reps)[:target]


def resize_images(
    with_payloads: DataFrame,
    width: int = 64,
    height: int = 64,
    resizer=None,
) -> DataFrame:
    """Resize every payload to (width, height) via ``mapInPandas``.

    ``resizer`` is the injectable codec ``(bytes, w, h) -> bytes``
    (wire Pillow's ``Image.resize`` in production); the default is a
    deterministic fake. Metadata is rewritten to the target
    dimensions so downstream consumers see a consistent contract.
    Map-side only; binary columns ride Arrow in both directions.
    """
    do_resize = resizer or _fake_resize

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "modality": pdf["modality"],
                    "width": width,
                    "height": height,
                    "payload": pdf["payload"].map(
                        lambda b: do_resize(b, width, height)
                    ),
                }
            )

    return with_payloads.mapInPandas(run, schema=RESIZED_SCHEMA)


def sample_frames(
    with_payloads: DataFrame,
    n_frames: int = 4,
    frame_extractor=None,
) -> DataFrame:
    """Sample ``n_frames`` evenly-spaced frames from each video
    payload — a one-to-many mapInPandas (each input row yields up to
    ``n_frames`` output rows, the UDTF shape for binary media).

    ``frame_extractor`` is the injectable codec
    ``(bytes, frame_idx, n_frames) -> bytes`` (wire pyav/ffmpeg in
    production). The default fake slices the payload into
    ``n_frames`` even byte-ranges — deterministic, and it preserves
    the invariant that concatenating the frames restores the
    payload, which the tests use as the plumbing check. Non-video
    rows are passed through as a single frame (frame_idx 0)."""
    extract = frame_extractor or (
        lambda b, i, n: b[
            (i * len(b)) // n : ((i + 1) * len(b)) // n
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {
                "doc_id": [], "frame_idx": [], "n_frames": [],
                "frame_bytes": [],
            }
            for _, r in pdf.iterrows():
                n = n_frames if r["modality"] == "video" else 1
                for i in range(n):
                    rows["doc_id"].append(r["doc_id"])
                    rows["frame_idx"].append(i)
                    rows["n_frames"].append(n)
                    rows["frame_bytes"].append(
                        extract(r["payload"], i, n)
                    )
            yield pd.DataFrame(rows)

    return with_payloads.mapInPandas(run, schema=FRAME_SCHEMA)


def decode_video(payload: bytes) -> "list":
    """Decode an uncompressed AVI (RIFF / BI_RGB 24-bit) payload into
    a list of (height, width, 3) uint8 BGR frame arrays using ONLY
    stdlib ``struct`` parsing — a REAL container decoder with zero
    optional dependencies, completing the video modality the way the
    stdlib ``wave`` codec completed audio. Compressed codecs
    (MJPEG/H.264 …) raise ``NotImplementedError`` — wire
    pyav/ffmpeg (or inject a decoder) for those; the Spark plumbing
    is codec-agnostic either way.

    Parser: RIFF walker over 'AVI ' → 'hdrl' (BITMAPINFOHEADER in
    'strf' gives width/height/bpp/compression) → 'movi' ('..db'/'..dc'
    chunks are frames; rows are bottom-up BGR, padded to 4 bytes)."""
    import struct

    import numpy as np

    def bad(msg: str) -> "NotImplementedError":
        return NotImplementedError(
            f"payload is not an uncompressed AVI ({msg}); wire "
            "pyav/ffmpeg (or inject a decoder) for compressed video"
        )

    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise bad("missing RIFF/AVI header")

    width = height = bpp = None
    compression = None
    frames: list[bytes] = []

    def walk(buf: bytes, off: int, end: int) -> None:
        nonlocal width, height, bpp, compression
        while off + 8 <= end:
            fourcc = buf[off : off + 4]
            (size,) = struct.unpack("<I", buf[off + 4 : off + 8])
            body = off + 8
            if body + size > end:
                raise bad(f"chunk {fourcc!r} overruns container")
            if fourcc == b"LIST":
                walk(buf, body + 4, body + size)  # skip list subtype
            elif fourcc == b"strf" and size >= 20 and width is None:
                # BITMAPINFOHEADER: biWidth @4, biHeight @8, biBitCount
                # @14, biCompression @16 (only the FIRST strf — the
                # video stream header precedes any audio stream's)
                width, height = struct.unpack("<ii", buf[body + 4 : body + 12])
                (bpp,) = struct.unpack("<H", buf[body + 14 : body + 16])
                (compression,) = struct.unpack(
                    "<I", buf[body + 16 : body + 20]
                )
            elif fourcc[2:4] in (b"db", b"dc") and size > 0:
                frames.append(buf[body : body + size])
            off = body + size + (size & 1)  # chunks pad to even

    walk(payload, 12, len(payload))
    if width is None:
        raise bad("no video stream format (strf) found")
    if compression != 0 or bpp != 24:
        raise bad(
            f"compression={compression} bpp={bpp}; only BI_RGB 24-bit"
            " is decodable without a codec library"
        )
    h = abs(height)
    stride = (width * 3 + 3) & ~3  # BMP rows pad to 4 bytes
    out = []
    for f in frames:
        if len(f) < stride * h:
            raise bad(f"frame holds {len(f)} bytes < {stride * h}")
        arr = np.frombuffer(f[: stride * h], dtype=np.uint8).reshape(
            h, stride
        )[:, : width * 3].reshape(h, width, 3)
        if height > 0:  # positive biHeight = bottom-up rows
            arr = arr[::-1]
        out.append(arr)
    return out


def avi_video_stats(payload: bytes) -> tuple[int, float]:
    """Real-codec drop-in for ``extract_features``'s VIDEO decoder
    slot: (total pixel-channel count across frames, mean value) from
    :func:`decode_video` — the same ``bytes -> (count, mean)``
    contract as the deterministic fake."""
    import numpy as np

    frames = decode_video(payload)
    if not frames:
        return 0, 0.0
    flat = np.concatenate([f.reshape(-1) for f in frames])
    return int(flat.size), float(flat.mean())


def avi_frame_extractor(payload: bytes, i: int, n: int) -> bytes:
    """Real frame sampler for :func:`sample_frames`'s
    ``frame_extractor`` slot: decodes the AVI and returns the raw
    bytes (C-order BGR, top-down) of the evenly-spaced ``i``-th of
    ``n`` sampled frames. Same ``(bytes, idx, n) -> bytes`` contract
    as the deterministic byte-slice fake."""
    frames = decode_video(payload)
    if not frames:
        return b""
    pick = min((i * len(frames)) // n, len(frames) - 1)
    return frames[pick].tobytes()


# ---------------------------------------------------------------------------
# Perceptual image hashing (dHash) + near-duplicate detection
# ---------------------------------------------------------------------------
#
# The image-modality member of the dedup family: byte-identical images
# are caught by the exact content-hash index, but re-encoded / resized
# / slightly-edited copies need a PERCEPTUAL key. dHash (difference
# hash) is the standard cheap one: downsample to 8x9 grayscale by
# area means, compare horizontally adjacent cells -> 64 bits; small
# edits flip few bits, so near-duplicates are pairs within a Hamming
# radius. Candidate generation reuses the SimHash playbook: split the
# 64-bit key into 4 sixteen-bit bands — two hashes within Hamming 3
# MUST agree on at least one band (pigeonhole), so the bucket join is
# exhaustive at the default radius, never pairwise. Decoding runs in
# Arrow batches (mapInPandas); the decoder slot accepts any
# bytes -> uint8-array callable (Pillow images, the stdlib AVI frame
# decoder, or the deterministic md5 fake for oracle-able tests).


def _gray_resize_mean(a, out_h: int, out_w: int):
    """Grayscale + area-mean downsample to (out_h, out_w) with
    deterministic integer bucket boundaries (floor(i*H/out_h)) — no
    interpolation library, bit-stable everywhere."""
    import numpy as np

    a = np.asarray(a, dtype=np.float64)
    if a.ndim == 3:
        a = a.mean(axis=2)
    h, w = a.shape
    if h < out_h or w < out_w:
        reps = (out_h + h - 1) // h, (out_w + w - 1) // w
        a = np.tile(a, reps)
        h, w = a.shape
    rb = [(i * h) // out_h for i in range(out_h + 1)]
    cb = [(j * w) // out_w for j in range(out_w + 1)]
    out = np.empty((out_h, out_w), dtype=np.float64)
    for i in range(out_h):
        for j in range(out_w):
            out[i, j] = a[rb[i] : rb[i + 1], cb[j] : cb[j + 1]].mean()
    return out


def dhash64(arr) -> int:
    """64-bit difference hash of an H×W[×C] uint8 array: 8×9 area
    means, bit (r, c) = cell (r, c+1) > cell (r, c), row-major LSB
    first. Pure numpy, deterministic."""
    g = _gray_resize_mean(arr, 8, 9)
    bits = (g[:, 1:] > g[:, :-1]).reshape(-1)
    v = 0
    for i, b in enumerate(bits):
        if b:
            v |= 1 << i
    return v


def _fake_image_array(payload: bytes):
    """Deterministic stand-in decoder for the 16-byte md5 payloads:
    cycle the bytes into a 16×16 grayscale array. Replay-exact, so
    tests can recompute expected hashes locally."""
    import numpy as np

    if not payload:
        payload = b"\x00"
    reps = (256 + len(payload) - 1) // len(payload)
    buf = (bytes(payload) * reps)[:256]
    return np.frombuffer(buf, dtype=np.uint8).reshape(16, 16)


def image_dhash(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    out_col: str = "dhash",
    decoder: "object" = None,
) -> DataFrame:
    """(id, dhash BIGINT) over a binary image column, decoded and
    hashed in Arrow batches. ``decoder`` is any bytes → uint8-array
    callable (default: the deterministic fake — inject
    :func:`decode_image` for Pillow-decoded real images or a frame of
    :func:`decode_video` for video keyframes)."""
    from pyspark.sql.types import LongType, StructField, StructType

    dec = decoder or _fake_image_array
    src_id, src_pay = id_col, payload_col
    schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField(out_col, LongType()),
        ]
    )

    def run(batches):
        import pandas as pd

        for pdf in batches:
            hashes = [
                # arithmetic stays in Python ints; numpy would
                # overflow at bit 63 — stored as signed via two's
                # complement into LongType. NULL payload → NULL hash
                # (the text operators' rule), not a job-killing
                # TypeError
                None
                if p is None
                else _signed64(dhash64(dec(bytes(p))))
                for p in pdf[src_pay]
            ]
            out = pd.DataFrame(
                {
                    id_col: pdf[src_id].astype("int64"),
                    # object dtype: a None would otherwise coerce the
                    # column to float64 and round 64-bit hashes
                    out_col: pd.Series(
                        hashes, dtype="object", index=pdf.index
                    ),
                }
            )
            yield out

    return df.select(src_id, src_pay).mapInPandas(run, schema)


def _signed64(v: int) -> int:
    return v - (1 << 64) if v >= 1 << 63 else v


def image_near_dups(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    decoder: "object" = None,
) -> DataFrame:
    """(id_a, id_b, hamming) pairs of perceptually-near images —
    id_a < id_b, Hamming(dHash) ≤ ``max_hamming``. Candidates come
    from a 4-band bucket join (16 bits per band): within the default
    radius 3 the banding is EXHAUSTIVE by pigeonhole; radius > 3 still
    runs but emits a recall warning like the SimHash operator."""
    if max_hamming > 3:
        import warnings

        warnings.warn(
            f"max_hamming={max_hamming} exceeds the 4-band guarantee"
            " (radius 3): pairs differing in >3 bits are found only"
            " if they still share a band",
            stacklevel=2,
        )
    hashes = image_dhash(df, payload_col, id_col, "dhash", decoder)
    return hash_near_pairs(hashes, id_col, "dhash", max_hamming)


def hash_near_pairs(
    hashes: DataFrame,
    id_col: str = "doc_id",
    hash_col: str = "dhash",
    max_hamming: int = 3,
) -> DataFrame:
    """(id_a, id_b, hamming) pairs from a 64-bit hash relation via the
    4×16-bit band bucket join + exact Hamming verify — the candidate
    machinery of :func:`image_near_dups`, factored so any 64-bit
    perceptual/similarity hash (dHash, SimHash variants) can reuse it
    and so the pigeonhole-exhaustiveness property is testable against
    brute force directly on hash relations
    (tests/test_properties.py)."""
    bands = hashes.select(
        F.col(id_col),
        F.col(hash_col).alias("_h"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright(F.col(hash_col), b * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("key"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("bk"),
    ).select(id_col, "_h", "bk.band", "bk.key")
    a = bands.select(
        F.col(id_col).alias("id_a"),
        F.col("_h").alias("h_a"),
        "band",
        "key",
    )
    b = bands.select(
        F.col(id_col).alias("id_b"),
        F.col("_h").alias("h_b"),
        "band",
        "key",
    )
    pairs = (
        a.join(b, ["band", "key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "h_a", "h_b")
        .distinct()
    )
    return (
        pairs.select(
            "id_a",
            "id_b",
            F.bit_count(
                F.col("h_a").bitwiseXOR(F.col("h_b"))
            ).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .orderBy("id_a", "id_b")
    )


# ---------------------------------------------------------------------------
# Audio perceptual fingerprinting (Haitsma–Kalker-style) + near-dups
# ---------------------------------------------------------------------------
#
# The audio-modality twin of dHash: per analysis frame, energies in
# log-spaced frequency bands; each sub-fingerprint bit is the sign of
# the band-energy difference differentiated along time (robust to
# volume, codec smear, and mild noise — the classic robust-hash
# construction). A clip's fingerprint is the sequence of 16-bit
# sub-fingerprints; near-duplicate detection uses the original
# paper's lookup trick: any EXACTLY matching sub-fingerprint is a
# candidate (equi-join — never pairwise), verified by bit error rate
# over the aligned frame overlap (BER < ~0.25 ⇒ same recording).


def audio_fingerprint(
    samples, frame: int = 256, n_bands: int = 17
) -> "list[int]":
    """Per-frame 16-bit sub-fingerprints of a mono-mixed int16 sample
    array. Frames are non-overlapping ``frame``-sample windows; band
    edges are log-spaced over the rFFT bins; bit b of frame f =
    sign of (E[f][b] − E[f][b+1]) − (E[f−1][b] − E[f−1][b+1]).
    Deterministic numpy throughout; the first frame has no
    predecessor and is skipped (paper convention)."""
    import numpy as np

    a = np.asarray(samples, dtype=np.float64)
    if a.ndim == 2:
        a = a.mean(axis=1)
    n_frames = len(a) // frame
    if n_frames < 2:
        return []
    a = a[: n_frames * frame].reshape(n_frames, frame)
    spec = np.abs(np.fft.rfft(a, axis=1)) ** 2
    n_bins = spec.shape[1]
    # log-spaced band edges over [1, n_bins) — bin 0 (DC) excluded
    edges = np.unique(
        np.geomspace(1, n_bins - 1, n_bands + 1).astype(int)
    )
    while len(edges) < n_bands + 1:   # tiny frames: pad linearly
        edges = np.unique(np.append(edges, edges[-1] + 1))
    energies = np.stack(
        [
            spec[:, edges[b] : edges[b + 1]].sum(axis=1)
            for b in range(n_bands)
        ],
        axis=1,
    )
    d = energies[:, :-1] - energies[:, 1:]          # band deltas
    dd = d[1:] - d[:-1]                             # time-differenced
    bits = dd > 0
    out = []
    for row in bits:
        v = 0
        for i, b in enumerate(row):
            if b:
                v |= 1 << i
        out.append(v)
    return out


def _fake_audio_array(payload: bytes):
    """Deterministic stand-in decoder for the 16-byte md5 payloads:
    cycle bytes into 2048 int16 samples (8 frames at frame=256)."""
    import numpy as np

    if not payload:
        payload = b"\x00\x01"
    reps = (4096 + len(payload) - 1) // len(payload)
    buf = (bytes(payload) * reps)[:4096]
    return np.frombuffer(buf, dtype="<i2").astype("int16").reshape(-1, 1)


def audio_fingerprints(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    frame: int = 256,
    decoder: "object" = None,
) -> DataFrame:
    """(id, frame_idx, fp) long-format sub-fingerprints over a binary
    audio column, decoded + hashed in Arrow batches. ``decoder`` is
    any bytes → sample-array callable (default: the deterministic
    fake; inject :func:`decode_audio` for real WAV payloads)."""
    from pyspark.sql.types import (
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    dec = decoder or _fake_audio_array
    schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("frame_idx", IntegerType()),
            StructField("fp", IntegerType()),
        ]
    )

    def run(batches):
        import pandas as pd

        for pdf in batches:
            ids, idxs, fps = [], [], []
            for i, p in zip(pdf[id_col], pdf[payload_col]):
                if p is None:
                    # NULL payload → zero frames (long format's NULL):
                    # the doc simply never pairs, same as too-short
                    # audio; a TypeError here would kill the whole job
                    continue
                for j, v in enumerate(
                    audio_fingerprint(dec(bytes(p)), frame=frame)
                ):
                    ids.append(int(i))
                    idxs.append(j)
                    fps.append(v)
            yield pd.DataFrame(
                {id_col: ids, "frame_idx": idxs, "fp": fps}
            )

    return df.select(id_col, payload_col).mapInPandas(run, schema)


def audio_near_dups(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    frame: int = 256,
    max_ber: float = 0.25,
    decoder: "object" = None,
) -> DataFrame:
    """(id_a, id_b, n_frames, ber) pairs of perceptually-near audio
    clips — id_a < id_b, bit error rate over the aligned frame
    overlap ≤ ``max_ber`` (0.25 is the published same-recording
    threshold). Candidates are pairs sharing ANY exact (frame_idx,
    sub-fingerprint) — the Haitsma–Kalker lookup-table trick as an
    equi-join, so genuinely unrelated clips never pairwise-compare."""
    fps = audio_fingerprints(df, payload_col, id_col, frame, decoder)
    fps = fps.persist()
    a = fps.select(
        F.col(id_col).alias("id_a"), "frame_idx", F.col("fp").alias("fa")
    )
    b = fps.select(
        F.col(id_col).alias("id_b"), "frame_idx", F.col("fp").alias("fb")
    )
    cand = (
        a.join(b, ["frame_idx"])
        .filter((F.col("id_a") < F.col("id_b")) & (F.col("fa") == F.col("fb")))
        .select("id_a", "id_b")
        .distinct()
    )
    aligned = (
        cand.join(a, "id_a")
        .join(
            b,
            ["id_b", "frame_idx"],
        )
        .select(
            "id_a",
            "id_b",
            F.bit_count(
                F.col("fa").bitwiseXOR(F.col("fb")).bitwiseAND(F.lit(0xFFFF))
            ).alias("_errs"),
        )
    )
    out = (
        aligned.groupBy("id_a", "id_b")
        .agg(
            F.count("*").cast("bigint").alias("n_frames"),
            (F.sum("_errs") / (F.count("*") * 16.0)).alias("ber"),
        )
        .filter(F.col("ber") <= max_ber)
        .orderBy("id_a", "id_b")
    )
    out = out.localCheckpoint(eager=True)
    fps.unpersist()
    return out


# ---------------------------------------------------------------------------
# Driver-checkable perceptual near-dup corpora (r7): deterministic
# payload corpora + a full-arithmetic SQL replay of the dHash path
# ---------------------------------------------------------------------------


def perceptual_corpus(
    docs: DataFrame,
    n: int = 60,
    n_dups: int = 6,
    n_noisy: int = 0,
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, payload) corpus for the near-dup driver rows: the
    first ``n`` ids carry their own md5-digest payload (the
    synthesize_payloads rule), the first ``n_dups`` contents are
    re-presented under ids ``1000+src`` (planted exact perceptual
    duplicates), and the first ``n_noisy`` under ids ``2000+src``
    with a 17th marker byte — :func:`byte_tone_decoder` renders
    those as the SAME tones plus a small deterministic perturbation
    (a near-but-not-exact copy, nonzero BER). Everything re-derives
    from the id alone, so both engines can replay it."""
    did = F.col(id_col).cast("bigint")
    base = docs.filter(did < n).select(
        did.alias("doc_id"),
        F.unhex(F.md5(did.cast("string"))).alias("payload"),
    )
    dups = docs.filter(did < n_dups).select(
        (did + 1000).alias("doc_id"),
        F.unhex(F.md5(did.cast("string"))).alias("payload"),
    )
    out = base.unionByName(dups)
    if n_noisy:
        noisy = docs.filter(did < n_noisy).select(
            (did + 2000).alias("doc_id"),
            F.concat(
                F.unhex(F.md5(did.cast("string"))),
                F.unhex(F.lit("01")),
            ).alias("payload"),
        )
        out = out.unionByName(noisy)
    return out


def image_near_dups_sql(
    table: str = "documents",
    n: int = 60,
    n_dups: int = 6,
    max_hamming: int = 3,
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of ``image_near_dups(perceptual_corpus(...))`` —
    the ENTIRE perceptual pipeline re-derived arithmetically: md5
    payload bytes → the fake decoder's 16×16 tiling (pixel (R,C) =
    byte[(R·16+C) mod 16]) → 8×9 area means with the exact integer
    bucket boundaries of _gray_resize_mean (means compared by
    integer cross-multiplication — divisor-free, so no float-tie
    hazard) → per-row 8-bit difference patterns (the full 64-bit
    dHash = Σ rowpat_r·2^(8r); banding and Hamming work on the row
    patterns directly, keeping every value BIGINT-safe) → the same
    4×16-bit band bucket join → bit_count verify ≤ ``max_hamming``."""
    # column buckets of _gray_resize_mean(·, 8, 9) over a 16-wide
    # image: cb[j] = (j*16)//9
    cb = [(j * 16) // 9 for j in range(10)]
    cb_rows = ", ".join(
        f"({j}, {cb[j]}, {cb[j + 1]})" for j in range(9)
    )
    return (
        "WITH corpus AS ("
        f" SELECT CAST({id_col} AS BIGINT) AS i,"
        f"  CAST({id_col} AS BIGINT) AS src FROM {table}"
        f"  WHERE {id_col} < {n}"
        f" UNION ALL SELECT CAST({id_col} + 1000 AS BIGINT),"
        f"  CAST({id_col} AS BIGINT) FROM {table}"
        f"  WHERE {id_col} < {n_dups}),"
        # the 16 payload bytes, from the same md5-of-id-string rule
        " pbytes AS MATERIALIZED (SELECT i, c.c,"
        "  ('0x' || substr(md5(CAST(src AS VARCHAR)), 2 * c.c + 1, 2))"
        "   ::BIGINT AS bv"
        "  FROM corpus, (SELECT unnest(range(0, 16)) AS c) c),"
        # 8×9 cell sums: pixel (R,C) = byte[(R*16+C) % 16]; row
        # bucket r = R//2 (exact halves), col buckets from cb
        " cells AS MATERIALIZED (SELECT i, rr.r, cbs.j,"
        "  sum(b.bv) AS s, count(*) AS cnt"
        "  FROM (SELECT unnest(range(0, 16)) AS pr) pr"
        "  CROSS JOIN (SELECT unnest(range(0, 16)) AS pc) pc"
        "  CROSS JOIN LATERAL (SELECT pr.pr // 2 AS r) rr"
        f"  JOIN (VALUES {cb_rows}) AS cbs(j, lo, hi)"
        "   ON pc.pc >= cbs.lo AND pc.pc < cbs.hi"
        "  JOIN pbytes b ON b.c = (pr.pr * 16 + pc.pc) % 16"
        "  GROUP BY i, rr.r, cbs.j),"
        # difference bits by integer cross-multiplication:
        # mean(j+1) > mean(j)  ⇔  s1*cnt0 > s0*cnt1
        " rowpat AS MATERIALIZED (SELECT a.i, a.r,"
        "  CAST(sum(CASE WHEN b.s * a.cnt > a.s * b.cnt"
        "   THEN 1 << CAST(a.j AS INT) ELSE 0 END) AS BIGINT) AS pat"
        "  FROM cells a JOIN cells b ON b.i = a.i AND b.r = a.r"
        "   AND b.j = a.j + 1"
        "  WHERE a.j < 8 GROUP BY a.i, a.r),"
        # 16-bit band keys: band b = rows 2b (low byte) and 2b+1
        " bands AS (SELECT p0.i, p0.r // 2 AS band,"
        "  p0.pat + 256 * p1.pat AS key"
        "  FROM rowpat p0 JOIN rowpat p1"
        "   ON p1.i = p0.i AND p1.r = p0.r + 1"
        "  WHERE p0.r % 2 = 0),"
        " cand AS (SELECT DISTINCT a.i AS id_a, b.i AS id_b"
        "  FROM bands a JOIN bands b"
        "   ON a.band = b.band AND a.key = b.key AND a.i < b.i),"
        " ham AS (SELECT c.id_a, c.id_b,"
        "  CAST(sum(bit_count(xor(pa.pat, pb.pat))) AS BIGINT)"
        "   AS hamming"
        "  FROM cand c JOIN rowpat pa ON pa.i = c.id_a"
        "  JOIN rowpat pb ON pb.i = c.id_b AND pb.r = pa.r"
        "  GROUP BY c.id_a, c.id_b)"
        " SELECT id_a, id_b, hamming FROM ham"
        f" WHERE hamming <= {max_hamming}"
    )


def byte_tone_decoder(payload: bytes):
    """Deterministic synthetic-audio decoder for driver rows: a
    4-tone harmonic mixture whose frequencies come from the payload
    bytes (2048 samples @ 8 kHz, 1/k amplitude rolloff — broadband
    like real audio, so band-energy signs carry information). The
    16-byte-tiled fake decoder is DEGENERATE for fingerprinting
    (period-8 signal → identical band patterns for every payload);
    this one gives unrelated payloads unrelated fingerprints while
    identical payloads stay bit-identical."""
    import numpy as np

    if not payload:
        payload = b"\x00\x01"
    b = bytes(payload)
    noisy = len(b) == 17 and b[16] == 1
    if noisy:
        b = b[:16]
    n, rate = 2048, 8000
    t = np.arange(n, dtype=np.float64) / rate
    x = np.zeros(n, dtype=np.float64)
    for k in range(4):
        f = 180.0 + 13.0 * b[k % len(b)] + 7.0 * k
        x += (8000.0 / (k + 1)) * np.sin(2.0 * np.pi * f * t)
    if noisy:
        # deterministic high-frequency perturbation: same tones,
        # slightly different band energies -> small nonzero BER
        x += 900.0 * np.sin(2.0 * np.pi * 3310.0 * t + 0.7)
    return np.clip(x, -32768, 32767).astype(np.int16).reshape(-1, 1)


# ---------------------------------------------------------------------------
# Video perceptual near-dups (r12): frame-sampled dHash + frame vote
# ---------------------------------------------------------------------------
#
# The video-modality member of the perceptual-dedup family: sample
# n_frames evenly-spaced frames (sample_frames — the production slot
# for a pyav/ffmpeg keyframe extractor), dHash each frame with the
# image machinery, band-join candidates PER FRAME INDEX (a re-cut or
# re-encoded copy aligns frame-for-frame under even sampling), and
# vote: two videos are near-duplicates when at least ``min_frames``
# aligned frames match at Hamming ≤ max_hamming. Frame voting is
# what makes the rule robust to frame-local edits (an inserted logo,
# a replaced end-card) that would flip a single whole-video hash.


def perceptual_video_corpus(
    docs: DataFrame,
    n: int = 60,
    n_dups: int = 6,
    n_partial: int = 6,
    n_frames: int = 4,
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, modality, payload) video corpus for the near-dup
    row: each base video is the concatenation of ``n_frames``
    16-byte frame digests ``md5(src ':f' i)`` (so the even byte-range
    sampler recovers EXACTLY the per-frame digests); the first
    ``n_dups`` contents re-present under ids 1000+src (exact copies
    — all frames match), and the first ``n_partial`` under ids
    2000+src with the LAST frame re-rendered (``md5(src ':f' last
    'x')``) — a frame-local edit that the frame vote must tolerate
    at min_frames ≤ n_frames−1 and a whole-video hash would miss.
    Everything re-derives from the id alone, so both engines replay
    it."""
    did = F.col(id_col).cast("bigint")

    def frames(last_alt: bool):
        parts = []
        for i in range(n_frames):
            suffix = (
                f":f{i}x"
                if last_alt and i == n_frames - 1
                else f":f{i}"
            )
            parts.append(
                F.unhex(
                    F.md5(F.concat(did.cast("string"), F.lit(suffix)))
                )
            )
        return F.concat(*parts)

    base = docs.filter(did < n).select(
        did.alias("doc_id"),
        F.lit("video").alias("modality"),
        frames(False).alias("payload"),
    )
    dups = docs.filter(did < n_dups).select(
        (did + 1000).alias("doc_id"),
        F.lit("video").alias("modality"),
        frames(False).alias("payload"),
    )
    partial = docs.filter(did < n_partial).select(
        (did + 2000).alias("doc_id"),
        F.lit("video").alias("modality"),
        frames(True).alias("payload"),
    )
    return base.unionByName(dups).unionByName(partial)


def video_near_dups(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    n_frames: int = 4,
    max_hamming: int = 3,
    min_frames: int = 3,
    frame_extractor=None,
    decoder: "object" = None,
) -> DataFrame:
    """(id_a, id_b, n_frames_matched, ham_total) pairs of
    perceptually-near videos — id_a < id_b, at least ``min_frames``
    frame-index-aligned frames within Hamming ≤ ``max_hamming``.

    Shape: one mapInPandas frame expansion (rows ×n_frames), one
    Arrow dHash pass, then the image family's 4×16-bit band bucket
    join run on composite (doc, frame) ids — candidates are band
    collisions bounded per frame index, NEVER all pairs — and a
    per-pair frame-count vote. ``ham_total`` is the sum of matched
    frames' Hamming distances (0 for exact copies)."""
    if not 1 <= min_frames <= n_frames:
        raise ValueError(
            f"need 1 <= min_frames <= n_frames, got {min_frames}, "
            f"{n_frames}"
        )
    if n_frames > 16:
        raise ValueError(
            f"n_frames must be <= 16 (composite-id radix), got {n_frames}"
        )
    src = df
    if "modality" not in src.columns:
        src = src.withColumn("modality", F.lit("video"))
    frames = sample_frames(
        src.select(
            F.col(id_col).alias("doc_id"), "modality", F.col(payload_col).alias("payload")
        ),
        n_frames=n_frames,
        frame_extractor=frame_extractor,
    )
    # composite id = doc·16 + frame: one banding pass covers every
    # frame index; same-frame alignment recovers as composite % 16
    comp = frames.select(
        (F.col("doc_id") * 16 + F.col("frame_idx")).alias("fid"),
        F.col("frame_bytes").alias("payload"),
    )
    hashes = image_dhash(comp, "payload", "fid", "dhash", decoder)
    pairs = hash_near_pairs(hashes, "fid", "dhash", max_hamming)
    return (
        pairs.filter(
            (F.col("id_a") % 16 == F.col("id_b") % 16)
        )
        .select(
            F.expr("id_a DIV 16").alias("id_a"),
            F.expr("id_b DIV 16").alias("id_b"),
            "hamming",
        )
        .groupBy("id_a", "id_b")
        .agg(
            F.count("*").cast("bigint").alias("n_frames_matched"),
            F.sum("hamming").cast("bigint").alias("ham_total"),
        )
        .filter(F.col("n_frames_matched") >= min_frames)
        .orderBy("id_a", "id_b")
    )


def video_near_dups_sql(
    table: str = "documents",
    n: int = 60,
    n_dups: int = 6,
    n_partial: int = 6,
    n_frames: int = 4,
    max_hamming: int = 3,
    min_frames: int = 3,
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of ``video_near_dups(perceptual_video_corpus(…))``
    — the image twin's full dHash arithmetic with a FRAME dimension:
    per-frame payload bytes from ``md5(src ':f' f [ 'x' ])`` (the
    even byte-range sampler recovers exactly these digests), the
    16×16 tiling → 8×9 cross-multiplied area means → row patterns,
    band keys scoped to (frame, band), per-frame Hamming verify,
    then the frame-count vote ≥ ``min_frames``."""
    if not 1 <= min_frames <= n_frames:
        raise ValueError(
            f"need 1 <= min_frames <= n_frames, got {min_frames}, "
            f"{n_frames}"
        )
    cb = [(j * 16) // 9 for j in range(10)]
    cb_rows = ", ".join(
        f"({j}, {cb[j]}, {cb[j + 1]})" for j in range(9)
    )
    last = n_frames - 1
    return (
        "WITH corpus AS ("
        f" SELECT CAST({id_col} AS BIGINT) AS i,"
        f"  CAST({id_col} AS BIGINT) AS src, FALSE AS alt"
        f"  FROM {table} WHERE {id_col} < {n}"
        f" UNION ALL SELECT CAST({id_col} + 1000 AS BIGINT),"
        f"  CAST({id_col} AS BIGINT), FALSE FROM {table}"
        f"  WHERE {id_col} < {n_dups}"
        f" UNION ALL SELECT CAST({id_col} + 2000 AS BIGINT),"
        f"  CAST({id_col} AS BIGINT), TRUE FROM {table}"
        f"  WHERE {id_col} < {n_partial}),"
        # per-(video, frame) 16 payload bytes: frame digest
        # md5(src ':f' f) — with the 'x' re-render on the partial
        # copies' last frame
        " vbytes AS MATERIALIZED (SELECT i, f.f, c.c,"
        "  ('0x' || substr(md5(CAST(src AS VARCHAR) || ':f' ||"
        "   CAST(f.f AS VARCHAR) ||"
        f"   (CASE WHEN alt AND f.f = {last} THEN 'x' ELSE '' END)),"
        "   2 * c.c + 1, 2))::BIGINT AS bv"
        f"  FROM corpus, (SELECT unnest(range(0, {n_frames})) AS f) f,"
        "  (SELECT unnest(range(0, 16)) AS c) c),"
        " vcells AS MATERIALIZED (SELECT i, b.f, rr.r, cbs.j,"
        "  sum(b.bv) AS s, count(*) AS cnt"
        "  FROM (SELECT unnest(range(0, 16)) AS pr) pr"
        "  CROSS JOIN (SELECT unnest(range(0, 16)) AS pc) pc"
        "  CROSS JOIN LATERAL (SELECT pr.pr // 2 AS r) rr"
        f"  JOIN (VALUES {cb_rows}) AS cbs(j, lo, hi)"
        "   ON pc.pc >= cbs.lo AND pc.pc < cbs.hi"
        "  JOIN vbytes b ON b.c = (pr.pr * 16 + pc.pc) % 16"
        "  GROUP BY i, b.f, rr.r, cbs.j),"
        " vrowpat AS MATERIALIZED (SELECT a.i, a.f, a.r,"
        "  CAST(sum(CASE WHEN b.s * a.cnt > a.s * b.cnt"
        "   THEN 1 << CAST(a.j AS INT) ELSE 0 END) AS BIGINT) AS pat"
        "  FROM vcells a JOIN vcells b ON b.i = a.i AND b.f = a.f"
        "   AND b.r = a.r AND b.j = a.j + 1"
        "  WHERE a.j < 8 GROUP BY a.i, a.f, a.r),"
        " vbands AS (SELECT p0.i, p0.f, p0.r // 2 AS band,"
        "  p0.pat + 256 * p1.pat AS key"
        "  FROM vrowpat p0 JOIN vrowpat p1"
        "   ON p1.i = p0.i AND p1.f = p0.f AND p1.r = p0.r + 1"
        "  WHERE p0.r % 2 = 0),"
        " vcand AS (SELECT DISTINCT a.i AS id_a, b.i AS id_b, a.f"
        "  FROM vbands a JOIN vbands b"
        "   ON a.f = b.f AND a.band = b.band AND a.key = b.key"
        "   AND a.i < b.i),"
        " vham AS (SELECT c.id_a, c.id_b, c.f,"
        "  CAST(sum(bit_count(xor(pa.pat, pb.pat))) AS BIGINT)"
        "   AS hamming"
        "  FROM vcand c JOIN vrowpat pa ON pa.i = c.id_a"
        "   AND pa.f = c.f"
        "  JOIN vrowpat pb ON pb.i = c.id_b AND pb.f = c.f"
        "   AND pb.r = pa.r"
        "  GROUP BY c.id_a, c.id_b, c.f)"
        " SELECT id_a, id_b,"
        "  CAST(count(*) AS BIGINT) AS n_frames_matched,"
        "  CAST(sum(hamming) AS BIGINT) AS ham_total"
        f" FROM vham WHERE hamming <= {max_hamming}"
        " GROUP BY id_a, id_b"
        f" HAVING count(*) >= {min_frames}"
        " ORDER BY id_a, id_b"
    )
