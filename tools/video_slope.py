"""Video near-dup scale slope (VERDICT r13 item 4).

The `video_near_dups` driver row certifies CORRECTNESS on a
constant-size staged corpus (60 base videos, doc_id < 60), so the
sf0.1→sf1 replica harness reads a vacuous ~1× slope for it — the
corpus never grows with sf. This harness grows the corpus itself and
times ONLY the operator (`video_near_dups`), so the per-frame band
join — the actual 100 TB surface (candidates are band collisions
within a frame index, never all pairs) — gets a measured slope on
real 10× growth.

The staging here re-derives the registered row's payload rule
(frame i of video ``src`` = md5 digest of ``src ':f' i``; the first
n//10 contents re-presented as exact copies, the next n//10 with the
last frame re-rendered) but with duplicate-id offsets at 10·n
instead of the corpus builder's fixed 1000/2000 — identical
perceptual structure, no size cap, so n can reach band-join-visible
scale. A global warmup run precedes the timed sizes (the first
mapInPandas pass pays Arrow/python-worker startup).

Usage: ``python tools/video_slope.py [--sizes 600 6000]`` — prints
per-size timings (min of ``--rounds`` warm rounds) and the slope,
one JSON line last.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def staged_corpus(spark, n: int, n_frames: int = 4):
    """(doc_id, modality, payload) with the registered row's payload
    rule, duplicate ids offset by 10·n (structure-identical to
    perceptual_video_corpus, cap-free)."""
    from pyspark.sql import functions as F

    ids = spark.range(n).selectExpr("id as doc_id")
    did = F.col("doc_id").cast("bigint")

    def frames(last_alt: bool):
        parts = []
        for i in range(n_frames):
            suffix = (
                f":f{i}x" if last_alt and i == n_frames - 1 else f":f{i}"
            )
            parts.append(
                F.unhex(
                    F.md5(F.concat(did.cast("string"), F.lit(suffix)))
                )
            )
        return F.concat(*parts)

    n_dups = n // 10
    base = ids.select(
        did.alias("doc_id"), F.lit("video").alias("modality"),
        frames(False).alias("payload"),
    )
    dups = ids.filter(did < n_dups).select(
        (did + 10 * n).alias("doc_id"), F.lit("video").alias("modality"),
        frames(False).alias("payload"),
    )
    partial = ids.filter(did < n_dups).select(
        (did + 20 * n).alias("doc_id"), F.lit("video").alias("modality"),
        frames(True).alias("payload"),
    )
    return base.unionByName(dups).unionByName(partial)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--sizes", type=int, nargs="+", default=[600, 6000])
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    from minisql_engine_spark.operators.multimodal import video_near_dups

    # global warmup: python workers, Arrow, codegen
    video_near_dups(
        staged_corpus(spark, 60).localCheckpoint(eager=True)
    ).count()

    out = {}
    for n in args.sizes:
        corpus = staged_corpus(spark, n).localCheckpoint(eager=True)
        best = None
        n_pairs = None
        for _ in range(args.rounds):
            t0 = time.time()
            n_pairs = video_near_dups(corpus).count()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        out[n] = {"sec": round(best, 3), "pairs": n_pairs,
                  "videos": n + 2 * (n // 10)}
        print(f"n={n}: {best:.2f}s, {n_pairs} pairs,"
              f" {out[n]['videos']} videos", file=sys.stderr)
    sizes = sorted(out)
    if len(sizes) >= 2:
        lo, hi = sizes[0], sizes[-1]
        slope = out[hi]["sec"] / out[lo]["sec"]
        growth = hi / lo
        print(f"slope: {slope:.2f}x on {growth:.0f}x videos",
              file=sys.stderr)
        out["slope"] = round(slope, 2)
        out["growth"] = growth
    print(json.dumps(out))


if __name__ == "__main__":
    main()
