"""Video near-dup scale slope (VERDICT r13 item 4).

The `video_near_dups` driver row certifies CORRECTNESS on a
constant-size staged corpus (60 base videos, doc_id < 60), so the
sf0.1→sf1 replica harness reads a vacuous ~1× slope for it — the
corpus never grows with sf. This harness grows the corpus itself:
the staging re-derives every payload from the id alone
(`perceptual_video_corpus`), so a synthetic id range IS the real
pipeline input, and the per-frame band join — the actual 100 TB
surface (candidates = band collisions within a frame index, never
all pairs) — gets a measured slope on real 10× growth.

Sizes: n=60 (the certified row's corpus, 72 videos × 4 frames = 288
frames) vs n=600 (10×: 720 videos, 2880 frames), dups/partials
scaled proportionally (6→60 each). n stays < 1000 because the
staging's planted-duplicate ids live at 1000+src / 2000+src.

Usage: ``python tools/video_slope.py`` — prints per-size timings
(min of ``--rounds`` warm rounds) and the slope, one JSON line last.
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--sizes", type=int, nargs="+", default=[60, 600])
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    from minisql_engine_spark.operators.multimodal import (
        perceptual_video_corpus,
        video_near_dups,
    )

    out = {}
    for n in args.sizes:
        if n >= 1000:
            raise SystemExit(
                "n must stay < 1000 (duplicate ids live at 1000+src)"
            )
        ids = spark.range(n).selectExpr("id as doc_id")
        corpus = perceptual_video_corpus(
            ids, n=n, n_dups=n // 10, n_partial=n // 10
        ).localCheckpoint(eager=True)  # stage once; time the operator
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
