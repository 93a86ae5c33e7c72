"""n_probe recall/cost trade for semantic-index admission (r14).

The `n_probe` knob closes SemDeDup's cell-border blind spot: a batch
vector whose true near-dup sits just across a cell boundary is
falsely ADMITTED at p=1 (the paper's cluster-then-compare rule).
This harness publishes the operating curve: ground truth = full
probe (p = n_cells, proven ≡ brute force by the hypothesis
property), then for each p measure

* rejection recall — the fraction of true near-dup batch vectors
  (per ground truth) that p-probe admission also rejects;
* false admits — true near-dups that slip through at p;
* warm admission latency (min of ``--rounds``).

Batch = the corpus third the certified driver row admits as batch 1
(vec_id % 3 = 1) against the init third — real crawl-shaped overlap,
not planted. Usage: ``python tools/nprobe_tradeoff.py [--sf ...]``.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--threshold", type=int, default=400_000)
    ap.add_argument("--plant", type=int, default=0,
                    help="append N jittered copies of init vectors to"
                    " the batch (the tight-duplicate regime)")
    ap.add_argument("--probes", type=int, nargs="+",
                    default=[1, 2, 4, 8])
    args = ap.parse_args()
    T = args.threshold

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    from minisql_engine_spark.operators.semdedup import auto_n_cells
    from minisql_engine_spark.operators.semdedup_index import (
        init_semdedup_index,
        semdedup_against_index,
    )
    from minisql_engine_spark.sources import load_table

    emb = load_table(spark, args.sf, "embeddings")
    init = emb.filter(F.col("vec_id") % 3 == 0)
    batch = emb.filter(F.col("vec_id") % 3 == 1)
    if args.plant:
        # ±1% jittered init copies (cosine ≈ 0.9999 to their source)
        planted = init.limit(args.plant).select(
            (F.col("vec_id") + 10_000_000).alias("vec_id"),
            F.expr(
                "transform(embedding, (x, i) -> CAST(x * (1.0 +"
                " (((vec_id * 31 + i) * 2654435761) % 21 - 10)"
                " / 1000.0) AS FLOAT))"
            ).alias("embedding"),
            F.col("label"),
        )
        batch = batch.unionByName(planted)
    batch = batch.localCheckpoint(eager=True)
    n_cells = auto_n_cells(init.count())
    path = tempfile.mkdtemp(prefix="minisql_nprobe_")
    shutil.rmtree(path, ignore_errors=True)

    def rejected(p: int) -> set:
        return {
            r["vec_id"]
            for r in semdedup_against_index(
                spark, path, batch, T, n_probe=p
            )
            .filter(~F.col("admitted"))
            .collect()
        }

    try:
        init_semdedup_index(init, path)
        truth = rejected(n_cells)  # full probe ≡ brute force
        out = {"n_cells": n_cells, "batch": batch.count(),
               "true_near_dups": len(truth), "probes": {}}
        print(f"# {out['batch']}-vec batch, {n_cells} cells,"
              f" {len(truth)} true near-dups", file=sys.stderr)
        for p in args.probes:
            rej = rejected(p)
            assert rej <= truth  # monotone: no false rejections
            best = None
            for _ in range(args.rounds):
                t0 = time.time()
                semdedup_against_index(
                    spark, path, batch, T, n_probe=p
                ).count()
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            out["probes"][p] = {
                "rejected": len(rej),
                "recall": round(len(rej) / len(truth), 4)
                if truth else 1.0,
                "false_admits": len(truth - rej),
                "sec": round(best, 3),
            }
            print(f"p={p}: {out['probes'][p]}", file=sys.stderr)
        print("| n_probe | rejected | rejection recall |"
              " false admits | admit (s) |")
        print("|---|---|---|---|---|")
        for p in args.probes:
            r = out["probes"][p]
            print(f"| {p} | {r['rejected']}/{len(truth)} |"
                  f" {r['recall']:.3f} | {r['false_admits']} |"
                  f" {r['sec']} |")
        print(json.dumps(out))
    finally:
        shutil.rmtree(path, ignore_errors=True)


if __name__ == "__main__":
    main()
