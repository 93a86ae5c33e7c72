"""Linkage-index compaction cadence measurement (r14 follow-on to
the semdedup cadence): K admission batches accumulate one
``records/batch=k`` dir + a label-snapshot version each; at
checkpoints, count record-store parquet files and time the READ
SHAPE every admission pays — the entities surface (current label
snapshot + group sizes) plus a full record-store scan (the index
side of the block join). After the last batch,
`compact_linkage_index` and re-measure the same probe.

Usage: ``python tools/linkage_cadence.py [--batches 20]``
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

KW = dict(
    exact_weights={"bal_c": 2},
    name_weight=3,
    max_name_dist=2,
    threshold=5,
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, default=20)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--probe-rounds", type=int, default=3)
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    from minisql_engine_spark.operators.linkage_index import (
        admit_linkage_batch,
        compact_linkage_index,
        init_linkage_index,
        linkage_index_entities,
    )
    from minisql_engine_spark.sources import load_table

    base = load_table(spark, args.sf, "customer").select(
        F.col("c_custkey").cast("long").alias("rec_id"),
        F.concat_ws(
            ":", F.col("c_nationkey"), F.col("c_mktsegment")
        ).alias("block"),
        F.lower(F.col("c_name")).alias("name"),
        F.round(F.col("c_acctbal") * 100).cast("long").alias("bal_c"),
    )

    def batch(k: int):
        # every (7k+3)rd customer re-registered with a per-batch typo
        # suffix and a per-batch id range — fresh ids, real matches
        return base.filter(F.col("rec_id") % 13 == (k % 13)).select(
            (F.col("rec_id") + (k + 1) * 1_000_000).alias("rec_id"),
            "block",
            F.expr(
                f"concat(substring(name, 1, length(name) - 1),"
                f" '{chr(97 + k % 26)}')"
            ).alias("name"),
            "bal_c",
        )

    path = tempfile.mkdtemp(prefix="minisql_lcad_")
    shutil.rmtree(path, ignore_errors=True)

    def n_files() -> int:
        n = 0
        for d, _, fs in os.walk(os.path.join(path, "records")):
            n += sum(1 for f in fs if f.endswith(".parquet"))
        return n

    def probe_cost() -> float:
        best = None
        for _ in range(args.probe_rounds):
            t0 = time.time()
            # the admission read shape: full record-store scan into
            # the entities surface
            linkage_index_entities(spark, path).count()
            spark.read.parquet(os.path.join(path, "records")).count()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        return best

    try:
        init_linkage_index(base, path, **KW)
        marks = [{"batches": 0, "files": n_files(),
                  "probe_sec": round(probe_cost(), 3)}]
        checkpoints = {args.batches // 4, args.batches // 2,
                       args.batches}
        for k in range(1, args.batches + 1):
            admit_linkage_batch(spark, path, batch(k), k, **KW)
            if k in checkpoints:
                marks.append({"batches": k, "files": n_files(),
                              "probe_sec": round(probe_cost(), 3)})
                print(f"after {k} batches: {marks[-1]}",
                      file=sys.stderr)
        nb, na, ver = compact_linkage_index(spark, path)
        compacted = {"batches": args.batches, "files": na,
                     "probe_sec": round(probe_cost(), 3),
                     "label_version": ver}
        print(f"compacted {nb}->{na}: {compacted}", file=sys.stderr)
        print("| state | record files | probe scan (s) |")
        print("|---|---|---|")
        for m in marks:
            print(f"| after {m['batches']} batches | {m['files']} |"
                  f" {m['probe_sec']} |")
        print(f"| compacted (post-{args.batches}) | {compacted['files']}"
              f" | {compacted['probe_sec']} |")
        print(json.dumps({"marks": marks, "compacted": compacted,
                          "sf": args.sf}))
    finally:
        shutil.rmtree(path, ignore_errors=True)


if __name__ == "__main__":
    main()
