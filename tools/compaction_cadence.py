"""Semdedup-index compaction cadence measurement (VERDICT r13 item 6).

`compact_semdedup_index` is decision-identity-pinned, but nothing yet
measured the READ AMPLIFICATION it removes: every admission appends
at least one parquet sliver under each touched cell, so after k
batches a candidate scan opens O(k) files per cell. This harness runs
a realistic admission cadence — init from the sf embeddings, then K
probe batches of B jittered vectors each — and records, at
checkpoints along the way, the index file count and the latency of a
fixed reference admission (decisions only, no append: the read path a
pipeline pays per batch). After the last batch it compacts and
re-measures the same reference admission.

Output: a markdown table (for BASELINE.md) + one JSON line — admit
cost at k batches un-compacted vs compacted, from which the cadence
rule (compact every N batches) is derived.

Usage: ``python tools/compaction_cadence.py [--batches 20]
[--batch-size 100] [--sf /root/testdata/sf0.1]``
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

T = 400_000


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, default=20)
    ap.add_argument("--batch-size", type=int, default=100)
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
    from minisql_engine_spark.operators.semdedup_index import (
        admit_semdedup_batch,
        compact_semdedup_index,
        init_semdedup_index,
        semdedup_against_index,
    )
    from minisql_engine_spark.sources import load_table

    emb = load_table(spark, args.sf, "embeddings")
    path = tempfile.mkdtemp(prefix="minisql_cadence_")
    shutil.rmtree(path, ignore_errors=True)

    def jitter(df, salt: int):
        """Deterministic per-(salt, id, dim) SIGN pattern + ±1%
        jitter + id offset. A merely-jittered copy of a corpus vector
        is a near-dup (cosine ≈ 0.9999) and gets REJECTED — no
        appends, no slivers; sign-flipping ~half the components per
        (id, salt) yields vectors far from the corpus and from other
        batches, so most of each batch ADMITS and the index actually
        accretes files, while collisions across batches keep the
        verify path honest."""
        return df.select(
            (F.col("vec_id") + salt * 1_000_000).alias("vec_id"),
            F.expr(
                "transform(embedding, (x, i) -> CAST("
                f" x * (CASE WHEN pmod(hash(vec_id, i, {salt}), 2) = 0"
                "   THEN 1.0 ELSE -1.0 END)"
                " * (1.0 + "
                f"(((vec_id * 31 + i) * 2654435761 + {salt}) % 21 - 10)"
                " / 1000.0) AS FLOAT))"
            ).alias("embedding"),
        )

    def n_files() -> int:
        n = 0
        for d, _, fs in os.walk(os.path.join(path, "vecs")):
            n += sum(1 for f in fs if f.endswith(".parquet"))
        return n

    probe = jitter(emb.filter(F.col("vec_id") % 17 == 0), 999)
    probe = probe.limit(args.batch_size).localCheckpoint(eager=True)

    def probe_cost() -> float:
        best = None
        for _ in range(args.probe_rounds):
            t0 = time.time()
            semdedup_against_index(spark, path, probe, T).count()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        return best

    try:
        init_semdedup_index(emb, path)
        marks = []
        marks.append({"batches": 0, "files": n_files(),
                      "probe_sec": round(probe_cost(), 3)})
        checkpoints = {args.batches // 4, args.batches // 2,
                       args.batches}
        for k in range(1, args.batches + 1):
            b = jitter(emb, k).limit(args.batch_size)
            admit_semdedup_batch(spark, path, b, T)
            if k in checkpoints:
                marks.append({"batches": k, "files": n_files(),
                              "probe_sec": round(probe_cost(), 3)})
                print(f"after {k} batches: {marks[-1]}",
                      file=sys.stderr)
        fb, fa = compact_semdedup_index(spark, path)
        compacted = {"batches": args.batches, "files": fa,
                     "probe_sec": round(probe_cost(), 3),
                     "compacted": True}
        print(f"compacted {fb}->{fa}: {compacted}", file=sys.stderr)

        print("| state | index files | reference admit (s) |")
        print("|---|---|---|")
        for m in marks:
            print(f"| after {m['batches']} batches | {m['files']} |"
                  f" {m['probe_sec']} |")
        print(f"| compacted (post-{args.batches}) | {compacted['files']} |"
              f" {compacted['probe_sec']} |")
        print(json.dumps({"marks": marks, "compacted": compacted,
                          "batch_size": args.batch_size,
                          "sf": args.sf}))
    finally:
        shutil.rmtree(path, ignore_errors=True)


if __name__ == "__main__":
    main()
