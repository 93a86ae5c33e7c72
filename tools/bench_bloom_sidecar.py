"""Bloom-sidecar crossover measurement (VERDICT r10 task 4).

The sidecar (`operators/dedup_index.py`) is wired and outcome-
identity-pinned but OFF in the driver row, with the standing claim
"pays only at corpus-sized indexes". This script builds that regime
and measures it: synthetic key indexes at several sizes (far beyond
the sf0.1 corpus — the driver testdata tops out at 5 000 docs), one
realistic all-new admission batch, and the admit cycle timed on the
exact path vs the Bloom path.

What the physics says should happen, and what the measurement is for:

- The EXACT path's admission cost is dominated by one scan of the
  whole key index (the batch broadcasts into it as a semi-filter; the
  index never shuffles). Cost grows linearly with index keys.
- The BLOOM path reads the fixed-size sidecar (n_bits/32 words),
  probes the batch, and only maybe-present keys touch the index. For
  a mostly-new batch sized so that FPR · |batch| < 1, the maybe set
  is usually EMPTY — and with AQE on, the empty broadcast side
  propagates and the index scan never runs at all. Cost is then
  ~constant in index size (the sidecar read + probe).
- The sidecar's own costs are the fixed overheads the r10 measurement
  saw lose at sf0.1: the probe join, and on append a full-filter
  OR-merge + generation commit.

So the crossover is where (index-scan time saved) > (sidecar probe +
gen-commit overhead). This script finds it empirically.

Honesty notes baked into the method:
- The batch is ALL-NEW keys (the crawl-ingest common case the sidecar
  exists for). A batch containing true duplicates forces the index
  scan regardless (true positives are maybe-present), so the win
  degrades toward zero as dup share grows — measured separately with
  a 10%-dup batch at the largest size.
- Admission and append are timed separately: admission is where the
  scan-skip lives; append pays the gen-commit at EVERY size (it is
  the price of keeping the filter consistent).
- Filter sized at ~20 bits/key (k=5) so FPR ≈ 6e-5 keeps the
  expected maybe set below 1 for a 5 000-key batch.

Usage (from the repo root; ~10 min for the default grid)::

    python tools/bench_bloom_sidecar.py
    python tools/bench_bloom_sidecar.py --sizes 500000 5000000
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


def _build_index(spark, path, n_keys):
    """Synthetic key index: md5 over a disjoint integer namespace
    ('idx:i'), laid out exactly like init_dedup_index writes it."""
    from pyspark.sql import functions as F

    from minisql_engine_spark.operators.dedup_index import _PART

    tasks = max(1, n_keys // 4_000_000)
    (
        spark.range(n_keys)
        .select(
            F.md5(F.concat(F.lit("idx:"), F.col("id").cast("string"))).alias(
                "content_hash"
            )
        )
        .withColumn(_PART, F.substring("content_hash", 1, 1))
        .coalesce(tasks)
        .write.mode("overwrite")
        .partitionBy(_PART)
        .parquet(path)
    )


def _batch(spark, sf_dir, dup_from_index_frac=0.0):
    """The admission batch: sf documents (all-new content), optionally
    salted with keys the index already holds (true duplicates), which
    force the index scan on the Bloom path too."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    docs = docs.select("doc_id", "text")
    if dup_from_index_frac > 0:
        n = docs.count()
        n_dup = int(n * dup_from_index_frac)
        # rows whose NORMALIZED text md5 equals an index key is hard to
        # fabricate through text; instead present batch rows that hash
        # to index keys by making text = the index namespace string.
        # _norm (lower+trim+ws-collapse) is identity on these strings.
        dups = spark.range(n_dup).select(
            (F.col("id") + 10_000_000).alias("doc_id"),
            F.concat(F.lit("idx:"), F.col("id").cast("string")).alias(
                "text"
            ),
        )
        docs = docs.unionByName(dups)
    return docs


def _time(fn, reps=3):
    best = []
    for _ in range(reps):
        t0 = time.monotonic()
        fn()
        best.append(time.monotonic() - t0)
    return round(min(best), 3), [round(x, 3) for x in best]


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument(
        "--sizes",
        nargs="*",
        type=int,
        default=[500_000, 5_000_000, 20_000_000],
    )
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--bits-per-key", type=int, default=20)
    ap.add_argument("--k", type=int, default=5)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory", "32g")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from minisql_engine_spark.operators.dedup_index import (
        append_to_index,
        append_to_index_with_bloom,
        dedup_against_index,
        dedup_with_bloom_sidecar,
        init_bloom_sidecar,
    )

    base = tempfile.mkdtemp(prefix="bloom_bench_")
    results = []
    try:
        for n_keys in args.sizes:
            idx = os.path.join(base, f"idx_{n_keys}")
            bloom = os.path.join(base, f"bloom_{n_keys}")
            n_bits = args.bits_per_key * n_keys
            t0 = time.monotonic()
            _build_index(spark, idx, n_keys)
            t_build = time.monotonic() - t0
            t0 = time.monotonic()
            init_bloom_sidecar(
                spark, idx, bloom, n_bits=n_bits, k=args.k
            )
            t_sidecar = time.monotonic() - t0

            batch = _batch(spark, args.sf).persist()
            batch.count()

            t_exact, runs_e = _time(
                lambda: dedup_against_index(batch, idx).count(),
                args.reps,
            )
            t_bloom, runs_b = _time(
                lambda: dedup_with_bloom_sidecar(
                    batch, idx, bloom
                ).count(),
                args.reps,
            )

            # append overhead, one shot each (append mutates: do the
            # exact append into a scratch copy-level — the index only
            # grows by the 5k batch keys, negligible vs n_keys, so
            # in-place sequential appends keep sizes comparable)
            surv_e = dedup_against_index(batch, idx)
            t0 = time.monotonic()
            append_to_index(surv_e, idx)
            t_append_exact = time.monotonic() - t0
            surv_b = dedup_with_bloom_sidecar(batch, idx, bloom)
            t0 = time.monotonic()
            append_to_index_with_bloom(surv_b, idx, bloom)
            t_append_bloom = time.monotonic() - t0

            row = {
                "n_keys": n_keys,
                "admit_exact_s": t_exact,
                "admit_bloom_s": t_bloom,
                "admit_runs_exact": runs_e,
                "admit_runs_bloom": runs_b,
                "append_exact_s": round(t_append_exact, 3),
                "append_bloom_s": round(t_append_bloom, 3),
                "cycle_exact_s": round(t_exact + t_append_exact, 3),
                "cycle_bloom_s": round(t_bloom + t_append_bloom, 3),
                "build_s": round(t_build, 1),
                "sidecar_init_s": round(t_sidecar, 1),
            }
            results.append(row)
            print(json.dumps(row), flush=True)
            batch.unpersist()
            shutil.rmtree(idx, ignore_errors=True)
            shutil.rmtree(bloom, ignore_errors=True)

        # dup-salted batch at the largest size: the degraded regime
        n_keys = args.sizes[-1]
        idx = os.path.join(base, f"idx_dup_{n_keys}")
        bloom = os.path.join(base, f"bloom_dup_{n_keys}")
        _build_index(spark, idx, n_keys)
        init_bloom_sidecar(
            spark, idx, bloom,
            n_bits=args.bits_per_key * n_keys, k=args.k,
        )
        batch = _batch(spark, args.sf, dup_from_index_frac=0.1).persist()
        batch.count()
        t_exact, _ = _time(
            lambda: dedup_against_index(batch, idx).count(), args.reps
        )
        t_bloom, _ = _time(
            lambda: dedup_with_bloom_sidecar(batch, idx, bloom).count(),
            args.reps,
        )
        row = {
            "n_keys": n_keys,
            "dup_frac": 0.1,
            "admit_exact_s": t_exact,
            "admit_bloom_s": t_bloom,
        }
        results.append(row)
        print(json.dumps(row), flush=True)
    finally:
        shutil.rmtree(base, ignore_errors=True)
        spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
