"""Capture ``explain("formatted")`` for declared queries.

Writes ``plans/r14/<query>_<tag>.txt`` for every window query (or the
names given on the command line) — the optimization round's before/
after plan evidence. Queries whose builder executes preparatory jobs
(index init, streaming runs) still end in a DataFrame; the captured
plan is that final DataFrame's plan, which is what the driver's noop
sink executes.

Usage::

    python tools/capture_plans.py --tag before [names ...]
"""

from __future__ import annotations

import argparse
import importlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--tag", default="before")
    ap.add_argument("--out", default="r15", help="plans/<out>/ dir")
    args = ap.parse_args()
    out_dir = os.path.join(REPO, "plans", args.out)

    from minisql_engine_spark import get_spark

    em = importlib.import_module("__spark_entry__")
    spark = get_spark("capture-plans", shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    qs = dict(em.queries())
    qs.update(em.archived_queries())
    names = args.names or list(qs)
    unknown = [n for n in names if n not in qs and n != "flagship"]
    if unknown:  # a typo must not silently produce no file (ADVICE r14)
        raise SystemExit(f"unknown query name(s): {unknown}")
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        fn = em.flagship if name == "flagship" else qs[name]
        try:
            df = fn(spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # capture the failure, keep going
            plan = f"<capture failed: {exc}>"
        path = os.path.join(out_dir, f"{name}_{args.tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
