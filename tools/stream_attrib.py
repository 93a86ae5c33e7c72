"""Attribute the streaming rows' wall time to engine phases.

VERDICT r13 item 2: two rounds of 1.2–1.8× elevation on the
streaming-class rows (`streaming_curate_funnel`,
`versioned_stream_admission`, `stream_admit_linkage`) while their
batch twins hold at base; the A/Bs isolated it to the streaming
engine but nothing yet SEPARATED checkpoint write, source listing,
and micro-batch planning. This harness runs each row through the
normal registry entry with a StreamingQueryListener attached and
aggregates the engine's own per-trigger ``durationMs`` phases:

* ``addBatch``      — the foreachBatch body: the actual work
                      (assign/verify/append or gate/score/admit)
* ``latestOffset``  — file-source listing (directory scan per trigger)
* ``walCommit`` + ``commitOffsets`` — checkpoint fsync-class I/O
* ``queryPlanning`` — micro-batch plan construction
* residual          — wall − Σ triggerExecution: everything OUTSIDE
                      triggers (index init, drop staging, query
                      start/stop, final reads — the batch-shaped part)

Usage: ``python tools/stream_attrib.py [sf_dir]`` (default
/root/testdata/sf0.1). Prints one markdown table (for BASELINE.md)
plus one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROWS = [
    "streaming_curate_funnel",
    "versioned_stream_admission",
    "stream_admit_linkage",
    "stream_admit_semdedup",
]

PHASES = (
    "addBatch",
    "latestOffset",
    "walCommit",
    "commitOffsets",
    "queryPlanning",
    "triggerExecution",
)


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql.streaming import StreamingQueryListener

    args = [a for a in sys.argv[1:] if not a.startswith("--rows=")]
    rows = ROWS
    for a in sys.argv[1:]:
        if a.startswith("--rows="):
            rows = a.split("=", 1)[1].split(",")
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )

    progresses: list[dict] = []

    class Collect(StreamingQueryListener):
        def onQueryStarted(self, event):  # noqa: N802
            pass

        def onQueryProgress(self, event):  # noqa: N802
            progresses.append(json.loads(event.progress.json))

        def onQueryIdle(self, event):  # noqa: N802
            pass

        def onQueryTerminated(self, event):  # noqa: N802
            pass

    listener = Collect()
    spark.streams.addListener(listener)

    import __spark_entry__ as em

    qs = em.queries()
    out: dict[str, dict] = {}
    for name in rows:
        if name not in qs:
            qs_all = dict(qs)
            qs_all.update(em.archived_queries())
            if name not in qs_all:
                continue
            fn = qs_all[name]
        else:
            fn = qs[name]
        # warm once (parquet footer caches, JIT), measure second run
        fn(spark, sf_dir).collect()
        progresses.clear()
        t0 = time.time()
        fn(spark, sf_dir).collect()
        wall = time.time() - t0
        # listener is async — give late progress events a beat
        time.sleep(2.0)
        agg = {p: 0.0 for p in PHASES}
        for pr in progresses:
            for p, v in (pr.get("durationMs") or {}).items():
                if p in agg:
                    agg[p] += v / 1000.0
        agg["n_triggers"] = len(progresses)
        agg["wall"] = wall
        agg["residual"] = max(0.0, wall - agg["triggerExecution"])
        agg["checkpoint"] = agg["walCommit"] + agg["commitOffsets"]
        out[name] = agg
        print(f"# {name}: wall {wall:.2f}s, {len(progresses)} triggers",
              file=sys.stderr)

    print(
        "| row | wall s | triggers | addBatch (work) | source listing |"
        " checkpoint I/O | planning | outside triggers |"
    )
    print("|---|---|---|---|---|---|---|---|")
    for name, a in out.items():
        print(
            f"| `{name}` | {a['wall']:.2f} | {a['n_triggers']} |"
            f" {a['addBatch']:.2f} | {a['latestOffset']:.2f} |"
            f" {a['checkpoint']:.2f} | {a['queryPlanning']:.2f} |"
            f" {a['residual']:.2f} |"
        )
    print(json.dumps({"sf_dir": sf_dir, "rows": out}))


if __name__ == "__main__":
    main()
