"""Snapshot-versioned tables with MERGE upserts — an Iceberg-lite.

The lakehouse pattern at its irreducible core: a table is a manifest
(which parquet files belong to version N), data files are immutable
and append-only, and every write commits a NEW version by writing new
files plus one new manifest. Readers pin a manifest, so they get
snapshot isolation for free: a long query reading version 3 is
untouched by a concurrent commit of version 4, and time travel is
"read an old manifest". Nothing is ever rewritten or deleted on the
write path (object-store-friendly; reclaiming space is the separate,
explicitly-invoked :func:`vacuum_snapshots` GC — never implicit).

Layout under ``base_path``:

    data/v{N}-{uuid}/part-*.parquet   immutable data of commit N
    _versions/v{N}.json               manifest: list of data dirs

A version's content = the union of the dirs its manifest lists. A
full-overwrite commit lists only its own dir; an upsert (MERGE)
commit lists its own dir PLUS the carried-over rows rewritten...
no — MERGE here is copy-on-write at the granularity of the whole
key-match: the new version's manifest lists ONE new dir holding
``base.anti(keys of updates) ∪ updates``. That is the simplest
correct merge (full rewrite); the production refinement — rewriting
only the files whose key ranges intersect the updates — needs
per-file key statistics, which `sources/zorder.py` already produces,
and is noted as the composition point, not silently faked.

Concurrency contract: single writer (the manifest commit is a
rename-free JSON write keyed by the next version number; two racing
writers could both claim N+1). Multi-writer needs a CAS on the
manifest store — out of scope, stated loudly rather than half-built.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession


def _versions_dir(base: str) -> str:
    return os.path.join(base, "_versions")


def _manifest_path(base: str, version: int) -> str:
    return os.path.join(_versions_dir(base), f"v{version}.json")


def list_versions(base_path: str) -> list[int]:
    d = _versions_dir(base_path)
    if not os.path.isdir(d):
        return []
    out = []
    for f in os.listdir(d):
        if f.startswith("v") and f.endswith(".json"):
            out.append(int(f[1:-5]))
    return sorted(out)


def current_version(base_path: str) -> int | None:
    vs = list_versions(base_path)
    return vs[-1] if vs else None


def _commit(df: DataFrame, base_path: str, version: int) -> None:
    tag = uuid.uuid4().hex[:12]
    data_dir = os.path.join(base_path, "data", f"v{version}-{tag}")
    df.write.mode("error").parquet(data_dir)
    os.makedirs(_versions_dir(base_path), exist_ok=True)
    manifest = {"version": version, "data_dirs": [data_dir]}
    with open(_manifest_path(base_path, version), "w") as f:
        json.dump(manifest, f)


def write_snapshot(df: DataFrame, base_path: str) -> int:
    """Commit ``df`` as the next full version; returns the version."""
    cur = current_version(base_path)
    version = 1 if cur is None else cur + 1
    _commit(df, base_path, version)
    return version


def read_snapshot(
    spark: SparkSession, base_path: str, version: int | None = None
) -> DataFrame:
    """Read a pinned version (default: latest). Time travel is just
    an older ``version``."""
    v = current_version(base_path) if version is None else version
    if v is None or not os.path.exists(_manifest_path(base_path, v)):
        raise FileNotFoundError(
            f"no version {version!r} at {base_path} (have {list_versions(base_path)})"
        )
    with open(_manifest_path(base_path, v)) as f:
        manifest = json.load(f)
    return spark.read.parquet(*manifest["data_dirs"])


def merge_snapshot(
    spark: SparkSession,
    base_path: str,
    updates: DataFrame,
    key_cols: list[str],
) -> int:
    """MERGE (upsert): rows of ``updates`` replace base rows with the
    same key; unmatched base rows carry over; unmatched updates
    insert. Commits and returns the new version.

    Plan: ``base LEFT ANTI updates-keys`` ∪ ``updates`` — the anti
    join's right side (the update key set) broadcasts, so the base is
    scanned once and never shuffled (the same no-big-side-shuffle rule
    as the admission indexes). Copy-on-write of the full table; see
    the module docstring for the file-pruned refinement path."""
    from pyspark.sql import functions as F

    base = read_snapshot(spark, base_path)
    if set(base.columns) != set(updates.columns):
        raise ValueError(
            f"schema mismatch: base {sorted(base.columns)}"
            f" vs updates {sorted(updates.columns)}"
        )
    keys = updates.select(*key_cols).distinct()
    merged = base.join(F.broadcast(keys), key_cols, "left_anti").unionByName(
        updates
    )
    version = current_version(base_path) + 1
    _commit(merged, base_path, version)
    return version


def delete_from_snapshot(
    spark: SparkSession,
    base_path: str,
    predicate: str,
) -> int:
    """DELETE WHERE ``predicate``: commits a new version holding the
    surviving rows (copy-on-write; the predicate pushes down to the
    base scan)."""
    base = read_snapshot(spark, base_path)
    remaining = base.filter(f"NOT ({predicate})")
    version = current_version(base_path) + 1
    _commit(remaining, base_path, version)
    return version


def vacuum_snapshots(base_path: str, keep_last: int = 1) -> list[int]:
    """GC: drop all but the last ``keep_last`` versions — deletes
    their manifests and any data dir no surviving manifest references.
    Returns the removed version numbers. Explicit, destructive, never
    implicit: time travel to a vacuumed version then raises."""
    import shutil

    if keep_last < 1:
        raise ValueError(f"keep_last must be >= 1, got {keep_last}")
    versions = list_versions(base_path)
    doomed, kept = versions[:-keep_last], versions[-keep_last:]
    if not doomed:
        return []
    referenced: set[str] = set()
    for v in kept:
        with open(_manifest_path(base_path, v)) as f:
            referenced.update(json.load(f)["data_dirs"])
    for v in doomed:
        mp = _manifest_path(base_path, v)
        with open(mp) as f:
            for d in json.load(f)["data_dirs"]:
                if d not in referenced and os.path.isdir(d):
                    shutil.rmtree(d)
        os.remove(mp)
    return doomed
