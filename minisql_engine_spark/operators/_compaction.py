"""Shared compact-and-swap rails for the persisted admission indexes.

All four admission-index families (exact ⟶ :mod:`dedup_index`,
MinHash ⟶ :mod:`neardup_index`, records ⟶ :mod:`linkage_index`,
embeddings ⟶ :mod:`semdedup_index`) accrete append files per admitted
batch and offer a compaction that rewrites the store content-
identically. The failure mode is identical everywhere (ADVICE r13 on
the semdedup member): an admission landing between the staging read
and the directory swap would have its freshly-appended state silently
replaced — keys/vectors whose admission decisions were ALREADY
returned vanish, breaking the first-batch-wins idempotence that every
replay argument rests on. This module is that contract in one place:

* **single-writer** — an exclusive lock file
  (``<root>.compact.lock``) serializes compactions; a held lock
  fails fast rather than queue;
* **listing-verify** — the store's parquet listing (relpath + size)
  must be IDENTICAL between the staging read and the swap; any
  concurrent append aborts the swap with the live store untouched;
* **two-rename swap** — ``root``→``root.old``, ``staged``→``root``:
  a reader in that instant sees a briefly-missing dir, never a
  partial one. Schedule compaction in an admission quiesce window.
"""

from __future__ import annotations

import os
import shutil
from typing import Callable


def parquet_listing(root: str) -> list[tuple[str, int]]:
    """Sorted (relpath, size) of every parquet file under ``root`` —
    the identity a concurrent append would change."""
    out = []
    for d, _, fs in os.walk(root):
        for f in fs:
            if f.endswith(".parquet"):
                p = os.path.join(d, f)
                out.append((os.path.relpath(p, root), os.path.getsize(p)))
    return sorted(out)


def compact_swap(
    root: str, stage: Callable[[str], None], what: str
) -> tuple[int, int]:
    """Run ``stage(staged_dir)`` (the family-specific rewrite) under
    the shared rails and swap it in; returns (files_before,
    files_after)."""
    root = root.rstrip("/")
    lock = root + ".compact.lock"
    try:
        fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    except FileExistsError:
        raise RuntimeError(
            f"another compaction holds {lock} — {what} compaction is "
            "single-writer; remove the stale lock only if its owner "
            "is dead"
        )
    os.close(fd)
    try:
        snapshot = parquet_listing(root)
        staged = root + ".compact"
        shutil.rmtree(staged, ignore_errors=True)
        stage(staged)
        if parquet_listing(root) != snapshot:
            shutil.rmtree(staged, ignore_errors=True)
            raise RuntimeError(
                f"{what} changed during compaction (concurrent "
                "admission?) — swap aborted, live store untouched; "
                "quiesce admissions and retry"
            )
        old = root + ".old"
        shutil.rmtree(old, ignore_errors=True)
        os.rename(root, old)
        os.rename(staged, root)
        shutil.rmtree(old, ignore_errors=True)
        return len(snapshot), len(parquet_listing(root))
    finally:
        os.unlink(lock)
