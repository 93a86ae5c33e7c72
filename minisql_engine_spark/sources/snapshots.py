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
full-overwrite commit lists only its own dir; an APPEND commit lists
the prior dirs plus one new dir (no existing byte read or rewritten —
the ingest path, with :func:`compact_snapshot` as the explicit
small-file maintenance step); ``add_snapshot_column`` is a
metadata-only commit (schema evolution, defaults filled on read for
pre-evolution files); an upsert (MERGE)
commit has two shapes: :func:`merge_snapshot` is copy-on-write of the
whole table (ONE new dir holding ``base.anti(keys) ∪ updates`` — the
simplest correct merge), and :func:`merge_snapshot_pruned` is the
production refinement: parquet FOOTER key statistics select only the
files whose key range intersects an update key for rewrite, and every
other file carries over into the new manifest BY REFERENCE (so
manifests may list individual files as well as dirs — vacuum and the
byte-size helpers handle both). With range-clustered or z-ordered
writes (`sources/zorder.py`) a table-wide upsert becomes a
few-file rewrite.

Concurrency contract: optimistic. The manifest claim is an atomic
``O_CREAT|O_EXCL`` create, so exactly one of two racing writers wins a
version number (POSIX filesystems). Losers of commutative commits
(full overwrite, append) retry automatically at the next number —
appends even reuse their already-written data dir; MERGE/DELETE/
compact computed from a base that moved, so they raise
``ConcurrentCommitError`` for the caller to re-run. Object stores
without atomic create-if-absent still need an external CAS — stated,
not faked.
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


def _read_manifest(base_path: str, version: int) -> dict:
    with open(_manifest_path(base_path, version)) as f:
        return json.load(f)


class ConstraintViolation(ValueError):
    """A commit violated a table constraint; carries per-constraint
    violation counts in ``.counts``."""

    def __init__(self, counts: dict[str, int]):
        self.counts = counts
        super().__init__(
            "constraint violation(s): "
            + ", ".join(f"{k!r}: {v} rows" for k, v in counts.items())
        )


def _check_written(spark, data_dir: str, constraints: list[str]) -> None:
    """CHECK-constraint gate over the just-written files (one scan of
    the written bytes — the data was computed once; re-deriving the
    input DataFrame could be arbitrarily expensive). SQL CHECK
    semantics: a row violates only when the expression is FALSE —
    NULL passes (write ``x IS NOT NULL AND ...`` for strictness)."""
    from pyspark.sql import functions as F

    df = spark.read.parquet(data_dir)
    aggs = [
        F.sum(
            F.when(F.expr(f"({c}) IS FALSE"), 1).otherwise(0)
        ).alias(f"_c{i}")
        for i, c in enumerate(constraints)
    ]
    row = df.agg(*aggs).collect()[0]
    counts = {
        c: int(row[f"_c{i}"] or 0) for i, c in enumerate(constraints)
    }
    bad = {c: n for c, n in counts.items() if n > 0}
    if bad:
        raise ConstraintViolation(bad)


class ConcurrentCommitError(RuntimeError):
    """Another writer claimed the version this commit targeted.

    The manifest claim is an ``O_CREAT|O_EXCL`` file create — atomic
    single-winner on POSIX filesystems, which upgrades the old
    "single-writer contract" to real optimistic concurrency there.
    (Object stores without atomic create-if-absent still need an
    external CAS — stated, not faked.) ``write_snapshot`` and
    ``append_snapshot`` retry automatically (their content does not
    depend on the version they lost); MERGE/DELETE/compact computed
    from a base that has moved, so they raise this for the caller to
    re-run against the new current version."""


def _write_data_dir(df: DataFrame, base_path: str, version: int) -> str:
    tag = uuid.uuid4().hex[:12]
    data_dir = os.path.join(base_path, "data", f"v{version}-{tag}")
    df.write.mode("error").parquet(data_dir)
    return data_dir


def _claim_manifest(base_path: str, version: int, manifest: dict) -> None:
    """Atomically claim ``version`` (exclusive create — the commit
    point). Raises :class:`ConcurrentCommitError` if a racing writer
    got there first."""
    os.makedirs(_versions_dir(base_path), exist_ok=True)
    path = _manifest_path(base_path, version)
    try:
        fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    except FileExistsError:
        raise ConcurrentCommitError(
            f"version {version} at {base_path} was claimed by another "
            "writer"
        ) from None
    with os.fdopen(fd, "w") as f:
        json.dump(manifest, f)


def _commit(
    df: DataFrame,
    base_path: str,
    version: int,
    carry_dirs: list[str] | None = None,
    adds: list[dict] | None = None,
    constraints: list[str] | None = None,
) -> None:
    """Write one new immutable data dir and claim the version
    manifest.

    ``carry_dirs`` keeps prior dirs in the manifest (append commit);
    ``adds`` carries the schema-evolution patch forward (only append
    commits need it — a full rewrite materializes patched columns
    physically, so its manifest starts clean). ``constraints`` gates
    the commit: checked AFTER the data write but BEFORE the manifest
    (the manifest is the commit point, so a failed check leaves no
    new version — the orphan dir is removed). A lost claim race also
    removes the dir and raises :class:`ConcurrentCommitError`."""
    import shutil

    data_dir = _write_data_dir(df, base_path, version)
    if constraints:
        try:
            _check_written(df.sparkSession, data_dir, constraints)
        except ConstraintViolation:
            shutil.rmtree(data_dir, ignore_errors=True)
            raise
    manifest = {
        "version": version,
        "data_dirs": list(carry_dirs or []) + [data_dir],
    }
    if adds:
        manifest["adds"] = adds
    try:
        _claim_manifest(base_path, version, manifest)
    except ConcurrentCommitError:
        shutil.rmtree(data_dir, ignore_errors=True)
        raise


_COMMIT_RETRIES = 10


def write_snapshot(
    df: DataFrame,
    base_path: str,
    constraints: list[str] | None = None,
) -> int:
    """Commit ``df`` as the next full version; returns the version.
    ``constraints`` are SQL CHECK expressions every committed row
    must satisfy (see :func:`_check_written`); a violation aborts
    with :class:`ConstraintViolation` and commits nothing. A lost
    version race retries at the next number (a full overwrite's
    content is version-independent)."""
    last: ConcurrentCommitError | None = None
    for _ in range(_COMMIT_RETRIES):
        cur = current_version(base_path)
        version = 1 if cur is None else cur + 1
        try:
            _commit(df, base_path, version, constraints=constraints)
            return version
        except ConcurrentCommitError as e:
            last = e
    raise last


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
    manifest = _read_manifest(base_path, v)
    adds = manifest.get("adds", [])
    if not adds:
        return spark.read.parquet(*manifest["data_dirs"])
    # schema evolution on read: dirs written before an add_column are
    # missing the column physically — fill it with the recorded typed
    # default per dir, then unionByName. Filters still push into each
    # union branch, so pruning/pushdown are untouched.
    from functools import reduce

    from pyspark.sql import functions as F

    parts = []
    for d in manifest["data_dirs"]:
        part = spark.read.parquet(d)
        for a in adds:
            if a["name"] not in part.columns:
                part = part.withColumn(
                    a["name"], F.lit(a["default"]).cast(a["dtype"])
                )
        parts.append(part)
    return reduce(lambda x, y: x.unionByName(y), parts)


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
    the module docstring for the file-pruned refinement path.

    The base version is pinned ONCE up front and the commit targets
    exactly ``pinned + 1`` — so a commit that lands in between
    collides on the ``O_EXCL`` claim and raises
    :class:`ConcurrentCommitError` instead of silently merging over a
    stale base (lost-update safety; same pattern as
    :func:`merge_snapshot_pruned`)."""
    from pyspark.sql import functions as F

    cur = current_version(base_path)
    if cur is None:
        raise FileNotFoundError(f"no snapshot table at {base_path}")
    base = read_snapshot(spark, base_path, cur)
    if set(base.columns) != set(updates.columns):
        raise ValueError(
            f"schema mismatch: base {sorted(base.columns)}"
            f" vs updates {sorted(updates.columns)}"
        )
    keys = updates.select(*key_cols).distinct()
    merged = base.join(F.broadcast(keys), key_cols, "left_anti").unionByName(
        updates
    )
    _commit(merged, base_path, cur + 1)
    return cur + 1


def _manifest_files(entries: list[str]) -> list[str]:
    """Expand manifest entries (dirs or individual files) to the
    parquet files they contribute."""
    out = []
    for e in entries:
        if os.path.isfile(e):
            out.append(e)
            continue
        for root, _sub, files in os.walk(e):
            for fn in sorted(files):
                if fn.endswith(".parquet") and not fn.startswith(
                    ("_", ".")
                ):
                    out.append(os.path.join(root, fn))
    return out


#: sentinel for a data file with zero rows — disjoint from any range
EMPTY_FILE = ("__empty__",)


def _file_key_range(path: str, key_col: str):
    """(min, max, has_nulls) of ``key_col`` from the parquet FOOTER
    statistics — the metadata Iceberg/Delta keep in their manifests;
    no data pages are read. Returns None when any row group lacks
    stats (then the file must be treated as overlapping everything).
    ``has_nulls`` matters because min/max statistics IGNORE nulls: a
    file can be "entirely inside" a key range by min/max and still
    hold NULL-key rows that range predicates must not touch. An
    absent null_count is treated as has_nulls=True (conservative)."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(path).metadata
    idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
    if key_col not in idx:
        return None
    lo = hi = None
    has_nulls = False
    for rg in range(md.num_row_groups):
        st = md.row_group(rg).column(idx[key_col]).statistics
        if st is None or not st.has_min_max:
            return None
        lo = st.min if lo is None else min(lo, st.min)
        hi = st.max if hi is None else max(hi, st.max)
        if st.null_count is None or st.null_count > 0:
            has_nulls = True
    if lo is None:
        # zero row groups (a legitimately EMPTY data file — e.g. an
        # overwrite that filtered everything away): the file can
        # contain no key at all, which range logic must read as
        # "disjoint from every range", not as missing stats. The
        # hypothesis snapshot-ops property found this as a TypeError
        # in delete_range's boundary compare (r9).
        return EMPTY_FILE
    return (lo, hi, has_nulls)


def merge_snapshot_pruned(
    spark: SparkSession,
    base_path: str,
    updates: DataFrame,
    key_col: str,
) -> int:
    """File-pruned copy-on-write MERGE — the refinement the plain
    :func:`merge_snapshot` docstring points at: only files whose
    footer ``key_col`` range intersects an update key are rewritten;
    every other file CARRIES OVER BY REFERENCE into the new manifest,
    untouched on disk. With sorted/z-ordered writes
    (``sources/zorder.py``) update locality turns a full-table
    rewrite into a few-file rewrite — the 100 TB upsert path.

    The overlap test runs as a broadcast range join of the (tiny)
    per-file stats table against the update keys — the file list and
    stats are manifest-scale metadata, never data. Single key column
    (range statistics are per-column); composite keys use the plain
    merge."""
    from pyspark.sql import functions as F

    cur = current_version(base_path)
    if cur is None:
        raise FileNotFoundError(f"no snapshot table at {base_path}")
    manifest = _read_manifest(base_path, cur)
    if manifest.get("adds"):
        # evolved-on-read columns are not physical in old files; a
        # by-reference carry-over would lose them. Compact first.
        raise ValueError(
            "table has a pending schema-evolution patch; run "
            "compact_snapshot() before a pruned merge"
        )
    base = read_snapshot(spark, base_path)
    if set(base.columns) != set(updates.columns):
        raise ValueError(
            f"schema mismatch: base {sorted(base.columns)}"
            f" vs updates {sorted(updates.columns)}"
        )

    files = _manifest_files(manifest["data_dirs"])
    stats = [(f, _file_key_range(f, key_col)) for f in files]
    no_stats = [f for f, r in stats if r is None]
    # EMPTY_FILE (zero rows) carries untouched: no key can hit it
    ranged = [
        (f, r[0], r[1])
        for f, r in stats
        if r is not None and r is not EMPTY_FILE
    ]
    touched = set(no_stats)
    if ranged:
        fdf = spark.createDataFrame(
            ranged, ["_file", "_lo", "_hi"]
        )
        keys = updates.select(F.col(key_col).alias("_k")).distinct()
        hit = (
            keys.join(
                F.broadcast(fdf),
                (F.col("_k") >= F.col("_lo"))
                & (F.col("_k") <= F.col("_hi")),
            )
            .select("_file")
            .distinct()
        )
        touched |= {r["_file"] for r in hit.collect()}
    untouched = [f for f in files if f not in touched]

    keys = updates.select(key_col).distinct()
    if touched:
        rewritten = (
            spark.read.parquet(*sorted(touched))
            .join(F.broadcast(keys), key_col, "left_anti")
            .unionByName(updates)
        )
    else:
        rewritten = updates
    version = cur + 1
    _commit(rewritten, base_path, version, carry_dirs=untouched)
    return version


def delete_from_snapshot(
    spark: SparkSession,
    base_path: str,
    predicate: str,
) -> int:
    """DELETE WHERE ``predicate``: commits a new version holding the
    surviving rows (copy-on-write; the predicate pushes down to the
    base scan).

    SQL DELETE removes only rows where the predicate is TRUE — rows
    where it evaluates NULL (e.g. a NULL ``source`` against
    ``source = 'web'``) are KEPT, hence the ``IS NOT TRUE`` filter
    rather than ``NOT (...)`` (which would drop NULL rows). Base
    version pinned up front for lost-update safety (see
    :func:`merge_snapshot`)."""
    cur = current_version(base_path)
    if cur is None:
        raise FileNotFoundError(f"no snapshot table at {base_path}")
    base = read_snapshot(spark, base_path, cur)
    remaining = base.filter(f"({predicate}) IS NOT TRUE")
    _commit(remaining, base_path, cur + 1)
    return cur + 1


def delete_range_pruned(
    spark: SparkSession,
    base_path: str,
    key_col: str,
    lo,
    hi,
) -> int:
    """DELETE WHERE ``key_col`` BETWEEN lo AND hi (inclusive), pruned
    by parquet footer statistics — the partition-drop optimization:

    * files ENTIRELY inside the range are dropped from the manifest
      without a single byte read;
    * files entirely outside carry over by reference, untouched;
    * only boundary-straddling files (or stat-less ones) are
      rewritten with the filter applied.

    On a range-clustered table a bulk retention delete ("drop
    everything older than N days") touches only the two boundary
    files regardless of table size. Same metadata-scale machinery as
    :func:`merge_snapshot_pruned`; same pending-evolution guard."""
    cur = current_version(base_path)
    if cur is None:
        raise FileNotFoundError(f"no snapshot table at {base_path}")
    manifest = _read_manifest(base_path, cur)
    if manifest.get("adds"):
        raise ValueError(
            "table has a pending schema-evolution patch; run "
            "compact_snapshot() before a pruned delete"
        )
    files = _manifest_files(manifest["data_dirs"])
    carried, rewrite = [], []
    for f in files:
        r = _file_key_range(f, key_col)
        if r is None:
            rewrite.append(f)       # no stats → conservative rewrite
        elif r is EMPTY_FILE:
            carried.append(f)       # zero rows → nothing to delete
        elif r[1] < lo or r[0] > hi:
            carried.append(f)       # disjoint → untouched (min/max
            #                         ignore NULLs, so NULL-key rows
            #                         here are correctly kept too)
        elif lo <= r[0] and r[1] <= hi and not r[2]:
            pass                    # fully inside, no NULL keys →
            #                         dropped with zero I/O
        else:
            rewrite.append(f)       # straddles a boundary, or is
            #                         inside by min/max but holds
            #                         NULL-key rows the stats hid
    if rewrite:
        # range predicate as Column expressions (no repr splicing —
        # quotes in string bounds and date/Decimal bounds go through
        # lit() typed, never through SQL text). A NULL key makes the
        # BETWEEN evaluate NULL; SQL DELETE keeps such rows, hence
        # "IS NOT TRUE" semantics via eqNullSafe.
        from pyspark.sql import functions as F

        in_range = (F.col(key_col) >= F.lit(lo)) & (
            F.col(key_col) <= F.lit(hi)
        )
        remaining = spark.read.parquet(*sorted(rewrite)).filter(
            ~in_range.eqNullSafe(F.lit(True))
        )
    else:
        remaining = read_snapshot(spark, base_path).limit(0)
    version = cur + 1
    _commit(remaining, base_path, version, carry_dirs=carried)
    return version


def append_snapshot(
    df: DataFrame,
    base_path: str,
    constraints: list[str] | None = None,
) -> int:
    """Fast append: commit a new version whose manifest lists the
    prior version's dirs PLUS one new dir — no existing byte is read
    or rewritten, the 100 TB ingest path. The schema-evolution patch
    (if any) carries forward; ``df`` must already contain every
    evolved column (write_snapshot/merge materialize them, and new
    writers should too). ``constraints`` gate the commit like
    :func:`write_snapshot` — only the NEW rows are checked (existing
    versions were gated at their own commit time).

    A lost version race retries WITHOUT recomputing or rewriting the
    new data: the already-written dir is re-pointed at the next
    version on top of the winner's manifest — appends commute, which
    is why this (unlike MERGE) can retry safely."""
    import shutil

    cur = current_version(base_path)
    if cur is None:
        return write_snapshot(df, base_path, constraints=constraints)

    def _adds_check(adds: list[dict]) -> None:
        missing = [
            a["name"] for a in adds if a["name"] not in df.columns
        ]
        if missing:
            raise ValueError(
                f"append is missing evolved column(s) {missing}; fill "
                "them explicitly (evolution defaults apply to PRE-"
                "evolution files, not to new data)"
            )

    _adds_check(_read_manifest(base_path, cur).get("adds", []))
    data_dir = _write_data_dir(df, base_path, cur + 1)
    if constraints:
        try:
            _check_written(df.sparkSession, data_dir, constraints)
        except ConstraintViolation:
            shutil.rmtree(data_dir, ignore_errors=True)
            raise
    last: Exception | None = None
    for _ in range(_COMMIT_RETRIES):
        cur = current_version(base_path)
        manifest = _read_manifest(base_path, cur)
        adds = manifest.get("adds", [])
        try:
            _adds_check(adds)  # evolution may have landed concurrently
        except ValueError:
            shutil.rmtree(data_dir, ignore_errors=True)
            raise
        new_manifest = {
            "version": cur + 1,
            "data_dirs": manifest["data_dirs"] + [data_dir],
        }
        if adds:
            new_manifest["adds"] = adds
        try:
            _claim_manifest(base_path, cur + 1, new_manifest)
            return cur + 1
        except ConcurrentCommitError as e:
            last = e
    shutil.rmtree(data_dir, ignore_errors=True)
    raise last


def add_snapshot_column(
    base_path: str, name: str, dtype: str, default=None
) -> int:
    """Schema evolution: add a column with a typed default — a
    METADATA-ONLY commit (instant, no data touched, any table size).
    Existing files stay as written; readers fill the column with the
    default for pre-evolution files (Iceberg's add-column semantics).
    Time travel to an older version sees the old schema."""
    cur = current_version(base_path)
    if cur is None:
        raise FileNotFoundError(f"no snapshot table at {base_path}")
    manifest = _read_manifest(base_path, cur)
    adds = manifest.get("adds", [])
    if any(a["name"] == name for a in adds):
        raise ValueError(f"column {name!r} already added")
    version = cur + 1
    new_manifest = {
        "version": version,
        "data_dirs": manifest["data_dirs"],
        "adds": adds + [{"name": name, "dtype": dtype, "default": default}],
    }
    _claim_manifest(base_path, version, new_manifest)
    return version


#: compaction target: pack data into ~128 MiB files (the parquet
#: sweet spot — small enough to parallelize, big enough to amortize
#: footers and dictionary pages)
_TARGET_FILE_BYTES = 128 * 1024 * 1024


def _dir_bytes(entries: list[str]) -> int:
    total = 0
    for d in entries:
        if os.path.isfile(d):
            total += os.path.getsize(d)
            continue
        for root, _sub, files in os.walk(d):
            for fn in files:
                if not fn.startswith(("_", ".")):
                    total += os.path.getsize(os.path.join(root, fn))
    return total


def compact_snapshot(
    spark: SparkSession,
    base_path: str,
    target_file_bytes: int = _TARGET_FILE_BYTES,
) -> int:
    """Small-file compaction: rewrite the current version's dirs into
    ONE dir bin-packed to ``target_file_bytes``-sized files and commit
    it as a new, content-identical version. Appends accumulate a dir
    (and its files) per batch; scan cost grows with file count, not
    bytes — compaction is the explicit maintenance step that pays the
    rewrite once to make every later scan cheap. Old versions still
    time-travel to the pre-compaction layout until vacuumed."""
    cur = current_version(base_path)
    if cur is None:
        raise FileNotFoundError(f"no snapshot table at {base_path}")
    manifest = _read_manifest(base_path, cur)
    n_files = max(
        1, -(-_dir_bytes(manifest["data_dirs"]) // target_file_bytes)
    )
    df = read_snapshot(spark, base_path).coalesce(n_files)
    version = cur + 1
    # full rewrite materializes evolved columns → manifest starts clean
    _commit(df, base_path, version)
    return version


def vacuum_snapshots(base_path: str, keep_last: int = 1) -> list[int]:
    """GC: drop all but the last ``keep_last`` versions — deletes
    their manifests and any data entry no surviving manifest
    references. Returns the removed version numbers. Explicit,
    destructive, never implicit: time travel to a vacuumed version
    then raises.

    File-aware (pruned merges carry individual FILES by reference): a
    dir is removable only when no kept manifest references the dir or
    anything under it; a file entry is removable only when
    unreferenced. Files orphaned INSIDE a still-referenced dir are
    left for :func:`compact_snapshot` to fold away — deleting from
    under a live reference is never worth the race."""
    import shutil

    if keep_last < 1:
        raise ValueError(f"keep_last must be >= 1, got {keep_last}")
    versions = list_versions(base_path)
    doomed, kept = versions[:-keep_last], versions[-keep_last:]
    if not doomed:
        return []
    referenced: set[str] = set()
    for v in kept:
        referenced.update(_read_manifest(base_path, v)["data_dirs"])

    def _protected(d: str) -> bool:
        pre = d.rstrip(os.sep) + os.sep
        return any(r == d or r.startswith(pre) for r in referenced)

    for v in doomed:
        mp = _manifest_path(base_path, v)
        for e in _read_manifest(base_path, v)["data_dirs"]:
            if os.path.isdir(e) and not _protected(e):
                shutil.rmtree(e)
            elif os.path.isfile(e) and e not in referenced:
                os.remove(e)
        os.remove(mp)
    return doomed


# ---------------------------------------------------------------------------
# CDC: version-to-version diff
# ---------------------------------------------------------------------------


def diff_dirs(
    base_path: str, v_from: int, v_to: int
) -> tuple[list[str], list[str], list[str]]:
    """(only_from, only_to, shared) concrete parquet FILES between
    two versions. Manifest entries are expanded to files before
    comparing because a pruned MERGE carries survivors at FILE
    granularity while its base manifest lists whole dirs — entry-
    level set comparison would call everything different. Shared
    files are identical BY REFERENCE (immutable data) and contribute
    nothing to a diff — the pruning fact that makes
    :func:`diff_snapshots` cheap: an append commit diffs at ZERO
    read of history, a pruned MERGE reads only the replaced files
    and their rewrite."""
    mf = _manifest_files(_read_manifest(base_path, v_from)["data_dirs"])
    mt = _manifest_files(_read_manifest(base_path, v_to)["data_dirs"])
    sf, st = set(mf), set(mt)
    return (
        [e for e in mf if e not in st],
        [e for e in mt if e not in sf],
        [e for e in mf if e in st],
    )


def _read_dirs_conformed(
    spark: SparkSession,
    entries: list[str],
    adds: list[dict],
    target_cols: list[str],
) -> DataFrame:
    """Read a subset of a version's manifest entries, applying that
    version's schema-evolution defaults, then conform to
    ``target_cols`` (missing columns must be covered by an add's
    typed default — anything else is a real schema divergence and
    raises)."""
    from functools import reduce

    from pyspark.sql import functions as F

    by_name = {a["name"]: a for a in adds}
    parts = []
    for d in entries:
        part = spark.read.parquet(d)
        for c in target_cols:
            if c in part.columns:
                continue
            if c not in by_name:
                raise ValueError(
                    f"column {c!r} missing from {d} with no "
                    "recorded schema-evolution default"
                )
            a = by_name[c]
            part = part.withColumn(
                a["name"], F.lit(a["default"]).cast(a["dtype"])
            )
        parts.append(part.select(*target_cols))
    return reduce(lambda x, y: x.unionByName(y), parts)


def diff_snapshots(
    spark: SparkSession,
    base_path: str,
    v_from: int,
    v_to: int,
) -> DataFrame:
    """CDC between two committed versions: one row per change with
    ``op`` = 'added' (present in ``v_to``, absent in ``v_from``) or
    'removed' (the reverse), MULTISET semantics (``exceptAll`` — a
    duplicate appended twice appears twice). Manifest entries shared
    by both versions never leave disk: only the dirs unique to one
    side are read, so the cost tracks the size of the CHANGE, not the
    table. Rows that co-occur in the differing dirs (e.g. the
    untouched tail of a rewritten file) cancel in the anti-diff.

    Metadata-only schema evolution between the versions produces an
    EMPTY diff: old dirs conform to the new schema through the
    recorded typed default — the same fill ``read_snapshot`` applies.
    """
    man_to = _read_manifest(base_path, v_to)
    man_from = _read_manifest(base_path, v_from)
    only_from, only_to, _ = diff_dirs(base_path, v_from, v_to)

    from pyspark.sql import functions as F

    # target schema = v_to's read schema
    probe = read_snapshot(spark, base_path, v_to)
    cols = probe.columns
    empty = spark.createDataFrame([], probe.schema)
    to_rows = (
        _read_dirs_conformed(
            spark, only_to, man_to.get("adds", []), cols
        )
        if only_to
        else empty
    )
    from_rows = (
        _read_dirs_conformed(
            spark, only_from, man_from.get("adds", []), cols
        )
        if only_from
        else empty
    )
    added = to_rows.exceptAll(from_rows).select(
        F.lit("added").alias("op"), *cols
    )
    removed = from_rows.exceptAll(to_rows).select(
        F.lit("removed").alias("op"), *cols
    )
    return added.unionByName(removed)
