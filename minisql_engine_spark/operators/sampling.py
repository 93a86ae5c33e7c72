"""Deterministic sampling for training-data curation.

Random sampling is the wrong tool in a data pipeline: re-runs must
produce the SAME corpus (reproducible training sets, resumable jobs,
auditable lineage), and ``rand()``-based sampling changes under
retries, partition re-splits, and AQE re-plans. Every operator here
derives its keep/route decision from ``md5(seed ':' key)`` — a pure
per-row projection:

* stable under re-execution, partitioning, and engine (the DuckDB
  oracle replays decisions byte-for-byte);
* uniform across keys (md5 avalanche), seed-switchable;
* zero coordination — no shuffle, no driver state, no RNG stream.

The comparison trick: the first ``digits`` hex chars of the md5 are
compared LEXICOGRAPHICALLY against ``hex(floor(rate·16^digits))`` —
equal-length lowercase hex strings order exactly like the numbers
they encode, so no engine-specific hex→int conversion is needed
anywhere. 8 digits give 2^-32 rate granularity.

Scale: ``hash_sample``/``hash_split`` are stateless map-side filters
(whole-stage codegen, no shuffle, combine with any scan).
``stratified_sample`` ranks within each stratum — one shuffle on the
stratum key; Spark 4's WindowGroupLimit pushes the ``rank <= n``
filter into the sort so only ~n rows per stratum survive the
partial sort on each mapper.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DIGITS = 8  # md5 hex prefix length: 2^-32 rate granularity


def sample_hash(key: Column, seed: str, digits: int = DIGITS) -> Column:
    """The decision hash: first ``digits`` hex chars of
    ``md5(seed ':' key)``."""
    return F.substring(
        F.md5(F.concat(F.lit(f"{seed}:"), key.cast("string"))), 1, digits
    )


def sample_hash_sql(key: str, seed: str, digits: int = DIGITS) -> str:
    """DuckDB twin of :func:`sample_hash` (for oracle queries)."""
    return (
        f"substr(md5('{seed}:' || CAST({key} AS VARCHAR)), 1, {digits})"
    )


def rate_threshold(rate: float, digits: int = DIGITS) -> str:
    """``hex(floor(rate · 16^digits))``, zero-padded — rows whose
    decision hash sorts strictly below it are kept."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    return format(min(int(rate * 16**digits), 16**digits - 1), f"0{digits}x")


def hash_sample(
    df: DataFrame,
    rate: float,
    key_col: str,
    seed: str = "sample",
) -> DataFrame:
    """Deterministic Bernoulli(``rate``) sample keyed on ``key_col`` —
    the reproducible replacement for ``df.sample()``. Pure map-side
    filter; re-runs, re-partitions, and the SQL oracle all select the
    identical rows.

    rate >= 1.0 is the identity by special case: the threshold
    clamps to ``16^digits - 1`` and the keep-comparison is strict,
    so without this guard a row whose decision hash is exactly
    ``'ff…f'`` (~2^-32 of rows — real rows at billions scale) would
    be dropped from a "sample everything"."""
    if rate >= 1.0:
        return df
    return df.filter(
        sample_hash(F.col(key_col), seed) < F.lit(rate_threshold(rate))
    )


def hash_split(
    df: DataFrame,
    key_col: str,
    fractions: dict[str, float],
    seed: str = "split",
    split_col: str = "split",
) -> DataFrame:
    """Deterministic disjoint split (train/val/test …): adds
    ``split_col`` routing each row by cumulative hash thresholds.
    Total fractions must be 1 (±1e-9); the last split absorbs the
    hash-granularity remainder so every row is routed."""
    if not fractions:
        raise ValueError("fractions must not be empty")
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    h = sample_hash(F.col(key_col), seed)
    names = list(fractions)
    expr: Column | None = None
    cum = 0.0
    for name in names[:-1]:
        cum += fractions[name]
        cond = h < F.lit(rate_threshold(cum))
        expr = (
            F.when(cond, name) if expr is None else expr.when(cond, name)
        )
    expr = (
        F.lit(names[-1]) if expr is None else expr.otherwise(names[-1])
    )
    return df.withColumn(split_col, expr)


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    n_per_stratum: int,
    key_col: str,
    seed: str = "strata",
) -> DataFrame:
    """Deterministic quota sample: the ``n_per_stratum`` rows of each
    stratum whose decision hash sorts first (key id breaks hash
    ties — exact duplicates of the md5 prefix cannot make the result
    ambiguous). Balances skewed strata (e.g. per-language caps on a
    web corpus) without a global shuffle of anything but the stratum
    key."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(strata_col).orderBy(
        sample_hash(F.col(key_col), seed), F.col(key_col)
    )
    return (
        df.withColumn("_sample_rank", F.row_number().over(w))
        .filter(F.col("_sample_rank") <= n_per_stratum)
        .drop("_sample_rank")
    )


def weighted_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
    seed: str = "ws1",
) -> DataFrame:
    """Deterministic weighted sampling without replacement: keep the
    k rows with the smallest *replicated min-hash* priority.

    Each row draws ``w`` independent decision hashes (``md5(seed ':'
    id ':' j)`` for j = 1..w, ``w`` the row's integer weight) and its
    priority is their minimum. For two rows the lighter one outranks
    the heavier with probability exactly ``w₁/(w₁+w₂)`` — the min of
    w i.i.d. uniforms beats the min of v i.i.d. uniforms with odds
    w:v — so inclusion odds scale with weight, like
    Efraimidis–Spirakis u^(1/w) keys, but with ZERO transcendentals:
    the priority is a lexicographic min over equal-length hex strings
    (the package's comparison trick), so the DuckDB oracle replays
    selection byte-for-byte and no ln/pow last-ulp divergence can
    ever flip a rank. The price is integer weights and Σw hash rows
    (weights are quality buckets 1..~20 in practice; the explode is
    map-side and collapses immediately in a partial min-aggregate).

    Plan: sequence-explode → per-id min hash aggregate (map-side
    partials) → global top-k (TakeOrderedAndProject — never a full
    sort materialization). Rows with NULL or < 1 weights are
    excluded loudly rather than silently kept at weight 1.
    """
    if k <= 0:
        raise ValueError(f"need k > 0, got {k}")
    w = F.col(weight_col).cast("bigint")
    pri = (
        df.filter(w >= 1)
        .select(
            F.col(id_col),
            F.explode(
                F.sequence(F.lit(1).cast("bigint"), w)
            ).alias("_j"),
        )
        .select(
            id_col,
            F.md5(
                F.concat(
                    F.lit(f"{seed}:"),
                    F.col(id_col).cast("string"),
                    F.lit(":"),
                    F.col("_j").cast("string"),
                )
            ).alias("_h"),
        )
        .groupBy(id_col)
        .agg(F.min("_h").alias("priority"))
    )
    return (
        pri.join(df, id_col)
        .orderBy("priority", id_col)
        .limit(k)
    )


def weighted_sample_sql(
    table: str,
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
    seed: str = "ws1",
    select_cols: str = "*",
) -> str:
    """DuckDB oracle twin of :func:`weighted_sample` — identical
    hashes, identical lexicographic min, identical tie-break."""
    return (
        f"WITH pri AS (SELECT {id_col},"
        f"  min(md5('{seed}:' || CAST({id_col} AS VARCHAR) || ':'"
        "   || CAST(j AS VARCHAR))) AS priority"
        f"  FROM (SELECT {id_col},"
        f"   unnest(range(1, CAST({weight_col} AS BIGINT) + 1)) AS j"
        f"   FROM {table} WHERE CAST({weight_col} AS BIGINT) >= 1)"
        f"  GROUP BY {id_col})"
        f" SELECT {select_cols} FROM pri JOIN {table} USING ({id_col})"
        f" ORDER BY priority, {id_col} LIMIT {k}"
    )
