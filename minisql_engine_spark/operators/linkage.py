"""Record linkage — entity resolution over structured records.

The structured-data twin of document dedup: the same real-world
entity arrives as multiple slightly-different rows (a typo'd name, a
re-registered account), and the pipeline must resolve them to one
canonical record before counts, joins, or training labels mean
anything. The method here is the classical probabilistic-linkage
recipe (Fellegi & Sunter 1969 — the public foundation of every MDM
system), made deterministic and integer-exact:

1. **Blocking**: candidate pairs form only WITHIN a block (an
   equi-join on the blocking key + ``id_a < id_b``) — never
   all-pairs; the block key bounds the candidate count exactly the
   way IVF cells bound the ANN search.
2. **Agreement vector → integer weight**: each pair scores
   ``name_weight`` if the names' Levenshtein distance ≤
   ``max_name_dist`` (both engines ship the same exact DP
   levenshtein — integer, no float edge), plus each exact-equality
   field's weight. Matches are pairs with total weight ≥
   ``threshold``.
3. **Transitive closure**: matched pairs close into entities via
   :func:`clustering.connected_components` (min-id label).
4. **Survivorship**: the min-id member of each entity is canonical.

Everything replays in the oracle: the block join, the levenshtein
gate, the weight sum, and the closure as a recursive CTE (the
``semdedup`` pattern).

Scale shape: one shuffle on the blocking key, per-block pair
enumeration bounded by block size (pick keys the way you'd pick IVF
cells — high enough cardinality that blocks stay small; compose
multiple blocking passes by unioning edge sets if recall across keys
is needed), one vocabulary-of-pairs weight filter, then the CC loop
on match edges only (dup edges are a tiny fraction of the corpus).

Reference scope: ``sqlengine.py:1-753`` has no corpus surface;
extension, SURVEY §2.4 dedup family (structured-record granularity
beside content hashing, spans, lines, and embeddings).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .clustering import connected_components


def _weighted_edges(
    pairs: DataFrame,
    *,
    id_col: str,
    name_col: str,
    exact_weights: dict[str, int],
    name_weight: int,
    max_name_dist: int,
    threshold: int,
) -> DataFrame:
    """(id_a, id_b, weight >= threshold) from a candidate-pair frame
    with ``a_``/``b_``-prefixed columns — shared by the one-shot
    self-join (:func:`record_linkage`) and the incremental
    batch-vs-index join (:mod:`linkage_index`), so both paths score
    pairs with the IDENTICAL rule.

    Weight evaluation order is a measured 3.7× on the driver row:
    the exact-equality terms are integer compares, the name term is
    an O(len²) Levenshtein DP. Sum the cheap terms first and run
    the DP only where it is DECISIVE — the pair could reach the
    threshold with the name weight but hasn't without it. Pairs
    outside that band get 0 for the name term, which cannot change
    the MATCH decision (already ≥ threshold, or unreachable even
    with name_weight), so the edge set — and the oracle, which
    computes the full sum — is value-identical."""
    cheap = F.lit(0)
    for c, cw in exact_weights.items():
        cheap = cheap + F.when(
            F.col(f"a_{c}") == F.col(f"b_{c}"), F.lit(cw)
        ).otherwise(F.lit(0))
    name_rule = F.when(
        F.levenshtein(
            F.col(f"a_{name_col}"), F.col(f"b_{name_col}")
        )
        <= max_name_dist,
        F.lit(name_weight),
    ).otherwise(F.lit(0))
    w = F.col("_cheap") + F.when(
        (F.col("_cheap") < threshold)
        & (F.col("_cheap") + name_weight >= threshold),
        name_rule,
    ).otherwise(F.lit(0))
    return (
        pairs.withColumn("_cheap", cheap)
        .select(
            F.col(f"a_{id_col}").alias("id_a"),
            F.col(f"b_{id_col}").alias("id_b"),
            w.alias("weight"),
        )
        .filter(F.col("weight") >= threshold)
    )


def record_linkage(
    records: DataFrame,
    id_col: str = "rec_id",
    block_col: str = "block",
    name_col: str = "name",
    exact_weights: dict[str, int] | None = None,
    name_weight: int = 3,
    max_name_dist: int = 2,
    threshold: int = 5,
) -> DataFrame:
    """(rec_id, entity, is_canonical, n_members) for every record.
    ``entity`` is the min reachable id under the match relation;
    records matching nothing are singleton entities of themselves."""
    if name_weight < 0 or max_name_dist < 0 or threshold < 1:
        raise ValueError(
            "need name_weight >= 0, max_name_dist >= 0, threshold >= 1"
        )
    exact_weights = dict(exact_weights or {})
    if any(w < 0 for w in exact_weights.values()):
        raise ValueError("exact-field weights must be >= 0")

    cols = [id_col, block_col, name_col, *exact_weights]
    base = records.select(*cols)
    a = base.select(*[F.col(c).alias(f"a_{c}") for c in cols])
    b = base.select(*[F.col(c).alias(f"b_{c}") for c in cols])
    pairs = a.join(
        b,
        (F.col(f"a_{block_col}") == F.col(f"b_{block_col}"))
        & (F.col(f"a_{id_col}") < F.col(f"b_{id_col}")),
    )
    edges = _weighted_edges(
        pairs,
        id_col=id_col,
        name_col=name_col,
        exact_weights=exact_weights,
        name_weight=name_weight,
        max_name_dist=max_name_dist,
        threshold=threshold,
    )

    comp = connected_components(edges, "id_a", "id_b")
    labeled = (
        base.select(F.col(id_col).cast("long").alias("rec_id"))
        .join(
            comp.select(F.col("id").alias("rec_id"), "component"),
            "rec_id",
            "left",
        )
        .select(
            "rec_id",
            F.coalesce(F.col("component"), F.col("rec_id")).alias(
                "entity"
            ),
        )
    )
    sizes = labeled.groupBy("entity").agg(
        F.count("*").cast("bigint").alias("n_members")
    )
    return labeled.join(sizes, "entity").select(
        "rec_id",
        "entity",
        (F.col("entity") == F.col("rec_id")).alias("is_canonical"),
        "n_members",
    )


def record_linkage_sql(
    records_cte: str,
    id_col: str = "rec_id",
    block_col: str = "block",
    name_col: str = "name",
    exact_weights: dict[str, int] | None = None,
    name_weight: int = 3,
    max_name_dist: int = 2,
    threshold: int = 5,
) -> str:
    """DuckDB oracle twin of :func:`record_linkage`.

    ``records_cte`` is a SELECT producing the record table with the
    named columns. The closure replays as a recursive CTE."""
    if name_weight < 0 or max_name_dist < 0 or threshold < 1:
        raise ValueError(
            "need name_weight >= 0, max_name_dist >= 0, threshold >= 1"
        )
    exact_weights = dict(exact_weights or {})
    if any(w < 0 for w in exact_weights.values()):
        raise ValueError("exact-field weights must be >= 0")
    wterms = [
        f"CASE WHEN levenshtein(a.{name_col}, b.{name_col})"
        f" <= {max_name_dist} THEN {name_weight} ELSE 0 END"
    ] + [
        f"CASE WHEN a.{c} = b.{c} THEN {cw} ELSE 0 END"
        for c, cw in exact_weights.items()
    ]
    return (
        f"WITH RECURSIVE rec AS ({records_cte}),"
        " pairs AS (SELECT"
        f"  a.{id_col} AS id_a, b.{id_col} AS id_b,"
        "  " + " + ".join(wterms) + " AS weight"
        f"  FROM rec a JOIN rec b ON a.{block_col} = b.{block_col}"
        f"   AND a.{id_col} < b.{id_col}),"
        f" edges AS (SELECT id_a, id_b FROM pairs"
        f"  WHERE weight >= {threshold}),"
        " nodes AS (SELECT DISTINCT id FROM (SELECT id_a AS id"
        "  FROM edges UNION SELECT id_b FROM edges)),"
        " e2 AS (SELECT id_a AS s, id_b AS t FROM edges"
        "  UNION SELECT id_b, id_a FROM edges),"
        " reach(id, r) AS (SELECT id, id FROM nodes"
        "  UNION SELECT e2.t, reach.r FROM reach"
        "   JOIN e2 ON e2.s = reach.id),"
        " comp AS (SELECT id, min(r) AS component FROM reach"
        "  GROUP BY id),"
        f" lab AS (SELECT CAST(rec.{id_col} AS BIGINT) AS rec_id,"
        f"  CAST(COALESCE(c.component, rec.{id_col}) AS BIGINT)"
        "   AS entity"
        f"  FROM rec LEFT JOIN comp c ON c.id = rec.{id_col}),"
        " sz AS (SELECT entity, CAST(count(*) AS BIGINT) AS n_members"
        "  FROM lab GROUP BY entity)"
        " SELECT lab.rec_id, lab.entity,"
        "  lab.entity = lab.rec_id AS is_canonical, sz.n_members"
        " FROM lab JOIN sz USING (entity)"
    )


def entity_rollup(
    records: DataFrame,
    resolved: DataFrame,
    id_col: str = "rec_id",
    recency_col: str | None = None,
    max_cols: tuple[str, ...] = (),
    first_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Golden records: collapse each resolved entity's members into
    ONE canonical row by field-level survivorship — the step after
    :func:`record_linkage` in every MDM pipeline (match → merge).

    Three deterministic survivorship rules, one per column class:

    - ``first_cols``: the canonical (min-id) member's value — the
      stable-identity fields (names, keys);
    - ``max_cols``: the entity max — monotone measures where the
      largest observation wins (balances, last-seen counters);
    - ``recency_col``: if given, every ``first_cols`` value comes
      from the member with the HIGHEST recency (ties → min id)
      instead of the min-id member — the most-recent-wins variant.

    ``resolved`` is :func:`record_linkage` output. Returns one row
    per entity: (entity, n_members, <first_cols…>, <max_cols…>).
    Shapes: one join records⋈resolved on id (both sides keyed), one
    per-entity aggregate with max_by/min_by-free arithmetic — the
    chooser is a max over a (key, struct) pair, partial-aggregatable
    and skew-immune like line_dedup's owner rule."""
    cols = [id_col, *first_cols, *max_cols] + (
        [recency_col] if recency_col else []
    )
    base = records.select(*dict.fromkeys(cols)).join(
        resolved.select(
            F.col("rec_id").alias(id_col), "entity"
        ),
        id_col,
    )
    # chooser key: (recency asc? we need MAX recency, tie min id) —
    # encode as a struct max: (recency, -id) so max picks highest
    # recency then SMALLEST id. Without recency_col the canonical
    # min-id member wins: max over (-id).
    if recency_col:
        chooser = F.struct(
            F.col(recency_col).alias("r"),
            (-F.col(id_col)).alias("nid"),
        )
    else:
        chooser = F.struct((-F.col(id_col)).alias("nid"))
    picked = F.max(
        F.struct(
            chooser.alias("k"),
            F.struct(
                *[F.col(c).alias(c) for c in first_cols]
            ).alias("v"),
        )
    ).alias("_pick")
    aggs = [
        F.count("*").cast("bigint").alias("n_members"),
        picked,
        *[F.max(c).alias(c) for c in max_cols],
    ]
    out = base.groupBy("entity").agg(*aggs)
    return out.select(
        "entity",
        "n_members",
        *[F.col(f"_pick.v.{c}").alias(c) for c in first_cols],
        *max_cols,
    )


def entity_rollup_sql(
    records_cte: str,
    resolved_cte: str,
    id_col: str = "rec_id",
    recency_col: str | None = None,
    max_cols: tuple[str, ...] = (),
    first_cols: tuple[str, ...] = (),
) -> str:
    """DuckDB oracle twin of :func:`entity_rollup` — the chooser
    replays as ``arg-max by (recency, -id)`` via a window, value-
    identical to the engine's struct-max aggregate."""
    order = (
        f"r.{recency_col} DESC, r.{id_col} ASC"
        if recency_col
        else f"r.{id_col} ASC"
    )
    firsts = "".join(
        f" first(r.{c}) FILTER (rn = 1) AS {c}," for c in first_cols
    )
    maxes = "".join(f" max(r.{c}) AS {c}," for c in max_cols)
    return (
        f"WITH rr AS ({records_cte}),"
        f" rs AS ({resolved_cte}),"
        " j AS (SELECT rr.*, rs.entity FROM rr"
        f"  JOIN rs ON rs.rec_id = rr.{id_col}),"
        " rk AS (SELECT j.*, row_number() OVER ("
        f"  PARTITION BY entity ORDER BY {order.replace('r.', '')})"
        "  AS rn FROM j)"
        " SELECT entity, CAST(count(*) AS BIGINT) AS n_members,"
        + firsts
        + maxes.rstrip(",")
        + (" " if not maxes else "")
        + " FROM rk r GROUP BY entity"
    )
