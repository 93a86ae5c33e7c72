"""Duplicate-cluster resolution: connected components over pair output.

Every near-dup detector in this engine (exact, MinHash+LSH, SimHash,
n-gram Jaccard, embedding cosine) emits verified PAIRS. A curation
pipeline needs CLUSTERS: the transitive closure of the pair relation,
with one canonical document per cluster (min id — deterministic).
``connected_components`` turns pairs into ``(id, component)`` where
``component`` is the minimum id reachable from ``id``.

Algorithm: distributed min-label propagation. Each iteration joins
the current labels across the (undirected) edge list and takes the
per-node minimum of the node's own label and all neighbor labels —
one shuffle on node id per iteration, all JVM-side (join + hash
aggregate), nothing collected. Labels only ever decrease, so the
global label SUM is a strictly decreasing convergence witness: the
loop stops the first iteration the sum is unchanged (cheap 1-row
action per iteration, not a row-level diff join).

Scale notes (100 TB):
* Iteration count = graph diameter. Near-dup similarity graphs are
  dense little cliques (docs that share content all pair with each
  other), so diameter is small — typically 2-3 iterations. The
  pathological chain graph needs O(n) iterations; ``max_iter``
  bounds the loop and a warning reports non-convergence. For
  adversarial diameters the O(log n)-round alternating star
  contraction (Kiveris et al., "Connected Components in MapReduce
  and Beyond", SoCC'14) is the drop-in upgrade; the propagation
  loop here is its Lloyd-simple cousin with strictly fewer shuffles
  on real dedup graphs.
* Each iteration's label table is ``localCheckpoint``-ed, which is
  the load-bearing choice: the label table feeds the next round
  TWICE (the neighbor join and the keep-own-label merge), so with
  plain lazy composition the LOGICAL plan doubles per round —
  2^iterations subtrees; a 17-round chain OOMed the JVM just
  *printing* the AQE plan (measured here). ``persist`` does NOT fix
  that (it truncates execution, not the logical plan);
  ``localCheckpoint`` cuts lineage to a materialized RDD, keeping
  planning O(1) per round. At cluster scale use
  ``spark.sparkContext.setCheckpointDir`` + ``checkpoint`` for the
  same effect with executor-loss recovery.
* The edge list is persisted once, both directions materialized —
  the per-iteration join then shuffles ONLY the (id, label) table
  (two longs per node), never the text or vectors.

Cites the reference only for contrast: ``sqlengine.py`` has no
iterative operators at all; this is pure extension surface
(SURVEY.md §2.4 dedup family).
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# lifecycle parity with dedup.clear_simhash_cache /
# similarity.clear_centroid_cache: connected_components holds its
# intermediates as localCheckpoint RDDs, which Spark's ContextCleaner
# releases once unreferenced — but the FINAL label table is returned
# to (and kept alive by) the caller, so benchmarks/pipelines clear it
# here between runs
_CC_CACHE: list = []


def clear_clustering_cache() -> None:
    """Drop references to returned label tables so their checkpoint
    RDDs become collectable."""
    _CC_CACHE.clear()


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """(id, component) for every id appearing in ``pairs``; component
    is the minimum reachable id. The result is held as a materialized
    localCheckpoint (it is always consumed by at least one join and
    usually several); drop the engine's reference via
    ``clear_clustering_cache``."""
    fwd = pairs.select(
        F.col(id_a).cast("long").alias("src"),
        F.col(id_b).cast("long").alias("dst"),
    )
    # both directions, materialized ONCE — every iteration re-reads
    # this table, and its upstream (e.g. a MinHash verify join) must
    # not re-execute per round
    edges = (
        fwd.union(fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .localCheckpoint()
    )

    comp = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
        .localCheckpoint()
    )
    prev_sum = comp.agg(F.sum("component")).first()[0]
    if prev_sum is None:  # empty graph
        _CC_CACHE.append(comp)
        return comp

    for _ in range(max_iter):
        nbr = (
            edges.join(
                comp.select(
                    F.col("id").alias("dst"),
                    F.col("component").alias("_nbr_comp"),
                ),
                "dst",
            )
            .groupBy(F.col("src").alias("id"))
            .agg(F.min("_nbr_comp").alias("_min_nbr"))
        )
        new_comp = (
            comp.join(nbr, "id", "left")
            .select(
                "id",
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("_min_nbr"), F.col("component")),
                ).alias("component"),
            )
            .localCheckpoint()  # truncate lineage — see module docstring
        )
        new_sum = new_comp.agg(F.sum("component")).first()[0]
        # only the FINAL table is retained in _CC_CACHE: rebinding
        # `comp` drops the previous round's only reference, so the
        # ContextCleaner can release each intermediate checkpoint RDD
        # as the loop advances (long-lived sessions would otherwise
        # accumulate one pinned RDD per iteration per call)
        comp = new_comp
        if new_sum == prev_sum:  # labels monotone ↓ ⇒ fixpoint
            _CC_CACHE.append(comp)
            return comp
        prev_sum = new_sum

    _CC_CACHE.append(comp)
    warnings.warn(
        f"connected_components: not converged after {max_iter} iterations "
        "(graph diameter exceeds max_iter); labels are a valid upper "
        "bound but some components may still be split"
    )
    return comp


def dedup_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """(component, member_id, is_canonical): cluster roster with the
    min-id member flagged canonical — the keep/drop decision of an
    exact-or-near dedup pass, ready to anti-join against the corpus."""
    comp = connected_components(pairs, id_a, id_b)
    return comp.select(
        F.col("component"),
        F.col("id").alias("member_id"),
        (F.col("id") == F.col("component")).alias("is_canonical"),
    )
