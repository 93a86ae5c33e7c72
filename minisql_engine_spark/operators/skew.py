"""Skew-mitigation join: explicit key salting.

AQE's skew-join split handles most skew automatically
(``spark.sql.adaptive.skewJoin.enabled``, on in our session factory),
but salting is the deterministic fallback when one join key dominates
so heavily that even split partitions overwhelm an executor (the
classic null-key / power-law-entity case at 100 TB).

Scheme: the big (skewed) side gets a salt in [0, N) derived from a
hash of its row; the small side is replicated N times, once per salt
value; the join key becomes (key, salt). Row multiplicity is
preserved exactly — verified against the plain join in
tests/test_extensions2.py.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str] | str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side salted N ways.

    ``on`` uses USING-join semantics (same column names both sides,
    key emitted once). The small side is replicated ``n_salts``× via
    one ``explode`` — acceptable because the salted pattern only makes
    sense when ``small`` is orders of magnitude smaller than ``big``'s
    skewed partitions.
    """
    if how not in {"inner", "left", "left_outer", "left_semi", "left_anti"}:
        # replicating the small side breaks right/full-outer
        # multiplicity (each unmatched small row would appear once per
        # salt) — refuse rather than return silently wrong results
        raise ValueError(
            f"salted_join supports inner/left joins, not {how!r}; "
            "swap the sides for a right join"
        )
    keys = [on] if isinstance(on, str) else list(on)
    # per-ROW salt (never key-derived — a key-derived salt would send a
    # hot key to one salt bucket and spread nothing)
    salt = F.pmod(F.hash(F.monotonically_increasing_id()), F.lit(n_salts))
    big_s = big.withColumn("_salt", salt)
    small_s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return big_s.join(small_s, on=[*keys, "_salt"], how=how).drop("_salt")
