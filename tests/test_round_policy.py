"""Package-wide round-6 policy enforcement (VERDICT r8 task 2).

Round 8 proved Spark ``round(x, 6)`` and DuckDB ``round(x, 6)`` are
NOT the same function at scaled-half tie boundaries (three
incompatible conventions; the ``embedding_drift`` driver hash miss
and the MMR ``0.5·(a−b)`` pin). The package rule since r9
(``operators/portable_round.py``):

* every cross-engine round-6 edge uses the portable ``fx6``
  construction (``floor(x·1e6 + 0.5)/1e6`` — bit-identical IEEE ops
  in both engines), and
* every multi-row double sum under such an edge routes through the
  exact DECIMAL(38,12) ``dsum`` (order-independent, immune to
  partition fold order and AQE re-plans).

The remaining ``F.round`` call sites are enumerated below with the
reason each is exempt. Adding a NEW ``F.round`` anywhere in the
package fails this test until the site is either converted or
classified here. The tie-hazard taxonomy the reasons use:

* ``irrational`` — the rounded value passes through a transcendental
  or sqrt of a non-square (cosine, ln, 2^h, Pearson r): it cannot
  land exactly on a scaled-half boundary; cross-engine divergence
  needs a 1-ulp libm skew AND a within-1-ulp boundary — measure
  zero, and these sites are driver-hash-certified since r2–r6.
* ``on-grid`` — the value is already an exact multiple of the
  rounding grid (packed rank keys over fx6'd scores, 2-decimal TPC-H
  money × 100): round is the identity in both engines; ties are
  impossible because the fractional part is ~0, not ~0.5.
* ``rows-only`` — the query is a rows-only driver row by design (no
  DuckDB oracle hashes these values), so no cross-engine pairing
  exists to diverge.

RATIONAL-valued edges (integer ratios, decimal-quantized means/L2,
PSI shares) are NOT exemptable — e.g. 1/128 scales to exactly
7812.5e-6 — which is why dedup Jaccard, quality-rule ratios, NB
accuracy, recall gates, PQ distances/centroids, winsorize/MAD/
histogram edges, HLL estimates, and every drift metric were all
converted to ``fx6`` in r9.
"""

from __future__ import annotations

import re
from pathlib import Path

PKG = Path(__file__).resolve().parents[1] / "minisql_engine_spark"

# file (relative to the package) -> (expected F.round count, reason)
ALLOWED = {
    "operators/portable_round.py": (
        1,
        "policy module itself (docstring mention, no call)",
    ),
    "operators/ml_lsh.py": (
        2,
        "rows-only driver row by design (spark.ml LSH agreement "
        "guard); no oracle hashes these distances",
    ),
    "operators/pq.py": (
        1,
        "_packed_argmin rank key: input _d is already fx6'd (exact "
        "multiple of 1e-6), so round(_d*1e6) is on-grid / exact; "
        "Spark-side ordering construct only — the oracle orders by "
        "d directly",
    ),
    "operators/similarity.py": (
        2,
        "packed rank key + the n_probe>1 sim_fx6, both round(sim·1e6) "
        "over an already-round(6)ed cosine — on-grid (the r14 "
        "packed-long change moved the keep-farthest sim_fx6 site here "
        "from semdedup.py; reclassified r15 — the stale 1/1 split was "
        "an inherited full-suite failure, see OPTIMIZATION_r15.md)",
    ),
    # operators/semdedup.py entry removed r15: the r14 packed-long
    # change deleted its keep-farthest sim_fx6 round site (decoded
    # from the assignment aggregate instead); the site's twin now
    # lives in similarity.py's count above.
    "operators/semdedup_index.py": (
        1,
        "admission sim_fx6: same on-grid round(round(cos,6)·1e6) "
        "construction as the keep-farthest site, twin applies the "
        "identical form; chained-batch parity in "
        "test_semdedup_index.py",
    ),
    "operators/sq.py": (
        2,
        "cosine scores: sqrt-irrational values cannot land on a "
        "scaled-half tie; paired DUCK_COS twin is driver-certified "
        "(emb_sq8_topk r8, emb_cosine_topk r2-)",
    ),
    "operators/stats.py": (
        1,
        "exact_corr r: sqrt-irrational from exact DECIMAL sufficient "
        "sums; driver-certified (stats_corr)",
    ),
    "operators/tfidf.py": (
        1,
        "tf·(ln+1): ln-irrational except ln(1)=0 where the value is "
        "an exact integer (on-grid); driver-certified "
        "(tfidf_keywords)",
    ),
    "queries/tpch.py": (
        1,
        "cents fixed-point: TPC-H money is exact 2-decimal, ×100 is "
        "on-grid integer (identity round)",
    ),
}


def _fround_counts() -> dict[str, int]:
    counts: dict[str, int] = {}
    for py in PKG.rglob("*.py"):
        rel = py.relative_to(PKG).as_posix()
        n = len(re.findall(r"F\.round\(", py.read_text()))
        if n:
            counts[rel] = n
    return counts


def test_no_unclassified_f_round_sites():
    counts = _fround_counts()
    unexpected = {
        f: n for f, n in counts.items() if f not in ALLOWED
    }
    assert not unexpected, (
        "new F.round sites need a portable_round conversion or an "
        f"ALLOWED entry with a tie-hazard reason: {unexpected}"
    )


def test_allowed_counts_exact():
    """A count drift in an allowlisted file means a site was added or
    removed without reclassification."""
    counts = _fround_counts()
    for f, (n, _reason) in ALLOWED.items():
        assert counts.get(f, 0) == n, (
            f"{f}: expected {n} F.round sites, found {counts.get(f, 0)}"
        )


def test_entry_module_round_sites_classified():
    """__spark_entry__.py carries inline oracles; its residual
    F.round sites must stay at the classified set: two rows-only
    ml_lsh quality ratios, one fixed-point events sum (3-decimal
    data, on-grid), one rows-only audio BER, and three integer-cents
    stagings (`F.round(c_acctbal * 100)` in entity_rollup_golden and
    linkage_index_admission, r12, and stream_admit_linkage, r13 —
    2-decimal data on-grid ×100, so round() snaps a float-epsilon
    near-integer to the exact integer identically in both engines;
    the staged column is BIGINT from there on)."""
    src = (PKG.parent / "__spark_entry__.py").read_text()
    assert len(re.findall(r"F\.round\(", src)) == 7
