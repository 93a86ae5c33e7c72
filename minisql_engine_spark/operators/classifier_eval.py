"""Classifier evaluation — exact AUC, confusion metrics, calibration.

Training-data pipelines run shallow classifiers everywhere (quality
gates, language ID, toxicity filters), and the decisions they gate —
drop this document, keep that one — are only as good as the
classifier's measured quality. This module evaluates a binary
classifier's scores at corpus scale with INTEGER-EXACT arithmetic
(the ``graph.py`` / ``doremi.py`` fixed-point rule), so every metric
is bit-reproducible across shuffles and replayable by the DuckDB
oracle:

- **ROC-AUC** via the Mann-Whitney rank statistic with midrank tie
  handling. Scores live in fx6 units (integers 0..10⁶), so the rank
  computation groups by score first: one corpus-sized groupBy, then
  ONE window over at most 10⁶+1 DISTINCT score rows — bounded by the
  score domain, never by the corpus. Midranks are half-integers, so
  the statistic is carried ×2 to stay integral:
  ``2·ranksum_pos = Σ_g n_pos_g · (2·cum_before_g + n_g + 1)``,
  ``auc_fx6 = (2·ranksum_pos − n_pos·(n_pos+1)) · 10⁶ DIV (2·n_pos·n_neg)``.
- **Confusion at a threshold**: tp/fp/tn/fn counts and
  precision/recall/F1 in fx6 via floor division — F1 uses the
  integer identity ``f1 = 2·tp·10⁶ DIV (2·tp + fp + fn)`` (no
  float p·r intermediate).
- **ECE** (expected calibration error) over ``n_bins`` equal-width
  score bins: per bin ``acc = n_pos·10⁶ DIV n``, ``conf =
  Σscore DIV n``, ``ece_fx6 = Σ n_b·|acc_b − conf_b| DIV N`` —
  floor-division order pinned identically in both engines.

Overflow rails: the AUC chain (rank sums ≤ 2n², then ×10⁶) is
carried in DECIMAL(38,0) on Spark and HUGEINT in DuckDB — exact for
any n < 7·10¹⁵ rows per evaluation (2n²·10⁶ < 10³⁸), with only the
per-group window inputs (cum_before ≤ n, 2·cum+n+1 ≤ 2n+1) in int64,
safe to n < 4.6·10¹⁸. The confusion/ECE paths stay int64
(scores ≤ 10⁶ so Σscore ≤ n·10⁶ and count·10⁶ ≤ n·10⁶) — safe for
n < 9·10¹² rows per evaluation; raise the fx scale only with a rail
review.

Output is a tall (metric, value_units) table — integers only, the
most hash-stable shape the driver can certify.

Reference scope: ``sqlengine.py:1-753`` has no corpus surface;
extension, SURVEY §2.4 text-analysis family (closes the loop on
``classify.py``'s Naive Bayes and the quality gates: train → score →
MEASURE).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

#: fx6 fixed point — scores and metric values in millionths
FX = 10**6


def _tall(m: DataFrame, metrics: list[str]) -> DataFrame:
    """One-row metrics frame → tall (metric, value_units) via a
    single explode. NOT a per-metric union: each union branch would
    re-derive the whole upstream aggregate subtree (measured as 12
    redundant corpus scans / 98 Exchanges in the plan audit — the
    explode keeps it at one)."""
    return m.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(name).alias("metric"),
                        F.col(name)
                        .cast("bigint")
                        .alias("value_units"),
                    )
                    for name in metrics
                ]
            )
        ).alias("e")
    ).select("e.metric", "e.value_units")


def classifier_eval(
    scored: DataFrame,
    label_col: str = "label",
    score_col: str = "score_units",
    threshold_units: int = FX // 2,
    n_bins: int = 10,
) -> DataFrame:
    """(metric, value_units) over a scored corpus. ``label_col`` is
    boolean (or 0/1), ``score_col`` integer fx6 units in [0, 10⁶].
    Emits: n_scored, n_pos, n_neg, auc_fx6, tp, fp, tn, fn,
    precision_fx6, recall_fx6, f1_fx6, ece_fx6. Degenerate cases
    (single class → AUC undefined; no predicted positives →
    precision undefined) emit NULL rather than a fabricated value."""
    if not 0 <= threshold_units <= FX:
        raise ValueError(
            f"threshold_units must be in [0, {FX}], got {threshold_units}"
        )
    if n_bins < 1 or FX % n_bins != 0:
        raise ValueError(
            f"n_bins must divide {FX}, got {n_bins}"
        )
    base = scored.select(
        F.col(score_col).cast("bigint").alias("s"),
        F.col(label_col).cast("boolean").cast("int").alias("y"),
    )

    # per-distinct-score groups: the ONLY corpus-sized aggregate;
    # everything after runs on <= FX+1 rows
    g = base.groupBy("s").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("np"),
    )
    w = Window.orderBy("s").rowsBetween(
        Window.unboundedPreceding, -1
    )
    # rs2 and its sum run in DECIMAL(38,0): rs2_pos <= 2n² overflows
    # int64 past n ~ 2.1e9, and the downstream ×FX multiply past
    # n_pos·n_neg ~ 4.6e12 — the decimal chain is exact to n < 7e15
    ranked = g.withColumn(
        "cum_before", F.coalesce(F.sum("n").over(w), F.lit(0))
    ).withColumn(
        "rs2",
        F.expr(
            "CAST(np AS DECIMAL(38,0)) * (2 * cum_before + n + 1)"
        ),
    )

    bin_w = FX // n_bins
    agg = base.select(
        "s",
        "y",
        F.least(
            F.expr(f"s DIV {bin_w}"), F.lit(n_bins - 1)
        ).alias("bin"),
    )
    bins = (
        agg.groupBy("bin")
        .agg(
            F.count("*").cast("bigint").alias("bn"),
            F.sum("y").cast("bigint").alias("bp"),
            F.sum("s").cast("bigint").alias("bs"),
        )
        .select(
            "bin",
            "bn",
            F.expr(
                f"bn * abs(bp * {FX} DIV bn - bs DIV bn)"
            ).alias("term"),
        )
    )

    tot = base.agg(
        F.count("*").cast("bigint").alias("n_scored"),
        F.sum("y").cast("bigint").alias("n_pos"),
        F.sum(
            F.when(F.col("s") >= threshold_units, F.col("y")).otherwise(
                0
            )
        )
        .cast("bigint")
        .alias("tp"),
        F.sum(
            F.when(
                F.col("s") >= threshold_units, 1 - F.col("y")
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("fp"),
    )
    rsum = ranked.agg(
        F.sum("rs2").cast("decimal(38,0)").alias("rs2_pos")
    )
    esum = bins.agg(F.sum("term").cast("bigint").alias("eterm"))

    m = (
        tot.crossJoin(rsum)
        .crossJoin(esum)
        .select(
            "n_scored",
            "n_pos",
            F.expr("n_scored - n_pos").alias("n_neg"),
            "tp",
            "fp",
            F.expr("n_pos - tp").alias("fn"),
            F.expr("n_scored - n_pos - fp").alias("tn"),
            F.expr(
                # decimal-wide numerator: the int64 form overflows
                # once n_pos·n_neg > ~4.6e12; DIV on decimals is
                # Spark's IntegralDivide → BIGINT, and auc ≤ 10⁶
                "CASE WHEN n_pos > 0 AND n_scored - n_pos > 0 THEN"
                " (rs2_pos - CAST(n_pos AS DECIMAL(38,0))"
                f" * (n_pos + 1)) * {FX}"
                " DIV (2 * CAST(n_pos AS DECIMAL(38,0))"
                " * (n_scored - n_pos))"
                " ELSE NULL END"
            ).alias("auc_fx6"),
            F.expr(
                "CASE WHEN tp + fp > 0 THEN"
                f" tp * {FX} DIV (tp + fp) ELSE NULL END"
            ).alias("precision_fx6"),
            F.expr(
                "CASE WHEN n_pos > 0 THEN"
                f" tp * {FX} DIV n_pos ELSE NULL END"
            ).alias("recall_fx6"),
            F.expr(
                "CASE WHEN 2 * tp + fp + (n_pos - tp) > 0 THEN"
                f" 2 * tp * {FX} DIV (2 * tp + fp + (n_pos - tp))"
                " ELSE NULL END"
            ).alias("f1_fx6"),
            F.expr(
                "CASE WHEN n_scored > 0 THEN eterm DIV n_scored"
                " ELSE NULL END"
            ).alias("ece_fx6"),
        )
    )
    metrics = [
        "n_scored",
        "n_pos",
        "n_neg",
        "tp",
        "fp",
        "fn",
        "tn",
        "auc_fx6",
        "precision_fx6",
        "recall_fx6",
        "f1_fx6",
        "ece_fx6",
    ]
    return _tall(m, metrics)


def classifier_eval_sql(
    scored_cte: str,
    threshold_units: int = FX // 2,
    n_bins: int = 10,
) -> str:
    """DuckDB oracle twin of :func:`classifier_eval`.

    ``scored_cte`` is a SELECT producing (label, score_units) — named
    columns ``y`` (0/1 int) and ``s`` (bigint fx6). Every floor
    division, tie midrank, and bin edge replays term for term."""
    if not 0 <= threshold_units <= FX:
        raise ValueError(
            f"threshold_units must be in [0, {FX}], got {threshold_units}"
        )
    if n_bins < 1 or FX % n_bins != 0:
        raise ValueError(f"n_bins must divide {FX}, got {n_bins}")
    bin_w = FX // n_bins
    return (
        f"WITH sc AS ({scored_cte}),"
        " g AS (SELECT s, CAST(count(*) AS BIGINT) AS n,"
        "  CAST(sum(y) AS BIGINT) AS np FROM sc GROUP BY s),"
        " rk AS (SELECT s, n, np,"
        "  CAST(COALESCE(sum(n) OVER (ORDER BY s"
        "   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)"
        "   AS BIGINT) AS cum_before FROM g),"
        " rs AS (SELECT CAST(sum(CAST(np AS HUGEINT)"
        "  * (2 * cum_before + n + 1))"
        "  AS HUGEINT) AS rs2_pos FROM rk),"
        f" bn AS (SELECT least(s // {bin_w}, {n_bins - 1}) AS bin,"
        "  CAST(count(*) AS BIGINT) AS bn,"
        "  CAST(sum(y) AS BIGINT) AS bp,"
        "  CAST(sum(s) AS BIGINT) AS bs FROM sc GROUP BY 1),"
        f" es AS (SELECT CAST(sum(bn * abs(bp * {FX} // bn"
        "  - bs // bn)) AS BIGINT) AS eterm FROM bn),"
        " tt AS (SELECT CAST(count(*) AS BIGINT) AS n_scored,"
        "  CAST(sum(y) AS BIGINT) AS n_pos,"
        f"  CAST(sum(CASE WHEN s >= {threshold_units} THEN y"
        "   ELSE 0 END) AS BIGINT) AS tp,"
        f"  CAST(sum(CASE WHEN s >= {threshold_units} THEN 1 - y"
        "   ELSE 0 END) AS BIGINT) AS fp FROM sc),"
        " m AS (SELECT n_scored, n_pos, n_scored - n_pos AS n_neg,"
        "  tp, fp, n_pos - tp AS fn, n_scored - n_pos - fp AS tn,"
        "  CASE WHEN n_pos > 0 AND n_scored - n_pos > 0 THEN"
        "   CAST((rs2_pos - CAST(n_pos AS HUGEINT)"
        f"   * (n_pos + 1)) * {FX}"
        "   // (2 * CAST(n_pos AS HUGEINT)"
        "   * (n_scored - n_pos)) AS BIGINT) ELSE NULL END"
        "   AS auc_fx6,"
        f"  CASE WHEN tp + fp > 0 THEN tp * {FX} // (tp + fp)"
        "   ELSE NULL END AS precision_fx6,"
        f"  CASE WHEN n_pos > 0 THEN tp * {FX} // n_pos"
        "   ELSE NULL END AS recall_fx6,"
        "  CASE WHEN 2 * tp + fp + (n_pos - tp) > 0 THEN"
        f"   2 * tp * {FX} // (2 * tp + fp + (n_pos - tp))"
        "   ELSE NULL END AS f1_fx6,"
        "  CASE WHEN n_scored > 0 THEN eterm // n_scored"
        "   ELSE NULL END AS ece_fx6"
        "  FROM tt CROSS JOIN rs CROSS JOIN es)"
        " SELECT metric, value_units FROM ("
        "  SELECT 'n_scored' AS metric,"
        "   CAST(n_scored AS BIGINT) AS value_units, 1 AS o FROM m"
        "  UNION ALL SELECT 'n_pos', n_pos, 2 FROM m"
        "  UNION ALL SELECT 'n_neg', n_neg, 3 FROM m"
        "  UNION ALL SELECT 'tp', tp, 4 FROM m"
        "  UNION ALL SELECT 'fp', fp, 5 FROM m"
        "  UNION ALL SELECT 'fn', fn, 6 FROM m"
        "  UNION ALL SELECT 'tn', tn, 7 FROM m"
        "  UNION ALL SELECT 'auc_fx6', auc_fx6, 8 FROM m"
        "  UNION ALL SELECT 'precision_fx6', precision_fx6, 9 FROM m"
        "  UNION ALL SELECT 'recall_fx6', recall_fx6, 10 FROM m"
        "  UNION ALL SELECT 'f1_fx6', f1_fx6, 11 FROM m"
        "  UNION ALL SELECT 'ece_fx6', ece_fx6, 12 FROM m"
        " ) ORDER BY o"
    )


#: the small closed-class English stopword set the language-ID score
#: counts (fixed, versioned with the operator — changing it changes
#: every score)
EN_STOPWORDS = (
    "the", "a", "an", "of", "and", "to", "in", "is", "it", "that",
    "for", "on", "with", "as", "at", "by", "this", "be", "are", "or",
)


def stopword_score(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, s) — per-doc English-stopword ratio in fx6 units via
    pure integer division ``(n_stop · 10⁶) DIV n_tokens`` (no float
    edge anywhere). The simplest real language-ID score; docs with no
    tokens are excluded (no denominator)."""
    from minisql_engine_spark.operators.text import _norm_text, _ws_tokens

    sw = F.array(*[F.lit(t) for t in EN_STOPWORDS])
    toks = _ws_tokens(_norm_text(F.col(text_col)))
    return (
        docs.filter(F.trim(F.col(text_col)) != "")
        .select(
            F.col(id_col),
            F.size(toks).cast("bigint").alias("nt"),
            F.size(
                F.filter(toks, lambda t: F.array_contains(sw, t))
            )
            .cast("bigint")
            .alias("ns"),
        )
        .select(
            id_col,
            F.expr(f"ns * {FX} DIV nt").alias("s"),
        )
    )


def stopword_score_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB twin of :func:`stopword_score`."""
    sw = ", ".join(f"'{t}'" for t in EN_STOPWORDS)
    norm = (
        f"string_split(regexp_replace(lower(trim({text_col})),"
        " '\\s+', ' ', 'g'), ' ')"
    )
    return (
        f"SELECT {id_col},"
        f" len(list_filter({norm}, t -> t IN ({sw})))"
        f" * {FX} // len({norm}) AS s"
        f" FROM {table} WHERE trim({text_col}) <> ''"
    )


#: kappa overflow rail: (2n² )·FX must stay < 2⁶³ → n ≤ 2·10⁶ per
#: evaluation (CASE-guarded to NULL identically in both engines)
KAPPA_N_CAP = 2_000_000


def agreement_kappa(
    ratings: DataFrame,
    a_col: str = "rater_a",
    b_col: str = "rater_b",
) -> DataFrame:
    """(metric, value_units) — Cohen's κ between two raters/
    classifiers over the same items (Cohen 1960, the standard
    chance-corrected agreement measure): po = observed agreement,
    pe = Σ_k p_a(k)·p_b(k) the chance agreement, κ = (po−pe)/(1−pe).

    Integer-exact with one subtlety worth the comment: κ can be
    NEGATIVE (below-chance agreement), and the two engines' integer
    divisions disagree on negatives (Spark's ``DIV`` truncates toward
    zero, DuckDB's ``//`` floors). So the fixed-point edge computes
    κ+1 = (po + 1 − 2pe)/(1 − pe) — provably ≥ 0 since κ ≥ −1 —
    with floor division on nonnegative integers (identical in both
    engines), then subtracts FX. Emits: n, n_agree, po_fx6, pe_fx6,
    kappa_fx6 — kappa NULL when pe = 1 (a constant-rater
    degenerate), and ALL of po/pe/kappa NULL when n exceeds the
    ``KAPPA_N_CAP`` overflow rail (pe's s·10⁶ term, s ≤ n², is the
    binding constraint; every emitted metric sits inside the same
    documented rail)."""
    # three consumers (totals + both marginals) — without truncating
    # lineage each re-derives the FULL upstream rater chain (the NB
    # composition showed 188 Exchanges in the plan audit). The
    # ratings relation is two short strings per row: trivially
    # checkpointable at any corpus size.
    base = ratings.select(
        F.col(a_col).cast("string").alias("a"),
        F.col(b_col).cast("string").alias("b"),
    ).localCheckpoint(eager=False)
    tot = base.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum((F.col("a") == F.col("b")).cast("int"))
        .cast("bigint")
        .alias("agree"),
    )
    ca = base.groupBy("a").agg(F.count("*").cast("bigint").alias("ca"))
    cb = base.groupBy("b").agg(F.count("*").cast("bigint").alias("cb"))
    s = (
        ca.join(cb, ca["a"] == cb["b"])
        .agg(F.sum(F.expr("ca * cb")).cast("bigint").alias("s"))
        .select(F.coalesce(F.col("s"), F.lit(0)).alias("s"))
    )
    m = tot.crossJoin(F.broadcast(s)).select(
        "n",
        F.col("agree").alias("n_agree"),
        # the same n-rail guards every emitted metric: pe's s·FX
        # (s ≤ n²) overflows int64 past n ~ 3e6, so po/pe NULL
        # beyond the rail exactly like kappa does
        F.expr(
            f"CASE WHEN n > 0 AND n <= {KAPPA_N_CAP}L"
            f" THEN agree * {FX}L DIV n END"
        ).alias("po_fx6"),
        F.expr(
            f"CASE WHEN n > 0 AND n <= {KAPPA_N_CAP}L"
            f" THEN s * {FX}L DIV (n * n) END"
        ).alias("pe_fx6"),
        F.expr(
            f"CASE WHEN n > 0 AND n <= {KAPPA_N_CAP}L"
            " AND n * n > s THEN"
            f" (agree * n + n * n - 2 * s) * {FX}L DIV (n * n - s)"
            f" - {FX}L ELSE NULL END"
        ).alias("kappa_fx6"),
    )
    return _tall(
        m, ["n", "n_agree", "po_fx6", "pe_fx6", "kappa_fx6"]
    )


def agreement_kappa_sql(ratings_cte: str) -> str:
    """DuckDB oracle twin of :func:`agreement_kappa`.

    ``ratings_cte`` is a SELECT producing columns ``a`` and ``b``
    (both VARCHAR)."""
    return (
        f"WITH rt AS ({ratings_cte}),"
        " ktot AS (SELECT CAST(count(*) AS BIGINT) AS n,"
        "  CAST(sum(CASE WHEN a = b THEN 1 ELSE 0 END) AS BIGINT)"
        "   AS agree FROM rt),"
        " kca AS (SELECT a, CAST(count(*) AS BIGINT) AS ca"
        "  FROM rt GROUP BY a),"
        " kcb AS (SELECT b, CAST(count(*) AS BIGINT) AS cb"
        "  FROM rt GROUP BY b),"
        " ks AS (SELECT CAST(COALESCE(sum(ca * cb), 0) AS BIGINT)"
        "  AS s FROM kca JOIN kcb ON kca.a = kcb.b),"
        " km AS (SELECT n, agree AS n_agree,"
        f"  CASE WHEN n > 0 AND n <= {KAPPA_N_CAP}"
        f"   THEN agree * {FX} // n END AS po_fx6,"
        f"  CASE WHEN n > 0 AND n <= {KAPPA_N_CAP}"
        f"   THEN s * {FX} // (n * n) END AS pe_fx6,"
        f"  CASE WHEN n > 0 AND n <= {KAPPA_N_CAP}"
        "   AND n * n > s THEN"
        f"   (agree * n + n * n - 2 * s) * {FX} // (n * n - s)"
        f"   - {FX} ELSE NULL END AS kappa_fx6"
        "  FROM ktot CROSS JOIN ks)"
        " SELECT metric, CAST(value_units AS BIGINT) AS value_units"
        " FROM (SELECT 'n' AS metric, n AS value_units, 1 AS o FROM km"
        "  UNION ALL SELECT 'n_agree', n_agree, 2 FROM km"
        "  UNION ALL SELECT 'po_fx6', po_fx6, 3 FROM km"
        "  UNION ALL SELECT 'pe_fx6', pe_fx6, 4 FROM km"
        "  UNION ALL SELECT 'kappa_fx6', kappa_fx6, 5 FROM km"
        " ) ORDER BY o"
    )
