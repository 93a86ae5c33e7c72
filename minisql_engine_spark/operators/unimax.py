"""UniMax budget allocation — epoch-capped uniform corpus sampling.

UniMax (Chung et al. 2023, public preprint: "UniMax: Fairer and More
Effective Language Sampling for Large-Scale Multilingual
Pretraining") allocates a total training-token budget across domains
(languages, sources) as UNIFORMLY as possible subject to an epoch
cap: no domain may be repeated more than ``max_epochs`` times, so a
domain's contribution is capped at ``max_epochs · n_tokens(d)``.
Low-resource domains hit their cap and surrender the excess, which
redistributes evenly over the rest — temperature sampling without a
temperature knob, and the natural third member of the engine's
training-composition family (``mixture.py`` spends a budget under
GIVEN weights; ``doremi.py`` LEARNS weights from loss; UniMax needs
no weights at all — only corpus statistics).

The paper states the allocation as an iterative waterfilling loop.
Here it is CLOSED-FORM — one window over the domain dimension table:
sort caps ascending k₁ ≤ … ≤ k_m with prefix sums Pᵢ; domain i is
capped iff

    kᵢ · (m − i + 1) + Pᵢ₋₁ ≤ B

and since f(i) = kᵢ·(m−i+1) + Pᵢ₋₁ is nondecreasing in i
(f(i+1) − f(i) = (kᵢ₊₁ − kᵢ)(m − i) ≥ 0 on the sorted order), the
capped set is a PREFIX — no iteration, no data-dependent loop, and
the whole construction replays as two window CTEs in the oracle.
Uncapped domains split the remaining budget by integer floor share
with the first ``remainder`` of them (in sort order) taking one
extra token, so Σ alloc = min(B, Σ caps) EXACTLY (mass conservation
a consumer can assert).

Integer-exactness rails: the capped-prefix test is evaluated in the
DIVISION form ``Pᵢ₋₁ ≤ B AND kᵢ ≤ (B − Pᵢ₋₁) DIV (m − i + 1)`` —
provably equivalent to the multiply form for positive integers
(``k·q ≤ R ⟺ k ≤ ⌊R/q⌋``) and free of the ``cap·(m−i+1)`` product,
which is data-bounded (cap = n_tokens·max_epochs) and would
otherwise overflow int64 for large corpora regardless of the budget
rail. The prefix sum Pᵢ is carried in DECIMAL(38,0) (Spark) /
HUGEINT (DuckDB), so the only remaining int64 rails are data-shaped
and explicit: each domain's own cap ``n_tokens·max_epochs < 2⁶³``
(a cap that big is unrepresentable as an allocation anyway), the
constructor's ``token_budget ≤ 10¹⁵`` and ``max_epochs ≤ 10⁴``, and
``alloc·10⁶`` in the epochs audit (alloc ≤ max(cap, B) keeps it
< 10²⁵ ≪ the decimal range; alloc itself ≤ B or ≤ cap fits int64).

Scale shape: one corpus pass for the per-domain token counts (the
``mixture.py`` tokenizer arithmetic), then everything runs on the
domain dimension table — m rows, one sort window. Nothing is
collected.

Reference scope: ``sqlengine.py:1-753`` has no corpus surface;
extension, SURVEY §2.4 training-composition family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .packing import WS_COUNT_SQL
from .text import _ws_tokens

#: fx6 fixed point for the epochs audit column
FX = 10**6
#: budget rail: B·10⁶ epoch-audit products stay < 2⁶³; the capped
#: test itself is division-form and needs no product rail
BUDGET_CAP = 10**15
EPOCHS_CAP = 10**4


def _validate(token_budget: int, max_epochs: int) -> tuple[int, int]:
    b, e = int(token_budget), int(max_epochs)
    if not 1 <= b <= BUDGET_CAP:
        raise ValueError(
            f"token_budget must be in [1, {BUDGET_CAP}], got {b}"
        )
    if not 1 <= e <= EPOCHS_CAP:
        raise ValueError(
            f"max_epochs must be in [1, {EPOCHS_CAP}], got {e}"
        )
    return b, e


def unimax_allocation(
    docs: DataFrame,
    token_budget: int,
    max_epochs: int = 4,
    domain_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """(domain, n_tokens, cap_tokens, alloc_tokens, epochs_fx6) —
    the UniMax allocation of ``token_budget`` over the corpus's
    domains with per-domain repetition capped at ``max_epochs``.
    ``epochs_fx6 = alloc · 10⁶ DIV n_tokens`` is the audit column
    (≤ max_epochs · 10⁶ by construction). Σ alloc_tokens =
    min(budget, Σ cap_tokens) exactly."""
    budget, epochs = _validate(token_budget, max_epochs)
    counts = (
        docs.filter(F.trim(F.col(text_col)) != "")
        .groupBy(F.col(domain_col).alias("domain"))
        .agg(
            F.sum(F.size(_ws_tokens(F.trim(F.col(text_col)))))
            .cast("bigint")
            .alias("n_tokens")
        )
        .withColumn(
            "cap_tokens", F.expr(f"n_tokens * {epochs}L")
        )
    )
    w = Window.orderBy("cap_tokens", "domain")
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = (
        counts.withColumn("i", F.row_number().over(w))
        # prefix sum in DECIMAL(38,0): Σcaps is data-bounded and
        # int64 only up to ~9e14 total tokens at the epoch cap
        .withColumn(
            "p",
            F.sum(F.col("cap_tokens").cast("decimal(38,0)")).over(
                w.rowsBetween(
                    Window.unboundedPreceding, Window.currentRow
                )
            ),
        )
        .withColumn("m", F.count("*").over(wall))
        # division form of k·q + P <= B (see module doc): no
        # cap·(m-i+1) product, so no data-dependent overflow
        .withColumn(
            "capped",
            F.expr(
                f"p - cap_tokens <= {budget}L AND cap_tokens <="
                f" ({budget}L - (p - cap_tokens)) DIV (m - i + 1)"
            ),
        )
    )
    tot = ranked.agg(
        F.sum(F.when(F.col("capped"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_capped"),
        F.coalesce(
            F.max(F.when(F.col("capped"), F.col("p"))),
            F.lit(0),
        )
        .cast("bigint")
        .alias("p_capped"),
    )
    return (
        ranked.crossJoin(F.broadcast(tot))
        .select(
            "domain",
            "n_tokens",
            "cap_tokens",
            F.expr(
                "CASE WHEN capped THEN cap_tokens ELSE"
                f" ({budget}L - p_capped) DIV (m - n_capped)"
                " + (CASE WHEN i - n_capped <="
                f" ({budget}L - p_capped) % (m - n_capped)"
                " THEN 1 ELSE 0 END) END"
            ).alias("alloc_tokens"),
        )
        .withColumn(
            # alloc ≤ cap = n_tokens·max_epochs, so alloc·10⁶ can
            # exceed int64 for large domains — widen the product;
            # the quotient ≤ max_epochs·10⁶ + 10⁶ fits bigint
            "epochs_fx6",
            F.expr(
                "CAST(alloc_tokens AS DECIMAL(38,0))"
                f" * {FX} DIV n_tokens"
            ),
        )
        .orderBy("domain")
    )


def unimax_allocation_sql(
    token_budget: int,
    max_epochs: int = 4,
    table: str = "documents",
    domain_col: str = "source",
    text_col: str = "text",
) -> str:
    """DuckDB oracle twin of :func:`unimax_allocation` — the count
    pass, the sorted prefix window, the capped-prefix rule, and the
    floor-share + remainder distribution, term for term."""
    budget, epochs = _validate(token_budget, max_epochs)
    n_tok = WS_COUNT_SQL.format(text=text_col)
    return (
        f"WITH c AS (SELECT {domain_col} AS domain,"
        f"  CAST(sum({n_tok}) AS BIGINT) AS n_tokens,"
        f"  CAST(sum({n_tok}) * {epochs} AS BIGINT) AS cap_tokens"
        f"  FROM {table} WHERE trim({text_col}) <> ''"
        "  GROUP BY domain),"
        " r AS (SELECT domain, n_tokens, cap_tokens,"
        "  CAST(row_number() OVER o AS BIGINT) AS i,"
        "  CAST(sum(cap_tokens) OVER (o ROWS UNBOUNDED PRECEDING)"
        "   AS HUGEINT) AS p,"
        "  CAST(count(*) OVER () AS BIGINT) AS m"
        "  FROM c WINDOW o AS (ORDER BY cap_tokens, domain)),"
        f" rc AS (SELECT *, p - cap_tokens <= {budget}"
        f"  AND cap_tokens <= ({budget} - (p - cap_tokens))"
        "  // (m - i + 1) AS capped FROM r),"
        " t AS (SELECT CAST(sum(CASE WHEN capped THEN 1 ELSE 0 END)"
        "  AS BIGINT) AS n_capped,"
        "  CAST(COALESCE(max(CASE WHEN capped THEN p END), 0)"
        "   AS BIGINT) AS p_capped FROM rc)"
        " SELECT domain, n_tokens, cap_tokens,"
        "  CAST(CASE WHEN capped THEN cap_tokens ELSE"
        f"   ({budget} - p_capped) // (m - n_capped)"
        f"   + (CASE WHEN i - n_capped <= ({budget} - p_capped)"
        "     % (m - n_capped) THEN 1 ELSE 0 END) END AS BIGINT)"
        "   AS alloc_tokens,"
        "  CAST((CAST(CASE WHEN capped THEN cap_tokens ELSE"
        f"   ({budget} - p_capped) // (m - n_capped)"
        f"   + (CASE WHEN i - n_capped <= ({budget} - p_capped)"
        "     % (m - n_capped) THEN 1 ELSE 0 END) END AS HUGEINT)"
        f"   * {FX})"
        "   // n_tokens AS BIGINT) AS epochs_fx6"
        " FROM rc CROSS JOIN t ORDER BY domain"
    )
