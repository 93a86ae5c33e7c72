"""DoReMi-lite — iterative domain-mixture reweighting, integer-exact.

Implements the reweighting loop of DoReMi (Xie et al. 2023, public
preprint: "DoReMi: Optimizing Data Mixtures Speeds Up Language Model
Pretraining") in the form a relational engine can certify: domains
whose documents score WORSE than the mixture-weighted reference get
their sampling weight multiplied up each round (Group-DRO
multiplicative weights), so the next round of training over-samples
the domains the current model serves worst. The paper's per-domain
excess loss comes from a proxy-vs-reference model pair; the lite
proxy here is each domain's average per-token cross-entropy under
the corpus-trained unigram LM (``lm_score`` arithmetic — exactly the
quality signal the engine already certifies), and the reference is
the mixture-weighted mean loss, recomputed each round under the
CURRENT weights.

Arithmetic is INTEGER-EXACT end-to-end (the ``graph.py`` PageRank
rule): losses land in 10⁻⁶-bit units via the portable floor edge,
weights live in SCALE = 10⁹ fixed-point units, and each round is

    ref_t      = (Σ_d w_t(d) · loss(d)) DIV SCALE          (units)
    excess_d   = min(max(loss(d) − ref_t, 0), EXC_CAP)
    w'_d       = w_t(d) · (DEN + (excess_d · η_num) DIV η_den) DIV DEN
    w_t+1(d)   = w'_d · SCALE DIV Σ w'                      (renorm)

— floor divisions only, so every round is bit-reproducible across
any shuffle order and replayable by the DuckDB oracle as chained
CTEs. The exponentiated-gradient ``exp(η·excess)`` of the paper is
linearized to ``1 + η·excess`` (first-order equivalent per round;
compounding across rounds restores the multiplicative character)
because a transcendental in the loop would break integer exactness.

Overflow rails (every product proven < 2⁶³): excess is CLAMPED at
EXC_CAP = 8 bits (DoReMi clips too — one round moving a domain by
>2³ᐟ² is a step-size bug, not a signal), and η ≤ 1 is enforced, so
  ref:    Σ_d w·loss ≤ SCALE·64·10⁶ = 6.4·10¹⁶            (Σw = SCALE)
  step:   w·(DEN + cap·η) ≤ 10⁹·9·10⁶ = 9·10¹⁵
  renorm: w′·SCALE ≤ 9·10⁹·10⁹ = 9·10¹⁸ < 2⁶³.

Scale notes: the only corpus-sized work is the one-pass loss
aggregate (token explode → (doc,token) tf pre-agg → per-domain
``dsum_tf``, all shapes certified in ``lm_score``); the iteration
runs on the DOMAIN table (dimension-sized — sources, not documents),
broadcast throughout. n_iter is a fixed parameter: the loop is
driver-composed like PageRank, no data-dependent round count.

Reference scope: ``sqlengine.py:1-753`` has no corpus surface;
extension, SURVEY §2.4 training-composition family (sits beside
``mixture.py``'s budget sampler, which CONSUMES the weights this
operator produces).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from minisql_engine_spark.operators.portable_round import (
    dsum_tf as _dsum_tf,
)
from minisql_engine_spark.operators.text import _norm_text, _ws_tokens

#: fixed-point weight scale — weights sum to SCALE each round.
#: 10⁹ (not PageRank's 10¹²) so every product in the loop stays
#: inside int64 without decimal promotion (rails in the module doc)
SCALE = 10**9
#: fixed-point factor denominator for the multiplicative update
DEN = 10**6
#: per-round excess clamp: 8 bits of excess loss, in 10⁻⁶-bit units
EXC_CAP = 8 * 10**6
#: default step size η = 1/2 per bit of excess loss
ETA_NUM = 1
ETA_DEN = 2


def _validate_eta(eta_num: int, eta_den: int) -> tuple[int, int]:
    """Reduce η by gcd and enforce the FULL overflow rail.

    0 <= η <= 1 bounds the final multiplier, but the INTERMEDIATE
    ``excess_units * eta_num`` is bounded only by ``EXC_CAP *
    eta_num`` — e.g. η = 10¹³/(2·10¹³) is a valid 1/2 yet wraps
    Spark's non-ANSI bigint multiply at 8·10¹⁹ while DuckDB errors,
    breaking engine parity (ADVICE r10). Floor division is invariant
    under common scaling (c·a·x / (c·b) = a·x / b as exact
    rationals), so gcd reduction never changes a weight; after
    reduction the magnitude rail must hold outright."""
    import math

    if eta_num < 0 or eta_den <= 0 or eta_num > eta_den:
        raise ValueError(
            f"need 0 <= eta = {eta_num}/{eta_den} <= 1 (overflow rail)"
        )
    g = math.gcd(eta_num, eta_den)
    if g > 1:
        eta_num, eta_den = eta_num // g, eta_den // g
    if EXC_CAP * eta_num >= 2**63:
        raise ValueError(
            f"eta_num {eta_num} (gcd-reduced) overflows the int64 "
            f"intermediate: EXC_CAP * eta_num must stay < 2**63"
        )
    return eta_num, eta_den


def domain_losses(
    docs: DataFrame,
    domain_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(domain, n_docs, n_tokens, loss_units) — each domain's average
    per-token cross-entropy (10⁻⁶-bit integer units) under the
    corpus-trained Laplace unigram LM. One corpus pass; the tf
    pre-agg + ``dsum_tf`` keep the decimal sum exact and
    order-independent (bitwise the ``lm_score`` arithmetic)."""
    toks = docs.select(
        F.col(domain_col).alias("domain"),
        F.col(id_col),
        F.explode(_ws_tokens(_norm_text(F.col(text_col)))).alias(
            "token"
        ),
    )
    counts = toks.groupBy("token").agg(
        F.count("*").cast("bigint").alias("c")
    )
    totals = counts.agg(
        F.sum("c").cast("bigint").alias("t_total"),
        F.count("*").cast("bigint").alias("v_size"),
    )
    logp = F.log2(
        (F.col("c").cast("double") + F.lit(1.0))
        / (F.col("t_total") + F.col("v_size")).cast("double")
    )
    dtf = toks.groupBy("domain", id_col, "token").agg(
        F.count("*").cast("bigint").alias("tf")
    )
    return (
        dtf.join(counts, "token")
        .crossJoin(F.broadcast(totals))
        .groupBy("domain")
        .agg(
            F.countDistinct(id_col).cast("bigint").alias("n_docs"),
            F.sum("tf").cast("bigint").alias("n_tokens"),
            (
                -_dsum_tf(logp, F.col("tf"))
                / F.sum("tf").cast("double")
            ).alias("_h"),
        )
        # portable floor edge into integer units: same construction
        # as fx6 minus the /1e6 (bit-identical floor in both
        # engines; |h| ≤ 64 so no BIGINT hazard)
        .select(
            "domain",
            "n_docs",
            "n_tokens",
            F.floor(F.col("_h") * F.lit(1e6) + F.lit(0.5))
            .cast("bigint")
            .alias("loss_units"),
        )
    )


def doremi_weights(
    docs: DataFrame,
    n_iter: int = 5,
    domain_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    eta_num: int = ETA_NUM,
    eta_den: int = ETA_DEN,
) -> DataFrame:
    """(round, domain, loss_units, excess_units, weight_units) — the
    full reweighting trajectory: round 0 is the uniform start, round
    t the weights after t multiplicative updates. ``weight_units``
    sums to SCALE (± one unit per domain from the floor renorm) in
    every round — the mass-conservation gate a consumer can assert.
    Feed the final round's ``weight_units / SCALE`` into
    ``mixture.mixture_sample`` as the per-source weights."""
    if n_iter < 1:
        raise ValueError(f"n_iter must be >= 1, got {n_iter}")
    eta_num, eta_den = _validate_eta(eta_num, eta_den)
    losses = domain_losses(docs, domain_col, id_col, text_col)
    # the iteration input is DOMAIN-sized (dimension table):
    # localCheckpoint so the corpus-sized loss subtree runs exactly
    # once, not once per round (the PageRank lineage rule)
    losses = losses.localCheckpoint(eager=False)

    n_dom = losses.select(
        F.count("*").cast("long").alias("n_domains")
    )
    w = (
        losses.crossJoin(F.broadcast(n_dom))
        .select(
            "domain",
            "loss_units",
            F.expr(f"{SCALE}L DIV n_domains").alias("weight_units"),
        )
    )
    rounds = [
        w.select(
            F.lit(0).cast("int").alias("round"),
            "domain",
            "loss_units",
            F.lit(0).cast("bigint").alias("excess_units"),
            "weight_units",
        )
    ]
    for t in range(1, n_iter + 1):
        ref = w.agg(
            F.expr(
                f"CAST(sum(weight_units * loss_units) DIV {SCALE}L"
                " AS BIGINT)"
            ).alias("ref_units")
        )
        stepped = (
            w.crossJoin(F.broadcast(ref))
            .select(
                "domain",
                "loss_units",
                F.least(
                    F.greatest(
                        F.col("loss_units") - F.col("ref_units"),
                        F.lit(0).cast("bigint"),
                    ),
                    F.lit(EXC_CAP).cast("bigint"),
                ).alias("excess_units"),
                "weight_units",
            )
            .select(
                "domain",
                "loss_units",
                "excess_units",
                F.expr(
                    f"(weight_units * ({DEN}L +"
                    f" (excess_units * {eta_num}L) DIV {eta_den}L))"
                    f" DIV {DEN}L"
                ).alias("_w1"),
            )
        )
        tot = stepped.agg(
            F.sum("_w1").cast("long").alias("_wsum")
        )
        w = (
            stepped.crossJoin(F.broadcast(tot))
            .select(
                "domain",
                "loss_units",
                "excess_units",
                F.expr(f"(_w1 * {SCALE}L) DIV _wsum")
                .cast("bigint")
                .alias("weight_units"),
            )
            .localCheckpoint(eager=False)
        )
        rounds.append(
            w.select(
                F.lit(t).cast("int").alias("round"),
                "domain",
                "loss_units",
                "excess_units",
                "weight_units",
            )
        )
    out = rounds[0]
    for r in rounds[1:]:
        out = out.unionByName(r)
    return out.orderBy("round", "domain")


def _doremi_ctes_sql(
    n_iter: int,
    table: str,
    domain_col: str,
    id_col: str,
    text_col: str,
    eta_num: int,
    eta_den: int,
) -> str:
    """CTE chain ending in ``w{n_iter}(domain, loss_units,
    excess_units, weight_units)`` — the full reweighting replay.
    Shared by :func:`doremi_weights_sql` and
    :func:`doremi_mixture_selection_sql` so both oracles replay the
    IDENTICAL learning loop (the ``knn_graph._knn_ctes_sql``
    pattern). η must already be gcd-reduced/validated."""
    loss_cte = (
        f" toks AS (SELECT {domain_col} AS domain, {id_col},"
        "  unnest(string_split(regexp_replace(lower(trim("
        f"{text_col})), '\\s+', ' ', 'g'), ' ')) AS token"
        f"  FROM {table} WHERE trim({text_col}) <> ''),"
        " cnts AS (SELECT token, CAST(count(*) AS BIGINT) AS c"
        "  FROM toks GROUP BY token),"
        " tot AS (SELECT CAST(sum(c) AS BIGINT) AS t_total,"
        "  CAST(count(*) AS BIGINT) AS v_size FROM cnts),"
        " dl AS (SELECT domain,"
        f"  CAST(count(DISTINCT {id_col}) AS BIGINT) AS n_docs,"
        "  CAST(count(*) AS BIGINT) AS n_tokens,"
        "  CAST(floor((-CAST(sum(CAST(log2((CAST(c AS DOUBLE) + 1.0)"
        "    / CAST(t_total + v_size AS DOUBLE)) AS DECIMAL(38,12)))"
        "    AS DOUBLE) / CAST(count(*) AS DOUBLE)) * 1e6 + 0.5)"
        "   AS BIGINT) AS loss_units"
        "  FROM toks JOIN cnts USING (token) CROSS JOIN tot"
        "  GROUP BY domain),"
        " nd AS (SELECT CAST(count(*) AS BIGINT) AS n_domains FROM dl),"
        " w0 AS (SELECT domain, loss_units,"
        "  CAST(0 AS BIGINT) AS excess_units,"
        f"  CAST({SCALE} // n_domains AS BIGINT) AS weight_units"
        "  FROM dl CROSS JOIN nd)"
    )
    ctes = [loss_cte]
    for t in range(1, n_iter + 1):
        p = t - 1
        ctes.append(
            f" ref{t} AS (SELECT CAST(sum(weight_units * loss_units)"
            f"  // {SCALE} AS BIGINT) AS ref_units FROM w{p})"
        )
        ctes.append(
            f" st{t} AS (SELECT domain, loss_units,"
            f"  CAST(least(greatest(loss_units - ref_units, 0),"
            f"   {EXC_CAP}) AS BIGINT) AS excess_units,"
            f"  CAST((weight_units * ({DEN} +"
            f"   (least(greatest(loss_units - ref_units, 0),"
            f"    {EXC_CAP}) * {eta_num})"
            f"   // {eta_den})) // {DEN} AS BIGINT) AS w1"
            f"  FROM w{p} CROSS JOIN ref{t})"
        )
        ctes.append(
            f" ws{t} AS (SELECT CAST(sum(w1) AS BIGINT) AS wsum"
            f"  FROM st{t})"
        )
        ctes.append(
            f" w{t} AS (SELECT domain, loss_units, excess_units,"
            f"  CAST((w1 * {SCALE}) // wsum AS BIGINT) AS weight_units"
            f"  FROM st{t} CROSS JOIN ws{t})"
        )
    return "WITH" + ",".join(ctes)


def doremi_weights_sql(
    n_iter: int = 5,
    table: str = "documents",
    domain_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    eta_num: int = ETA_NUM,
    eta_den: int = ETA_DEN,
) -> str:
    """DuckDB oracle twin of :func:`doremi_weights` — replays the
    loss aggregate (per-instance decimal sum: value-identical to the
    tf-weighted Spark form by the ``dsum_tf`` identity) and every
    integer round as chained CTEs."""
    eta_num, eta_den = _validate_eta(eta_num, eta_den)
    unions = " UNION ALL ".join(
        f"SELECT {t} AS round, domain, loss_units,"
        f" excess_units, weight_units FROM w{t}"
        for t in range(0, n_iter + 1)
    )
    return (
        _doremi_ctes_sql(
            n_iter, table, domain_col, id_col, text_col, eta_num,
            eta_den,
        )
        + " SELECT CAST(round AS INT) AS round,"
        " domain, loss_units, excess_units, weight_units FROM ("
        + unions
        + ") ORDER BY round, domain"
    )


#: token-budget rail for the composed selection: weight_units ≤ SCALE
#: after renorm, so weight_units · budget stays < 2⁶³ for any budget
#: ≤ 10⁹ with 10⁸× headroom. A 10⁹-token budget is a config knob, not
#: a data size — raise SCALE-aware if ever needed.
BUDGET_CAP = 10**9


def doremi_mixture_selection(
    docs: DataFrame,
    token_budget: int,
    n_iter: int = 4,
    domain_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    eta_num: int = ETA_NUM,
    eta_den: int = ETA_DEN,
    seed: str = "mixture",
) -> DataFrame:
    """The closed loop: LEARN the domain weights (``doremi_weights``,
    ``n_iter`` Group-DRO rounds) and SPEND the token budget under
    them (``mixture.mixture_sample``'s admission rule) in ONE plan —
    no driver-side weight dict, no float detour. Each domain's
    allowance is the integer floor share

        allowance(d) = weight_units(d) · budget DIV Σ weight_units

    (exact in int64 by the BUDGET_CAP rail — the float
    ``w/Σw · budget`` of the dict path is replaced by the same
    fixed-point arithmetic the learner runs on), and documents fill
    it in the decision-hash order of ``sampling.sample_hash`` with
    the straddler kept. Returns ``(source, doc_id, n_tokens,
    cum_tokens, allowance_tokens)`` for every selected doc.

    Scale: the learned-weights table is DOMAIN-sized and broadcast;
    the selection adds one hash partition on source + one window
    sort, exactly ``mixture_sample``'s shape. Nothing is collected.

    Reference scope: sqlengine.py:1-753 has no corpus surface;
    extension, SURVEY §2.4 training-composition family (closes the
    doremi_weights → mixture_sample loop as one certified plan)."""
    from minisql_engine_spark.operators.sampling import sample_hash
    from pyspark.sql.window import Window

    budget = int(token_budget)
    if not 1 <= budget <= BUDGET_CAP:
        raise ValueError(
            f"token_budget must be in [1, {BUDGET_CAP}], got {budget}"
        )
    traj = doremi_weights(
        docs, n_iter, domain_col, id_col, text_col, eta_num, eta_den
    )
    final = traj.filter(F.col("round") == n_iter).select(
        F.col("domain").alias("source"), "weight_units"
    )
    tot = final.agg(
        F.sum("weight_units").cast("long").alias("_tot_units")
    )
    allow = (
        final.crossJoin(F.broadcast(tot))
        .select(
            "source",
            F.expr(f"(weight_units * {budget}L) DIV _tot_units")
            .cast("long")
            .alias("allowance_tokens"),
        )
    )
    base = docs.select(
        F.col(domain_col).alias("source"),
        F.col(id_col).alias("doc_id"),
        F.size(_ws_tokens(F.col(text_col)))
        .cast("bigint")
        .alias("n_tokens"),
    ).join(F.broadcast(allow), "source")
    w = (
        Window.partitionBy("source")
        .orderBy(sample_hash(F.col("doc_id"), seed), F.col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_tokens").over(w)
    return base.select(
        "source",
        "doc_id",
        "n_tokens",
        cum.alias("cum_tokens"),
        "allowance_tokens",
    ).filter(
        F.col("cum_tokens") - F.col("n_tokens")
        < F.col("allowance_tokens")
    )


def doremi_mixture_selection_sql(
    token_budget: int,
    n_iter: int = 4,
    table: str = "documents",
    domain_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    eta_num: int = ETA_NUM,
    eta_den: int = ETA_DEN,
    seed: str = "mixture",
) -> str:
    """DuckDB oracle twin of :func:`doremi_mixture_selection` — the
    shared learning-chain CTEs (every reweighting round replayed)
    plus the integer allowance and the decision-hash admission
    window, term for term."""
    from minisql_engine_spark.operators.sampling import sample_hash_sql
    from minisql_engine_spark.operators.packing import WS_COUNT_SQL

    budget = int(token_budget)
    if not 1 <= budget <= BUDGET_CAP:
        raise ValueError(
            f"token_budget must be in [1, {BUDGET_CAP}], got {budget}"
        )
    eta_num, eta_den = _validate_eta(eta_num, eta_den)
    pri = sample_hash_sql("doc_id", seed)
    n_tok = WS_COUNT_SQL.format(text=f"d.{text_col}")
    return (
        _doremi_ctes_sql(
            n_iter, table, domain_col, id_col, text_col, eta_num,
            eta_den,
        )
        + f", wt AS (SELECT CAST(sum(weight_units) AS BIGINT) AS tot"
        f"  FROM w{n_iter}),"
        " alw AS (SELECT domain AS source,"
        f"  CAST((weight_units * {budget}) // tot AS BIGINT)"
        "   AS allowance_tokens"
        f"  FROM w{n_iter} CROSS JOIN wt),"
        f" b AS (SELECT d.{domain_col} AS source,"
        f"  d.{id_col} AS doc_id, {n_tok} AS n_tokens,"
        "  a.allowance_tokens"
        f"  FROM {table} d JOIN alw a ON a.source = d.{domain_col}),"
        " c AS (SELECT source, doc_id, n_tokens,"
        "  CAST(sum(n_tokens) OVER (PARTITION BY source"
        f"   ORDER BY {pri}, doc_id ROWS UNBOUNDED PRECEDING)"
        "   AS BIGINT) AS cum_tokens, allowance_tokens FROM b)"
        " SELECT source, doc_id, n_tokens, cum_tokens,"
        " allowance_tokens"
        " FROM c WHERE cum_tokens - n_tokens < allowance_tokens"
    )
