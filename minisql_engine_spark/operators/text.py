"""Text-analysis operators for large-scale training-data pipelines.

Language-ID (stopword-n-gram heuristic), quality scoring, token
counting (whitespace + BPE-ish regex), and document fingerprinting —
each over the ``documents`` table (doc_id, text, lang, source,
n_chars). The reference engine has no string functions at all
(SURVEY §2.2 row 7); these are the §2.4 extension surface.

Everything is built from JVM-side ``pyspark.sql.functions`` column
expressions — whole-stage codegen, zero Python in the hot path — and
each transformation is deliberately expressible in ANSI SQL so the
DuckDB oracle can verify it bit-for-bit (integer counts; doubles only
as single divisions of integers, which are IEEE-identical across
engines).

Scale: all operators are per-row map transformations (no shuffle at
all) except fingerprint-grouping, which shuffles on an md5 key —
uniformly distributed by construction, no skew.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from minisql_engine_spark.operators.portable_round import (
    dsum as _dsum,
    dsum_sql as _dsum_sql,
    fx6 as _fx6,
    fx6_sql as _fx6_sql,
)

# Tiny per-language stopword lists for the n-gram/stopword heuristic.
# Deliberately small + hardcoded: the heuristic must be reproducible in
# plain SQL in both engines (regexp word-boundary counts).
LANG_MARKERS: dict[str, str] = {
    "en": r"\b(the|and|of|to|in|is|it|that|was|for)\b",
    "de": r"\b(der|die|das|und|ist|nicht|ein|mit|von|zu)\b",
    "fr": r"\b(le|la|les|et|est|une|des|dans|pour|que)\b",
    "es": r"\b(el|la|los|las|es|una|del|para|con|por)\b",
    "zh": r"\b(de|shi|bu|le|wo|ni|ta|men|zai|you)\b",
}

#: BPE-ish tokenizer regex: letter runs, single digits, single
#: non-alnum marks — approximates byte-pair pre-tokenization.
BPE_ISH = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"


def _ws_tokens(text: Column) -> Column:
    """Whitespace tokens; empty text → empty array (not [''])."""
    t = F.trim(text)
    return F.when(t == "", F.array().cast("array<string>")).otherwise(
        F.split(t, r"\s+")
    )


def with_token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Token counting: whitespace tokens + BPE-ish regex tokens.

    Pure map-side; both counts are portable regex semantics (same in
    Java regex and RE2 for these patterns).
    """
    text = F.col(text_col)
    return df.withColumns(
        {
            "n_ws_tokens": F.size(_ws_tokens(text)).cast("bigint"),
            "n_bpe_tokens": F.size(F.regexp_extract_all(text, F.lit(BPE_ISH), 0)).cast(
                "bigint"
            ),
        }
    )


def with_quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic document quality: length, punctuation ratio, stopword
    ratio, mean word length → [0,1]-ish score.

    The score recipe (ratios + clamps) uses only integer counts and
    single divisions, so it is bit-reproducible in the SQL oracle.
    """
    text = F.col(text_col)
    n_chars = F.length(text).cast("bigint")
    n_tokens = F.size(_ws_tokens(text)).cast("bigint")
    n_punct = F.size(
        F.regexp_extract_all(text, F.lit(r"[^A-Za-z0-9\s]"), 0)
    ).cast("bigint")
    n_stop = F.size(
        F.regexp_extract_all(F.lower(text), F.lit(LANG_MARKERS["en"]), 0)
    ).cast("bigint")
    safe_tokens = F.greatest(n_tokens, F.lit(1))
    safe_chars = F.greatest(n_chars, F.lit(1))
    punct_ratio = n_punct.cast("double") / safe_chars
    stop_ratio = n_stop.cast("double") / safe_tokens
    mean_word_len = (n_chars - (n_tokens - 1)).cast("double") / safe_tokens
    # quality: reward stopword presence & sane word length, punish punct
    score = (
        F.lit(0.5)
        + F.least(stop_ratio, F.lit(0.3))
        - F.least(punct_ratio, F.lit(0.3))
        + F.when((mean_word_len >= 3) & (mean_word_len <= 10), 0.2).otherwise(
            0.0
        )
    )
    return df.withColumns(
        {
            "n_chars_m": n_chars,
            "n_tokens": n_tokens,
            "punct_ratio": punct_ratio,
            "stop_ratio": stop_ratio,
            "mean_word_len": mean_word_len,
            "quality_score": score,
        }
    )


def with_lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-marker language ID: per-language word-boundary regex
    counts, argmax with deterministic tie-break (marker-count desc,
    then language code asc), 'und' when nothing matches.
    """
    text = F.lower(F.col(text_col))
    counts = {
        lang: F.size(F.regexp_extract_all(text, F.lit(rx), 0)).cast("bigint")
        for lang, rx in LANG_MARKERS.items()
    }
    # argmax via greatest + chained CASE in code-order (deterministic)
    best = F.greatest(*counts.values())
    pred = F.lit("und")
    for lang in sorted(LANG_MARKERS):  # asc code order; first max wins
        pred = F.when(
            (counts[lang] == best) & (best > 0) & (pred == "und"), F.lit(lang)
        ).otherwise(pred)
    out = df
    for lang in sorted(LANG_MARKERS):
        out = out.withColumn(f"n_{lang}", counts[lang])
    return out.withColumn("lang_pred", pred)


def with_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprinting: md5 content hash over
    whitespace-normalized lowercase text + a 16-way shard key from the
    hash prefix (uniform → skew-free downstream grouping).
    """
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    fp = F.md5(norm)
    return df.withColumns(
        {
            "fingerprint": fp,
            "fp_shard": F.substring(fp, 1, 1),
        }
    )


def with_repetition_ratio(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Repetition detection: 1 − distinct_word_trigrams / total_word_trigrams.

    High values flag boilerplate/looping text — a standard LLM
    training-data quality gate alongside [[quality_score]]. Docs with
    < 3 tokens get ratio 0 (nothing to repeat). Integer counts + one
    division → oracle bit-reproducible; tokens are materialized before
    the shingle lambda (see operators/dedup.py inlining note).
    """
    toked = df.withColumn(
        "_rr_toks",
        F.split(
            F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " "),
            " ",
        ),
    )
    t = F.col("_rr_toks")
    n = F.size(t)
    all_g = F.when(
        n >= 3,
        F.transform(
            F.sequence(F.lit(0), n - 3),
            lambda i: F.concat_ws(
                " ",
                F.element_at(t, i + 1),
                F.element_at(t, i + 2),
                F.element_at(t, i + 3),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    total = F.size(all_g).cast("bigint")
    distinct = F.size(F.array_distinct(all_g)).cast("bigint")
    return (
        toked.withColumns(
            {
                "n_trigrams": total,
                "n_distinct_trigrams": distinct,
                "repetition_ratio": F.when(total > 0,
                    F.lit(1.0) - distinct.cast("double") / total
                ).otherwise(F.lit(0.0)),
            }
        )
        .drop("_rr_toks")
    )


def text_metrics_all(df: DataFrame, text_col: str = "text") -> DataFrame:
    """All five text-analysis families fused into one map-side pass
    with every shared subexpression materialized exactly once.

    Composing the individual ``with_*`` operators evaluates the
    whitespace split three times, the English-stopword regex twice
    (quality's ``n_stop`` ≡ lang-ID's ``n_en``), and the word-trigram
    transform twice (``size`` + ``array_distinct`` both reference it;
    Catalyst does not CSE across the references) — measured ~1.6 s at
    sf0.1 (BENCH r3/r4, VERDICT r3 "what's wrong" #2). Here the
    normalized text, both token arrays, and the trigram array each
    land in ONE named column of a stacked Project, so each regex /
    split / transform runs once per row. Semantics are bit-identical
    to the composed operators (same expressions, same clamps); the
    DuckDB oracle is unchanged.

    Output columns match the driver's ``text_metrics`` entry; the
    intermediate ``_``-prefixed columns are dropped.
    """
    text = F.col(text_col)
    # stage 1: normalized text (the one regexp_replace) — feeds the
    # lowercase token array AND the fingerprint
    s1 = df.withColumns(
        {
            "_norm": F.regexp_replace(
                F.lower(F.trim(text)), r"\s+", " "
            ),
            "_lower": F.lower(text),
        }
    )
    # stage 2: arrays + per-language marker counts, each computed once
    lang_counts = {
        f"n_{lang}": F.size(
            F.regexp_extract_all(F.col("_lower"), F.lit(rx), 0)
        ).cast("bigint")
        for lang, rx in LANG_MARKERS.items()
    }
    s2 = s1.withColumns(
        {
            "_toks": _ws_tokens(text),
            "_lt": F.split(F.col("_norm"), " "),
            "_fp": F.md5(F.col("_norm")),
            "n_bpe_tokens": F.size(
                F.regexp_extract_all(text, F.lit(BPE_ISH), 0)
            ).cast("bigint"),
            "_n_punct": F.size(
                F.regexp_extract_all(text, F.lit(r"[^A-Za-z0-9\s]"), 0)
            ).cast("bigint"),
            **lang_counts,
        }
    )
    # stage 3: trigram array from the materialized lowercase tokens
    lt = F.col("_lt")
    n_lt = F.size(lt)
    s3 = s2.withColumns(
        {
            "_grams": F.when(
                n_lt >= 3,
                F.transform(
                    F.sequence(F.lit(0), n_lt - 3),
                    lambda i: F.concat_ws(
                        " ",
                        F.element_at(lt, i + 1),
                        F.element_at(lt, i + 2),
                        F.element_at(lt, i + 3),
                    ),
                ),
            ).otherwise(F.array().cast("array<string>")),
            "_n_tokens": F.size(F.col("_toks")).cast("bigint"),
            "_n_chars": F.length(text).cast("bigint"),
        }
    )
    # stage 4: scalar metrics — quality's n_stop IS n_en, paid once
    n_tokens = F.col("_n_tokens")
    n_chars = F.col("_n_chars")
    n_stop = F.col("n_en")
    safe_tokens = F.greatest(n_tokens, F.lit(1))
    safe_chars = F.greatest(n_chars, F.lit(1))
    punct_ratio = F.col("_n_punct").cast("double") / safe_chars
    stop_ratio = n_stop.cast("double") / safe_tokens
    mean_word_len = (n_chars - (n_tokens - 1)).cast("double") / safe_tokens
    counts = {lang: F.col(f"n_{lang}") for lang in LANG_MARKERS}
    best = F.greatest(*counts.values())
    pred = F.lit("und")
    for lang in sorted(LANG_MARKERS):
        pred = F.when(
            (counts[lang] == best) & (best > 0) & (pred == "und"),
            F.lit(lang),
        ).otherwise(pred)
    total = F.size(F.col("_grams")).cast("bigint")
    distinct = F.size(F.array_distinct(F.col("_grams"))).cast("bigint")
    out = s3.withColumns(
        {
            "n_ws_tokens": n_tokens,
            "punct_ratio": punct_ratio,
            "stop_ratio": stop_ratio,
            "mean_word_len": mean_word_len,
            "quality_score": (
                F.lit(0.5)
                + F.least(stop_ratio, F.lit(0.3))
                - F.least(punct_ratio, F.lit(0.3))
                + F.when(
                    (mean_word_len >= 3) & (mean_word_len <= 10), 0.2
                ).otherwise(0.0)
            ),
            "lang_pred": pred,
            "fingerprint": F.col("_fp"),
            "fp_shard": F.substring(F.col("_fp"), 1, 1),
            "n_trigrams": total,
            "n_distinct_trigrams": distinct,
            "repetition_ratio": F.when(
                total > 0, F.lit(1.0) - distinct.cast("double") / total
            ).otherwise(F.lit(0.0)),
        }
    )
    return out.drop(
        "_norm", "_lower", "_toks", "_lt", "_fp", "_grams",
        "_n_punct", "_n_tokens", "_n_chars",
    )


# ---------------------------------------------------------------------------
# Corpus-level statistics (the only shuffling operators in this module)
# ---------------------------------------------------------------------------


def vocabulary_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_k: int | None = None,
) -> DataFrame:
    """(token, tf, doc_freq): corpus-wide term frequency and document
    frequency over whitespace tokens of the normalized text — the
    vocabulary audit every tokenizer-training and contamination-check
    step needs.

    Plan shape: explode → ONE shuffle on token with partial
    (map-side) aggregation; doc_freq is a count-distinct over doc_id
    planned as a two-phase aggregate. Tokens distribute ~Zipf but the
    hot keys are exactly the ones partial aggregation collapses
    map-side, so the shuffle carries near-distinct (token, doc) pairs
    for doc_freq and tiny partial counts for tf — no salting needed.
    ``top_k`` adds a global sort bounded by TakeOrdered (no full
    sort materialization)."""
    toks = df.select(
        F.col(id_col),
        F.explode(_ws_tokens(_norm_text(F.col(text_col)))).alias("token"),
    )
    out = toks.groupBy("token").agg(
        F.count("*").cast("bigint").alias("tf"),
        F.countDistinct(id_col).cast("bigint").alias("doc_freq"),
    )
    if top_k is not None:
        out = out.orderBy(F.col("tf").desc(), F.col("token")).limit(top_k)
    return out


def _norm_text(text: Column) -> Column:
    """Whitespace-normalized lowercase content (the dedup _NORM rule)."""
    return F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")


def char_entropy(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, n_chars_e, entropy_bits): Shannon entropy of the
    character distribution per document — the classic cheap
    gibberish/boilerplate signal (natural prose ≈ 4-4.5 bits/char;
    repeated boilerplate and single-char spam sit far lower, random
    base64-ish noise higher).

    Plan: explode characters → (doc, char) hash aggregate → per-doc
    entropy sum — two shuffles on uniformly-distributed keys with
    map-side partials, then a left join back to the distinct id set
    (same cardinality as the documents — both sides hash-partition on
    the id) so empty docs surface as entropy 0. The entropy uses the
    single-pass decomposition ``H = log2(n) − Σ tf·log2(tf) / n``
    (algebraically equal to ``−Σ p·log2 p``), which needs NO window
    over the totals; the oracle replays the identical decomposition
    and both engines round to 6 at the edge (the libm-ulp policy
    every float edge in this package uses).
    """
    chars = df.select(
        F.col(id_col),
        F.explode(F.split(F.col(text_col), "")).alias("_c"),
    ).filter(F.col("_c") != "")
    tf = chars.groupBy(id_col, "_c").agg(F.count("*").alias("_tf"))
    per = tf.groupBy(id_col).agg(
        F.sum("_tf").cast("bigint").alias("_n"),
        _dsum(
            F.col("_tf").cast("double")
            * F.log2(F.col("_tf").cast("double"))
        ).alias("_stl"),
    )
    ids = df.select(F.col(id_col)).distinct()
    return ids.join(per, id_col, "left").select(
        F.col(id_col),
        F.coalesce(F.col("_n"), F.lit(0)).cast("bigint").alias("n_chars_e"),
        F.coalesce(
            _fx6(
                F.log2(F.col("_n").cast("double"))
                - F.col("_stl") / F.col("_n").cast("double")
            ),
            F.lit(0.0),
        ).alias("entropy_bits"),
    )


def char_entropy_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB oracle twin of :func:`char_entropy` — the same
    ``log2(n) − Σ tf·log2(tf)/n`` decomposition, term for term."""
    return (
        f"WITH chars AS (SELECT {id_col},"
        f" unnest(string_split({text_col}, '')) AS c FROM {table}),"
        f" tf AS (SELECT {id_col}, c, count(*) AS tf FROM chars"
        f"  WHERE c <> '' GROUP BY {id_col}, c),"
        f" per AS (SELECT {id_col}, CAST(sum(tf) AS BIGINT) AS n,"
        "  " + _dsum_sql(
            "CAST(tf AS DOUBLE) * log2(CAST(tf AS DOUBLE))"
        ) + " AS stl"
        f"  FROM tf GROUP BY {id_col})"
        f" SELECT d.{id_col},"
        " COALESCE(per.n, 0) AS n_chars_e,"
        " COALESCE(" + _fx6_sql(
            "log2(CAST(per.n AS DOUBLE))"
            " - per.stl / CAST(per.n AS DOUBLE)"
        ) + ", 0.0) AS entropy_bits"
        f" FROM (SELECT DISTINCT {id_col} FROM {table}) d"
        f" LEFT JOIN per ON d.{id_col} = per.{id_col}"
    )


def ngram_counts(
    df: DataFrame,
    n: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 1,
) -> DataFrame:
    """(gram, count, doc_freq): corpus-wide word n-gram count table
    over normalized tokens — the language-model statistics surface
    (`vocabulary_stats` is the n=1 case; trigram repetition in
    ``text_metrics`` is per-doc, this is per-corpus).

    Plan: the gram array builds map-side with the same
    ``transform(sequence)`` idiom as the repetition metric, then ONE
    shuffle on gram with partial aggregation — identical scale shape
    to ``vocabulary_stats``; Zipf-hot grams collapse in the map-side
    combine. ``min_count`` prunes the long tail AFTER the agg (a
    HAVING, not a scan filter — the tail must be counted to be
    known)."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    # tokens materialized BEFORE the lambda indexes them — an inlined
    # tokenize expression re-evaluates per element inside transform()
    # (no CSE across lambda boundaries; the O(n²·len) trap measured
    # on the DSIR bigram build, operators/dsir._features)
    toks = F.col("_ng_toks")
    nt = F.size(toks)
    grams = F.when(
        nt >= n,
        F.transform(
            F.sequence(F.lit(0), nt - n),
            lambda i: F.concat_ws(
                " ",
                *[F.element_at(toks, i + j + 1) for j in range(n)],
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    exploded = df.select(
        F.col(id_col),
        _ws_tokens(_norm_text(F.col(text_col))).alias("_ng_toks"),
    ).select(F.col(id_col), F.explode(grams).alias("gram"))
    out = exploded.groupBy("gram").agg(
        F.count("*").cast("bigint").alias("count"),
        F.countDistinct(id_col).cast("bigint").alias("doc_freq"),
    )
    if min_count > 1:
        out = out.filter(F.col("count") >= min_count)
    return out


def ngram_counts_sql(
    table: str = "documents",
    n: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 1,
) -> str:
    """DuckDB twin of :func:`ngram_counts` (list-comprehension gram
    build, same normalization)."""
    norm = (
        f"regexp_replace(lower(trim({text_col})), '\\s+', ' ', 'g')"
    )
    joined = " || ' ' || ".join(f"tk[i+{j}]" for j in range(n))
    having = f" HAVING count(*) >= {min_count}" if min_count > 1 else ""
    return (
        f"WITH t AS (SELECT {id_col} AS doc_id,"
        f" string_split({norm}, ' ') AS tk FROM {table}"
        f" WHERE trim({text_col}) <> ''),"
        f" g AS (SELECT doc_id, unnest(CASE WHEN len(tk) >= {n} THEN"
        f"  [{joined} for i in range(1, len(tk) - {n} + 2)]"
        "  ELSE [] END) AS gram FROM t)"
        " SELECT gram, CAST(count(*) AS BIGINT) AS count,"
        " CAST(count(DISTINCT doc_id) AS BIGINT) AS doc_freq"
        f" FROM g GROUP BY gram{having}"
    )
