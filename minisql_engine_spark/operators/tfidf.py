"""TF-IDF term weighting, exact and oracle-verifiable.

SURVEY §2.4 lists spark.ml's ``HashingTF``/``IDF`` as the text-
feature path; this module implements TF-IDF natively on DataFrames
instead, for the same reason the dedup stack avoids
``ml.feature.MinHashLSH`` as its primary: the ml estimators hash
terms into fixed buckets (collisions, unverifiable) and hold an
IDF vector on the driver, while the relational formulation keeps
exact per-term weights, scales with the corpus, and is replayable
by the SQL oracle. (The ml library path for LSH lives in
``operators/ml_lsh.py``; the same agreement-test pattern would apply
to HashingTF if bucketed features were ever needed.)

Formulation (smoothed, sklearn-style):

    tf(d, t)  = occurrences of t in d
    idf(t)    = ln((N + 1) / (df(t) + 1)) + 1
    tfidf     = tf · idf, rounded to 6 decimals

Determinism note: ``ln`` on identical doubles can differ between
libm implementations in the last ulp; the round(6) at the edge
absorbs that (the same policy similarity.py uses for cosine scores).

Plan shape: tokens explode once; tf is one (doc, token) hash
aggregate; df/N ride a second token-keyed aggregate joined back —
two shuffles total, both with map-side partials; top-k per doc adds
a window with WindowGroupLimit pushdown.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from minisql_engine_spark.operators.text import _norm_text, _ws_tokens


def tfidf_terms(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_k: int | None = None,
) -> DataFrame:
    """(doc_id, token, tf, doc_freq, tfidf) — exact smoothed TF-IDF
    per (document, term); ``top_k`` keeps each document's highest-
    weighted terms (tfidf desc, token asc tiebreak) — keyword
    extraction."""
    toks = docs.select(
        F.col(id_col),
        F.explode(_ws_tokens(_norm_text(F.col(text_col)))).alias("token"),
    )
    tf = toks.groupBy(id_col, "token").agg(
        F.count("*").cast("bigint").alias("tf")
    )
    n_docs = docs.select(id_col).distinct().count()
    df_t = toks.groupBy("token").agg(
        F.countDistinct(id_col).cast("bigint").alias("doc_freq")
    )
    out = tf.join(df_t, "token").select(
        id_col,
        "token",
        "tf",
        "doc_freq",
        F.round(
            F.col("tf")
            * (
                F.log(
                    (F.lit(float(n_docs + 1)))
                    / (F.col("doc_freq") + F.lit(1)).cast("double")
                )
                + F.lit(1.0)
            ),
            6,
        ).alias("tfidf"),
    )
    if top_k is not None:
        from pyspark.sql.window import Window

        w = Window.partitionBy(id_col).orderBy(
            F.col("tfidf").desc(), F.col("token")
        )
        out = (
            out.withColumn("_r", F.row_number().over(w))
            .filter(F.col("_r") <= top_k)
            .drop("_r")
        )
    return out


def tfidf_terms_sql(
    n_docs: int | None,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    top_k: int | None = None,
) -> str:
    """DuckDB oracle twin of :func:`tfidf_terms`. ``n_docs`` is the
    corpus size (the Spark side computes it with one count; SQL takes
    it as a literal so both use the identical constant). Pass ``None``
    to embed a scalar subquery instead — needed where the SQL string
    must be static (the driver's ``oracle_sql()``); an integer-valued
    count cast to DOUBLE is exact, so both forms agree bit-for-bit."""
    if n_docs is None:
        n1 = (
            f"CAST((SELECT count(DISTINCT {id_col}) FROM {table}) + 1"
            " AS DOUBLE)"
        )
    else:
        n1 = repr(float(n_docs + 1))
    base = (
        f"WITH toks AS (SELECT {id_col}, unnest(string_split("
        f" regexp_replace(lower(trim({text_col})), '\\s+', ' ', 'g'),"
        f" ' ')) AS token FROM {table} WHERE trim({text_col}) <> ''),"
        f" tf AS (SELECT {id_col}, token, CAST(count(*) AS BIGINT) AS tf"
        f"  FROM toks GROUP BY {id_col}, token),"
        " df_t AS (SELECT token,"
        f"  CAST(count(DISTINCT {id_col}) AS BIGINT) AS doc_freq"
        "  FROM toks GROUP BY token),"
        f" scored AS (SELECT {id_col}, tf.token, tf, doc_freq,"
        f"  round(tf * (ln({n1}"
        "   / CAST(doc_freq + 1 AS DOUBLE)) + 1.0), 6) AS tfidf"
        "  FROM tf JOIN df_t ON tf.token = df_t.token)"
    )
    if top_k is None:
        return base + f" SELECT {id_col}, token, tf, doc_freq, tfidf FROM scored"
    return base + (
        f" SELECT {id_col}, token, tf, doc_freq, tfidf FROM ("
        f"  SELECT *, row_number() OVER (PARTITION BY {id_col}"
        "   ORDER BY tfidf DESC, token) AS _r FROM scored)"
        f" WHERE _r <= {top_k}"
    )
