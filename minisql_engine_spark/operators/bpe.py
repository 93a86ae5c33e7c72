"""BPE tokenizer training and application at corpus scale.

Byte-pair-encoding merge learning [Sennrich et al., ACL'16] is the
tokenizer-induction step of an LLM data pipeline. Its scale structure
matters more than its loop: ONE corpus-sized aggregation builds the
(word, freq) table, and every merge iteration after that runs on the
*vocabulary*, which Zipf keeps driver-sized (10⁷–10⁸ distinct words
even at 100 TB) — exactly how production trainers split the work. So
the distributed part is the corpus aggregation and the APPLY; the
merge loop itself collects the vocabulary once (``max_vocab``-guarded)
and trains driver-local with an incremental pair index, because 30k
merges as 30k sequential Spark jobs is pure scheduler overhead on
data that fits in driver memory.

Representation trick that makes the whole thing relational: a word's
current symbol sequence is stored as a single string with every symbol
wrapped in a ``\\x1f`` sentinel — ``"low"`` → ``␟l␟␟o␟␟w␟``. Applying
merge (a,b) is then plain ``replace(syms, '␟a␟␟b␟', '␟ab␟')``:
built-in ``replace`` scans left-to-right and never rematches inside a
replacement in BOTH Spark and DuckDB (probed: ``␟a␟×4`` with merge
(a,a) → ``␟aa␟␟aa␟``), which is precisely BPE's greedy left-to-right
pairing. No regex in the loop, no lambda fold, no Python in the hot
path — and because every step is engine-portable SQL, an ``n_merges``-
unrolled chain of CTEs replays the ENTIRE training in DuckDB, so the
learned merge table is hash-verifiable end-to-end.

Tie-breaking is pinned (pair count desc, then left asc, right asc —
binary collation in both engines) so training is deterministic on any
cluster and any partitioning: pair counts are integer sums, not
floats, and the top-1 selection is a total order.

Scale notes: per-iteration cost is bounded by the words that contain
the merged pair (incremental counts + lazy-invalidated heap), so
thousands of merges train in seconds after the one corpus pass.
``bpe_apply`` replays the merge list as chained ``replace`` columns —
plan depth = n_merges, the right shape for the tens-of-merges regime
and for oracle replay; ``bpe_apply_trie`` is the production apply for
30k-merge tables: the merge dict broadcasts into an Arrow
``mapInPandas`` (plan depth O(1)), with sequential-sweep semantics
proven equal to the chained-replace path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import _norm_text, _ws_tokens

#: Symbol sentinel. Stripped from input words first (a control char
#: has no tokenization value), so it can never be confused for text.
SEP = "\x1f"

_WRAP_SQL = (
    # every codepoint wrapped: "low" -> ␟l␟␟o␟␟w␟  ('.' never matches
    # a newline, but words are whitespace tokens so none exists)
    "regexp_replace(replace({w}, '{s}', ''), '(.)', '{s}{repl}{s}')"
)


def _wrap_spark(word: str) -> str:
    return _WRAP_SQL.format(w=word, s=SEP, repl="$1")


def _wrap_duck(word: str) -> str:
    # DuckDB (RE2) backrefs are \1 and need the 'g' flag for all-occurrence
    return (
        _WRAP_SQL.format(w=word, s=SEP, repl="\\1").rstrip(")")
        + ", 'g')"
    )


def bpe_word_counts(
    df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(word, freq, syms): the corpus compressed to its vocabulary —
    the ONE corpus-sized aggregation in BPE training. ``syms`` starts
    as the sentinel-wrapped character sequence."""
    words = df.select(
        F.explode(_ws_tokens(_norm_text(F.col(text_col)))).alias("word")
    )
    wc = words.groupBy("word").agg(F.count("*").cast("bigint").alias("freq"))
    return wc.select(
        "word",
        "freq",
        F.expr(_wrap_spark("word")).alias("syms"),
    )


#: Driver-side vocabulary cap for :func:`bpe_train`. Zipf puts even a
#: 100 TB web corpus's distinct-word table in the 10⁷–10⁸ range (a few
#: GiB of driver heap) — far under this bound; hitting it means the
#: "words" are not words (binary blobs, unsegmented text) and the
#: caller should pre-filter (``freq >= k`` on the word_counts input)
#: rather than silently training on a truncated vocabulary.
MAX_TRAIN_VOCAB = 50_000_000


def bpe_train(
    word_counts: DataFrame,
    n_merges: int,
    max_vocab: int = MAX_TRAIN_VOCAB,
) -> DataFrame:
    """(rank, lhs, rhs, cnt): the learned merge table, rank 1 =
    first merge. Stops early if no adjacent pair remains. The input is
    the :func:`bpe_word_counts` output (or anything with freq+syms).

    Scale structure (how production trainers split the work): the
    corpus-sized part is the ONE distributed (word, freq) aggregation
    the caller did in :func:`bpe_word_counts`; everything after runs
    on the *vocabulary*, which Zipf keeps driver-sized at any corpus
    scale. So the vocabulary is collected ONCE (guarded by
    ``max_vocab``) and the merge loop runs driver-local with an
    incremental pair index — each round touches only the words that
    contain the merged pair, and top-1 selection is a lazy-invalidated
    heap, so 30k merges are 30k dict updates, not 30k Spark jobs. (An
    earlier formulation ran one full Spark job per merge — correct,
    but a production tokenizer's 30k–50k merges would serialize days
    of scheduler round-trips on data that fits in driver memory.)

    Semantics are unchanged and oracle-pinned: pair counts are
    freq-weighted adjacent symbol pairs; top-1 by (cnt desc, lhs asc,
    rhs asc) — Python's code-point string order ≡ the engines' binary
    collation because UTF-8 byte order preserves code-point order;
    merge application is greedy left-to-right exactly like the
    built-in ``replace`` both engines use in the oracle replay."""
    if n_merges < 1:
        raise ValueError(f"need n_merges >= 1, got {n_merges}")
    import heapq
    from collections import Counter

    spark = word_counts.sparkSession
    rows = (
        word_counts.select("freq", "syms")
        .limit(max_vocab + 1)
        .collect()
    )
    if len(rows) > max_vocab:
        raise ValueError(
            f"vocabulary exceeds max_vocab={max_vocab}; pre-filter"
            " rare words (word_counts.filter('freq >= k')) before"
            " training — a truncated vocabulary would silently change"
            " the learned merges"
        )
    freqs: list[int] = []
    seqs: list[list[str]] = []
    for r in rows:
        syms = r["syms"]
        if len(syms) < 2:
            continue
        freqs.append(int(r["freq"]))
        # ␟a␟␟b␟ → [a, b] (symbols can never contain the sentinel)
        seqs.append(syms[1:-1].split(SEP + SEP))

    counts: Counter = Counter()
    index: dict[tuple[str, str], set[int]] = {}
    for wi, (f, seq) in enumerate(zip(freqs, seqs)):
        for p in zip(seq, seq[1:]):
            counts[p] += f
            index.setdefault(p, set()).add(wi)
    heap = [(-c, l, r) for (l, r), c in counts.items()]
    heapq.heapify(heap)

    merges: list[tuple[int, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        # lazy invalidation: an entry is live only if it still carries
        # the pair's CURRENT positive count
        while heap and counts.get((heap[0][1], heap[0][2]), 0) != -heap[0][0]:
            heapq.heappop(heap)
        if not heap:
            break
        negc, left, right = heapq.heappop(heap)
        cnt = -negc
        merges.append((rank, left, right, cnt))
        pair, new_sym = (left, right), left + right
        changed: set[tuple[str, str]] = set()
        for wi in list(index.get(pair, ())):
            seq, f = seqs[wi], freqs[wi]
            out: list[str] = []
            i, n = 0, len(seq)
            hit = False
            while i < n:
                if i < n - 1 and seq[i] == left and seq[i + 1] == right:
                    out.append(new_sym)
                    i += 2
                    hit = True
                else:
                    out.append(seq[i])
                    i += 1
            if not hit:             # stale index entry
                index[pair].discard(wi)
                continue
            for p in zip(seq, seq[1:]):
                counts[p] -= f
                changed.add(p)
            for p in zip(out, out[1:]):
                counts[p] += f
                changed.add(p)
                index.setdefault(p, set()).add(wi)
            seqs[wi] = out
        index.pop(pair, None)
        for p in changed:
            c = counts.get(p, 0)
            if c <= 0:
                counts.pop(p, None)
            else:
                heapq.heappush(heap, (-c, p[0], p[1]))
    return spark.createDataFrame(
        merges, "rank int, lhs string, rhs string, cnt bigint"
    )


def _sq(s: str) -> str:
    """Escape a string for a single-quoted SQL literal."""
    return s.replace("\\", "\\\\").replace("'", "\\'")


def bpe_apply(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """All input columns + ``out_col`` (array<string>): the document
    tokenized by the learned merges — per word, chars are wrapped then
    every merge replays in rank order as chained built-in ``replace``
    (greedy left-to-right, identical to the training semantics).
    Map-side only, whole-stage codegen; two transforms so the merge
    chain evaluates ONCE per word (the lambda-inlining lesson: the
    split stage references its input twice, so the expensive chain
    must live in its own materialized pass)."""
    word_expr = (
        f"regexp_replace(replace(x, '{SEP}', ''), '(.)', '{SEP}$1{SEP}')"
    )
    for left, right in merges:
        pat = f"{SEP}{_sq(left)}{SEP}{SEP}{_sq(right)}{SEP}"
        rep = f"{SEP}{_sq(left)}{_sq(right)}{SEP}"
        word_expr = f"replace({word_expr}, '{pat}', '{rep}')"
    toked = df.withColumns(
        {
            "_w": _ws_tokens(_norm_text(F.col(text_col))),
        }
    ).withColumn("_m", F.expr(f"transform(_w, x -> {word_expr})"))
    return toked.withColumn(
        out_col,
        F.expr(
            "flatten(transform(_m, s ->"
            f" split(substring(s, 2, length(s) - 2), '{SEP}{SEP}')))"
        ),
    ).drop("_w", "_m")


def bpe_train_sql(
    table: str = "documents",
    n_merges: int = 12,
    text_col: str = "text",
) -> str:
    """DuckDB oracle: the ENTIRE training unrolled — n_merges chained
    CTE stages, each = pair count → deterministic top-1 → replace.
    Guards: if a stage has no pairs, its top CTE is empty and the
    coalesced replace pattern can never match (the stage no-ops and
    contributes no merge row). Every CTE is AS MATERIALIZED: DuckDB
    inlines plain CTEs per reference and each stage references its
    predecessor ~4 times, so un-materialized the words0 scan would
    expand ~4^n_merges-fold (the llm_curation_funnel oracle lesson)."""
    s = SEP
    norm = f"regexp_replace(lower(trim({text_col})), '\\s+', ' ', 'g')"
    parts = [
        f"words0 AS MATERIALIZED (SELECT word, CAST(count(*) AS BIGINT) AS freq,"
        f" {_wrap_duck('word')} AS syms"
        f" FROM (SELECT unnest(string_split({norm}, ' ')) AS word"
        f"   FROM {table} WHERE trim({text_col}) <> '')"
        " GROUP BY word)"
    ]
    for i in range(1, n_merges + 1):
        p, w = f"pairs{i}", f"words{i}"
        prev = f"words{i - 1}"
        # adjacent pairs via list comprehension (1-based; range
        # excludes the end, so j runs 1..len-1 → pairs (j, j+1));
        # the pair travels as one ␟␟-joined string and splits back in
        # the top-1 CTE (symbols can never contain the sentinel)
        parts.append(
            f" {p} AS MATERIALIZED (SELECT pair, CAST(sum(freq) AS BIGINT) AS cnt"
            f"  FROM (SELECT freq, unnest("
            f"   [a[j] || '{s}{s}' || a[j+1] for j in range(1, len(a))])"
            f"   AS pair FROM (SELECT freq,"
            f"    string_split(substring(syms, 2, length(syms) - 2),"
            f"    '{s}{s}') AS a FROM {prev}))"
            f"  GROUP BY pair)"
        )
        parts.append(
            f" top{i} AS MATERIALIZED (SELECT string_split(pair, '{s}{s}')[1] AS lhs,"
            f"  string_split(pair, '{s}{s}')[2] AS rhs, cnt FROM {p}"
            f"  ORDER BY cnt DESC, lhs, rhs LIMIT 1)"
        )
        parts.append(
            f" {w} AS MATERIALIZED (SELECT freq, replace(syms,"
            f"  coalesce((SELECT '{s}' || lhs || '{s}{s}' || rhs || '{s}'"
            f"   FROM top{i}), '{s}{s}'),"
            f"  coalesce((SELECT '{s}' || lhs || rhs || '{s}'"
            f"   FROM top{i}), '{s}{s}'))"
            f"  AS syms FROM {prev})"
        )
    unions = " UNION ALL ".join(
        f"SELECT {i} AS rank, lhs, rhs, cnt FROM top{i}"
        for i in range(1, n_merges + 1)
    )
    return (
        "WITH "
        + ", ".join(parts)
        + f" SELECT * FROM ({unions}) ORDER BY rank"
    )


def bpe_tokenize_corpus(
    df: DataFrame,
    n_merges: int = 32,
    text_col: str = "text",
) -> tuple[DataFrame, DataFrame]:
    """(tokenized_docs, merge_table): train BPE on the corpus and
    tokenize it in one call. The returned docs carry

    * ``bpe_tokens`` — array<string> subword tokens,
    * ``bpe_text``  — the tokens space-joined, and
    * ``n_bpe_tokens`` — the count,

    and because subword tokens never contain whitespace, every
    whitespace-token operator downstream (``pack_sequences``,
    ``mixture_sample``, token-budget accounting) runs on
    ``text_col="bpe_text"`` unchanged — its "words" ARE the learned
    subwords. That is the composition contract: tokenizer-aware
    training-set assembly without a second token-counting code path.
    """
    merges_df = bpe_train(bpe_word_counts(df, text_col=text_col), n_merges)
    merges = [
        (r["lhs"], r["rhs"]) for r in merges_df.orderBy("rank").collect()
    ]
    toked = bpe_apply(df, merges, text_col=text_col)
    toked = toked.withColumns(
        {
            "bpe_text": F.array_join("bpe_tokens", " "),
            "n_bpe_tokens": F.size("bpe_tokens").cast("bigint"),
        }
    )
    return toked, merges_df


def bpe_tokens_long(
    df: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, pos, token): the applied tokenization in long format —
    the hash-comparable shape (array columns stringify differently
    across engine→pandas bridges; exploded rows compare exactly)."""
    return bpe_apply(df, merges, text_col=text_col).select(
        F.col(id_col),
        F.posexplode("bpe_tokens").alias("pos", "token"),
    )


def bpe_apply_sql(
    table: str,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB oracle twin of :func:`bpe_tokens_long` — the identical
    wrap → chained-replace → split pipeline per word, flattened with
    positions. The chain is evaluated twice per word (substring needs
    its length; SQL lambdas cannot let-bind) — an oracle-side cost
    only, bounded by n_merges."""
    s = SEP
    norm = f"regexp_replace(lower(trim({text_col})), '\\s+', ' ', 'g')"
    chain = (
        f"regexp_replace(replace(w, '{s}', ''), '(.)', '{s}\\1{s}', 'g')"
    )
    for left, right in merges:
        pat = f"{s}{left}{s}{s}{right}{s}".replace("'", "''")
        rep = f"{s}{left}{right}{s}".replace("'", "''")
        chain = f"replace({chain}, '{pat}', '{rep}')"
    per_word = (
        f"string_split(substring({chain}, 2, length({chain}) - 2),"
        f" '{s}{s}')"
    )
    return (
        f"WITH t AS (SELECT {id_col},"
        f"  flatten(list_transform(string_split({norm}, ' '),"
        f"   w -> {per_word})) AS toks"
        f" FROM {table} WHERE trim({text_col}) <> '')"
        f" SELECT {id_col}, generate_subscripts(toks, 1) - 1 AS pos,"
        f" unnest(toks) AS token FROM t"
    )


# ---------------------------------------------------------------------------
# Production-scale apply: merge table as a broadcast dict, Arrow batches
# ---------------------------------------------------------------------------


def _norm_py(text: str | None) -> str:
    """Python twin of text._norm_text + _ws_tokens normalization.

    Spark's ``trim`` strips only ASCII space (0x20) and Java's default
    ``\\s`` is the ASCII class ``[ \\t\\n\\x0B\\f\\r]`` — Python's
    ``str.strip()`` strips UNICODE whitespace (NBSP, ideographic
    space, …), which would tokenize ``'foo\\u00a0'`` as ``'foo'``
    here but ``'foo\\u00a0'`` in the chained path. Hence: collapse
    with ``re.ASCII`` (whose ``\\s`` is the same five-char class;
    ``\\v`` == ``\\x0B``) and strip ASCII space only."""
    import re

    if text is None:
        return ""
    return re.sub(r"\s+", " ", text.lower(), flags=re.ASCII).strip(" ")


def _apply_word_seq(
    syms: list[str],
    rank_of: dict[tuple[str, str], int],
    merge_at: list[tuple[str, str]],
) -> list[str]:
    """Apply the merge list to one word with EXACT sequential-sweep
    semantics (merge 0 greedily left-to-right over the whole word,
    then merge 1, …) — the :func:`bpe_apply` spec — but touching only
    the merges whose pair actually becomes adjacent: an ascending-
    rank heap seeded with the word's initial pairs; applying rank r
    may create adjacencies for ranks > r (pushed), while a pair of
    rank < r re-appearing is correctly IGNORED (its sweep pass is
    over), which is what makes this equivalent to the sequential
    definition for arbitrary merge lists, not just trained ones."""
    import heapq

    heap: list[int] = []
    seen: set[int] = set()

    def push_pairs(s: list[str], lo: int) -> None:
        for p in zip(s, s[1:]):
            r = rank_of.get(p)
            if r is not None and r >= lo and r not in seen:
                seen.add(r)
                heapq.heappush(heap, r)

    push_pairs(syms, 0)
    while heap:
        r = heapq.heappop(heap)
        left, right = merge_at[r]
        out: list[str] = []
        i, n = 0, len(syms)
        hit = False
        while i < n:
            if i < n - 1 and syms[i] == left and syms[i + 1] == right:
                out.append(left + right)
                i += 2
                hit = True
            else:
                out.append(syms[i])
                i += 1
        if hit:
            syms = out
            push_pairs(syms, r)
    return syms


def bpe_apply_trie(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """:func:`bpe_apply` for PRODUCTION merge counts: identical
    semantics (equality property-tested in test_bpe.py), but the
    merge table travels as one broadcast dict into an Arrow
    ``mapInPandas`` instead of compiling one ``replace`` expression
    per merge into the plan — plan depth O(1) versus O(n_merges), so
    a 30k-merge tokenizer applies without a 30k-deep expression tree
    (the cliff the chained-replace docstring documents). Per word the
    cost is bounded by the merges that actually fire (ascending-rank
    heap), not the table size."""
    from pyspark.sql.types import ArrayType, StringType, StructField, StructType

    rank_of = {(l, r): i for i, (l, r) in enumerate(merges)}
    merge_at = list(merges)
    schema = StructType(
        list(df.schema.fields) + [StructField(out_col, ArrayType(StringType()))]
    )

    def gen(batches):
        for pdf in batches:
            col = []
            for text in pdf[text_col]:
                norm = _norm_py(text)
                toks: list[str] = []
                for w in norm.split(" ") if norm else []:
                    w = w.replace(SEP, "")
                    if not w:
                        # chained-replace parity: an all-sentinel word
                        # yields one empty token there too
                        toks.append("")
                        continue
                    toks.extend(
                        _apply_word_seq(list(w), rank_of, merge_at)
                    )
                col.append(toks)
            pdf = pdf.copy()
            pdf[out_col] = col
            yield pdf

    return df.mapInPandas(gen, schema)
