"""BPE training/apply: oracle parity, Python-reference equality,
greedy-merge semantics, and training↔apply consistency."""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from minisql_engine_spark.operators.bpe import (
    SEP,
    bpe_apply,
    bpe_train,
    bpe_train_sql,
    bpe_word_counts,
)
from minisql_engine_spark.sources import load_table

from tests.conftest import assert_matches_oracle


def _ref_train(word_freqs: dict[str, int], n_merges: int):
    """Reference BPE trainer: dict/Counter implementation of the same
    spec (count desc, then (lhs, rhs) lexicographic; greedy
    left-to-right merge application)."""
    words: dict[str, tuple[tuple[str, ...], int]] = {
        w: (tuple(w.replace(SEP, "")), f) for w, f in word_freqs.items()
    }
    merges = []
    for rank in range(1, n_merges + 1):
        counts: Counter = Counter()
        for syms, f in words.values():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] += f
        if not counts:
            break
        (lhs, rhs), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0])
        )
        merges.append((rank, lhs, rhs, cnt))
        new = {}
        for w, (syms, f) in words.items():
            out: list[str] = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == lhs and syms[i + 1] == rhs:
                    out.append(lhs + rhs)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new[w] = (tuple(out), f)
        words = new
    return merges, words


def _word_freqs(duck, sf_dir) -> dict[str, int]:
    rows = duck.sql(
        "SELECT word, count(*) AS f FROM (SELECT unnest(string_split("
        "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS word"
        " FROM documents WHERE trim(text) <> '') GROUP BY word"
    ).fetchall()
    return {w: f for w, f in rows}


def test_bpe_train_oracle(spark, duck, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    out = bpe_train(bpe_word_counts(docs), 10)
    oracle = duck.sql(bpe_train_sql("documents", 10)).df()
    assert_matches_oracle(out, oracle, "bpe_train")


def test_bpe_train_matches_python_reference(spark, duck, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    got = [
        (r["rank"], r["lhs"], r["rhs"], r["cnt"])
        for r in bpe_train(bpe_word_counts(docs), 8).collect()
    ]
    expected, _ = _ref_train(_word_freqs(duck, sf_dir), 8)
    assert got == expected


def test_greedy_left_to_right_overlap(spark):
    """'aaaa' with merge (a,a) → [aa, aa]; 'aaa' → [aa, a] — BPE's
    left-to-right non-overlapping pairing, byte for byte."""
    docs = spark.createDataFrame(
        [(1, "aaaa aaa")], "doc_id bigint, text string"
    )
    out = bpe_apply(docs, [("a", "a")]).select("bpe_tokens").first()
    assert out["bpe_tokens"] == ["aa", "aa", "aa", "a"]


def test_training_state_equals_apply(spark, sf_dir):
    """Tokenizing the training corpus with the learned merge list
    reproduces the trainer's final symbol state — the consistency
    property that makes the merge table a faithful tokenizer."""
    docs = load_table(spark, sf_dir, "documents").limit(100)
    wc = bpe_word_counts(docs)
    merges_df = bpe_train(wc, 6)
    merges = [(r["lhs"], r["rhs"]) for r in merges_df.collect()]
    # apply to each distinct WORD (as its own doc) and compare with a
    # reference replay over the same words
    words = [r["word"] for r in wc.select("word").collect()]
    applied = bpe_apply(
        spark.createDataFrame(
            [(i, w) for i, w in enumerate(words)], "i bigint, text string"
        ),
        merges,
    ).select("i", "bpe_tokens")
    got = {
        words[r["i"]]: tuple(r["bpe_tokens"]) for r in applied.collect()
    }
    # what we assert is apply ≡ the reference fold of the SAME merge
    # list over the same word set
    state = {w: tuple(w) for w in words}
    for lhs, rhs in merges:
        for w, syms in state.items():
            out, i = [], 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == lhs
                    and syms[i + 1] == rhs
                ):
                    out.append(lhs + rhs)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            state[w] = tuple(out)
    assert got == state


def test_sentinel_stripped(spark):
    docs = spark.createDataFrame(
        [(1, f"ab{SEP}ab abab")], "doc_id bigint, text string"
    )
    out = bpe_apply(docs, [("a", "b"), ("ab", "ab")]).first()
    assert out["bpe_tokens"] == ["abab", "abab"]


def test_early_stop(spark):
    docs = spark.createDataFrame(
        [(1, "a b c")], "doc_id bigint, text string"
    )
    merges = bpe_train(bpe_word_counts(docs), 5)
    assert merges.count() == 0  # all words are single symbols


def test_n_merges_validation(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    with pytest.raises(ValueError):
        bpe_train(bpe_word_counts(docs), 0)


def test_tokenize_corpus_composes_with_packing(spark, sf_dir):
    """bpe_text feeds pack_sequences unchanged: the packed token
    budget is exactly the BPE token count, and every doc's packed
    pieces cover [0, n_bpe_tokens)."""
    from minisql_engine_spark.operators.bpe import bpe_tokenize_corpus
    from minisql_engine_spark.operators.packing import pack_sequences

    docs = load_table(spark, sf_dir, "documents").limit(120)
    toked, merges_df = bpe_tokenize_corpus(docs, n_merges=8)
    assert merges_df.count() == 8
    packed = pack_sequences(toked, 128, text_col="bpe_text")
    counts = {
        r["doc_id"]: r["n"]
        for r in toked.select(
            "doc_id", F.col("n_bpe_tokens").alias("n")
        ).collect()
    }
    covered = (
        packed.groupBy("doc_id")
        .agg(
            F.sum(F.col("tok_end") - F.col("tok_begin")).alias("tot"),
            F.min("tok_begin").alias("lo"),
            F.max("tok_end").alias("hi"),
        )
        .collect()
    )
    assert covered, "nothing packed"
    for r in covered:
        assert r["lo"] == 0
        assert r["hi"] == counts[r["doc_id"]]
        assert r["tot"] == counts[r["doc_id"]]
    # subword token counts differ from whitespace counts (merges fire)
    ws = docs.select(F.size(F.split(F.trim("text"), r"\s+")).alias("w")).agg(
        F.sum("w")
    ).collect()[0][0]
    bpe_total = sum(counts.values())
    assert bpe_total > ws  # chars merged only 8 times: still > word count


def test_bpe_apply_oracle(spark, duck, sf_dir):
    """Application is oracle-checked too: the learned merges replay
    over the corpus identically in both engines (long format — array
    columns never hash-compare across the pandas bridges)."""
    from minisql_engine_spark.operators.bpe import (
        bpe_apply_sql,
        bpe_tokens_long,
    )
    from tests.conftest import assert_matches_oracle

    docs = load_table(spark, sf_dir, "documents")
    merges_df = bpe_train(bpe_word_counts(docs), 8)
    merges = [(r["lhs"], r["rhs"]) for r in merges_df.orderBy("rank").collect()]
    out = bpe_tokens_long(docs, merges)
    oracle = duck.sql(bpe_apply_sql("documents", merges)).df()
    assert_matches_oracle(out, oracle, "bpe_apply")


def test_train_thousands_of_merges_is_fast(spark, sf_dir):
    """≥2,000 merges in seconds — the property the old formulation
    (one full Spark job per merge round) could not deliver: training
    cost after the single corpus aggregation is driver-local and
    bounded by the words each merge touches, so a production-scale
    merge count is dict updates, not scheduler round-trips."""
    import hashlib
    import time

    # deterministic corpus rich enough to sustain 2000 merges: 4000
    # distinct 32-hex-char "words" (the sf documents vocabulary
    # exhausts after ~90 merges)
    words = [
        hashlib.md5(f"w{i}".encode()).hexdigest() for i in range(4000)
    ]
    docs = spark.createDataFrame(
        [(i, " ".join(words[i * 8 : (i + 1) * 8])) for i in range(500)],
        "doc_id bigint, text string",
    )
    wc = bpe_word_counts(docs)
    t0 = time.monotonic()
    merges = bpe_train(wc, 2000)
    got = merges.collect()
    took = time.monotonic() - t0
    assert len(got) == 2000, f"corpus exhausted at {len(got)} merges"
    # ranks are dense and counts are positive and non-increasingly
    # plausible (each merge's count is its true pair frequency)
    assert [r["rank"] for r in got] == list(range(1, 2001))
    assert all(r["cnt"] >= 1 for r in got)
    assert took < 60, f"2000 merges took {took:.1f}s — not driver-local?"


def test_train_max_vocab_guard(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    with pytest.raises(ValueError, match="max_vocab"):
        bpe_train(bpe_word_counts(docs), 4, max_vocab=10)


def test_apply_trie_equals_chained_replace(spark, sf_dir):
    """bpe_apply_trie must produce the IDENTICAL tokenization as the
    chained-replace bpe_apply on a trained merge table — per doc,
    token for token."""
    from minisql_engine_spark.operators.bpe import bpe_apply_trie

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    merges_df = bpe_train(bpe_word_counts(docs), 48)
    merges = [
        (r["lhs"], r["rhs"]) for r in merges_df.orderBy("rank").collect()
    ]
    a = {
        r["doc_id"]: r["bpe_tokens"]
        for r in bpe_apply(docs, merges).select("doc_id", "bpe_tokens").collect()
    }
    b = {
        r["doc_id"]: r["bpe_tokens"]
        for r in bpe_apply_trie(docs, merges)
        .select("doc_id", "bpe_tokens")
        .collect()
    }
    assert a == b


def test_apply_trie_edge_semantics(spark):
    """Hand-built merge lists exercise the sequential-sweep edge
    cases: overlap greediness, sentinel stripping, and a later merge
    re-creating an EARLIER pair (which the sequential spec ignores —
    its sweep pass is over)."""
    from minisql_engine_spark.operators.bpe import bpe_apply_trie

    docs = spark.createDataFrame(
        [(1, f"aaaa aaa ab{SEP}ab abab xyx")],
        "doc_id bigint, text string",
    )
    for merges in (
        [("a", "a")],
        [("a", "b"), ("ab", "ab")],
        # merge 2 creates 'xy'+'x' adjacency only AFTER merge 1; and
        # ("x","y") firing again post-merge-2 would need a new sweep
        [("x", "y"), ("xy", "x")],
    ):
        a = bpe_apply(docs, merges).select("bpe_tokens").first()[0]
        b = bpe_apply_trie(docs, merges).select("bpe_tokens").first()[0]
        assert a == b, (merges, a, b)


def test_apply_trie_unicode_whitespace_parity(spark):
    """Non-ASCII whitespace (NBSP, ideographic space) is NOT
    whitespace to Spark's trim / Java's \\s — the trie path's Python
    normalizer must agree byte-for-byte (Python str.strip() would
    silently strip it; regression guard for that divergence)."""
    from minisql_engine_spark.operators.bpe import bpe_apply_trie

    docs = spark.createDataFrame(
        [
            (1, "foo "),            # trailing NBSP glued to word
            (2, " bar"),            # leading NBSP glued to word
            (3, "a　b c"),           # ideographic space inside
            (4, " \tmix ed\t "),    # ASCII ws trims, NBSP stays
            (5, " "),               # NBSP-only doc: one token
        ],
        "doc_id bigint, text string",
    )
    merges = [("f", "o"), ("fo", "o")]
    a = {
        r["doc_id"]: r["bpe_tokens"]
        for r in bpe_apply(docs, merges).collect()
    }
    b = {
        r["doc_id"]: r["bpe_tokens"]
        for r in bpe_apply_trie(docs, merges).collect()
    }
    assert a == b, (a, b)
    # and the divergence the guard exists for: NBSP survives as a
    # symbol of the word (str.strip() would have deleted it)
    assert a[1] == ["foo", " "]


def test_apply_trie_at_production_merge_count(spark):
    """2,000 merges apply through ONE mapInPandas — the plan the
    chained-replace path cannot build (2,000-deep expression tree).
    Token counts stay positive and words with no applicable merge
    pass through as characters."""
    import hashlib
    import time

    from minisql_engine_spark.operators.bpe import bpe_apply_trie

    words = [
        hashlib.md5(f"w{i}".encode()).hexdigest() for i in range(4000)
    ]
    docs = spark.createDataFrame(
        [(i, " ".join(words[i * 8 : (i + 1) * 8])) for i in range(500)],
        "doc_id bigint, text string",
    )
    merges_df = bpe_train(bpe_word_counts(docs), 2000)
    merges = [
        (r["lhs"], r["rhs"]) for r in merges_df.orderBy("rank").collect()
    ]
    assert len(merges) == 2000
    t0 = time.monotonic()
    out = bpe_apply_trie(docs, merges)
    n_docs = out.filter(F.size("bpe_tokens") > 0).count()
    took = time.monotonic() - t0
    assert n_docs == 500
    assert took < 120, f"trie apply took {took:.1f}s"
    # merges actually fired: total tokens < total chars
    total = out.agg(F.sum(F.size("bpe_tokens"))).collect()[0][0]
    assert total < 500 * 8 * 32
