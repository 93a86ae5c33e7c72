"""Tokenizer fertility audit — oracle parity and the arithmetic
contracts (fertility ≥ 1 under character-merging BPE only when merges
fire less than words split; ratios are the exact integer floors)."""

from __future__ import annotations


def _entry():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "entry_for_fertility", "/root/repo/__spark_entry__.py"
    )
    em = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(em)
    return em


def test_fertility_oracle_corpus(spark, duck, sf_dir):
    from tests.conftest import assert_matches_oracle

    em = _entry()
    out = em.queries()["tokenizer_fertility_by_lang"](spark, sf_dir)
    assert_matches_oracle(
        out,
        duck.execute(
            em.oracle_sql()["tokenizer_fertility_by_lang"]
        ).df(),
        "fertility",
    )


def test_fertility_contracts(spark, sf_dir):
    em = _entry()
    out = (
        em.queries()["tokenizer_fertility_by_lang"](spark, sf_dir)
        .toPandas()
    )
    # every language present, counts positive
    assert len(out) >= 2 and (out.n_docs > 0).all()
    # a 20-merge character BPE splits every word into >= 1 token, so
    # fertility (tokens per word) >= 1 in fx6 units
    assert (out.fertility_fx6 >= 10**6).all()
    # chars per token >= 1 likewise (a token is at least one char)
    assert (out.chars_per_token_fx6 >= 10**6).all()
    # exact floor identities
    assert (
        out.fertility_fx6
        == out.n_bpe_tokens * 10**6 // out.n_words
    ).all()
    assert (
        out.chars_per_token_fx6
        == out.n_chars * 10**6 // out.n_bpe_tokens
    ).all()
