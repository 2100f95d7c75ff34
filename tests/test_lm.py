"""Unigram LM quality scoring — DuckDB twin + planted hand-computation."""

from __future__ import annotations

import math

import pandas as pd

from conftest import duck_docs as _duck

SF = "/root/testdata/sf0.001"


LM_COLS = ["doc_id", "n_tokens", "n_oov", "nll_bits"]


def _lm_rows(df, **kw):
    from kgtm.lm import unigram_nll

    out = unigram_nll(df, **kw)
    assert out.columns == LM_COLS
    return sorted(tuple(r[c] for c in LM_COLS) for r in out.collect())


def _lm_oracle_rows(con, **kw):
    from kgtm import oracles

    return sorted(
        (int(d), int(nt), int(no), float(nb))
        for d, nt, no, nb in con.execute(oracles.q_unigram_nll(**kw)).fetchall()
    )


def test_unigram_nll_matches_duckdb_twin_corpus(spark, documents):
    got = _lm_rows(documents)
    want = _lm_oracle_rows(_duck(parquet_docs=SF))
    assert got == want
    assert len(got) == documents.count()
    # self-scoring uncapped: no OOV anywhere
    assert all(no == 0 for _, _, no, _ in got)


def test_unigram_nll_capped_matches_twin_and_floors_oov(spark, documents):
    got = _lm_rows(documents, top_v=20)
    want = _lm_oracle_rows(_duck(parquet_docs=SF), top_v=20)
    assert got == want
    # a 20-word vocab over this corpus must leave some tokens OOV
    assert any(no > 0 for _, _, no, _ in got)


def test_unigram_nll_planted_hand_computed(spark):
    rows = [(1, "a a b"), (2, "a c"), (3, "")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = _lm_rows(df)
    # counts: a=3 b=1 c=1, N=5
    n = 5.0
    exp1 = round(-(2 * math.log2(3 / n) + math.log2(1 / n)) / 3, 6)
    exp2 = round(-(math.log2(3 / n) + math.log2(1 / n)) / 2, 6)
    assert got == [(1, 3, 0, exp1), (2, 2, 0, exp2)]  # doc 3: zero tokens, omitted
    planted = pd.DataFrame(rows, columns=["doc_id", "text"])
    assert got == _lm_oracle_rows(_duck(planted=planted))


def test_unigram_nll_cross_corpus_oov(spark):
    model = spark.createDataFrame([(1, "a a b")], "doc_id long, text string")
    score = spark.createDataFrame([(9, "a z")], "doc_id long, text string")
    got = _lm_rows(score, model_df=model)
    # model: a=2 b=1, N=3; z is OOV at floor 1/3
    exp = round(-(math.log2(2 / 3) + math.log2(1 / 3)) / 2, 6)
    assert got == [(9, 2, 1, exp)]


def test_unigram_nll_cap_at_full_vocab_is_identity(spark, documents):
    # top_v >= |vocab| must equal the uncapped run exactly
    from kgtm.lm import unigram_counts

    v = unigram_counts(documents).count()
    assert _lm_rows(documents, top_v=v) == _lm_rows(documents)


def test_unigram_nll_capped_plan_broadcasts_vocab(spark, documents):
    from kgtm.lm import unigram_nll

    plan = (
        unigram_nll(documents, top_v=100)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # top-k is distributed, never a one-partition window
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan


def test_unigram_nll_whitespace_docs_no_phantom_tokens(spark):
    """Leading/trailing tab-or-newline text must not emit '' phantom tokens
    (they would hand whitespace-padded junk a near-free high-frequency
    token); whitespace-only docs drop out entirely. Twin agrees."""
    rows = [(1, "\thello world"), (2, "\t"), (3, "hello\n")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = _lm_rows(df)
    # counts: hello=2 world=1, N=3; doc 2 omitted (zero real tokens)
    exp1 = round(-(math.log2(2 / 3) + math.log2(1 / 3)) / 2, 6)
    exp3 = round(-math.log2(2 / 3), 6)
    assert got == [(1, 2, 0, exp1), (3, 1, 0, exp3)]
    planted = pd.DataFrame(rows, columns=["doc_id", "text"])
    assert got == _lm_oracle_rows(_duck(planted=planted))
