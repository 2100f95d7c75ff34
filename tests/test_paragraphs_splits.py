"""Paragraph-level exact dedup and train/holdout split coverage — each
value-checked against a DuckDB twin (pytest-gated; the driver gate is capped
at 50 queries) plus hand-planted invariants.
"""

from __future__ import annotations

import pandas as pd

from conftest import duck_docs as _duck

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# paragraph_dedup
# ---------------------------------------------------------------------------

PD_COLS = ["doc_id", "text", "n_paras", "n_kept"]


def _pd_rows(df, **kw):
    from kgtm.paragraphs import paragraph_dedup

    out = paragraph_dedup(df, **kw)
    assert out.columns == PD_COLS
    return sorted(tuple(r[c] for c in PD_COLS) for r in out.collect())


def _pd_oracle_rows(con, **kw):
    from kgtm import oracles

    return sorted(
        (int(d), t, int(np), int(nk))
        for d, t, np, nk in con.execute(oracles.q_paragraph_dedup(**kw)).fetchall()
    )


def test_paragraph_dedup_matches_duckdb_twin_corpus(spark, documents):
    # synthetic docs have no newlines: every doc is one paragraph, so the
    # operator degenerates to doc-level exact dedup — still a full value
    # check of the split/rank/reassemble machinery on 500 real rows.
    got = _pd_rows(documents)
    want = _pd_oracle_rows(_duck(parquet_docs=SF))
    assert got == want
    assert len(got) > 0


PD_ROWS = [
    # boilerplate ("accept all cookies to continue browsing") in docs 1,2,4;
    # doc 2 also repeats it internally; doc 5 differs only by case.
    (1, "accept all cookies to continue browsing\nunique first doc body text here"),
    (2, "accept all cookies to continue browsing\nsecond doc body line that is unique\naccept all cookies to continue browsing"),
    (3, "##\na short heading kept twice\n##\na totally unique third document paragraph"),
    (4, "doc four opening statement paragraph\naccept all cookies to continue browsing\n"),
    (5, "Accept All Cookies To Continue Browsing"),
    (6, ""),
]


def test_paragraph_dedup_planted_first_occurrence_wins(spark):
    df = spark.createDataFrame(PD_ROWS, "doc_id long, text string")
    got = {r[0]: r for r in _pd_rows(df)}

    # doc 1 holds the first occurrence: byte-identical round-trip
    assert got[1] == (1, PD_ROWS[0][1], 2, 2)
    # doc 2 loses BOTH copies (corpus-first lives in doc 1)
    assert got[2] == (2, "second doc body line that is unique", 3, 1)
    # doc 3: short "##" paragraphs are non-candidates, kept both times
    assert got[3][1] == "##\na short heading kept twice\n##\na totally unique third document paragraph"
    assert got[3][2:] == (4, 4)
    # doc 4: trailing separator -> trailing empty paragraph survives
    assert got[4] == (4, "doc four opening statement paragraph\n", 3, 2)
    # doc 5: exact-match dedup is case-sensitive
    assert got[5] == (5, PD_ROWS[4][1], 1, 1)
    # doc 6: the empty doc's single empty paragraph is a non-candidate
    assert got[6] == (6, "", 1, 1)

    # and the DuckDB twin agrees on every planted corner
    planted = pd.DataFrame(PD_ROWS, columns=["doc_id", "text"])
    assert sorted(got.values()) == _pd_oracle_rows(_duck(planted=planted))


def test_paragraph_dedup_duplicate_free_corpus_roundtrips(spark):
    rows = [
        (10, "first wholly unique paragraph body\nsecond wholly unique paragraph body"),
        (11, "third wholly unique paragraph body\n\nafter a blank line"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = _pd_rows(df)
    assert [(d, t) for d, t, *_ in got] == rows
    assert all(np == nk for _, _, np, nk in got)


def test_paragraph_dedup_custom_sep_and_threshold(spark):
    # a regex-special separator must be treated literally (\Q..\E quoting)
    rows = [(1, "alpha beta gamma delta||x||alpha beta gamma delta"),
            (2, "alpha beta gamma delta||epsilon zeta")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = _pd_rows(df, sep="||", min_chars=5)
    assert got == [
        (1, "alpha beta gamma delta||x", 3, 2),
        (2, "epsilon zeta", 2, 1),
    ]
    planted = pd.DataFrame(rows, columns=["doc_id", "text"])
    assert got == _pd_oracle_rows(_duck(planted=planted), sep="||", min_chars=5)


# ---------------------------------------------------------------------------
# split_assign / leakage_safe_split
# ---------------------------------------------------------------------------


def test_split_assign_matches_duckdb_twin_corpus(spark, documents):
    from kgtm.mixture import split_assign

    out = split_assign(documents, holdout_frac=0.05, salt="s5")
    got = sorted((r["doc_id"], r["split"]) for r in out.select("doc_id", "split").collect())
    from kgtm import oracles

    want = sorted(
        (int(d), s)
        for d, s in _duck(parquet_docs=SF)
        .execute(
            "SELECT doc_id, split FROM ("
            + oracles.q_split_assign(holdout_frac=0.05, salt="s5")
            + ")"
        )
        .fetchall()
    )
    assert got == want
    # deterministic: a re-run draws the identical assignment
    got2 = sorted((r["doc_id"], r["split"]) for r in split_assign(
        documents, holdout_frac=0.05, salt="s5").select("doc_id", "split").collect())
    assert got == got2
    n_hold = sum(1 for _, s in got if s == "holdout")
    assert 0 < n_hold < len(got)  # 5% of 500 — both sides populated


def test_split_assign_null_key_never_holdout(spark):
    from kgtm.mixture import split_assign

    df = spark.createDataFrame([(None, "x")] * 8, "doc_id long, text string")
    # holdout_frac=1.0 sends EVERY hashable key to holdout; nulls must not go
    out = split_assign(df, holdout_frac=1.0).select("split").collect()
    assert {r["split"] for r in out} == {"train"}


def test_split_assign_rejects_existing_out_col(spark):
    """Re-splitting an already-tagged frame must fail loudly, not produce a
    duplicate `split` column that breaks F.col('split') downstream."""
    import pytest

    from kgtm.mixture import split_assign

    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    tagged = split_assign(df)
    with pytest.raises(ValueError, match="already exists"):
        split_assign(tagged)
    # a different out_col is fine
    re_tagged = split_assign(tagged, out_col="split2", salt="other")
    assert "split2" in re_tagged.columns


def test_unigram_nll_twin_rejects_nonpositive_top_v():
    """Twin/impl boundary parity: kgtm.lm._cap_vocab raises on top_v<=0, so
    the DuckDB twin must too (not silently treat 0 as uncapped)."""
    import pytest

    from kgtm import oracles

    with pytest.raises(ValueError, match="top_v"):
        oracles.q_unigram_nll(top_v=0)
    with pytest.raises(ValueError, match="top_v"):
        oracles.q_unigram_nll(top_v=-3)
    assert "LIMIT" not in oracles.q_unigram_nll(top_v=None)


def test_exploded_paragraphs_sep_containing_quote_terminator(spark):
    r"""A separator containing the literal `\E` sequence must stay fully
    literal (a naive \Q..\E quote would end early and leak live regex —
    here the tail would be `E.` matching any char after E)."""
    from kgtm.paragraphs import exploded_paragraphs

    sep = "\\E."  # backslash, E, dot — all literal
    df = spark.createDataFrame(
        [(1, "aaa\\E.bbb\\E.ccc"), (2, "no sep here E-x and Ey")],
        "doc_id long, text string",
    )
    rows = sorted(
        (r["doc_id"], r["pos"], r["para"])
        for r in exploded_paragraphs(df, sep=sep).collect()
    )
    assert rows == [
        (1, 0, "aaa"),
        (1, 1, "bbb"),
        (1, 2, "ccc"),
        (2, 0, "no sep here E-x and Ey"),
    ]


def test_leakage_safe_split_matches_twin_and_is_cluster_atomic(spark, documents):
    from kgtm import oracles
    from kgtm.mixture import leakage_safe_split

    out = leakage_safe_split(documents, threshold=0.5, holdout_frac=0.2, salt="ls")
    rows = out.select("doc_id", "cluster_id", "split").collect()
    got = sorted((r["doc_id"], r["cluster_id"], r["split"]) for r in rows)
    want = sorted(
        (int(d), c, s)
        for d, c, s in _duck(parquet_docs=SF)
        .execute(
            "SELECT doc_id, cluster_id, split FROM ("
            + oracles.q_leakage_safe_split(threshold=0.5, holdout_frac=0.2, salt="ls")
            + ")"
        )
        .fetchall()
    )
    assert got == want
    assert len(got) == documents.count()
    # atomicity: no cluster straddles the train/holdout boundary
    per_cluster: dict[str, set[str]] = {}
    for _, c, s in got:
        per_cluster.setdefault(c, set()).add(s)
    assert all(len(v) == 1 for v in per_cluster.values())
    # the corpus has planted near-dup clusters — at least one real multi-doc
    # cluster must exist for the atomicity assertion to bite
    from collections import Counter

    sizes = Counter(c for _, c, _ in got)
    assert max(sizes.values()) >= 2


def test_prep_cli_paradedup_split_subprocess(tmp_path, spark):
    """Drive the prep CLI through paradedup -> spandedup -> redact ->
    filter -> split -> mixture -> chunk: holdout rows keep exactly one
    epoch-0 copy and the split tag survives chunking."""
    import json as _json
    import subprocess
    import sys as _sys
    from pathlib import Path

    repo = Path(__file__).resolve().parent.parent
    lenient = _json.dumps({k: 1.0 for k in [
        "dup_line_frac", "dup_line_char_frac", "top2_char_frac",
        "top3_char_frac", "top4_char_frac", "dup5_char_frac", "dup10_char_frac",
    ]})
    out = subprocess.run(
        [
            _sys.executable, str(repo / "kgtm" / "prep_cli.py"),
            "--documents", f"{SF}/documents.parquet",
            "--out", str(tmp_path / "prepped"),
            "--stages", "paradedup,spandedup,redact,filter,split,mixture,chunk",
            "--thresholds", lenient,
            "--weights", '{"src0": 2.0}',
            "--holdout-frac", "0.1",
            "--window", "16",
            "--cores", "4",
        ],
        capture_output=True, text=True, timeout=420,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    report = _json.loads(out.stdout.strip().splitlines()[-1])
    assert report["n_rows"] > 0

    from kgtm.materialize import read_table

    prepped = read_table(spark, str(tmp_path / "prepped"), table="prepped")
    assert {"doc_id", "epoch", "split", "win_idx", "chunk"} <= set(prepped.columns)
    rows = prepped.select("doc_id", "split", "epoch").distinct().collect()
    splits = {r["doc_id"]: r["split"] for r in rows}
    assert set(splits.values()) == {"train", "holdout"}
    # holdout docs: exactly one epoch (0), even for the doubled src0 domain
    hold_epochs = {r["epoch"] for r in rows if r["split"] == "holdout"}
    assert hold_epochs == {0}
    # a src0 train doc is epoch-doubled
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    src0 = {r.doc_id for r in docs.where("source = 'src0'").collect()}
    doubled = [d for d, s in splits.items() if s == "train" and d in src0]
    assert doubled
    eps = {r["epoch"] for r in rows if r["doc_id"] == doubled[0]}
    assert eps == {0, 1}


# ---------------------------------------------------------------------------
# plan shape — the 100 TB contract, structurally asserted
# ---------------------------------------------------------------------------


def test_paragraph_dedup_plan_two_exchanges_no_window_no_join(spark, documents):
    """paragraph_dedup's scale contract: exactly two shuffles (digest agg,
    doc reassembly), survivor pick as a map-side-combinable HashAggregate —
    never a Window sort over the (hot) digest key, never a join back, no
    Python UDF anywhere."""
    from kgtm.paragraphs import paragraph_dedup

    plan = paragraph_dedup(documents)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 2
    assert "Window" not in plan
    for join in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin"):
        assert join not in plan
    # min-struct survivor pick is a partial/final HashAggregate pair: the
    # partial (map-side) half must sit below the digest exchange
    digest_below = plan.split("Exchange hashpartitioning", 1)[1]
    assert "partial_min" in plan and "HashAggregate" in digest_below
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_split_assign_plan_fuses_into_scan(spark, documents):
    """split_assign is a scan-fused projection: zero exchanges, zero joins."""
    from kgtm.mixture import split_assign

    plan = split_assign(documents)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Join" not in plan


# ---------------------------------------------------------------------------
# property: the DuckDB twin == a pure-Python reference walk (hypothesis)
# ---------------------------------------------------------------------------


def _ref_paragraph_dedup(rows, sep="\n", min_chars=3):
    """First-occurrence paragraph dedup as a direct sequential walk in
    (doc_id, pos) order. Candidate = len(para.strip(' ')) >= min_chars
    (Spark/DuckDB trim remove spaces only, not tabs)."""
    seen: set[str] = set()
    out = {}
    for doc_id, text in sorted(rows):
        paras = text.split(sep)
        kept = []
        for para in paras:
            if len(para.strip(" ")) >= min_chars:
                if para in seen:
                    continue
                seen.add(para)
            kept.append(para)
        if kept:
            out[doc_id] = (sep.join(kept), len(paras), len(kept))
    return out


def test_paragraph_dedup_twin_matches_reference_walk_hypothesis():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from kgtm import oracles

    para_text = st.text(alphabet="ab \n\t", max_size=30)
    corpus = st.lists(para_text, min_size=1, max_size=8)

    @settings(max_examples=150, deadline=None)
    @given(corpus)
    def run(texts):
        rows = list(enumerate(texts))
        planted = pd.DataFrame(rows, columns=["doc_id", "text"])
        con = _duck(planted=planted)
        got = {
            int(d): (t, int(np), int(nk))
            for d, t, np, nk in con.execute(
                oracles.q_paragraph_dedup(min_chars=3)
            ).fetchall()
        }
        assert got == _ref_paragraph_dedup(rows)

    run()


def test_paragraph_dedup_null_text_dropped_both_engines(spark):
    """NULL text: split(NULL) explodes to no rows, so the doc vanishes —
    and the DuckDB twin agrees (unnest over a NULL split)."""
    rows = [(1, None), (2, "a real surviving paragraph body here")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = _pd_rows(df)
    assert got == [(2, rows[1][1], 1, 1)]
    planted = pd.DataFrame(rows, columns=["doc_id", "text"])
    assert got == _pd_oracle_rows(_duck(planted=planted))
