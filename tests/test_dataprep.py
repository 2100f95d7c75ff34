"""LLM-data-prep operator coverage: Gopher repetition signals, PII
detection/redaction, and token-window packing — each value-checked against
a DuckDB twin (pytest-gated; the driver gate is capped at 50 queries) plus
hand-planted invariants.
"""

from __future__ import annotations

import pandas as pd
import pytest

from conftest import duck_docs as _duck

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# repetition signals (Gopher filters)
# ---------------------------------------------------------------------------

REP_COLS = [
    "doc_id", "n_words", "total_chars", "n_lines",
    "dup_line_frac", "dup_line_char_frac",
    "top2_char_frac", "top3_char_frac", "top4_char_frac",
    "dup5_char_frac", "dup10_char_frac",
]


def _rep_rows(df):
    from kgtm.repetition import repetition_signals

    out = repetition_signals(df)
    assert [c for c in out.columns] == REP_COLS
    return sorted(tuple(r[c] for c in REP_COLS) for r in out.collect())


def _rep_oracle_rows(con):
    from kgtm import oracles

    return sorted(
        (int(d), int(nw), int(tc), int(nl), dlf, dlcf, t2, t3, t4, d5, d10)
        for d, nw, tc, nl, dlf, dlcf, t2, t3, t4, d5, d10 in con.execute(
            oracles.q_repetition_signals()
        ).fetchall()
    )


def test_repetition_signals_matches_duckdb_twin_corpus(spark, documents):
    got = _rep_rows(documents)
    want = _rep_oracle_rows(_duck(parquet_docs=SF))
    assert len(got) == documents.count() > 0
    assert got == want


def test_repetition_signals_planted(spark):
    """Hand-computed Gopher signals on planted corners: alternating bigram
    soup, overlapping duplicate 5-grams (coverage union, not double count),
    duplicate lines, and the empty document."""
    rows = [
        (1, "a b a b a b"),
        (2, "x y z x y z x y z w"),
        (3, "Hello World\nhello world\nunique line"),
        (4, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r[0]: r for r in _rep_rows(df)}

    # doc 1: top 2-gram "a b" x3, glen 2 -> 6/6 chars
    assert got[1][REP_COLS.index("top2_char_frac")] == 1.0
    assert got[1][REP_COLS.index("dup5_char_frac")] == 0.0  # both 5-grams unique
    # doc 2: dup 5-grams cover word idx 0..8 of 10 one-char words
    assert got[2][REP_COLS.index("dup5_char_frac")] == 0.9
    assert got[2][REP_COLS.index("n_words")] == 10
    # doc 3: lines lowercase to a duplicate pair + one unique
    assert got[3][REP_COLS.index("n_lines")] == 3
    assert got[3][REP_COLS.index("dup_line_frac")] == round(1 / 3, 6)
    assert got[3][REP_COLS.index("dup_line_char_frac")] == round(11 / 33, 6)
    # doc 4: all-zero row, not a dropped row
    assert got[4][1:] == (0, 0, 0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0)

    # and the DuckDB twin agrees on every planted corner
    planted = pd.DataFrame(rows, columns=["doc_id", "text"])
    assert sorted(got.values()) == _rep_oracle_rows(_duck(planted=planted))


# ---------------------------------------------------------------------------
# PII detection / redaction
# ---------------------------------------------------------------------------

PII_ROWS = [
    (1, "contact me at jane.doe+x@example.org or on 555-123-4567 ok"),
    (2, "ssn 123-45-6789 and server 10.0.255.3 plus bob@test.io"),
    (3, "no pii here just words and numbers 12345"),
    (4, ""),
    (5, "two mails a@b.co c@d.org and ip 1.2.3.4 and +1 555 987 6543"),
]


def test_pii_signals_planted_and_twin(spark):
    from kgtm.pii import pii_signals

    df = spark.createDataFrame(PII_ROWS, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_email, r.n_ssn, r.n_phone, r.n_ipv4, r.n_pii, r.has_pii)
        for r in pii_signals(df).collect()
    }
    assert got[1] == (1, 0, 1, 0, 2, True)
    assert got[2] == (1, 1, 0, 1, 3, True)
    assert got[3] == (0, 0, 0, 0, 0, False)
    assert got[4] == (0, 0, 0, 0, 0, False)
    # "+1 555 987 6543" -> the 3-3-4 run "555 987 6543" matches phone
    assert got[5] == (2, 0, 1, 1, 4, True)

    from kgtm import oracles

    planted = pd.DataFrame(PII_ROWS, columns=["doc_id", "text"])
    con = _duck(planted=planted)
    want = {
        int(d): (int(e), int(s), int(p), int(i), int(t), bool(h))
        for d, e, s, p, i, t, h in con.execute(oracles.q_pii_signals()).fetchall()
    }
    assert got == want


def test_redact_pii_planted_and_twin(spark):
    from kgtm import oracles
    from kgtm.pii import redact_pii

    df = spark.createDataFrame(PII_ROWS, "doc_id long, text string")
    got = {r.doc_id: r.text_redacted for r in redact_pii(df).collect()}
    assert got[1] == "contact me at <EMAIL> or on <PHONE> ok"
    assert got[2] == "ssn <SSN> and server <IP> plus <EMAIL>"
    assert got[3] == PII_ROWS[2][1]

    planted = pd.DataFrame(PII_ROWS, columns=["doc_id", "text"])
    con = _duck(planted=planted)
    want = {
        int(d): r for d, _, r in con.execute(oracles.q_redact_pii()).fetchall()
    }
    assert got == want


def test_pii_twin_on_corpus(spark, documents):
    """Row-for-row twin equality on the synthetic corpus (which carries no
    PII — the zero rows must MATCH, not vanish)."""
    from kgtm import oracles
    from kgtm.pii import pii_signals

    got = sorted(tuple(r) for r in pii_signals(documents).collect())
    con = _duck(parquet_docs=SF)
    want = sorted(
        (int(d), int(e), int(s), int(p), int(i), int(t), bool(h))
        for d, e, s, p, i, t, h in con.execute(oracles.q_pii_signals()).fetchall()
    )
    assert len(got) == documents.count() and got == want


# ---------------------------------------------------------------------------
# token-window chunking + greedy packing
# ---------------------------------------------------------------------------


def test_chunk_token_windows_planted(spark):
    from kgtm.packing import chunk_token_windows

    df = spark.createDataFrame(
        [(1, "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9"), (2, "a b c"), (3, "")],
        "doc_id long, text string",
    )
    rows = sorted(
        (r.doc_id, r.win_idx, r.start_tok, r.n_tokens, r.chunk)
        for r in chunk_token_windows(df, window=4).collect()
    )
    assert rows == [
        (1, 0, 0, 4, "w0 w1 w2 w3"),
        (1, 1, 4, 4, "w4 w5 w6 w7"),
        (1, 2, 8, 2, "w8 w9"),
        (2, 0, 0, 3, "a b c"),
    ]
    # overlapping stride + drop_incomplete
    rows = sorted(
        (r.doc_id, r.start_tok, r.chunk)
        for r in chunk_token_windows(
            df.where("doc_id = 2"), window=2, stride=1, drop_incomplete=True
        ).collect()
    )
    assert rows == [(2, 0, "a b"), (2, 1, "b c")]


def test_chunk_token_windows_twin_on_corpus(spark, documents):
    from kgtm import oracles
    from kgtm.packing import chunk_token_windows

    got = sorted(
        tuple(r) for r in chunk_token_windows(documents, window=7, stride=5).collect()
    )
    con = _duck(parquet_docs=SF)
    want = sorted(
        (int(d), int(w), int(s), int(n), c)
        for d, w, s, n, c in con.execute(
            oracles.q_chunk_token_windows(window=7, stride=5)
        ).fetchall()
    )
    assert len(got) > 0 and got == want


def test_pack_greedy_planted(spark):
    """Greedy semantics: fill until overflow, oversize doc sits alone,
    zero-token doc never opens a pack."""
    from kgtm.packing import pack_greedy

    rows = [
        (0, "a b c"),                # 3 tokens -> pack 0 at off 0
        (8, "d e f g"),              # 4: 3+4=7 <= 8 -> pack 0 at off 3
        (16, "h i"),                 # 2: 7+2=9 > 8 -> pack 1 at off 0
        (24, " ".join(["x"] * 11)),  # 11: 2+11 > 8 -> pack 2 (oversize, alone)
        (32, ""),                    # 0: 11+0 > 8 -> pack 3 at off 0
        (40, "tail doc"),            # 2: acc=0 -> stays in pack 3 at off 0
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.doc_id: (r.shard, r.n_tokens, r.pack_idx, r.pack_off)
        for r in pack_greedy(df, budget=8, n_shards=8).collect()
    }
    # all doc_ids = 0 mod 8 -> one shard, one sequential walk
    assert out[0] == (0, 3, 0, 0)
    assert out[8] == (0, 4, 0, 3)
    assert out[16] == (0, 2, 1, 0)
    assert out[24] == (0, 11, 2, 0)
    assert out[32] == (0, 0, 3, 0)
    assert out[40] == (0, 2, 3, 0)


def test_pack_greedy_twin_on_corpus(spark, documents):
    from kgtm import oracles
    from kgtm.packing import pack_greedy

    got = sorted(tuple(r) for r in pack_greedy(documents, budget=256, n_shards=8).collect())
    con = _duck(parquet_docs=SF)
    want = sorted(
        (int(d), int(s), int(n), int(p), int(o))
        for d, s, n, p, o in con.execute(
            oracles.q_pack_greedy(budget=256, n_shards=8)
        ).fetchall()
    )
    assert len(got) == documents.count() and got == want


# ---------------------------------------------------------------------------
# mixture sampling + repetition filter
# ---------------------------------------------------------------------------


def _py_hash32(doc_id: int, salt: str) -> int:
    import hashlib

    return int(hashlib.md5(f"{doc_id}:{salt}".encode()).hexdigest()[:8], 16)


def test_mixture_sample_planted(spark):
    """Copy counts match the floor+fractional-hash contract recomputed in
    pure Python; weight 0 drops the domain; unlisted domains get the
    default weight."""
    from kgtm.mixture import mixture_sample

    rows = [(i, f"text {i}", ["a", "b", "c", "d"][i % 4]) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    weights = {"a": 2.25, "b": 0.5, "c": 0.0}
    out = mixture_sample(df, weights, salt="s1", default_weight=1.0)
    got = {}
    for r in out.collect():
        got.setdefault(r.doc_id, []).append(r.epoch)

    frac_thresh = {"a": int(0.25 * 2**32), "b": int(0.5 * 2**32), "c": 0, "d": 0}
    whole = {"a": 2, "b": 0, "c": 0, "d": 1}
    for i, _, dom in rows:
        n = whole[dom] + (1 if _py_hash32(i, "s1") < frac_thresh[dom] else 0)
        assert sorted(got.get(i, [])) == list(range(n)), (i, dom, n)
    # fractional sampling actually fired both ways somewhere
    b_counts = {i: len(got.get(i, [])) for i, _, d in rows if d == "b"}
    assert set(b_counts.values()) == {0, 1}

    # same salt reproduces; a different salt redraws only the fractional part
    again = mixture_sample(df, weights, salt="s1", default_weight=1.0)
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, again.collect()))


def test_mixture_sample_twin_on_corpus(spark, documents):
    from kgtm import oracles
    from kgtm.mixture import mixture_sample

    weights = {"src0": 2.25, "src1": 0.5, "src2": 0.0}
    got = sorted(
        tuple(r) for r in mixture_sample(documents, weights, salt="mix").collect()
    )
    con = _duck(parquet_docs=SF)
    want = sorted(
        tuple(int(v) if isinstance(v, (int,)) else v for v in row)
        for row in con.execute(oracles.q_mixture_sample(weights)).fetchall()
    )
    assert len(got) > 0 and got == want


def test_repetition_filter_planted_and_twin(spark, documents):
    from kgtm import oracles
    from kgtm.mixture import repetition_filter

    # a pathologically repetitive doc is dropped, a clean one kept (the
    # clean doc must be LONG — on a short doc a single occurrence of the
    # longest bigram already exceeds the top2 cap, which is why Gopher
    # pairs these caps with a minimum-length gate)
    varied = " ".join(f"word{i:03d}" for i in range(80))
    planted = spark.createDataFrame(
        [(1, "spam spam spam spam spam spam spam spam"), (2, varied)],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.keep for r in repetition_filter(planted).collect()}
    assert got == {1: False, 2: True}

    full = sorted(tuple(r) for r in repetition_filter(documents).collect())
    con = _duck(parquet_docs=SF)
    want = sorted(tuple(r) for r in con.execute(oracles.q_repetition_filter()).fetchall())
    assert len(full) == documents.count()
    assert [(r[0], r[1]) for r in full] == [(int(r[0]), bool(r[1])) for r in want]

    # unknown threshold key is refused, not silently ignored
    with pytest.raises(ValueError, match="unknown signals"):
        repetition_filter(planted, {"nope": 1.0}).collect()


def test_mixture_sample_edge_domains_and_null_ids(spark):
    """Review regressions: an explicit weight for the empty-string domain
    must not be clobbered by the default; a null id keeps its floor(w)
    whole epochs (no fractional draw) instead of being silently dropped —
    and the DuckDB twin agrees on both."""
    from kgtm import oracles
    from kgtm.mixture import mixture_sample

    rows = [(1, "t1", ""), (2, "t2", "a"), (None, "t3", "a"), (4, "t4", "b")]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    weights = {"": 0.0, "a": 2.25}
    out = mixture_sample(df, weights, salt="s2", default_weight=1.0)
    key = lambda t: (t[0] is not None, t[0] or 0, t[3])  # noqa: E731
    got = sorted(
        ((r.doc_id, r.text, r.source, r.epoch) for r in out.collect()), key=key
    )
    # source "" dropped outright; null id gets exactly floor(2.25)=2 epochs
    assert [t for t in got if t[2] == ""] == []
    assert [t for t in got if t[0] is None] == [(None, "t3", "a", 0), (None, "t3", "a", 1)]
    assert [t for t in got if t[0] == 4] == [(4, "t4", "b", 0)]

    planted = pd.DataFrame(rows, columns=["doc_id", "text", "source"])
    # keep ids integral under the None: float64 would hash as '2.0:s2'
    planted["doc_id"] = planted["doc_id"].astype("Int64")
    con = _duck(planted=planted)
    want = sorted(
        (
            ((int(d) if d is not None else None), t, s, int(e))
            for d, t, s, e in con.execute(
                oracles.q_mixture_sample(weights, salt="s2")
            ).fetchall()
        ),
        key=key,
    )
    assert got == want


def test_mixture_sample_quoted_domain_twin(spark):
    """Domain names containing quotes must survive the twin's SQL
    literalization."""
    from kgtm import oracles
    from kgtm.mixture import mixture_sample

    rows = [(1, "x", "o'reilly"), (2, "y", "plain")]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    weights = {"o'reilly": 2.0}
    got = sorted(tuple(r) for r in mixture_sample(df, weights, salt="q").collect())
    planted = pd.DataFrame(rows, columns=["doc_id", "text", "source"])
    con = _duck(planted=planted)
    want = sorted(
        (int(d), t, s, int(e))
        for d, t, s, e in con.execute(
            oracles.q_mixture_sample(weights, salt="q")
        ).fetchall()
    )
    assert got == want and len([t for t in got if t[2] == "o'reilly"]) == 2


def test_pack_greedy_negative_ids_twin(spark):
    """Review regression: the twin's shard must mirror Spark's pmod for
    negative ids (plain SQL % is signed)."""
    from kgtm import oracles
    from kgtm.packing import pack_greedy

    rows = [(i, "w " * (abs(i) % 5 + 1)) for i in range(-7, 8)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(tuple(r) for r in pack_greedy(df, budget=6, n_shards=4).collect())
    planted = pd.DataFrame(rows, columns=["doc_id", "text"])
    con = _duck(planted=planted)
    want = sorted(
        (int(d), int(s), int(n), int(p), int(o))
        for d, s, n, p, o in con.execute(
            oracles.q_pack_greedy(budget=6, n_shards=4)
        ).fetchall()
    )
    assert got == want
    assert {t[1] for t in got} == {0, 1, 2, 3}


def test_chunk_extra_cols_and_pack_order_cols(spark):
    """Epoch plumbing for mixture-sampled corpora: chunking passes extra
    columns through; packing with order_cols is deterministic under
    duplicate ids regardless of input partitioning."""
    from kgtm.packing import chunk_token_windows, pack_greedy

    rows = [(1, 0, "a b c"), (1, 1, "a b c"), (2, 0, "d e")]
    df = spark.createDataFrame(rows, "doc_id long, epoch int, text string")
    chunks = sorted(
        (r.doc_id, r.epoch, r.win_idx, r.chunk)
        for r in chunk_token_windows(df, window=2, extra_cols=("epoch",)).collect()
    )
    assert chunks == [
        (1, 0, 0, "a b"), (1, 0, 1, "c"),
        (1, 1, 0, "a b"), (1, 1, 1, "c"),
        (2, 0, 0, "d e"),
    ]

    a = pack_greedy(df, budget=4, n_shards=2, order_cols=("epoch",))
    b = pack_greedy(df.repartition(7), budget=4, n_shards=2, order_cols=("epoch",))
    ra = sorted(tuple(r) for r in a.collect())
    rb = sorted(tuple(r) for r in b.collect())
    assert ra == rb
    assert "epoch" in a.columns
    # rows are (doc_id, epoch, shard, n_tokens, pack_idx, pack_off);
    # doc 1's two 3-token epochs overflow budget 4 -> epoch 1 opens pack 1
    one = {r[1]: (r[4], r[5]) for r in ra if r[0] == 1}
    assert one == {0: (0, 0), 1: (1, 0)}


def test_prep_cli_end_to_end_subprocess(spark, tmp_path):
    """Drive the data-prep CLI as spark-submit would (fresh JVM), through
    redact -> filter -> mixture -> chunk with a signals side-table."""
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
            "--signals-out", str(tmp_path / "signals"),
            "--stages", "redact,filter,mixture,chunk",
            "--thresholds", lenient,
            "--weights", '{"src0": 2.0, "src1": 0.5}',
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
    assert {"doc_id", "epoch", "win_idx", "chunk"} <= set(prepped.columns)
    # src0 docs were doubled: every (doc_id, win_idx) of a src0 doc appears
    # with epochs {0, 1}
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    src0 = [r.doc_id for r in docs.where("source = 'src0'").limit(3).collect()]
    for d in src0:
        eps = {r.epoch for r in prepped.where(f"doc_id = {d}").collect()}
        assert eps == {0, 1}
    sig = read_table(spark, str(tmp_path / "signals"), table="doc_signals")
    assert {"keep", "n_pii", "quality_score", "nll_bits"} <= set(sig.columns)
    assert sig.count() == docs.count()


def test_prep_stages_are_streaming_composable(spark, documents, tmp_path):
    """The stateless prep stages (redact -> chunk) run unchanged on a
    readStream source and produce exactly the batch result — the property
    that lets the prep tier sit inside a Structured Streaming ingest."""
    from kgtm.packing import chunk_token_windows
    from kgtm.pii import redact_col
    from pyspark.sql import functions as F

    in_dir, out_dir, ck = (str(tmp_path / d) for d in ("in", "out", "ck"))
    docs = documents.select("doc_id", "text", "source")
    docs.repartition(4).write.parquet(in_dir)

    def prep(df):
        return chunk_token_windows(
            df.withColumn("text", redact_col(F.col("text"))), window=16
        )

    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(in_dir)
    )
    q = (
        prep(stream)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ck)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = sorted(tuple(r) for r in spark.read.parquet(out_dir).collect())
    want = sorted(tuple(r) for r in prep(spark.read.parquet(in_dir)).collect())
    assert len(got) > 0 and got == want
