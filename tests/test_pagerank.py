"""PageRank entity salience: numpy power-iteration twin + invariants.

No DuckDB twin here (10 float iterations in recursive SQL would pin the
oracle to summation order); the reference implementation is an independent
dense numpy power iteration over the same edge list, compared at 1e-9 —
the same float-tolerance discipline as the ANN cosine tests.
"""

from __future__ import annotations

import numpy as np
import pytest


def _np_pagerank(edges, damping=0.85, n_iter=10):
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    outw = np.zeros(n)
    for s, _ in edges:
        outw[idx[s]] += 1.0
    rank = np.full(n, 1.0 / n)
    for _ in range(n_iter):
        in_mass = np.zeros(n)
        for s, d in edges:
            in_mass[idx[d]] += rank[idx[s]] / outw[idx[s]]
        dangling = rank[outw == 0].sum()
        rank = (1 - damping) / n + damping * (in_mass + dangling / n)
    return {nodes[i]: rank[i] for i in range(n)}


EDGES = [
    ("a", "b"), ("a", "b"), ("a", "c"),   # parallel edge: a->b weight 2
    ("b", "c"),
    ("c", "a"),
    ("d", "c"),                            # d: source-only
    ("b", "e"),                            # e: dangling (no out-edges)
]


def _spark_ranks(spark, edges, **kw):
    from kgtm.graph import pagerank

    df = spark.createDataFrame(edges, "subj string, obj string")
    return {r["node"]: r["rank"] for r in pagerank(df, **kw).collect()}


def test_pagerank_matches_numpy_power_iteration(spark):
    got = _spark_ranks(spark, EDGES)
    want = _np_pagerank(EDGES)
    assert set(got) == set(want)
    for node, r in want.items():
        assert got[node] == pytest.approx(r, abs=1e-9)
    # mass conservation: full dangling redistribution keeps the sum at 1
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_on_flagship_triples_ranks_hub_highest(spark, events):
    from kgtm.graph import pagerank
    from kgtm.pipeline import build_triples
    from kgtm.transcripts import (
        events_to_transcripts,
        ontology_index_df,
        ontology_snapshots_df,
    )

    triples = build_triples(
        events_to_transcripts(events),
        ontology_index_df(spark),
        ontology_snapshots_df(spark),
    )
    edges = [(r["subj"], r["obj"]) for r in triples.select("subj", "obj").collect()]
    got = {r["node"]: r["rank"] for r in pagerank(triples).collect()}
    want = _np_pagerank(edges)
    assert set(got) == set(want)
    for node, r in want.items():
        assert got[node] == pytest.approx(r, rel=1e-9, abs=1e-12)
    # ranking order (the consumer-visible contract) identical
    got_order = sorted(got, key=lambda k: (-got[k], k))
    want_order = sorted(want, key=lambda k: (-want[k], k))
    assert got_order == want_order


def test_pagerank_zero_iterations_is_uniform_and_args_validated(spark):
    got = _spark_ranks(spark, EDGES, n_iter=0)
    assert all(r == pytest.approx(1.0 / len(got)) for r in got.values())
    with pytest.raises(ValueError, match="damping"):
        _spark_ranks(spark, EDGES, damping=1.5)
    with pytest.raises(ValueError, match="n_iter"):
        _spark_ranks(spark, EDGES, n_iter=-1)


def test_pagerank_null_endpoints_excluded_and_mass_conserved(spark):
    from kgtm.graph import pagerank

    rows = EDGES + [("a", None), (None, "b")]
    df = spark.createDataFrame(rows, "subj string, obj string")
    got = {r["node"]: r["rank"] for r in pagerank(df).collect()}
    # NULL never becomes a node, and dropping null-endpoint edges keeps
    # the graph identical to EDGES — including total mass
    assert None not in got
    want = _np_pagerank(EDGES)
    assert set(got) == set(want)
    for node, r in want.items():
        assert got[node] == pytest.approx(r, abs=1e-9)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


# ---------------------------------------------------------------------------
# negative sampling (TransE-style corrupted triples)
# ---------------------------------------------------------------------------


def _planted_triples(spark):
    rows = [
        ("e1", "knows", "e2"),
        ("e1", "likes", "e3"),
        ("e2", "knows", "e3"),
        ("e3", "knows", "e4"),
        ("e4", "likes", "e1"),
        ("e5", "knows", None),  # NULL endpoint: never sampled
    ]
    return spark.createDataFrame(rows, "subj string, pred string, obj string")


def test_negative_samples_contract(spark):
    from kgtm.graph import negative_samples

    t = _planted_triples(spark)
    out = negative_samples(t, k=4, pool_size=8).collect()
    true = {("e1", "knows", "e2"), ("e1", "likes", "e3"), ("e2", "knows", "e3"),
            ("e3", "knows", "e4"), ("e4", "likes", "e1")}
    ents = {e for s, _, o in true for e in (s, o)}
    assert out  # the filter never empties a 5-triple corpus at k=4
    for r in out:
        # every negative differs from EVERY true triple
        assert (r.neg_subj, r.pred, r.neg_obj) not in true
        # exactly one side is corrupted, with a pool entity
        if r.side == "subj":
            assert r.neg_obj == r.obj and r.neg_subj in ents
        else:
            assert r.side == "obj" and r.neg_subj == r.subj
            assert r.neg_obj in ents
        assert 0 <= r.sample_idx < 4
        assert (r.subj, r.pred, r.obj) in true  # NULL-endpoint row excluded
    # deterministic: a second run is identical
    again = negative_samples(t, k=4, pool_size=8).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))
    # a different salt draws a different sample
    other = negative_samples(t, k=4, pool_size=8, salt="other").collect()
    assert sorted(map(tuple, out)) != sorted(map(tuple, other))


def test_negative_samples_validation(spark):
    import pytest as _pt

    from kgtm.graph import negative_samples

    t = _planted_triples(spark)
    with _pt.raises(ValueError):
        negative_samples(t, k=0)
    with _pt.raises(ValueError):
        negative_samples(t, pool_size=1)


def test_negative_samples_matches_duckdb_twin_on_flagship(spark, events):
    """Cross-engine: both engines sample from the SAME materialized triple
    table (the flagship pipeline's output) and must emit the identical
    negative set, row for row."""
    import duckdb

    from kgtm import oracles
    from kgtm.graph import negative_samples
    from kgtm.pipeline import build_triples
    from kgtm.transcripts import (
        events_to_transcripts,
        ontology_index_df,
        ontology_snapshots_df,
    )

    triples = build_triples(
        events_to_transcripts(events),
        ontology_index_df(spark),
        ontology_snapshots_df(spark),
    ).select("subj", "pred", "obj")
    got = sorted(
        map(tuple, negative_samples(triples, k=2, pool_size=16).collect())
    )
    pdf = triples.toPandas()
    con = duckdb.connect()
    con.register("triples", pdf)
    want = sorted(
        map(
            tuple,
            con.execute(
                oracles.q_negative_samples(k=2, pool_size=16)
            ).fetchall(),
        )
    )
    assert len(got) == len(want) > 0
    assert got == want


def test_negative_samples_plan_broadcasts_pool(spark, events):
    from kgtm.graph import negative_samples
    from kgtm.pipeline import build_triples
    from kgtm.transcripts import (
        events_to_transcripts,
        ontology_index_df,
        ontology_snapshots_df,
    )

    triples = build_triples(
        events_to_transcripts(events),
        ontology_index_df(spark),
        ontology_snapshots_df(spark),
    ).select("subj", "pred", "obj")
    plan = (
        negative_samples(triples)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan  # the pool lookup never shuffles


def test_negative_samples_partitioning_invariant(spark):
    """The claimed reproducibility across partitionings, pinned: 1-partition
    and 7-partition inputs emit the identical sample set."""
    from kgtm.graph import negative_samples

    t = _planted_triples(spark)
    one = negative_samples(t.coalesce(1), k=3, pool_size=8).collect()
    many = negative_samples(t.repartition(7), k=3, pool_size=8).collect()
    assert sorted(map(tuple, one)) == sorted(map(tuple, many))
    assert one  # non-vacuous
