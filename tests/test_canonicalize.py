"""Connected-components / canonicalization tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from kgtm.canonicalize import canonical_entities, connected_components
from kgtm.extract import extract_mentions
from kgtm.link import link_mentions
from kgtm.transcripts import events_to_transcripts, ontology_index_df


def test_connected_components_basic(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("x", "y"), ("z", "z")],
        "src string, dst string",
    )
    out = {r.node: r.component for r in connected_components(edges).collect()}
    assert out["a"] == out["b"] == out["c"] == "a"
    assert out["x"] == out["y"] == "x"
    assert out["z"] == "z"


def test_connected_components_chain_converges(spark):
    # a long path graph is the worst case for min-label propagation
    n = 24
    edges = spark.createDataFrame(
        [(f"n{i:03d}", f"n{i+1:03d}") for i in range(n)], "src string, dst string"
    )
    out = {r.node: r.component for r in connected_components(edges, max_iter=50).collect()}
    assert set(out.values()) == {"n000"}
    assert len(out) == n + 1


def test_canonical_entities_collapses_variants(spark, events):
    tr = events_to_transcripts(events)
    linked = link_mentions(extract_mentions(tr), ontology_index_df(spark))
    ents = canonical_entities(linked)
    # every variant surface of /view maps to one canonical id
    view_surfaces = [
        r.canonical_id
        for r in ents.filter(
            F.col("surface").contains("onto.example.org/view")
        ).collect()
    ]
    assert len(set(view_surfaces)) == 1
    # unlinked surfaces stay themselves
    unk = ents.filter(F.col("surface").contains("unknown.example.net")).collect()
    assert all(r.canonical_id == r.surface for r in unk)


def test_star_cc_matches_plain_and_converges_fast(spark):
    """Large-star/small-star: O(log n) rounds on a chain (the plain
    propagation worst case) and identical partitions on arbitrary graphs."""
    import random

    from kgtm.canonicalize import connected_components_star

    chain = spark.createDataFrame(
        [(f"n{i:03d}", f"n{i+1:03d}") for i in range(63)], "src string, dst string"
    )
    labels, rounds = connected_components_star(chain)
    got = {r.node: r.component for r in labels.collect()}
    assert set(got.values()) == {"n000"} and len(got) == 64
    assert rounds <= 10  # log-ish, vs 63 propagation rounds

    rng = random.Random(11)
    edges = [
        (f"v{rng.randrange(30):02d}", f"v{rng.randrange(30):02d}") for _ in range(25)
    ]
    df = spark.createDataFrame(edges, "src string, dst string")
    plain = {r.node: r.component for r in connected_components(df, max_iter=50).collect()}
    star_df, _ = connected_components_star(df)
    star = {r.node: r.component for r in star_df.collect()}
    assert plain == star
