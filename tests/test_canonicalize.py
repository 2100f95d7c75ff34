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
