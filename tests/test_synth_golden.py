"""End-to-end P/R gate on the seeded synthetic corpus (BASELINE.json metric),
plus generator determinism and skew-shape checks."""

from __future__ import annotations

import pandas as pd
import pytest

from kgtm.pipeline import PipelineConfig, build_triples
from kgtm.quality import triple_pr
from kgtm.schemas import (
    ONTOLOGY_INDEX_SCHEMA,
    ONTOLOGY_SNAPSHOTS_SCHEMA,
    TRANSCRIPTS_SCHEMA,
)
from kgtm.synth import SynthConfig, generate


@pytest.fixture(scope="module")
def corpus():
    return generate(SynthConfig(seed=42, n_convs=120, n_ontologies=60))


def test_generator_deterministic():
    a = generate(SynthConfig(seed=7, n_convs=20, n_ontologies=10))
    b = generate(SynthConfig(seed=7, n_convs=20, n_ontologies=10))
    for x, y in zip(a, b):
        pd.testing.assert_frame_equal(x, y)
    c = generate(SynthConfig(seed=8, n_convs=20, n_ontologies=10))
    assert not a[0].equals(c[0])


def test_corpus_shapes(corpus):
    tr, idx, snaps, golden = corpus
    assert list(tr.columns) == ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    # Zipf conversation lengths: a long tail exists
    lens = tr.groupby("conv_id").size()
    assert lens.max() >= 10 * lens.median()
    # write order is shuffled (turn_idx != row order within a conv)
    first_conv = tr[tr.conv_id == tr.conv_id.iloc[0]]
    assert not first_conv.turn_idx.is_monotonic_increasing
    # host skew: top host carries a disproportionate share
    share = idx.host.value_counts(normalize=True).iloc[0]
    assert share > 0.25
    # 1-10 versions per ontology
    vc = snaps.groupby("ontology_iri").size()
    assert vc.min() >= 1 and vc.max() <= 10
    assert len(golden) > 100


def test_pipeline_pr_gate(spark, corpus):
    """The BASELINE.json quality gate: P/R >= 0.95 vs planted golden triples
    (we require 1.0 minus nothing — the pipeline should be exact on this
    corpus; asserting >= 0.95 per the gate, and printing the real numbers)."""
    tr_pd, idx_pd, snaps_pd, golden_pd = corpus
    tr = spark.createDataFrame(tr_pd, TRANSCRIPTS_SCHEMA)
    idx = spark.createDataFrame(idx_pd, ONTOLOGY_INDEX_SCHEMA)
    snaps = spark.createDataFrame(snaps_pd, ONTOLOGY_SNAPSHOTS_SCHEMA)
    golden = spark.createDataFrame(golden_pd)

    got = build_triples(tr, idx, snaps, PipelineConfig(onto_version="latestArchived"))
    pr = triple_pr(got, golden)
    print("P/R:", pr)
    assert pr["precision"] >= 0.95, pr
    assert pr["recall"] >= 0.95, pr


def test_snapshot_resolution_attached(spark, corpus):
    tr_pd, idx_pd, snaps_pd, _ = corpus
    tr = spark.createDataFrame(tr_pd, TRANSCRIPTS_SCHEMA)
    idx = spark.createDataFrame(idx_pd, ONTOLOGY_INDEX_SCHEMA)
    snaps = spark.createDataFrame(snaps_pd, ONTOLOGY_SNAPSHOTS_SCHEMA)
    got = build_triples(tr, idx, snaps)
    from pyspark.sql import functions as F

    linked = got.filter(F.col("source") == "archivo-latest")
    assert linked.count() > 0
    assert linked.filter(F.col("obj_snapshot_iri").isNull()).count() == 0
