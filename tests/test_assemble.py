"""Turn assembly: the per-turn fidelity invariant + salted-path equivalence."""

from __future__ import annotations

from pyspark.sql import functions as F

from kgtm.assemble import (
    assemble_conversations,
    assemble_conversations_salted,
)
from kgtm.transcripts import events_to_transcripts


def _shuffled_transcripts(spark):
    """Small corpus written in NON-turn order (assembly must actually sort)."""
    rows = []
    for conv in range(6):
        n = 3 + conv * 2
        for t in reversed(range(n)):  # reverse order on purpose
            rows.append((f"c{conv}", t, "user", f"turn {t} of c{conv}", None, None))
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    ).repartition(5)


def test_assembly_orders_turns(spark):
    tr = _shuffled_transcripts(spark)
    out = {r.conv_id: r for r in assemble_conversations(tr).collect()}
    assert out["c2"].n_turns == 7
    texts = out["c2"].conv_text.split("\n")
    assert texts == [f"turn {i} of c2" for i in range(7)]


def test_per_turn_text_fidelity_roundtrip(spark):
    """The E5 invariant: explode(assemble(tr)) == tr, text byte-for-byte."""
    tr = _shuffled_transcripts(spark)
    conv = assemble_conversations(tr)
    back = conv.select(
        "conv_id", F.posexplode(F.split("conv_text", "\n")).alias("turn_idx", "text")
    )
    orig = tr.select("conv_id", "turn_idx", "text")
    assert orig.exceptAll(back).count() == 0
    assert back.exceptAll(orig).count() == 0


def test_salted_equals_unsalted(spark, events):
    tr = events_to_transcripts(events)
    a = assemble_conversations(tr)
    b = assemble_conversations_salted(tr, n_salt=4)
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_events_adapter_turn_idx_dense(spark, events):
    tr = events_to_transcripts(events)
    agg = tr.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("turn_idx").alias("lo"),
        F.max("turn_idx").alias("hi"),
        F.count_distinct("turn_idx").alias("nd"),
    )
    bad = agg.filter(
        (F.col("lo") != 0) | (F.col("hi") != F.col("n") - 1) | (F.col("nd") != F.col("n"))
    )
    assert bad.count() == 0
