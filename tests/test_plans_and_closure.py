"""Physical-plan shape assertions (the 100 TB contract) + dependency closure."""

from __future__ import annotations

from pyspark.sql import functions as F

from kgtm.link import link_mentions
from kgtm.extract import extract_mentions
from kgtm.pipeline import PipelineConfig, build_triples
from kgtm.resolve import dependency_closure
from kgtm.schemas import ONTOLOGY_SNAPSHOTS_SCHEMA
from kgtm.transcripts import (
    events_to_transcripts,
    ontology_index_df,
    ontology_snapshots_df,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_linking_uses_broadcast_join(spark, events):
    """The dictionary side must broadcast — the fact side never shuffles for
    the probe (SURVEY §4: 'broadcast of the compact dictionary')."""
    tr = events_to_transcripts(events)
    linked = link_mentions(extract_mentions(tr), ontology_index_df(spark))
    plan = _plan(linked)
    assert "BroadcastHashJoin" in plan
    # the ladder probe join must NOT be a sort-merge join
    assert "SortMergeJoin" not in plan.split("BroadcastHashJoin")[0]


def test_broadcast_ladder_plan_is_one_broadcast_join_no_agg(spark, events):
    """The large-dictionary ladder (link.broadcast_ladder_link) must plan as
    exactly ONE broadcast hash join on the probe side with NO aggregation and
    NO sort-merge join — the properties that make it append-safe in streaming
    and O(1)-plan-size in |dictionary| (the map side aggregates on the STATIC
    dictionary side only, before the broadcast exchange)."""
    from kgtm.link import broadcast_ladder_link

    tr = events_to_transcripts(events)
    linked = broadcast_ladder_link(extract_mentions(tr), ontology_index_df(spark))
    plan = _plan(linked)
    assert plan.count("BroadcastHashJoin") == 1
    assert "SortMergeJoin" not in plan
    # any HashAggregate must sit BELOW the broadcast exchange (dictionary
    # prep), never above the join on the probe side
    probe_side = plan.split("BroadcastExchange")[0]
    assert "HashAggregate" not in probe_side
    # probe side stays whole-stage-codegen (no Python UDF in the ladder)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_flagship_resolution_joins_broadcast(spark, events):
    tr = events_to_transcripts(events)
    out = build_triples(
        tr,
        ontology_index_df(spark),
        ontology_snapshots_df(spark),
        PipelineConfig(persist_intermediate=False),
    )
    plan = _plan(out)
    assert plan.count("BroadcastHashJoin") >= 2  # subj + obj dim joins


def test_flagship_dim_broadcast_built_once(spark, events):
    """The subj and obj dim joins probe the SAME broadcast: after execution
    the final adaptive plan must contain a ReusedExchange for the surface
    dim (it is built and shipped once, not per-join)."""
    tr = events_to_transcripts(events)
    out = build_triples(
        tr,
        ontology_index_df(spark),
        ontology_snapshots_df(spark),
        PipelineConfig(persist_intermediate=False),
    )
    out.collect()  # AQE finalizes (and reuses) the broadcast stages
    final = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "simple"
    )
    assert "isFinalPlan=true" in final
    assert "ReusedExchange" in final


def test_parquet_scan_prunes_columns(spark):
    """Column pruning must reach the scan: a 2-column projection over events
    reads 2 columns (ReadSchema), not 6."""
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    df = ev.select("event_id", "ts").filter(F.col("event_id") > 100)
    plan = _plan(df)
    # projection pruned to the 2 columns at the scan...
    assert "FileScan parquet [event_id#" in plan and ",ts#" in plan
    assert "event_type" not in plan and "props" not in plan
    # ...and the predicate reached the parquet reader
    assert "PushedFilters: [IsNotNull(event_id), GreaterThan(event_id,100)" in plan


def test_dependency_closure(spark):
    import datetime as dt

    ts = dt.datetime(2024, 1, 1)
    rows = [
        # a → b → c, a → d; e isolated; cycle x ↔ y terminates
        ("http://h/a", ts, "snap:a", "f:a", ["snap:b", "snap:d"]),
        ("http://h/b", ts, "snap:b", "f:b", ["snap:c"]),
        ("http://h/c", ts, "snap:c", "f:c", []),
        ("http://h/d", ts, "snap:d", "f:d", []),
        ("http://h/e", ts, "snap:e", "f:e", []),
        ("http://h/x", ts, "snap:x", "f:x", ["snap:y"]),
        ("http://h/y", ts, "snap:y", "f:y", ["snap:x"]),
    ]
    snaps = spark.createDataFrame(rows, ONTOLOGY_SNAPSHOTS_SCHEMA)
    roots = spark.createDataFrame([("snap:a",), ("snap:x",)], "snapshot_iri string")
    out = dependency_closure(snaps, roots)
    got = {(r.root_snapshot_iri, r.snapshot_iri): r.depth for r in out.collect()}
    assert got[("snap:a", "snap:a")] == 0
    assert got[("snap:a", "snap:b")] == 1
    assert got[("snap:a", "snap:d")] == 1
    assert got[("snap:a", "snap:c")] == 2
    assert ("snap:a", "snap:e") not in got
    # cycle: both reachable, no infinite loop
    assert got[("snap:x", "snap:y")] == 1
    assert got[("snap:x", "snap:x")] == 0
    assert len([k for k in got if k[0] == "snap:x"]) == 2


def test_adjacency_lists_caps_super_nodes(spark):
    from kgtm.graph import adjacency_lists

    rows = [("c", f"hub", "uses", f"obj{i}") for i in range(20)] + [
        ("c", "small", "uses", "x")
    ]
    t = spark.createDataFrame(rows, "conv_id string, subj string, pred string, obj string")
    out = {r.subj: r for r in adjacency_lists(t, max_neighbors=5).collect()}
    assert out["hub"].degree == 20 and out["hub"].truncated
    assert len(out["hub"].neighbors) == 5
    assert out["small"].degree == 1 and not out["small"].truncated


def test_sql_api_flagship_matches_dataframe(spark, events):
    """The pure-SQL flagship statement equals the DataFrame pipeline."""
    from kgtm.sql_api import flagship_sql

    tr = events_to_transcripts(events)
    df_out = build_triples(
        tr,
        ontology_index_df(spark),
        ontology_snapshots_df(spark),
        PipelineConfig(persist_intermediate=False),
    )
    sql_out = flagship_sql(
        spark, tr, ontology_index_df(spark), ontology_snapshots_df(spark)
    ).select(*df_out.columns)
    assert sql_out.exceptAll(df_out).count() == 0
    assert df_out.exceptAll(sql_out).count() == 0
