"""Extraction, linking (first-hit-wins at scale), version resolution."""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest
from pyspark.sql import functions as F

from kgtm.extract import (
    extract_mentions,
    extract_triples,
    make_gazetteer_matcher,
    svo_extract_series,
)
from kgtm.link import deny_unlinked, link_mentions
from kgtm.resolve import asof_snapshots, latest_snapshots, resolve_links
from kgtm.schemas import ONTOLOGY_INDEX_SCHEMA, ONTOLOGY_SNAPSHOTS_SCHEMA
from kgtm.transcripts import events_to_transcripts, ontology_index_df, ontology_snapshots_df


# ---------------------------------------------------------------------------
# pure UDF bodies (no Spark)
# ---------------------------------------------------------------------------


def test_svo_extract_series_pure():
    s = pd.Series(
        [
            "Alice uses http://ex.org/onto today",
            "foo imports Bar and baz extends http://ex.org/b",
            "nothing here",
            None,
        ]
    )
    out = svo_extract_series(s).tolist()
    assert out[0] == [{"subj": "Alice", "pred": "uses", "obj": "http://ex.org/onto"}]
    assert {t["pred"] for t in out[1]} == {"imports", "extends"}
    assert out[2] == [] and out[3] == []


def test_gazetteer_matcher_pure():
    m = make_gazetteer_matcher(["FOAF", "Dublin Core"])
    out = m(pd.Series(["I like FOAF and Dublin Core", "foafish none"])).tolist()
    assert out[0] == ["FOAF", "Dublin Core"]
    assert out[1] == []  # whole-word boundary


# ---------------------------------------------------------------------------
# linking: set-oriented first-hit-wins
# ---------------------------------------------------------------------------


def _mentions_df(spark, iris):
    rows = [(f"c0", 0, i) for i in iris]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, surface string")
    from kgtm.normalize import parse_iri_cols

    return df.select(
        "conv_id",
        "turn_idx",
        F.xxhash64("surface").alias("mention_id"),
        "surface",
        *parse_iri_cols("surface"),
    )


def test_link_first_hit_wins_multi_rung_conflict(spark):
    """Two dictionary entries match different rungs → min rung must win
    (the SURVEY §7 proof obligation)."""
    index = spark.createDataFrame(
        [
            ("http://h/onto/Term", "h", "/onto/Term", "term"),
            ("http://h/onto", "h", "/onto", "slash"),
        ],
        ONTOLOGY_INDEX_SCHEMA,
    )
    m = _mentions_df(spark, ["http://h/onto/Term"])
    out = link_mentions(m, index).collect()[0]
    assert out.is_linked and out.rung == 0
    assert out.ontology_iri == "http://h/onto/Term"
    assert out.canonical_path == "/onto/Term"

    # remove the exact entry → rung 2 parent should win and canonicalize
    index2 = index.filter(F.col("path") != "/onto/Term")
    out2 = link_mentions(m, index2).collect()[0]
    assert out2.is_linked and out2.rung == 2
    assert out2.canonical_path == "/onto"


def test_link_unlinked_and_deny(spark):
    index = ontology_index_df(spark)
    m = _mentions_df(spark, ["http://nowhere.net/x", "http://onto.example.org/view"])
    linked = link_mentions(m, index)
    out = {r.surface: r for r in deny_unlinked(linked, True).collect()}
    assert out["http://nowhere.net/x"].outcome == "denied"
    assert out["http://onto.example.org/view"].outcome == "linked"
    out2 = {r.surface: r for r in deny_unlinked(linked, False).collect()}
    assert out2["http://nowhere.net/x"].outcome == "unlinked"


# ---------------------------------------------------------------------------
# version resolution
# ---------------------------------------------------------------------------


def _snaps(spark):
    def ts(s):
        return dt.datetime.strptime(s, "%Y.%m.%d-%H%M%S")

    rows = [
        ("http://h/a", ts("2024.01.24-215415"), "snap:a:1", "f:a:1", []),
        ("http://h/a", ts("2024.06.01-120000"), "snap:a:2", "f:a:2", []),
        ("http://h/a", ts("2024.12.31-233000"), "snap:a:3", "f:a:3", []),
        ("http://h/b", ts("2024.03.01-000000"), "snap:b:1", "f:b:1", []),
    ]
    return spark.createDataFrame(rows, ONTOLOGY_SNAPSHOTS_SCHEMA)


def test_latest_snapshots(spark):
    out = {r.ontology_iri: r for r in latest_snapshots(_snaps(spark)).collect()}
    assert out["http://h/a"].snapshot_iri == "snap:a:3"
    assert out["http://h/b"].snapshot_iri == "snap:b:1"


@pytest.mark.parametrize(
    "pin,expect_a",
    [
        (dt.datetime(2024, 7, 1), "snap:a:2"),      # between snapshots
        (dt.datetime(2024, 1, 24, 21, 54, 15), "snap:a:1"),  # exact match
        (dt.datetime(2023, 1, 1), None),             # before first → miss
        (dt.datetime(2025, 1, 1), "snap:a:3"),       # after last → latest
    ],
)
def test_asof_snapshots(spark, pin, expect_a):
    out = {r.ontology_iri: r.snapshot_iri for r in asof_snapshots(_snaps(spark), pin).collect()}
    assert out.get("http://h/a") == expect_a


def test_resolve_modes(spark):
    index = spark.createDataFrame(
        [("http://h/a", "h", "/a", "slash"), ("http://h/c", "h", "/c", "slash")],
        ONTOLOGY_INDEX_SCHEMA,
    )
    m = _mentions_df(spark, ["http://h/a", "http://h/a/", "http://h/c", "http://h/zz"])
    linked = link_mentions(m, index)
    snaps = _snaps(spark)

    latest = {r.surface: r for r in resolve_links(linked, snaps, "latestArchived").collect()}
    assert latest["http://h/a"].source == "archivo-latest"
    assert latest["http://h/a"].snapshot_iri == "snap:a:3"
    assert latest["http://h/c"].source == "not-found"  # in dict, no snapshots → 404 analog
    assert latest["http://h/zz"].source == "unlinked"

    pinned = {
        r.surface: r
        for r in resolve_links(
            linked, snaps, "timestampArchived", dt.datetime(2024, 7, 1)
        ).collect()
    }
    assert pinned["http://h/a"].snapshot_iri == "snap:a:2"
    assert pinned["http://h/a"].source == "archivo-timestamp"

    orig = {r.surface: r for r in resolve_links(linked, snaps, "original").collect()}
    assert orig["http://h/a"].source == "original"
    assert orig["http://h/a"].snapshot_iri is None

    # failover needs the live-leg columns — faithful gate (proxy_logic.py:
    # 209-238): status ∈ passthrough whitelist ∧ content-type ∈ Accept mimes
    with pytest.raises(ValueError, match="live-leg columns"):
        resolve_links(linked, snaps, "originalFailoverLiveLatest")

    live = {
        # surface → (status, content_type, accept)
        "http://h/a": (200, "text/turtle; charset=utf-8", "text/turtle"),  # live ok
        "http://h/a/": (500, "text/turtle", "text/turtle"),  # bad status → archived
        "http://h/c": (200, "application/json", "text/turtle"),  # mime mismatch; no snaps → not-found
        "http://h/zz": (200, "text/turtle", "text/turtle"),  # unlinked stays unlinked
    }
    rows = [(s, *live[s]) for s in live]
    live_df = spark.createDataFrame(
        rows, "surface string, live_status int, live_content_type string, accept_header string"
    )
    fo = {
        r.surface: r
        for r in resolve_links(
            linked.join(live_df, "surface"), snaps, "originalFailoverLiveLatest"
        ).collect()
    }
    assert fo["http://h/a"].source == "original"
    assert fo["http://h/a"].snapshot_iri is None  # live response carries no snapshot
    assert fo["http://h/a/"].source == "archivo-latest"
    assert fo["http://h/a/"].snapshot_iri == "snap:a:3"
    assert fo["http://h/c"].source == "not-found"
    assert fo["http://h/zz"].source == "unlinked"

    # status passes but Content-Type is not among the requested mimetypes
    mismatch = spark.createDataFrame(
        [("http://h/a", 200, "text/html", "text/turtle,application/n-triples;q=0.5")],
        "surface string, live_status int, live_content_type string, accept_header string",
    )
    fo2 = resolve_links(
        linked.join(mismatch, "surface"), snaps, "originalFailoverLiveLatest"
    ).collect()
    assert fo2[0].source == "archivo-latest" and fo2[0].snapshot_iri == "snap:a:3"

    with pytest.raises(ValueError):
        resolve_links(linked, snaps, "bogus")
    with pytest.raises(ValueError):
        resolve_links(linked, snaps, "timestampArchived", None)


# ---------------------------------------------------------------------------
# end-to-end on driver testdata
# ---------------------------------------------------------------------------


def test_extract_mentions_on_events(spark, events):
    tr = events_to_transcripts(events)
    m = extract_mentions(tr)
    assert m.count() == events.count()  # exactly one planted IRI per turn
    # deterministic mention ids (stable across partitionings)
    a = sorted(r.mention_id for r in m.collect())
    b = sorted(r.mention_id for r in extract_mentions(tr.repartition(7)).collect())
    assert a == b


def test_extract_triples_on_events(spark, events):
    tr = events_to_transcripts(events)
    t = extract_triples(tr)
    rows = t.collect()
    assert len(rows) == events.count()
    assert all(r.subj == "agent" and r.pred == "uses" for r in rows)


def test_archivo_api_url_assembly(spark):
    """C8: f"{archivo_api}?o={iri}&f={fmt}[&v={ts}]" (proxy_logic.py:251,271)."""
    import datetime as dt

    from kgtm.resolve import archivo_api_url_col, version_stamp_col

    df = spark.createDataFrame(
        [("http://h/a", "ttl", dt.datetime(2024, 1, 24, 21, 54, 15))],
        "ontology_iri string, format string, version_ts timestamp",
    )
    row = df.select(
        archivo_api_url_col().alias("latest_url"),
        archivo_api_url_col(version_stamp=version_stamp_col()).alias("pinned_url"),
    ).collect()[0]
    assert row.latest_url == "https://archivo.dbpedia.org/download?o=http://h/a&f=ttl"
    assert (
        row.pinned_url
        == "https://archivo.dbpedia.org/download?o=http://h/a&f=ttl&v=2024.01.24-215415"
    )
    # NULL format propagates (early-format-gate 500 analog)
    df2 = spark.createDataFrame([("http://h/a", None)], "ontology_iri string, format string")
    assert df2.select(archivo_api_url_col().alias("u")).collect()[0].u is None
