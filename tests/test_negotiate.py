"""Accept-negotiation unit tests — golden pairs from the reference
(/root/reference/tests/test_utils.py:16-98) plus tie/edge cases, and Spark
column-expression parity with the pure spec."""

from __future__ import annotations

import pytest

from kgtm.negotiate import (
    effective_accept,
    format_from_accept_col,
    get_format_from_accept_header,
    get_mime_type,
    map_mime_to_format,
    parse_accept_header_with_priority,
    select_highest_priority_mime_from_archivo,
)
from kgtm.oracles import ACCEPT_CASES


def test_get_mime_type():
    assert get_mime_type("turtle") == "text/turtle"
    assert get_mime_type("ntriples") == "application/n-triples"
    assert get_mime_type("rdfxml") == "application/rdf+xml"
    assert get_mime_type("htmldocu") == "text/html"
    assert get_mime_type("unknown") == "text/turtle"  # default (utils.py:45)


def test_map_mime_to_format():
    assert map_mime_to_format("application/rdf+xml") == "owl"
    assert map_mime_to_format("application/owl+xml") == "owl"
    assert map_mime_to_format("text/turtle") == "ttl"
    assert map_mime_to_format("application/n-triples") == "nt"
    assert map_mime_to_format("text/html") is None
    assert map_mime_to_format(None) is None


def test_parse_accept_header_with_priority():
    # browser-style header, q-desc ordering (test_utils.py:47-59)
    parsed = parse_accept_header_with_priority(
        "text/html,application/xhtml+xml,application/xml;q=0.9,*/*;q=0.8"
    )
    assert parsed[0] == ("text/html", 1.0)
    assert parsed[1] == ("application/xhtml+xml", 1.0)
    assert parsed[2] == ("application/xml", 0.9)
    assert parsed[3] == ("*/*", 0.8)
    assert parse_accept_header_with_priority("") == []
    assert parse_accept_header_with_priority(None) == []


def test_select_highest_priority_tie_keeps_original_order():
    # among equal-q entries the FIRST supported one wins (utils.py:103-121)
    assert (
        select_highest_priority_mime_from_archivo(
            [("application/n-triples", 0.5), ("text/turtle", 0.5)]
        )
        == "application/n-triples"
    )
    # only max-q entries are considered at all
    assert (
        select_highest_priority_mime_from_archivo(
            [("text/html", 1.0), ("text/turtle", 0.9)]
        )
        is None
    )
    assert select_highest_priority_mime_from_archivo([]) is None


@pytest.mark.parametrize("header,expected", ACCEPT_CASES)
def test_format_from_accept_golden(header, expected):
    assert get_format_from_accept_header(header) == expected


def test_effective_accept_branches():
    # skip when original + no patch (utils.py:66-70)
    assert effective_accept("text/html", "turtle", "default", False, "original") == "text/html"
    # no accept → set (utils.py:81-85)
    assert effective_accept(None, "turtle", "default") == "text/turtle"
    # */* → set (utils.py:86-92)
    assert effective_accept("*/*", "ntriples", "default") == "application/n-triples"
    # >1 entries + mime present + enforcedPriority → set (utils.py:93-98)
    assert (
        effective_accept("text/turtle;q=0.2,text/html", "turtle", "enforcedPriority")
        == "text/turtle"
    )
    # same but default precedence → unchanged
    assert (
        effective_accept("text/turtle;q=0.2,text/html", "turtle", "default")
        == "text/turtle;q=0.2,text/html"
    )
    # always → set (utils.py:99-100)
    assert effective_accept("application/json", "rdfxml", "always") == "application/rdf+xml"


def test_spark_negotiation_matches_pure(spark):
    df = spark.createDataFrame([(h,) for h, _ in ACCEPT_CASES], "accept_header string")
    got = {
        r.accept_header: r.fmt
        for r in df.select(
            "accept_header", format_from_accept_col("accept_header").alias("fmt")
        ).collect()
    }
    for header, expected in ACCEPT_CASES:
        assert got[header] == expected, header


def test_parsed_accept_col_structure(spark):
    from kgtm.negotiate import parsed_accept_col

    df = spark.createDataFrame(
        [("text/html,application/xml;q=0.9,*/*;q=0.8",)], "accept_header string"
    )
    arr = df.select(parsed_accept_col("accept_header").alias("a")).collect()[0].a
    assert [(e.mime, e.q) for e in arr] == [
        ("text/html", 1.0),
        ("application/xml", 0.9),
        ("*/*", 0.8),
    ]
