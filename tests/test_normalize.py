"""Ladder + IRI-split unit tests (pure spec) and Spark parity.

Golden cases mirror the reference's iri_type taxonomy
(/root/reference/tests/archivo_test_IRIs.tsv: hash/slash/term) and the
first-hit-wins write-back (proxy_logic.py:103-141).
"""

from __future__ import annotations

import pytest

from kgtm.normalize import (
    candidate_paths_col,
    ladder_candidates,
    parse_iri_cols,
    resolve_membership,
    split_iri,
)


def test_split_iri_basic():
    assert split_iri("http://example.org/onto") == ("http", "example.org", "/onto", "")
    assert split_iri("https://example.org/onto/") == ("https", "example.org", "/onto/", "")
    assert split_iri("http://example.org/onto#Term") == ("http", "example.org", "/onto", "Term")
    assert split_iri("http://example.org") == ("http", "example.org", "", "")
    assert split_iri("example.org/x") == ("", "example.org", "/x", "")


def test_ladder_candidates_term_iri():
    # term IRI /vocab/Term under a slash-ontology /vocab/
    cands = ladder_candidates("/vocab/Term")
    assert cands == [
        (0, "/vocab/Term"),
        (1, "/vocab/Term"),
        (2, "/vocab"),
        (3, "/vocab/"),
        (4, ""),
        (5, "/"),
    ]


def test_ladder_candidates_trailing_slash_rebinds_later_rungs():
    # Reference rebinds request_path at the rstrip rung (proxy_logic.py:108-113):
    # parent of '/a/b/' must be '/a' (from the *stripped* '/a/b'), not '/a/b'.
    cands = dict(ladder_candidates("/a/b/"))
    assert cands[1] == "/a/b"
    assert cands[2] == "/a"
    assert cands[4] == ""


def test_ladder_candidates_pathless():
    # NULL candidate, distinct from a ladder-produced "" (see docstring)
    assert ladder_candidates("") == [(0, None)]


@pytest.mark.parametrize(
    "path,index,expect",
    [
        # rung 0 exact
        ("/onto", {("h", "/onto")}, (True, "/onto", 0)),
        # rung 1 rstrip
        ("/onto/", {("h", "/onto")}, (True, "/onto", 1)),
        # rung 2 parent (term IRI)
        ("/onto/Term", {("h", "/onto")}, (True, "/onto", 2)),
        # rung 3 parent + '/'
        ("/onto/Term", {("h", "/onto/")}, (True, "/onto/", 3)),
        # rung 4 grandparent
        ("/a/b/c", {("h", "/a")}, (True, "/a", 4)),
        # rung 5 grandparent + '/'
        ("/a/b/c", {("h", "/a/")}, (True, "/a/", 5)),
        # miss
        ("/nope", {("h", "/onto")}, (False, None, None)),
        # first-hit-wins when MULTIPLE rungs match different entries:
        # rung 0 entry must beat rung 2 entry
        ("/onto/Term", {("h", "/onto/Term"), ("h", "/onto")}, (True, "/onto/Term", 0)),
        # rung 2 beats rung 3 when both present
        ("/onto/Term", {("h", "/onto"), ("h", "/onto/")}, (True, "/onto", 2)),
    ],
)
def test_resolve_membership_ladder(path, index, expect):
    assert resolve_membership("h", path, index) == expect


def test_resolve_membership_hostonly():
    assert resolve_membership("h", "", {("h", "/x")}) == (True, None, 0)
    assert resolve_membership("g", "", {("h", "/x")})[0] is False


# ---------------------------------------------------------------------------
# Spark parity: the column expressions must equal the pure spec
# ---------------------------------------------------------------------------

PARITY_IRIS = [
    "http://example.org/onto",
    "https://example.org/onto/",
    "http://example.org/onto#Term",
    "http://example.org/a/b/c",
    "http://example.org",
    "http://sub.example.org/vocab/Term3",
]


def test_spark_matches_pure_spec(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(i,) for i in PARITY_IRIS], "surface string")
    parsed = df.select("surface", *parse_iri_cols("surface")).collect()
    for row in parsed:
        assert (row.scheme, row.host, row.path, row.frag) == split_iri(row.surface), row.surface

    cands = (
        df.select("surface", *parse_iri_cols("surface"))
        .select("surface", "path", F.explode(candidate_paths_col("path")).alias("c"))
        .collect()
    )
    by_surface: dict[str, list[tuple[int, str]]] = {}
    for row in cands:
        by_surface.setdefault(row.surface, []).append((row.c.rung, row.c.cand_path))
    for iri in PARITY_IRIS:
        _, _, path, _ = split_iri(iri)
        assert sorted(by_surface[iri]) == sorted(ladder_candidates(path)), iri
