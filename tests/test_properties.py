"""Property-based tests (hypothesis) for the pure-function specs.

These run without Spark — they pin the *semantics* the column expressions
are tested against in the parity tests.
"""

from __future__ import annotations

from hypothesis import example, given, settings
from hypothesis import strategies as st

from kgtm.negotiate import (
    ARCHIVO_MIMETYPES,
    get_format_from_accept_header,
    parse_accept_header_with_priority,
    select_highest_priority_mime_from_archivo,
)
from kgtm.normalize import ladder_candidates, resolve_membership, split_iri

# --------------------------------------------------------------------------
# normalize
# --------------------------------------------------------------------------

path_segments = st.lists(
    st.text(alphabet="abcdefghij0123456789_-", min_size=1, max_size=8),
    min_size=0,
    max_size=5,
)


@st.composite
def paths(draw):
    segs = draw(path_segments)
    trailing = draw(st.booleans())
    p = "/" + "/".join(segs) if segs else ""
    if p and trailing:
        p += "/"
    return p


@given(paths())
def test_ladder_rungs_ordered_and_bounded(p):
    cands = ladder_candidates(p)
    rungs = [r for r, _ in cands]
    assert rungs == sorted(rungs)
    assert len(cands) <= 6
    if p == "":
        # path-less: single host-only candidate, marked None
        assert cands == [(0, None)]
        return
    # rung 0 is always the original path
    assert cands[0] == (0, p)
    # every candidate is a prefix-ish reduction: no candidate is longer than
    # the original except by a single trailing slash
    for _, c in cands:
        assert len(c) <= len(p) + 1


@given(paths())
def test_ladder_first_hit_wins_is_min_rung(p):
    cands = ladder_candidates(p)
    # membership set = exactly one candidate → resolve returns that rung
    for rung, cand in cands:
        index = {("h", cand)}
        ok, canonical, got_rung = resolve_membership("h", p, index)
        assert ok
        if p == "":
            # host-only match: no canonical write-back (proxy_logic.py:100-101)
            assert canonical is None and got_rung == 0
            continue
        assert canonical == cand
        # the returned rung is the FIRST rung whose cand equals this value
        first = min(r for r, c in cands if c == cand)
        assert got_rung == first


@given(
    st.text(alphabet="abcdefghij.:/#-", min_size=0, max_size=30),
)
def test_split_iri_total(s):
    scheme, host, path, frag = split_iri(s)
    # never raises; fragment never contains '#'-prefix remnants in path
    assert "#" not in path
    # reassembly covers the input length (no characters invented)
    assert len(scheme) + len(host) + len(path) + len(frag) <= len(s) + 1


@given(st.text(alphabet="abcXYZ019/._-", min_size=1, max_size=20))
def test_split_iri_roundtrip_on_http(hostpath):
    iri = "http://" + hostpath
    scheme, host, path, frag = split_iri(iri)
    assert scheme == "http"
    assert iri == f"{scheme}://{host}{path}" + (f"#{frag}" if frag else "")


# --------------------------------------------------------------------------
# negotiate
# --------------------------------------------------------------------------

mimes = st.sampled_from(
    ARCHIVO_MIMETYPES + ["text/html", "application/json", "*/*", "image/png"]
)
qs = st.sampled_from([0.1, 0.2, 0.5, 0.8, 0.9, 1.0])


@given(st.lists(st.tuples(mimes, qs), min_size=0, max_size=6))
@settings(max_examples=200)
def test_parse_sorts_by_q_desc_stable(entries):
    header = ",".join(
        m if q == 1.0 else f"{m};q={q}" for m, q in entries
    )
    parsed = parse_accept_header_with_priority(header)
    got_qs = [q for _, q in parsed]
    assert got_qs == sorted(got_qs, reverse=True)
    # stability: among equal q, original order preserved
    for q in set(got_qs):
        mine = [m for m, qq in parsed if qq == q]
        orig = [m for m, qq in entries if qq == q]
        assert mine == orig


@given(st.lists(st.tuples(mimes, qs), min_size=1, max_size=6))
@settings(max_examples=200)
def test_select_considers_only_max_q(entries):
    got = select_highest_priority_mime_from_archivo(entries)
    maxq = max(q for _, q in entries)
    maxq_supported = [m for m, q in entries if q == maxq and m in ARCHIVO_MIMETYPES]
    assert got == (maxq_supported[0] if maxq_supported else None)


@given(st.lists(st.tuples(mimes, qs), min_size=0, max_size=6))
@settings(max_examples=200)
def test_format_total_and_in_range(entries):
    header = ",".join(f"{m};q={q}" for m, q in entries)
    fmt = get_format_from_accept_header(header)
    assert fmt in (None, "owl", "ttl", "nt")


# --------------------------------------------------------------------------
# round-2 pure functions
# --------------------------------------------------------------------------

_accept_texts = st.text(alphabet="abct/;=.,0189* ", max_size=40)


@given(
    st.one_of(st.none(), _accept_texts),
    st.sampled_from(["turtle", "ntriples", "rdfxml", "htmldocu"]),
    st.sampled_from(["default", "enforcedPriority", "always"]),
)
def test_effective_accept_total_and_closed(accept, fmt, precedence):
    """effective_accept never raises and returns either the original header
    or the config format's mime (utils.py:60-100 — no third outcome)."""
    from kgtm.negotiate import effective_accept, get_mime_type

    out = effective_accept(accept, fmt, precedence)
    assert out == accept or out == get_mime_type(fmt)
    if precedence == "always":
        assert out == get_mime_type(fmt)


@given(st.text(max_size=400))
def test_map_error_to_category_total(name):
    from kgtm.taxonomy import REFERENCE_CATEGORIES, map_error_to_category

    assert map_error_to_category(name) in REFERENCE_CATEGORIES
    assert map_error_to_category(name, name) in REFERENCE_CATEGORIES


@given(st.lists(st.text(alphabet="lineabc 0123", max_size=20), max_size=60))
@example(lines=[""] * 19 + ["0", "", ""])  # tail ending in an empty line
def test_format_error_message_structure(lines):
    from kgtm.metrics import format_error_message

    msg = "\n".join(lines)
    out = format_error_message(msg)
    # The implementation (and the reference, parse_ontologies.py:20-24)
    # round-trips through str.splitlines(), which drops a trailing empty
    # line — so the oracle must be msg.splitlines(), not the pre-join list,
    # and the expected TAIL must take the same join/splitlines round-trip
    # (a tail whose last line is empty loses it in `out` as well).
    msg_lines = msg.splitlines()
    if len(msg_lines) <= 20:
        assert out == msg
    else:
        out_lines = out.splitlines()
        assert out_lines[:10] == msg_lines[:10]
        expected_tail = "\n".join(msg_lines[-10:]).splitlines()
        assert out_lines[len(out_lines) - len(expected_tail):] == expected_tail
        assert "............" in out


@given(st.lists(st.text(alphabet="the qickbrownfx lazydogs ", max_size=60), max_size=8))
@settings(deadline=None)
def test_winnow_and_langid_total_and_deterministic(texts):
    import pandas as pd

    from kgtm.textstats import LANG_SAMPLES, lang_id_trigram_series, winnow_fingerprint_series

    s = pd.Series(texts, dtype="object")
    a, b = winnow_fingerprint_series(s), winnow_fingerprint_series(s)
    assert a.tolist() == b.tolist()
    assert all(isinstance(v, int) for v in a.tolist())

    langs = lang_id_trigram_series(s).tolist()
    allowed = set(LANG_SAMPLES) | {"und"}
    assert all(v in allowed for v in langs)
