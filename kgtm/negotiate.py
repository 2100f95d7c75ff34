"""Accept-header format negotiation.

Re-expresses the reference's negotiation chain (/root/reference/
ontologytimemachine/utils/utils.py):

  parse_accept_header_with_priority (utils.py:124-133)  — "mime;q=x" list,
      q defaults 1.0, ordered by q descending (stable for ties, i.e. original
      header order preserved among equal-q entries — werkzeug behavior)
  select_highest_priority_mime_from_archivo (utils.py:103-121) — among the
      max-q entries in original order, first whose mime is supported
  map_mime_to_format (utils.py:48-57) — mime → {owl, ttl, nt}, None otherwise
  get_mime_type (utils.py:35-45) — format → mime, default text/turtle
  get_format_from_accept_header (utils.py:136-157) — the composition
  set_onto_format_headers (utils.py:60-100) — 4-branch conditional Accept
      rewrite (pure CASE WHEN cascade in Spark)

Pure functions are the spec; ``format_from_accept_col`` is the single-column
Spark expression (higher-order functions — stays JVM-side, no UDF).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

ARCHIVO_MIMETYPES = [
    "application/rdf+xml",
    "application/owl+xml",
    "text/turtle",
    "application/n-triples",
]

FORMAT_TO_MIME = {
    "turtle": "text/turtle",
    "ntriples": "application/n-triples",
    "rdfxml": "application/rdf+xml",
    "htmldocu": "text/html",
}

MIME_TO_FORMAT = {
    "application/rdf+xml": "owl",
    "application/owl+xml": "owl",
    "text/turtle": "ttl",
    "application/n-triples": "nt",
}

PASSTHROUGH_STATUS_CODES = [100, 101, 102, 103, 200, 300, 301, 302, 303, 304, 307, 308, 451]

# ---------------------------------------------------------------------------
# Pure spec
# ---------------------------------------------------------------------------


def get_mime_type(fmt: str = "turtle") -> str:
    return FORMAT_TO_MIME.get(fmt, "text/turtle")


def map_mime_to_format(mime: str | None) -> str | None:
    return MIME_TO_FORMAT.get(mime) if mime else None


def parse_accept_header_with_priority(accept: str | None) -> list[tuple[str, float]]:
    """Parse "m1,m2;q=0.9" → [(mime, q)] sorted by q desc, stable for ties."""
    if not accept:
        return []
    entries: list[tuple[str, float]] = []
    for part in accept.split(","):
        part = part.strip()
        if not part:
            continue
        bits = part.split(";")
        mime = bits[0].strip()
        q = 1.0
        for b in bits[1:]:
            b = b.strip()
            if b.startswith("q="):
                try:
                    q = float(b[2:])
                except ValueError:
                    q = 1.0
        entries.append((mime, q))
    # Stable sort by q descending keeps header order among equal-q entries.
    return sorted(entries, key=lambda x: -x[1])


def select_highest_priority_mime_from_archivo(
    mime_list: list[tuple[str, float]],
) -> str | None:
    if not mime_list:
        return None
    highest = max(q for _, q in mime_list)
    for mime, q in mime_list:
        if q == highest and mime in ARCHIVO_MIMETYPES:
            return mime
    return None


def get_format_from_accept_header(accept: str | None) -> str | None:
    if not accept:
        return None
    return map_mime_to_format(
        select_highest_priority_mime_from_archivo(
            parse_accept_header_with_priority(accept)
        )
    )


def effective_accept(
    accept: str | None,
    fmt: str,
    precedence: str,
    patch_accept_upstream: bool = False,
    onto_version: str = "latestArchived",
) -> str | None:
    """The 4-branch conditional Accept rewrite (utils.py:60-100)."""
    if onto_version == "original" and not patch_accept_upstream:
        return accept
    mime = get_mime_type(fmt)
    entries = [m for m, _ in parse_accept_header_with_priority(accept)]
    if not entries and precedence in ("default", "enforcedPriority"):
        return mime
    if len(entries) == 1 and entries[0] == "*/*" and precedence in ("default", "enforcedPriority"):
        return mime
    if len(entries) > 1 and mime in entries and precedence == "enforcedPriority":
        return mime
    if precedence == "always":
        return mime
    return accept


# ---------------------------------------------------------------------------
# Spark column expressions
# ---------------------------------------------------------------------------

_SUPPORTED_ARR = "array('application/rdf+xml','application/owl+xml','text/turtle','application/n-triples')"


def parsed_accept_col(accept_name: str) -> Column:
    """array<struct<mime:string,q:double,pos:int>> sorted by q desc (stable)."""
    expr = f"""
      array_sort(
        transform(
          filter(transform(split({accept_name}, ','), s -> trim(s)), s -> s != ''),
          (s, i) -> struct(
            trim(split(s, ';')[0]) AS mime,
            coalesce(try_cast(regexp_extract(s, 'q=([0-9.]+)', 1) AS double), 1.0D) AS q,
            i AS pos)),
        (l, r) -> CASE WHEN l.q > r.q THEN -1 WHEN l.q < r.q THEN 1
                       WHEN l.pos < r.pos THEN -1 WHEN l.pos > r.pos THEN 1 ELSE 0 END)
    """
    return F.expr(expr)


def effective_accept_col(
    accept_name: str,
    fmt: str,
    precedence: str,
    patch_accept_upstream: bool = False,
    onto_version: str = "latestArchived",
) -> Column:
    """The 4-branch conditional Accept rewrite (utils.py:60-100) as ONE
    CASE WHEN cascade. Config is job-level → folded at plan time."""
    if onto_version == "original" and not patch_accept_upstream:
        return F.col(accept_name)
    mime = get_mime_type(fmt)
    entries = f"""
      transform(filter(transform(split({accept_name}, ','), s -> trim(s)), s -> s != ''),
                s -> trim(split(s, ';')[0]))
    """
    n = f"size({entries})"
    in_default_or_enforced = precedence in ("default", "enforcedPriority")
    cond_no_accept = (
        f"({accept_name} IS NULL OR {n} = 0)" if in_default_or_enforced else "false"
    )
    cond_star = (
        f"({n} = 1 AND get({entries}, 0) = '*/*')" if in_default_or_enforced else "false"
    )
    cond_enforced = (
        f"({n} > 1 AND array_contains({entries}, '{mime}'))"
        if precedence == "enforcedPriority"
        else "false"
    )
    cond_always = "true" if precedence == "always" else "false"
    return F.expr(
        f"""
        CASE WHEN {cond_no_accept} THEN '{mime}'
             WHEN {cond_star} THEN '{mime}'
             WHEN {cond_enforced} THEN '{mime}'
             WHEN {cond_always} THEN '{mime}'
             ELSE {accept_name}
        END
        """
    )


def accept_mimes_col(accept_name: str) -> Column:
    """array<string> of the requested mimetypes from an Accept header, in
    header order (the failover acceptance gate needs the mime SET only —
    proxy_logic.py:219-229 takes [x[0] for x in parsed])."""
    return F.expr(
        f"""
        transform(filter(transform(split({accept_name}, ','), s -> trim(s)),
                         s -> s != ''),
                  s -> trim(split(s, ';')[0]))
        """
    )


def live_acceptable_col(
    status_name: str, content_type_name: str, accept_name: str
) -> Column:
    """The failover acceptance gate (D3, proxy_logic.py:209-238): a live
    response is accepted iff

      status ∈ PASSTHROUGH_STATUS_CODES (utils.py:18-32)
      AND its Content-Type — pre-';' parameters, headers.get default ';' when
      absent (proxy_logic.py:223-225) — is among the requested mimetypes.

    The base mime is NOT trimmed — the reference takes .split(';')[0] raw, so
    'text/turtle ;charset=…' keeps its trailing space and fails the
    membership check (falling over to archived), and we match that exactly.
    """
    statuses = ", ".join(str(s) for s in PASSTHROUGH_STATUS_CODES)
    mime_base = f"split(coalesce({content_type_name}, ';'), ';')[0]"
    return F.expr(
        f"array_contains(array({statuses}), {status_name})"
    ) & F.array_contains(accept_mimes_col(accept_name), F.expr(mime_base))


def format_from_accept_col(accept_name: str) -> Column:
    """Full negotiation as ONE column expression over a column name.

    parse → max-q → first supported among max-q in original order → format.
    NULL for missing/unsupported (the 406/500 analog, proxy_logic.py:173-176).
    """
    parsed = f"""
      filter(transform(split({accept_name}, ','), s -> trim(s)), s -> s != '')
    """
    entries = f"""
      transform({parsed}, (s, i) -> struct(
          trim(split(s, ';')[0]) AS mime,
          coalesce(try_cast(regexp_extract(s, 'q=([0-9.]+)', 1) AS double), 1.0D) AS q,
          i AS pos))
    """
    return F.expr(
        f"""
      CASE get(filter({entries},
                      x -> x.q = array_max(transform({entries}, y -> y.q))
                           AND array_contains({_SUPPORTED_ARR}, x.mime)), 0).mime
        WHEN 'application/rdf+xml' THEN 'owl'
        WHEN 'application/owl+xml' THEN 'owl'
        WHEN 'text/turtle' THEN 'ttl'
        WHEN 'application/n-triples' THEN 'nt'
        ELSE NULL
      END
    """
    )
