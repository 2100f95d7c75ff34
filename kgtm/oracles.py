"""DuckDB oracle SQL for the driver's correctness gate.

Each constant here is the ANSI-SQL twin of a Spark stage in kgtm.*; the
fragments compose the same way the DataFrame stages do. The planted-mention
text template and the inline dictionary/snapshot VALUES come from
kgtm.transcripts so both sides share one source of truth.
"""

from __future__ import annotations

from kgtm.transcripts import (
    DUCKDB_TRANSCRIPTS_CTE,
    duckdb_index_values,
    duckdb_snapshots_values,
)

IRI_SQL_REGEX = r"(https?://[A-Za-z0-9.\-]+(?:/[A-Za-z0-9./#_\-]*)?)"

# mention extraction + parse + ladder candidates + min-rung link, as CTEs.
# Ladder twin of kgtm/normalize.py:ladder_candidates (rungs 0-5; later rungs
# derive from the rstripped path, mirroring proxy_logic.py:108-141).
MENTION_LINK_CTES = f"""
  ontology_index_dict AS (
    SELECT * FROM {duckdb_index_values()}
  ),
  mentions AS (
    SELECT conv_id, turn_idx,
           regexp_extract(text, '{IRI_SQL_REGEX}', 1) AS surface
    FROM transcripts
  ),
  parsed AS (
    SELECT conv_id, turn_idx, surface,
           regexp_extract(surface, '^https?://([^/]*)', 1) AS host,
           regexp_replace(regexp_replace(surface, '^https?://', ''), '^[^/]*', '') AS path
    FROM mentions WHERE surface != ''
  ),
  norm AS (
    SELECT *, string_split(stripped, '/') AS parts
    FROM (
      SELECT *, CASE WHEN path LIKE '%/' THEN rtrim(path, '/') ELSE path END AS stripped
      FROM parsed
    )
  ),
  cands AS (
              SELECT *, 0 AS rung, path AS cand FROM norm
    UNION ALL SELECT *, 1, stripped FROM norm
    UNION ALL SELECT *, 2, array_to_string(parts[1:greatest(len(parts)-1,0)], '/') FROM norm
    UNION ALL SELECT *, 3, array_to_string(parts[1:greatest(len(parts)-1,0)], '/') || '/' FROM norm
    UNION ALL SELECT *, 4, array_to_string(parts[1:greatest(len(parts)-2,0)], '/') FROM norm
    UNION ALL SELECT *, 5, array_to_string(parts[1:greatest(len(parts)-2,0)], '/') || '/' FROM norm
  ),
  best AS (
    SELECT c.conv_id, c.turn_idx, c.surface,
           min(c.rung) AS rung,
           arg_min(d.ontology_iri, c.rung) AS ontology_iri,
           arg_min(c.cand, c.rung) AS canonical_path
    FROM cands c JOIN ontology_index_dict d
      ON c.host = d.host AND c.cand = d.path
    GROUP BY 1, 2, 3
  ),
  links AS (
    SELECT p.conv_id, p.turn_idx, p.surface,
           b.rung IS NOT NULL AS is_linked,
           b.rung, b.ontology_iri, b.canonical_path
    FROM parsed p LEFT JOIN best b
      ON p.conv_id = b.conv_id AND p.turn_idx = b.turn_idx AND p.surface = b.surface
  )
"""

LATEST_CTE = f"""
  latest AS (
    SELECT ontology_iri,
           max(version_ts) AS version_ts,
           arg_max(snapshot_iri, version_ts) AS snapshot_iri,
           arg_max(file_url, version_ts) AS file_url
    FROM {duckdb_snapshots_values()}
    GROUP BY ontology_iri
  )
"""


def q_turn_assembly() -> str:
    return f"""
      WITH {DUCKDB_TRANSCRIPTS_CTE}
      SELECT conv_id, count(*) AS n_turns,
             string_agg(text, chr(10) ORDER BY turn_idx) AS conv_text
      FROM transcripts GROUP BY conv_id
    """


def q_mention_hosts() -> str:
    return f"""
      WITH {DUCKDB_TRANSCRIPTS_CTE}, {MENTION_LINK_CTES}
      SELECT host, count(*) AS n_mentions
      FROM parsed GROUP BY host
    """


def q_ladder_linking() -> str:
    return f"""
      WITH {DUCKDB_TRANSCRIPTS_CTE}, {MENTION_LINK_CTES}
      SELECT is_linked, rung, ontology_iri, canonical_path,
             count(*) AS n_mentions
      FROM links GROUP BY 1, 2, 3, 4
    """


def q_version_latest() -> str:
    return f"""
      WITH {LATEST_CTE}
      SELECT ontology_iri, version_ts, snapshot_iri, file_url FROM latest
    """


def q_version_asof(pin: str = "2024-07-01 00:00:00") -> str:
    return f"""
      SELECT ontology_iri,
             max(version_ts) AS version_ts,
             arg_max(snapshot_iri, version_ts) AS snapshot_iri,
             arg_max(file_url, version_ts) AS file_url
      FROM {duckdb_snapshots_values()}
      WHERE version_ts <= TIMESTAMP '{pin}'
      GROUP BY ontology_iri
    """


def q_resolution_outcomes() -> str:
    return f"""
      WITH {DUCKDB_TRANSCRIPTS_CTE}, {MENTION_LINK_CTES}, {LATEST_CTE}
      SELECT CASE WHEN NOT l.is_linked THEN 'unlinked'
                  WHEN t.snapshot_iri IS NULL THEN 'not-found'
                  ELSE 'archivo-latest' END AS source,
             l.ontology_iri, t.snapshot_iri,
             count(*) AS n_mentions
      FROM links l LEFT JOIN latest t USING (ontology_iri)
      GROUP BY 1, 2, 3
    """


def q_flagship_triples() -> str:
    # SVO twin: on the planted template the extractor yields exactly
    # ('agent', 'uses', <iri>) per turn; the oracle re-derives it by regex.
    return f"""
      WITH {DUCKDB_TRANSCRIPTS_CTE}, {MENTION_LINK_CTES}, {LATEST_CTE}
      SELECT l.conv_id,
             'agent' AS subj,
             'uses' AS pred,
             coalesce(l.ontology_iri, l.surface) AS obj,
             CAST(NULL AS VARCHAR) AS subj_snapshot_iri,
             CASE WHEN l.is_linked THEN t.snapshot_iri END AS obj_snapshot_iri,
             CASE WHEN l.is_linked THEN 'archivo-latest' ELSE 'unlinked' END AS source
      FROM links l LEFT JOIN latest t USING (ontology_iri)
    """


# Accept negotiation: golden expected pairs (oracle = expected-output VALUES).
# Sources: /root/reference/tests/test_utils.py:16-98 plus tie/precedence edge
# cases derived from utils.py:103-121 semantics.
ACCEPT_CASES: list[tuple[str, str | None]] = [
    ("application/rdf+xml,text/turtle;q=0.9,*/*;q=0.8", "owl"),
    ("application/json", None),
    ("text/turtle", "ttl"),
    ("application/n-triples;q=0.5,text/turtle;q=0.5", "nt"),
    ("text/html", None),
    ("text/html;q=1.0,text/turtle;q=0.9", None),
    ("*/*", None),
    ("application/owl+xml;q=0.3,application/json", None),
    ("text/turtle;q=0.2,application/n-triples;q=0.9", "nt"),
    ("application/rdf+xml;q=0.9,application/owl+xml;q=0.9,text/plain", None),
    ("text/turtle , application/n-triples;q=1.0", "ttl"),
    ("application/owl+xml", "owl"),
    ("text/n3;q=0.8,text/turtle;q=0.7,application/rdf+xml;q=0.6", None),
]


def q_accept_negotiation() -> str:
    rows = ",\n      ".join(
        "('{}', {})".format(
            h.replace("'", "''"), "NULL" if f is None else f"'{f}'"
        )
        for h, f in ACCEPT_CASES
    )
    return f"""
      SELECT accept_header, CAST(expected_format AS VARCHAR) AS format
      FROM (VALUES
      {rows}) AS t(accept_header, expected_format)
    """
