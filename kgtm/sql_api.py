"""Pure spark.sql() surface for the flagship pipeline.

Everything in kgtm is DataFrame-first; this module proves the SQL-first
equivalent works on the same engine (a user who lives in SQL can run the
whole resolution pipeline as one statement over temp views). The statement
is the Spark dialect of kgtm/oracles.py's DuckDB twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from kgtm.extract import IRI_REGEX

FLAGSHIP_SQL = f"""
WITH mentions AS (
  SELECT conv_id, turn_idx,
         regexp_extract(text, '({IRI_REGEX})', 1) AS surface
  FROM transcripts
),
parsed AS (
  SELECT conv_id, turn_idx, surface,
         regexp_extract(surface, '^https?://([^/]*)', 1) AS host,
         regexp_replace(regexp_replace(surface, '^https?://', ''), '^[^/]*', '') AS path
  FROM mentions WHERE surface != ''
),
norm AS (
  SELECT *, split(stripped, '/') AS parts
  FROM (
    SELECT *, CASE WHEN path LIKE '%/' THEN regexp_replace(path, '/+$', '')
                   ELSE path END AS stripped
    FROM parsed
  )
),
cands AS (
            SELECT conv_id, turn_idx, surface, host, 0 AS rung, path AS cand FROM norm
  UNION ALL SELECT conv_id, turn_idx, surface, host, 1, stripped FROM norm
  UNION ALL SELECT conv_id, turn_idx, surface, host, 2,
                   array_join(slice(parts, 1, greatest(size(parts)-1, 0)), '/') FROM norm
  UNION ALL SELECT conv_id, turn_idx, surface, host, 3,
                   array_join(slice(parts, 1, greatest(size(parts)-1, 0)), '/') || '/' FROM norm
  UNION ALL SELECT conv_id, turn_idx, surface, host, 4,
                   array_join(slice(parts, 1, greatest(size(parts)-2, 0)), '/') FROM norm
  UNION ALL SELECT conv_id, turn_idx, surface, host, 5,
                   array_join(slice(parts, 1, greatest(size(parts)-2, 0)), '/') || '/' FROM norm
),
best AS (
  SELECT c.conv_id, c.turn_idx, c.surface,
         min(c.rung) AS rung,
         min_by(d.ontology_iri, c.rung) AS ontology_iri
  FROM cands c JOIN ontology_index d
    ON c.host = d.host AND c.cand = d.path
  GROUP BY 1, 2, 3
),
links AS (
  SELECT p.conv_id, p.turn_idx, p.surface,
         b.rung IS NOT NULL AS is_linked, b.ontology_iri
  FROM parsed p LEFT JOIN best b
    ON p.conv_id = b.conv_id AND p.turn_idx = b.turn_idx AND p.surface = b.surface
),
latest AS (
  SELECT ontology_iri, max(version_ts) AS version_ts,
         max_by(snapshot_iri, version_ts) AS snapshot_iri
  FROM ontology_snapshots GROUP BY ontology_iri
)
SELECT l.conv_id,
       'agent' AS subj,
       'uses' AS pred,
       coalesce(l.ontology_iri, l.surface) AS obj,
       CAST(NULL AS STRING) AS subj_snapshot_iri,
       CASE WHEN l.is_linked THEN t.snapshot_iri END AS obj_snapshot_iri,
       CASE WHEN l.is_linked THEN 'archivo-latest' ELSE 'unlinked' END AS source
FROM links l LEFT JOIN latest t ON l.ontology_iri = t.ontology_iri
"""


def flagship_sql(
    spark: SparkSession,
    transcripts: DataFrame,
    ontology_index: DataFrame,
    ontology_snapshots: DataFrame,
) -> DataFrame:
    """Run the flagship as ONE SQL statement over temp views."""
    transcripts.createOrReplaceTempView("transcripts")
    ontology_index.createOrReplaceTempView("ontology_index")
    ontology_snapshots.createOrReplaceTempView("ontology_snapshots")
    return spark.sql(FLAGSHIP_SQL)
