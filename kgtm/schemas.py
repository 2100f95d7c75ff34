"""Fixed, code-defined schemas for every table in the pipeline.

The reference is row-oriented with dataclass/enum schemas and no inference
anywhere (SURVEY.md §1); we mirror that discipline with explicit StructTypes.

Reference ancestry:
  - transcripts       ← the request record (proxy_wrapper.py:8-62) lifted per
                        BASELINE.json input_hint
  - ontology_index    ← ARCHIVO_PARSED_URLS (download_archivo_urls.py:13,119-127)
  - ontology_snapshots← tests/dependency.ttl:1-25 + Archivo API URL scheme
                        (proxy_logic.py:251,271)
  - resolution struct ← the response record + mock responses
                        (mock_responses.py:4-38)
  - metrics           ← download_log.json record
                        (experiments/download_ontologies.py:53-146)
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# Exactly per BASELINE.json input_hint.
TRANSCRIPTS_SCHEMA = StructType(
    [
        StructField("conv_id", StringType(), False),
        StructField("turn_idx", IntegerType(), False),
        StructField("role", StringType(), True),
        StructField("text", StringType(), True),
        StructField("tool", StringType(), True),
        StructField("ts", TimestampType(), True),
    ]
)

# The Archivo-dictionary analog (broadcast side).
ONTOLOGY_INDEX_SCHEMA = StructType(
    [
        StructField("ontology_iri", StringType(), False),
        StructField("host", StringType(), False),
        StructField("path", StringType(), False),
        StructField("iri_type", StringType(), True),  # hash | slash | term
    ]
)

# The versioned-snapshot table (the "time machine" core).
ONTOLOGY_SNAPSHOTS_SCHEMA = StructType(
    [
        StructField("ontology_iri", StringType(), False),
        StructField("version_ts", TimestampType(), False),
        StructField("snapshot_iri", StringType(), False),
        StructField("file_url", StringType(), False),
        StructField("deps", ArrayType(StringType()), True),
    ]
)

# One detected mention (pre-linking).
MENTION_SCHEMA = StructType(
    [
        StructField("conv_id", StringType(), False),
        StructField("turn_idx", IntegerType(), False),
        StructField("mention_id", LongType(), False),
        StructField("surface", StringType(), False),
        StructField("scheme", StringType(), True),
        StructField("host", StringType(), True),
        StructField("path", StringType(), True),
        StructField("frag", StringType(), True),
    ]
)

# Extracted (pre-canonicalization) triple.
RAW_TRIPLE_SCHEMA = StructType(
    [
        StructField("conv_id", StringType(), False),
        StructField("turn_idx", IntegerType(), False),
        StructField("subj", StringType(), False),
        StructField("pred", StringType(), False),
        StructField("obj", StringType(), False),
        StructField("conf", DoubleType(), True),
    ]
)

# Final materialized triple: every term resolved to a versioned snapshot IRI
# where linkable.
TRIPLE_SCHEMA = StructType(
    [
        StructField("conv_id", StringType(), False),
        StructField("subj", StringType(), False),
        StructField("pred", StringType(), False),
        StructField("obj", StringType(), False),
        StructField("subj_snapshot_iri", StringType(), True),
        StructField("obj_snapshot_iri", StringType(), True),
        StructField("source", StringType(), True),  # original|archivo-latest|archivo-timestamp|denied|unlinked
    ]
)

# Per-(partition, stage) lineage/metrics row, one per unit of resumable work
# (ancestor: the download-log record, download_ontologies.py:104-146).
METRICS_SCHEMA = StructType(
    [
        StructField("partition_id", IntegerType(), False),
        StructField("stage", StringType(), False),
        StructField("n_rows_in", LongType(), True),
        StructField("n_rows_out", LongType(), True),
        StructField("n_triples", LongType(), True),
        StructField("duration_s", DoubleType(), True),
        StructField(
            "error",
            StructType(
                [
                    StructField("type", StringType(), True),
                    StructField("message", StringType(), True),
                    StructField("chain", StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

LINKED_MENTION_SCHEMA = StructType(
    [
        StructField("mention_id", LongType(), False),
        StructField("surface", StringType(), False),
        StructField("is_linked", BooleanType(), False),
        StructField("ontology_iri", StringType(), True),
        StructField("canonical_path", StringType(), True),
        StructField("rung", IntegerType(), True),
    ]
)
