"""Driver contract for the spark-graft builder (PySpark target).

entry()     — flagship KG-construction pipeline on sf0.001.
queries()   — one callable per implemented operator (SURVEY.md §2).
oracle_sql()— DuckDB twins (kgtm.oracles) for the correctness gate.
"""

from __future__ import annotations

import datetime as dt
import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parent))

from kgtm import oracles
from kgtm.assemble import assemble_conversations
from kgtm.extract import extract_mentions
from kgtm.link import link_mentions
from kgtm.negotiate import format_from_accept_col
from kgtm.pipeline import PipelineConfig, build_triples
from kgtm.resolve import asof_snapshots, latest_snapshots, resolve_links
from kgtm.transcripts import (
    events_to_transcripts,
    ontology_index_df,
    ontology_snapshots_df,
)

ASOF_PIN = dt.datetime(2024, 7, 1)


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def _transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return events_to_transcripts(_events(spark, sf_dir))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: transcripts → mentions → triples → link → resolve (sf0.001)."""
    tr = _transcripts(spark, "/root/testdata/sf0.001")
    return build_triples(
        tr,
        ontology_index_df(spark),
        ontology_snapshots_df(spark),
        PipelineConfig(onto_version="latestArchived"),
    )


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------


def _q_turn_assembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    return assemble_conversations(_transcripts(spark, sf_dir))


def _q_mention_hosts(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = extract_mentions(_transcripts(spark, sf_dir))
    return m.groupBy("host").agg(F.count(F.lit(1)).alias("n_mentions"))


def _q_ladder_linking(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = extract_mentions(_transcripts(spark, sf_dir))
    linked = link_mentions(m, ontology_index_df(spark))
    return linked.groupBy("is_linked", "rung", "ontology_iri", "canonical_path").agg(
        F.count(F.lit(1)).alias("n_mentions")
    )


def _q_version_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    return latest_snapshots(ontology_snapshots_df(spark)).select(
        "ontology_iri", "version_ts", "snapshot_iri", "file_url"
    )


def _q_version_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    return asof_snapshots(ontology_snapshots_df(spark), ASOF_PIN).select(
        "ontology_iri", "version_ts", "snapshot_iri", "file_url"
    )


def _q_resolution_outcomes(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = extract_mentions(_transcripts(spark, sf_dir))
    linked = link_mentions(m, ontology_index_df(spark))
    resolved = resolve_links(linked, ontology_snapshots_df(spark), "latestArchived")
    return resolved.groupBy("source", "ontology_iri", "snapshot_iri").agg(
        F.count(F.lit(1)).alias("n_mentions")
    )


def _q_flagship_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    return build_triples(
        _transcripts(spark, sf_dir),
        ontology_index_df(spark),
        ontology_snapshots_df(spark),
    )


def _q_accept_negotiation(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = spark.createDataFrame(
        [(h,) for h, _ in oracles.ACCEPT_CASES], "accept_header string"
    )
    return df.select(
        "accept_header", format_from_accept_col("accept_header").alias("format")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "turn_assembly": _q_turn_assembly,
        "mention_hosts": _q_mention_hosts,
        "ladder_linking": _q_ladder_linking,
        "version_latest": _q_version_latest,
        "version_asof": _q_version_asof,
        "resolution_outcomes": _q_resolution_outcomes,
        "flagship_triples": _q_flagship_triples,
        "accept_negotiation": _q_accept_negotiation,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "turn_assembly": oracles.q_turn_assembly(),
        "mention_hosts": oracles.q_mention_hosts(),
        "ladder_linking": oracles.q_ladder_linking(),
        "version_latest": oracles.q_version_latest(),
        "version_asof": oracles.q_version_asof(),
        "resolution_outcomes": oracles.q_resolution_outcomes(),
        "flagship_triples": oracles.q_flagship_triples(),
        "accept_negotiation": oracles.q_accept_negotiation(),
    }
