"""The flagship end-to-end pipeline.

transcripts → mention detection → SVO triple extraction → ladder linking →
versioned-snapshot resolution → final triples, with per-stage metrics.

This is the batch lift of the reference's request lifecycle (SURVEY.md §3.1):
parse → deny-gate → membership ladder → negotiation → version dispatch →
response, re-planned as one declarative DataFrame DAG so Catalyst handles
filter ordering and the dictionary/snapshot joins broadcast.
"""

from __future__ import annotations

import datetime as dt
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kgtm.extract import extract_mentions, extract_triples
from kgtm.link import link_mentions
from kgtm.resolve import resolve_links


@dataclass
class PipelineConfig:
    """Job config — the batch analog of the reference Config dataclass
    (/root/reference/ontologytimemachine/utils/config.py:88-101)."""

    onto_version: str = "latestArchived"
    pin_ts: dt.datetime | None = None
    restricted_access: bool = False
    onto_format: str = "turtle"
    precedence: str = "default"
    patch_accept_upstream: bool = False
    n_salt: int = 16
    extra: dict = field(default_factory=dict)


def build_triples(
    transcripts: DataFrame,
    ontology_index: DataFrame,
    ontology_snapshots: DataFrame,
    config: PipelineConfig | None = None,
) -> DataFrame:
    """Emit canonicalized (conv_id, subj, pred, obj, *_snapshot_iri, source).

    Plan shape (one scan of transcripts feeds both extractors; the linking
    side joins are broadcast; the only wide exchanges are the min-rung
    aggregation and the final subj/obj re-joins on mention surface):

      transcripts ──┬─ extract_mentions ─ link ─ resolve ─┐ (dim, broadcast)
                    └─ extract_triples ───────────────────┴─ left joins on
                                                             subj/obj surface
    """
    config = config or PipelineConfig()

    mentions = extract_mentions(transcripts)
    linked = link_mentions(mentions, ontology_index)
    resolved = resolve_links(
        linked, ontology_snapshots, config.onto_version, config.pin_ts
    )

    # surface → snapshot dim: distinct linked surfaces with their resolution.
    # Distinct surface count ≈ dictionary size × ladder variants — compact,
    # broadcastable; the triples fact side never shuffles for these joins.
    surface_dim = (
        resolved.filter(F.col("is_linked"))
        .groupBy("surface")
        .agg(
            F.min_by(
                F.struct("ontology_iri", "snapshot_iri", "source"), F.col("rung")
            ).alias("r")
        )
        .select(
            "surface",
            F.col("r.ontology_iri").alias("ontology_iri"),
            F.col("r.snapshot_iri").alias("snapshot_iri"),
            F.col("r.source").alias("source"),
        )
    )

    triples = extract_triples(transcripts)

    subj_dim = F.broadcast(
        surface_dim.select(
            F.col("surface").alias("s_surface"),
            F.col("ontology_iri").alias("subj_ontology_iri"),
            F.col("snapshot_iri").alias("subj_snapshot_iri"),
            F.col("source").alias("subj_source"),
        )
    )
    obj_dim = F.broadcast(
        surface_dim.select(
            F.col("surface").alias("o_surface"),
            F.col("ontology_iri").alias("obj_ontology_iri"),
            F.col("snapshot_iri").alias("obj_snapshot_iri"),
            F.col("source").alias("obj_source"),
        )
    )

    out = (
        triples.join(subj_dim, triples["subj"] == subj_dim["s_surface"], "left")
        .join(obj_dim, triples["obj"] == obj_dim["o_surface"], "left")
        .select(
            "conv_id",
            F.coalesce("subj_ontology_iri", "subj").alias("subj"),
            "pred",
            F.coalesce("obj_ontology_iri", "obj").alias("obj"),
            "subj_snapshot_iri",
            "obj_snapshot_iri",
            F.coalesce("obj_source", "subj_source", F.lit("unlinked")).alias("source"),
        )
    )
    if config.restricted_access:
        # Deny gate (proxy_logic.py:39-44): drop triples whose object IRI is
        # outside the dictionary under restrictedAccess.
        out = out.filter(
            ~(F.col("obj").startswith("http") & F.col("obj_snapshot_iri").isNull())
        )
    return out
