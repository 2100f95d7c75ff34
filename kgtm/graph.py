"""Graph-shaped materializations over the triple store.

The north_rule's "graph materialize" leg beyond the flat triple table:
adjacency/degree views (what a KG consumer actually queries), dictionary
snapshot diffs (the A1 change-detection semantics lifted from file hash to
row set), and mention context windows (the provenance slice a KG curator
reads when auditing a triple).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def entity_degrees(triples: DataFrame) -> DataFrame:
    """Per-entity degree view: in/out degree, distinct out-predicates, and
    distinct conversations the entity appears in (EITHER role — a true
    distinct over the union, not a per-direction max).

    One exploded-role pass → ONE shuffle on entity (count_distinct runs as a
    partial-aggregatable expand under the same exchange).
    """
    roles = triples.select(
        F.col("subj").alias("entity"),
        F.lit(True).alias("is_out"),
        "pred",
        "conv_id",
    ).unionByName(
        triples.select(
            F.col("obj").alias("entity"),
            F.lit(False).alias("is_out"),
            "pred",
            "conv_id",
        )
    )
    return roles.groupBy("entity").agg(
        F.count(F.when(F.col("is_out"), 1)).alias("out_degree"),
        F.count(F.when(~F.col("is_out"), 1)).alias("in_degree"),
        F.count_distinct(F.when(F.col("is_out"), F.col("pred"))).alias("n_preds_out"),
        F.count_distinct("conv_id").alias("n_convs"),
    )


def adjacency_lists(triples: DataFrame, max_neighbors: int = 1000) -> DataFrame:
    """Per-subject sorted adjacency (pred, obj) list, capped and logged.

    The cap bounds row width for super-nodes (a hot entity with 10^8
    neighbors would otherwise build an unmanageable array state); truncation
    is recorded so consumers can tell capped rows apart.
    """
    return triples.groupBy("subj").agg(
        F.slice(
            F.array_sort(F.collect_list(F.struct("pred", "obj"))), 1, max_neighbors
        ).alias("neighbors"),
        F.count(F.lit(1)).alias("degree"),
        (F.count(F.lit(1)) > max_neighbors).alias("truncated"),
    )


def index_diff(old: DataFrame, new: DataFrame) -> DataFrame:
    """Dictionary snapshot diff: (change ∈ {added, removed}, ontology_iri).

    The row-set lift of the reference's SHA-256 file change detection
    (download_archivo_urls.py:41-46,65-74): instead of "something changed,
    reload everything", emit exactly what changed — the input to an
    incremental re-link of only affected mentions.
    """
    o = old.select("ontology_iri", "host", "path")
    n = new.select("ontology_iri", "host", "path")
    added = n.exceptAll(o).select(F.lit("added").alias("change"), "ontology_iri")
    removed = o.exceptAll(n).select(F.lit("removed").alias("change"), "ontology_iri")
    return added.unionByName(removed)


def mention_contexts(
    transcripts: DataFrame, linked: DataFrame, n_before: int = 1, n_after: int = 1
) -> DataFrame:
    """Provenance slice per linked mention: the turn text ± its neighbors.

    lag/lead over the conversation window — ONE shuffle on conv_id; the
    mention join is on (conv_id, turn_idx) and stays co-partitioned with it.
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    ctx = transcripts.select(
        "conv_id",
        "turn_idx",
        F.lag("text", n_before).over(w).alias("prev_text"),
        F.col("text").alias("turn_text"),
        F.lead("text", n_after).over(w).alias("next_text"),
    )
    return (
        linked.filter(F.col("is_linked"))
        .select("conv_id", "turn_idx", "surface", "ontology_iri")
        .join(ctx, ["conv_id", "turn_idx"])
    )
