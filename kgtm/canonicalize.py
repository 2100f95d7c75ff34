"""Canonicalization: connected components by min-label propagation.

Generalizes the reference's "first ladder hit canonicalizes the path"
write-back (/root/reference/ontologytimemachine/utils/proxy_logic.py:111-141)
to a transitive closure: surface forms that link to the same ontology — or to
each other through shared mentions — collapse to one canonical id (the
component's minimum label).

Algorithm: plain min-label propagation over an undirected edge list
(large-star/small-star would halve iterations on pathological chains; for
entity-resolution graphs components are star-shaped and shallow, so plain
propagation converges in 2-3 rounds).

Scale notes (SURVEY.md §4 item 2):
  * each iteration is one shuffle (edges ⋈ labels on src, then min per dst);
    edges are canonicalized to both directions once, up front.
  * ``localCheckpoint`` every iteration truncates lineage — without it the
    plan doubles per round and the driver OOMs planning round ~15.
  * convergence test is an aggregate (sum of label changes), not a collect
    of labels.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 20,
) -> DataFrame:
    """edges(src,dst) → (node, component) with component = min node id.

    Node ids must be orderable (string or numeric). Returns every node that
    appears in any edge. Self-loops are fine; duplicate edges are deduped.
    """
    # Undirected: materialize both directions once, dedupe.
    fwd = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    und = fwd.union(fwd.select(F.col("b").alias("a"), F.col("a").alias("b"))).distinct()
    und = und.localCheckpoint(eager=True)

    labels = (
        und.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint(eager=True)
    )

    converged = False
    for _ in range(max_iter):
        # Candidate labels flowing across edges: neighbor's current component.
        prop = (
            und.join(labels, und["a"] == labels["node"], "inner")
            .select(F.col("b").alias("node"), F.col("component"))
        )
        new_labels = (
            labels.select("node", "component")
            .union(prop)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            converged = True
            break
    if not converged:
        # Min-label propagation needs O(diameter) rounds; a silent unconverged
        # return would split long-chain components. Callers with chain-shaped
        # graphs should use connected_components_star (O(log n) rounds).
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            "(component diameter exceeds max_iter); raise max_iter or use "
            "connected_components_star"
        )
    return labels


def connected_components_star(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 30,
) -> tuple[DataFrame, int]:
    """Two-phase large-star/small-star connected components (Kiveris et al.,
    "Connected Components in MapReduce and Beyond").

    Converges in O(log n) rounds regardless of graph DIAMETER — the scale
    option when components can be long chains (plain min-label propagation
    needs O(diameter) rounds). Returns ((node, component), n_rounds).

    large-star: per node u, attach every LARGER neighbor to
        m = min(Γ(u) ∪ {u});
    small-star: per node u, attach every neighbor ≤ u (and u) to m.
    Fixpoint: the edge set is a star forest rooted at component minima.
    """
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).filter(
        F.col("a") != F.col("b")
    )
    cur = e.distinct().localCheckpoint(eager=True)
    # keep every node visible even if its edges become self-loops later
    all_nodes = (
        e.select(F.col("a").alias("node"))
        .union(e.select(F.col("b").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )

    def neighborhood_min(und: DataFrame) -> DataFrame:
        return und.groupBy("u").agg(
            F.least(F.min("v"), F.first("u")).alias("m")
        )

    rounds = 0
    for _ in range(max_iter):
        rounds += 1
        # ---- large-star ----
        und = cur.select(F.col("a").alias("u"), F.col("b").alias("v")).union(
            cur.select(F.col("b").alias("u"), F.col("a").alias("v"))
        )
        mins = neighborhood_min(und)
        large = (
            und.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("a"), F.col("m").alias("b"))
            .distinct()
        )
        # ---- small-star ----
        und2 = large.select(
            F.greatest("a", "b").alias("u"), F.least("a", "b").alias("v")
        ).filter(F.col("u") != F.col("v"))
        mins2 = und2.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("m"))
        small = (
            und2.join(mins2, "u")
            .select(F.col("v").alias("a"), F.col("m").alias("b"))
            .union(mins2.select(F.col("u").alias("a"), F.col("m").alias("b")))
            .filter(F.col("a") != F.col("b"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        changed = (
            small.exceptAll(cur).limit(1).count() + cur.exceptAll(small).limit(1).count()
        )
        cur = small
        if changed == 0:
            break

    # star forest → labels; isolated-after-contraction nodes label themselves
    labels = cur.select(F.col("a").alias("node"), F.col("b").alias("component"))
    return (
        all_nodes.join(labels, "node", "left").select(
            "node", F.coalesce("component", "node").alias("component")
        ),
        rounds,
    )


def canonical_entities(linked: DataFrame) -> DataFrame:
    """Collapse surface forms via shared ontology links.

    Edges: surface ↔ ontology_iri for linked mentions. Two different surface
    forms of the same ontology end up in one component whose canonical id is
    the min label; by construction ontology IRIs sort deterministically, and
    the component label for a linked cluster is stable across runs.

    Returns (surface, canonical_id).
    """
    edges = (
        linked.filter(F.col("is_linked"))
        .select(F.col("surface").alias("src"), F.col("ontology_iri").alias("dst"))
        .distinct()
    )
    # O(log n)-round star variant: entity-resolution graphs are usually
    # shallow, but surface↔ontology chains through shared mentions can get
    # long — star converges regardless of diameter at the same per-round cost.
    comps, _ = connected_components_star(edges)
    return (
        linked.select("surface")
        .distinct()
        .join(comps, F.col("surface") == F.col("node"), "left")
        .select(
            "surface",
            F.coalesce(F.col("component"), F.col("surface")).alias("canonical_id"),
        )
    )
