"""Entity linking: ladder-candidate broadcast join + min-rung pick.

Set-oriented translation of the reference's first-hit-wins ladder
(/root/reference/ontologytimemachine/utils/proxy_logic.py:88-144): generate
ALL candidate keys per mention (kgtm.normalize.candidate_paths_col), inner
broadcast-join against the ontology dictionary on (host, cand_path), keep the
minimum rung per mention. "First ladder hit wins and canonicalizes the path"
becomes a min_by over rung — the proof obligation from SURVEY.md §7 item (5);
tests include cases where multiple rungs match different dictionary entries.

Scale notes:
  * The dictionary side is broadcast (1,816 rows in the reference; ≤ a few MB
    even at 10^6 ontologies) — the mention side never shuffles for the join.
  * Round 7: the min-rung pick is computed PER ROW by probing the rung-ordered
    candidate array against a broadcast host→(path→iri) map and taking the
    first non-null hit (broadcast_ladder_link) — zero exchanges and zero
    aggregates on the mention side. The earlier explode→join→groupBy(min_by)
    formulation shuffled the 6x candidate fan-out once per query; the probe
    form never materializes candidates as rows at all.
  * Hot dictionary hosts (semanticscience.org 265/1,816 entries — BASELINE.md
    skew row) are a *broadcast* side concern only: they widen one map row,
    never a join partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kgtm.normalize import candidate_paths_col


def link_mentions(
    mentions: DataFrame, index: DataFrame, carry: tuple[str, ...] = ()
) -> DataFrame:
    """mentions(host, path, ...) × index(host, path, ontology_iri) → links.

    Returns one row per mention: is_linked, ontology_iri, canonical_path,
    rung (the winning ladder rung; NULL when unlinked). ``carry`` names extra
    mention columns to pass through unchanged (between ``path`` and
    ``is_linked`` in the output) — callers that previously joined the linkage
    back to the transcript table just to recover a per-turn column (e.g. the
    failover queries re-deriving ``text``) carry it instead, saving a second
    full scan+window of the source (guide §2.4).

    ROUND-7 SHAPE (guide §2.4 "remove shuffles outright"): this is now a thin
    wrapper over :func:`broadcast_ladder_link` — ONE broadcast hash join on
    host + pure probe expressions, ZERO exchanges and ZERO aggregates on the
    mention side. The previous formulation (explode 6 rung candidates →
    broadcast join → groupBy(mention_id).min_by) paid one full shuffle of the
    6x-exploded candidate rows plus two SortAggregates per query; min-rung
    first-hit-wins is instead computed per row by probing the rung-ordered
    candidate array against the broadcast host→(path→iri) map and taking the
    first non-null hit — semantically identical (same pure spec
    kgtm.normalize.resolve_membership; oracle-gate + fuzz-parity checked),
    and the removal of the aggregation barrier lets Catalyst prune the
    upstream turn-index Window whenever a consumer does not use turn_idx.
    """
    cols = ["mention_id", "conv_id", "turn_idx", "surface", "host", "path", *carry]
    return broadcast_ladder_link(mentions.select(*cols), index)


def ladder_link_expr(index_rows: list[tuple[str, str, str]], host_col: str = "host", path_col: str = "path"):
    """Aggregation-free ladder linking as ONE column expression.

    ``index_rows``: [(host, path, ontology_iri)] — the dictionary embedded as
    a map literal (the closest translation of the reference's resident
    in-memory set, download_archivo_urls.py:13). The rung-ordered candidate
    array is probed with map lookups and the FIRST hit wins — the literal
    short-circuit of proxy_logic.py:103-141, no groupBy.

    Use when (a) the plan must stay aggregation-free (streaming append mode),
    or (b) per-row lookup beats a join. For very large dictionaries (>>10^5
    entries) prefer the broadcast-join paths: a map literal that size bloats
    the plan.

    Returns struct(is_linked, ontology_iri, canonical_path, rung).
    """
    kv = []
    for h, p, iri in index_rows:
        kv += [F.lit(f"{h}|{p}"), F.lit(iri)]
    m = F.create_map(*kv)
    hosts = sorted({h for h, _, _ in index_rows})
    host_set = F.array(*[F.lit(h) for h in hosts])
    cands = candidate_paths_col(path_col)
    probed = F.transform(
        cands,
        lambda c: F.struct(
            c["rung"].alias("rung"),
            c["cand_path"].alias("cand_path"),
            m[F.concat(F.col(host_col), F.lit("|"), c["cand_path"])].alias(
                "ontology_iri"
            ),
        ),
    )
    first = F.get(F.filter(probed, lambda x: x["ontology_iri"].isNotNull()), 0)
    p = F.col(path_col)
    pathless_hit = (p.isNull() | (p == "")) & F.array_contains(
        host_set, F.col(host_col)
    )
    return F.struct(
        (first.isNotNull() | pathless_hit).alias("is_linked"),
        first["ontology_iri"].alias("ontology_iri"),
        first["cand_path"].alias("canonical_path"),
        F.when(first.isNotNull(), first["rung"])
        .when(pathless_hit, F.lit(0))
        .alias("rung"),
    )


def host_path_map(index: DataFrame) -> DataFrame:
    """Dictionary side for the stream-static broadcast ladder:
    (d_host, path_map: map<path, ontology_iri>) — one row per host.

    Duplicate (host, path) dictionary rows are resolved deterministically to
    min(ontology_iri) (the batch broadcast-join path is NONdeterministic
    there: min_by over rung-equal hits picks an arbitrary one)."""
    return (
        index.groupBy("host", "path")
        .agg(F.min("ontology_iri").alias("ontology_iri"))
        .groupBy(F.col("host").alias("d_host"))
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("path", "ontology_iri"))
            ).alias("path_map")
        )
    )


#: Above this many dictionary entries the literal-probe fast path bows out:
#: a map literal that size bloats the plan (ladder_link_expr's caveat) and
#: the broadcast join is the honest shape. Archivo itself is 1,816 entries.
LITERAL_DICT_MAX = 4096


def _literal_host_map(index: DataFrame):
    """map<host, map<path, iri>> literal for a driver-local small dictionary;
    None when the index is not a plan literal (session.local_literal_rows) or
    carries NULL keys (create_map cannot hold them — the broadcast path's
    map_from_entries cannot either, so those dictionaries are invalid both
    ways, but fall back rather than change the failure mode here)."""
    from kgtm.session import local_literal_rows

    rows = local_literal_rows(
        index, ["host", "path", "ontology_iri"], LITERAL_DICT_MAX
    )
    if rows is None:
        return None
    per_host: dict[str, dict[str, str]] = {}
    for r in rows:
        if r.host is None or r.path is None or r.ontology_iri is None:
            return None
        pm = per_host.setdefault(r.host, {})
        # duplicate (host, path) rows resolve to min(ontology_iri) — the
        # same deterministic pick as host_path_map's first groupBy
        if r.path not in pm or r.ontology_iri < pm[r.path]:
            pm[r.path] = r.ontology_iri
    return F.create_map(
        *[
            x
            for h in sorted(per_host)
            for x in (
                F.lit(h),
                F.create_map(
                    *[
                        y
                        for p in sorted(per_host[h])
                        for y in (F.lit(p), F.lit(per_host[h][p]))
                    ]
                ),
            )
        ]
    )


def broadcast_ladder_link(
    df: DataFrame,
    index: DataFrame,
    host_col: str = "host",
    path_col: str = "path",
) -> DataFrame:
    """Ladder linking as ONE stream-static broadcast join + pure expressions —
    the large-dictionary streaming path (NOTES item 5).

    ladder_link_expr folds the dictionary into the plan as a map LITERAL,
    which bloats plans past ~10^5 entries; here the dictionary arrives as a
    broadcast (host → map<path, iri>) table, so plan size is O(1) in
    |dictionary|. The rung-ordered candidate array is probed against the
    joined map column and the FIRST hit wins — same short-circuit semantics
    as ladder_link_expr / min-rung link_mentions (proxy_logic.py:88-144).

    Append-safe: the stream side sees a broadcast join plus stateless column
    expressions — no aggregation, so it runs under streaming append mode.
    Path-less mentions link on host membership alone (proxy_logic.py:100-101:
    d_host non-null after the left join), rung 0, no iri/canonical path.

    Adds (is_linked, ontology_iri, canonical_path, rung) to df's columns.

    Round-7 staging notes (measured at sf0.1):

      * The probe is the SCALAR cascade :func:`kgtm.normalize.ladder_probe_expr`
        — six GetMapValue lookups in rung order inside whole-stage codegen.
        The earlier higher-order form (transform + filter over the candidate
        array) is CodegenFallback, i.e. interpreted per row, and measured
        ~0.8 s/query slower on the 100k-mention corpus.
      * The probe feeds FOUR output columns; referencing it directly would
        inline the whole tree into each consumer. The explode(array(probe))
        Generate below is the same staging barrier flat_shingles uses: the
        probe runs exactly ONCE per row inside Generate, and the four
        consumers read its struct fields.
    """
    from kgtm.normalize import ladder_probe_expr

    # Literal fast path (round 7, guide §2.4): a small driver-local
    # dictionary folds into the plan as a map LITERAL — the reference's own
    # shape (its dictionary is a resident in-memory set,
    # download_archivo_urls.py:13) — so the query runs ZERO joins, ZERO
    # broadcast builds and ZERO dictionary-side stages; the probe is the
    # same scalar cascade either way. Non-local or large dictionaries keep
    # the broadcast-join plan below (the 100 TB shape) — the switch derives
    # from the actual plan (LocalRelation + size cap), not a sandbox tune.
    hm = _literal_host_map(index)
    if hm is not None:
        joined = df.select(
            "*",
            F.when(F.map_contains_key(hm, F.col(host_col)), F.col(host_col)).alias(
                "d_host"
            ),
            # GetMapValue ([]) like ladder_probe_expr, NOT element_at: the
            # bracket form yields NULL for missing keys under ANSI
            hm[F.col(host_col)].alias("path_map"),
        )
    else:
        dict_side = F.broadcast(host_path_map(index))
        joined = df.join(dict_side, F.col(host_col) == F.col("d_host"), "left")
    first = ladder_probe_expr(F.col("path_map"), path_col)
    staged = joined.select(
        *df.columns,
        F.col("d_host"),
        F.explode(F.array(first)).alias("_hit"),
    )
    hit = F.col("_hit")
    p = F.col(path_col)
    pathless_hit = (p.isNull() | (p == "")) & F.col("d_host").isNotNull()
    return staged.select(
        *df.columns,
        (hit.isNotNull() | pathless_hit).alias("is_linked"),
        hit["ontology_iri"].alias("ontology_iri"),
        hit["cand_path"].alias("canonical_path"),
        F.when(hit.isNotNull(), hit["rung"])
        .when(pathless_hit, F.lit(0))
        .alias("rung"),
    )


def link_surfaces(surfaces: DataFrame, index: DataFrame) -> DataFrame:
    """Ladder-link a DISTINCT surface table: (surface, host, path, ...) →
    + (is_linked, ontology_iri, canonical_path, rung).

    Same ladder as link_mentions but keyed by surface — the right shape when
    the caller has already reduced to distinct surfaces (e.g. triple terms):
    the ladder fan-out and broadcast probe run on |distinct surfaces|, not
    |mentions|.

    ROUND-7 SHAPE: map-probe wrapper over :func:`broadcast_ladder_link`,
    like link_mentions — the previous explode → inner join → groupBy(surface)
    → left join-back needed one exchange and one extra join on the surface
    dim subtree of every flagship build; the probe form needs neither.
    """
    return broadcast_ladder_link(surfaces.select("surface", "host", "path"), index)


def incremental_relink(
    linked: DataFrame,
    old_index: DataFrame,
    new_index: DataFrame,
    max_delta_keys: int = 100_000,
) -> DataFrame:
    """Re-link ONLY the mentions affected by a dictionary change.

    The scale story behind kgtm.graph.index_diff: when the ontology index
    changes (the A1 change-detection semantics, download_archivo_urls.py:
    41-46), the reference reloads everything; at 10^12 mentions a full
    re-link re-scans the world for a dictionary delta of a few rows. Here:

      1. changed keys = symmetric difference of the two index snapshots over
         FULL rows (host, path, ontology_iri) — a re-pointed entry keeps its
         key but changes the linkage target, so it still flags — projected
         to (host, path). A delta is broadcast-sized by definition, so the
         keys fold into the plan as a LITERAL array;
      2. affected = a pure codegen predicate: any of the mention's ≤6 ladder
         candidate keys (or its host, for path-less mentions) is in the
         changed set. The corpus split is a FILTER — zero shuffle, one scan;
      3. the affected slice re-runs the ladder against the NEW index (its
         min-rung groupBy is the only exchange, sized by |affected|);
         everything else passes through untouched.

    Deltas larger than ``max_delta_keys`` raise: at that size the "delta" is
    a reindex and a full re-link is the honest plan. ``linked`` should be a
    materialized table (it IS the existing linkage output) — this operator
    scans it, it does not rebuild it.

    Output schema == link_mentions' output; equality with a full re-link
    against new_index is the correctness contract (oracle-checked).
    """
    # migration guard: v1 linkage tables carry an int64 (xxhash64) mention_id;
    # v2 is string md5 hex (extract.mention_id_col). Mixing them would produce
    # ids that silently never join — fail loudly instead.
    for f in linked.schema.fields:
        if f.name == "mention_id" and f.dataType.simpleString() != "string":
            raise TypeError(
                "linked has a v1 int64 mention_id (pre-md5 id format); "
                "re-materialize it with the current extract_mentions before "
                "running incremental_relink"
            )
    old_rows = old_index.select(
        "host", F.col("path").alias("cand_path"), "ontology_iri"
    )
    new_rows = new_index.select(
        "host", F.col("path").alias("cand_path"), "ontology_iri"
    )
    changed_rows = (
        old_rows.exceptAll(new_rows)
        .unionByName(new_rows.exceptAll(old_rows))
        .select("host", "cand_path")
        .distinct()
        .limit(max_delta_keys + 1)
        .collect()
    )
    if len(changed_rows) > max_delta_keys:
        raise ValueError(
            f"dictionary delta exceeds {max_delta_keys} keys — that is a "
            "reindex, not a delta; run a full link_mentions instead"
        )
    if not changed_rows:
        return linked  # no delta → nothing to do
    changed = F.broadcast(
        linked.sparkSession.createDataFrame(
            [(r.host, r.cand_path) for r in changed_rows],
            "host string, cand_path string",
        )
    )
    changed_hosts = F.broadcast(changed.select("host").distinct())

    # Detection pass: host-gate first (a mention on an unchanged host cannot
    # match a changed key — with real many-host dictionaries this prunes
    # almost everything before any candidate work), then explode each
    # survivor's ≤6 ladder candidates (the Generate barrier evaluates the
    # split ONCE per row — the same Catalyst staging lesson as kgtm.dedup)
    # and broadcast-semi-join the changed keys.
    cands = (
        linked.join(changed_hosts, "host", "left_semi")
        .select(
            "mention_id",
            "host",
            F.explode(candidate_paths_col("path")).alias("cand"),
        )
        .select("mention_id", "host", F.col("cand.cand_path").alias("cand_path"))
    )
    # Path-less mentions match on host alone (proxy_logic.py:100-101): any
    # change within their host can flip the host-only membership.
    pathless_affected = (
        linked.filter(F.col("path").isNull() | (F.col("path") == ""))
        .join(changed_hosts, "host", "left_semi")
        .select("mention_id")
    )
    # Eager checkpoint + EXPLICIT broadcast: the id set feeds both the
    # re-link semi-join and the untouched anti-join; broadcasting it keeps
    # both joins shuffle-free scans of `linked` (an auto-broadcast would bail
    # past the size threshold and silently shuffle the full corpus twice).
    # The set is bounded by the delta's fan-in — for deltas past broadcast
    # scale a full re-link is the honest plan anyway (see max_delta_keys).
    affected_ids = F.broadcast(
        cands.join(changed, ["host", "cand_path"], "left_semi")
        .select("mention_id")
        .unionByName(pathless_affected)
        .distinct()
        .localCheckpoint(eager=True)
    )

    mention_cols = ["mention_id", "conv_id", "turn_idx", "surface", "host", "path"]
    refreshed = link_mentions(
        linked.join(affected_ids, "mention_id", "left_semi").select(*mention_cols),
        new_index,
    )
    untouched = linked.join(affected_ids, "mention_id", "left_anti")
    return untouched.select(*refreshed.columns).unionByName(refreshed)


def deny_unlinked(linked: DataFrame, restricted_access: bool) -> DataFrame:
    """The deny gate (proxy_logic.py:39-44): under restrictedAccess, mentions
    outside the dictionary get outcome 'denied' (403 analog); otherwise they
    pass through as 'unlinked' (original upstream analog)."""
    outcome = (
        F.when(F.col("is_linked"), F.lit("linked"))
        .when(F.lit(restricted_access), F.lit("denied"))
        .otherwise(F.lit("unlinked"))
    )
    return linked.withColumn("outcome", outcome)
