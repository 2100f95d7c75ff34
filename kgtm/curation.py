"""Corpus curation: the composed training-data filtering pipeline.

What a 100 TB pre-training data pipeline actually ships is not one dedup
operator but a LEDGER: every document with a keep/drop decision and the
reason, so downstream audits can reproduce the corpus. This module composes
the tested pieces (kgtm.textstats quality scoring → exact dedup → n-gram
near-dup clustering over kgtm.dedup + star connected components) into that
ledger, with deterministic survivor picks at every stage.

Stage order matters and is part of the contract:
  1. low-quality drops first (cheap codegen-only scan; no point paying
     shingle/dedup cost for junk),
  2. exact dedup among the survivors (digest groupBy, min doc_id survives),
  3. near-dup clustering among what remains (shared-shingle exact Jaccard →
     O(log n) star components, min doc_id per cluster survives).

Reference lineage: the quality/aggregate side descends from the experiment
harness's per-file accessibility accounting (aggregate_results.py:92-151 —
every URL ends in exactly one category); the drop-reason CASE is the same
idea over documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kgtm.dedup import dedup_clusters, ngram_jaccard_pairs
from kgtm.textstats import quality_features

DROP_REASONS = ["low-quality", "exact-dup", "near-dup"]


def curate_documents(
    docs: DataFrame,
    min_quality: float = 0.45,
    jaccard_threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """One row per input document: (doc_id, quality_score, kept, drop_reason).

    drop_reason ∈ {low-quality, exact-dup, near-dup, NULL(kept)} — exactly
    one bucket per document, first applicable stage wins. All survivor picks
    are min-doc_id (deterministic, partitioning-independent).
    """
    # The threshold compares the ROUNDED score (6 decimals) so the decision
    # is reproducible from the published quality_stats numbers themselves.
    scored = quality_features(docs.select(id_col, text_col)).select(
        id_col, text_col, F.round("quality_score", 6).alias("quality_score")
    )
    hq = scored.filter(F.col("quality_score") >= min_quality)

    # stage 2: exact dedup among high-quality docs (digest groupBy; the
    # min-id keeper joins back broadcast — one digest shuffle total)
    digests = hq.select(id_col, F.md5(F.col(text_col)).alias("_dg"))
    keepers = digests.groupBy("_dg").agg(F.min(id_col).alias("_keep"))
    exact_kept = digests.join(keepers, "_dg").select(
        id_col, (F.col(id_col) == F.col("_keep")).alias("_exact_keep")
    )

    # stage 3: near-dup clustering among exact survivors
    hq2 = hq.join(
        exact_kept.filter("_exact_keep").select(id_col), id_col, "left_semi"
    )
    pairs = ngram_jaccard_pairs(
        hq2, text_col=text_col, id_col=id_col, threshold=jaccard_threshold
    )
    clusters = dedup_clusters(pairs, hq2.select(id_col), id_col=id_col)

    ledger = (
        scored.select(id_col, "quality_score")
        .join(exact_kept, id_col, "left")
        .join(
            clusters.select(F.col("id").alias(id_col), "is_survivor"),
            id_col,
            "left",
        )
    )
    return _assemble_ledger(ledger, id_col, min_quality)


def _assemble_ledger(joined: DataFrame, id_col: str, min_quality: float) -> DataFrame:
    """Shared drop-reason precedence (first applicable stage wins) — the ONE
    place the ledger contract lives, for both full and incremental curation."""
    reason = (
        F.when(F.col("quality_score") < min_quality, F.lit("low-quality"))
        .when(~F.col("_exact_keep"), F.lit("exact-dup"))
        .when(~F.col("is_survivor"), F.lit("near-dup"))
    )
    return joined.select(
        id_col,
        "quality_score",
        reason.isNull().alias("kept"),
        reason.alias("drop_reason"),
    )


def incremental_curate(
    old_docs: DataFrame,
    old_ledger: DataFrame,
    new_docs: DataFrame,
    min_quality: float = 0.45,
    jaccard_threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Curate ONLY a newly-arrived batch against an already-curated corpus:
    ledger rows for the new docs, with EXACT full-run parity.

    The append-only production shape: prior decisions are immutable (the
    ledger is the audit log); a new batch must not re-curate the world. The
    QUADRATIC work scales with the batch — the near-dup candidate join is
    probe-driven (ngram_jaccard_pairs_probe: pairs touching new docs only,
    never the old×old self-join) and exact dedup is a digest join of the
    batch against prior digests. The LINEAR work does not: each call still
    scans and re-shingles the prior corpus once (digests of old HQ docs,
    shingle flat + df cap over all participants) — at production scale those
    corpus-side tables are materialized once and reused across batches, the
    same way the ledger itself is an input here.

    PRECONDITIONS: (a) monotone ids — checked below; (b) the SAME
    min_quality / jaccard_threshold / shingle settings as the run that
    produced ``old_ledger``. min_quality drift is detected from the ledger
    itself (quality_score vs drop_reason disagree) and raises; a
    jaccard_threshold drift is NOT detectable from the ledger and silently
    voids the parity contract — record thresholds beside the ledger
    (persist_ledger stores them in the commit manifest) and pass them back.

    Parity contract (provable given monotone ids, enforced below): for every
    NEW doc, (kept, drop_reason, quality_score) equal what a full
    curate_documents over old∪new would produce. Old×old near-dup edges can
    only merge components that each already contain an old doc — and ANY
    old member (id < every new id) drops a new doc — so omitting them never
    flips a new doc's decision. Old docs' rows are NOT recomputed: a new
    bridge that would merge two old clusters in a full re-run leaves both
    old survivors standing here (ledger immutability, by design).
    """
    from kgtm.dedup import dedup_clusters, ngram_jaccard_pairs_probe

    bounds = (
        old_docs.select(F.max(id_col).alias("mx"))
        .crossJoin(new_docs.select(F.min(id_col).alias("mn")))
        .first()
    )
    if bounds.mx is not None and bounds.mn is not None and bounds.mx >= bounds.mn:
        raise ValueError(
            "incremental_curate requires monotone ids: every new doc_id must "
            f"exceed all old ones (old max {bounds.mx} >= new min {bounds.mn})"
            " — the exact-parity proof leans on old ids always winning the "
            "min-id survivor pick"
        )
    # min_quality drift detection: under the ledger's own min_quality, a row
    # is low-quality IFF its recorded score is below the threshold — any
    # disagreement means old_ledger was built with different settings and
    # the parity contract is void
    n_drift = old_ledger.filter(
        (
            (F.col("quality_score") < min_quality)
            & (F.col("drop_reason").isNull() | (F.col("drop_reason") != "low-quality"))
        )
        | (
            (F.col("quality_score") >= min_quality)
            & (F.col("drop_reason") == "low-quality")
        )
    ).count()
    if n_drift:
        raise ValueError(
            f"old_ledger disagrees with min_quality={min_quality} on "
            f"{n_drift} rows — it was built with a different threshold; "
            "re-curate or pass the original parameters (recorded in the "
            "ledger's commit manifest by persist_ledger)"
        )

    # the batch-derived intermediates are consumed 2-3x each downstream
    # (digest stage, graph union, probe ids, node set, final ledger joins);
    # lazy localCheckpoints materialize each ONCE instead of re-running the
    # quality/digest chains per consumer — same pattern as the shingle flat
    # in ngram_jaccard_pairs
    scored_new = (
        quality_features(new_docs.select(id_col, text_col))
        .select(id_col, text_col, F.round("quality_score", 6).alias("quality_score"))
        .localCheckpoint(eager=False)
    )
    hq_new = scored_new.filter(F.col("quality_score") >= min_quality)

    # exact stage: the batch's digests vs prior HIGH-QUALITY digests (old
    # exact- and near-dup-dropped docs still occupy their digest groups in a
    # full run; only quality-dropped old docs never entered the groupBy)
    old_hq = old_docs.join(
        old_ledger.filter(
            F.col("drop_reason").isNull() | (F.col("drop_reason") != "low-quality")
        ).select(id_col),
        id_col,
        "left_semi",
    )
    old_digests = old_hq.select(F.md5(F.col(text_col)).alias("_dg")).distinct()
    new_digests = hq_new.select(id_col, F.md5(F.col(text_col)).alias("_dg"))
    grp = new_digests.groupBy("_dg").agg(F.min(id_col).alias("_keep"))
    # keeper = min new id of the digest group AND the digest is unseen in the
    # corpus (a digest already in old always wins: old ids are smaller)
    exact_kept = (
        new_digests.join(grp, "_dg")
        .join(old_digests.withColumn("_in_old", F.lit(True)), "_dg", "left")
        .select(
            id_col,
            (
                F.col("_in_old").isNull() & (F.col(id_col) == F.col("_keep"))
            ).alias("_exact_keep"),
        )
        .localCheckpoint(eager=False)
    )
    new_survived_exact = exact_kept.filter("_exact_keep").select(id_col)

    # near-dup stage: graph participants of the full run = exact-survivors
    # on both sides (old side: ledger kept + near-dup-dropped — both passed
    # the exact stage and sit in the full run's pair graph)
    old_participants = old_docs.join(
        old_ledger.filter(
            F.col("kept") | (F.col("drop_reason") == "near-dup")
        ).select(id_col),
        id_col,
        "left_semi",
    )
    graph_docs = old_participants.select(id_col, text_col).unionByName(
        hq_new.join(new_survived_exact, id_col, "left_semi").select(id_col, text_col)
    )
    pairs = ngram_jaccard_pairs_probe(
        graph_docs,
        new_survived_exact,
        text_col=text_col,
        id_col=id_col,
        threshold=jaccard_threshold,
    )
    # node universe: new exact-survivors + only the OLD docs that appear in
    # a pair (an old doc in no probe pair cannot affect any new decision)
    pair_nodes = (
        pairs.select(F.col("id_a").alias(id_col))
        .unionByName(pairs.select(F.col("id_b").alias(id_col)))
        .distinct()
    )
    nodes = new_survived_exact.unionByName(pair_nodes).distinct()
    clusters = dedup_clusters(pairs, nodes, id_col=id_col)

    ledger = (
        scored_new.select(id_col, "quality_score")
        .join(exact_kept, id_col, "left")
        .join(
            clusters.select(F.col("id").alias(id_col), "is_survivor"),
            id_col,
            "left",
        )
    )
    return _assemble_ledger(ledger, id_col, min_quality)


def persist_ledger(ledger: DataFrame, out_dir: str, **curation_params) -> dict:
    """Commit a curation ledger into the manifest store (table='ledger').

    Corpus versions then time-travel exactly like the triple store: each
    curation run is one commit, `read_ledger(as_of=seq)` reproduces the
    corpus decision set as of that commit — the output-store mirror of the
    reference's hash-versioned dictionary snapshots
    (download_archivo_urls.py:41-46: a new version only when content
    changed). ``curation_params`` (thresholds etc.) are recorded in the
    manifest so every corpus version is reproducible from its commit record.
    """
    from kgtm.materialize import write_table

    return write_table(
        ledger.withColumn("kept_part", F.col("kept")),
        out_dir,
        table="ledger",
        partition_by=("kept_part",),
        extra_manifest={"curation_params": curation_params} if curation_params else None,
    )


def append_curated_batch(
    spark,
    out_dir: str,
    old_docs: DataFrame,
    new_docs: DataFrame,
    min_quality: float | None = None,
    jaccard_threshold: float | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> dict:
    """Incrementally curate a new batch against the store's LATEST ledger
    and commit the combined decision set as a new corpus version.

    Closes the parameter-drift loop persist_ledger opened: thresholds
    default to the values RECORDED in the base ledger commit's manifest
    (explicit arguments override, at the caller's own risk — the
    incremental parity contract needs unchanged settings); a threshold that
    is neither recorded nor passed raises rather than silently guessing a
    default. The rows curated against are read AS OF the same base commit
    the thresholds came from, and ``old_docs`` must carry exactly the base
    ledger's doc ids (guarded) — a shrunken old corpus would silently keep
    batch docs that duplicate the missing documents. The committed snapshot
    is old rows (immutable) + the batch's rows, so read_ledger(as_of=...)
    time-travels corpus versions and the newest read always covers the
    whole corpus.

    Concurrency: ledger versions are snapshots, so two concurrent appends
    from the same base would each publish old+ownBatch and the later one
    would hide the earlier batch (lost update). A pre-commit check rejects
    the append when the base is no longer the newest ledger commit; the
    residual check→commit window means corpus ingest should still be
    single-writer per store — unlike the append-mode triple table, which
    takes concurrent writers safely.
    """
    base = _latest_ledger_commit(spark, out_dir)
    recorded = base.get("curation_params", {})

    def _resolve(name: str, passed: float | None) -> float:
        if passed is not None:
            return passed
        if name in recorded:
            return recorded[name]
        raise ValueError(
            f"{name} is neither recorded in the base ledger commit "
            f"{base['commit_id']} nor passed explicitly — refusing to guess: "
            "a threshold mismatch silently voids the incremental parity "
            "contract (persist the ledger with its thresholds, or pass them)"
        )

    mq = _resolve("min_quality", min_quality)
    jt = _resolve("jaccard_threshold", jaccard_threshold)
    # rows AS OF the base commit — params and rows from the SAME snapshot
    # even if a concurrent writer lands in between
    old_ledger = read_ledger(spark, out_dir, as_of=base["seq"])

    # old_docs must be exactly the base ledger's corpus: a missing/extra doc
    # silently shrinks/grows the digest and near-dup participant sets
    led_ids = old_ledger.select(F.col(id_col).alias("id"))
    doc_ids = old_docs.select(F.col(id_col).alias("id"))
    n_missing = led_ids.join(doc_ids, "id", "left_anti").count()
    n_extra = doc_ids.join(led_ids, "id", "left_anti").count()
    if n_missing or n_extra:
        raise ValueError(
            f"old_docs does not match the base ledger's corpus "
            f"({n_missing} ledger ids missing from old_docs, {n_extra} "
            "old_docs ids absent from the ledger) — pass the exact document "
            "set the base version was curated from"
        )

    new_rows = incremental_curate(
        old_docs,
        old_ledger,
        new_docs,
        min_quality=mq,
        jaccard_threshold=jt,
        text_col=text_col,
        id_col=id_col,
    )
    combined = old_ledger.unionByName(new_rows).localCheckpoint(eager=True)
    # optimistic-concurrency check as late as possible: refuse to publish a
    # snapshot computed from a stale base
    current = _latest_ledger_commit(spark, out_dir)
    if current["commit_id"] != base["commit_id"]:
        raise RuntimeError(
            f"concurrent ledger commit {current['commit_id']} landed after "
            f"base {base['commit_id']} — recompute the append from the new "
            "base (publishing now would hide the other batch's rows)"
        )
    return persist_ledger(
        combined,
        out_dir,
        min_quality=mq,
        jaccard_threshold=jt,
    )


def _latest_ledger_commit(spark, out_dir: str, as_of: int | None = None) -> dict:
    """Newest ledger commit manifest (seq <= as_of when given); raises like a
    missing-table read when the store has none."""
    from kgtm.materialize import list_commits

    ledgers = [
        c
        for c in list_commits(out_dir, spark)
        if c.get("table") == "ledger" and (as_of is None or c["seq"] <= as_of)
    ]
    if not ledgers:
        raise FileNotFoundError(f"no committed ledger under {out_dir}")
    return ledgers[-1]  # list_commits is seq-ordered


def read_ledger(spark, out_dir: str, as_of: int | None = None) -> DataFrame:
    """Manifest-gated ledger read; ``as_of`` = corpus-version time travel.

    A ledger commit is a full SNAPSHOT of the corpus decision set (unlike the
    append-mode triple table), so this reads exactly ONE commit: the newest
    ledger commit with seq <= as_of (or the newest overall).
    """
    from kgtm.materialize import read_table

    newest = _latest_ledger_commit(spark, out_dir, as_of)
    df = read_table(spark, out_dir, table="ledger", as_of=newest["seq"])
    return df.filter(F.col("commit") == newest["commit_id"]).drop(
        "kept_part", "commit"
    )
