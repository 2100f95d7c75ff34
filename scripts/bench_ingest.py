"""Corpus-size sweep for incremental curation ingest: is a batch append
O(batch) or O(corpus)?

The round-3 verdict's top item: every append used to rewrite the full ledger
snapshot AND re-shingle the whole prior corpus. Round 4 made appends delta
commits over materialized corpus state. This script measures the claim the
design makes — per-batch append wall time should stay (near-)flat as the
corpus grows — and contrasts it with derive mode (state-less fallback),
whose cost is expected to grow linearly with corpus text.

Protocol: amplify the sf documents deterministically (every word gets a
rep-specific suffix, so copies are DISTINCT docs, not near-dups, and ids
stay monotone per rep block). For each corpus size: persist the curated
corpus + state once (untimed setup), then time
  state  = append_curated_batch(new_docs=batch)        (state-backed delta)
  derive = incremental_curate(old_docs, ledger, batch)  (re-derive from text)
with the SAME fixed-size batch. Writes BENCH/INGEST.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from kgtm.curation import (  # noqa: E402
    append_curated_batch,
    incremental_curate,
    persist_curated_corpus,
    read_ledger,
)
from kgtm.session import get_spark  # noqa: E402

BATCH_DOCS = int(os.environ.get("KGTM_INGEST_BATCH", "500"))
FACTORS = [int(x) for x in os.environ.get("KGTM_INGEST_FACTORS", "1,2,4,8").split(",")]


def amplified_docs(spark, sf_dir: str, factor: int):
    """documents × factor DISTINCT copies: every word in copy k>0 gets the
    suffix _k, so copies share no shingles with each other or the original
    (distinct corpus growth, not a pile of near-dups); doc_ids are offset per
    rep block so monotonicity holds for any id-ordered batch split."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # block stride = max id + 1 (NOT count): sparse ids would otherwise make
    # rep blocks overlap and corrupt the sweep with duplicate doc_ids
    n = docs.agg(F.max("doc_id")).first()[0] + 1
    reps = spark.range(factor).select(F.col("id").alias("rep"))
    amp = docs.crossJoin(reps).select(
        (F.col("doc_id") + F.col("rep") * F.lit(n)).alias("doc_id"),
        F.when(F.col("rep") == 0, F.col("text"))
        .otherwise(
            F.array_join(
                F.transform(
                    F.split(F.col("text"), " "),
                    lambda w: F.concat(w, F.lit("_"), F.col("rep").cast("string")),
                ),
                " ",
            )
        )
        .alias("text"),
    )
    return amp, factor * n


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="kgtm-ingest", cores=32, shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).select(F.sum("id")).collect()

    max_factor = max(FACTORS)
    pool, pool_n = amplified_docs(spark, sf_dir, max_factor + 1)
    pool = pool.repartition(64).localCheckpoint(eager=True)

    rows = []
    for factor in FACTORS:
        corpus_n = (pool_n // (max_factor + 1)) * factor
        old = pool.filter(F.col("doc_id") < corpus_n)
        # batch = first BATCH_DOCS docs (id order) of the NEXT rep block — id
        # slicing by [corpus_n, corpus_n+BATCH_DOCS) assumed dense ids; a
        # regenerated documents.parquet with sparse ids would silently shrink
        # the batch and corrupt the sweep. orderBy+limit on 500 rows is cheap.
        batch = (
            pool.filter(
                (F.col("doc_id") >= corpus_n) & (F.col("doc_id") < corpus_n + pool_n)
            )
            .orderBy("doc_id")
            .limit(BATCH_DOCS)
            .localCheckpoint(eager=True)
        )
        old_n, batch_n = old.count(), batch.count()
        assert batch_n == BATCH_DOCS, (batch_n, BATCH_DOCS)
        store = tempfile.mkdtemp(prefix=f"kgtm-ingest-{factor}-")
        try:
            t0 = time.perf_counter()
            persist_curated_corpus(old, store, min_quality=0.45, jaccard_threshold=0.5)
            setup_sec = round(time.perf_counter() - t0, 2)

            t0 = time.perf_counter()
            append_curated_batch(spark, store, new_docs=batch)
            state_sec = round(time.perf_counter() - t0, 2)
            n_after = read_ledger(spark, store).count()
            assert n_after == old_n + batch_n, (n_after, old_n, batch_n)

            # derive-mode contrast: same decisions, corpus re-derived from text
            ledger = read_ledger(spark, store).filter(
                F.col("doc_id") < corpus_n
            ).localCheckpoint(eager=True)
            t0 = time.perf_counter()
            incremental_curate(old, ledger, batch).write.format("noop").mode(
                "overwrite"
            ).save()
            derive_sec = round(time.perf_counter() - t0, 2)
        finally:
            shutil.rmtree(store, ignore_errors=True)
        rows.append(
            {
                "corpus_docs": old_n,  # measured row count, not the id stride
                "setup_sec": setup_sec,
                "state_append_sec": state_sec,
                "derive_sec": derive_sec,
            }
        )
        print(json.dumps(rows[-1]), flush=True)

    first, last = rows[0], rows[-1]
    growth = round(last["state_append_sec"] / first["state_append_sec"], 2)
    d_growth = round(last["derive_sec"] / first["derive_sec"], 2)
    table = "\n".join(
        f"| {r['corpus_docs']:,} | {r['setup_sec']} s | {r['state_append_sec']} s | {r['derive_sec']} s |"
        for r in rows
    )
    (REPO / "BENCH" / "INGEST.md").write_text(
        f"""# BENCH/INGEST — batch append cost vs corpus size

Round 3's weakest scale path: every `append_curated_batch` rewrote the full
ledger snapshot and re-shingled the whole prior corpus — O(corpus) reads AND
writes per batch. Round 4 appends are DELTA commits (only the batch's rows)
computed from MATERIALIZED corpus state (`ledger_digests`,
`ledger_shingles`, `ledger_shingle_df`), so the ledger write is O(batch),
the exact stage reads a compact digest table, the hot-shingle cap is decided
from pre-aggregated df contributions (no corpus-flat groupBy shuffle), and
the probe pair join broadcasts the batch's shingles against the stored flat.

Sweep: fixed {BATCH_DOCS}-doc batch appended to corpora of growing size
(amplified {sf_dir} documents, copies made distinct by word-suffixing so the
corpus genuinely grows; local[32]). Setup = full curate + snapshot + state
write (once per corpus version, amortized over all subsequent appends).

| corpus docs | setup (full curate + state, untimed path) | state-backed append | derive-mode append (fallback) |
|---|---|---|---|
{table}

State-backed append grew {growth}x across a {last['corpus_docs'] // first['corpus_docs']}x
corpus growth (derive mode: {d_growth}x). The residual slope is the one
columnar scan of the stored shingle flat in the probe join and the
participant-size aggregation — compact int-pair tables, no text
re-shingling, no corpus-sized shuffle, no snapshot rewrite. At 10^8+ docs,
bucket `ledger_shingles` by shingle so the probe join prunes instead of
scanning (write-side `write_bucketed`), making the append fully
batch-proportional.

Reproduce: `python scripts/bench_ingest.py`
(env: SPARK_GRAFT_SF_DIR, KGTM_INGEST_BATCH, KGTM_INGEST_FACTORS).
"""
    )
    print(json.dumps({"rows": rows, "state_growth": growth, "derive_growth": d_growth}))
    spark.stop()


if __name__ == "__main__":
    main()
