"""Dependency-closure depth bench (VERDICT r5 item 6): a planted 1e6-edge,
depth-100 graph (10k parallel chains x 100 levels), walked to fixpoint.

Two checkpoint cadences of the SAME operator:
  - compact_every=1  == the round-5 shape: the accumulated closure is
    re-checkpointed every round → O(closure x depth) rewrite I/O;
  - compact_every=8  == round-6 default: frontiers checkpoint eagerly (they
    feed the next join), the union compacts only every 8 rounds.

Writes BENCH/CLOSURE.md and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from kgtm.resolve import dependency_closure
from kgtm.session import get_spark

REPO = Path(__file__).resolve().parent.parent

N_CHAINS = int(os.environ.get("KGTM_CLOSURE_CHAINS", "10000"))
DEPTH = int(os.environ.get("KGTM_CLOSURE_DEPTH", "100"))


def planted(spark):
    """(snapshot_iri, deps) for N_CHAINS chains of DEPTH levels: node
    c<i>_d<j> depends on c<i>_d<j+1>; plus the roots frame (level 0)."""
    base = spark.range(N_CHAINS * DEPTH).select(
        (F.col("id") % N_CHAINS).alias("chain"),
        F.floor(F.col("id") / N_CHAINS).cast("long").alias("lvl"),
    )
    iri = F.concat(F.lit("c"), "chain", F.lit("_d"), "lvl")
    child = F.concat(F.lit("c"), "chain", F.lit("_d"), F.col("lvl") + 1)
    snaps = base.select(
        iri.alias("snapshot_iri"),
        F.when(F.col("lvl") < DEPTH - 1, F.array(child))
        .otherwise(F.array().cast("array<string>"))
        .alias("deps"),
    )
    roots = base.filter(F.col("lvl") == 0).select(iri.alias("snapshot_iri"))
    return snaps, roots


def run(spark, compact_every: int) -> dict:
    snaps, roots = planted(spark)
    snaps = snaps.repartition(32).localCheckpoint(eager=True)
    roots = roots.localCheckpoint(eager=True)
    t0 = time.perf_counter()
    out = dependency_closure(
        snaps, roots, max_iter=DEPTH + 2, compact_every=compact_every
    )
    n = out.count()
    sec = time.perf_counter() - t0
    max_depth = out.agg(F.max("depth")).first()[0]
    assert n == N_CHAINS * DEPTH, n
    assert max_depth == DEPTH - 1, max_depth
    return {
        "compact_every": compact_every,
        "sec": round(sec, 2),
        "rows": n,
        "max_depth": max_depth,
        "edges": N_CHAINS * (DEPTH - 1),
    }


def main() -> None:
    spark = get_spark(
        app_name="kgtm-closure-bench",
        cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
        shuffle_partitions=64,
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).select(F.sum("id")).collect()

    cadenced = run(spark, compact_every=8)
    per_round = run(spark, compact_every=1)
    result = {
        "n_chains": N_CHAINS,
        "depth": DEPTH,
        "edges": cadenced["edges"],
        "cadence8_sec": cadenced["sec"],
        "per_round_sec": per_round["sec"],
        "speedup": round(per_round["sec"] / cadenced["sec"], 2),
        "rows": cadenced["rows"],
    }
    print(json.dumps(result))
    (REPO / "BENCH").mkdir(exist_ok=True)
    (REPO / "BENCH" / "CLOSURE.md").write_text(
        f"""# BENCH/CLOSURE — dependency-closure depth scaling

Planted graph: {N_CHAINS:,} parallel chains x {DEPTH} levels =
{result["edges"]:,} edges, {result["rows"]:,} reachable (root, node) rows,
walked to fixpoint ({DEPTH} iterations — the loop stops on the natural
empty-frontier round, asserted, plus min-depth correctness via max_depth ==
{DEPTH - 1}).

| checkpoint cadence | wall sec |
|---|---|
| compact closure EVERY round (round-5 shape) | {per_round["sec"]} |
| frontier-only + compact every 8 rounds (round-6 default) | {cadenced["sec"]} |

**Speedup: {result["speedup"]}x wall-clock at this scale.** An honest
reading: at local[{os.environ.get("SPARK_GRAFT_CPUS", "32")}] with 1M-row
state, ~100 fixed Spark job schedulings (two joins + a frontier checkpoint
per round) dominate BOTH variants, so the wall-clock gap understates the
structural win. What the cadence actually removes is the O(N x D) rewrite
term: the round-5 shape re-persists the accumulated closure every round
(~sum_d d*|frontier| = ~{N_CHAINS * DEPTH * (DEPTH - 1) // 2:,} row-writes
over the walk) where the cadenced form persists ~D/8 compactions
(~{N_CHAINS * DEPTH * (DEPTH // 8) // 2:,}) — an 8x reduction in the one
term that grows with DATA size rather than with depth alone. At 100-TB
closure sizes the rewrite is the job, not the scheduling.

Plan-shape guarantee: tests/test_plans_and_closure.py asserts the returned
plan contains NO Join operators (every iteration's join lineage is cut by a
checkpoint) and stays under the bounded union width.

Reproduce: `python scripts/bench_closure.py`
(env: KGTM_CLOSURE_CHAINS, KGTM_CLOSURE_DEPTH, SPARK_GRAFT_CPUS).
"""
    )


if __name__ == "__main__":
    main()
