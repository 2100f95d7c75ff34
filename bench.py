#!/usr/bin/env python
"""Headline benchmark: one JSON line for the driver.

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
on local[$SPARK_GRAFT_CPUS]. Every query is forced through the noop sink
(full materialization, no driver collect). The flagship KG pipeline is also
run on an AMPLIFIED transcript corpus (events x AMPLIFY copies, Spark-side,
deterministic) to report a CPU-bound triples/sec figure, plus P/R on the
seeded synthetic corpus.

Output: {"metric": ..., "value": <total sec>, "unit": "sec",
         "queries": {name: sec}, "sf": ..., "triples_per_sec": ...,
         "precision": ..., "recall": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from pyspark.sql import functions as F  # noqa: E402

import __spark_entry__ as se  # noqa: E402
from kgtm.session import get_spark  # noqa: E402

BENCH_QUERIES = [
    "flagship_triples",
    "turn_assembly",
    "ladder_linking",
    "resolution_outcomes",
    "failover_resolution",
    "incremental_relink",
    "dedup_exact",
    "substring_dedup",
    "corpus_curation",
    "incremental_curation_stored",
    "ngram_jaccard",
    "minhash_lsh",
    "simhash_neardup",
    "quality_stats",
    "token_counts",
    "decontamination",
    "winnow_fingerprints",
    "ann_topk",
    "ann_lsh_topk",
    "embedding_neardup",
    "media_meta",
]

AMPLIFY = int(os.environ.get("KGTM_BENCH_AMPLIFY", "30"))
# Variance protocol: this box is multi-tenant (observed ±30% on single runs),
# so per query: ONE untimed warm-up run (absorbs plan compilation / codegen /
# first-touch page cache), then the MEDIAN of REPS timed runs, with the
# relative spread (max-min)/median reported alongside — cross-round BENCH_rN
# deltas are only signal when they exceed the recorded spread.
REPS = int(os.environ.get("KGTM_BENCH_REPS", "3"))


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def median(xs: list[float]) -> float:
    s = sorted(xs)
    n = len(s)
    return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2


def timed_median(build, reps: int = REPS) -> tuple[float, float]:
    """(median seconds, relative spread) over ``reps`` timed runs, after one
    discarded warm-up run.

    ``build()`` constructs a FRESH DataFrame for every rep (outside the
    clock — plan construction is setup, same methodology as earlier rounds);
    the timed region is the noop-force of that fresh plan. Rebuilding per
    rep matters for plans containing lazy localCheckpoints (curation/dedup):
    re-forcing ONE DataFrame would reuse the checkpoint blocks materialized
    by the warm-up, silently excluding the shingle/scoring pipeline from
    every timed rep (round-3 ADVICE)."""
    force(build())  # warm-up (untimed): codegen/JIT/page-cache first touch
    ts = []
    for _ in range(reps):
        df = build()
        t0 = time.perf_counter()
        force(df)
        ts.append(time.perf_counter() - t0)
    med = median(ts)
    return med, (max(ts) - min(ts)) / med if med > 0 else 0.0


def amplified_transcripts(spark, sf_dir: str, factor: int):
    """events x factor deterministic copies → transcripts (Spark-side only).

    Copies get distinct user ids so conversation-count scales while the
    per-conversation turn distribution is preserved.
    """
    from kgtm.transcripts import events_to_transcripts

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    reps = spark.range(factor).select(F.col("id").alias("rep"))
    amp = (
        ev.crossJoin(reps)
        .withColumn("user_id", F.col("user_id") * factor + F.col("rep"))
        .withColumn("event_id", F.col("event_id") * factor + F.col("rep"))
        .drop("rep")
    )
    return events_to_transcripts(amp)


EMB_AMPLIFY = int(os.environ.get("KGTM_BENCH_EMB_AMPLIFY", "4"))


def amplified_embeddings(spark, sf_dir: str, factor: int):
    """Deterministic xN embedding corpus for the embedding_neardup bench
    point: round-5 measured spread 1.736 on the raw sf corpus because a
    0.3 s GEMM can't out-shout scheduler noise (VERDICT r5 item 4). Each
    copy gets a per-(rep, dim) multiplicative distortion so copies are NOT
    near-dups of each other (a pure scale would leave cosine = 1.0 and blow
    the output quadratically); the timed work is the blocked GEMM, which
    grows ~factor^2."""
    em = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    reps = spark.range(factor).select(F.col("id").alias("rep"))
    return em.crossJoin(reps).select(
        (F.col("vec_id") * factor + F.col("rep")).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x, i: x
            * (
                F.lit(1.0)
                + ((F.col("rep") * 131 + i * 17) % 11).cast("double") / F.lit(3.0)
            ),
        ).alias("embedding"),
    )


def flagship_amplified(spark, sf_dir: str, factor: int):
    from kgtm.pipeline import build_triples
    from kgtm.transcripts import ontology_index_df, ontology_snapshots_df

    tr = amplified_transcripts(spark, sf_dir, factor)
    return build_triples(tr, ontology_index_df(spark), ontology_snapshots_df(spark))


def synth_pr(spark) -> dict:
    from kgtm.pipeline import build_triples
    from kgtm.quality import triple_pr
    from kgtm.schemas import (
        ONTOLOGY_INDEX_SCHEMA,
        ONTOLOGY_SNAPSHOTS_SCHEMA,
        TRANSCRIPTS_SCHEMA,
    )
    from kgtm.synth import SynthConfig, generate

    tr_pd, idx_pd, snaps_pd, gold_pd = generate(
        SynthConfig(seed=42, n_convs=300, n_ontologies=80)
    )
    tr = spark.createDataFrame(tr_pd, TRANSCRIPTS_SCHEMA)
    idx = spark.createDataFrame(idx_pd, ONTOLOGY_INDEX_SCHEMA)
    snaps = spark.createDataFrame(snaps_pd, ONTOLOGY_SNAPSHOTS_SCHEMA)
    gold = spark.createDataFrame(gold_pd)
    return triple_pr(build_triples(tr, idx, snaps), gold)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    try:
        sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        sf = -1.0

    spark = get_spark(app_name="kgtm-bench", cores=cpus, shuffle_partitions=2 * cpus)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).select(F.sum("id")).collect()  # JVM warm-up

    qfns = se.queries()
    timings: dict[str, float] = {}
    spreads: dict[str, float] = {}
    for name in BENCH_QUERIES:
        # construction (incl. any eager prep work a query does while building
        # its plan) stays OUTSIDE the timed region — same methodology as
        # earlier rounds, so BENCH_rN deltas compare like with like; the
        # PLAN is rebuilt fresh for every rep so lazily-checkpointed stages
        # are re-materialized inside the clock (see timed_median)
        if name == "embedding_neardup":
            # larger timed workload for a stable measurement (r5 spread
            # 1.736 at 0.3 s median): same operator, xEMB_AMPLIFY corpus
            from kgtm.dedup import embedding_neardup_blocked

            def _build_emb(name=name):
                return embedding_neardup_blocked(
                    amplified_embeddings(spark, sf_dir, EMB_AMPLIFY),
                    threshold=0.5,
                )

            med, spread = timed_median(_build_emb)
        else:
            med, spread = timed_median(
                lambda name=name: qfns[name](spark, sf_dir)
            )
        spark.catalog.clearCache()  # no cross-query cache pollution
        timings[name] = round(med, 3)
        spreads[name] = round(spread, 3)

    # CPU-bound flagship throughput on the amplified corpus (time the whole
    # build: build_triples materializes its persisted stage eagerly)
    spark.catalog.clearCache()
    n_triples = flagship_amplified(spark, sf_dir, AMPLIFY).count()  # warm-up
    spark.catalog.clearCache()
    amp_ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        n_triples = flagship_amplified(spark, sf_dir, AMPLIFY).count()
        amp_ts.append(time.perf_counter() - t0)
        spark.catalog.clearCache()
    amp_sec = median(amp_ts)
    timings["flagship_amplified"] = round(amp_sec, 3)
    spreads["flagship_amplified"] = round(
        (max(amp_ts) - min(amp_ts)) / amp_sec if amp_sec else 0.0, 3
    )

    pr = synth_pr(spark)

    out = {
        "metric": "kgtm headline suite wall time (noop-forced) + amplified flagship triples/sec",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "cpus": cpus,
        "amplify": AMPLIFY,
        "amplified_triples": n_triples,
        "triples_per_sec": round(n_triples / amp_sec, 1),
        "precision": round(pr["precision"], 4),
        "recall": round(pr["recall"], 4),
    }
    detail = {
        "query_spread": spreads,
        "reps": REPS,
        "protocol": "per query: 1 discarded warm-up run, then median of REPS timed runs, each rep forcing a FRESHLY built plan (lazy checkpoints re-materialize inside the clock); spread = (max-min)/median",
    }
    # two-cluster-size scaling evidence (north_rule): produced by
    # scripts/bench_scaling.py (local[8] vs local[32] on identical input,
    # plus the measured hardware ceiling used for normalization). The final
    # line carries the COMPACT summary (throughput at both parallelism
    # levels + efficiency); the full record goes to the detail sidecar —
    # the driver captures only the LAST ~2000 chars of output, and round 4
    # learned the hard way that inlining everything makes the final JSON
    # line unparseable (BENCH_r04 'parsed: null').
    scaling_path = Path(__file__).resolve().parent / "BENCH" / "scaling.json"
    if scaling_path.exists():
        sc = json.loads(scaling_path.read_text())
        detail["scaling"] = sc
        out["scaling"] = {
            "local8_tps": sc.get("local8", {}).get("triples_per_sec"),
            "local32_tps": sc.get("local32", {}).get("triples_per_sec"),
            "raw_eff": sc.get("scaling_efficiency"),
            "ceiling_eff": sc.get("hardware_ceiling_efficiency"),
            "norm_eff": sc.get("normalized_efficiency"),
            "pass": sc.get("pass"),
        }
    detail_path = Path(__file__).resolve().parent / "BENCH" / "DETAILS.json"
    detail_path.parent.mkdir(exist_ok=True)
    detail_path.write_text(json.dumps(detail, indent=2))
    # the driver tail-captures ~2000 chars: degrade by dropping OPTIONAL
    # fields until the line fits rather than asserting after the whole
    # (expensive) run — every dropped field survives in BENCH/DETAILS.json
    line = json.dumps(out)
    if len(line) >= 1800:
        out.pop("scaling", None)
        line = json.dumps(out)
    if len(line) >= 1800:
        out["queries"] = {k: round(v, 2) for k, v in out["queries"].items()}
        line = json.dumps(out)
    if len(line) >= 1800:  # last resort: headline metric beats no JSON at all
        out.pop("queries", None)
        line = json.dumps(out)
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
