"""Substring-span dedup scaling sweep: time substring_dedup over xA
deterministic corpus copies (A = 1, 2, 4, 8) and report wall seconds per
point plus the growth ratio per doubling.

Exact copies are the ADVERSARIAL case for this operator: every >=L-word
gram in every copy becomes corpus-wide duplicated, so the dup-instance
stream, the interval merge, and the reassembly all run at maximal density
(real corpora dedup far less). Linear-ish growth here means the plan has
no quadratic term in corpus size: the per-gram aggregate's output stays at
one row per gram VALUE (copies pre-combine map-side), and every downstream
stage is keyed on (id) or (gh), never all-pairs.

Writes BENCH/SPANDEDUP.md and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from kgtm.session import get_spark
from kgtm.spandedup import substring_dedup

REPO = Path(__file__).resolve().parent.parent
REPS = 3


def timed(fn):
    fn()  # warm-up
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2], (max(ts) - min(ts)) / sorted(ts)[len(ts) // 2]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        app_name="kgtm-spandedup-bench",
        cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
        shuffle_partitions=64,
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_base = docs.count()

    points = []
    for a in (1, 2, 4, 8):
        reps = spark.range(a).select(F.col("id").alias("rep"))
        amplified = docs.crossJoin(reps).select(
            (F.col("doc_id") * a + F.col("rep")).alias("doc_id"), "text"
        )

        def run(amplified=amplified):
            substring_dedup(amplified, min_words=20).write.format("noop").mode(
                "overwrite"
            ).save()

        sec, spread = timed(run)
        points.append({"amplify": a, "n_docs": n_base * a,
                       "sec": round(sec, 3), "spread": round(spread, 3)})
        print(json.dumps(points[-1]), file=sys.stderr)

    ratios = [
        round(points[i]["sec"] / points[i - 1]["sec"], 2)
        for i in range(1, len(points))
    ]
    result = {"sf_dir": sf_dir, "points": points, "doubling_ratios": ratios}
    print(json.dumps(result))

    rows = "\n".join(
        f"| {p['amplify']} | {p['n_docs']:,} | {p['sec']} | {p['spread']} |"
        for p in points
    )
    (REPO / "BENCH").mkdir(exist_ok=True)
    (REPO / "BENCH" / "SPANDEDUP.md").write_text(
        f"""# BENCH/SPANDEDUP — substring-span dedup scaling sweep

substring_dedup(min_words=20) over xA exact copies of
{sf_dir}/documents.parquet ({n_base:,} docs base). Exact copies are the
ADVERSARIAL case: every gram in every copy is corpus-wide duplicated, so
the dup-instance stream and the interval merge run at maximal density.

| amplify | docs | sec (median of {REPS}) | spread |
|---|---|---|---|
{rows}

Per-doubling wall-time ratios: {ratios} (2.0 == perfectly linear; the
dup-instance stream grows xA while the per-gram aggregate output stays at
one row per gram VALUE — copies pre-combine map-side, so nothing in the
plan is quadratic in corpus size).

Reproduce: `python scripts/bench_spandedup.py`
(env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS).
"""
    )


if __name__ == "__main__":
    main()
