"""Phase-by-phase timing of the amplified flagship path (guide §1: find where
the 9.3 s actually goes before changing anything).

Phases (each forced via noop sink or count, timed separately, warm JVM):
  A  events scan + crossJoin amplify (no window)           -> noop
  B  A + events_to_transcripts (the row_number window)     -> noop
  C  B + extract_triples                                   -> noop
  D  full build_triples persist_intermediate=False .count()
  E  full build_triples persist_intermediate=True  .count()  (bench.py shape)

Run: python scripts/profile_flagship.py [amplify]
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from kgtm.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
AMPLIFY = int(sys.argv[1]) if len(sys.argv) > 1 else 30


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(label, fn, reps=3):
    fn()  # warm-up
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    ts.sort()
    print(f"{label:55s} med={ts[len(ts)//2]:7.3f}  min={ts[0]:7.3f}")


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="kgtm-profile", cores=cpus, shuffle_partitions=2 * cpus)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).select(F.sum("id")).collect()

    from bench import amplified_transcripts, flagship_amplified
    from kgtm.extract import extract_triples
    from kgtm.pipeline import PipelineConfig, build_triples
    from kgtm.transcripts import ontology_index_df, ontology_snapshots_df

    def amp_raw():
        ev = spark.read.parquet(f"{SF}/events.parquet")
        reps = spark.range(AMPLIFY).select(F.col("id").alias("rep"))
        return (
            ev.crossJoin(reps)
            .withColumn("user_id", F.col("user_id") * AMPLIFY + F.col("rep"))
            .withColumn("event_id", F.col("event_id") * AMPLIFY + F.col("rep"))
            .drop("rep")
        )

    spark.sparkContext.setJobDescription("A: amplified events, no window")
    timed("A amplified events noop", lambda: noop(amp_raw()))

    spark.sparkContext.setJobDescription("B: events_to_transcripts")
    timed(
        "B amplified transcripts noop",
        lambda: noop(amplified_transcripts(spark, SF, AMPLIFY)),
    )

    spark.sparkContext.setJobDescription("C: extract_triples")
    timed(
        "C extract_triples noop",
        lambda: noop(extract_triples(amplified_transcripts(spark, SF, AMPLIFY))),
    )

    idx, snaps = ontology_index_df(spark), ontology_snapshots_df(spark)

    spark.sparkContext.setJobDescription("D: build_triples no persist")
    timed(
        "D build_triples(persist=False).count()",
        lambda: build_triples(
            amplified_transcripts(spark, SF, AMPLIFY),
            idx,
            snaps,
            PipelineConfig(persist_intermediate=False),
        ).count(),
    )

    spark.sparkContext.setJobDescription("E: build_triples persist (bench shape)")

    def run_e():
        n = flagship_amplified(spark, SF, AMPLIFY).count()
        spark.catalog.clearCache()
        return n

    timed("E flagship_amplified (persist).count()", run_e)
    spark.stop()


if __name__ == "__main__":
    main()
