"""Phase-by-phase timing of the mention-family queries at sf0.1 (guide §1).

Each phase builds a FRESH plan per rep and forces it through the noop sink;
median of 3 after one warm-up — same protocol as bench.py.

Run: python scripts/profile_mentions.py
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


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(label, build, reps=3):
    noop(build())  # warm-up
    ts = []
    for _ in range(reps):
        df = build()
        t0 = time.perf_counter()
        noop(df)
        ts.append(time.perf_counter() - t0)
    ts.sort()
    print(f"{label:55s} med={ts[len(ts)//2]:7.3f}  min={ts[0]:7.3f}", flush=True)


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="kgtm-profile-mentions", cores=cpus, shuffle_partitions=2 * cpus)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).select(F.sum("id")).collect()

    import __spark_entry__ as se
    from kgtm.extract import extract_mentions
    from kgtm.link import link_mentions
    from kgtm.transcripts import (
        events_to_transcripts,
        ontology_index_df,
        ontology_snapshots_df,
    )

    def events():
        return spark.read.parquet(f"{SF}/events.parquet")

    sc = spark.sparkContext

    sc.setJobDescription("P0: events scan")
    timed("P0 events scan noop", lambda: events())

    sc.setJobDescription("P1: transcripts")
    timed("P1 transcripts noop", lambda: events_to_transcripts(events()))

    sc.setJobDescription("P2: extract_mentions")
    timed(
        "P2 extract_mentions noop",
        lambda: extract_mentions(events_to_transcripts(events()), carry=("text",)),
    )

    sc.setJobDescription("P3: + link_mentions")
    timed(
        "P3 linked noop",
        lambda: link_mentions(
            extract_mentions(events_to_transcripts(events()), carry=("text",)),
            ontology_index_df(spark),
            carry=("text",),
        ),
    )

    sc.setJobDescription("P4: dims alone")
    from kgtm.link import host_path_map
    from kgtm.resolve import latest_snapshots

    timed("P4a host_path_map noop", lambda: host_path_map(ontology_index_df(spark)))
    timed(
        "P4b latest_snapshots noop",
        lambda: latest_snapshots(ontology_snapshots_df(spark)),
    )

    qf = se.queries()
    for name in (
        "ladder_linking",
        "resolution_outcomes",
        "failover_resolution",
        "incremental_relink",
        "flagship_triples",
    ):
        sc.setJobDescription(f"Q: {name}")
        timed(f"Q {name}", lambda name=name: qf[name](spark, SF))
    spark.stop()


if __name__ == "__main__":
    main()
