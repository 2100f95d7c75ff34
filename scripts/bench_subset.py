"""Micro-bench: time a SUBSET of the headline queries with bench.py's exact
methodology (1 discarded warm-up, median of REPS noop-forced runs of a fresh
plan). For iterating on one operator without the full suite.

Usage: python scripts/bench_subset.py q1 q2 ...   (default: the big movers)
Env:   SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, KGTM_BENCH_REPS
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

import __spark_entry__ as se  # noqa: E402
from kgtm.session import get_spark  # noqa: E402

REPS = int(os.environ.get("KGTM_BENCH_REPS", "3"))


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def median(xs):
    s = sorted(xs)
    n = len(s)
    return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2


def main() -> None:
    names = sys.argv[1:] or [
        "ladder_linking",
        "resolution_outcomes",
        "failover_resolution",
        "incremental_relink",
        "corpus_curation",
        "ngram_jaccard",
        "substring_dedup",
    ]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="kgtm-bench-subset", cores=cpus, shuffle_partitions=2 * cpus)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).select(F.sum("id")).collect()

    qfns = se.queries()
    out = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"subset:{name}")
        if name == "flagship_amplified":
            from bench import flagship_amplified

            spark.catalog.clearCache()
            flagship_amplified(spark, sf_dir, 30).count()
            spark.catalog.clearCache()
            ts = []
            for _ in range(REPS):
                t0 = time.perf_counter()
                flagship_amplified(spark, sf_dir, 30).count()
                ts.append(time.perf_counter() - t0)
                spark.catalog.clearCache()
        else:
            force(qfns[name](spark, sf_dir))
            ts = []
            for _ in range(REPS):
                df = qfns[name](spark, sf_dir)
                t0 = time.perf_counter()
                force(df)
                ts.append(time.perf_counter() - t0)
            spark.catalog.clearCache()
        out[name] = {
            "median": round(median(ts), 3),
            "min": round(min(ts), 3),
            "samples": [round(t, 3) for t in ts],
        }
        print(name, out[name], flush=True)
    print(json.dumps({k: v["median"] for k, v in out.items()}))
    spark.stop()


if __name__ == "__main__":
    main()
