#!/usr/bin/env python
"""Bench the data-prep tier operators at $SPARK_GRAFT_SF_DIR (default
sf0.1): paragraph dedup, unigram LM scoring (uncapped + capped vocab),
split assignment, and the leakage-safe split. Same protocol as bench.py
(one discarded warm-up, median of 3 fresh-plan reps, noop-forced).
Results table lives in BENCH/PREP.md.
"""

from __future__ import annotations

import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# the protocol (warm-up, median-of-REPS fresh plans, spread) is bench.py's —
# imported, not re-implemented, so the two benches cannot drift
from bench import REPS, timed_median  # noqa: E402
from kgtm.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def timed(build):
    med, spread = timed_median(build)
    return round(med, 3), round(spread, 3)


def main():
    spark = get_spark(app_name="kgtm-bench-prep", cores=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n_docs = docs.count()

    from kgtm.lm import unigram_nll
    from kgtm.mixture import leakage_safe_split, split_assign
    from kgtm.paragraphs import paragraph_dedup

    out = {}
    builds = {
        "paragraph_dedup": lambda: paragraph_dedup(docs),
        "unigram_nll": lambda: unigram_nll(docs),
        "unigram_nll_top65k": lambda: unigram_nll(docs, top_v=65536),
        "split_assign": lambda: split_assign(docs),
        "leakage_safe_split": lambda: leakage_safe_split(docs, threshold=0.5),
    }
    spread = {}
    for name, build in builds.items():
        out[name], spread[name] = timed(build)
    print(json.dumps({
        "sf_dir": SF_DIR, "cpus": CPUS, "n_docs": n_docs,
        "sec": out, "spread": spread, "reps": REPS,
        "protocol": "1 discarded warm-up, median of REPS fresh-plan "
                    "noop-forced runs; spread = (max-min)/median",
    }))
    spark.stop()


if __name__ == "__main__":
    main()
