"""Incremental dictionary-delta re-link vs full re-link at scale.

Protocol: amplified transcripts (events × KGTM_BENCH_AMPLIFY from
$SPARK_GRAFT_SF_DIR, same prep as bench_scaling) → extract + link all
mentions against the base dictionary, MATERIALIZE the linkage table (the
real-world starting state: linkage lives on disk) — then apply the canonical
dictionary delta (/click removed, /newone added) and time

  full        = link_mentions(all mentions, new index)   (re-scan the world)
  incremental = incremental_relink(linked, old, new)     (touch only affected)

Both are forced through the noop sink; equality is checked on
(is_linked, ontology_iri) global counts (the driver gate checks row-level
equality at sf0.01 — here the point is wall-clock at volume).
Writes BENCH/INCREMENTAL.md.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from kgtm.extract import extract_mentions  # noqa: E402
from kgtm.link import incremental_relink, link_mentions  # noqa: E402
from kgtm.session import get_spark  # noqa: E402
from kgtm.transcripts import mutated_index_rows, ontology_index_df  # noqa: E402


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    amplify = int(os.environ.get("KGTM_BENCH_AMPLIFY", "100"))
    scale_input = os.environ.get("KGTM_SCALE_INPUT", "/tmp/kgtm_scale_input")
    work = os.environ.get("KGTM_INC_WORK", "/tmp/kgtm_inc_work")

    spark = get_spark(app_name="kgtm-incremental", cores=32, shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).select(F.sum("id")).collect()

    if not (Path(scale_input) / "_SUCCESS").exists():
        from bench import amplified_transcripts

        amplified_transcripts(spark, sf_dir, amplify).repartition(256).write.mode(
            "overwrite"
        ).parquet(scale_input)
    tr = spark.read.parquet(scale_input)

    old = ontology_index_df(spark)
    # scenario A — realistic delta: two NEW entries nothing mentions yet
    # (the common "ontology index grew overnight" case; affected ≈ 0)
    add_only = spark.createDataFrame(
        [tuple(r) for r in old.collect()]
        + [
            ("http://onto.example.org/newone", "onto.example.org", "/newone", "term"),
            ("http://onto.example.org/newtwo", "onto.example.org", "/newtwo", "term"),
        ],
        old.schema,
    )
    # scenario B — hot delta: /click removed + /newone added (the canonical
    # gate mutation); /click mentions are ~20% of this corpus — near the
    # point where a full re-link becomes competitive
    hot = spark.createDataFrame(mutated_index_rows(), old.schema)

    # starting state: the existing linkage table, materialized
    linked_path = f"{work}/linked"
    link_mentions(extract_mentions(tr), old).write.mode("overwrite").parquet(
        linked_path
    )
    linked = spark.read.parquet(linked_path)
    n_mentions = linked.count()

    def signature(df):
        # the forcing action AND the equality payload: a full-input
        # aggregation down to a handful of rows
        return {tuple(r) for r in df.groupBy("is_linked", "ontology_iri").count().collect()}

    result = {"n_mentions": n_mentions, "scenarios": {}}
    for name, new in [("add_only", add_only), ("hot_delta", hot)]:
        t0 = time.perf_counter()
        sig_full = signature(link_mentions(extract_mentions(tr), new))
        full_sec = round(time.perf_counter() - t0, 2)

        t0 = time.perf_counter()
        sig_inc = signature(incremental_relink(linked, old, new))
        inc_sec = round(time.perf_counter() - t0, 2)

        assert sig_full == sig_inc, f"incremental != full ({name})"
        result["scenarios"][name] = {
            "full_sec": full_sec,
            "incremental_sec": inc_sec,
            "speedup": round(full_sec / inc_sec, 2),
        }
    print(json.dumps(result))

    a, b = result["scenarios"]["add_only"], result["scenarios"]["hot_delta"]
    (REPO / "BENCH" / "INCREMENTAL.md").write_text(
        f"""# BENCH/INCREMENTAL — dictionary-delta re-link vs full re-link

When the ontology index changes, the reference reloads everything
(download_archivo_urls.py:41-46 — "hash changed, fetch the world"). At
10^12 mentions a full re-link re-scans every mention for a delta of a few
dictionary rows; `link.incremental_relink` instead detects affected
mentions with a broadcast semi-join of their ≤6 ladder candidate keys
against the changed (host, path) keys and re-links ONLY that slice — the
untouched split is a broadcast anti-join, so neither side of the corpus
ever shuffles.

Corpus: {n_mentions:,} linked mentions (amplified transcripts, local[32]).
Both plans verified to produce the identical global linkage signature
(per-row equality with a full re-link is hash-checked at sf0.01 by the
driver gate's `incremental_relink` oracle).

| delta scenario | full re-link (extract + ladder, all mentions) | incremental | speedup |
|---|---|---|---|
| add-only (2 new entries, ~0 mentions affected — the common case) | {a["full_sec"]} s | {a["incremental_sec"]} s | **{a["speedup"]}x** |
| hot delta (/click removed — ~20% of all mentions affected) | {b["full_sec"]} s | {b["incremental_sec"]} s | {b["speedup"]}x |

Incremental cost = one narrow detection pass over the linkage table plus
work proportional to |affected|, and it never touches the transcript text
(no re-extraction); the full plan re-runs extraction + ladder over
everything. The hot-delta row is close to the worst case by construction —
this corpus has only 5 dictionary entries, so removing one affects ~20% of
all mentions; real dictionaries have 10^3-10^6 entries and deltas touch a
sliver. Past `max_delta_keys` the operator refuses and a full re-link is
the honest plan.

Reproduce: `python scripts/bench_incremental.py`
(env: SPARK_GRAFT_SF_DIR, KGTM_BENCH_AMPLIFY, KGTM_SCALE_INPUT).
"""
    )
    spark.stop()


if __name__ == "__main__":
    main()
