"""Hot-shingle skew-cap bench: planted stop-phrase corpus.

Every document shares one stop phrase — the worst case for the
shared-shingle self-join (each stop shingle alone generates C(N,2) pair
rows; at N docs the uncapped join does O(N^2) work for ZERO dedup signal).
The default document-frequency cap (ngram_jaccard_pairs max_shingle_df=1000)
drops those shingles before pairing.

Protocol: N docs, all containing the same 12-word stop phrase plus a unique
tail; 50 planted genuine near-dup pairs (shared tails). Time capped vs
uncapped; assert both find exactly the 50 planted pairs (the stop phrase
alone never reaches the 0.5 threshold, so the uncapped answer is the same
set — just quadratically slower). Writes BENCH/SHINGLE_CAP.md.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from kgtm.dedup import ngram_jaccard_pairs  # noqa: E402
from kgtm.session import get_spark  # noqa: E402

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 24000
N_PAIRS = 50

STOP = "as a large language model i cannot help with that request today"


def _tail(prefix, key_col, n_words=15):
    """n unique-per-key words: '<prefix>0x<key> <prefix>1x<key> ...' — long
    enough that stop-phrase-only overlap stays far below threshold."""
    words = [
        F.concat(F.lit(f"{prefix}{j}x"), key_col.cast("string"))
        for j in range(n_words)
    ]
    return F.concat_ws(" ", *words)


def corpus(spark):
    base = spark.range(N_DOCS).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" ", F.lit(STOP), _tail("u", F.col("id"))).alias("text"),
    )
    # planted near-dups: doc_id N_DOCS+2i and N_DOCS+2i+1 share a 15-word
    # tail keyed by the pair id, differing only in the final word
    pairs = spark.range(N_PAIRS).select(F.col("id").alias("p"))
    dup = pairs.select(
        F.explode(F.array(F.lit(0), F.lit(1))).alias("side"), "p"
    ).select(
        (F.lit(N_DOCS) + F.col("p") * 2 + F.col("side")).alias("doc_id"),
        F.concat_ws(
            " ",
            F.lit(STOP),
            _tail("d", F.col("p")),
            F.when(F.col("side") == 0, F.lit("end")).otherwise(F.lit("fin")),
        ).alias("text"),
    )
    return base.unionByName(dup)


def run(df, cap):
    t0 = time.perf_counter()
    got = ngram_jaccard_pairs(df, threshold=0.5, max_shingle_df=cap).count()
    return round(time.perf_counter() - t0, 2), got


def main() -> None:
    spark = get_spark(app_name="kgtm-shingle-cap", cores=32, shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")
    df = corpus(spark).repartition(64).localCheckpoint(eager=True)

    capped_sec, capped_n = run(df, 1000)
    uncapped_sec, uncapped_n = run(df, None)

    result = {
        "n_docs": N_DOCS + 2 * N_PAIRS,
        "planted_pairs": N_PAIRS,
        "capped_sec": capped_sec,
        "capped_pairs": capped_n,
        "uncapped_sec": uncapped_sec,
        "uncapped_pairs": uncapped_n,
        "speedup": round(uncapped_sec / capped_sec, 2),
    }
    print(json.dumps(result))
    assert capped_n == N_PAIRS, result
    assert uncapped_n == N_PAIRS, result

    (REPO / "BENCH" / "SHINGLE_CAP.md").write_text(
        f"""# BENCH/SHINGLE_CAP — hot-shingle skew guard

Corpus: {result["n_docs"]:,} documents, EVERY one sharing a 12-word stop
phrase (each of its ~10 shingles alone fans out to C({result["n_docs"]},2) ≈
{result["n_docs"] * (result["n_docs"] - 1) // 2:,} pair rows in the
shared-shingle self-join), plus {N_PAIRS} planted genuine near-dup pairs.
Threshold 0.5, local[32].

| plan | wall sec | pairs found |
|---|---|---|
| capped (max_shingle_df=1000, the default) | {capped_sec} | {capped_n} |
| uncapped (max_shingle_df=None) | {uncapped_sec} | {uncapped_n} |

**Speedup {result["speedup"]}x, identical answer** — the stop-phrase
shingles carry no dedup signal (a pair sharing ONLY the stop phrase sits far
below threshold), so the cap removes pure-overhead fan-out. The gap grows
quadratically with corpus size: at 10^8 docs the uncapped join is simply
infeasible. Dropped-shingle visibility: `log_dropped=True` prints the count.

Reproduce: `python scripts/bench_shingle_cap.py [n_docs]`.
"""
    )
    spark.stop()


if __name__ == "__main__":
    main()
