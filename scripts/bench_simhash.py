"""SimHash signature throughput: round-6 vectorized hasher vs the round-5
md5 baseline (VERDICT r5 "What's wrong #1" — the per-string hashlib loop was
the last row-at-a-time-Python hot path in a scale operator).

Both paths run the identical simhash contract (shingles -> 64-bit signature,
majority-bit rule) over the sf documents corpus, amplified with distinct
suffixes so signatures stay realistic. The legacy body below is the round-5
implementation preserved verbatim-in-spirit as a labeled baseline (per-string
md5 + the bounded first-come memo cache); the production path is
kgtm.dedup.simhash_series.

Writes BENCH/SIMHASH.md and prints one JSON line.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time
from pathlib import Path

import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

REPO = Path(__file__).resolve().parent.parent


# --- round-5 baseline (md5 + memo), kept ONLY for this A/B measurement ---
_SHINGLE_MEMO_MAX = 262_144


def _legacy_hash_shingles64(sh, cache):
    out = np.empty(len(sh), dtype=np.uint64)
    for i, s in enumerate(sh):
        h = cache.get(s)
        if h is None:
            h = int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "big")
            if len(cache) < _SHINGLE_MEMO_MAX:
                cache[s] = h
        out[i] = h
    return out


def legacy_simhash_series(shingle_lists: pd.Series, bits: int = 64) -> pd.Series:
    cache: dict[str, int] = {}
    weights = np.uint64(1) << np.arange(bits, dtype=np.uint64)

    def sh(tokens):
        if tokens is None or len(tokens) == 0:
            return None
        h = _legacy_hash_shingles64(tokens, cache)
        cols = ((h[:, None] >> np.arange(bits, dtype=np.uint64)) & 1).astype(np.int64)
        v = np.where(cols.sum(axis=0) * 2 >= len(tokens), 1, 0)
        out = int((v.astype(np.uint64) * weights).sum(dtype=np.uint64))
        return out - (1 << bits) if out >= (1 << (bits - 1)) else out

    return shingle_lists.map(sh)


def _shingle_batches(sf_dir: str, amplify: int, batch_rows: int):
    """Arrow-batch-shaped pandas inputs: doc text -> word 3-gram lists,
    amplified with distinct suffixes (same doc set per path)."""
    import duckdb

    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT list_transform(
                 generate_series(1, greatest(len(w) - 2, 0)),
                 i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) AS sh
        FROM (SELECT string_split_regex(trim(lower(text)), '\\s+') AS w
              FROM read_parquet('{sf_dir}/documents.parquet'))
        """
    ).fetchall()
    base = [r[0] for r in rows]
    batches = []
    cur = []
    for rep in range(amplify):
        for j, sh in enumerate(base):
            # distinct tail shingle per copy keeps signatures non-identical
            cur.append(list(sh) + [f"copy {rep} tail{j % 7}"])
            if len(cur) == batch_rows:
                batches.append(pd.Series(cur))
                cur = []
    if cur:
        batches.append(pd.Series(cur))
    return batches


def _run(fn, batches) -> tuple[float, int]:
    n_sh = 0
    t0 = time.perf_counter()
    for b in batches:
        out = fn(b)
        n_sh += int(sum(len(t) for t in b))
        assert out.notna().any()
    return time.perf_counter() - t0, n_sh


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    amplify = int(os.environ.get("KGTM_SIMHASH_AMPLIFY", "4"))
    batch_rows = 10_000  # == spark.sql.execution.arrow.maxRecordsPerBatch
    from kgtm.dedup import simhash_series

    batches = _shingle_batches(sf_dir, amplify, batch_rows)
    n_docs = sum(len(b) for b in batches)

    # warm both (allocator pages, imports), then best-of-2 timed
    _run(simhash_series, batches[:1])
    _run(legacy_simhash_series, batches[:1])
    new_sec, n_sh = min(_run(simhash_series, batches) for _ in range(2))
    old_sec, _ = min(_run(legacy_simhash_series, batches) for _ in range(2))

    # equivalence of the CONTRACT (not the hash values): same null pattern
    sample = batches[0]
    nn = simhash_series(sample).isna()
    on = legacy_simhash_series(sample).isna()
    assert (nn == on).all()

    result = {
        "sf_dir": sf_dir,
        "n_docs": n_docs,
        "n_shingles": n_sh,
        "legacy_md5_sec": round(old_sec, 3),
        "vectorized_sec": round(new_sec, 3),
        "legacy_shingles_per_sec": round(n_sh / old_sec, 1),
        "vectorized_shingles_per_sec": round(n_sh / new_sec, 1),
        "speedup": round(old_sec / new_sec, 2),
    }
    print(json.dumps(result))
    (REPO / "BENCH").mkdir(exist_ok=True)
    (REPO / "BENCH" / "SIMHASH.md").write_text(
        f"""# BENCH/SIMHASH — signature throughput, round-6 vectorized hasher

Round-5 VERDICT "What's wrong #1": `_hash_shingles64` called `hashlib.md5`
per shingle inside the pandas UDF — the last row-at-a-time-Python hot path
in a scale operator. Round 6 replaced it with a codepoint polynomial
(P = FNV prime, +1 per real char) + splitmix64 finalizer, computed as an
in-place Horner column loop over numpy's fixed-width UCS4 matrix with a
modular-inverse un-shift for the padding, and whole-batch pd.factorize so
each distinct shingle hashes once. The DuckDB twin reproduces it bit-for-bit
in HUGEINT SQL (kgtm.oracles.hash64_sql_ctes), keeping `simhash_neardup`
value-checked in the driver gate.

Corpus: {sf_dir}/documents.parquet x{amplify} (distinct tail shingle per
copy), {n_docs:,} docs / {n_sh:,} shingle instances, pandas batches of
{batch_rows:,} rows (the Arrow batch size Spark hands the UDF). Best of 2
warmed runs per path, same process.

| path | sec | shingles/sec |
|---|---|---|
| round-5 md5 + memo cache (labeled baseline) | {old_sec:.3f} | {n_sh / old_sec:,.0f} |
| round-6 vectorized polynomial+splitmix64 | {new_sec:.3f} | {n_sh / new_sec:,.0f} |

**Speedup: {old_sec / new_sec:.2f}x** (target: >= 1.0x — "at least the old
path", VERDICT r5 next-round item 2).

Reproduce: `python scripts/bench_simhash.py`
(env: SPARK_GRAFT_SF_DIR, KGTM_SIMHASH_AMPLIFY).
"""
    )


if __name__ == "__main__":
    main()
