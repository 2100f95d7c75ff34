"""spark-submit entry point (north_rule: `spark-submit --py-files kgtm.zip
kgtm/cli.py ...`).

Argparse surface mirrors the reference's CLI (/root/reference/
ontologytimemachine/utils/config.py:141-337) where the flags still make sense
in batch: --ontoVersion {original, originalFailoverLiveLatest,
latestArchived, timestampArchived}, --timestamp (required for
timestampArchived — no interactive prompt on a cluster, config.py:257-258
lifted), --restrictedAccess; plus the batch-only knobs (paths, buckets,
salting).

Usage:
  spark-submit --py-files kgtm.zip kgtm/cli.py \
      --transcripts /data/transcripts --ontology-index /data/index \
      --snapshots /data/snapshots --out /data/triples \
      --onto-version timestampArchived --timestamp 2024.07.01-000000
"""

from __future__ import annotations

import argparse
import datetime as dt
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def parse_stamp(s: str) -> dt.datetime:
    """Archivo version stamp YYYY.MM.DD-HHMMSS (proxy_logic.py:271) or ISO."""
    for fmt in ("%Y.%m.%d-%H%M%S", "%Y-%m-%d", "%Y-%m-%dT%H:%M:%S"):
        try:
            return dt.datetime.strptime(s, fmt)
        except ValueError:
            continue
    raise argparse.ArgumentTypeError(f"unparseable timestamp: {s!r}")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("kgtm", description=__doc__)
    p.add_argument("--transcripts", required=True, help="parquet path (input_hint schema)")
    p.add_argument("--ontology-index", required=True)
    p.add_argument("--snapshots", required=True)
    p.add_argument("--out", required=True)
    p.add_argument(
        "--onto-version",
        default="latestArchived",
        choices=[
            "original",
            "originalFailoverLiveLatest",
            "latestArchived",
            "timestampArchived",
        ],
    )
    p.add_argument("--timestamp", type=parse_stamp, default=None)
    p.add_argument(
        "--live-legs",
        default=None,
        help="parquet (surface, live_status, live_content_type, accept_header)"
        " — required for originalFailoverLiveLatest",
    )
    p.add_argument("--restricted-access", action="store_true")
    p.add_argument("--checkpoint-dir", default=None, help="enable per-bucket resume")
    p.add_argument("--n-buckets", type=int, default=32)
    p.add_argument("--golden", default=None, help="golden triples parquet → print P/R")
    p.add_argument("--cores", type=int, default=None)
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    if args.onto_version == "timestampArchived" and args.timestamp is None:
        print("error: --timestamp is required for timestampArchived", file=sys.stderr)
        return 2
    if args.onto_version == "originalFailoverLiveLatest" and args.live_legs is None:
        print(
            "error: --live-legs is required for originalFailoverLiveLatest",
            file=sys.stderr,
        )
        return 2

    from kgtm.checkpoints import run_with_checkpoints
    from kgtm.materialize import write_triples
    from kgtm.metrics import MetricsCollector
    from kgtm.pipeline import PipelineConfig, build_triples
    from kgtm.quality import triple_pr
    from kgtm.session import get_spark

    spark = get_spark(app_name="kgtm-pipeline", cores=args.cores)
    transcripts = spark.read.parquet(args.transcripts)
    index = spark.read.parquet(args.ontology_index)
    snapshots = spark.read.parquet(args.snapshots)
    cfg = PipelineConfig(
        onto_version=args.onto_version,
        pin_ts=args.timestamp,
        restricted_access=args.restricted_access,
        live_legs=(
            spark.read.parquet(args.live_legs) if args.live_legs else None
        ),
    )

    mc = MetricsCollector()
    with mc.stage("pipeline"):
        if args.checkpoint_dir:
            triples = run_with_checkpoints(
                spark,
                transcripts,
                lambda tr: build_triples(tr, index, snapshots, cfg),
                args.checkpoint_dir,
                n_buckets=args.n_buckets,
            )
        else:
            triples = build_triples(transcripts, index, snapshots, cfg)

    commit = write_triples(triples, args.out, metrics=mc)
    report = {"commit": commit}
    if args.golden:
        golden = spark.read.parquet(args.golden)
        from kgtm.materialize import read_triples

        report["pr"] = triple_pr(read_triples(spark, args.out), golden)
    print(json.dumps(report, default=str))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
