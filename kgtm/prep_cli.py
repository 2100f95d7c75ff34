"""spark-submit entry point for the data-prep tier (`spark-submit
--py-files kgtm.zip kgtm/prep_cli.py ...`) — the corpus-side counterpart to
kgtm/cli.py's KG pipeline.

Applies the selected stages to a documents table in the canonical order

    paradedup -> spandedup -> redact -> filter -> split -> mixture -> (chunk | pack)

``paradedup`` removes every non-first occurrence of a duplicated paragraph
corpus-wide (C4-style boilerplate removal) before any per-document signal
is computed; ``spandedup`` then cuts duplicated >=N-word SPANS that survive
paragraph resolution (ExactSubstr-style, kgtm/spandedup.py), so both
boilerplate layers are gone before signals; ``split`` tags rows train/holdout deterministically BEFORE the
mixture stage so holdout documents are never epoch-replicated.

and commits the result through the manifest store (same lineage/metrics
layer as the triple pipeline). ``--signals-out`` additionally materializes
the full per-document signal table (repetition + quality + PII counts)
BEFORE any filtering — the audit artifact a curation run keeps.

Usage:
  spark-submit --py-files kgtm.zip kgtm/prep_cli.py \
      --documents /data/documents.parquet --out /data/prepped \
      --stages redact,filter,mixture,chunk \
      --weights '{"web": 0.5, "code": 3.0}' --window 2048
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

STAGE_ORDER = ["paradedup", "spandedup", "redact", "filter", "split", "mixture", "chunk", "pack"]


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("kgtm-prep", description=__doc__)
    p.add_argument("--documents", required=True, help="documents parquet path")
    p.add_argument("--out", required=True, help="manifest store root for the result")
    p.add_argument(
        "--stages",
        default="redact,filter",
        help=f"comma list from {STAGE_ORDER} (applied in that order; "
        "chunk and pack are mutually exclusive)",
    )
    p.add_argument("--signals-out", default=None,
                   help="also commit the pre-filter signal table to this store")
    p.add_argument("--thresholds", default=None,
                   help="JSON dict overriding the Gopher repetition caps")
    p.add_argument("--weights", default=None,
                   help="JSON dict of domain -> epochs for the mixture stage")
    p.add_argument("--default-weight", type=float, default=1.0)
    p.add_argument("--domain-col", default="source")
    p.add_argument("--salt", default="mix")
    p.add_argument("--para-sep", default="\n",
                   help="literal paragraph separator for the paradedup stage")
    p.add_argument("--para-min-chars", type=int, default=20,
                   help="paragraphs shorter than this (trimmed) are never deduped")
    p.add_argument("--span-min-words", type=int, default=20,
                   help="spandedup: duplicated runs of at least this many "
                   "words are removed everywhere but their first occurrence")
    p.add_argument("--holdout-frac", type=float, default=0.01,
                   help="holdout fraction for the split stage")
    p.add_argument("--split-salt", default="split")
    p.add_argument("--window", type=int, default=2048)
    p.add_argument("--stride", type=int, default=None)
    p.add_argument("--drop-incomplete", action="store_true")
    p.add_argument("--budget", type=int, default=2048)
    p.add_argument("--n-shards", type=int, default=64)
    p.add_argument("--cores", type=int, default=None)
    return p


def _parse_stages(raw: str) -> list[str]:
    stages = [s.strip() for s in raw.split(",") if s.strip()]
    unknown = set(stages) - set(STAGE_ORDER)
    if unknown:
        raise SystemExit(f"error: unknown stages {sorted(unknown)}; pick from {STAGE_ORDER}")
    if "chunk" in stages and "pack" in stages:
        raise SystemExit("error: chunk and pack are mutually exclusive terminal stages")
    return [s for s in STAGE_ORDER if s in stages]


def _rejoin_text(out, deduped):
    """Swap the text column for a dedup stage's rewrite, keeping every
    other column; row semantics (lossy vs lossless) follow the deduped
    frame — see the stage dispatch comment."""
    return out.drop("text").join(deduped.select("doc_id", "text"), "doc_id")


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    stages = _parse_stages(args.stages)
    thresholds = json.loads(args.thresholds) if args.thresholds else None
    weights = json.loads(args.weights) if args.weights else {}
    if "mixture" in stages and not weights and args.default_weight == 1.0:
        print("warning: mixture stage with no weights is the identity", file=sys.stderr)

    from pyspark.sql import functions as F

    from kgtm.materialize import write_table
    from kgtm.metrics import MetricsCollector
    from kgtm.mixture import mixture_sample, repetition_filter
    from kgtm.packing import chunk_token_windows, pack_greedy
    from kgtm.pii import pii_signals, redact_col
    from kgtm.session import get_spark
    from kgtm.textstats import quality_features

    spark = get_spark(app_name="kgtm-prep", cores=args.cores)
    docs = spark.read.parquet(args.documents)
    mc = MetricsCollector()
    report: dict = {"stages": stages}

    if args.signals_out:
        with mc.stage("signals"):
            from kgtm.lm import unigram_nll

            sig = (
                repetition_filter(docs, thresholds)
                .join(pii_signals(docs), "doc_id")
                .join(
                    quality_features(docs.select("doc_id", "text")).drop("text"),
                    "doc_id",
                )
                # left join: unigram_nll omits zero-token docs, the signal
                # table must still carry one row per document
                .join(
                    unigram_nll(docs).select("doc_id", "nll_bits"),
                    "doc_id",
                    "left",
                )
            )
            report["signals_commit"] = write_table(
                sig, args.signals_out, table="doc_signals",
                partition_by=(), metrics=mc,
            )

    out = docs
    for stage in stages:
        with mc.stage(stage):
            # both dedup stages rejoin the rewritten text onto the full-
            # column frame; the inner join's row semantics are a property
            # of the DEDUPED frame: paragraph_dedup DROPS docs left with
            # zero kept paragraphs, substring_dedup keeps every row (docs
            # cut to zero words carry text '' — n_words_removed is the
            # drop signal), so the same join is lossy there and lossless
            # here by design
            if stage == "paradedup":
                from kgtm.paragraphs import paragraph_dedup

                out = _rejoin_text(
                    out,
                    paragraph_dedup(
                        out, sep=args.para_sep, min_chars=args.para_min_chars
                    ),
                )
            elif stage == "spandedup":
                from kgtm.spandedup import substring_dedup

                out = _rejoin_text(
                    out, substring_dedup(out, min_words=args.span_min_words)
                )
            elif stage == "split":
                from kgtm.mixture import split_assign

                out = split_assign(
                    out, holdout_frac=args.holdout_frac, salt=args.split_salt
                )
            elif stage == "redact":
                # in-place projection — no join, fuses into the scan
                out = out.withColumn("text", redact_col(F.col("text")))
            elif stage == "filter":
                keep = repetition_filter(out, thresholds).where("keep").select("doc_id")
                out = out.join(keep, "doc_id", "semi")
            elif stage == "mixture":
                def _mix(frame):
                    return mixture_sample(
                        frame,
                        weights,
                        domain_col=args.domain_col,
                        salt=args.salt,
                        default_weight=args.default_weight,
                    )

                if "split" in out.columns:
                    # holdout is an eval set: never epoch-replicated, never
                    # dropped by a 0-weight domain — exactly one epoch-0 copy
                    hold = out.where(F.col("split") != "train").withColumn(
                        "epoch", F.lit(0)
                    )
                    out = _mix(out.where(F.col("split") == "train")).unionByName(hold)
                else:
                    out = _mix(out)
            elif stage == "chunk":
                # epoch/split pass through so replicated doc_ids stay
                # distinct and the train/holdout tag survives chunking
                extra = tuple(c for c in ("epoch", "split") if c in out.columns)
                out = chunk_token_windows(
                    out,
                    window=args.window,
                    stride=args.stride,
                    drop_incomplete=args.drop_incomplete,
                    extra_cols=extra,
                )
            elif stage == "pack":
                order = ("epoch",) if "epoch" in out.columns else ()

                def _pack(frame):
                    return pack_greedy(
                        frame, budget=args.budget, n_shards=args.n_shards,
                        order_cols=order,
                    )

                if "split" in out.columns:
                    # pack each side separately — a training pack must never
                    # contain a holdout document
                    out = _pack(out.where(F.col("split") == "train")).withColumn(
                        "split", F.lit("train")
                    ).unionByName(
                        _pack(out.where(F.col("split") != "train")).withColumn(
                            "split", F.lit("holdout")
                        )
                    )
                else:
                    out = _pack(out)

    with mc.stage("commit"):
        # chunk/pack outputs don't carry the corpus partition column
        part = ("source",) if "source" in out.columns else ()
        report["commit"] = write_table(
            out, args.out, table="prepped", partition_by=part, metrics=mc
        )
    from kgtm.materialize import read_table

    report["n_rows"] = read_table(spark, args.out, table="prepped").count()
    print(json.dumps(report, default=str))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
