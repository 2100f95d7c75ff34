"""Triple-store materialization + per-commit metrics (north_rule).

Writes the final triple table partitioned for consumer access patterns and
drops a lineage/metrics table beside every commit — the batch analog of the
reference's download_log.json written next to the downloaded corpus
(/root/reference/experiments/download_ontologies.py:168-172).

Sandbox note (SURVEY §7 hard-part 4): no Iceberg catalog is available here,
so the default format is parquet in an Iceberg-compatible layout (partition
directories + a _commits manifest). ``fmt="iceberg"`` switches to a real
Iceberg catalog when one is configured on the cluster — the contract
(partition spec, metrics-beside-commit) is identical.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kgtm.metrics import MetricsCollector


def write_triples(
    triples: DataFrame,
    out_dir: str,
    fmt: str = "parquet",
    partition_by: tuple[str, ...] = ("source",),
    metrics: MetricsCollector | None = None,
    n_output_partitions: int | None = None,
) -> dict:
    """Write the triple table + metrics; returns the commit record.

    Partitioning: by `source` (original/archivo-latest/...) — low
    cardinality, prunes the common "only linked triples" consumers. Within
    partitions files are sized by AQE coalesce; pass n_output_partitions to
    force fewer, larger files.
    """
    spark = triples.sparkSession
    commit_id = uuid.uuid4().hex[:12]
    # Iceberg-style commit protocol on plain parquet: each commit writes into
    # its OWN directory (triples/commit=<id>/...), and the commit becomes
    # visible only when its manifest lands in _commits/. Readers resolve the
    # manifest list first, so (a) a crashed half-written commit is invisible
    # (snapshot isolation — the writeTo/catalog equivalent of Iceberg's
    # atomic metadata swap), and (b) `read_triples(as_of=seq)` time-travels
    # to any earlier commit — the output-store mirror of the reference's
    # versioned-ontology time machine.
    data_path = os.path.join(out_dir, "triples", f"commit={commit_id}")

    df = triples
    if n_output_partitions:
        df = df.repartition(n_output_partitions, *partition_by)

    mc = metrics or MetricsCollector()
    with mc.stage("materialize") as rec:
        if fmt == "iceberg":
            df.writeTo(f"kgtm.triples_{commit_id}").partitionedBy(
                *[F.col(c) for c in partition_by]
            ).createOrReplace()
        else:
            df.write.mode("overwrite").partitionBy(*partition_by).parquet(data_path)
        rec["n_rows_out"] = None  # avoid a second full count pass

    # metrics + commit manifest beside the data
    mc.to_df(spark).write.mode("append").parquet(
        os.path.join(out_dir, "metrics", f"commit={commit_id}")
    )
    commits_dir = os.path.join(out_dir, "_commits")
    os.makedirs(commits_dir, exist_ok=True)
    seq = len([f for f in os.listdir(commits_dir) if f.endswith(".json")])
    commit = {
        "commit_id": commit_id,
        "seq": seq,
        "format": fmt,
        "partition_by": list(partition_by),
        "stages": [r["stage"] for r in mc.rows],
    }
    with open(os.path.join(commits_dir, f"{commit_id}.json"), "w") as f:
        json.dump(commit, f)
    return commit


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 32,
    sort_col: str | None = None,
) -> None:
    """Persist as a bucketed (+optionally sorted) table.

    Two tables bucketed the same way join WITHOUT an exchange — the classic
    co-located join for repeated joins on the same key (e.g. triples ⋈
    conversation metadata on conv_id at every downstream consumer). Requires
    a table catalog (local Derby warehouse in the sandbox; any metastore on a
    cluster). sort_col additionally orders within buckets for merge-join and
    min/max data skipping.
    """
    writer = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table)


def list_commits(out_dir: str) -> list[dict]:
    """Committed manifests, ordered by seq (the visible snapshot history)."""
    commits_dir = os.path.join(out_dir, "_commits")
    if not os.path.isdir(commits_dir):
        return []
    commits = []
    for name in os.listdir(commits_dir):
        if name.endswith(".json"):
            with open(os.path.join(commits_dir, name)) as f:
                commits.append(json.load(f))
    return sorted(commits, key=lambda c: c.get("seq", 0))


def read_triples(
    spark: SparkSession, out_dir: str, as_of: int | None = None
) -> DataFrame:
    """Manifest-gated read: only COMMITTED data directories are scanned
    (half-written commits without a manifest are invisible); ``as_of`` reads
    the store as of that commit seq — time travel over the triple store.
    """
    commits = list_commits(out_dir)
    if as_of is not None:
        commits = [c for c in commits if c.get("seq", 0) <= as_of]
    paths = [
        os.path.join(out_dir, "triples", f"commit={c['commit_id']}")
        for c in commits
    ]
    existing = [p for p in paths if os.path.isdir(p)]
    if not existing:
        # no committed data → empty frame with the store path's layout is
        # unknowable; raise like a missing-table read would
        raise FileNotFoundError(f"no committed triples under {out_dir}")
    # basePath keeps partition discovery rooted at the store, so both the
    # commit= and source= partition columns survive into the schema
    return (
        spark.read.option("basePath", os.path.join(out_dir, "triples"))
        .parquet(*existing)
    )


def read_metrics(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(out_dir, "metrics"))
