"""A/B equivalence check for the round-7 link_mentions/link_surfaces rewrite.

Compares the map-probe implementations against the round-6 explode+groupBy
formulation (reproduced inline below) on the real sf corpus: exceptAll in both
directions must be empty, row counts equal. Run at sf0.01 and sf0.1.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from kgtm.extract import extract_mentions  # noqa: E402
from kgtm.link import link_mentions, link_surfaces  # noqa: E402
from kgtm.normalize import candidate_paths_col, parse_iri_cols  # noqa: E402
from kgtm.session import get_spark  # noqa: E402
from kgtm.transcripts import events_to_transcripts, ontology_index_df  # noqa: E402


def link_mentions_r6(mentions: DataFrame, index: DataFrame) -> DataFrame:
    """The round-6 explode + broadcast join + groupBy(min_by) formulation."""
    cands = mentions.select(
        "mention_id", "conv_id", "turn_idx", "surface", "host", "path",
        F.explode(candidate_paths_col("path")).alias("cand"),
    ).select(
        "mention_id", "conv_id", "turn_idx", "surface", "host", "path",
        F.col("cand.rung").alias("rung"),
        F.col("cand.cand_path").alias("cand_path"),
    )
    dict_side = index.select(
        F.col("host").alias("d_host"), F.col("path").alias("d_path"), "ontology_iri"
    )
    host_only = (
        index.select(F.col("host").alias("d_host"))
        .distinct()
        .withColumn("d_path", F.lit(None).cast("string"))
        .withColumn("ontology_iri", F.lit(None).cast("string"))
    )
    dict_full = F.broadcast(dict_side.unionByName(host_only))
    probed = cands.join(
        dict_full,
        (cands["host"] == dict_full["d_host"])
        & cands["cand_path"].eqNullSafe(dict_full["d_path"]),
        "left",
    )
    hit_rung = F.when(F.col("d_host").isNotNull(), F.col("rung"))
    return probed.groupBy("mention_id").agg(
        F.first("conv_id").alias("conv_id"),
        F.first("turn_idx").alias("turn_idx"),
        F.first("surface").alias("surface"),
        F.first("host").alias("host"),
        F.first("path").alias("path"),
        F.min_by(F.struct("ontology_iri", "cand_path", "rung"), hit_rung).alias("best"),
    ).select(
        "mention_id", "conv_id", "turn_idx", "surface", "host", "path",
        F.col("best").isNotNull().alias("is_linked"),
        F.col("best.ontology_iri").alias("ontology_iri"),
        F.col("best.cand_path").alias("canonical_path"),
        F.col("best.rung").alias("rung"),
    )


def link_surfaces_r6(surfaces: DataFrame, index: DataFrame) -> DataFrame:
    cands = surfaces.select(
        "surface", "host", F.explode(candidate_paths_col("path")).alias("cand")
    ).select(
        "surface", "host",
        F.col("cand.rung").alias("rung"),
        F.col("cand.cand_path").alias("cand_path"),
    )
    dict_side = index.select(
        F.col("host").alias("d_host"), F.col("path").alias("d_path"), "ontology_iri"
    )
    host_only = (
        index.select(F.col("host").alias("d_host"))
        .distinct()
        .withColumn("d_path", F.lit(None).cast("string"))
        .withColumn("ontology_iri", F.lit(None).cast("string"))
    )
    dict_full = F.broadcast(dict_side.unionByName(host_only))
    hits = cands.join(
        dict_full,
        (cands["host"] == dict_full["d_host"])
        & cands["cand_path"].eqNullSafe(dict_full["d_path"]),
        "inner",
    )
    best = hits.groupBy("surface").agg(
        F.min_by(F.struct("ontology_iri", "cand_path", "rung"), F.col("rung")).alias("best")
    )
    return surfaces.join(best, "surface", "left").select(
        "surface", "host", "path",
        F.col("best").isNotNull().alias("is_linked"),
        F.col("best.ontology_iri").alias("ontology_iri"),
        F.col("best.cand_path").alias("canonical_path"),
        F.col("best.rung").alias("rung"),
    )


def compare(name: str, new: DataFrame, old: DataFrame) -> None:
    n_new, n_old = new.count(), old.count()
    d1 = new.exceptAll(old).count()
    d2 = old.exceptAll(new).count()
    ok = n_new == n_old and d1 == 0 and d2 == 0
    print(f"{name}: rows new={n_new} old={n_old} new-old={d1} old-new={d2} "
          f"schema_eq={[ (f.name, f.dataType.simpleString()) for f in new.schema.fields ] == [ (f.name, f.dataType.simpleString()) for f in old.schema.fields ]} "
          f"-> {'OK' if ok else 'MISMATCH'}")
    if not ok:
        sys.exit(1)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="ab-link", shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    tr = events_to_transcripts(ev)
    m = extract_mentions(tr)
    idx = ontology_index_df(spark)
    compare("link_mentions", link_mentions(m, idx), link_mentions_r6(m, idx))

    surfaces = (
        tr.select(F.explode(F.array("text")).alias("t"))
        .select(F.explode(F.regexp_extract_all("t", F.lit(r"(https?://[A-Za-z0-9.\-]+(?:/[A-Za-z0-9./#_\-]*)?)"), 1)).alias("surface"))
        .distinct()
        .select("surface", *parse_iri_cols("surface"))
    )
    compare("link_surfaces", link_surfaces(surfaces, idx), link_surfaces_r6(surfaces, idx))
    spark.stop()


if __name__ == "__main__":
    main()
