"""Fuzzy (non-IRI) entity linking: blocking keys → MinHash-LSH candidates →
scored top-1 pick.

SURVEY §7 step 4 composed end-to-end: surface NAMES (not IRIs) link to
dictionary LABELS. The preference semantics mirror the reference's failover
ordering (D3) and q-priority pick (C4): candidates are scored, the best
score wins, ties break deterministically (label asc).

Plan shape at scale:
  1. blocking — char-n-gram MinHash band hashes on BOTH sides (vectorized
     numpy UDF); candidates come from the (band, hash) equi-join, so the
     mention side meets only its bucket, never the whole dictionary;
  2. verification — exact n-gram Jaccard on candidate pairs only;
  3. decision — groupBy(mention) max_by(score) with threshold (unlinked
     below it), one partial-aggregatable shuffle.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType

from kgtm.dedup import minhash_signature_series


def char_ngrams_col(text: str, n: int = 3):
    """Distinct character n-grams of a lowercased, space-collapsed string."""
    norm = F.regexp_replace(F.trim(F.lower(F.col(text))), r"\s+", " ")
    idx = F.sequence(F.lit(0), F.length(norm) - F.lit(n))
    return F.when(F.length(norm) < n, F.array().cast("array<string>")).otherwise(
        F.array_distinct(
            F.transform(idx, lambda i: norm.substr(i + F.lit(1), F.lit(n)))
        )
    )


def _band_udf(n_hashes: int, n_bands: int):
    rows_per_band = n_hashes // n_bands

    def _fold(vals: list[int], b: int) -> int:
        # stable band hash (NOT Python hash() — that is per-process seeded);
        # band id mixed in multiplicatively, result kept inside int64
        acc = 1469598103934665603 ^ (b * 0x9E3779B97F4A7C15)
        for v in vals:
            acc = ((acc ^ int(v)) * 1099511628211) & ((1 << 62) - 1)
        return acc

    def bands(shingle_lists: pd.Series) -> pd.Series:
        sigs = minhash_signature_series(shingle_lists, n_hashes)
        return sigs.map(
            lambda sig: [
                _fold(sig[b * rows_per_band : (b + 1) * rows_per_band], b)
                for b in range(n_bands)
            ]
        )

    return F.pandas_udf(bands, ArrayType(LongType()))


def link_fuzzy(
    mentions: DataFrame,
    labels: DataFrame,
    mention_col: str = "surface",
    label_col: str = "label",
    entity_col: str = "ontology_iri",
    n: int = 3,
    n_hashes: int = 64,
    n_bands: int = 16,
    threshold: float = 0.35,
) -> DataFrame:
    """(mention rows) + labels(label, entity) → best fuzzy link per mention.

    Returns mentions with (matched_label, entity, score, is_linked).
    """
    bands = _band_udf(n_hashes, n_bands)

    m = mentions.withColumn("_sh", char_ngrams_col(mention_col, n)).withColumn(
        "_bands", bands(F.col("_sh"))
    )
    l = labels.withColumn("_lsh", char_ngrams_col(label_col, n)).withColumn(
        "_lbands", bands(F.col("_lsh"))
    )

    m_keys = m.select(
        F.col(mention_col).alias("_m"),
        F.col("_sh"),
        F.explode("_bands").alias("_bucket"),
    )
    l_keys = F.broadcast(
        l.select(
            F.col(label_col).alias("_l"),
            F.col(entity_col).alias("_e"),
            F.col("_lsh"),
            F.explode("_lbands").alias("_bucket"),
        )
    )
    cand = (
        m_keys.join(l_keys, "_bucket")
        .select("_m", "_sh", "_l", "_e", "_lsh")
        .distinct()
    )
    inter = F.size(F.array_intersect("_sh", "_lsh"))
    union = F.size("_sh") + F.size("_lsh") - inter
    scored = cand.withColumn(
        "_score", F.when(union > 0, inter / union).otherwise(F.lit(0.0))
    ).filter(F.col("_score") >= threshold)
    # decision: max score per mention; ties break on MIN label (deterministic)
    best = (
        scored.groupBy("_m", "_score")
        .agg(F.min(F.struct("_l", "_e")).alias("le"))
        .groupBy("_m")
        .agg(F.max_by(F.struct("_score", "le"), "_score").alias("b"))
        .select(
            F.col("_m"),
            F.col("b._score").alias("score"),
            F.col("b.le._l").alias("matched_label"),
            F.col("b.le._e").alias("matched_entity"),
        )
    )
    return (
        mentions.join(best, mentions[mention_col] == best["_m"], "left")
        .drop("_m")
        .withColumn("is_linked", F.col("matched_entity").isNotNull())
    )
