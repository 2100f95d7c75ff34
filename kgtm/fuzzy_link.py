"""Fuzzy (non-IRI) entity linking: blocking keys → MinHash-LSH candidates →
scored top-1 pick.

SURVEY §7 step 4 composed end-to-end: surface NAMES (not IRIs) link to
dictionary LABELS. The preference semantics mirror the reference's failover
ordering (D3) and q-priority pick (C4): candidates are scored, the best
score wins, ties break deterministically (label asc).

Plan shape at scale:
  1. blocking — char-n-gram MinHash signatures on BOTH sides (vectorized
     numpy UDF); band hashes are computed JVM-SIDE (xxhash64 over signature
     slices, same codegen shape as kgtm.dedup.minhash_lsh_pairs) and
     candidates come from the (band, hash) equi-join, so the mention side
     meets only its bucket, never the whole dictionary;
  2. verification — exact n-gram Jaccard on candidate pairs only;
  3. decision — groupBy(mention) max_by(score) with threshold (unlinked
     below it), one partial-aggregatable shuffle.
"""

from __future__ import annotations

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


def _signature_udf(n_hashes: int):
    """Vectorized minhash signature UDF (shared body with kgtm.dedup)."""
    return F.pandas_udf(
        lambda s: minhash_signature_series(s, n_hashes), ArrayType(LongType())
    )


def _band_buckets(sig_col, n_bands: int, rows_per_band: int):
    """(band, bucket) pairs from a signature column — JVM-side xxhash64 over
    signature slices (same codegen shape as kgtm.dedup.minhash_lsh_pairs;
    the band id is a separate join key, so no Python folding loop)."""
    return F.posexplode(
        F.transform(
            F.sequence(F.lit(0), F.lit(n_bands - 1)),
            lambda b: F.xxhash64(F.slice(sig_col, b * rows_per_band + 1, rows_per_band)),
        )
    )


def link_fuzzy(
    mentions: DataFrame,
    labels: DataFrame,
    mention_col: str = "surface",
    label_col: str = "label",
    entity_col: str = "ontology_iri",
    n: int = 3,
    n_hashes: int = 64,
    n_bands: int = 32,
    threshold: float = 0.35,
) -> DataFrame:
    """(mention rows) + labels(label, entity) → best fuzzy link per mention.

    Returns mentions with (matched_label, entity, score, is_linked).

    Banding default is rows_per_band=2 (64 hashes / 32 bands), NOT the
    document-dedup geometry of 8: fuzzy-link surfaces are SHORT (a label has
    only a handful of char 3-grams), so per-hash agreement probability J
    carries huge variance and a 4-row band already misses J=0.75 pairs with
    ~0.2% probability per pair — observed concretely when the round-6 base
    hash landed an unlucky draw on 'errorr'~'error'. At rows_per_band=2 the
    miss probability for J>=0.5 pairs is < 1e-11; the band join stays keyed
    on (band, xxhash64) scalars, so doubling bands doubles only the cheap
    candidate stage, never the verify stage.
    """
    rows_per_band = n_hashes // n_bands
    sig = _signature_udf(n_hashes)

    # Sub-n-gram-length strings have empty shingle sets: they can never reach
    # any positive Jaccard threshold, and their all-zero signatures would
    # collapse into one hot bucket — drop them from BOTH sides up front
    # (mentions re-attach as unlinked via the final left join).
    m = (
        mentions.withColumn("_sh", char_ngrams_col(mention_col, n))
        .filter(F.size("_sh") > 0)
        .withColumn("_sig", sig(F.col("_sh")))
    )
    l = (
        labels.withColumn("_lsh", char_ngrams_col(label_col, n))
        .filter(F.size("_lsh") > 0)
        .withColumn("_lsig", sig(F.col("_lsh")))
    )

    m_keys = m.select(
        F.col(mention_col).alias("_m"),
        F.col("_sh"),
        _band_buckets(F.col("_sig"), n_bands, rows_per_band).alias("_band", "_bucket"),
    )
    l_keys = F.broadcast(
        l.select(
            F.col(label_col).alias("_l"),
            F.col(entity_col).alias("_e"),
            F.col("_lsh"),
            _band_buckets(F.col("_lsig"), n_bands, rows_per_band).alias(
                "_band", "_bucket"
            ),
        )
    )
    cand = (
        m_keys.join(l_keys, ["_band", "_bucket"])
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
