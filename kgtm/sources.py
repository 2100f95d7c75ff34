"""Source connectors for the reference's own data formats.

A user of the reference has: ``archivo_ontologies.txt`` (one ontology URL per
line — ontologytimemachine/utils/archivo_ontologies.txt, read at
download_archivo_urls.py:103-132) and the Archivo index CSV (column 0 is the
ontology URL — download_archivo_urls.py:76-83). These readers turn either
into the ontology_index table this engine consumes, so switching requires no
data migration.

Change detection: the reference keeps a SHA-256 of the downloaded file
(download_archivo_urls.py:41-46,65-74); ``index_digest`` is the table-level
analog — a content hash that is stable under row order, suitable for
"recompute the broadcast only when the snapshot changed" logic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kgtm.normalize import parse_iri_cols


def _classify_iri_type(iri_col: str = "ontology_iri", path_col: str = "path"):
    """hash (# convention, even a bare trailing '#'), slash (trailing /),
    else term — the iri_type taxonomy of tests/archivo_test_IRIs.tsv."""
    return (
        F.when(F.col(iri_col).contains("#"), F.lit("hash"))
        .when(F.col(path_col).endswith("/"), F.lit("slash"))
        .otherwise(F.lit("term"))
    )


def read_ontology_index_txt(spark: SparkSession, path: str) -> DataFrame:
    """One-URL-per-line txt → ontology_index(ontology_iri, host, path, iri_type)."""
    lines = spark.read.text(path).select(F.trim("value").alias("ontology_iri"))
    lines = lines.filter(F.col("ontology_iri") != "")
    parsed = lines.select("ontology_iri", *parse_iri_cols("ontology_iri"))
    return parsed.select(
        "ontology_iri",
        "host",
        "path",
        _classify_iri_type().alias("iri_type"),
    )


def read_archivo_index_csv(spark: SparkSession, path: str) -> DataFrame:
    """Archivo index CSV (no header; keep column 0 = ontology URL) →
    ontology_index. Mirrors download_archivo_urls.py:76-83."""
    raw = spark.read.option("header", "false").csv(path)
    lines = raw.select(F.trim(F.col("_c0")).alias("ontology_iri")).filter(
        F.col("ontology_iri") != ""
    )
    parsed = lines.select("ontology_iri", *parse_iri_cols("ontology_iri"))
    return parsed.select(
        "ontology_iri", "host", "path", _classify_iri_type().alias("iri_type")
    )


def index_digest(index: DataFrame) -> str:
    """Order-insensitive SHA-256 of the dictionary contents (A2 analog).

    xor-free construction: sha2 per row, then bit_xor-equivalent via
    aggregating sorted hashes — we hash the sorted concatenation's running
    aggregate with sum of per-row hashes interpreted as numbers, which is
    order-insensitive and collision-resistant enough for change detection.
    """
    row_hash = F.sha2(F.concat_ws("|", "ontology_iri", "host", "path"), 256)
    agg = index.select(
        F.sum(F.conv(F.substring(row_hash, 1, 15), 16, 10).cast("decimal(38,0)")).alias("s"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    import hashlib

    return hashlib.sha256(f"{agg.s}:{agg.n}".encode()).hexdigest()
