"""Accessibility/error taxonomy + pivot matrix — the metrics aggregation.

Reference: experiments/aggregate_results.py —
  map_error_to_category (:60-72): CASE over (error_type, specific) → 4
      transport categories
  is_correct_mimetype / is_rdf_mimetype (:75-89): membership checks
  process_data (:92-151): grouped counting into a 15-category taxonomy × 3
      formats, plus the "correct for all 3 formats" per-URL conjunction —
      a two-level aggregation
  write_to_tsv (:154-187): the pivoted matrix sink

Batch translation over our resolution output: category = CASE over
(source, rung, snapshot presence); pivot column = role (the per-request
format analog); the all-formats conjunction becomes "conversation fully
linked across every role it spoke in".
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Batch linkage taxonomy. The reference's 15-category accessibility taxonomy
# (REFERENCE_CATEGORIES below) also covers live-transport failure modes
# (DNS / connection / TLS / redirects) that have NO batch analog here — a
# batch job over already-materialized tables never performs live fetches, so
# those dimensions only appear via map_error_to_category when classifying
# recorded error logs, not in the linkage CASE below.
CATEGORIES = [
    "exact-linked",          # rung 0 hit
    "normalized-linked",     # rung 1-5 hit (path was repaired)
    "linked-no-snapshot",    # in dictionary, no version available (404 analog)
    "unlinked",              # outside the dictionary
    "denied",                # restrictedAccess refusals (403 analog)
]

# The reference's full 15-category accessibility taxonomy
# (aggregate_results.py:38-57).
REFERENCE_CATEGORIES = [
    "unsuccessful payload retrieval",
    "DNS issue",
    "Con. / transport issue",
    "TLS cert issue",
    "Too many redirects",
    "Non-200 HTTP code",
    "Successful request (code 200)",
    "0 bytes content",
    "no rdf content (0 triples parsable)",
    "partially parsable rdf-content",
    "fully parsable rdf-content",
    "no RDF mimetype",
    "confused RDF mimetype",
    "correct mimetype",
    "correct for all 3 formats",
]


def map_error_to_category(error_type: str, type_more_specific: str | None = None) -> str:
    """Pure port of the reference's error→category CASE
    (aggregate_results.py:60-72): exception class name (+ more-specific
    detail) → transport category."""
    if error_type == "TooManyRedirects":
        return "Too many redirects"
    if error_type == "SSLError":
        return "TLS cert issue"
    if error_type == "ConnectionError" and type_more_specific == "NameResolutionError":
        return "DNS issue"
    return "Con. / transport issue"


def error_dimension_category(error_dimension: str, expected_error: str) -> str:
    """Map the golden-TSV failure dimensions (tests/archivo_test_IRIs.tsv:
    error_dimension × expected_error) onto REFERENCE_CATEGORIES."""
    if error_dimension == "dns":
        return "DNS issue"
    if error_dimension == "transport":
        return (
            "TLS cert issue"
            if expected_error == "cert-expired"
            else "Con. / transport issue"
        )
    if error_dimension == "http-code":
        return "Non-200 HTTP code"
    if error_dimension == "content":
        return "0 bytes content" if expected_error == "0-bytes" else "no RDF mimetype"
    return "Successful request (code 200)"

RDF_MIMETYPES = [
    "application/rdf+xml",
    "application/owl+xml",
    "text/turtle",
    "application/n-triples",
    "text/n3",
    "application/trig",
    "application/n-quads",
    "application/ld+json",
    "text/rdf+n3",
    "application/x-turtle",
    "application/xml",
    "text/xml",
    "text/plain",
    "application/json",
]


def category_col(
    source: str = "source", rung: str = "rung", outcome: str | None = None
) -> Column:
    """CASE cascade → taxonomy category (map_error_to_category analog)."""
    s, r = F.col(source), F.col(rung)
    base = (
        F.when(s == "denied", F.lit("denied"))
        .when(s.isin("unlinked"), F.lit("unlinked"))
        .when(s == "not-found", F.lit("linked-no-snapshot"))
        .when(r == 0, F.lit("exact-linked"))
        .otherwise(F.lit("normalized-linked"))
    )
    if outcome:
        base = F.when(F.col(outcome) == "denied", F.lit("denied")).otherwise(base)
    return base


def is_rdf_mimetype_col(mime: str | Column = "mime") -> Column:
    m = F.col(mime) if isinstance(mime, str) else mime
    return m.isin(RDF_MIMETYPES)


def accessibility_matrix(
    resolved: DataFrame,
    pivot_col: str = "role",
    pivot_values: list[str] | None = None,
) -> DataFrame:
    """category × pivot counts (process_data's 15x3 matrix analog).

    Pass pivot_values explicitly in production: an unpinned pivot triggers a
    distinct-values collect job AND makes the output schema data-dependent.
    """
    cat = resolved.withColumn("category", category_col())
    piv = cat.groupBy("category").pivot(pivot_col, pivot_values)
    return piv.agg(F.count(F.lit(1))).na.fill(0)


def dual_accessibility_matrix(
    direct: DataFrame,
    proxied: DataFrame,
    modes: tuple[str, str] = ("direct", "proxy"),
) -> DataFrame:
    """Two-source comparative matrix — the dual-log aggregation stage
    (aggregate_results.py:154-166: the same process_data runs over the
    no-proxy and with-proxy logs and the two matrices print side by side).

    Inputs are two resolved logs over the SAME requests (e.g.
    resolve_links(..., 'original') vs resolve_links(..., 'latestArchived')).
    Rows are (category, source) of the response-outcome taxonomy; columns
    are per-run-mode counts, so the comparison ("with the proxy these
    requests resolve to versioned snapshots; without it they are all
    pass-through originals") is one DataFrame.
    """
    cat = (
        F.when(~F.col("is_linked"), F.lit("unlinked"))
        .when(F.col("source") == "not-found", F.lit("linked-no-snapshot"))
        .when(F.col("rung") == 0, F.lit("exact-linked"))
        .otherwise(F.lit("normalized-linked"))
    )
    both = direct.select(
        F.lit(modes[0]).alias("run_mode"), cat.alias("category"), "source"
    ).unionByName(
        proxied.select(
            F.lit(modes[1]).alias("run_mode"), cat.alias("category"), "source"
        )
    )
    return (
        both.groupBy("category", "source")
        .pivot("run_mode", list(modes))
        .agg(F.count(F.lit(1)))
        .na.fill(0)
    )


def fully_linked_conversations(resolved: DataFrame) -> DataFrame:
    """Two-level aggregation: conversations whose EVERY mention linked, per
    role coverage — the "correct for all 3 formats" conjunction analog
    (aggregate_results.py:148-150)."""
    per_conv = resolved.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n_mentions"),
        F.sum(F.when(F.col("is_linked"), 1).otherwise(0)).alias("n_linked"),
        F.count_distinct("role").alias("n_roles"),
    )
    return per_conv.select(
        "conv_id",
        "n_mentions",
        "n_roles",
        (F.col("n_linked") == F.col("n_mentions")).alias("fully_linked"),
    )
