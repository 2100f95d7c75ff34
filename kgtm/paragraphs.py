"""Paragraph-level exact deduplication (C4 / RefinedWeb style).

Reference scope note: the reference engine (dbpedia/ontology-time-machine,
a ~1.4k-LoC ontology-resolution proxy) has no corpus-prep tier; this module
extends the engine's LLM-training-data suite — the practical companion to
document-level dedup (kgtm/dedup.py): a boilerplate paragraph (cookie
banner, license header, nav footer) duplicated across millions of pages is
removed everywhere but its first occurrence, while the documents themselves
survive.

Semantics (first-occurrence-wins, corpus-global):

  - a document's paragraphs are ``split(text, sep)`` — empty trailing
    paragraphs included, so a corpus with NO duplicate paragraphs
    round-trips byte-identically;
  - a paragraph is a dedup CANDIDATE iff ``length(trim(p)) >= min_chars``
    (short/blank paragraphs — headings, separators, list bullets — carry
    no dedup signal and are always kept in place);
  - among all copies of a candidate paragraph, the one with the smallest
    (doc_id, pos) survives; every other copy is dropped from its document;
  - each document's text is reassembled from its kept paragraphs in
    original order, joined with ``sep``; documents left with zero kept
    paragraphs are dropped from the output (C4 drops empty docs too).

Scale shape (100 TB): exactly two shuffles, both skew-safe.

  1. One hash aggregation keyed on the 128-bit paragraph digest with
     map-side partial aggregation (min-struct + count combine): a paragraph
     duplicated a billion times reaches its reducer as one pre-combined row
     per upstream partition — never a window sort over the hot key. The
     aggregate's output IS the survivor set (the min-struct carries
     doc_id/pos/text), so there is no join back to the exploded frame.
  2. One aggregation keyed on doc_id to reassemble kept paragraphs in
     order (collect_list + array_sort — per-doc data, bounded by the
     document length).

The exploded paragraph frame feeds both the candidate aggregate and the
always-kept branch; recomputing the narrow split/posexplode twice is
cheaper at scale than materializing the explosion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def paragraph_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
    min_chars: int = 20,
) -> DataFrame:
    """(doc_id, text, n_paras, n_kept): corpus-global first-occurrence
    paragraph dedup. ``sep`` is a LITERAL separator (quoted with \\Q..\\E
    for Java regex), matching DuckDB's string_split in the oracle twin."""
    # \Q..\E literal-quotes sep for Java regex; limit -1 keeps trailing
    # empties so a duplicate-free corpus reassembles byte-identically.
    pat = "\\Q" + sep + "\\E"
    ex = df.select(
        F.col(id_col).alias("doc_id"),
        F.split(F.col(text_col), pat, -1).alias("_paras"),
    ).select(
        "doc_id",
        F.size("_paras").alias("n_paras"),
        F.posexplode("_paras").alias("pos", "para"),
    )
    is_cand = F.length(F.trim(F.col("para"))) >= F.lit(min_chars)
    # survivor per digest = min (doc_id, pos); the struct carries n_paras
    # and the paragraph text so no join back is needed. (doc_id, pos) is a
    # unique prefix, so the trailing fields never influence the ordering.
    survivors = (
        ex.filter(is_cand)
        .groupBy(F.md5("para").alias("digest"))
        .agg(F.min(F.struct("doc_id", "pos", "n_paras", "para")).alias("first"))
        .select("first.doc_id", "first.pos", "first.n_paras", "first.para")
    )
    kept = ex.filter(~is_cand).select("doc_id", "pos", "n_paras", "para").unionByName(survivors)
    return kept.groupBy("doc_id").agg(
        F.concat_ws(
            sep,
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "para"))),
                lambda s: s["para"],
            ),
        ).alias("text"),
        F.first("n_paras").alias("n_paras"),
        F.count(F.lit(1)).alias("n_kept"),
    )
