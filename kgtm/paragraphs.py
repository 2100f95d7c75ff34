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
    paragraphs are dropped from the output (C4 drops empty docs too);
  - NULL-text documents explode to no paragraph rows and are dropped
    (split(NULL) — the DuckDB twin's unnest over a NULL split agrees,
    pytest-pinned).

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


def candidate_cond(min_chars: int) -> "F.Column":
    """A paragraph is a dedup candidate iff its space-trimmed length clears
    ``min_chars`` — the one predicate shared by the batch and streaming
    paths and the DuckDB twin."""
    return F.length(F.trim(F.col("para"))) >= F.lit(min_chars)


def exploded_paragraphs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(doc_id, [extra_cols...,] n_paras, pos, para): one row per paragraph
    in document order. ``sep`` is a LITERAL separator (quoted with \\Q..\\E
    for Java regex — matching DuckDB's string_split); limit -1 keeps
    trailing empties so a duplicate-free corpus reassembles
    byte-identically. ``extra_cols`` pass through (e.g. the event-time
    column the streaming variant watermarks on).

    A sep containing the literal sequence ``\\E`` would terminate a naive
    \\Q..\\E quote early and turn the tail of sep into live regex — so the
    quote is rebuilt the way java.util.regex.Pattern.quote does it:
    split on ``\\E`` and stitch the segments with an escaped ``\\E``
    (``\\Q..\\E\\\\E\\Q..\\E``), keeping every byte of sep literal."""
    pat = "\\Q" + sep.replace("\\E", "\\E\\\\E\\Q") + "\\E"
    return df.select(
        F.col(id_col).alias("doc_id"),
        *extra_cols,
        F.split(F.col(text_col), pat, -1).alias("_paras"),
    ).select(
        "doc_id",
        *extra_cols,
        F.size("_paras").alias("n_paras"),
        F.posexplode("_paras").alias("pos", "para"),
    )


def kept_paragraphs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
    min_chars: int = 20,
) -> DataFrame:
    """(doc_id, pos, n_paras, para): the surviving paragraph rows —
    non-candidates in place plus the corpus-global first occurrence of
    every candidate digest."""
    ex = exploded_paragraphs(df, text_col, id_col, sep)
    is_cand = candidate_cond(min_chars)
    # survivor per digest = min (doc_id, pos); the struct carries n_paras
    # and the paragraph text so no join back is needed. (doc_id, pos) is a
    # unique prefix, so the trailing fields never influence the ordering.
    survivors = (
        ex.filter(is_cand)
        .groupBy(F.md5("para").alias("digest"))
        .agg(F.min(F.struct("doc_id", "pos", "n_paras", "para")).alias("first"))
        .select("first.doc_id", "first.pos", "first.n_paras", "first.para")
    )
    return ex.filter(~is_cand).select("doc_id", "pos", "n_paras", "para").unionByName(
        survivors
    )


def reassemble_paragraphs(kept: DataFrame, sep: str = "\n") -> DataFrame:
    """(doc_id, text, n_paras, n_kept): fold kept paragraph rows back into
    documents in original paragraph order. Docs with zero kept rows vanish
    from the GROUP BY (C4 drops empty docs too)."""
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


def paragraph_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
    min_chars: int = 20,
) -> DataFrame:
    """(doc_id, text, n_paras, n_kept): corpus-global first-occurrence
    paragraph dedup — kept_paragraphs ∘ reassemble_paragraphs."""
    return reassemble_paragraphs(
        kept_paragraphs(df, text_col, id_col, sep, min_chars), sep
    )
