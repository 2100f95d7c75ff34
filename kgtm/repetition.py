"""Gopher-style repetition signals (Rae et al. 2021, Table A1): per-document
duplicate-line and duplicate/top n-gram character fractions — the standard
repetition filters an LLM pre-training pipeline runs before dedup.

Reference parity note: the reference proxy (ontology-time-machine) has no
text-quality surface; these operators extend the engine's LLM-data-pipeline
tier alongside kgtm.textstats / kgtm.dedup, value-checked against DuckDB
twins (kgtm.oracles.q_repetition_signals) rather than reference behavior.

Scale shape (100 TB): line signals are per-row array expressions (zero
shuffle). The n-gram signals explode ONE frame for all requested n values
and shuffle it ONCE, keyed (doc_id, n, gram), for the window count — keys
are doc-local, so the shuffle is perfectly distributable and per-key state
is bounded by the longest single document (pre-chunk pathological multi-GB
docs upstream with kgtm.packing.chunk_token_windows). The counted frame is
lazily checkpointed and feeds both consumers: the top-gram argmax reduces
straight to doc-cardinality; the dup-gram coverage branch additionally
shuffles covered-word-index triples (doc_id, n, idx) for the distinct and
joins them against the exploded word lengths — up to word-cardinality rows
on a fully duplicated corpus, but fixed-width int triples, a strictly
narrower payload than the gram-string shuffle that precedes them. No UDF
anywhere; the whole plan is codegen + hash aggregate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from kgtm.textstats import words_col_guarded

__all__ = ["repetition_signals"]


def _lines_expr(text: Column, sep: str) -> Column:
    """Non-empty trimmed lowercased lines."""
    raw = F.split(F.coalesce(F.lower(text), F.lit("")), sep, -1)
    return F.filter(F.transform(raw, F.trim), lambda l: l != "")


def _sum_lengths(arr: Column) -> Column:
    return F.aggregate(arr, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x))


def repetition_signals(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_ns: tuple[int, ...] = (2, 3, 4),
    dup_ns: tuple[int, ...] = (5, 10),
    line_sep: str = "\n",
) -> DataFrame:
    """One row per document with the Gopher repetition signals.

    Columns (all fractions rounded to 6 dp, 0.0 when the denominator is 0):

    - ``n_words``, ``total_chars`` — word count and summed word lengths
      (whitespace excluded; the denominator of every n-gram fraction).
    - ``n_lines``, ``dup_line_frac``, ``dup_line_char_frac`` — lines are
      non-empty trimmed lowercased ``line_sep`` splits; a line is a
      duplicate when it textually equals an earlier line.
    - ``top{n}_char_frac`` for n in ``top_ns`` — characters of the most
      frequent word n-gram (count x its non-space char length) over
      ``total_chars``. Tie-break is deterministic: max (count, char length,
      gram) lexicographically, matching the DuckDB twin.
    - ``dup{n}_char_frac`` for n in ``dup_ns`` — fraction of word
      characters COVERED by at least one n-gram occurring >= 2 times
      (coverage union, not per-occurrence double counting — the Gopher
      definition).
    """
    ns = sorted(set(top_ns) | set(dup_ns))
    base = df.select(
        F.col(id_col).alias("doc_id"),
        words_col_guarded(F.col(text_col)).alias("words"),
        _lines_expr(F.col(text_col), line_sep).alias("lines"),
    )

    # --- per-row (no shuffle): word/line totals + line-dup fractions ------
    n_lines = F.size("lines")
    line_chars = _sum_lengths(F.col("lines"))
    dist_lines = F.array_distinct("lines")
    dist_chars = _sum_lengths(dist_lines)
    per_row = base.select(
        "doc_id",
        "words",
        F.size("words").alias("n_words"),
        _sum_lengths(F.col("words")).alias("total_chars"),
        n_lines.alias("n_lines"),
        F.round(
            F.when(n_lines > 0, (n_lines - F.size(dist_lines)) / n_lines).otherwise(
                F.lit(0.0)
            ),
            6,
        ).alias("dup_line_frac"),
        F.round(
            F.when(line_chars > 0, (line_chars - dist_chars) / line_chars).otherwise(
                F.lit(0.0)
            ),
            6,
        ).alias("dup_line_char_frac"),
    )
    per_row = per_row.localCheckpoint(eager=False)  # words split computed once

    # --- one exploded frame for every n; one shuffle on (doc_id, n, gram) -
    def _gram_fn(n: int):
        # single-arg closure: transform() inspects lambda arity, so a
        # default-arg n would be misread as the (element, index) signature
        def g(i: Column) -> Column:
            return F.concat_ws(
                " ", *[F.get(F.col("words"), i + F.lit(k)) for k in range(n)]
            )

        return g

    gram_frames = []
    for n in ns:
        idx = F.sequence(F.lit(0), F.size("words") - F.lit(n))
        gram = _gram_fn(n)
        starts = F.when(
            F.size("words") < n, F.array().cast("array<int>")
        ).otherwise(idx.cast("array<int>"))
        gram_frames.append(
            per_row.select(
                "doc_id",
                F.lit(n).alias("n"),
                F.posexplode(F.transform(starts, gram)),
            ).select(
                "doc_id", "n", F.col("pos").alias("start"), F.col("col").alias("gram")
            )
        )
    grams = gram_frames[0]
    for g in gram_frames[1:]:
        grams = grams.unionByName(g)
    w = Window.partitionBy("doc_id", "n", "gram")
    grams = grams.select(
        "doc_id", "n", "start", "gram", F.count("*").over(w).alias("cnt")
    )
    grams = grams.localCheckpoint(eager=False)  # shared by top + coverage

    # --- top-n-gram char fraction ----------------------------------------
    glen = F.length("gram") - (F.col("n") - F.lit(1))  # words carry no spaces
    top = (
        grams.where(F.col("n").isin(list(top_ns)))
        .select("doc_id", "n", F.struct(F.col("cnt"), glen.alias("glen"), "gram").alias("s"))
        .groupBy("doc_id", "n")
        .agg(F.max("s").alias("best"))
        .select(
            "doc_id",
            "n",
            (F.col("best.cnt") * F.col("best.glen")).alias("top_chars"),
        )
    )

    # --- duplicate-n-gram coverage ---------------------------------------
    word_lens = per_row.select(
        "doc_id", F.posexplode("words").alias("idx", "word")
    ).select("doc_id", "idx", F.length("word").alias("wlen"))
    covered = (
        grams.where((F.col("cnt") >= 2) & F.col("n").isin(list(dup_ns)))
        .select(
            "doc_id",
            "n",
            F.explode(F.sequence(F.col("start"), F.col("start") + F.col("n") - 1)).alias(
                "idx"
            ),
        )
        .distinct()
        .join(word_lens, ["doc_id", "idx"])
        .groupBy("doc_id", "n")
        .agg(F.sum("wlen").alias("cov_chars"))
    )

    # --- assemble one row per doc (two map-joins, not one join per n) -----
    tops = top.groupBy("doc_id").agg(
        F.map_from_entries(F.collect_list(F.struct("n", "top_chars"))).alias("_topm")
    )
    covs = covered.groupBy("doc_id").agg(
        F.map_from_entries(F.collect_list(F.struct("n", "cov_chars"))).alias("_covm")
    )
    out = (
        per_row.drop("words").join(tops, "doc_id", "left").join(covs, "doc_id", "left")
    )

    def frac(m: str, n: int) -> Column:
        # try_element_at: ANSI-safe null on missing key / null map
        chars = F.coalesce(F.try_element_at(F.col(m), F.lit(n)), F.lit(0))
        return F.round(
            F.when(F.col("total_chars") > 0, chars / F.col("total_chars")).otherwise(
                F.lit(0.0)
            ),
            6,
        )

    for n in top_ns:
        out = out.withColumn(f"top{n}_char_frac", frac("_topm", n))
    for n in dup_ns:
        out = out.withColumn(f"dup{n}_char_frac", frac("_covm", n))
    return out.drop("_topm", "_covm")
