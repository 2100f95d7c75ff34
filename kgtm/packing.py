"""Training-sequence shaping: fixed token-window chunking and greedy
sequence packing — the last mile between a curated corpus and a trainer's
fixed-length batches.

Reference parity note: no training-data surface exists in the reference
proxy; this extends the LLM-data-pipeline tier, value-checked against
DuckDB twins (kgtm.oracles.q_chunk_token_windows / q_pack_greedy — the
packing twin replays the same greedy walk as a recursive CTE).

Scale shape (100 TB): chunking is a pure per-row array expression (zero
shuffle, fuses into the scan). Packing is ONE shuffle on a shard key the
caller sizes (n_shards ~ executor count x a few); within a shard the greedy
walk is inherently sequential — the standard practice this mirrors — so
shards are the parallelism unit and per-shard state is one integer
accumulator, never the documents themselves.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kgtm.textstats import token_count_col, words_col_guarded

__all__ = ["chunk_token_windows", "pack_greedy"]


def chunk_token_windows(
    df: DataFrame,
    window: int = 64,
    stride: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    drop_incomplete: bool = False,
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(doc_id, [extra_cols...,] win_idx, start_tok, n_tokens, chunk) — the
    document split into ``window``-token chunks every ``stride`` tokens
    (default non-overlapping, stride=window). The final partial chunk is
    kept unless ``drop_incomplete`` (the usual trainer setting). Empty
    documents emit no rows. ``extra_cols`` pass through unchanged (e.g. the
    ``epoch`` column of a mixture-sampled corpus, which keeps replicated
    doc_ids distinguishable downstream). Pure array expressions; the
    explode is the only fan-out."""
    if stride is None:
        stride = window
    if window <= 0 or stride <= 0:
        raise ValueError("window and stride must be positive")
    base = df.select(
        F.col(id_col).alias("doc_id"),
        *extra_cols,
        words_col_guarded(F.col(text_col)).alias("words"),
    )
    n = F.size("words")
    n_wins = F.ceil(n / F.lit(stride)).cast("int")
    wins = F.when(n <= 0, F.array().cast("array<int>")).otherwise(
        F.sequence(F.lit(0), n_wins - 1).cast("array<int>")
    )
    chunk = lambda j: F.slice(F.col("words"), j * stride + 1, window)  # noqa: E731
    # the window array is exactly [0..n_wins-1], so the element IS the index
    out = (
        base.select("doc_id", *extra_cols, "words", F.explode(wins).alias("j"))
        .select(
            "doc_id",
            *extra_cols,
            F.col("j").alias("win_idx"),
            (F.col("j") * stride).alias("start_tok"),
            F.size(chunk(F.col("j"))).alias("n_tokens"),
            F.concat_ws(" ", chunk(F.col("j"))).alias("chunk"),
        )
    )
    if drop_incomplete:
        out = out.where(F.col("n_tokens") == window)
    return out


def pack_greedy(
    df: DataFrame,
    budget: int = 2048,
    n_shards: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    order_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(doc_id, [order_cols...,] shard, n_tokens, pack_idx, pack_off) —
    greedy sequential packing of documents into ``budget``-token packs,
    sharded by ``pmod(doc_id, n_shards)`` and walked in (doc_id,
    *order_cols) order within a shard: a document opens a new pack exactly
    when the current pack is non-empty and would overflow; an oversize
    document (> budget tokens) sits alone in its own pack. Deterministic
    given (budget, n_shards) — when the input can carry duplicate ids
    (e.g. mixture-sampled epochs), pass the disambiguating column(s) as
    ``order_cols`` or the within-shard walk order is partition-dependent.

    applyInPandas per shard — the walk is one integer accumulation over the
    shard's (doc_id, n_tokens) pairs, vector-fetched as numpy; text never
    enters the group payload.
    """
    if budget <= 0 or n_shards <= 0:
        raise ValueError("budget and n_shards must be positive")
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        *order_cols,
        F.pmod(F.col(id_col), F.lit(n_shards)).cast("int").alias("shard"),
        token_count_col(F.col(text_col)).alias("n_tokens"),
    )

    def walk(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["doc_id", *order_cols], ignore_index=True)
        packs, offs = [], []
        pack, acc = 0, 0
        for t in pdf["n_tokens"].to_numpy():
            if acc > 0 and acc + t > budget:
                pack, acc = pack + 1, 0
            packs.append(pack)
            offs.append(acc)
            acc += int(t)
        pdf["pack_idx"] = pd.array(packs, dtype="int64")
        pdf["pack_off"] = pd.array(offs, dtype="int64")
        return pdf

    from pyspark.sql.types import LongType, StructField, StructType

    schema = StructType(
        list(toks.schema.fields)
        + [StructField("pack_idx", LongType()), StructField("pack_off", LongType())]
    )
    return toks.groupBy("shard").applyInPandas(walk, schema)
