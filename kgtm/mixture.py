"""Training-mixture shaping: deterministic domain-weighted sampling
(fractional epochs per source, the "3 epochs of code, 0.3 of web" knob) and
the Gopher threshold filter over the repetition signals.

Reference parity note: no mixture surface exists in the reference proxy;
this extends the LLM-data-pipeline tier, value-checked against DuckDB twins
(kgtm.oracles.q_mixture_sample / q_repetition_filter).

Determinism contract: the fractional-copy decision hashes ``{id}:{salt}``
through md5 and compares the first 32 bits against a per-domain integer
threshold ``floor(frac(weight) * 2^32)`` — integer compare, no float
parity risk, reproducible bit-for-bit in DuckDB (and in any engine with
md5). Same id + same salt => same decision forever; change the salt to
draw an independent sample.

Scale shape (100 TB): the weight table is a LITERAL CASE expression (a
mixture config is dozens of domains, not millions) — zero joins, zero
shuffle; the epoch fan-out is a posexplode bounded by ceil(max weight).
The whole operator fuses into the scan.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kgtm.dedup import DEFAULT_MAX_SHINGLE_DF as _SHINGLE_DF_DEFAULT

__all__ = [
    "mixture_sample",
    "repetition_filter",
    "REPETITION_DEFAULTS",
    "split_assign",
    "leakage_safe_split",
]

_HASH_SPACE = 1 << 32


def _split_weight(dom, w: float) -> tuple[int, int]:
    if not (w >= 0) or math.isinf(w):
        raise ValueError(f"weight for {dom!r} must be finite and >= 0: {w}")
    whole = int(math.floor(w))
    return whole, int(math.floor((w - whole) * _HASH_SPACE))


def _copy_plan(weights: dict[str, float], default_weight: float):
    """(domain -> (whole copies, fractional 32-bit threshold), default pair).
    The default is returned separately so an explicit weight for any real
    domain value — including the empty string — is never clobbered."""
    plan = {dom: _split_weight(dom, w) for dom, w in weights.items()}
    return plan, _split_weight("<default>", default_weight)


def hash32_col(id_col: Column, salt: str) -> Column:
    """First 32 bits of md5('{id}:{salt}') as a long — the cross-engine
    uniform hash (DuckDB: CAST('0x' || substr(md5(...), 1, 8) AS UBIGINT))."""
    key = F.concat(id_col.cast("string"), F.lit(":" + salt))
    return F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long")


def mixture_sample(
    df: DataFrame,
    weights: dict[str, float],
    domain_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "mix",
    default_weight: float = 1.0,
) -> DataFrame:
    """Replicate each row ``n`` times with an ``epoch`` column (0..n-1),
    where ``n = floor(w) + (hash32(id, salt) < frac(w) * 2^32)`` and ``w``
    is the row's domain weight (``default_weight`` for unlisted domains).
    Weight 0 drops the domain; weight 2.25 gives every row 2 epochs and a
    deterministic 25% of rows a third. A null id never draws the
    fractional epoch (it keeps its floor(w) whole copies), matching the
    DuckDB twin's CASE semantics."""
    plan, (dw, dt) = _copy_plan(weights, default_weight)
    whole = F.lit(dw)
    thresh = F.lit(dt)
    for dom, (w_whole, w_thresh) in plan.items():
        is_dom = F.col(domain_col) == dom
        whole = F.when(is_dom, F.lit(w_whole)).otherwise(whole)
        thresh = F.when(is_dom, F.lit(w_thresh)).otherwise(thresh)
    frac_hit = F.coalesce(
        (hash32_col(F.col(id_col), salt) < thresh).cast("int"), F.lit(0)
    )
    n_copies = whole + frac_hit
    epochs = F.when(n_copies <= 0, F.array().cast("array<int>")).otherwise(
        F.sequence(F.lit(0), n_copies - 1).cast("array<int>")
    )
    return df.select("*", F.explode(epochs).alias("epoch"))


# Gopher (Rae et al. 2021, Table A1) repetition thresholds: a document is
# kept when every signal is at or below its cap.
REPETITION_DEFAULTS: dict[str, float] = {
    "dup_line_frac": 0.30,
    "dup_line_char_frac": 0.20,
    "top2_char_frac": 0.20,
    "top3_char_frac": 0.18,
    "top4_char_frac": 0.16,
    "dup5_char_frac": 0.15,
    "dup10_char_frac": 0.10,
}


def repetition_filter(
    df: DataFrame,
    thresholds: dict[str, float] | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, keep, <signals>) — the Gopher repetition gate: ``keep`` is
    true when every configured signal is <= its threshold. Composes
    kgtm.repetition.repetition_signals, so the plan cost is identical."""
    from kgtm.repetition import repetition_signals

    thresholds = REPETITION_DEFAULTS if thresholds is None else thresholds
    sig = repetition_signals(df, text_col=text_col, id_col=id_col)
    missing = set(thresholds) - set(sig.columns)
    if missing:
        raise ValueError(f"thresholds reference unknown signals: {sorted(missing)}")
    keep = F.lit(True)
    for col, cap in sorted(thresholds.items()):
        keep = keep & (F.col(col) <= F.lit(float(cap)))
    return sig.select("doc_id", keep.alias("keep"), *[c for c in sig.columns if c != "doc_id"])


# ---------------------------------------------------------------------------
# train / holdout splits
# ---------------------------------------------------------------------------


def split_assign(
    df: DataFrame,
    holdout_frac: float = 0.01,
    by_col: str = "doc_id",
    salt: str = "split",
    out_col: str = "split",
) -> DataFrame:
    """All input columns plus ``out_col`` in {'train','holdout'}: a row is
    holdout iff the first 32 bits of md5('{by}:{salt}') fall under
    ``floor(holdout_frac * 2^32)`` — the same cross-engine integer-compare
    contract as mixture_sample, so the assignment is reproducible
    bit-for-bit in DuckDB and stable across runs/engines forever.

    ``by_col`` is the ATOMICITY key: every row sharing a ``by_col`` value
    lands on the same side (pass a cluster id for leakage-safe splits). A
    NULL key never draws holdout (unknown identity must not leak into the
    eval side). Zero joins, zero shuffle — fuses into the scan."""
    if not (0.0 <= holdout_frac <= 1.0):
        raise ValueError(f"holdout_frac must be in [0, 1]: {holdout_frac}")
    if out_col in df.columns:
        # fail immediately and clearly — 'select *, tag AS split' over a
        # frame that already carries `split` (stage run twice, re-splitting
        # a tagged table) would yield duplicate column names and ambiguous
        # F.col(out_col) errors far downstream.
        raise ValueError(
            f"out_col {out_col!r} already exists in the input; drop or "
            f"rename it (or pass a different out_col) before re-splitting"
        )
    thresh = int(math.floor(holdout_frac * _HASH_SPACE))
    is_hold = hash32_col(F.col(by_col), salt) < F.lit(thresh)
    tag = F.when(F.coalesce(is_hold, F.lit(False)), F.lit("holdout")).otherwise(
        F.lit("train")
    )
    return df.select("*", tag.alias(out_col))


def leakage_safe_split(
    df: DataFrame,
    threshold: float = 0.5,
    holdout_frac: float = 0.01,
    salt: str = "split",
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    max_shingle_df: int | None = _SHINGLE_DF_DEFAULT,
) -> DataFrame:
    """Train/holdout split that can never leak a near-duplicate across the
    boundary: documents are clustered by exact n-gram Jaccard >= threshold
    (transitive closure — kgtm.dedup.dedup_clusters), then the WHOLE
    cluster is assigned by hashing its cluster id. Returns every input
    column plus (cluster_id, split).

    Without this, a plain per-doc split puts ~holdout_frac of each
    near-dup cluster in holdout while its twins train — the classic eval
    contamination bug that decontamination audits then re-discover.

    Scale shape: the pair generation is the capped shingle join — the cap
    defaults to kgtm.dedup.DEFAULT_MAX_SHINGLE_DF for consistency with
    ngram_jaccard_pairs' own skew-safe default (pass ``max_shingle_df=None``
    explicitly for the exact all-pairs form, e.g. in oracle twins;
    hash-identical shingle DF is capped, not sampled, so the default only
    drops stop-phrase shingles from candidate generation), clustering is the
    large-star/small-star O(log n) loop, and the final assignment joins
    the (id, cluster_id) frame back on the id key — one co-partitioned
    shuffle join; the split tag itself is a scan-fused hash compare."""
    from kgtm.dedup import dedup_clusters, ngram_jaccard_pairs

    pairs = ngram_jaccard_pairs(
        df, text_col=text_col, id_col=id_col, n=n,
        threshold=threshold, max_shingle_df=max_shingle_df,
    )
    clusters = dedup_clusters(pairs, df.select(id_col), id_col)
    assigned = split_assign(
        clusters.select(F.col("id").alias(id_col), "cluster_id"),
        holdout_frac=holdout_frac, by_col="cluster_id", salt=salt,
    )
    return df.join(assigned, id_col)
