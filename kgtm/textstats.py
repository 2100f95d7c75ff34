"""Text analysis operators: language-ID, quality scoring, token counting,
document fingerprinting. All codegen column expressions (no UDF in the hot
path); the winnowing fingerprint is the one vectorized pandas UDF.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType

STOPWORDS_EN = ["the", "a", "an", "of", "and", "to", "in", "is", "for", "on"]

# tiny marker dictionaries for the n-gram/stopword language heuristic
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "is", "for"],
    "es": ["el", "la", "de", "que", "los"],
    "de": ["der", "die", "das", "und", "ist"],
    "fr": ["le", "la", "et", "les", "des"],
}

PUNCT_CLASS = r"[.,;:!?'\"()\[\]{}-]"


def words_col(text: str | Column = "text") -> Column:
    t = F.col(text) if isinstance(text, str) else text
    return F.split(F.trim(F.lower(t)), r"\s+")


def token_count_col(text: str | Column = "text") -> Column:
    """Whitespace token count; 0 for empty/null."""
    t = F.col(text) if isinstance(text, str) else text
    return F.when(
        F.coalesce(F.trim(t), F.lit("")) == "", F.lit(0)
    ).otherwise(F.size(words_col(t))).cast("long")


def bpe_ish_token_count_col(text: str | Column = "text") -> Column:
    """Sub-word-ish token count: word chunks + digits + punctuation marks,
    the classic BPE-approximating regex count."""
    t = F.col(text) if isinstance(text, str) else text
    return F.size(
        F.regexp_extract_all(t, F.lit(r"([A-Za-z]+|[0-9]+|[^A-Za-z0-9\s])"), 1)
    ).cast("long")


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds n_chars_m, n_tokens, punct_ratio, stopword_ratio, quality_score."""
    t = F.col(text_col)
    n_chars = F.length(t)
    n_tokens = token_count_col(t)
    n_punct = n_chars - F.length(F.regexp_replace(t, PUNCT_CLASS, ""))
    words = words_col(t)
    n_stop = F.size(
        F.filter(words, lambda w: w.isin(*[F.lit(s) for s in STOPWORDS_EN]))
    )
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_tokens > 0, n_stop / n_tokens).otherwise(F.lit(0.0))
    # simple monotone quality heuristic in [0,1]: long enough, some stopwords,
    # not punctuation soup
    score = (
        F.least(n_tokens / F.lit(100.0), F.lit(1.0)) * F.lit(0.5)
        + F.least(stop_ratio * F.lit(5.0), F.lit(1.0)) * F.lit(0.3)
        + (F.lit(1.0) - F.least(punct_ratio * F.lit(10.0), F.lit(1.0))) * F.lit(0.2)
    )
    return df.select(
        "*",
        n_chars.cast("long").alias("n_chars_m"),
        n_tokens.alias("n_tokens"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(score, 6).alias("quality_score"),
    )


def lang_id_col(text: str | Column = "text") -> Column:
    """Marker-word language heuristic: argmax of per-language hit counts,
    'und' when no marker hits. Deterministic tie-break by language code."""
    words = words_col(text)
    hits = {
        lang: F.size(
            F.filter(words, lambda w: w.isin(*[F.lit(m) for m in ms]))
        )
        for lang, ms in LANG_MARKERS.items()
    }
    pairs = F.array(
        *[
            F.struct(hits[lang].alias("hits"), F.lit(lang).alias("lang"))
            for lang in sorted(LANG_MARKERS)
        ]
    )
    best = F.array_max(
        F.transform(
            pairs,
            lambda p: F.struct(
                p["hits"].alias("hits"),
                # invert lang for max() so ties pick the alphabetically FIRST
                F.element_at(
                    F.array(*[F.lit(c) for c in sorted(LANG_MARKERS, reverse=True)]),
                    F.array_position(
                        F.array(*[F.lit(c) for c in sorted(LANG_MARKERS)]), p["lang"]
                    ).cast("int"),
                ).alias("inv"),
                p["lang"].alias("lang"),
            ),
        )
    )
    return F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))


def fingerprint_col(text: str | Column = "text", length: int = 16) -> Column:
    """Content fingerprint: md5 of the whitespace-normalized, lowercased text
    (stable across formatting-only edits)."""
    t = F.col(text) if isinstance(text, str) else text
    normalized = F.regexp_replace(F.trim(F.lower(t)), r"\s+", " ")
    return F.substring(F.md5(normalized), 1, length)


# ---------------------------------------------------------------------------
# winnowing fingerprint (rolling hash) — vectorized pandas UDF
# ---------------------------------------------------------------------------


def winnow_fingerprint_series(
    texts: pd.Series, k: int = 5, window: int = 4
) -> pd.Series:
    """Pure UDF body: winnowing (Schleimer et al.) — min rolling k-gram hash
    per window, xor-folded to one int64 document fingerprint.

    Fully vectorized: ALL k-gram polynomial hashes are computed in one shot as
    sliding_window_view(bytes, k) · base_powers (uint64 wraparound IS the
    mod-2^64 hash — identical to the rolling recurrence acc = acc*base + b[i]),
    then a windowed min + xor-fold. No per-character Python loop.
    """
    base = np.uint64(257)
    # base^{k-1}, ..., base^1, base^0 (mod 2^64)
    powers = np.ones(k, dtype=np.uint64)
    for i in range(k - 2, -1, -1):
        powers[i] = powers[i + 1] * base

    def fp(s: str) -> int:
        if not s or len(s) < k:
            return 0
        b = np.frombuffer(s.lower().encode("utf-8", "ignore"), dtype=np.uint8)
        if len(b) < k:
            return 0
        # n×k byte windows · powers → all k-gram hashes at once
        w = np.lib.stride_tricks.sliding_window_view(b, k).astype(np.uint64)
        h = (w * powers).sum(axis=1, dtype=np.uint64)
        if len(h) <= window:
            mins = np.array([h.min()], dtype=np.uint64)
        else:
            sw = np.lib.stride_tricks.sliding_window_view(h, window)
            mins = np.unique(sw.min(axis=1))
        folded = np.bitwise_xor.reduce(mins * np.uint64(0x9E3779B97F4A7C15))
        return int(folded.astype(np.int64))

    with np.errstate(over="ignore"):  # uint64 wraparound is the hash
        return texts.fillna("").map(fp)


winnow_fingerprint_udf = F.pandas_udf(
    lambda texts: winnow_fingerprint_series(texts), LongType()
)


# ---------------------------------------------------------------------------
# character-trigram Naive Bayes language ID (the stronger classifier;
# lang_id_col above stays as the simple oracle-checked marker heuristic)
# ---------------------------------------------------------------------------

# Embedded training samples — a handful of generic sentences per language,
# enough for hashed-trigram profiles to separate these four languages.
LANG_SAMPLES: dict[str, str] = {
    "en": (
        "the quick brown fox jumps over the lazy dog and the little children "
        "were playing in the garden while their mother was reading a book "
        "about the history of the world and everything that happened there "
        "this is a very important thing for all of the people who want to "
        "understand what they are doing with their lives and their work"
    ),
    "es": (
        "el rapido zorro marron salta sobre el perro perezoso y los ninos "
        "pequenos estaban jugando en el jardin mientras su madre leia un "
        "libro sobre la historia del mundo y todo lo que sucedio alli esta "
        "es una cosa muy importante para todas las personas que quieren "
        "entender lo que estan haciendo con sus vidas y su trabajo"
    ),
    "de": (
        "der schnelle braune fuchs springt ueber den faulen hund und die "
        "kleinen kinder spielten im garten waehrend ihre mutter ein buch "
        "ueber die geschichte der welt las und alles was dort geschah das "
        "ist eine sehr wichtige sache fuer alle menschen die verstehen "
        "wollen was sie mit ihrem leben und ihrer arbeit machen"
    ),
    "fr": (
        "le rapide renard brun saute par dessus le chien paresseux et les "
        "petits enfants jouaient dans le jardin pendant que leur mere lisait "
        "un livre sur l histoire du monde et tout ce qui s y est passe c est "
        "une chose tres importante pour toutes les personnes qui veulent "
        "comprendre ce qu elles font de leur vie et de leur travail"
    ),
}

_NB_BUCKETS = 4096


def _trigram_buckets(s: str) -> np.ndarray:
    """Hashed char-trigram bucket ids of a normalized string (vectorized:
    sliding byte windows · base powers, mod bucket count)."""
    b = np.frombuffer(
        (" " + " ".join(s.lower().split()) + " ").encode("utf-8", "ignore"),
        dtype=np.uint8,
    )
    if len(b) < 3:
        return np.empty(0, dtype=np.int64)
    w = np.lib.stride_tricks.sliding_window_view(b, 3).astype(np.uint32)
    h = w[:, 0] * np.uint32(65536) + w[:, 1] * np.uint32(256) + w[:, 2]
    return (h % _NB_BUCKETS).astype(np.int64)


def _nb_weights() -> tuple[list[str], np.ndarray]:
    """log P(bucket | lang) with add-1 smoothing, shape (n_langs, buckets)."""
    langs = sorted(LANG_SAMPLES)
    W = np.zeros((len(langs), _NB_BUCKETS), dtype=np.float64)
    for i, lang in enumerate(langs):
        counts = np.bincount(_trigram_buckets(LANG_SAMPLES[lang]), minlength=_NB_BUCKETS)
        W[i] = np.log((counts + 1) / (counts.sum() + _NB_BUCKETS))
    return langs, W


_NB_LANGS, _NB_W = _nb_weights()


def lang_id_trigram_series(texts: pd.Series, min_trigrams: int = 3) -> pd.Series:
    """Pure UDF body: hashed-trigram Naive Bayes language ID.

    Per row the work is numpy-vectorized (byte windows → bucket ids → one
    (n_langs × n_trigrams) weight gather + sum); ties break alphabetically
    ('de' < 'en' < ...), texts with < min_trigrams trigrams are 'und'.
    """

    def lid(s: str) -> str:
        buckets = _trigram_buckets(s) if s else np.empty(0, dtype=np.int64)
        if len(buckets) < min_trigrams:
            return "und"
        scores = _NB_W[:, buckets].sum(axis=1)
        return _NB_LANGS[int(np.argmax(scores))]  # argmax takes FIRST max → alpha tie-break

    return texts.fillna("").map(lid)


lang_id_trigram_udf = F.pandas_udf(
    lambda texts: lang_id_trigram_series(texts), StringType()
)
