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


def words_col(text: str | Column = "text", lower: bool = True) -> Column:
    t = F.col(text) if isinstance(text, str) else text
    return F.split(F.trim(F.lower(t) if lower else t), r"\s+")


def words_col_guarded(text: str | Column = "text", lower: bool = True) -> Column:
    """words_col with the blank/null guard: empty array instead of [''].
    The one tokenization contract shared by repetition/packing and the
    DuckDB twins (kgtm.oracles._DUCK_WORDS_EXPR). ``lower=False`` is the
    original-case variant (spandedup's reconstruction words — same trim/
    split/guard, case preserved)."""
    t = F.col(text) if isinstance(text, str) else text
    return F.when(
        F.coalesce(F.trim(t), F.lit("")) == "", F.array().cast("array<string>")
    ).otherwise(words_col(t, lower=lower))


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


def _winnow_powers(k: int) -> np.ndarray:
    """base^{k-1}, ..., base^1, base^0 (mod 2^64) for the 257-polynomial."""
    base = np.uint64(257)
    powers = np.ones(k, dtype=np.uint64)
    for i in range(k - 2, -1, -1):
        powers[i] = powers[i + 1] * base
    return powers


def _kgram_hashes(s: str, k: int, powers: np.ndarray) -> np.ndarray | None:
    """All k-gram polynomial hashes of ``s`` at once (None when too short):
    sliding_window_view(bytes, k) · base_powers; uint64 wraparound IS the
    mod-2^64 hash — identical to the rolling recurrence acc = acc*base+b[i].
    """
    if not s or len(s) < k:
        return None
    b = np.frombuffer(s.lower().encode("utf-8", "ignore"), dtype=np.uint8)
    if len(b) < k:
        return None
    w = np.lib.stride_tricks.sliding_window_view(b, k).astype(np.uint64)
    return (w * powers).sum(axis=1, dtype=np.uint64)


def winnow_fingerprint_series(
    texts: pd.Series, k: int = 5, window: int = 4
) -> pd.Series:
    """Pure UDF body: winnowing (Schleimer et al.) — min rolling k-gram hash
    per window, xor-folded to one int64 document fingerprint.

    Fully vectorized (see _kgram_hashes), then a windowed min + xor-fold.
    No per-character Python loop.
    """
    powers = _winnow_powers(k)

    def fp(s: str) -> int:
        h = _kgram_hashes(s, k, powers)
        if h is None:
            return 0
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


def winnow_position_pairs(
    s: str, k: int, window: int, powers: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Pure body: POSITIONAL winnowing selection for one text — the standard
    (Schleimer et al. §4 'robust winnowing') per-window pick: in every
    window of ``window`` consecutive k-gram hashes select the RIGHTMOST
    position attaining the window minimum, dedupe picks across windows.
    Returns (positions, hashes) as arrays (0-based byte offsets; empty when
    the text is shorter than k). Texts with <= window k-grams fall back to
    the rightmost global argmin — one pick, mirroring the doc-fingerprint
    body's whole-doc-min branch so both operators agree on short texts.

    Vectorized: window minima via sliding_window_view; the rightmost-argmin
    per window via argmax over the REVERSED window equality mask (argmax
    returns the first True, which in reversed order is the rightmost).
    """
    h = _kgram_hashes(s, k, powers)
    if h is None:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.uint64)
    if len(h) <= window:
        ridx = len(h) - 1 - int(np.argmax(h[::-1] == h.min()))
        return np.array([ridx], dtype=np.int64), h[ridx : ridx + 1]
    sw = np.lib.stride_tricks.sliding_window_view(h, window)
    mins = sw.min(axis=1)
    rev_eq = sw[:, ::-1] == mins[:, None]
    ridx = window - 1 - np.argmax(rev_eq, axis=1)
    pos = np.unique(np.arange(len(mins), dtype=np.int64) + ridx)
    return pos, h[pos]


def winnow_positions(
    df,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    window: int = 4,
):
    """(id, pos, fp) — the exploded POSITIONAL winnowing fingerprint table.

    The xor-folded scalar (winnow_fingerprint_udf) detects whole-document
    similarity; this is the standard winnowing USE: a per-document set of
    (k-gram offset, hash) picks, joinable on fp to LOCALIZE overlapping
    passages between documents (plagiarism/citation span detection). fp is
    the raw k-gram polynomial hash (two's-complement int64), so a DuckDB
    twin reproduces rows exactly (kgtm.oracles.q_winnow_positions).

    mapInPandas (Arrow batches in, variable fan-out rows per doc out) — the
    natural shape for an exploding extractor; downstream overlap joins key
    on the 8-byte fp, never on text. 100 TB: selection density is ~2/(window
    +1) of k-gram count, so the output is a bounded multiple of the corpus;
    pair-join consumers should reuse the hot-shingle df cap
    (kgtm.dedup._apply_cap) before self-joining on fp.
    """
    powers = _winnow_powers(k)
    schema = f"{id_col} long, pos int, fp long"

    def gen(batches):
        for pdf in batches:
            ids: list[int] = []
            poss: list[np.ndarray] = []
            fps: list[np.ndarray] = []
            with np.errstate(over="ignore"):
                for i, t in zip(pdf[id_col], pdf[text_col].fillna("")):
                    p, hh = winnow_position_pairs(t, k, window, powers)
                    if len(p):
                        ids.extend([i] * len(p))
                        poss.append(p)
                        fps.append(hh)
            if ids:
                yield pd.DataFrame(
                    {
                        id_col: np.asarray(ids, dtype=np.int64),
                        "pos": np.concatenate(poss).astype(np.int32),
                        "fp": np.concatenate(fps).astype(np.int64),
                    }
                )

    return df.select(id_col, text_col).mapInPandas(gen, schema)


# ---------------------------------------------------------------------------
# character-trigram Naive Bayes language ID (the stronger classifier;
# lang_id_col above stays as the simple oracle-checked marker heuristic)
# ---------------------------------------------------------------------------

# Embedded training samples — three size-balanced paragraphs per language
# (narrative, scene, everyday dialogue), enough for hashed-trigram profiles
# to separate these eight languages on short text. Balance matters: an
# oversized profile has fewer zero-count buckets and silently outbids close
# neighbours (es vs pt/it) on sentences it has never seen.
LANG_SAMPLES: dict[str, str] = {
    "en": (
        "the quick brown fox jumps over the lazy dog and the little children "
        "were playing in the garden while their mother was reading a book "
        "about the history of the world and everything that happened there "
        "this is a very important thing for all of the people who want to "
        "understand what they are doing with their lives and their work "
        "in the morning the streets of the old city were quiet and the rain "
        "had washed the stones clean a baker opened his shop and the smell "
        "of fresh bread drifted across the square where an old man fed the "
        "birds before the market began "
        "i do not know if you can come tomorrow but we have to prepare "
        "lunch and buy the vegetables and the fruit at the market before "
        "the shops close tonight the children want to have dinner early "
        "with the whole family at home"
    ),
    "es": (
        "el rapido zorro marron salta sobre el perro perezoso y los ninos "
        "pequenos estaban jugando en el jardin mientras su madre leia un "
        "libro sobre la historia del mundo y todo lo que sucedio alli esta "
        "es una cosa muy importante para todas las personas que quieren "
        "entender lo que estan haciendo con sus vidas y su trabajo "
        "por la manana las calles de la ciudad vieja estaban tranquilas y "
        "la lluvia habia lavado las piedras un panadero abrio su tienda y "
        "el olor del pan fresco cruzaba la plaza donde un hombre viejo daba "
        "de comer a los pajaros antes de que empezara el mercado "
        "necesito que me digas cuando vas a venir porque tenemos que "
        "preparar la comida y comprar las verduras y las frutas en el "
        "mercado antes de que cierren las tiendas esta noche los ninos "
        "quieren cenar temprano con toda la familia en la casa"
    ),
    "de": (
        "der schnelle braune fuchs springt ueber den faulen hund und die "
        "kleinen kinder spielten im garten waehrend ihre mutter ein buch "
        "ueber die geschichte der welt las und alles was dort geschah das "
        "ist eine sehr wichtige sache fuer alle menschen die verstehen "
        "wollen was sie mit ihrem leben und ihrer arbeit machen "
        "am morgen waren die strassen der alten stadt ruhig und der regen "
        "hatte die steine sauber gewaschen ein baecker oeffnete seinen laden "
        "und der geruch von frischem brot zog ueber den platz wo ein alter "
        "mann die voegel fuetterte bevor der markt begann "
        "ich weiss nicht ob du morgen kommen kannst aber wir muessen das "
        "mittagessen vorbereiten und das gemuese und das obst auf dem markt "
        "kaufen bevor die laeden heute abend schliessen die kinder wollen "
        "frueh mit der ganzen familie zu hause essen"
    ),
    "fr": (
        "le rapide renard brun saute par dessus le chien paresseux et les "
        "petits enfants jouaient dans le jardin pendant que leur mere lisait "
        "un livre sur l histoire du monde et tout ce qui s y est passe c est "
        "une chose tres importante pour toutes les personnes qui veulent "
        "comprendre ce qu elles font de leur vie et de leur travail "
        "le matin les rues de la vieille ville etaient calmes et la pluie "
        "avait lave les pierres un boulanger ouvrit sa boutique et l odeur "
        "du pain frais traversait la place ou un vieil homme nourrissait les "
        "oiseaux avant que le marche ne commence "
        "je ne sais pas si tu peux venir demain mais nous devons preparer "
        "le dejeuner et acheter les legumes et les fruits au marche avant "
        "que les magasins ne ferment ce soir les enfants veulent diner tot "
        "avec toute la famille a la maison"
    ),
    "it": (
        "la rapida volpe marrone salta sopra il cane pigro e i bambini "
        "piccoli giocavano nel giardino mentre la loro madre leggeva un "
        "libro sulla storia del mondo e tutto quello che accadde li questa "
        "e una cosa molto importante per tutte le persone che vogliono "
        "capire quello che fanno con le loro vite e il loro lavoro "
        "la mattina le strade della vecchia citta erano tranquille e la "
        "pioggia aveva lavato le pietre un fornaio apri il suo negozio e il "
        "profumo del pane fresco attraversava la piazza dove un vecchio dava "
        "da mangiare agli uccelli prima che iniziasse il mercato "
        "non so se puoi venire domani ma dobbiamo preparare il pranzo e "
        "comprare le verdure e la frutta al mercato prima che i negozi "
        "chiudano stasera i bambini vogliono cenare presto con tutta la "
        "famiglia a casa"
    ),
    "pt": (
        "a rapida raposa marrom salta sobre o cao preguicoso e as criancas "
        "pequenas estavam brincando no jardim enquanto sua mae lia um livro "
        "sobre a historia do mundo e tudo o que aconteceu ali isto e uma "
        "coisa muito importante para todas as pessoas que querem entender o "
        "que estao fazendo com suas vidas e seu trabalho "
        "de manha as ruas da cidade velha estavam tranquilas e a chuva "
        "tinha lavado as pedras um padeiro abriu sua loja e o cheiro do pao "
        "fresco atravessava a praca onde um homem velho alimentava os "
        "passaros antes do comeco do mercado "
        "nao sei se voce vai poder vir amanha mas temos que preparar o "
        "almoco e comprar os legumes e as frutas no mercado antes que as "
        "lojas fechem esta noite as criancas querem jantar cedo com toda a "
        "familia em casa"
    ),
    "nl": (
        "de snelle bruine vos springt over de luie hond en de kleine "
        "kinderen speelden in de tuin terwijl hun moeder een boek las over "
        "de geschiedenis van de wereld en alles wat daar gebeurde dit is een "
        "heel belangrijke zaak voor alle mensen die willen begrijpen wat ze "
        "met hun leven en hun werk doen "
        "in de ochtend waren de straten van de oude stad stil en de regen "
        "had de stenen schoon gewassen een bakker opende zijn winkel en de "
        "geur van vers brood trok over het plein waar een oude man de "
        "vogels voerde voordat de markt begon "
        "ik weet niet of je morgen kunt komen maar we moeten de lunch "
        "voorbereiden en de groenten en het fruit op de markt kopen voordat "
        "de winkels vanavond sluiten de kinderen willen vroeg eten met de "
        "hele familie thuis"
    ),
    "sv": (
        "den snabba bruna raven hoppar over den lata hunden och de sma "
        "barnen lekte i tradgarden medan deras mor laste en bok om varldens "
        "historia och allt som hande dar detta ar en mycket viktig sak for "
        "alla manniskor som vill forsta vad de gor med sina liv och sitt "
        "arbete "
        "pa morgonen var gatorna i den gamla staden tysta och regnet hade "
        "tvattat stenarna rena en bagare oppnade sin butik och doften av "
        "farskt brod drog over torget dar en gammal man matade faglarna "
        "innan marknaden borjade "
        "jag vet inte om du kan komma i morgon men vi maste forbereda "
        "lunchen och kopa gronsakerna och frukten pa marknaden innan "
        "affarerna stanger i kvall barnen vill ata middag tidigt med hela "
        "familjen hemma"
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
