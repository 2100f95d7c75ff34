"""Deterministic synthetic transcript corpus with planted golden triples.

Step 0 of the build plan (SURVEY.md §7). Seed-parameterized, no wall clock,
no external data. Produces four parquet tables:

  transcripts        (conv_id, turn_idx, role, text, tool, ts)  — input_hint
  ontology_index     (ontology_iri, host, path, iri_type)
  ontology_snapshots (ontology_iri, version_ts, snapshot_iri, file_url, deps)
  golden_triples     (conv_id, subj, pred, obj)

Design constraints it encodes:
  * Zipf-skewed conversation lengths (most 2-20 turns, tail to ~max_turns) so
    groupBy(conv_id) skew/salting is actually exercised (FIXTURES.md §1).
  * Zipf-skewed ontology hosts (top host ≈ 15% of entries — the
    semanticscience.org shape from the reference's archivo_ontologies.txt).
  * Planted surface-form variants mirror the reference's iri_type taxonomy
    (hash/slash/term, /root/reference/tests/archivo_test_IRIs.tsv) and are
    chosen so each exercises a SPECIFIC ladder rung (see _VARIANTS below).
  * Golden triples are planted at generation time and state what a CORRECT
    pipeline emits: (subj, pred, canonical ontology IRI) for linkable
    mentions, (subj, pred, surface) for unknown-host mentions. The extractor
    and linker never see this table (separate code path — P/R is meaningful).
  * Turn write order is shuffled (turn_idx ≠ generation order) so assembly
    must actually sort; ts is monotone within conv_id.
"""

from __future__ import annotations

import datetime as dt
import os
from dataclasses import dataclass

import numpy as np
import pandas as pd

from kgtm.extract import SVO_VERBS

NOISE_VOCAB = (
    "alpha beta gamma delta sigma lambda tensor vector matrix graph node edge "
    "shard batch stream window merge agg scan probe build spill codegen stage "
    "task executor driver shuffle partition broadcast salt skew checkpoint"
).split()

HOST_POOL = [
    "semanticscience.example.org",  # hot head (Zipf)
    "purl.example.org",
    "w3id.example.org",
    "obo.example.org",
    "vocab.example.net",
    "onto.example.com",
    "schema.example.io",
    "terms.example.dev",
]

UNKNOWN_HOSTS = ["unknown-a.example.net", "unknown-b.example.net"]

ROLES = ["user", "assistant", "system", "tool"]
TOOLS = [None, "search", "python", "browser"]

BASE_TS = dt.datetime(2025, 1, 1, 0, 0, 0)


@dataclass
class SynthConfig:
    seed: int = 42
    n_convs: int = 500
    n_ontologies: int = 120
    max_turns: int = 400
    zipf_a: float = 1.6
    relation_prob: float = 0.55
    mention_only_prob: float = 0.25
    unknown_host_prob: float = 0.04


def _zipf_clipped(rng: np.random.Generator, a: float, size: int, lo: int, hi: int) -> np.ndarray:
    x = rng.zipf(a, size=size)
    return np.clip(x + lo - 1, lo, hi)


def make_ontology_index(cfg: SynthConfig, rng: np.random.Generator) -> pd.DataFrame:
    """Ontology dictionary with skewed hosts and the 3 iri_type shapes."""
    host_idx = _zipf_clipped(rng, 1.3, cfg.n_ontologies, 1, len(HOST_POOL)) - 1
    types = rng.choice(["slash", "term", "hash"], size=cfg.n_ontologies, p=[0.4, 0.35, 0.25])
    rows = []
    for i in range(cfg.n_ontologies):
        host = HOST_POOL[host_idx[i]]
        name = f"vocab{i}"
        t = types[i]
        if t == "slash":
            path = f"/{name}/"
        else:  # term and hash ontologies both live at a no-slash path
            path = f"/{name}"
        rows.append((f"http://{host}{path}", host, path, t))
    # a handful of ambiguous pairs: both the ontology AND a term-level entry
    # exist (first-hit-wins cases in the wild, SURVEY §7 proof obligation)
    for i in range(0, cfg.n_ontologies, 37):
        host, name = HOST_POOL[host_idx[i]], f"vocab{i}"
        if types[i] != "slash":
            rows.append((f"http://{host}/{name}/Term0", host, f"/{name}/Term0", "term"))
    return pd.DataFrame(rows, columns=["ontology_iri", "host", "path", "iri_type"])


def make_snapshots(cfg: SynthConfig, rng: np.random.Generator, index: pd.DataFrame) -> pd.DataFrame:
    """1-10 versions per ontology, stamps in 2023-2025 (YYYY.MM.DD-HHMMSS)."""
    rows = []
    for iri, host in zip(index["ontology_iri"], index["host"]):
        n_vers = int(rng.integers(1, 11))
        # deterministic, sorted offsets in days
        offs = np.sort(rng.choice(900, size=n_vers, replace=False))
        for d in offs:
            ts = dt.datetime(2023, 1, 1) + dt.timedelta(days=int(d), hours=int(d) % 24)
            stamp = ts.strftime("%Y.%m.%d-%H%M%S")
            rows.append(
                (
                    iri,
                    ts,
                    f"https://databus.example.org/ontologies/{host}{iri.split(host)[-1].rstrip('/')}/{stamp}",
                    f"https://archivo.example.org/download?o={iri}&f=ttl&v={stamp}",
                    [],
                )
            )
    return pd.DataFrame(
        rows, columns=["ontology_iri", "version_ts", "snapshot_iri", "file_url", "deps"]
    )


def _variant_surface(rng: np.random.Generator, iri: str, host: str, path: str, iri_type: str) -> str:
    """A ladder-exercising surface form of a dictionary entry."""
    base = f"http://{host}"
    if iri_type == "slash":
        # dict path '/name/': exact(r0) | term(r3) | deep term(r5) | https-flip
        v = rng.integers(0, 4)
        if v == 0:
            return iri
        if v == 1:
            return f"{base}{path}Term{rng.integers(1, 9)}"
        if v == 2:
            return f"{base}{path}Term{rng.integers(1, 9)}/sub"
        return iri.replace("http://", "https://")
    if iri_type == "term":
        # dict path '/name': exact(r0) | trailing slash(r1) | subterm(r2) | flip
        v = rng.integers(0, 4)
        if v == 0:
            return iri
        if v == 1:
            return iri + "/"
        if v == 2:
            return f"{base}{path}/Term{rng.integers(1, 9)}"
        return iri.replace("http://", "https://")
    # hash: exact(r0) | #fragment(r0 after frag strip) | trailing slash(r1)
    v = rng.integers(0, 3)
    if v == 0:
        return iri
    if v == 1:
        return f"{iri}#Term{rng.integers(0, 9)}"
    return iri + "/"


def generate(cfg: SynthConfig | None = None, out_dir: str | None = None):
    """Generate the corpus; optionally write parquet to out_dir.

    Returns (transcripts, ontology_index, ontology_snapshots, golden_triples)
    as pandas DataFrames.
    """
    cfg = cfg or SynthConfig()
    rng = np.random.default_rng(cfg.seed)

    index = make_ontology_index(cfg, rng)
    snapshots = make_snapshots(cfg, rng, index)
    # linking targets exclude the ambiguous extra term rows for golden purposes:
    # the ladder resolves a planted exact term surface to the term entry itself.
    idx_rows = list(index.itertuples(index=False))

    n_turns = _zipf_clipped(rng, cfg.zipf_a, cfg.n_convs, 2, cfg.max_turns)

    t_rows: list[tuple] = []
    g_rows: list[tuple] = []
    for c in range(cfg.n_convs):
        conv_id = f"conv-{c:06d}"
        ts = BASE_TS + dt.timedelta(minutes=int(rng.integers(0, 500000)))
        for turn in range(int(n_turns[c])):
            ts += dt.timedelta(seconds=int(rng.integers(5, 600)))
            role = ROLES[int(rng.integers(0, len(ROLES)))]
            tool = TOOLS[int(rng.integers(0, len(TOOLS)))] if role == "tool" else None
            r = rng.random()
            noise = " ".join(
                NOISE_VOCAB[i] for i in rng.integers(0, len(NOISE_VOCAB), size=int(rng.integers(3, 9)))
            )
            if r < cfg.relation_prob:
                subj = f"Agent{int(rng.integers(0, 50))}"
                pred = SVO_VERBS[int(rng.integers(0, len(SVO_VERBS)))]
                if rng.random() < cfg.unknown_host_prob:
                    host = UNKNOWN_HOSTS[int(rng.integers(0, len(UNKNOWN_HOSTS)))]
                    surface = f"http://{host}/thing{int(rng.integers(0, 99))}"
                    golden_obj = surface  # correct pipeline keeps surface
                else:
                    row = idx_rows[int(rng.integers(0, len(idx_rows)))]
                    surface = _variant_surface(rng, row.ontology_iri, row.host, row.path, row.iri_type)
                    golden_obj = row.ontology_iri
                text = f"{noise}. {subj} {pred} {surface} today"
                g_rows.append((conv_id, subj, pred, golden_obj))
            elif r < cfg.relation_prob + cfg.mention_only_prob:
                row = idx_rows[int(rng.integers(0, len(idx_rows)))]
                surface = _variant_surface(rng, row.ontology_iri, row.host, row.path, row.iri_type)
                text = f"{noise} see {surface} for details"
            else:
                text = noise
            t_rows.append((conv_id, turn, role, text, tool, ts))

    transcripts = pd.DataFrame(
        t_rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    )
    transcripts["turn_idx"] = transcripts["turn_idx"].astype("int32")
    # Shuffle write order: generation order ≠ turn order (assembly must sort).
    transcripts = transcripts.sample(frac=1.0, random_state=cfg.seed).reset_index(drop=True)

    golden = pd.DataFrame(g_rows, columns=["conv_id", "subj", "pred", "obj"])

    # Spark 4 rejects TIMESTAMP(NANOS) parquet — write microsecond precision.
    transcripts["ts"] = transcripts["ts"].astype("datetime64[us]")
    snapshots["version_ts"] = snapshots["version_ts"].astype("datetime64[us]")

    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
        transcripts.to_parquet(f"{out_dir}/transcripts.parquet", index=False)
        index.to_parquet(f"{out_dir}/ontology_index.parquet", index=False)
        snapshots.to_parquet(f"{out_dir}/ontology_snapshots.parquet", index=False)
        golden.to_parquet(f"{out_dir}/golden_triples.parquet", index=False)
    return transcripts, index, snapshots, golden
