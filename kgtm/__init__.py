"""kgtm — a PySpark-native knowledge-graph construction pipeline.

Re-expresses the computation of dbpedia/ontology-time-machine (versioned-ontology
resolution: surface IRI → canonical, versioned ontology snapshot under a policy)
as a batch KG-construction pipeline over multi-turn transcript tables:

    turn assembly → mention detection → triple extraction → entity linking
    (normalization-ladder + MinHash-LSH blocking) → connected-components
    canonicalization → versioned-snapshot resolution → materialized triples.

Everything is DataFrame/SQL + Arrow-vectorized pandas UDFs; no per-row Python.
Reference parity pointers live in each module's docstrings (file:line into
/root/reference).
"""

__version__ = "0.1.0"

# Primary entry points (import kgtm; kgtm.build_triples(...)). Submodules are
# imported lazily to keep `import kgtm` free of a SparkSession requirement.
__all__ = [
    "build_triples",
    "PipelineConfig",
    "get_spark",
    "generate",
    "SynthConfig",
    "curate_documents",
    "incremental_curate",
    "append_curated_batch",
    "incremental_relink",
    "link_mentions",
    "broadcast_ladder_link",
    "resolve_links",
    "write_triples",
    "read_triples",
    "write_table",
    "read_table",
    "compact_table",
    "list_commits",
    "persist_ledger",
    "read_ledger",
    "repetition_signals",
    "repetition_filter",
    "mixture_sample",
    "pii_signals",
    "redact_pii",
    "chunk_token_windows",
    "pack_greedy",
    "paragraph_dedup",
    "split_assign",
    "leakage_safe_split",
    "unigram_counts",
    "unigram_nll",
    "pagerank",
]


def __getattr__(name):  # PEP 562 lazy re-exports
    if name in ("build_triples", "PipelineConfig"):
        from kgtm import pipeline

        return getattr(pipeline, name)
    if name == "get_spark":
        from kgtm.session import get_spark

        return get_spark
    if name in ("generate", "SynthConfig"):
        from kgtm import synth

        return getattr(synth, name)
    if name in ("curate_documents", "incremental_curate", "append_curated_batch", "persist_ledger", "read_ledger"):
        from kgtm import curation

        return getattr(curation, name)
    if name in ("incremental_relink", "link_mentions", "broadcast_ladder_link"):
        from kgtm import link

        return getattr(link, name)
    if name == "resolve_links":
        from kgtm.resolve import resolve_links

        return resolve_links
    if name in ("write_triples", "read_triples", "write_table", "read_table", "compact_table", "list_commits"):
        from kgtm import materialize

        return getattr(materialize, name)
    if name == "repetition_signals":
        from kgtm.repetition import repetition_signals

        return repetition_signals
    if name == "pagerank":
        from kgtm.graph import pagerank

        return pagerank
    if name in ("unigram_counts", "unigram_nll"):
        from kgtm import lm

        return getattr(lm, name)
    if name == "paragraph_dedup":
        from kgtm.paragraphs import paragraph_dedup

        return paragraph_dedup
    if name in ("repetition_filter", "mixture_sample", "split_assign", "leakage_safe_split"):
        from kgtm import mixture

        return getattr(mixture, name)
    if name in ("pii_signals", "redact_pii"):
        from kgtm import pii

        return getattr(pii, name)
    if name in ("chunk_token_windows", "pack_greedy"):
        from kgtm import packing

        return getattr(packing, name)
    raise AttributeError(name)
