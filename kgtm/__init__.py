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
