"""Triple-quality metrics: precision/recall vs planted golden triples.

The P/R ≥ 0.95 gate from BASELINE.json. Twin of the reference's
"describes the requested ontology" checks: is_uri_in_subject
(/root/reference/experiments/parse_ontologies.py:14-19) and the e2e body
assertion (/root/reference/tests/test_integration.py:120-121) — lifted from a
boolean per-file check to set-intersection P/R over (conv_id, subj, pred, obj).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TRIPLE_KEY = ["conv_id", "subj", "pred", "obj"]


def triple_pr(got: DataFrame, golden: DataFrame) -> dict[str, float]:
    """Distinct-set precision/recall/F1 of got vs golden on TRIPLE_KEY.

    One job: tag distinct triples from both sides, full-outer aggregate —
    no collect of the triple sets themselves.
    """
    g = got.select(*TRIPLE_KEY).distinct().withColumn("_got", F.lit(1))
    w = golden.select(*TRIPLE_KEY).distinct().withColumn("_want", F.lit(1))
    j = g.join(w, TRIPLE_KEY, "full_outer")
    agg = j.agg(
        F.count(F.col("_got")).alias("n_got"),
        F.count(F.col("_want")).alias("n_want"),
        F.count(F.when(F.col("_got").isNotNull() & F.col("_want").isNotNull(), 1)).alias("n_both"),
    ).collect()[0]
    p = agg.n_both / agg.n_got if agg.n_got else 0.0
    r = agg.n_both / agg.n_want if agg.n_want else 0.0
    f1 = 2 * p * r / (p + r) if (p + r) else 0.0
    return {
        "precision": p,
        "recall": r,
        "f1": f1,
        "n_got": agg.n_got,
        "n_want": agg.n_want,
        "n_both": agg.n_both,
    }
