"""Seeded fuzz parity: the Spark column-expression implementations must agree
with the pure-Python specs on randomized inputs (these nets caught the
host-only gap that golden cases missed)."""

from __future__ import annotations

import random
import string

from pyspark.sql import functions as F

from kgtm.link import link_mentions
from kgtm.negotiate import format_from_accept_col, get_format_from_accept_header
from kgtm.normalize import parse_iri_cols, resolve_membership, split_iri
from kgtm.schemas import ONTOLOGY_INDEX_SCHEMA


def test_fuzz_ladder_spark_vs_pure(spark):
    rng = random.Random(424242)

    def rand_seg():
        return "".join(
            rng.choice(string.ascii_lowercase + string.digits + "_-")
            for _ in range(rng.randint(1, 6))
        )

    def rand_path():
        n = rng.randint(0, 4)
        p = "/" + "/".join(rand_seg() for _ in range(n)) if n else ""
        if p and rng.random() < 0.4:
            p += "/"
        return p

    hosts = [f"h{i}.org" for i in range(6)]
    dict_rows, dict_set = [], set()
    for _ in range(80):
        h, p = rng.choice(hosts), rand_path() or "/x"
        if (h, p) in dict_set:
            continue
        dict_set.add((h, p))
        dict_rows.append((f"http://{h}{p}", h, p, "term"))

    iris = set()
    for i in range(200):
        h = rng.choice(hosts)
        if rng.random() < 0.5:
            base = rng.choice(dict_rows)
            h = base[1]
            p = base[2] + rng.choice(
                ["", "/", f"/{rand_seg()}", f"/{rand_seg()}/{rand_seg()}", f"#f{i}"]
            )
        else:
            p = rand_path()
        iris.add(f"{rng.choice(['http', 'https'])}://{h}{p}")
    iris = sorted(iris)

    index = spark.createDataFrame(dict_rows, ONTOLOGY_INDEX_SCHEMA)
    m = spark.createDataFrame([(i,) for i in iris], "surface string").select(
        F.lit("c").alias("conv_id"),
        F.lit(0).alias("turn_idx"),
        F.xxhash64("surface").alias("mention_id"),
        "surface",
        *parse_iri_cols("surface"),
    )
    got = {r.surface: r for r in link_mentions(m, index).collect()}
    for iri in iris:
        _, h, p, _ = split_iri(iri)
        ok, canon, rung = resolve_membership(h, p, dict_set)
        r = got[iri]
        assert (r.is_linked, r.canonical_path, r.rung) == (
            ok,
            canon if ok else None,
            rung if ok else None,
        ), iri


def test_fuzz_negotiation_spark_vs_pure(spark):
    rng = random.Random(777)
    mimes = [
        "application/rdf+xml", "application/owl+xml", "text/turtle",
        "application/n-triples", "text/html", "application/json", "*/*",
        "image/png", "text/plain", "application/xml",
    ]
    qs = ["", ";q=0", ";q=0.1", ";q=0.5", ";q=0.9", ";q=1.0", ";q=1",
          ";q=abc", "; q=0.5", ";level=1;q=0.7"]
    headers = set()
    for _ in range(250):
        n = rng.randint(0, 5)
        parts = [rng.choice(mimes) + rng.choice(qs) for _ in range(n)]
        headers.add(rng.choice([",", ", ", " ,"]).join(parts))
    headers = sorted(headers)

    df = spark.createDataFrame([(h,) for h in headers], "accept_header string")
    got = {
        r.accept_header: r.fmt
        for r in df.select(
            "accept_header", format_from_accept_col("accept_header").alias("fmt")
        ).collect()
    }
    for h in headers:
        assert got[h] == get_format_from_accept_header(h), repr(h)
