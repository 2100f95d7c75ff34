"""Dev smoke: run the thin end-to-end slice on sf0.001 and print counts."""
import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from kgtm.session import get_spark
from kgtm.transcripts import (
    events_to_transcripts,
    ontology_index_df,
    ontology_snapshots_df,
)
from kgtm.assemble import assemble_conversations, assemble_conversations_salted
from kgtm.extract import extract_mentions, extract_triples
from kgtm.link import link_mentions
from kgtm.resolve import resolve_links

spark = get_spark(cores=8, shuffle_partitions=8)
spark.sparkContext.setLogLevel("WARN")

events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
tr = events_to_transcripts(events)
tr.show(3, truncate=False)

conv = assemble_conversations(tr)
conv_s = assemble_conversations_salted(tr)
print("convs:", conv.count(), "salted equal:", conv.exceptAll(conv_s).count() == 0 == conv_s.exceptAll(conv).count())

m = extract_mentions(tr)
m.show(5, truncate=False)
print("mentions:", m.count())

idx = ontology_index_df(spark)
linked = link_mentions(m, idx)
linked.groupBy("is_linked", "rung").count().orderBy("is_linked", "rung").show()

snaps = ontology_snapshots_df(spark)
res = resolve_links(linked, snaps, "latestArchived")
res.groupBy("source").count().show()
import datetime as dt
res2 = resolve_links(linked, snaps, "timestampArchived", dt.datetime(2024, 7, 1))
res2.groupBy("source", "snapshot_iri").count().orderBy("source").show(truncate=False)

t = extract_triples(tr)
print("triples:", t.count())
t.show(3, truncate=False)
spark.stop()
