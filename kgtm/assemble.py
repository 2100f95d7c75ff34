"""Turn assembly: window-ordered per-conversation reconstruction.

The per-row fidelity invariant (per-turn ``text`` equality under stable
(conv_id, turn_idx) ordering) is the batch analog of the reference's
pass-through body guarantee — ``handle_upstream_chunk`` returns chunks
untouched (/root/reference/ontologytimemachine/custom_proxy.py:206-207).

Scale notes:
  * ``assemble_conversations`` is ONE shuffle on conv_id (groupBy with
    map-side partial aggregation); ordering happens inside the aggregated
    array (array_sort on struct(turn_idx, ...)), NOT via a global sort.
  * Hot conversations (a 2,000-turn conv in a sea of 5-turn convs) are a
    groupBy skew AQE can't split. ``assemble_conversations_salted`` does the
    classic two-phase aggregation: salt → partial per (conv_id, salt) →
    final merge per conv_id. The partial combine shrinks each hot key's
    payload before the second, tiny shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_N_SALT = 16


def ordered_turns_agg(extra_cols: list[str] | None = None) -> Column:
    cols = [F.col("turn_idx").alias("turn_idx"), F.col("text").alias("text")] + [
        F.col(c).alias(c) for c in (extra_cols or [])
    ]
    return F.array_sort(F.collect_list(F.struct(*cols))).alias("turns")


def assemble_conversations(transcripts: DataFrame, sep: str = "\n") -> DataFrame:
    """conv_id, n_turns, conv_text (turns joined in turn_idx order).

    array_sort on struct sorts by the first field (turn_idx) — stable,
    deterministic, no global sort, no secondary shuffle.
    """
    return (
        transcripts.groupBy("conv_id")
        .agg(ordered_turns_agg())
        .select(
            "conv_id",
            F.size("turns").cast("long").alias("n_turns"),
            F.array_join(F.transform("turns", lambda t: t["text"]), sep).alias(
                "conv_text"
            ),
        )
    )


def assemble_conversations_salted(
    transcripts: DataFrame, sep: str = "\n", n_salt: int = DEFAULT_N_SALT
) -> DataFrame:
    """Two-phase (salted) assembly for hot-conversation skew.

    Phase 1 shuffles on (conv_id, salt) — a hot conv_id spreads over n_salt
    reducers; each emits one pre-combined struct list. Phase 2 shuffles only
    the per-salt partials (≤ n_salt rows per conv), merges and flattens.
    Output is identical to assemble_conversations (tests assert equality).
    """
    salted = transcripts.withColumn(
        "salt", F.pmod(F.hash("turn_idx"), F.lit(n_salt))
    )
    partial = salted.groupBy("conv_id", "salt").agg(
        F.collect_list(F.struct("turn_idx", "text")).alias("part_turns"),
        F.count(F.lit(1)).alias("part_n"),
    )
    return (
        partial.groupBy("conv_id")
        .agg(
            F.array_sort(F.flatten(F.collect_list("part_turns"))).alias("turns"),
            F.sum("part_n").alias("n_turns"),
        )
        .select(
            "conv_id",
            F.col("n_turns").cast("long"),
            F.array_join(F.transform("turns", lambda t: t["text"]), sep).alias(
                "conv_text"
            ),
        )
    )


# (The per-turn fidelity invariant is asserted by
# tests/test_assemble.py::test_per_turn_text_fidelity_roundtrip.)
