"""Fuzzy (edit-distance) string joins at scale — PassJoin-style.

A naive edit-distance join compares every string pair — n² levenshtein
calls, hopeless at corpus scale. The PassJoin family [Li et al., PVLDB
2011] blocks on SEGMENTS: split each string into ``max_dist + 1``
pieces; if ed(s, t) <= max_dist then (pigeonhole — k edits cannot
touch k+1 disjoint segments) at least one segment of s appears intact
in t, shifted by at most ``max_dist`` positions. So:

- probe side emits its k+1 canonical segments,
- index side emits every substring that could match a segment (same
  segment index, start shifted by -k..k),
- candidates meet on an EQUI-join key (length, segment index,
  substring) — a hash shuffle, never a cross join,
- candidates verify exactly with the built-in ``levenshtein``.

This implementation handles equal-length pairs (the common
entity-resolution case: codes, normalized names, padded ids); the
general variant adds per-length-delta segmentations on the index side
— same join shape, more emitted keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def edit_distance_pairs(df: DataFrame, col: str = "name", id_col: str = "id",
                        max_dist: int = 1) -> DataFrame:
    """(id_a, id_b, dist) for same-length string pairs with
    ``levenshtein <= max_dist`` (id_a < id_b). Exact: segment blocking
    guarantees recall, levenshtein verification removes false
    candidates.
    """
    k = max_dist
    n_seg = k + 1
    length = F.length(F.col(col))

    # canonical segmentation of a string of this row's length: segment i
    # covers [start_i, start_{i+1}) with the remainder spread over the
    # leading segments (all 1-based substr arithmetic in expressions)
    def seg_bounds(i: int):
        seg_len = (length / n_seg).cast("int")
        extra = length % n_seg
        start = F.lit(1) + F.lit(i) * seg_len + F.least(F.lit(i), extra)
        this_len = seg_len + F.when(F.lit(i) < extra, 1).otherwise(0)
        return start, this_len

    probe_entries = []
    index_entries = []
    for i in range(n_seg):
        start, this_len = seg_bounds(i)
        probe_entries.append(
            F.struct(F.lit(i).alias("seg"), F.substr(F.col(col), start, this_len).alias("piece"))
        )
        for d in range(-k, k + 1):
            shifted = start + d
            valid = (shifted >= 1) & (shifted + this_len - 1 <= length)
            index_entries.append(
                F.when(valid, F.struct(
                    F.lit(i).alias("seg"),
                    F.substr(F.col(col), shifted, this_len).alias("piece"),
                ))
            )

    base = df.select(F.col(id_col), F.col(col), length.alias("_len"))
    probe = base.select(
        F.col(id_col).alias("id_a"), F.col(col).alias("_sa"), "_len",
        F.explode(F.array(*probe_entries)).alias("e"),
    ).select("id_a", "_sa", "_len", F.col("e.seg").alias("seg"), F.col("e.piece").alias("piece"))
    index = base.select(
        F.col(id_col).alias("id_b"), F.col(col).alias("_sb"), "_len",
        F.explode(F.filter(F.array(*index_entries), lambda x: x.isNotNull())).alias("e"),
    ).select("id_b", "_sb", "_len", F.col("e.seg").alias("seg"), F.col("e.piece").alias("piece"))

    cands = (
        probe.join(index, ["_len", "seg", "piece"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "_sa", "_sb")
        .distinct()
    )
    dist = F.levenshtein("_sa", "_sb")
    return (
        cands.withColumn("dist", dist)
        .filter(F.col("dist") <= k)
        .select("id_a", "id_b", "dist")
    )
