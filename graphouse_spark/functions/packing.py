"""Token-budget sequence packing — the last mile of a training pipeline.

Training consumes fixed-length token sequences; feeding one short doc
per sequence wastes the budget, so documents get PACKED: greedy
first-fit-decreasing into shards of ``budget`` tokens.

Packing is inherently sequential (bin state), so the distributed shape
is partition-local packing — exactly how real pipelines run it: each
worker packs its slice independently, shard ids are (group, bin)
pairs, and global optimality is traded for linear scale (FFD is within
11/9 OPT per group; groups are statistically identical).

Determinism: groups come from the portable md5 hash of the doc id (not
from physical partitioning, which varies with cluster layout), and
each group packs in (tokens desc, id asc) order — the same input
always yields the same shards on any cluster size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphouse_spark.functions.dedup import portable_hash32
from graphouse_spark.functions.text import tokens_col


def pack_sequences(docs: DataFrame, budget: int = 2048, n_groups: int = 32,
                   id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Assign every doc to a shard: (doc_id, n_tokens, shard_id, offset).

    - ``sum(n_tokens) <= budget`` per shard, except a single oversized
      doc, which gets its own shard (truncation is the caller's call);
    - ``offset`` is the doc's start position inside its shard;
    - ``shard_id`` = "<group>-<bin>": stable across runs and clusters.
    """
    import pandas as pd

    with_counts = docs.select(
        F.col(id_col),
        F.size(tokens_col(F.col(text_col))).alias("n_tokens"),
        (portable_hash32(F.col(id_col).cast("string")) % n_groups).alias("_grp"),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["n_tokens", id_col], ascending=[False, True]).reset_index(drop=True)
        gid = int(pdf["_grp"].iloc[0])
        remaining: list[int] = []   # free tokens per open bin
        used: list[int] = []        # filled tokens per open bin
        bins, offsets = [], []
        for t in pdf["n_tokens"]:
            t = int(t)
            placed = None
            for b, free in enumerate(remaining):
                if t <= free:
                    placed = b
                    break
            if placed is None:
                remaining.append(max(budget - t, 0))
                used.append(0)
                placed = len(remaining) - 1
            else:
                remaining[placed] -= t
            bins.append(f"{gid}-{placed}")
            offsets.append(used[placed])
            used[placed] += t
        out = pdf[[id_col, "n_tokens"]].copy()
        out["shard_id"] = bins
        out["offset"] = offsets
        return out

    id_type = docs.schema[id_col].dataType.simpleString()
    schema = f"{id_col} {id_type}, n_tokens int, shard_id string, offset int"
    return with_counts.groupBy("_grp").applyInPandas(pack, schema)
