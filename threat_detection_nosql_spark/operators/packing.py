"""Sequence packing for LLM training pipelines: assign documents to
fixed token-budget bins (the pre-tokenization shuffle/pack stage).

Exact first-fit bin packing is inherently sequential; the scalable
formulation packs *within a shard* (here: ``source``) by a stable
order and assigns bin = floor(running_token_start / budget). A
document that straddles a budget boundary shares its bin with the
overflow — callers that need hard caps split the straddler downstream
(deterministic, cheap, and local to one bin). This is the standard
streaming approximation: one window over (shard, order), no driver
state, horizontally parallel across shards.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def pack_by_budget(df: DataFrame, tokens_col: str, budget: int,
                   shard: str, order: str) -> DataFrame:
    """Add ``bin`` (0-based within shard) = floor(cumulative tokens of
    preceding docs / budget). Window is partitioned by ``shard`` so the
    sort never globalizes — each shard packs independently, exactly how
    a 1000-executor run would lay out shards."""
    w = (Window.partitionBy(shard).orderBy(F.asc(order))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    start = F.sum(F.col(tokens_col)).over(w) - F.col(tokens_col)
    return df.withColumn("bin", F.floor(start / F.lit(budget)))
