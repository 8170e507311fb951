"""Shannon entropy as a pure-SQL operator (SURVEY.md A11).

The reference computes entropy client-side: Cypher collects per-user
frequency lists, then Python loops compute −Σ p·log2(p)
(`neo4j_analysis.py:98-114,203-213,228-240,264-280`). That hybrid
boundary collapses here into one aggregation plan: freq → window-share →
grouped sum. No UDF, fully codegen'd, two shuffles on `user` total
(AQE may keep it at one exchange since both aggs share the key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def add_shannon_entropy(df: DataFrame, group_col: str, value_col: str,
                        out_col: str = "entropy",
                        round_to: int | None = 6) -> DataFrame:
    """Per-``group_col`` Shannon entropy of the ``value_col`` distribution.

    Equivalent to the reference's
    ``-sum(p * log2(p) for p in freq/total)`` (`neo4j_analysis.py:107-109`).
    Implemented as two hash aggregations on the same key (no window — a
    grouped sum of counts then a ratio inside the final agg), so Spark
    plans a single exchange on ``group_col``.
    """
    freq = df.groupBy(group_col, value_col).agg(F.count("*").alias("freq"))
    return entropy_from_freq(freq, group_col, "freq", out_col, round_to)


def entropy_from_freq(freq: DataFrame, group_col: str,
                      freq_col: str = "freq", out_col: str = "entropy",
                      round_to: int | None = 6) -> DataFrame:
    """Entropy from a pre-computed (group, value, freq) table — lets
    several entropies share ONE pass over the raw data (the fused
    user_features path): −Σ (f/T)·log2(f/T) = log2(T) − (Σ f·log2 f)/T,
    one grouped agg, no self-join/window."""
    ent = (freq
           .groupBy(group_col)
           .agg(F.sum(freq_col).alias("_total"),
                F.sum(F.col(freq_col) * F.log2(freq_col)).alias("_flogf"))
           .select(F.col(group_col),
                   (F.log2("_total")
                    - F.col("_flogf") / F.col("_total")).alias(out_col)))
    if round_to is not None:
        ent = ent.withColumn(out_col, F.round(out_col, round_to))
    return ent


def entropy_oracle_sql(source_sql: str, group_col: str, value_col: str,
                       out_col: str = "entropy", round_to: int = 6) -> str:
    """DuckDB SQL computing the identical entropy (same Σ over same
    frequencies — SURVEY.md §7 'hybrid client/server semantics')."""
    # Same algebraic form as the Spark side (log2(T) − Σf·log2f / T) to
    # keep float divergence below the rounding threshold.
    return f"""
WITH freq AS (
  SELECT {group_col}, {value_col}, count(*) AS freq
  FROM ({source_sql}) src
  GROUP BY {group_col}, {value_col}
)
SELECT {group_col},
       round(log2(sum(freq)) - sum(freq * log2(freq)) / sum(freq),
             {round_to}) AS {out_col}
FROM freq
GROUP BY {group_col}
"""
