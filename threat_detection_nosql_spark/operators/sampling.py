"""Deterministic sampling for training-data pipelines.

``sample()``/``rand()`` are seeded per-partition in Spark, so a
repartition (or a different cluster size) changes which rows a
"seeded" sample keeps. Corpus curation needs the opposite property:
the keep/drop decision for a document must be a pure function of the
document's key — stable across reruns, partitionings, and engines
(the DuckDB oracle reproduces it bit-for-bit). The standard fix is
hash-mod sampling: keep iff hash(salt || key) mod M < rate·M.

Everything here is a single JVM expression per row — no shuffle, no
UDF; the filter pushes down to the scan like any other predicate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from threat_detection_nosql_spark.operators.dedup import _portable_hash60

_MOD = 10_000  # rate resolution: 0.01%


def hash_bucket(key: Column, salt: str = "sample") -> Column:
    """Deterministic bucket in [0, _MOD) from the row key — the
    portable 60-bit md5 hash (operators/dedup.py) so the oracle can
    recompute it."""
    return F.pmod(
        _portable_hash60(F.concat(F.lit(f"{salt}:"), key.cast("string"))),
        F.lit(_MOD))


def hash_sample(df: DataFrame, key: str, fraction: float,
                salt: str = "sample") -> DataFrame:
    """Keep a deterministic ~``fraction`` of rows keyed by ``key``."""
    return df.filter(hash_bucket(F.col(key), salt)
                     < int(round(fraction * _MOD)))


def stratified_hash_sample(df: DataFrame, key: str, stratum: str,
                           fractions: dict[str, float],
                           default: float = 1.0,
                           salt: str = "sample") -> DataFrame:
    """Per-stratum deterministic rates (corpus mixing: e.g. downsample
    a crawl source to 10% while keeping curated sources whole). The
    rate lookup compiles to a CASE expression — still a scan-level
    predicate, no join."""
    thresh = F.lit(int(round(default * _MOD)))
    for val, frac in sorted(fractions.items()):
        thresh = F.when(F.col(stratum) == val,
                        int(round(frac * _MOD))).otherwise(thresh)
    return df.filter(hash_bucket(F.col(key), salt) < thresh)


def temperature_mixture_rates(df: DataFrame, stratum: str,
                              weight_col: Column,
                              alpha: float = 0.3,
                              budget_frac: float = 0.5) -> DataFrame:
    """Temperature-based mixture reweighting (the multilingual-LM
    standard: sampling share ∝ mass^alpha, alpha<1 upweights small
    sources) with a token budget: given per-stratum mass (token
    counts), compute each stratum's temperature share p_s and the
    deterministic per-stratum keep rate that realizes the mixture at
    ``budget_frac`` of the corpus — rate_s = min(1, budget·p_s/n_s).

    One map-combined agg to |strata| rows; the share normalization is
    a window over that tiny frame (no second scan). The output is the
    broadcast side of the join `mixture_hash_sample` applies — at
    100 TB the rate table is bytes, the corpus never shuffles.
    """
    from pyspark.sql.window import Window
    agg = (df.groupBy(stratum)
           .agg(F.count("*").alias("n_docs"),
                F.sum(weight_col).alias("mass")))
    w = Window.partitionBy()
    powed = F.pow(F.col("mass").cast("double"), F.lit(alpha))
    out = (agg
           .withColumn("share", F.col("mass") / F.sum("mass").over(w))
           .withColumn("t_share", powed / F.sum(powed).over(w))
           .withColumn("rate", F.least(
               F.lit(1.0),
               F.lit(budget_frac) * F.col("t_share")
               * F.sum("mass").over(w) / F.col("mass"))))
    return out.select(stratum, "n_docs", "mass",
                      F.round("share", 6).alias("share"),
                      F.round("t_share", 6).alias("t_share"),
                      F.round("rate", 6).alias("rate"))


def mixture_hash_sample(df: DataFrame, key: str, stratum: str,
                        rates: DataFrame,
                        salt: str = "mix") -> DataFrame:
    """Apply data-dependent per-stratum rates (e.g. from
    ``temperature_mixture_rates``) as a deterministic hash-mod filter.
    Unlike ``stratified_hash_sample`` the rates are a DataFrame, so
    the decision is a broadcast join + scan-level predicate — still no
    corpus shuffle, still engine-reproducible."""
    thresh = F.floor(F.round(F.col("rate") * _MOD, 3)).cast("long")
    return (df.join(F.broadcast(rates.select(stratum, "rate")), stratum)
            .filter(hash_bucket(F.col(key), salt) < thresh)
            .drop("rate"))
