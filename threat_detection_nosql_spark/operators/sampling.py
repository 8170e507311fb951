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
