"""Skew mitigation utilities (SURVEY.md §7 step 8: "salted keys for
skewed users").

AQE's skew-join splitting handles most hot keys at runtime
(`spark.sql.adaptive.skewJoin.enabled`, on in session.py), but it only
splits the *shuffled* side of sort-merge joins. Salting remains the
manual tool when AQE can't help: joining a skewed fact to a
non-broadcastable dimension, or stream-static joins where AQE doesn't
re-plan. The transformation is semantics-preserving: results equal the
plain join (pinned by tests/test_skew.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(fact: DataFrame, dim: DataFrame, key: str,
                n_salts: int = 16, how: str = "inner",
                seed: int = 42) -> DataFrame:
    """Equi-join robust to hot fact keys: fact rows scatter across
    ``n_salts`` sub-keys (random salt), the dim side replicates ×n_salts
    (explode — dim is the smaller side by assumption), and the join key
    becomes (key, salt). A key carrying 30% of the fact now lands on
    n_salts reducers instead of one. Cost: dim shuffle volume ×n_salts
    — choose n_salts ≈ (hot-key share) × (cluster cores).
    """
    f = fact.withColumn(
        "_salt", F.floor(F.rand(seed) * n_salts).cast("int"))
    d = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))))
    out = f.join(d, [key, "_salt"], how)
    return out.drop("_salt")
