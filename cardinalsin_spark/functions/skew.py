"""Skew handling: salted equi-join.

AQE's skew-join split (enabled in ``session.py``) handles most sort-merge
skew at runtime; salting is the explicit fallback for pathological keys
(the reference's answer was operational — hot-shard detection + 5-phase
split, ``sharding/monitor.rs``, ``sharding/splitter.rs`` — which Spark
replaces with partitioning math).

``salted_join`` spreads one hot build key over ``n_salts`` shuffle
partitions by appending a per-row salt on the big side and replicating the
small side once per salt value. Cost: small side × n_salts rows — use for
genuinely small dimensions only (broadcast is better still when it fits;
salting is for the mid-size case where broadcast OOMs but keys skew).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    n_salts: int = 16,
    how: str = "inner",
    seed: int = 42,
) -> DataFrame:
    """Equi-join with the big side's hot keys spread over ``n_salts``
    partitions. Result is identical to ``big.join(small, on, how)``.

    Supported ``how``: inner / left — the replicated right side would
    multiply unmatched right rows under right/full joins.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins")
    salted_big = big.withColumn(
        SALT_COL, (F.rand(seed) * n_salts).cast("int")
    )
    salted_small = small.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return salted_big.join(salted_small, [*on, SALT_COL], how).drop(SALT_COL)
