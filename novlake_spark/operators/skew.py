"""Skew mitigation: salted broadcast-replicated join.

AQE's skew-join splitting (enabled in session.py) handles most skew in
sort-merge joins automatically. Salting is the explicit tool for the
cases AQE can't fix — e.g. a shuffled hash/aggregate where one key holds
1% of 100 TB: the large side spreads each key over ``n_salt`` synthetic
sub-keys, the small side replicates ``n_salt``×, and the join key
becomes (key, salt) so the hot key's rows land on ``n_salt`` different
tasks instead of one straggler.

Cost model: small side shuffles n_salt× its size (keep it the dimension
side); the large side's shuffle is unchanged in volume but uniform in
distribution — which is the whole point.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: str,
    n_salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``large ⋈ small`` on column ``on`` with key salting.

    Salt assignment on the large side is a deterministic hash of the
    whole row (stable across retries/speculative tasks — F.rand would
    break exactly-once semantics under task retry).
    """
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in large.columns]), F.lit(n_salt))
    salted_large = large.withColumn("_salt", salt)
    salted_small = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salt)]))
    )
    return salted_large.join(salted_small, [on, "_salt"], how).drop("_salt")
