"""Join strategies for skewed keys at scale.

A shuffled equi-join hashes rows to partitions by key, so one hot key
(the null user, the boilerplate doc, the megacustomer) lands its
entire row set on one task — the classic straggler that stalls a
1000-executor job at 99%. Two levers, in preference order:

1. AQE skew-join (``spark.sql.adaptive.skewJoin.enabled``, on in
   session.py): splits oversized *sort-merge* partitions at runtime.
   Free, but only fires for sort-merge joins and only on the probe
   side's post-shuffle partition sizes.
2. Explicit salting (this module): spread each hot key over ``salt``
   sub-keys on the big side and replicate the small side's matching
   rows ``salt``× — works for any join the optimizer picks, at the
   fixed cost of a ``salt``× blow-up of the replicated side's shuffle.

``salted_join`` salts every key uniformly (replicated side must be
small-ish — a dimension table too big to broadcast but cheap to
replicate 16×). ``salted_join_hot_keys`` salts only a known hot-key
list, broadcast as a filter, so the replication cost is paid solely
for the keys that need it — the shape to reach for first at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str | list[str],
    how: str = "inner",
    salt: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Equi-join with uniform salting: ``big`` gets a random salt in
    [0, salt), ``small`` is replicated once per salt value, and the
    join key becomes (key..., salt). Result is exactly the plain join
    (salt columns are internal). ``how`` supports inner/left joins —
    the salted key never *removes* matches, and every big-side row
    keeps exactly one salt, so multiplicities are preserved."""
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(f"salted_join supports inner/left joins, got {how}")
    if "__salt" in big.columns or "__salt" in small.columns:
        raise ValueError("salted_join: inputs must not already have a __salt column")
    keys = [on] if isinstance(on, str) else list(on)
    b = big.withColumn("__salt", (F.rand(seed) * salt).cast("int"))
    s = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    return b.join(s, [*keys, "__salt"], how).drop("__salt")


def salted_join_hot_keys(
    big: DataFrame,
    small: DataFrame,
    on: str,
    hot_keys: DataFrame,
    how: str = "inner",
    salt: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Salting restricted to a known hot-key set (e.g. from a profiling
    pass: ``big.groupBy(key).count().filter(count > bound)``).

    Hot rows take a random salt and join against the replicated hot
    slice of ``small``; the long cold tail joins plain, unreplicated.
    The union of the two joins is exactly the plain join. ``hot_keys``
    must be a one-column DataFrame of key values, small enough to
    broadcast (it is, by construction — keys whose row counts exceed a
    bound are few)."""
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(f"salted_join_hot_keys supports inner/left joins, got {how}")
    hk = F.broadcast(hot_keys.select(F.col(hot_keys.columns[0]).alias(on)).distinct())
    big_hot = big.join(hk, on, "left_semi")
    big_cold = big.join(hk, on, "left_anti")
    small_hot = small.join(hk, on, "left_semi")
    hot_joined = salted_join(big_hot, small_hot, on, how, salt, seed)
    cold_joined = big_cold.join(small, on, how)
    return hot_joined.unionByName(cold_joined)
