"""Dataset splitting and sampling operators for training-data
pipelines: deterministic hash splits (train/val/test) and exact
stratified sampling.

Both are reproducible by construction — membership depends only on row
identity and the seed, never on partitioning, task order, or cluster
size, so a re-run (or an incremental run over late-arriving data)
assigns every row the same way. That property is what makes them safe
at 100 TB: Spark's built-in ``randomSplit``/``sample`` re-draw under
retries and repartitioning, which silently leaks val rows into train
across runs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from sql_based_etl_spark.operators.dedup import portable_hash

# 28-bit portable hash → ~268M distinct values; modulo bias at any
# sane bucket count is ≤ buckets/2^28 (0.4% at the default 1e6), and
# identical in the DuckDB oracle, so parity is exact.
SPLIT_BUCKETS = 1_000_000


def _salted_hash(id_col: str, seed: int) -> Column:
    """Portable 28-bit hash of (row id, seed) — same md5-derived value
    in any engine (operators/dedup.py:portable_hash)."""
    return portable_hash(
        F.concat(F.col(id_col).cast("string"), F.lit(f"#{seed}")), hex_chars=7
    )


def hash_split(
    df: DataFrame,
    id_col: str = "doc_id",
    splits: tuple[tuple[str, float], ...] = (
        ("train", 0.98),
        ("val", 0.01),
        ("test", 0.01),
    ),
    seed: int = 42,
) -> DataFrame:
    """Assign every row to a named split by hash-bucketing its id.

    Pure per-row projection (no shuffle, no state): bucket =
    salted_hash(id) mod 1e6, compared against the cumulative weight
    boundaries. Weights need not sum to 1 — a deliberate shortfall
    leaves a holdout of unassigned (NULL-split) rows.
    """
    total = sum(w for _, w in splits)
    if total > 1.0 + 1e-9:
        raise ValueError(f"split weights sum to {total} > 1")
    bucket = _salted_hash(id_col, seed) % SPLIT_BUCKETS
    expr = F.lit(None).cast("string")
    hi = 0.0
    cases = []
    for name, w in splits:
        hi += w
        cases.append((int(round(hi * SPLIT_BUCKETS)), name))
    for bound, name in reversed(cases):
        expr = F.when(bucket < F.lit(bound), F.lit(name)).otherwise(expr)
    return df.withColumn("split", expr)


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fraction: float,
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """EXACT per-stratum sampling: keep ``ceil(fraction * n)`` rows of
    every stratum, chosen as the lowest salted hashes (id tiebreak).

    One shuffle on the stratum key; the rank and the stratum size come
    from the same window pass. Exactness is the point — proportional
    class balance survives, unlike Bernoulli ``sample()`` whose
    per-stratum counts fluctuate. Skew note: a mega-stratum funnels
    into one partition here; when strata are few and huge, pre-salt the
    hash sort (operators/joins.py) or accept Bernoulli sampling's
    variance instead.
    """
    h = _salted_hash(id_col, seed)
    order = Window.partitionBy(strata_col).orderBy(h.asc(), F.col(id_col).asc())
    size = Window.partitionBy(strata_col)
    return (
        df.withColumn("__rank", F.row_number().over(order))
        .withColumn("__n", F.count(F.lit(1)).over(size))
        .filter(F.col("__rank") <= F.ceil(F.lit(fraction) * F.col("__n")))
        .drop("__rank", "__n")
    )


def mixture_sample(
    df: DataFrame,
    weights: dict[str, float],
    group_col: str = "source",
    id_col: str = "doc_id",
    default: float = 0.0,
    seed: int = 42,
) -> DataFrame:
    """Deterministic data-mixture sampling with epoch weighting — the
    mixing step of every pretraining corpus (e.g. "2.2 epochs of
    wikipedia, 0.3 of common-crawl"): each group's weight ``w`` keeps
    ``floor(w)`` full copies of every row plus one more copy for the
    deterministic ``frac(w)`` fraction of rows (salted-hash gated, so
    membership is identical across re-runs, retries, and cluster
    sizes — the property ``sample()`` lacks). Groups absent from
    ``weights`` get ``default``.

    Pure per-row projection + generator: no shuffle, no state; the
    only data growth is the emitted copies themselves. Output adds a
    ``copy`` column (1..n) so downstream packing can interleave
    epochs rather than emit them back-to-back.
    """
    whole_expr = F.lit(int(default // 1))
    bound_expr = F.lit(int(round((default % 1) * SPLIT_BUCKETS)))
    for g, w in sorted(weights.items()):
        if w < 0:
            raise ValueError(f"negative mixture weight for {g!r}: {w}")
        whole = int(w // 1)
        bound = int(round((w % 1) * SPLIT_BUCKETS))
        whole_expr = F.when(F.col(group_col) == g, F.lit(whole)).otherwise(whole_expr)
        bound_expr = F.when(F.col(group_col) == g, F.lit(bound)).otherwise(bound_expr)
    bucket = _salted_hash(id_col, seed) % SPLIT_BUCKETS
    n = (whole_expr + F.when(bucket < bound_expr, 1).otherwise(0)).cast("int")
    # sequence(1, 0) in Spark steps DOWNWARD ([1, 0]) — guard n < 1 to
    # an empty array so zero-copy rows vanish instead of doubling
    copies = F.when(
        n >= 1, F.sequence(F.lit(1), n)
    ).otherwise(F.array().cast("array<int>"))
    return df.withColumn("copy", F.explode(copies))


def cap_per_group(
    df: DataFrame,
    group_col: str,
    cap: int,
    id_col: str = "doc_id",
    seed: int = 42,
    pre_prune_salts: int | None = None,
) -> DataFrame:
    """Keep at most ``cap`` rows per group — domain/source throttling,
    the web-crawl curation step that stops one mega-domain from
    dominating a pretraining mix. Which rows survive is a deterministic
    pseudo-random choice (lowest salted hashes, id tiebreak), so a
    re-run, a retry, or an incremental extension of the corpus keeps
    the SAME representatives per group.

    One shuffle on the group key; rank comes from a single window pass.
    Skew note: at 100 TB a mega-domain funnels its rows into one
    partition before the rank. Set ``pre_prune_salts`` for the
    two-phase top-k: phase 1 ranks within (group, hash mod salts) —
    the mega-domain spreads over ``salts`` bounded partitions — and
    keeps ≤ cap rows per salt, a lossless prune (any row in the
    group's global top-``cap`` is necessarily in its salt bucket's
    top-``cap``); phase 2's global window then sees ≤ salts·cap rows
    per group instead of the whole domain. Same output, bounded
    partitions.
    """
    if cap < 0:
        raise ValueError(f"cap must be >= 0, got {cap}")
    h = _salted_hash(id_col, seed)
    if pre_prune_salts:
        pre = Window.partitionBy(
            F.col(group_col), (h % pre_prune_salts).alias("__salt")
        ).orderBy(h.asc(), F.col(id_col).asc())
        df = (
            df.withColumn("__r1", F.row_number().over(pre))
            .filter(F.col("__r1") <= F.lit(cap))
            .drop("__r1")
        )
    order = Window.partitionBy(group_col).orderBy(h.asc(), F.col(id_col).asc())
    return (
        df.withColumn("__rank", F.row_number().over(order))
        .filter(F.col("__rank") <= F.lit(cap))
        .drop("__rank")
    )


def leakage_safe_split(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    id_a: str = "doc_a",
    id_b: str = "doc_b",
    splits: tuple[tuple[str, float], ...] = (
        ("train", 0.98),
        ("val", 0.01),
        ("test", 0.01),
    ),
    seed: int = 42,
) -> DataFrame:
    """Train/val/test assignment that keeps every near-duplicate
    cluster inside ONE split — hashing raw ids (``hash_split``) puts a
    document in train and its near-copy in test, and the eval set
    silently measures memorization instead of generalization.

    The split key is the duplicate-cluster id (min doc id of the
    connected component behind ``pairs``, operators/graph.py), falling
    back to the document's own id for singletons; ``hash_split``'s
    salted-hash bucketing then runs on that key, so cluster members
    share a bucket by construction.

    Scale shape: the cluster-assignment table only holds documents
    that appear in a pair (candidates ≪ corpus by LSH construction),
    so the corpus-side cost is one left join against that small table
    (AQE broadcasts it when it fits) on top of hash_split's pure
    projection. Deterministic end-to-end: pairs → components → hash
    are all reproducible, so re-runs and incremental batches agree.
    """
    from sql_based_etl_spark.operators.graph import dedup_cluster_assignments

    assign = dedup_cluster_assignments(pairs, id_a, id_b).select(
        F.col("doc_id").alias(id_col), "cluster_id"
    )
    keyed = df.join(assign, on=id_col, how="left").withColumn(
        "__split_key", F.coalesce(F.col("cluster_id"), F.col(id_col))
    )
    out = hash_split(keyed, id_col="__split_key", splits=splits, seed=seed)
    return out.drop("cluster_id").withColumnRenamed("__split_key", "split_key")


def top_fraction_per_group(
    df: DataFrame,
    group_col: str,
    fraction: float,
    order_col: str,
    id_col: str = "doc_id",
    descending: bool = True,
) -> DataFrame:
    """Adaptive per-group thresholding: keep the best
    ``ceil(fraction·n)`` rows of every group ranked by ``order_col``
    (id tiebreak) — "top 25% by quality score per language", the
    curation policy that replaces one global cutoff (which silently
    empties low-resource languages whose score distribution sits
    lower) with a per-group one.

    Same shape and caveats as ``stratified_sample`` (one shuffle on the
    group key, rank + group size from a single window pass), but ranked
    by a SCORE instead of a hash: deterministic given the score column,
    exact per-group proportions by construction.
    """
    direction = F.col(order_col).desc() if descending else F.col(order_col).asc()
    order = Window.partitionBy(group_col).orderBy(direction, F.col(id_col).asc())
    size = Window.partitionBy(group_col)
    return (
        df.withColumn("__rank", F.row_number().over(order))
        .withColumn("__n", F.count(F.lit(1)).over(size))
        .filter(F.col("__rank") <= F.ceil(F.lit(fraction) * F.col("__n")))
        .drop("__rank", "__n")
    )
