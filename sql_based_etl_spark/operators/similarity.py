"""Similarity search over an embedding column (``array<float>``).

- brute-force cosine top-k: the exactness baseline — query×corpus join
  with a JVM-side fold dot product, window top-k per query.
- random-hyperplane LSH ANN: the scale path — sign-bit signatures from
  deterministic (md5-derived) ±1 hyperplanes, bucket join on the
  signature, exact re-rank within buckets.
- embedding-cosine near-dup pairs: all pairs above a cosine threshold.

Determinism contract: dot products fold left-to-right over doubles
(``aggregate(sequence(...))``) so any engine reproducing the same fold
produces bit-identical scores — which is what the DuckDB oracles do.

Scale posture: brute force is O(|Q|·|C|·d) — fine for a query batch
against a broadcast corpus shard, wrong for corpus×corpus. The LSH
variant buckets the corpus (one shuffle on the signature) and only
re-ranks within buckets; recall is tunable via signature bits. For
corpus×corpus near-dup at 100 TB, block first (LSH buckets), never
cross join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sql_based_etl_spark.caching import pin

ANN_BITS = 4    # bits per hash table (2^bits buckets per table)
ANN_TABLES = 4  # hash tables; candidates = union of same-bucket sets
# Recall/selectivity: P(same bucket in one table) = (1 - θ/π)^bits for
# angle θ; L tables union to 1-(1-p)^L. Raise bits as corpus grows
# (keeps bucket size ~constant), raise tables to claw recall back.


def lsh_dup_params(threshold: float, target_recall: float = 0.98) -> tuple[int, int]:
    """(bits, tables) sized for ``target_recall`` candidate probability
    at cosine == threshold. Low thresholds mean wide angles where
    4-bit signatures collide too rarely — the 4×4 ANN default has only
    ~60% recall at cosine 0.5 — so below 0.8 drop to 2-bit signatures
    and solve L from 1-(1-p1)^L ≥ target."""
    import math

    bits = ANN_BITS if threshold >= 0.8 else 2
    p1 = (1.0 - math.acos(threshold) / math.pi) ** bits
    if p1 >= 1.0:
        return bits, 1
    tables = max(1, math.ceil(math.log(1.0 - target_recall) / math.log(1.0 - p1)))
    return bits, tables


def _dot_expr(a: str, b: str, dim: int) -> F.Column:
    """Deterministic left-to-right fold of sum(a[i]*b[i]) in doubles.

    Expanded to an explicit ``t0 + t1 + … + t{dim-1}`` sum: ``+`` is
    left-associative so the fold order is bit-identical to the oracle's
    ``list_reduce``, and unlike ``aggregate(sequence, lambda)`` (a
    CodegenFallback higher-order function that ran ~50× slower) every
    term stays inside whole-stage codegen."""
    terms = " + ".join(
        f"cast({a}[{i}] as double) * cast({b}[{i}] as double)" for i in range(dim)
    )
    return F.expr(terms)


def _norm_expr(a: str, dim: int) -> F.Column:
    return F.sqrt(_dot_expr(a, a, dim))


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Exact top-k cosine neighbors per query (excluding self).
    Output: (query_id, neighbor_id, score, rank)."""
    n_parts = queries.sparkSession.sparkContext.defaultParallelism
    queries = queries.repartition(n_parts)  # parallelize the BNLJ stream side
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        _norm_expr(vec_col, dim).alias("qn"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        _norm_expr(vec_col, dim).alias("cn"),
    )
    cos = _dot_expr("qv", "cv", dim) / (F.col("qn") * F.col("cn"))
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        q.crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cos.alias("score"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("score", 6).alias("score"), "rank")
    )


def hyperplane_signs(table: int, dim: int = 64, bits: int = ANN_BITS) -> list[list[float]]:
    """Deterministic ±1 hyperplanes for one hash table: parity of the
    first md5 byte of ``"{table}_{bit}_{i}"``, computed at
    plan-build time (they're constants — embedding them as literals
    keeps both engines and the oracle on the exact same planes with
    zero runtime hashing)."""
    import hashlib

    return [
        [
            1.0 if hashlib.md5(f"{table}_{b}_{i}".encode()).digest()[0] % 2 == 0 else -1.0
            for i in range(dim)
        ]
        for b in range(bits)
    ]


def ann_signature(vec_col: str, table: int, dim: int = 64, bits: int = ANN_BITS,
                  one_based: bool = False) -> F.Column | str:
    """LSH bucket id for one hash table: sign bits of dot(plane_b, v),
    packed to an int. With ``one_based=True`` returns the SQL string
    for engines with 1-based array indexing (DuckDB oracle)."""
    signs = hyperplane_signs(table, dim, bits)
    off = 1 if one_based else 0
    parts = []
    for b in range(bits):
        dot = " + ".join(
            f"({signs[b][i]}) * cast({vec_col}[{i + off}] as double)" for i in range(dim)
        )
        parts.append(f"(case when ({dot}) >= 0 then {1 << b} else 0 end)")
    sql = "(" + " + ".join(parts) + ")"
    if one_based:
        return sql
    return F.expr(sql).cast("int")


def ann_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    bits: int = ANN_BITS,
    tables: int = ANN_TABLES,
) -> DataFrame:
    """Approximate top-k: candidates share any of L hash-table buckets
    with the query (posexplode of the table signatures → one shuffle on
    (table, bucket)); exact cosine re-rank over the distinct candidate
    union."""
    def with_buckets(df: DataFrame, id_alias: str) -> DataFrame:
        sigs = F.array(*[ann_signature(vec_col, t, dim, bits) for t in range(tables)])
        return df.select(
            F.col(id_col).alias(id_alias),
            F.col(vec_col).alias(f"{id_alias}_v"),
            F.posexplode(sigs).alias("table", "bucket"),
        )

    q_b = with_buckets(queries, "query_id")
    c_b = with_buckets(corpus, "neighbor_id")
    cand = (
        q_b.join(c_b, ["table", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        _norm_expr(vec_col, dim).alias("qn"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        _norm_expr(vec_col, dim).alias("cn"),
    )
    cos = _dot_expr("qv", "cv", dim) / (F.col("qn") * F.col("cn"))
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        cand.join(q, "query_id")
        .join(c, "neighbor_id")
        .select("query_id", "neighbor_id", cos.alias("score"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("score", 6).alias("score"), "rank")
    )


def ann_topk_self(
    corpus: DataFrame,
    query_pred: F.Column,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    bits: int = ANN_BITS,
    tables: int = ANN_TABLES,
) -> DataFrame:
    """:func:`ann_topk` for the common case where the query set is a
    predicate over the corpus itself: signatures, norms, and the bucket
    table are computed ONCE over the corpus (half the signature compute
    and codegen of the two-DataFrame path), and the candidate join is a
    self-join on (table, bucket) with the query flag carried through."""
    sigs = corpus.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        _norm_expr(vec_col, dim).alias("nrm"),
        query_pred.alias("is_q"),
        *[ann_signature(vec_col, t, dim, bits).alias(f"s{t}") for t in range(tables)],
    ).transform(pin)

    stack_args = ", ".join(f"{t}, s{t}" for t in range(tables))
    buckets = sigs.select(
        "id", "is_q", F.expr(f"stack({tables}, {stack_args}) as (tbl, bucket)")
    )
    q_b = buckets.filter("is_q").select(F.col("id").alias("query_id"), "tbl", "bucket")
    c_b = buckets.select(F.col("id").alias("neighbor_id"), "tbl", "bucket")
    cand = (
        q_b.join(c_b, ["tbl", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    q = sigs.filter("is_q").select(
        F.col("id").alias("query_id"), F.col("v").alias("qv"), F.col("nrm").alias("qn")
    )
    c = sigs.select(
        F.col("id").alias("neighbor_id"), F.col("v").alias("cv"), F.col("nrm").alias("cn")
    )
    cos = _dot_expr("qv", "cv", dim) / (F.col("qn") * F.col("cn"))
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        cand.join(q, "query_id")
        .join(c, "neighbor_id")
        .select("query_id", "neighbor_id", cos.alias("score"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("score", 6).alias("score"), "rank")
    )


def cosine_dup_pairs_lsh(
    df: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    bits: int | None = None,
    tables: int | None = None,
) -> DataFrame:
    """LSH-blocked embedding near-dup pairs — the 100 TB path promised
    by :func:`cosine_dup_pairs`: instead of the O(n²) cross join, pairs
    are only generated inside shared (table, bucket) LSH blocks, then
    exact-cosine verified. Deterministic hyperplanes ⇒ the candidate
    set (and thus the result) is engine-reproducible. bits/tables
    default to :func:`lsh_dup_params` sized for ≥98% candidate recall
    at the requested threshold (tests/test_operators.py asserts recall
    against the exact variant)."""
    if bits is None or tables is None:
        d_bits, d_tables = lsh_dup_params(threshold)
        bits = bits if bits is not None else d_bits
        tables = tables if tables is not None else d_tables
    sigs = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        _norm_expr(vec_col, dim).alias("nrm"),
        *[ann_signature(vec_col, t, dim, bits).alias(f"s{t}") for t in range(tables)],
    ).transform(pin)
    stack_args = ", ".join(f"{t}, s{t}" for t in range(tables))
    buckets = sigs.select(
        "id", F.expr(f"stack({tables}, {stack_args}) as (tbl, bucket)")
    )
    b2 = buckets.select(F.col("id").alias("id_b"), "tbl", "bucket")
    cand = (
        buckets.join(b2, ["tbl", "bucket"])
        .filter(F.col("id") < F.col("id_b"))
        .select(F.col("id").alias("id_a"), F.col("id_b"))
        .distinct()
    )
    a = sigs.select(F.col("id").alias("id_a"), F.col("v").alias("va"), F.col("nrm").alias("na"))
    b = sigs.select(F.col("id").alias("id_b"), F.col("v").alias("vb"), F.col("nrm").alias("nb"))
    cos = _dot_expr("va", "vb", dim) / (F.col("na") * F.col("nb"))
    # persist barrier: keeps the 64-term cosine out of the re-rank
    # join's condition (double evaluation + codegen blowout — see
    # semantic_dedup_pairs); the cache is candidate pairs only
    scored = (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .select("id_a", "id_b", F.round(cos, 6).alias("cosine"))
        .transform(pin)
    )
    return scored.filter(F.col("cosine") >= threshold)


IVF_CELLS = 16   # coarse-quantizer cells (pivot vectors)
IVF_NPROBE = 2   # cells probed per query


def ivf_topk_self(
    corpus: DataFrame,
    query_pred: F.Column,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_cells: int = IVF_CELLS,
    nprobe: int = IVF_NPROBE,
    pivots: DataFrame | None = None,
    broadcast_probes: bool = True,
) -> DataFrame:
    """IVF-style approximate top-k: partition the corpus into cells
    around deterministic pivot vectors (the ``n_cells`` lowest-id
    corpus vectors — no training step, reproducible in any engine; or
    pass ``pivots`` = (pid, pv) rows from :func:`kmeans_lloyd` for
    trained, better-balanced cells), assign every vector to its
    max-cosine cell, probe the ``nprobe`` best cells per query, exact
    re-rank inside the probed cells.

    Scale shape: pivots broadcast (tiny); assignment is one scan ×
    ``n_cells`` codegen'd dot products + a map-side-combinable argmax
    aggregate (``max_by`` over (psim, -pid) — same result as a
    row_number window with the desc-sim/asc-pid tie-break, but the
    shuffle carries one combined row per vector instead of sorting
    corpus × n_cells scored rows per partition). Only the QUERY subset
    — queries ≪ corpus by construction — pays a row_number window,
    because top-``nprobe`` cells per query genuinely needs ranked
    rows, not an argmax. The candidate join shuffles on the cell id,
    so cell count is the parallelism/recall knob (raise cells with
    corpus size to keep cell cardinality ~constant, raise nprobe to
    claw recall back).

    ``broadcast_probes`` (default True) declares the probes side —
    queries × nprobe rows, each carrying a dim-length vector — as a
    broadcast hash relation. That is the right plan under this
    operator's contract (queries ≪ corpus); a caller whose
    ``query_pred`` selects a LARGE fraction of the corpus must pass
    False, or the broadcast materializes a corpus-scale hashed
    relation on the driver and every executor."""
    base = corpus.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        _norm_expr(vec_col, dim).alias("nrm"),
        query_pred.alias("is_q"),
    )
    if pivots is not None:
        piv = pivots.select("pid", "pv", _norm_expr("pv", dim).alias("pnrm"))
    else:
        piv = base.orderBy("id").limit(n_cells).select(
            F.col("id").alias("pid"), F.col("v").alias("pv"), F.col("nrm").alias("pnrm")
        )
    psim = _dot_expr("v", "pv", dim) / (F.col("nrm") * F.col("pnrm"))
    scored = base.join(F.broadcast(piv)).select(
        "id", "is_q", "v", "nrm", "pid", psim.alias("psim")
    )
    asg = (
        scored.groupBy("id")
        .agg(
            F.max_by(
                "pid", F.struct(F.col("psim"), (-F.col("pid")).alias("nb"))
            ).alias("pid"),
            # v/nrm are constant within the id group — first() is exact
            F.first("v").alias("cv"),
            F.first("nrm").alias("cn"),
        )
        .select(F.col("id").alias("neighbor_id"), "cv", "cn", "pid")
    )
    wcell = Window.partitionBy("id").orderBy(F.desc("psim"), F.asc("pid"))
    probes = (
        scored.filter(F.col("is_q"))
        .withColumn("prn", F.row_number().over(wcell))
        .filter(F.col("prn") <= nprobe)
        .select(
            F.col("id").alias("query_id"), F.col("v").alias("qv"),
            F.col("nrm").alias("qn"), "pid",
        )
    )
    cos = _dot_expr("qv", "cv", dim) / (F.col("qn") * F.col("cn"))
    wtop = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    # probes (queries × nprobe rows) is the tiny side by construction;
    # declare the broadcast instead of trusting size estimates — a
    # mis-estimate here builds a corpus-sized hashed relation. The
    # caller opts out (broadcast_probes=False) when query_pred is wide.
    probe_side = F.broadcast(probes) if broadcast_probes else probes
    return (
        probe_side.join(asg, "pid")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cos.alias("score"))
        .withColumn("rank", F.row_number().over(wtop))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("score", 6).alias("score"), "rank")
    )


def cosine_dup_pairs(
    df: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cosine ≥
    threshold). Exact all-pairs — the oracle-checkable baseline; at
    scale, swap the cross join for an LSH bucket join (ann_signature)."""
    # The broadcast-nested-loop join streams the left side; a 1-file
    # parquet scan would make that a single task, serializing the O(n²)
    # pair evaluation. Spreading the (tiny) left side across the
    # cluster costs one narrow shuffle and buys full parallelism.
    n_parts = df.sparkSession.sparkContext.defaultParallelism
    a = df.repartition(n_parts).select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("va"),
        _norm_expr(vec_col, dim).alias("na"),
    )
    b = df.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("vb"),
        _norm_expr(vec_col, dim).alias("nb"),
    )
    cos = _dot_expr("va", "vb", dim) / (F.col("na") * F.col("nb"))
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.round(cos, 6).alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


def kmeans_lloyd(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    k: int = IVF_CELLS,
    iters: int = 2,
) -> DataFrame:
    """Deterministic Lloyd iterations — the training step that upgrades
    the IVF coarse quantizer from "k lowest-id vectors" to actual
    cluster centroids (better-balanced cells ⇒ better recall per
    probe).

    Iterative-algorithm shape at 100 TB: the mutable state is only
    k×dim doubles, so the driver loop is legitimate — each iteration is
    one corpus scan (broadcast-centroid max-cosine assignment, the same
    rule ivf_topk_self uses at query time) plus one map-side-combinable
    (cell, dim) aggregate; nothing per-row ever reaches the driver.

    Exactness across engines: per-dimension means accumulate in int64
    micros and are re-quantized to integer micros after the division —
    rounding to a whole micro only ever hits half-boundaries on
    exactly-representable doubles (k + 0.5), where Spark's HALF_UP and
    DuckDB's away-from-zero agree (an unquantized mean rounded at the
    6th decimal does diverge: the .5 is then an approximation and the
    engines see different sides of it). Assignments break cosine ties
    on the lowest cell id, so every iteration — and therefore the
    final centroids — is bit-reproducible in the DuckDB oracle. Cells
    that lose all members drop out (k shrinks), identically on both
    sides.

    Returns ``(pid, pv)`` centroid rows; ``pid`` is the seeding
    vector's id.
    """
    base = corpus.select(
        F.col(id_col).alias("id"),
        F.expr(f"transform({vec_col}, x -> cast(x as double))").alias("v"),
    )
    # centroids carry their norm: computed once per centroid here
    # instead of once per (vector × centroid) joined row inside the
    # assignment cosine — same _norm_expr fold, bit-identical value
    cents = base.orderBy("id").limit(k).select(
        F.col("id").alias("pid"),
        F.col("v").alias("pv"),
        _norm_expr("v", dim).alias("pnrm"),
    )
    for _ in range(iters):
        cos = _dot_expr("v", "pv", dim) / (_norm_expr("v", dim) * F.col("pnrm"))
        # argmax cell via max_by over (sim, -pid): same result as a
        # row_number window (desc sim, asc pid tie-break) but map-side
        # combinable — the shuffle carries one combined row per vector
        # instead of all corpus×k scored rows needing a partition sort.
        # v is constant within the id group, so first(v) is exact.
        asg = (
            base.join(F.broadcast(cents))
            .select("id", "v", "pid", cos.alias("sim"))
            .groupBy("id")
            .agg(
                F.max_by(
                    "pid", F.struct(F.col("sim"), (-F.col("pid")).alias("nb"))
                ).alias("pid"),
                F.first("v").alias("v"),
            )
            .select("pid", "v")
        )
        means = (
            asg.select("pid", F.posexplode("v").alias("dim", "x"))
            .groupBy("pid", "dim")
            .agg(
                (
                    F.round(
                        F.sum(F.round(F.col("x") * F.lit(1_000_000.0)).cast("long"))
                        .cast("double")
                        / F.count(F.lit(1))
                    ).cast("long")
                    / F.lit(1_000_000.0)
                ).alias("m")
            )
        )
        # the tiny collect_list/transform lambda reassembling each
        # centroid array runs on k×dim rows — never the corpus — so
        # the CodegenFallback it carries is irrelevant. (A 64-column
        # mean aggregate that skips the explode was A/B-measured
        # SLOWER at bench SF: the 64-expression aggregate stage
        # compiles in seconds and buys nothing on the combine.)
        cents = means.groupBy("pid").agg(
            F.expr("transform(array_sort(collect_list(struct(dim, m))), s -> s.m)").alias("pv")
        ).select("pid", "pv", _norm_expr("pv", dim).alias("pnrm"))
        # truncate the per-iteration lineage: iteration i+1 (and every
        # downstream consumer — IVF probes broadcast the pivots in two
        # branches) would otherwise re-analyze/re-run the whole
        # training DAG; the checkpointed relation is k×dim doubles.
        # (r13 REJECTED: a collect + createDataFrame local-relation
        # handoff — same truncation, no checkpoint RDD — measured
        # SLOWER in both interleaved A/B pairs: ivf_trained 4.2-4.7 →
        # 4.7-6.7s, semantic_dedup 3.4-3.8 → 4.7-5.1s. The local
        # relation re-ships rows into every consuming broadcast build,
        # where the checkpointed RDD serves cached blocks.)
        cents = cents.localCheckpoint(eager=True)
    return cents.select("pid", "pv")


def hard_negative_topk(
    corpus: DataFrame,
    query_pred: F.Column,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    dim: int = 64,
    bits: int = ANN_BITS,
    tables: int = ANN_TABLES,
) -> DataFrame:
    """Hard-negative mining for contrastive training: for each query
    vector, the top-``k`` most-similar corpus vectors with a DIFFERENT
    label — the negatives that sit closest to the decision boundary,
    which is what embedding-model training pipelines actually sample
    (random negatives are too easy to carry gradient).

    Same LSH-bucket machinery as :func:`ann_topk_self` (signatures
    computed once, self-join on (table, bucket), exact cosine re-rank)
    with the label inequality applied at the CANDIDATE stage, so
    same-label neighbors never reach the re-rank join. Scale posture
    matches ann_topk_self: one shuffle on the bucket key, candidates
    ≪ corpus by blocking.

    Output: ``(query_id, neighbor_id, neighbor_label, score, rank)``.
    """
    sigs = corpus.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        F.col(label_col).alias("lbl"),
        _norm_expr(vec_col, dim).alias("nrm"),
        query_pred.alias("is_q"),
        *[ann_signature(vec_col, t, dim, bits).alias(f"s{t}") for t in range(tables)],
    ).transform(pin)

    stack_args = ", ".join(f"{t}, s{t}" for t in range(tables))
    buckets = sigs.select(
        "id", "lbl", "is_q", F.expr(f"stack({tables}, {stack_args}) as (tbl, bucket)")
    )
    q_b = buckets.filter("is_q").select(
        F.col("id").alias("query_id"), F.col("lbl").alias("q_lbl"), "tbl", "bucket"
    )
    c_b = buckets.select(
        F.col("id").alias("neighbor_id"), F.col("lbl").alias("n_lbl"), "tbl", "bucket"
    )
    cand = (
        q_b.join(c_b, ["tbl", "bucket"])
        .filter(F.col("q_lbl") != F.col("n_lbl"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    q = sigs.filter("is_q").select(
        F.col("id").alias("query_id"), F.col("v").alias("qv"), F.col("nrm").alias("qn")
    )
    c = sigs.select(
        F.col("id").alias("neighbor_id"), F.col("v").alias("cv"),
        F.col("nrm").alias("cn"), F.col("lbl").alias("neighbor_label"),
    )
    cos = _dot_expr("qv", "cv", dim) / (F.col("qn") * F.col("cn"))
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        cand.join(q, "query_id")
        .join(c, "neighbor_id")
        .select("query_id", "neighbor_id", "neighbor_label", cos.alias("score"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id", "neighbor_label",
            F.round("score", 6).alias("score"), "rank",
        )
    )


def semantic_dedup_pairs(
    corpus: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_cells: int = IVF_CELLS,
    pivots: DataFrame | None = None,
) -> DataFrame:
    """SemDeDup-style semantic near-dup pairs (Abbas et al. 2023,
    "SemDeDup: Data-efficient learning at web-scale through semantic
    deduplication"): cluster the embedding space into cells around
    pivot vectors, then emit only WITHIN-CELL pairs with cosine ≥
    ``threshold``. Cross-cell duplicates are missed *by design* — that
    is the published algorithm's recall/cost tradeoff, complementary to
    the hyperplane blocking of :func:`cosine_dup_pairs_lsh` (which
    trades tables for recall instead).

    Cell assignment is the IVF rule (max-cosine pivot, lowest-pid tie
    break) so a corpus already IVF-indexed for search reuses the exact
    same partitioning for dedup. Pass ``pivots`` from
    :func:`kmeans_lloyd` for trained cells; default seeds are the
    ``n_cells`` lowest-id vectors (deterministic, engine-reproducible).

    Scale shape at 100 TB: pivots broadcast (k×dim doubles); assignment
    is one scan with a map-side-combinable argmax (identical to
    ivf_topk_self); the pair join shuffles once on the cell id and the
    O(Σ|cell|²) pair work is bounded by scaling ``n_cells`` with the
    corpus so cell cardinality stays ~constant — exactly the knob
    SemDeDup's k plays in the paper. Nothing is collected; the output
    is ``(cell, id_a, id_b, cosine)``.
    """
    base = corpus.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        _norm_expr(vec_col, dim).alias("nrm"),
    )
    if pivots is not None:
        piv = pivots.select("pid", "pv", _norm_expr("pv", dim).alias("pnrm"))
    else:
        piv = base.orderBy("id").limit(n_cells).select(
            F.col("id").alias("pid"), F.col("v").alias("pv"), F.col("nrm").alias("pnrm")
        )
    psim = _dot_expr("v", "pv", dim) / (F.col("nrm") * F.col("pnrm"))
    asg = (
        base.join(F.broadcast(piv))
        .select("id", "v", "nrm", "pid", psim.alias("psim"))
        .groupBy("id")
        .agg(
            F.max_by(
                "pid", F.struct(F.col("psim"), (-F.col("pid")).alias("nb"))
            ).alias("cell"),
            # v/nrm constant within the id group — first() is exact
            F.first("v").alias("v"),
            F.first("nrm").alias("nrm"),
        )
        # consumed TWICE (both sides of the within-cell pair join) in
        # separate subtrees — without a persist the whole assignment
        # DAG (pivot join + argmax shuffle) runs once per side
        # (measured ~1s at bench SF; ReuseExchange is plan-shape-
        # dependent, the minhash_lsh_pairs lesson). The cache is the
        # assigned corpus — the SemDeDup working set itself.
        .transform(pin)
    )
    a = asg.select(
        "cell", F.col("id").alias("id_a"), F.col("v").alias("va"), F.col("nrm").alias("na")
    )
    b = asg.select(
        "cell", F.col("id").alias("id_b"), F.col("v").alias("vb"), F.col("nrm").alias("nb")
    )
    cos = _dot_expr("va", "vb", dim) / (F.col("na") * F.col("nb"))
    # persist BARRIER between scoring and thresholding: a bare
    # filter(cosine >= t) is pushed into the pair join's condition,
    # which (a) evaluates the 64-term cosine TWICE per candidate pair
    # (condition + projection) and (b) bloats the join stage past the
    # 64 KB codegen method limit, degrading it to interpreted row
    # evaluation — measured 2.9s vs 1.0s at bench SF. The cached
    # relation stores cosine as a column, so the threshold reads data.
    scored = (
        a.join(b, "cell")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("cell", "id_a", "id_b", F.round(cos, 6).alias("cosine"))
        .transform(pin)
    )
    return scored.filter(F.col("cosine") >= threshold)


def quantize_int8(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Symmetric per-vector int8 scalar quantization: ``scale =
    max|x| / 127``, ``q_i = round(x_i / scale)`` ∈ [-127, 127] — 4×
    smaller than float32 at ~1% cosine error, the standard first rung
    of embedding-storage compression (below it: PQ/OPQ).

    This is a WRITE-SIDE operator (quantize once, query many): the
    per-element map needs a ``transform`` lambda, which is
    CodegenFallback — that cost is amortized into the corpus rewrite
    and never appears on the query path (queries dequantize via
    ``q * scale`` inside plain projections). The scale itself avoids
    lambdas: ``greatest(array_max(v), -array_min(v))`` needs no
    per-element function. Zero vectors get scale 0 and all-zero codes.

    Returns ``(id, scale, qv array<tinyint>)``.
    """
    v = F.expr(f"transform({vec_col}, x -> cast(x as double))")
    scale = F.greatest(F.array_max("__v"), -F.array_min("__v")) / F.lit(127.0)
    qv = F.expr(
        "CASE WHEN scale = 0.0 THEN transform(__v, x -> cast(0 as tinyint)) "
        "ELSE transform(__v, x -> cast(round(x / scale) as tinyint)) END"
    )
    return (
        df.select(F.col(id_col).alias("id"), v.alias("__v"))
        .withColumn("scale", scale)
        .select("id", "scale", qv.alias("qv"))
    )


def label_outliers(
    corpus: DataFrame,
    k: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    dim: int = 64,
) -> DataFrame:
    """Label-noise detection: for every label, the ``k`` member vectors
    LEAST similar to their own label's centroid — the rows a curation
    pass sends to re-annotation (mislabeled or out-of-distribution
    examples poison a contrastive/classifier training set far beyond
    their count).

    Scale shape: centroids come from the same map-side-combinable
    int64-micros (label, dim) mean the k-means trainer uses (exact and
    engine-reproducible), get reassembled into |labels| tiny arrays,
    and are broadcast back onto the corpus — one scan, one ≤ |labels|
    × dim aggregate, and a per-label bottom-k window over the corpus
    rows. Cosines are the deterministic left-fold ``_dot_expr``, so the
    scores (and the rank cutoff) replay bit-identically elsewhere.

    Returns ``(label, vec_id, centroid_cos, rank)`` with rank 1 = the
    worst-fitting member (lowest cosine, id tiebreak).
    """
    from pyspark.sql import Window

    base = corpus.select(
        F.col(label_col).alias("label"),
        F.col(id_col).alias("id"),
        F.expr(f"transform({vec_col}, x -> cast(x as double))").alias("v"),
    )
    means = (
        base.select("label", F.posexplode("v").alias("dim", "x"))
        .groupBy("label", "dim")
        .agg(
            (
                F.round(
                    F.sum(F.round(F.col("x") * F.lit(1_000_000.0)).cast("long"))
                    .cast("double")
                    / F.count(F.lit(1))
                ).cast("long")
                / F.lit(1_000_000.0)
            ).alias("m")
        )
    )
    cents = means.groupBy("label").agg(
        F.expr("transform(array_sort(collect_list(struct(dim, m))), s -> s.m)").alias(
            "cv"
        )
    )
    cos = _dot_expr("v", "cv", dim) / (_norm_expr("v", dim) * _norm_expr("cv", dim))
    scored = base.join(F.broadcast(cents), "label").select(
        "label", "id", F.round(cos, 6).alias("centroid_cos")
    )
    w = Window.partitionBy("label").orderBy(
        F.col("centroid_cos").asc(), F.col("id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("label", F.col("id").alias(id_col), "centroid_cos", "rank")
    )


def embedding_covariance(
    corpus: DataFrame,
    vec_col: str = "embedding",
    dim: int = 64,
    scale: int = 1000,
) -> DataFrame:
    """Upper-triangle covariance of the embedding columns as rows
    ``(i, j, n, s_i, s_j, s_ij, cov)`` — the training statistic behind
    PCA/whitening, accumulated EXACTLY: coordinates quantize to integer
    millis (``round(x·scale)``), so the cross-product sums are int64
    arithmetic any engine reproduces bit-for-bit, and the only doubles
    are the final centering/division (a fixed expression over exact
    ints).

    Scale shape: ONE ``agg()`` with dim·(dim+1)/2 + dim + 1 map-side-
    combinable integer sums — the corpus never shuffles; per-partition
    state is that many longs (≈ 17 KB at dim 64), and the single
    combined row unpivots driver-side via a constant ``stack()``.
    Overflow headroom: |x|·scale ≤ 10⁴ ⇒ each product ≤ 10⁸, so int64
    holds ~9·10¹⁰ rows per (i,j) cell; beyond that, shrink ``scale``.
    """
    v = F.col(vec_col)

    def xq(i: int) -> F.Column:
        return F.expr(
            f"cast(round(cast({vec_col}[{i}] as double) * {scale}.0) as bigint)"
        )

    aggs = [F.count(F.lit(1)).alias("n")]
    aggs += [F.sum(xq(i)).alias(f"s_{i}") for i in range(dim)]
    pairs = [(i, j) for i in range(dim) for j in range(i, dim)]
    aggs += [F.sum(xq(i) * xq(j)).alias(f"p_{i}_{j}") for i, j in pairs]
    wide = corpus.agg(*aggs)
    stack_args = ", ".join(
        f"{i}, {j}, s_{i}, s_{j}, p_{i}_{j}" for i, j in pairs
    )
    long = wide.select(
        "n",
        F.expr(
            f"stack({len(pairs)}, {stack_args}) as (i, j, s_i, s_j, s_ij)"
        ),
    )
    nd = F.col("n").cast("double")
    cov = (
        (
            F.col("s_ij").cast("double")
            - F.col("s_i").cast("double") * F.col("s_j").cast("double") / nd
        )
        / nd
        / F.lit(float(scale * scale))
    )
    return long.select(
        "i", "j", "n", "s_i", "s_j", "s_ij", F.round(cov, 9).alias("cov")
    )


def pca_train(
    corpus: DataFrame,
    vec_col: str = "embedding",
    dim: int = 64,
    k: int = 8,
    scale: int = 1000,
) -> DataFrame:
    """Top-``k`` principal components of the embedding column as
    ``(pc, explained_var, pv)`` rows (pc 0 = largest eigenvalue).

    The distributed part is :func:`embedding_covariance` (one exact
    combinable aggregate); the eigendecomposition runs driver-side on
    the collected dim×dim matrix — metadata-sized, the same legitimacy
    argument as k-means centroids. Sign convention: each component's
    largest-|loading| coordinate is made positive, so results are
    deterministic up to the eigensolver's floating point."""
    import numpy as np

    rows = embedding_covariance(corpus, vec_col, dim, scale).collect()
    c = np.zeros((dim, dim))
    for r in rows:
        c[r.i, r.j] = c[r.j, r.i] = r.cov
    vals, vecs = np.linalg.eigh(c)
    order = np.argsort(vals)[::-1][:k]
    out = []
    for rank, idx in enumerate(order):
        v = vecs[:, idx]
        pivot = int(np.argmax(np.abs(v)))
        if v[pivot] < 0:
            v = -v
        out.append((rank, float(vals[idx]), [float(x) for x in v]))
    return corpus.sparkSession.createDataFrame(
        out, "pc int, explained_var double, pv array<double>"
    )


def pca_project(
    corpus: DataFrame,
    components: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Project every vector onto the trained components:
    ``(id, pc, score)`` rows via a broadcast join (components are k×dim
    doubles) + the deterministic left-fold dot product — one corpus
    scan, no shuffle beyond the output's own layout. Downstream ANN on
    the k-dim projection pays k/dim of the full dot-product cost."""
    base = corpus.select(
        F.col(id_col).alias("id"),
        F.expr(f"transform({vec_col}, x -> cast(x as double))").alias("v"),
    )
    return base.join(F.broadcast(components.select("pc", "pv"))).select(
        "id", "pc", F.round(_dot_expr("v", "pv", dim), 6).alias("score")
    )
