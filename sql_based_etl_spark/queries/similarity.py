"""Similarity-search operators as oracle-checked queries over
``embeddings``. Query set: ``vec_id % 50 == 0``.

The DuckDB oracles rebuild the same left-to-right double folds and the
same literal hyperplanes, so scores (and therefore rankings and bucket
assignments) match bit-for-bit. DuckDB lists are 1-based — oracles
index ``embedding[i]`` over ``generate_series(1, dim)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sql_based_etl_spark.operators.similarity import (
    ANN_BITS,
    ANN_TABLES,
    IVF_CELLS,
    IVF_NPROBE,
    ann_signature,
    ann_topk,
    ann_topk_self,
    cosine_dup_pairs,
    cosine_dup_pairs_lsh,
    cosine_topk,
    ivf_topk_self,
    lsh_dup_params,
)
from sql_based_etl_spark.queries._util import load

DIM = 64
# Near-dup threshold: the synthetic embeddings are near-orthogonal
# random vectors (max pairwise cosine ≈ 0.51 at sf0.01), so 0.5 keeps
# the near-dup queries non-trivially populated; real embedding spaces
# would use 0.9+.
DUP_THRESHOLD = 0.5


def _queries_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "embeddings").filter(F.col("vec_id") % 50 == 0)


def sim_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    return cosine_topk(_queries_df(spark, sf_dir), emb, k=5, dim=DIM)


def sim_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    return ann_topk_self(emb, F.col("vec_id") % 50 == 0, k=5, dim=DIM)


def sim_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    # wide=True: the pivot-assignment argmax evaluates 16 64-term dot
    # products per vector in the scan stage (guide §2.5; r13 A/B)
    emb = load(spark, sf_dir, "embeddings", wide=True)
    return ivf_topk_self(emb, F.col("vec_id") % 50 == 0, k=5, dim=DIM)


def sim_cosine_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cosine_dup_pairs(load(spark, sf_dir, "embeddings"), threshold=DUP_THRESHOLD, dim=DIM)


def sim_cosine_dup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cosine_dup_pairs_lsh(load(spark, sf_dir, "embeddings"), threshold=DUP_THRESHOLD, dim=DIM)


def sim_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid of the embedding column — the training step
    of IVF/k-means expressed as a shuffle-light DataFrame aggregate:
    posexplode to (label, dim, x) and mean per (label, dim) with
    map-side partial aggregation (|labels|×64 groups). Exact across
    engines: sums accumulate in int64 micros, one double division at
    the end (queries/_util.py conventions)."""
    from sql_based_etl_spark.queries._util import micros

    e = load(spark, sf_dir, "embeddings")
    ex = e.select("label", F.posexplode("embedding").alias("dim", "x"))
    return ex.groupBy("label", "dim").agg(
        F.round(
            F.sum(micros(F.col("x"))) / F.count(F.lit(1)) / F.lit(1_000_000.0), 6
        ).alias("centroid")
    )


QUERIES = {
    "sim_topk_bruteforce": sim_topk_bruteforce,
    "sim_ann_lsh": sim_ann_lsh,
    "sim_ann_ivf": sim_ann_ivf,
    "sim_cosine_dup": sim_cosine_dup,
    "sim_cosine_dup_lsh": sim_cosine_dup_lsh,
    "sim_label_centroids": sim_label_centroids,
}

# --- oracle SQL -------------------------------------------------------------

_DOT = (
    "list_reduce(list_transform(generate_series(1, 64),"
    " i -> cast({a}[i] as double) * cast({b}[i] as double)), (x, y) -> x + y)"
)


def _cos(a: str, b: str) -> str:
    dot = _DOT.format(a=a, b=b)
    na = f"sqrt({_DOT.format(a=a, b=a)})"
    nb = f"sqrt({_DOT.format(a=b, b=b)})"
    return f"({dot}) / (({na}) * ({nb}))"


_TOPK_BODY = f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id % 50 = 0),
         c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
         scored AS (
             SELECT query_id, neighbor_id, {_cos("qv", "cv")} AS score
             FROM q, c WHERE query_id <> neighbor_id
         ),
         ranked AS (
             SELECT query_id, neighbor_id, score,
                    row_number() OVER (PARTITION BY query_id
                                       ORDER BY score DESC, neighbor_id ASC) AS rank
             FROM scored
         )
    SELECT query_id, neighbor_id, round(score, 6) AS score, rank
    FROM ranked WHERE rank <= 5
"""

_SIG_COLS = ", ".join(
    f"{ann_signature('embedding', t, DIM, ANN_BITS, one_based=True)} AS s{t}"
    for t in range(ANN_TABLES)
)
_BUCKETS_UNION = " UNION ALL ".join(
    f"SELECT vec_id, {t} AS tbl, s{t} AS bucket FROM e" for t in range(ANN_TABLES)
)

# the near-dup LSH uses threshold-derived (bits, tables) — mirror them
_DUP_BITS, _DUP_TABLES = lsh_dup_params(DUP_THRESHOLD)
_DUP_SIG_COLS = ", ".join(
    f"{ann_signature('embedding', t, DIM, _DUP_BITS, one_based=True)} AS s{t}"
    for t in range(_DUP_TABLES)
)
_DUP_BUCKETS_UNION = " UNION ALL ".join(
    f"SELECT vec_id, {t} AS tbl, s{t} AS bucket FROM e" for t in range(_DUP_TABLES)
)

_ANN_BODY = f"""
    WITH e AS (SELECT vec_id, embedding, {_SIG_COLS} FROM embeddings),
         b AS ({_BUCKETS_UNION}),
         cand AS (
             SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
             FROM b q JOIN b c ON q.tbl = c.tbl AND q.bucket = c.bucket
             WHERE q.vec_id % 50 = 0 AND q.vec_id <> c.vec_id
         ),
         scored AS (
             SELECT cand.query_id, cand.neighbor_id,
                    {_cos("qe.embedding", "ce.embedding")} AS score
             FROM cand
             JOIN embeddings qe ON qe.vec_id = cand.query_id
             JOIN embeddings ce ON ce.vec_id = cand.neighbor_id
         ),
         ranked AS (
             SELECT query_id, neighbor_id, score,
                    row_number() OVER (PARTITION BY query_id
                                       ORDER BY score DESC, neighbor_id ASC) AS rank
             FROM scored
         )
    SELECT query_id, neighbor_id, round(score, 6) AS score, rank
    FROM ranked WHERE rank <= 5
"""

_IVF_BODY = f"""
    WITH base AS (
        SELECT vec_id AS id, embedding AS v,
               sqrt({_DOT.format(a="embedding", b="embedding")}) AS nrm,
               (vec_id % 50 = 0) AS is_q
        FROM embeddings
    ),
    piv AS (
        SELECT id AS pid, v AS pv, nrm AS pnrm
        FROM base ORDER BY id LIMIT {IVF_CELLS}
    ),
    ranked AS (
        SELECT b.id, b.is_q, b.v, b.nrm, p.pid,
               row_number() OVER (
                   PARTITION BY b.id
                   ORDER BY ({_DOT.format(a="b.v", b="p.pv")}) / (b.nrm * p.pnrm) DESC,
                            p.pid ASC) AS prn
        FROM base b CROSS JOIN piv p
    ),
    asg AS (
        SELECT id AS neighbor_id, v AS cv, nrm AS cn, pid
        FROM ranked WHERE prn = 1
    ),
    probes AS (
        SELECT id AS query_id, v AS qv, nrm AS qn, pid
        FROM ranked WHERE is_q AND prn <= {IVF_NPROBE}
    ),
    scored AS (
        SELECT p.query_id, a.neighbor_id,
               ({_DOT.format(a="p.qv", b="a.cv")}) / (p.qn * a.cn) AS score
        FROM probes p JOIN asg a USING (pid)
        WHERE p.query_id <> a.neighbor_id
    ),
    topk AS (
        SELECT query_id, neighbor_id, score,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY score DESC, neighbor_id ASC) AS rank
        FROM scored
    )
    SELECT query_id, neighbor_id, round(score, 6) AS score, rank
    FROM topk WHERE rank <= 5
"""

ORACLES = {
    "sim_topk_bruteforce": _TOPK_BODY,
    "sim_ann_lsh": _ANN_BODY,
    "sim_ann_ivf": _IVF_BODY,
    "sim_cosine_dup": f"""
        SELECT id_a, id_b, cosine FROM (
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   round({_cos("a.embedding", "b.embedding")}, 6) AS cosine
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        ) WHERE cosine >= {DUP_THRESHOLD}
    """,
    "sim_cosine_dup_lsh": f"""
        WITH e AS (SELECT vec_id, embedding, {_DUP_SIG_COLS} FROM embeddings),
             b AS ({_DUP_BUCKETS_UNION}),
             cand AS (
                 SELECT DISTINCT p.vec_id AS id_a, q.vec_id AS id_b
                 FROM b p JOIN b q ON p.tbl = q.tbl AND p.bucket = q.bucket
                 WHERE p.vec_id < q.vec_id
             )
        SELECT id_a, id_b, cosine FROM (
            SELECT cand.id_a, cand.id_b,
                   round({_cos("ea.embedding", "eb.embedding")}, 6) AS cosine
            FROM cand
            JOIN embeddings ea ON ea.vec_id = cand.id_a
            JOIN embeddings eb ON eb.vec_id = cand.id_b
        ) WHERE cosine >= {DUP_THRESHOLD}
    """,
}

# posexplode is 0-based; DuckDB lists are 1-based — index with i, emit
# i-1. The i <= len() guard makes the per-(label,dim) divisor count
# only embeddings that actually have that dimension, mirroring
# posexplode exactly even on ragged arrays.
ORACLES["sim_label_centroids"] = f"""
    SELECT label, CAST(i - 1 AS INT) AS dim,
           round(sum(CAST(round(CAST(embedding[i] AS DOUBLE) * 1000000.0) AS BIGINT))
                 / count(*) / 1000000.0, 6) AS centroid
    FROM embeddings, (SELECT unnest(generate_series(1, {DIM})) AS i)
    WHERE i <= len(embedding)
    GROUP BY label, i
"""


def sim_kmeans_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two deterministic Lloyd iterations over the embeddings table
    (operators/similarity.py:kmeans_lloyd), output as flat
    (pid, dim, centroid) rows rounded to 6 decimals."""
    from sql_based_etl_spark.operators.similarity import kmeans_lloyd

    cents = kmeans_lloyd(load(spark, sf_dir, "embeddings"), k=16, iters=2)
    return cents.select(
        "pid", F.posexplode("pv").alias("dim", "centroid")
    ).select("pid", "dim", F.round("centroid", 6).alias("centroid"))


QUERIES["sim_kmeans_cells"] = sim_kmeans_cells

# Replicates both Lloyd iterations exactly: same double-cast vectors,
# the same left-fold cosine, lowest-pid tie-break, int64-micros means.
# Spark's posexplode emits 0-based dims; DuckDB lists are 1-based, so
# dims are generated 0..63 and indexed at +1.
_KM_ASSIGN = """
    SELECT pid, v FROM (
        SELECT b.id, b.v, c.pid,
               row_number() OVER (PARTITION BY b.id
                                  ORDER BY {cos} DESC, c.pid ASC) AS rn
        FROM base b CROSS JOIN {cents} c
    ) WHERE rn = 1
"""

_KM_MEANS = """
    SELECT pid, d.dim,
           CAST(round(CAST(sum(CAST(round(v[d.dim + 1] * 1000000.0) AS BIGINT)) AS DOUBLE)
                      / count(*)) AS BIGINT) / 1000000.0 AS m
    FROM {asg}, (SELECT unnest(generate_series(0, 63)) AS dim) d
    GROUP BY pid, d.dim
"""

ORACLES["sim_kmeans_cells"] = f"""
    WITH base AS (
        SELECT vec_id AS id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
    ),
    c0 AS (SELECT id AS pid, v AS pv FROM base ORDER BY id LIMIT 16),
    a1 AS ({_KM_ASSIGN.format(cos=_cos("b.v", "c.pv"), cents="c0")}),
    m1 AS ({_KM_MEANS.format(asg="a1")}),
    c1 AS (SELECT pid, list(m ORDER BY dim) AS pv FROM m1 GROUP BY pid),
    a2 AS ({_KM_ASSIGN.format(cos=_cos("b.v", "c.pv"), cents="c1")}),
    m2 AS ({_KM_MEANS.format(asg="a2")})
    SELECT pid, dim, round(m, 6) AS centroid FROM m2
"""


def sim_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector int8 scalar quantization of the embeddings table
    (operators/similarity.py:quantize_int8), flattened to
    (vec_id, dim, q, scale) rows. ``scale`` is the raw double — it is
    computed by the identical expression in both engines, so full
    precision matches without rounding."""
    from sql_based_etl_spark.operators.similarity import quantize_int8

    qt = quantize_int8(load(spark, sf_dir, "embeddings"))
    return qt.select(
        F.col("id").alias("vec_id"), "scale", F.posexplode("qv").alias("dim", "q")
    ).select("vec_id", "dim", "q", "scale")


QUERIES["sim_quantize_int8"] = sim_quantize_int8

ORACLES["sim_quantize_int8"] = """
    WITH v AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
    ),
    s AS (
        SELECT vec_id, v,
               greatest(list_max(v), -list_min(v)) / 127.0 AS scale
        FROM v
    )
    SELECT vec_id, d.dim,
           CASE WHEN scale = 0.0 THEN CAST(0 AS TINYINT)
                ELSE CAST(round(v[d.dim + 1] / scale) AS TINYINT) END AS q,
           scale
    FROM s, (SELECT unnest(generate_series(0, 63)) AS dim) d
"""


def sim_ann_ivf_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN with the k-means-trained coarse quantizer: kmeans_lloyd
    pivots (2 iterations) feeding ivf_topk_self — the trained variant
    of sim_ann_ivf, oracle-checked end-to-end (training + assignment +
    probe + re-rank reproduce bit-for-bit in DuckDB)."""
    from sql_based_etl_spark.operators.similarity import kmeans_lloyd

    # wide=True: two Lloyd assignment passes + the IVF argmax are all
    # scan-stage 64-dim dot-product compute (guide §2.5; r13 A/B)
    emb = load(spark, sf_dir, "embeddings", wide=True)
    piv = kmeans_lloyd(emb, k=IVF_CELLS, iters=2)
    return ivf_topk_self(
        emb, F.col("vec_id") % 50 == 0, k=5, dim=DIM, pivots=piv
    )


QUERIES["sim_ann_ivf_trained"] = sim_ann_ivf_trained

def sim_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic near-dup pairs: k-means-trained cells
    (2 Lloyd iterations, the same quantizer sim_ann_ivf_trained uses)
    → within-cell exact-cosine pairs ≥ threshold
    (operators/similarity.py:semantic_dedup_pairs). The oracle replays
    training, assignment and pairing bit-for-bit."""
    from sql_based_etl_spark.operators.similarity import (
        kmeans_lloyd,
        semantic_dedup_pairs,
    )

    # wide=True: Lloyd + cell assignment are scan-stage dot products
    # (guide §2.5; r13 A/B)
    emb = load(spark, sf_dir, "embeddings", wide=True)
    piv = kmeans_lloyd(emb, k=IVF_CELLS, iters=2)
    return semantic_dedup_pairs(
        emb, threshold=SEMANTIC_DUP_THRESHOLD, dim=DIM, pivots=piv
    )


QUERIES["sim_semantic_dedup"] = sim_semantic_dedup

# Within-cell cosines skew high (cells group similar vectors), so a
# lower threshold than the global near-dup one keeps the result
# populated on the near-orthogonal synthetic embeddings.
SEMANTIC_DUP_THRESHOLD = 0.3

_KM_ASSIGN_KB = """
    SELECT pid, v FROM (
        SELECT b.id, b.v, c.pid,
               row_number() OVER (PARTITION BY b.id
                                  ORDER BY {cos} DESC, c.pid ASC) AS rn
        FROM kb b CROSS JOIN {cents} c
    ) WHERE rn = 1
"""

ORACLES["sim_ann_ivf_trained"] = f"""
    WITH kb AS (
        SELECT vec_id AS id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
    ),
    c0 AS (SELECT id AS pid, v AS pv FROM kb ORDER BY id LIMIT {IVF_CELLS}),
    a1 AS ({_KM_ASSIGN_KB.format(cos=_cos("b.v", "c.pv"), cents="c0")}),
    m1 AS ({_KM_MEANS.format(asg="a1")}),
    c1 AS (SELECT pid, list(m ORDER BY dim) AS pv FROM m1 GROUP BY pid),
    a2 AS ({_KM_ASSIGN_KB.format(cos=_cos("b.v", "c.pv"), cents="c1")}),
    m2 AS ({_KM_MEANS.format(asg="a2")}),
    c2 AS (SELECT pid, list(m ORDER BY dim) AS pv FROM m2 GROUP BY pid),
    base AS (
        SELECT vec_id AS id, embedding AS v,
               sqrt({_DOT.format(a="embedding", b="embedding")}) AS nrm,
               (vec_id % 50 = 0) AS is_q
        FROM embeddings
    ),
    piv AS (
        SELECT pid, pv, sqrt({_DOT.format(a="pv", b="pv")}) AS pnrm FROM c2
    ),
    ranked AS (
        SELECT b.id, b.is_q, b.v, b.nrm, p.pid,
               row_number() OVER (
                   PARTITION BY b.id
                   ORDER BY ({_DOT.format(a="b.v", b="p.pv")}) / (b.nrm * p.pnrm) DESC,
                            p.pid ASC) AS prn
        FROM base b CROSS JOIN piv p
    ),
    asg AS (
        SELECT id AS neighbor_id, v AS cv, nrm AS cn, pid
        FROM ranked WHERE prn = 1
    ),
    probes AS (
        SELECT id AS query_id, v AS qv, nrm AS qn, pid
        FROM ranked WHERE is_q AND prn <= {IVF_NPROBE}
    ),
    scored AS (
        SELECT p.query_id, a.neighbor_id,
               ({_DOT.format(a="p.qv", b="a.cv")}) / (p.qn * a.cn) AS score
        FROM probes p JOIN asg a USING (pid)
        WHERE p.query_id <> a.neighbor_id
    ),
    topk AS (
        SELECT query_id, neighbor_id, score,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY score DESC, neighbor_id ASC) AS rank
        FROM scored
    )
    SELECT query_id, neighbor_id, round(score, 6) AS score, rank
    FROM topk WHERE rank <= 5
"""


# Replays kmeans training (c0..c2, shared CTE templates), IVF-rule cell
# assignment (max cosine, lowest-pid tie-break), then within-cell
# pairing — all on the same left-fold double arithmetic as Spark.
ORACLES["sim_semantic_dedup"] = f"""
    WITH kb AS (
        SELECT vec_id AS id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
    ),
    c0 AS (SELECT id AS pid, v AS pv FROM kb ORDER BY id LIMIT {IVF_CELLS}),
    a1 AS ({_KM_ASSIGN_KB.format(cos=_cos("b.v", "c.pv"), cents="c0")}),
    m1 AS ({_KM_MEANS.format(asg="a1")}),
    c1 AS (SELECT pid, list(m ORDER BY dim) AS pv FROM m1 GROUP BY pid),
    a2 AS ({_KM_ASSIGN_KB.format(cos=_cos("b.v", "c.pv"), cents="c1")}),
    m2 AS ({_KM_MEANS.format(asg="a2")}),
    c2 AS (SELECT pid, list(m ORDER BY dim) AS pv FROM m2 GROUP BY pid),
    base AS (
        SELECT vec_id AS id, embedding AS v,
               sqrt({_DOT.format(a="embedding", b="embedding")}) AS nrm
        FROM embeddings
    ),
    piv AS (
        SELECT pid, pv, sqrt({_DOT.format(a="pv", b="pv")}) AS pnrm FROM c2
    ),
    ranked AS (
        SELECT b.id, b.v, b.nrm, p.pid,
               row_number() OVER (
                   PARTITION BY b.id
                   ORDER BY ({_DOT.format(a="b.v", b="p.pv")}) / (b.nrm * p.pnrm) DESC,
                            p.pid ASC) AS prn
        FROM base b CROSS JOIN piv p
    ),
    asg AS (SELECT id, v, nrm, pid AS cell FROM ranked WHERE prn = 1)
    SELECT cell, id_a, id_b, cosine FROM (
        SELECT a.cell, a.id AS id_a, b.id AS id_b,
               round(({_DOT.format(a="a.v", b="b.v")}) / (a.nrm * b.nrm), 6) AS cosine
        FROM asg a JOIN asg b ON a.cell = b.cell AND a.id < b.id
    ) WHERE cosine >= {SEMANTIC_DUP_THRESHOLD}
"""


def sim_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining (operators/similarity.py:hard_negative_topk):
    per query (vec_id % 50 == 0), the 5 most-cosine-similar vectors
    with a DIFFERENT label, candidates blocked by the shared LSH
    buckets. The oracle replays buckets, label filter, and re-rank."""
    from sql_based_etl_spark.operators.similarity import hard_negative_topk

    emb = load(spark, sf_dir, "embeddings")
    return hard_negative_topk(emb, F.col("vec_id") % 50 == 0, k=5, dim=DIM)


QUERIES["sim_hard_negatives"] = sim_hard_negatives

ORACLES["sim_hard_negatives"] = f"""
    WITH e AS (SELECT vec_id, label, embedding, {_SIG_COLS} FROM embeddings),
         b AS ({" UNION ALL ".join(f"SELECT vec_id, label, {t} AS tbl, s{t} AS bucket FROM e" for t in range(ANN_TABLES))}),
         cand AS (
             SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
             FROM b q JOIN b c ON q.tbl = c.tbl AND q.bucket = c.bucket
             WHERE q.vec_id % 50 = 0 AND q.label <> c.label
         ),
         scored AS (
             SELECT cand.query_id, cand.neighbor_id, ce.label AS neighbor_label,
                    {_cos("qe.embedding", "ce.embedding")} AS score
             FROM cand
             JOIN embeddings qe ON qe.vec_id = cand.query_id
             JOIN embeddings ce ON ce.vec_id = cand.neighbor_id
         ),
         ranked AS (
             SELECT query_id, neighbor_id, neighbor_label, score,
                    row_number() OVER (PARTITION BY query_id
                                       ORDER BY score DESC, neighbor_id ASC) AS rank
             FROM scored
         )
    SELECT query_id, neighbor_id, neighbor_label, round(score, 6) AS score, rank
    FROM ranked WHERE rank <= 5
"""


def sim_label_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-noise detection (operators/similarity.py:label_outliers):
    per label, the 2 member vectors least similar to their own label's
    centroid — the re-annotation queue of a labeled-data curation pass.
    Centroids are the int64-micros means the k-means trainer uses and
    cosines the deterministic left fold, so the oracle replays scores
    (and the rank cutoff) bit-for-bit."""
    from sql_based_etl_spark.operators.similarity import label_outliers

    return label_outliers(load(spark, sf_dir, "embeddings"), k=2)


QUERIES["sim_label_outliers"] = sim_label_outliers

# Same micros-quantized per-(label, dim) mean as the kmeans oracle,
# reassembled per label (1-based list indexing ↔ 0-based dims), then
# the identical left-fold cosine rounded to 6 BEFORE ranking.
ORACLES["sim_label_outliers"] = f"""
    WITH base AS (
        SELECT label, vec_id AS id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
    ),
    means AS (
        SELECT label, d.dim,
               CAST(round(CAST(sum(CAST(round(v[d.dim + 1] * 1000000.0) AS BIGINT)) AS DOUBLE)
                          / count(*)) AS BIGINT) / 1000000.0 AS m
        FROM base, (SELECT unnest(generate_series(0, 63)) AS dim) d
        GROUP BY label, d.dim
    ),
    cents AS (SELECT label, list(m ORDER BY dim) AS cv FROM means GROUP BY label),
    scored AS (
        SELECT b.label, b.id, round({_cos("b.v", "c.cv")}, 6) AS centroid_cos
        FROM base b JOIN cents c ON b.label = c.label
    ),
    ranked AS (
        SELECT label, id, centroid_cos,
               row_number() OVER (PARTITION BY label
                                  ORDER BY centroid_cos ASC, id ASC) AS rank
        FROM scored
    )
    SELECT label, id AS vec_id, centroid_cos, rank
    FROM ranked WHERE rank <= 2
"""


_COV_DIM = 16


def sim_embedding_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact covariance statistics of the first 16 embedding dims
    (operators/similarity.py:embedding_covariance) — the PCA/whitening
    training aggregate: integer-millis cross-product sums (bit-exact in
    any engine) with the centering done in a fixed double expression.
    One combinable aggregate; the corpus never shuffles."""
    from sql_based_etl_spark.operators.similarity import embedding_covariance

    return embedding_covariance(load(spark, sf_dir, "embeddings"), dim=_COV_DIM)


QUERIES["sim_embedding_covariance"] = sim_embedding_covariance

ORACLES["sim_embedding_covariance"] = f"""
    WITH q AS (
        SELECT list_transform(embedding,
                              x -> CAST(round(CAST(x AS DOUBLE) * 1000.0) AS BIGINT)) AS xq
        FROM embeddings
    ),
    ij AS (
        SELECT i.i, j.j
        FROM (SELECT unnest(generate_series(0, {_COV_DIM - 1})) AS i) i,
             (SELECT unnest(generate_series(0, {_COV_DIM - 1})) AS j) j
        WHERE j.j >= i.i
    ),
    sums AS (
        SELECT i, j, count(*) AS n,
               sum(xq[i + 1]) AS s_i, sum(xq[j + 1]) AS s_j,
               sum(xq[i + 1] * xq[j + 1]) AS s_ij
        FROM q, ij GROUP BY i, j
    )
    SELECT i, j, n, CAST(s_i AS BIGINT) AS s_i, CAST(s_j AS BIGINT) AS s_j,
           CAST(s_ij AS BIGINT) AS s_ij,
           round((CAST(s_ij AS DOUBLE)
                  - CAST(s_i AS DOUBLE) * CAST(s_j AS DOUBLE) / CAST(n AS DOUBLE))
                 / CAST(n AS DOUBLE) / 1000000.0, 9) AS cov
    FROM sums
"""
