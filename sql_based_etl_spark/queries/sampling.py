"""Split/sampling operators as oracle-checked queries over
``documents`` (operators/sampling.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sql_based_etl_spark.operators.sampling import SPLIT_BUCKETS, hash_split, stratified_sample
from sql_based_etl_spark.queries._util import load


def split_hash_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 98/1/1 train/val/test assignment of every
    document, plus the per-split counts the pipeline operator would be
    monitored by. Full assignment output so the oracle checks every
    row's membership, not just the totals."""
    docs = load(spark, sf_dir, "documents").select("doc_id")
    return hash_split(docs).select("doc_id", "split")


def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 10% per-language sample of the documents table."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "lang")
    return stratified_sample(docs, strata_col="lang", fraction=0.1).select(
        "doc_id", "lang"
    )


QUERIES = {
    "split_hash_assign": split_hash_assign,
    "sample_stratified": sample_stratified,
}

_H = "CAST(concat('0x', substr(md5(concat(CAST(doc_id AS VARCHAR), '#42')), 1, 7)) AS BIGINT)"

ORACLES = {
    "split_hash_assign": f"""
        SELECT doc_id,
               CASE WHEN {_H} % {SPLIT_BUCKETS} < 980000 THEN 'train'
                    WHEN {_H} % {SPLIT_BUCKETS} < 990000 THEN 'val'
                    WHEN {_H} % {SPLIT_BUCKETS} < 1000000 THEN 'test'
               END AS split
        FROM documents
    """,
    "sample_stratified": f"""
        WITH ranked AS (
            SELECT doc_id, lang,
                   row_number() OVER (PARTITION BY lang
                                      ORDER BY {_H} ASC, doc_id ASC) AS r,
                   count(*) OVER (PARTITION BY lang) AS n
            FROM documents
        )
        SELECT doc_id, lang FROM ranked WHERE r <= ceil(0.1 * n)
    """,
}


MIXTURE_WEIGHTS = {"en": 1.5, "de": 1.0, "fr": 0.5, "es": 0.25, "zh": 2.0}


def sample_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch-weighted language mixture
    (operators/sampling.py:mixture_sample): 1.5 epochs of en, 2 of zh,
    down-sampled fr/es — every copy row materialized so the oracle
    checks the exact multiset, not just counts."""
    from sql_based_etl_spark.operators.sampling import mixture_sample

    docs = load(spark, sf_dir, "documents").select("doc_id", "lang")
    return mixture_sample(docs, MIXTURE_WEIGHTS, group_col="lang").select(
        "doc_id", "lang", "copy"
    )


QUERIES["sample_mixture"] = sample_mixture

_MIX_WHOLE = "CASE " + " ".join(
    f"WHEN lang = '{g}' THEN {int(w // 1)}"
    for g, w in sorted(MIXTURE_WEIGHTS.items())
) + " ELSE 0 END"
_MIX_BOUND = "CASE " + " ".join(
    f"WHEN lang = '{g}' THEN {int(round((w % 1) * SPLIT_BUCKETS))}"
    for g, w in sorted(MIXTURE_WEIGHTS.items())
) + " ELSE 0 END"

ORACLES["sample_mixture"] = f"""
    WITH n AS (
        SELECT doc_id, lang,
               ({_MIX_WHOLE})
               + CASE WHEN {_H} % {SPLIT_BUCKETS} < ({_MIX_BOUND})
                      THEN 1 ELSE 0 END AS n_copies
        FROM documents
    )
    SELECT doc_id, lang, CAST(c AS INT) AS copy
    FROM n, LATERAL unnest(generate_series(1, n_copies)) AS t(c)
"""


def sample_cap_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain throttling: at most 120 documents per ``source``, chosen
    by deterministic salted hash (operators/sampling.py:cap_per_group)
    — the crawl-curation step that keeps one mega-domain from
    dominating the mix."""
    from sql_based_etl_spark.operators.sampling import cap_per_group

    docs = load(spark, sf_dir, "documents").select("doc_id", "source")
    return cap_per_group(docs, group_col="source", cap=120)


QUERIES["sample_cap_per_source"] = sample_cap_per_source

ORACLES["sample_cap_per_source"] = f"""
    WITH ranked AS (
        SELECT doc_id, source,
               row_number() OVER (PARTITION BY source
                                  ORDER BY {_H} ASC, doc_id ASC) AS r
        FROM documents
    )
    SELECT doc_id, source FROM ranked WHERE r <= 120
"""


def split_leakage_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup-cluster-aware train/val/test assignment
    (operators/sampling.py:leakage_safe_split): MinHash-LSH pairs →
    connected components → hash-split on the CLUSTER id, so a document
    and its near-copies always land in the same split (raw-id hashing
    puts one in train and the twin in test, and eval measures
    memorization). The oracle replays pairs + closure + hash."""
    from sql_based_etl_spark.operators.dedup import minhash_lsh_pairs
    from sql_based_etl_spark.operators.sampling import leakage_safe_split

    docs = load(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(docs, threshold=0.5).select("doc_a", "doc_b")
    return leakage_safe_split(docs, pairs).select("doc_id", "split_key", "split")


QUERIES["split_leakage_safe"] = split_leakage_safe

_HK = ("CAST(concat('0x', substr(md5(concat(CAST(split_key AS VARCHAR), '#42')), 1, 7)) "
       "AS BIGINT)")


def _leakage_oracle() -> str:
    from sql_based_etl_spark.queries.dedup import ORACLES as _DEDUP_ORACLES

    return f"""
    WITH RECURSIVE pairs AS ({_DEDUP_ORACLES["dedup_minhash_lsh"]}),
    edges AS (
        SELECT doc_a AS a, doc_b AS b FROM pairs
        UNION ALL
        SELECT doc_b, doc_a FROM pairs
    ),
    reach(node, lab) AS (
        SELECT a, a FROM edges
        UNION
        SELECT e.b, r.lab FROM reach r JOIN edges e ON e.a = r.node
    ),
    cc AS (SELECT node, min(lab) AS cluster_id FROM reach GROUP BY node),
    keyed AS (
        SELECT d.doc_id, coalesce(cc.cluster_id, d.doc_id) AS split_key
        FROM documents d LEFT JOIN cc ON d.doc_id = cc.node
    )
    SELECT doc_id, split_key,
           CASE WHEN {_HK} % {SPLIT_BUCKETS} < 980000 THEN 'train'
                WHEN {_HK} % {SPLIT_BUCKETS} < 990000 THEN 'val'
                WHEN {_HK} % {SPLIT_BUCKETS} < 1000000 THEN 'test'
           END AS split
    FROM keyed
"""


ORACLES["split_leakage_safe"] = _leakage_oracle()


def sample_top_quality_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adaptive per-language quality thresholding
    (operators/sampling.py:top_fraction_per_group): keep the top 25%
    of documents per language by the quality score — the per-group
    cutoff that a single global threshold gets wrong for low-resource
    languages. Composes the graded quality operator with the exact
    top-fraction window."""
    from sql_based_etl_spark.operators.sampling import top_fraction_per_group
    from sql_based_etl_spark.operators.textops import quality_features

    docs = load(spark, sf_dir, "documents")
    scored = docs.select("doc_id", "lang").join(
        quality_features(docs).select("doc_id", "quality_score"), "doc_id"
    )
    return top_fraction_per_group(
        scored, "lang", 0.25, order_col="quality_score"
    ).select("doc_id", "lang", "quality_score")


QUERIES["sample_top_quality_per_lang"] = sample_top_quality_per_lang


def _top_quality_oracle() -> str:
    from sql_based_etl_spark.queries.textops import ORACLES as _TEXT_ORACLES

    return f"""
    WITH scored AS ({_TEXT_ORACLES["text_quality_score"]}),
    j AS (
        SELECT d.doc_id, d.lang, s.quality_score
        FROM documents d JOIN scored s ON d.doc_id = s.doc_id
    ),
    ranked AS (
        SELECT doc_id, lang, quality_score,
               row_number() OVER (PARTITION BY lang
                                  ORDER BY quality_score DESC, doc_id ASC) AS r,
               count(*) OVER (PARTITION BY lang) AS n
        FROM j
    )
    SELECT doc_id, lang, quality_score FROM ranked WHERE r <= ceil(0.25 * n)
"""


ORACLES["sample_top_quality_per_lang"] = _top_quality_oracle()
